"""User process functions loaded from a Python file, module path, or
inline source — the reference's ProcessFunc contract
(mapchete/config/process_func.py:24-166) re-expressed for Spark.

A process is a module exposing ``execute(mp, **params)`` (reference
test/example_process.py:4-13). Differences from the reference driven by
the execution model:

- The callable must survive pickling into Spark executor tasks, so the
  loaded function is never held directly: the wrapper stores the source
  location (or the source text itself) and re-imports lazily inside the
  executor, cached per process. File paths must be visible from the
  executors (local mode, shared FS, or shipped via --py-files); inline
  source always works because the code itself is pickled.
- Parameter analysis (process_func.py:62-93 analyze_parameters):
  required function parameters missing from the config raise
  ConfigError; configured parameters the function does not accept emit
  a warning; the leading context parameter ('mp'/'ctx'), 'kwargs' and
  '__' are exempt.
"""

from __future__ import annotations

import inspect
import os
import warnings
from typing import Any, Dict, Optional

from mapchete_spark.plans.config import ConfigError

# names never required from config: the leading tile-context argument
# and catch-alls (reference process_func.py:68-72)
_MAGIC_PARAMS = ("mp", "ctx", "kwargs", "__")


class ProcessImportError(ConfigError):
    pass


class ProcessSyntaxError(ConfigError):
    pass


def _load_module_cached(kind: str, spec: str, name: str):
    """Executor-side import, cached per (kind, spec)."""
    import importlib
    import importlib.util

    key = (kind, spec)
    cache = _load_module_cached.__dict__.setdefault("_cache", {})
    if key in cache:
        return cache[key]
    if kind == "file":
        module_spec = importlib.util.spec_from_file_location(name, spec)
        if module_spec is None or module_spec.loader is None:
            raise ProcessImportError(f"cannot import module spec from {spec}")
        module = importlib.util.module_from_spec(module_spec)
        module_spec.loader.exec_module(module)
    elif kind == "source":
        import types

        module = types.ModuleType(name)
        exec(compile(spec, f"<{name}>", "exec"), module.__dict__)
    else:  # dotted module path
        module = importlib.import_module(spec)
    cache[key] = module
    return module


class ProcessFunc:
    """A picklable user-process callable with config-time validation."""

    def __init__(self, src, config_dir: Optional[str] = None):
        if isinstance(src, (list, tuple)):
            self._kind = "source"
            self._spec = "\n".join(src)
            self.name = "custom_process"
        elif isinstance(src, str) and src.endswith(".py"):
            self._kind = "file"
            path = src if os.path.isabs(src) else os.path.join(config_dir or ".", src)
            if not os.path.exists(path):
                raise ConfigError(f"{path} is not available")
            self._spec = os.path.abspath(path)
            self.name = os.path.splitext(os.path.basename(path))[0]
        elif isinstance(src, str):
            self._kind = "module"
            self._spec = src
            self.name = src.split(".")[-1]
        else:
            raise ConfigError(f"unsupported process source: {src!r}")

        # validation: compiles, imports, has execute(), capture signature
        func = self._load_func()
        self.function_parameters: Dict[str, inspect.Parameter] = dict(
            inspect.signature(func).parameters
        )

    # -- executor side ---------------------------------------------------------

    def _load_func(self):
        try:
            module = _load_module_cached(self._kind, self._spec, self.name)
        except SyntaxError as e:
            raise ProcessSyntaxError(f"process source has a syntax error: {e}")
        except ImportError as e:
            raise ProcessImportError(str(e))
        if not hasattr(module, "execute"):
            raise ProcessImportError(f"no execute() function found in {self._spec}")
        return module.execute

    def __call__(self, ctx) -> Any:
        fn = self._load_func()
        return fn(ctx, **self.filter_parameters(ctx.params or {}))

    # -- config-time analysis ---------------------------------------------------

    def filter_parameters(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Keep only kwargs the function accepts (process_func.py:95-101),
        or everything if it declares **kwargs."""
        has_var_kw = any(
            p.kind == inspect.Parameter.VAR_KEYWORD
            for p in self.function_parameters.values()
        )
        if has_var_kw:
            return {k: v for k, v in params.items() if v is not None}
        return {
            k: v
            for k, v in params.items()
            if k in self.function_parameters and v is not None
        }

    def analyze_parameters(self, parameters_per_zoom: Dict[int, Dict[str, Any]]):
        """Validate config params against the function signature per zoom
        (process_func.py:62-93): required-but-missing raises, configured-
        but-unknown warns."""
        names = list(self.function_parameters)
        positional_ctx = names[0] if names else None
        for zoom, config_parameters in parameters_per_zoom.items():
            for name, param in self.function_parameters.items():
                if name == positional_ctx or name in _MAGIC_PARAMS:
                    continue
                if param.kind in (
                    inspect.Parameter.VAR_KEYWORD,
                    inspect.Parameter.VAR_POSITIONAL,
                ):
                    continue
                if param.default is inspect.Parameter.empty and (
                    config_parameters is None or name not in config_parameters
                ):
                    raise ConfigError(
                        f"zoom {zoom}: parameter '{name}' is required by the "
                        "process function but not provided in the process "
                        "configuration"
                    )
            for param_name in (config_parameters or {}):
                if (
                    param_name not in self.function_parameters
                    and not any(
                        p.kind == inspect.Parameter.VAR_KEYWORD
                        for p in self.function_parameters.values()
                    )
                ):
                    warnings.warn(
                        f"zoom {zoom}: parameter '{param_name}' is set in the "
                        "process configuration but not a process function "
                        "parameter"
                    )
