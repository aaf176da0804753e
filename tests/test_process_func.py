"""User-process loading (P5): execute() from a file / module / inline
source, signature validation, and a config-driven end-to-end run —
mirrors the reference's ProcessFunc contract
(mapchete/config/process_func.py:24-166, test/example_process.py:4-13).
"""

import os

import numpy as np
import pytest

from mapchete_spark.plans.config import ConfigError, JobConfig
from mapchete_spark.plans.job import execute, resolve_process
from mapchete_spark.plans.process_func import ProcessFunc

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = os.path.join(HERE, "configs")


class TestProcessFunc:
    def test_load_from_file(self):
        pf = ProcessFunc("example_process.py", config_dir=CONFIGS)
        assert set(pf.function_parameters) == {"mp", "multiplier", "offset"}

    def test_missing_file_raises(self):
        with pytest.raises(ConfigError, match="not available"):
            ProcessFunc("nope.py", config_dir=CONFIGS)

    def test_no_execute_raises(self, tmp_path):
        p = tmp_path / "noexec.py"
        p.write_text("def run(mp):\n    return mp.array\n")
        with pytest.raises(ConfigError, match="no execute"):
            ProcessFunc(str(p))

    def test_syntax_error_raises(self, tmp_path):
        p = tmp_path / "bad.py"
        p.write_text("def execute(mp:\n")
        with pytest.raises(ConfigError):
            ProcessFunc(str(p))

    def test_inline_source(self):
        pf = ProcessFunc(["def execute(mp, k=3):", "    return mp.array * k"])
        assert "k" in pf.function_parameters

    def test_module_path(self):
        pf = ProcessFunc("mapchete_spark.plans.builtin_identity")
        assert "mp" in pf.function_parameters or pf.function_parameters

    def test_required_param_missing_raises(self, tmp_path):
        p = tmp_path / "needs.py"
        p.write_text("def execute(mp, required_thing):\n    return mp.array\n")
        pf = ProcessFunc(str(p))
        with pytest.raises(ConfigError, match="required_thing"):
            pf.analyze_parameters({5: {"other": 1}})

    def test_unused_param_warns(self, tmp_path):
        p = tmp_path / "simple.py"
        p.write_text("def execute(mp):\n    return mp.array\n")
        pf = ProcessFunc(str(p))
        with pytest.warns(UserWarning, match="unused_thing"):
            pf.analyze_parameters({5: {"unused_thing": 1}})

    def test_filter_parameters(self):
        pf = ProcessFunc(["def execute(mp, a=1):", "    return mp.array * a"])
        assert pf.filter_parameters({"a": 2, "b": 3}) == {"a": 2}


@pytest.fixture(scope="module")
def func_jobs(spark, tmp_path_factory):
    """The module's two end-to-end jobs (user process file, preprocessing
    task) run CONCURRENTLY on the shared session (parity-pool pattern);
    exceptions are stored per-key and re-raised by the owning test."""
    import traceback
    from concurrent.futures import ThreadPoolExecutor

    from mapchete_spark.plans.job import execute as run_job
    from mapchete_spark.plans.job import register_process

    base = tmp_path_factory.mktemp("funcjobs")

    def user_process():
        cfg = JobConfig.from_file(
            os.path.join(CONFIGS, "user_process.mapchete")
        )
        cfg.output["path"] = str(base / "up")
        return cfg, run_job(spark, cfg, mode="overwrite")

    def preprocessing():
        task = base / "prep.py"
        task.write_text(
            "def execute(spark, cfg, delta=0.0):\n"
            "    return 100.0 + delta\n"
        )

        def add_offset(ctx):
            return ctx.array + ctx.params["preprocessing"]["offset"]

        register_process("add_offset", "raster", add_offset, 0)
        cfg = JobConfig.from_dict(
            dict(
                process="add_offset",
                zoom_levels=[4],
                pyramid={"grid": "geodetic"},
                bounds=[0.0, 20.0, 45.0, 50.0],
                input={"source": "dem", "hole": False},
                preprocessing={
                    "offset": {"process": str(task), "args": {"delta": 11.0}}
                },
                output={"path": str(base / "o"), "format": "parquet_tiles"},
            )
        )
        return cfg, run_job(spark, cfg, mode="overwrite")

    thunks = dict(user_process=user_process, preprocessing=preprocessing)

    def run(item):
        key, fn = item
        try:
            return key, ("ok",) + fn()
        except Exception:
            return key, ("err", traceback.format_exc())

    with ThreadPoolExecutor(max_workers=2) as pool:
        return dict(pool.map(run, thunks.items()))


def _fjob(func_jobs, key):
    res = func_jobs[key]
    assert res[0] == "ok", f"{key} job raised:\n{res[1]}"
    return res[1], res[2]


class TestUserProcessJob:
    def test_config_driven_user_process(self, spark, func_jobs):
        cfg, counts = _fjob(func_jobs, "user_process")
        kind, fn, min_pb = resolve_process(cfg)
        assert kind == "raster"
        assert counts["process_z4"] > 0

        # golden: output == dem * 2 + 10 on a sample tile
        from pyspark.sql import functions as F

        from mapchete_spark.operators.rastertable import (
            materialize_dem,
            row_to_array,
        )
        from mapchete_spark.tilegrid import Bounds, TilePyramid

        out = spark.read.parquet(os.path.join(cfg.output["path"], "tiles"))
        row = out.orderBy("tile_row", "tile_col").limit(1).collect()[0]
        dem = materialize_dem(
            spark, 4, TilePyramid("geodetic"),
            bounds=Bounds(0.0, 20.0, 45.0, 50.0), hole=False,
        )
        src = dem.where(
            (F.col("tile_row") == row["tile_row"])
            & (F.col("tile_col") == row["tile_col"])
        ).collect()[0]
        got = row_to_array(row.asDict())
        want = row_to_array(src.asDict()) * 2.0 + 10.0
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    def test_bad_param_rejected_at_resolve(self, tmp_path):
        p = tmp_path / "needs.py"
        p.write_text("def execute(mp, must_have):\n    return mp.array\n")
        cfg = JobConfig.from_dict(
            dict(
                process=str(p),
                zoom_levels=[4],
                pyramid={"grid": "geodetic"},
                output={"path": str(tmp_path / "o"), "format": "parquet_tiles"},
            )
        )
        with pytest.raises(ConfigError, match="must_have"):
            resolve_process(cfg)


class TestPreprocessingTasks:
    """J3: driver-side tasks run once, results injected into process
    params (reference preprocessing-task flow)."""

    def test_task_result_reaches_process(self, spark, func_jobs):
        import numpy as np
        from pyspark.sql import functions as F

        from mapchete_spark.operators.rastertable import (
            materialize_dem,
            row_to_array,
        )
        from mapchete_spark.tilegrid import Bounds, TilePyramid

        cfg, counts = _fjob(func_jobs, "preprocessing")
        assert counts["process_z4"] > 0
        out = spark.read.parquet(os.path.join(cfg.output["path"], "tiles"))
        row = out.orderBy("tile_row", "tile_col").limit(1).collect()[0].asDict()
        dem = materialize_dem(
            spark, 4, TilePyramid("geodetic"),
            bounds=Bounds(0.0, 20.0, 45.0, 50.0), hole=False,
        )
        src = dem.where(
            (F.col("tile_row") == row["tile_row"])
            & (F.col("tile_col") == row["tile_col"])
        ).collect()[0].asDict()
        np.testing.assert_allclose(
            np.asarray(row_to_array(row)),
            np.asarray(row_to_array(src)) + 111.0,
            rtol=1e-6,
        )
