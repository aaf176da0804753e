"""Listener hygiene: execute() attaches a py4j-callback SparkListener
(operators/profilers.py) per run. A LEAKED listener is a whole-session
tax — every task/stage/job event then crosses the py4j socket once per
leaked listener, which degrades every later Spark job in the session
(the round-5 suite profile: idle-heavy progressive slowdown, ~5x on
late modules). These tests pin that execute() detaches on every path."""

import os

import pytest

from mapchete_spark.plans.config import JobConfig
from mapchete_spark.plans.job import execute, register_process

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _n_listeners(spark) -> int:
    return spark.sparkContext._jsc.sc().listenerBus().listeners().size()


def _tiny_cfg(tmp_path, process="convert", **extra):
    return JobConfig.from_dict(
        dict(
            process=process,
            zoom_levels=[2],
            pyramid={"grid": "geodetic"},
            input={"source": "dem", "hole": False},
            bounds=[0.0, 20.0, 45.0, 50.0],
            process_parameters=extra.pop(
                "process_parameters", {"scale_ratio": 1.0}
            ),
            output={"path": str(tmp_path / "o"), "format": "parquet_tiles"},
            **extra,
        )
    )


def test_success_path_no_growth(spark, tmp_path):
    """The profiler is a per-context SINGLETON: the first execute may
    register it (+1, permanent by design — removal by .equals is
    impossible through a py4j proxy and a leak-per-run was the round-5
    whole-session slowdown); every run after that must NOT grow the
    bus."""
    execute(spark, _tiny_cfg(tmp_path / "w"), mode="overwrite")  # warm-up
    before = _n_listeners(spark)
    for i in range(3):
        execute(spark, _tiny_cfg(tmp_path / f"r{i}"), mode="overwrite")
    assert _n_listeners(spark) == before


def test_singleton_prunes_finished_runs(spark, tmp_path):
    """detach(run_id) drops the finished run's groups so the singleton's
    memory stays bounded across many runs (other session activity —
    run_stage job groups from other modules — may already be present;
    the invariant is NO GROWTH from this test's own completed runs)."""
    from mapchete_spark.operators.profilers import StageMetricsProfiler

    execute(spark, _tiny_cfg(tmp_path / "w"), mode="overwrite")  # warm-up
    prof = StageMetricsProfiler.attach(spark)
    assert prof is not None
    before = {g for g in prof.groups if g and ":" in g}
    for i in range(3):
        execute(spark, _tiny_cfg(tmp_path / f"r{i}"), mode="overwrite")
    after = {g for g in prof.groups if g and ":" in g}
    assert after <= before, f"finished runs left groups: {after - before}"


def test_stage_failure_detaches(spark, tmp_path):
    def boom(ctx):
        raise RuntimeError("kaputt")

    register_process("boom_hygiene", "raster", boom, 0)
    before = _n_listeners(spark)
    with pytest.raises(Exception):
        execute(
            spark,
            _tiny_cfg(tmp_path, process="boom_hygiene",
                      process_parameters={}),
            mode="overwrite",
        )
    assert _n_listeners(spark) == before


def test_parse_failure_leaves_no_listener(spark, tmp_path):
    before = _n_listeners(spark)
    with pytest.raises(Exception):
        execute(
            spark,
            _tiny_cfg(tmp_path, process="no_such_process",
                      process_parameters={}),
            mode="overwrite",
        )
    assert _n_listeners(spark) == before
