"""J7 status lifecycle: persisted state transitions + observer
callbacks for successful and failing jobs (reference
mapchete/enums.py:34-73 Status semantics)."""

import pytest

from mapchete_spark.operators.checkpoint import JobStore
from mapchete_spark.plans.config import JobConfig
from mapchete_spark.plans.job import execute, register_process


def _conf(tmp_path, process="convert", **extra):
    return JobConfig.from_dict(
        dict(
            process=process,
            zoom_levels=[4],
            pyramid={"grid": "geodetic"},
            input={"source": "dem", "hole": False},
            bounds=[0.0, 20.0, 22.5, 50.0],
            process_parameters=extra.pop(
                "process_parameters", {"scale_ratio": 2.0, "scale_offset": 0.0}
            ),
            output={"path": str(tmp_path / "o"), "format": "parquet_tiles"},
            **extra,
        )
    )


def _states(spark, tmp_path):
    store = JobStore(spark, str(tmp_path / "o" / "_state"))
    rows = store.status().orderBy("seq").collect()
    return [r["state"] for r in rows]


class TestStatusLifecycle:
    def test_success_sequence(self, spark, tmp_path):
        seen = []

        def obs(state, detail, run_id):
            seen.append(state)

        execute(spark, _conf(tmp_path), mode="overwrite", observers=[obs])
        want = ["pending", "parsing", "initializing", "running", "done"]
        assert seen == want
        assert _states(spark, tmp_path) == want

    def test_failing_process_records_failed(self, spark, tmp_path):
        def boom(ctx):
            raise RuntimeError("kaputt")

        register_process("boom", "raster", boom, 0)
        seen = []

        def obs(state, detail, run_id):
            seen.append((state, detail))

        with pytest.raises(Exception):
            execute(
                spark,
                _conf(tmp_path, process="boom", process_parameters={}),
                mode="overwrite",
                observers=[obs],
            )
        states = _states(spark, tmp_path)
        assert states[:4] == ["pending", "parsing", "initializing", "running"]
        assert states[-1] == "failed"
        assert seen[-1][0] == "failed" and "process_z4" in seen[-1][1]

    def test_unknown_process_fails_at_parsing(self, spark, tmp_path):
        with pytest.raises(Exception):
            execute(
                spark,
                _conf(tmp_path, process="no_such_process", process_parameters={}),
                mode="overwrite",
            )
        states = _states(spark, tmp_path)
        assert states == ["pending", "parsing", "failed"]
