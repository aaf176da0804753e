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


@pytest.fixture(scope="module")
def lifecycle_runs(spark, tmp_path_factory):
    """The success and deliberately-failing jobs are independent;
    run them CONCURRENTLY on the shared session (parity-pool pattern).
    Each returns (observer_events, persisted_states) or an error
    traceback re-raised by the owning test."""
    import traceback
    from concurrent.futures import ThreadPoolExecutor

    base = tmp_path_factory.mktemp("status")

    def success():
        d = base / "ok"
        d.mkdir()
        seen = []

        def obs(state, detail, run_id):
            seen.append(state)

        execute(spark, _conf(d), mode="overwrite", observers=[obs])
        return seen, _states(spark, d)

    def failing():
        d = base / "boom"
        d.mkdir()

        def boom(ctx):
            raise RuntimeError("kaputt")

        register_process("boom", "raster", boom, 0)
        seen = []

        def obs(state, detail, run_id):
            seen.append((state, detail))

        with pytest.raises(Exception):
            execute(
                spark,
                _conf(d, process="boom", process_parameters={}),
                mode="overwrite",
                observers=[obs],
            )
        return seen, _states(spark, d)

    def run(item):
        key, fn = item
        try:
            return key, ("ok",) + fn()
        except Exception:
            return key, ("err", traceback.format_exc())

    with ThreadPoolExecutor(max_workers=2) as pool:
        return dict(pool.map(run, dict(success=success, failing=failing).items()))


class TestStatusLifecycle:
    def test_success_sequence(self, lifecycle_runs):
        res = lifecycle_runs["success"]
        assert res[0] == "ok", f"success job raised:\n{res[1]}"
        seen, states = res[1], res[2]
        want = ["pending", "parsing", "initializing", "running", "done"]
        assert seen == want
        assert states == want

    def test_failing_process_records_failed(self, lifecycle_runs):
        res = lifecycle_runs["failing"]
        assert res[0] == "ok", f"failing job raised:\n{res[1]}"
        seen, states = res[1], res[2]
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
