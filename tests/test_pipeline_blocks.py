"""Banded pyramid pipelining (operators/pipeline_blocks.py): row-band
alignment math, bit-identity with the barrier build, and a
DETERMINISTIC proof that bands progress through zooms independently
(no inter-zoom barrier)."""

import threading

import pytest
from pyspark.sql import functions as F

from mapchete_spark.operators.overviews import build_overviews
from mapchete_spark.operators.pipeline_blocks import (
    band_bounds,
    pipelined_pyramid,
    read_banded,
)
from mapchete_spark.operators.rastertable import materialize_dem
from mapchete_spark.tilegrid import Bounds, TilePyramid

GEO = TilePyramid("geodetic")
AOI = Bounds(0.0, 20.0, 45.0, 50.0)


class TestBandBounds:
    @pytest.mark.parametrize("h,levels,n", [
        (32, 2, 4), (32, 3, 4), (17, 2, 4), (64, 1, 3), (8, 3, 16),
        (1, 1, 4),
    ])
    def test_alignment_coverage_disjoint(self, h, levels, n):
        bands = band_bounds(h, levels, n)
        align = 1 << levels
        # full disjoint coverage in order
        assert bands[0][0] == 0 and bands[-1][1] == h
        for (a0, a1), (b0, b1) in zip(bands, bands[1:]):
            assert a1 == b0
        # every INTERIOR boundary aligned so each halving keeps the
        # parent's children inside one band
        for a, b in bands:
            assert a % align == 0
        assert len(bands) <= n

    def test_single_band_degenerates_to_barrier(self):
        assert band_bounds(32, 2, 1) == [(0, 32)]


@pytest.fixture(scope="module")
def pb_runs(spark, tmp_path_factory):
    """The three heavy scenarios (equality, gated pipelining proof,
    config wiring) are independent — run them concurrently
    (conftest.run_concurrently)."""
    from tests.conftest import run_concurrently

    base = tmp_path_factory.mktemp("pblocks")

    def mk(key, fn):
        def thunk():
            d = base / key
            d.mkdir()
            fn(spark, d)
        return thunk

    return run_concurrently(
        {k: mk(k, fn) for k, fn in dict(
            equality=_run_equality,
            gated=_run_gated,
            config=_run_config_banded,
            continue_skip=_run_banded_continue,
        ).items()},
        max_workers=4,
    )


def _run_equality(spark, tmp_path):
    dem = materialize_dem(spark, 5, GEO, bounds=AOI, hole=False)
    out = str(tmp_path / "banded")
    totals = pipelined_pyramid(
        spark, dem, GEO, 5, 3, out, n_bands=4, resampling="average"
    )
    want_levels = build_overviews(dem, GEO, 5, 3, resampling="average")
    for z, df in want_levels:
        want = {
            r["tile_key"]: r["h"]
            for r in df.select("tile_key", F.md5("data").alias("h")).collect()
        }
        got = {
            r["tile_key"]: r["h"]
            for r in read_banded(spark, out, z)
            .select("tile_key", F.md5("data").alias("h"))
            .collect()
        }
        assert got == want, f"zoom {z} differs from barrier build"
        assert totals[f"overview_z{z}"] == len(want)


def _run_gated(spark, tmp_path):
    """Deterministic no-barrier proof: band 1 is GATED so its first
    reduce cannot start until band 0 has finished its LAST (min_zoom)
    level. Under a zoom barrier this deadlocks (zoom z-1 would need
    every band's zoom-z output); with independent band chains band 0
    runs straight to the top and the build completes."""
    dem = materialize_dem(spark, 5, GEO, bounds=AOI, hole=False)
    band0_done = threading.Event()
    events = []
    lock = threading.Lock()

    def on_stage(band, zoom, ev):
        if band == 0 and zoom == 3 and ev == "done":
            band0_done.set()
        if band == 1 and ev == "start" and not band0_done.is_set():
            assert band0_done.wait(180), "band 0 never finished: barrier?"
        with lock:
            events.append((band, zoom, ev))

    out = str(tmp_path / "gated")
    pipelined_pyramid(
        spark, dem, GEO, 5, 3, out, n_bands=2, resampling="average",
        on_stage=on_stage,
    )
    # band 0 finished zoom 3 before band 1 did anything at zoom 4
    i_b0_top = events.index((0, 3, "done"))
    i_b1_first = events.index((1, 4, "done"))
    assert i_b0_top < i_b1_first
    # and the gated build still matches the barrier result at the top
    want = build_overviews(dem, GEO, 5, 3, resampling="average")[-1][1]
    got_n = read_banded(spark, out, 3).count()
    assert got_n == want.count() > 0


def _run_config_banded(spark, tmp_path):
    """baselevels.pipeline: banded through the full execute() path —
    counts and tile payloads identical to the default barrier job."""
    import os

    from mapchete_spark.plans.config import JobConfig
    from mapchete_spark.plans.job import execute

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = {}
    for mode_name in ("barrier", "banded"):
        cfg = JobConfig.from_file(
            os.path.join(here, "configs", "baselevels.mapchete")
        )
        cfg.baselevels.pipeline = mode_name
        cfg.bounds = Bounds(0.0, 20.0, 22.5, 31.25)
        cfg.output["path"] = str(tmp_path / mode_name)
        counts = execute(spark, cfg, mode="overwrite")
        tiles = spark.read.parquet(str(tmp_path / mode_name / "tiles"))
        outs[mode_name] = (
            counts,
            sorted(
                (r["zoom"], r["tile_key"], r["h"])
                for r in tiles.select(
                    "zoom", "tile_key", F.md5("data").alias("h")
                ).collect()
            ),
        )
    assert outs["barrier"][0] == outs["banded"][0]
    assert outs["barrier"][1] == outs["banded"][1]


def test_config_rejects_unknown_pipeline(tmp_path):
    import pytest as _pytest

    from mapchete_spark.plans.config import ConfigError, JobConfig

    with _pytest.raises(ConfigError, match="barrier|banded"):
        JobConfig.from_dict(
            dict(
                process="convert",
                zoom_levels=dict(min=3, max=5),
                pyramid=dict(grid="geodetic"),
                output=dict(path=str(tmp_path / "x")),
                baselevels=dict(min=4, max=5, pipeline="chaotic"),
            )
        )


def test_banded_equals_barrier(pb_runs):
    from tests.conftest import assert_ok

    assert_ok(pb_runs, "equality")


def test_bands_pipeline_independently(pb_runs):
    from tests.conftest import assert_ok

    assert_ok(pb_runs, "gated")


def test_config_banded_equals_barrier_job(pb_runs):
    from tests.conftest import assert_ok

    assert_ok(pb_runs, "config")


def _run_banded_continue(spark, tmp_path):
    """ADVICE r5: (a) the banded scratch dir must not live inside the
    tile output tree and must be cleaned up; (b) a continue-mode rerun
    with every lower zoom already committed must SKIP the banded
    rebuild (cheap observable: identical outputs + no _banded_
    leftovers)."""
    import os

    from mapchete_spark.plans.config import JobConfig
    from mapchete_spark.plans.job import execute

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = JobConfig.from_file(
        os.path.join(here, "configs", "baselevels.mapchete")
    )
    cfg.baselevels.pipeline = "banded"
    cfg.bounds = Bounds(0.0, 20.0, 11.25, 25.625)  # small: gate is suite time
    out = tmp_path / "o"
    cfg.output["path"] = str(out)
    execute(spark, cfg, mode="overwrite")

    def snapshot():
        tiles = spark.read.parquet(str(out / "tiles"))
        return sorted(
            (r["zoom"], r["tile_key"], r["h"])
            for r in tiles.select(
                "zoom", "tile_key", F.md5("data").alias("h")
            ).collect()
        )

    first = snapshot()
    # no scratch anywhere under the OUTPUT tree (tile readers glob it)
    for root, dirs, _files in os.walk(out):
        for d in dirs:
            assert not d.startswith("msq_banded"), f"scratch left in {root}"
            assert not d.startswith("_banded_"), f"scratch left in {root}"

    cfg2 = JobConfig.from_file(
        os.path.join(here, "configs", "baselevels.mapchete")
    )
    cfg2.baselevels.pipeline = "banded"
    cfg2.bounds = Bounds(0.0, 20.0, 11.25, 25.625)
    cfg2.output["path"] = str(out)
    execute(spark, cfg2, mode="continue")
    assert snapshot() == first


def test_banded_continue_skips_rebuild_and_leaves_no_scratch(pb_runs):
    from tests.conftest import assert_ok

    assert_ok(pb_runs, "continue_skip")
