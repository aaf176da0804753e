"""Fine-grained inter-zoom pipelining: banded pyramid builds.

The engine's default pyramid build runs one Spark stage per zoom with
a barrier between zooms (plans/job.py) — the accepted SURVEY trade-off
vs the reference's task graph, which starts a parent tile as soon as
its 4 children finish (mapchete/processing/tasks.py:570-617 dask
delayed edges). At 100× scale the barrier's cost is stragglers: one
slow tile at zoom z holds EVERY zoom above it.

This module closes that gap the Spark-idiomatic way: **concurrent job
submission over independent spatial bands**. The base zoom is split
into row bands whose boundaries are multiples of 2^(base_zoom -
min_zoom), so after k halvings a band's rows are still a whole number
of rows and — because a parent's 4 children all lie inside the
parent's doubled row range — **band b at every zoom depends only on
band b below it**. Each band therefore forms an independent
reduce-chain, run on its own thread (Spark schedules concurrent jobs
from threads; the oracle-parity pool pattern): a straggler in band 0's
zoom-5 reduce does not delay band 3's zoom-3 work. Equivalently this
is the reference's child→parent dependency coarsened from single tiles
to bands — tunable between "all-barrier" (1 band) and per-metatile
granularity (many bands), which is the right knob at 1000 executors
where per-tile task graphs would swamp any scheduler.

Output layout: each (zoom, band) writes its OWN parquet directory
``level=<z>/band=<b>`` — concurrent writers never share a directory.
(The partition dirs are named ``level``/``band`` because the rows
already carry a ``zoom`` data column; discovery would reject the
duplicate.)
"""

from __future__ import annotations

import os
import traceback
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapchete_spark.operators.overviews import overview_reduce_once
from mapchete_spark.tilegrid import TilePyramid


def band_bounds(
    matrix_height: int, levels: int, n_bands: int
) -> List[Tuple[int, int]]:
    """Row ranges [r0, r1) at the BASE zoom: boundaries are multiples
    of 2^levels (so every halving keeps bands whole), as equal as the
    alignment allows; at most n_bands ranges."""
    align = 1 << levels
    n_units = (matrix_height + align - 1) // align
    n_bands = max(1, min(n_bands, n_units))
    per = n_units / n_bands
    cuts = [int(round(i * per)) * align for i in range(n_bands)]
    cuts.append(matrix_height)
    out = []
    for a, b in zip(cuts, cuts[1:]):
        if b > a:
            out.append((a, min(b, matrix_height)))
    return out


def pipelined_pyramid(
    spark: SparkSession,
    base_tiles: DataFrame,
    pyramid: TilePyramid,
    base_zoom: int,
    min_zoom: int,
    out_path: str,
    n_bands: int = 4,
    resampling: str = "average",
    on_stage: Optional[Callable[[int, int, str], None]] = None,
) -> Dict[str, int]:
    """Build all overview zooms (base_zoom-1 .. min_zoom) from
    ``base_tiles``, pipelined across ``n_bands`` independent row bands.
    Returns {"overview_z<z>": rows} totals (the same counters the
    barrier build reports). ``on_stage(band, zoom, event)`` is called
    with event "start"/"done" per (band, zoom) reduce — the hook the
    pipelining test uses to prove overlap.

    Row-identity contract: the union of all bands' outputs is
    bit-identical to the barrier ``build_overviews`` result (golden +
    contract query) — banding only reorders WHEN parents compute."""
    levels = base_zoom - min_zoom
    if levels < 1:
        raise ValueError("need at least one overview level")
    bands = band_bounds(pyramid.matrix_height(base_zoom), levels, n_bands)
    os.makedirs(out_path, exist_ok=True)

    def run_band(args):
        b, (r0, r1) = args
        try:
            cur = base_tiles.where(
                (F.col("tile_row") >= r0) & (F.col("tile_row") < r1)
            )
            rows: Dict[int, int] = {}
            for z in range(base_zoom - 1, min_zoom - 1, -1):
                if on_stage:
                    on_stage(b, z, "start")
                cur = overview_reduce_once(cur, pyramid, resampling=resampling)
                d = os.path.join(out_path, f"level={z}", f"band={b}")
                cur.write.mode("overwrite").parquet(d)
                # re-read: the next level reduces from the WRITTEN rows
                # (same seeding rule as the barrier path), and the
                # lineage of each band stays one level deep
                cur = spark.read.parquet(d)
                rows[z] = cur.count()
                if on_stage:
                    on_stage(b, z, "done")
            return b, ("ok", rows)
        except Exception:
            return b, ("err", traceback.format_exc())

    with ThreadPoolExecutor(max_workers=len(bands)) as pool:
        results = dict(pool.map(run_band, enumerate(bands)))
    errs = {b: r[1] for b, r in results.items() if r[0] == "err"}
    if errs:
        raise RuntimeError(
            "banded pyramid build failed in band(s) "
            + ", ".join(f"{b}:\n{tb}" for b, tb in errs.items())
        )
    totals: Dict[str, int] = {}
    for _b, (_s, rows) in results.items():
        for z, n in rows.items():
            totals[f"overview_z{z}"] = totals.get(f"overview_z{z}", 0) + n
    return totals


def read_banded(spark: SparkSession, out_path: str, zoom: int) -> DataFrame:
    """One zoom of a banded build, band column dropped (rows are the
    contract; band is physical layout only)."""
    return (
        spark.read.parquet(out_path)
        .where(F.col("level") == zoom)
        .drop("level", "band")
    )
