"""Exact-value per-tile digests of raster payloads — the Spark side of
the oracle-twin digests in functions/rastersql.py.

All digests are integers computed from exact operations (float64 * 2^k
scaling + floor, integer sums), so a DuckDB oracle recomputing the same
pixels from closed form hash-matches bit-for-bit.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

QUANT = 16.0
WMOD = 9973
LEN_QUANT = 262144.0  # 2^18


def tile_value_digests(tiles: DataFrame, with_dims: bool = True) -> DataFrame:
    """(zoom, tile_row, tile_col[, bands, height, width], n_valid,
    value_q_sum): count + quantized sum over non-nodata pixels."""

    dims = ("bands", "height", "width") if with_dims else ()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "zoom", "tile_row", "tile_col", *dims, "n_valid", "value_q_sum",
            )}
            for z, tr, tc, data, dtype, bands, h, w, nodata in zip(
                pdf["zoom"].values, pdf["tile_row"].values, pdf["tile_col"].values,
                pdf["data"].values, pdf["dtype"].values, pdf["bands"].values,
                pdf["height"].values, pdf["width"].values, pdf["nodata"].values,
            ):
                raw = np.frombuffer(data, dtype=dtype)
                valid = raw != np.float32(nodata) if "float" in dtype else raw != nodata
                vq = np.floor(raw[valid].astype(np.float64) * QUANT).astype(np.int64)
                out["zoom"].append(int(z))
                out["tile_row"].append(int(tr))
                out["tile_col"].append(int(tc))
                if with_dims:
                    out["bands"].append(int(bands))
                    out["height"].append(int(h))
                    out["width"].append(int(w))
                out["n_valid"].append(int(valid.sum()))
                out["value_q_sum"].append(int(vq.sum()))
            yield pd.DataFrame(out)

    dim_schema = "bands int, height int, width int, " if with_dims else ""
    return tiles.mapInPandas(
        gen,
        schema=(
            "zoom int, tile_row long, tile_col long, "
            + dim_schema
            + "n_valid long, value_q_sum long"
        ),
    )


def shade_digests(tiles: DataFrame) -> DataFrame:
    """(zoom, tile_row, tile_col, n_px, shade_sum, shade_wsum) over a
    uint8 payload: plain + positionally-weighted sums."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "zoom", "tile_row", "tile_col", "n_px", "shade_sum", "shade_wsum",
            )}
            for z, tr, tc, data, dtype, h, w in zip(
                pdf["zoom"].values, pdf["tile_row"].values, pdf["tile_col"].values,
                pdf["data"].values, pdf["dtype"].values,
                pdf["height"].values, pdf["width"].values,
            ):
                raw = np.frombuffer(data, dtype=dtype).reshape(-1, int(h), int(w))[0]
                v = raw.astype(np.int64)
                idx = np.arange(int(h) * int(w), dtype=np.int64).reshape(int(h), int(w))
                out["zoom"].append(int(z))
                out["tile_row"].append(int(tr))
                out["tile_col"].append(int(tc))
                out["n_px"].append(int(v.size))
                out["shade_sum"].append(int(v.sum()))
                out["shade_wsum"].append(int((v * (idx % WMOD)).sum()))
            yield pd.DataFrame(out)

    return tiles.mapInPandas(
        gen,
        schema=(
            "zoom int, tile_row long, tile_col long, "
            "n_px long, shade_sum long, shade_wsum long"
        ),
    )


def contour_digests(features: DataFrame) -> DataFrame:
    """Per (tile, level) digest of contour LineString features:
    segment count + quantized total length (map units). Consecutive
    polyline points are exactly the marching-squares segment endpoints,
    so both sums are chain-order-free."""
    import json

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapchete_spark.geometry.wkb import from_wkb

        for pdf in batches:
            out = {k: [] for k in (
                "zoom", "tile_row", "tile_col", "level", "n_segments", "len_q_sum",
            )}
            for z, tr, tc, wkb, props in zip(
                pdf["zoom"].values, pdf["tile_row"].values, pdf["tile_col"].values,
                pdf["geometry"].values, pdf["properties"].values,
            ):
                line = from_wkb(wkb)
                coords = np.asarray(line.coords, dtype=np.float64)
                dx = coords[1:, 0] - coords[:-1, 0]
                dy = coords[1:, 1] - coords[:-1, 1]
                lens = np.sqrt(dx * dx + dy * dy)
                lq = np.floor(lens * LEN_QUANT).astype(np.int64)
                out["zoom"].append(int(z))
                out["tile_row"].append(int(tr))
                out["tile_col"].append(int(tc))
                out["level"].append(float(json.loads(props)["elev"]))
                out["n_segments"].append(int(len(coords) - 1))
                out["len_q_sum"].append(int(lq.sum()))
            yield pd.DataFrame(out)

    from pyspark.sql import functions as F

    per_feature = features.mapInPandas(
        gen,
        schema=(
            "zoom int, tile_row long, tile_col long, level double, "
            "n_segments long, len_q_sum long"
        ),
    )
    return per_feature.groupBy("zoom", "tile_row", "tile_col", "level").agg(
        F.sum("n_segments").alias("n_segments"),
        F.sum("len_q_sum").alias("len_q_sum"),
    )
