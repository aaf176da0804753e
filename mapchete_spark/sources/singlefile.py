"""S6 single-file / COG output analog: coalesce ONE zoom level of a
tile table into a single georeferenced artifact.

Reference semantics (mapchete/formats/default/gtiff.py:390-509): the
single-file GTiff driver assembles the whole zoom in the parent process
(``write_in_parent_process``), guarded by ``IN_MEMORY_THRESHOLD``
(:71) — beyond it the reference streams through a temporary file. Here
the artifact is a .npy array + JSON sidecar (no GDAL in the env); the
guard estimates the assembled size from a Spark aggregate BEFORE
collecting, and the (threshold-bounded) collect is one Arrow transfer.

This is deliberately a DRIVER-side sink: a single artifact is a single
writer by definition. The distributed path for large outputs is the
partitioned tile table; this sink exists for the reference's
one-file-deliverable workflow and refuses (like the reference's
threshold) to assemble something that cannot fit.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapchete_spark.raster.mosaic import create_mosaic
from mapchete_spark.operators.rastertable import row_to_array
from mapchete_spark.tilegrid.grid import Bounds
from mapchete_spark.tilegrid.pyramid import Tile, TilePyramid

IN_MEMORY_THRESHOLD = 20037 * 20037 * 2  # ~800 MB, gtiff.py:71 analog


class SingleFileTooLarge(ValueError):
    pass


def assemble_single_array(
    tiles: DataFrame,
    pyramid: TilePyramid,
    zoom: int,
    threshold_bytes: int = IN_MEMORY_THRESHOLD,
) -> Tuple[np.ma.MaskedArray, Bounds, float]:
    """Mosaic one zoom of a tile table into a single masked array.
    Raises SingleFileTooLarge when the estimated assembled size exceeds
    the threshold (checked with one cheap aggregate before any data is
    pulled to the driver)."""
    # persist: the size-guard aggregate and the fetch would otherwise
    # each evaluate the (possibly expensive) upstream once; the guard
    # still runs BEFORE any payload reaches the driver (the cache lives
    # on the executors). The fetch itself is one Arrow toPandas — the
    # old toLocalIterator ran one sequential mini-job per partition and
    # moved rows through py4j (measured ~6s for a 12MB / 48-tile zoom;
    # ~0.4s this way), and the threshold already bounds what is pulled.
    lvl = tiles.where(F.col("zoom") == zoom).persist()
    try:
        est = lvl.agg(
            F.sum(F.length("data")).alias("nbytes"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        if not est["n"]:
            raise ValueError(f"no tiles at zoom {zoom}")
        if int(est["nbytes"] or 0) > threshold_bytes:
            raise SingleFileTooLarge(
                f"assembled zoom {zoom} needs ~{est['nbytes']} bytes "
                f"(> threshold {threshold_bytes}); write the partitioned "
                "tile table instead"
            )
        pdf = lvl.toPandas()
    finally:
        lvl.unpersist()
    tiles_arrays = []
    nodata = 0.0
    for d in pdf.to_dict("records"):
        t = Tile(pyramid, int(d["zoom"]), int(d["tile_row"]), int(d["tile_col"]))
        tiles_arrays.append((t, row_to_array(d)))
        nodata = float(d["nodata"])
    mosaic, bounds = create_mosaic(tiles_arrays, nodata=nodata)
    return mosaic, bounds, nodata


def write_single_artifact(
    tiles: DataFrame,
    pyramid: TilePyramid,
    zoom: int,
    path: str,
    threshold_bytes: int = IN_MEMORY_THRESHOLD,
) -> dict:
    """Write the assembled zoom as <path>.npy + <path>.json sidecar
    (bounds, pixel sizes, nodata, dtype — everything a GTiff header
    would carry). Returns the sidecar dict."""
    mosaic, bounds, nodata = assemble_single_array(
        tiles, pyramid, zoom, threshold_bytes
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path + ".npy", mosaic.filled(nodata))
    # real single-file GeoTIFF alongside (sources/gtiff.py baseline
    # TIFF; the reference's write_in_parent_process deliverable) when
    # the CRS is an EPSG code and the dtype is TIFF-representable
    try:
        from mapchete_spark.sources.gtiff import encode_gtiff

        with open(path + ".tif", "wb") as f:
            f.write(
                encode_gtiff(
                    mosaic.filled(nodata),
                    bounds,
                    crs=pyramid.crs,
                    nodata=nodata,
                )
            )
    except ValueError:
        pass  # non-EPSG custom grid / exotic dtype: .npy+.json only
    meta = dict(
        zoom=zoom,
        bounds=list(bounds),
        shape=list(mosaic.shape),
        dtype=str(mosaic.dtype),
        nodata=nodata,
        pixel_x_size=pyramid.pixel_x_size(zoom),
        pixel_y_size=pyramid.pixel_y_size(zoom),
        crs=pyramid.crs,
    )
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def write_single_cog(
    tiles: DataFrame,
    pyramid: TilePyramid,
    zooms,
    path: str,
    threshold_bytes: int = IN_MEMORY_THRESHOLD,
) -> dict:
    """Single-file COG-layout GeoTIFF: the finest zoom as IFD 0 plus
    one reduced-resolution IFD per coarser zoom (NewSubfileType=1),
    all georeferenced over the base zoom's snapped bounds — the
    reference's single-file overview deliverable
    (formats/default/gtiff.py COG path). Every level is cropped to the
    base window so readers can treat level k as a 1/2^k preview."""
    from mapchete_spark.sources.gtiff import encode_gtiff_overviews

    zooms = sorted(set(int(z) for z in zooms), reverse=True)
    base_arr, base_bounds, nodata = assemble_single_array(
        tiles, pyramid, zooms[0], threshold_bytes
    )
    arrs = [base_arr.filled(nodata)]
    for z in zooms[1:]:
        arr, bnds, _ = assemble_single_array(tiles, pyramid, z, threshold_bytes)
        px, py = pyramid.pixel_x_size(z), pyramid.pixel_y_size(z)
        c0 = int(round((base_bounds.left - bnds.left) / px))
        r0 = int(round((bnds.top - base_bounds.top) / py))
        h = int(round((base_bounds.top - base_bounds.bottom) / py))
        w = int(round((base_bounds.right - base_bounds.left) / px))
        arrs.append(arr.filled(nodata)[:, r0 : r0 + h, c0 : c0 + w])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path + ".tif", "wb") as f:
        f.write(
            encode_gtiff_overviews(
                arrs, base_bounds, crs=pyramid.crs, nodata=nodata
            )
        )
    meta = dict(
        zooms=zooms,
        bounds=list(base_bounds),
        shapes=[list(a.shape) for a in arrs],
        dtype=str(arrs[0].dtype),
        nodata=nodata,
        crs=pyramid.crs,
    )
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta
