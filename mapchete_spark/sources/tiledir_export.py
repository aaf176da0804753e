"""Tile-directory export: write a z/r/c file tree from a tile table.

The reference's tile-directory outputs (S5 GTiff / S7 PNG,
mapchete/formats/default/gtiff.py:341-387, png.py) write one file per
output tile in a ``{zoom}/{row}/{col}.{ext}`` layout plus a
``metadata.json`` sidecar. The engine's canonical sink is the parquet
tile table (the only shape that survives 100 TB); this exporter
materializes the file-tree VIEW of it for interop — intended for
bounded extracts, with a row-count guard.

PNG encoding is pure stdlib (zlib deflate of filtered scanlines) —
no PIL in the environment. Grayscale 8-bit (1 band) and RGBA (4 band)
supported; other payloads export as .npy.
"""

from __future__ import annotations

import json
import os
import struct
import zlib
from typing import Optional

import numpy as np

from pyspark.sql import DataFrame

from mapchete_spark.tilegrid.pyramid import TilePyramid


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG encoder: (h, w) uint8 grayscale, (h, w, 2)
    gray+alpha (the reference's PNG_hillshade 2-band layout,
    mapchete/formats/default/png_hillshade.py:40-41), or (h, w, 4)
    RGBA."""
    if arr.ndim == 2:
        color_type = 0  # grayscale
        raw = arr
    elif arr.ndim == 3 and arr.shape[2] == 2:
        color_type = 4  # grayscale + alpha
        raw = arr
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type = 6  # RGBA
        raw = arr
    else:
        raise ValueError(f"unsupported PNG shape {arr.shape}")
    if raw.dtype != np.uint8:
        raise ValueError("PNG export requires uint8")
    h, w = raw.shape[:2]
    # prepend filter byte 0 (None) to each scanline
    lines = raw.reshape(h, -1)
    stream = b"".join(b"\x00" + lines[i].tobytes() for i in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(stream, 6))
        + chunk(b"IEND", b"")
    )


def decode_png_gray(buf: bytes) -> np.ndarray:
    """Inverse of encode_png for grayscale (test helper)."""
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h = struct.unpack_from(">II", payload, 0)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w + 1
    return np.frombuffer(
        b"".join(raw[i * stride + 1 : (i + 1) * stride] for i in range(h)),
        dtype=np.uint8,
    ).reshape(h, w)


def write_tile_directory(
    tiles: DataFrame,
    path: str,
    pyramid: TilePyramid,
    fmt: str = "png",
    max_tiles: int = 100_000,
    meta_extra: Optional[dict] = None,
) -> int:
    """Export a tile raster table to {path}/{zoom}/{row}/{col}.{ext}.

    Guarded by ``max_tiles`` (file trees don't scale; raise it
    consciously). Returns the number of files written. Writing happens
    per partition on the executors (foreachPartition) — no driver
    collect."""
    n = tiles.count()
    if n > max_tiles:
        raise ValueError(
            f"refusing to write {n} tile files (> {max_tiles}); "
            "export a bounded extract or raise max_tiles"
        )
    os.makedirs(path, exist_ok=True)
    meta = dict(
        pyramid=pyramid.to_dict(),
        driver=dict(format=f"tile_directory_{fmt}"),
        **(meta_extra or {}),
    )
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)

    fmt_local = fmt
    pyr_dict = pyramid.to_dict()
    crs_local = getattr(pyramid, "crs", None) or "EPSG:4326"

    def write_partition(rows):
        from mapchete_spark.tilegrid import TilePyramid as _TP

        pyr_local = _TP(**pyr_dict)
        for r in rows:
            arr = np.frombuffer(r["data"], dtype=r["dtype"]).reshape(
                r["bands"], r["height"], r["width"]
            )
            d = os.path.join(path, str(r["zoom"]), str(r["tile_row"]))
            os.makedirs(d, exist_ok=True)
            if fmt_local == "png" and arr.dtype == np.uint8 and r["bands"] in (1, 4):
                img = arr[0] if r["bands"] == 1 else np.moveaxis(arr, 0, 2)
                payload = encode_png(img)
                ext = "png"
            elif fmt_local == "gtiff":
                # real GeoTIFF bytes (sources/gtiff.py): georeferenced
                # via the tile's closed-form bounds — the reference's
                # default output driver shape (formats/default/gtiff.py)
                from mapchete_spark.sources.gtiff import encode_gtiff

                tb = pyr_local.tile(
                    int(r["zoom"]), int(r["tile_row"]), int(r["tile_col"])
                ).bounds(pixelbuffer=0)
                payload = encode_gtiff(
                    arr, tb, crs=crs_local, nodata=r["nodata"]
                )
                ext = "tif"
            else:
                import io

                bio = io.BytesIO()
                np.save(bio, arr)
                payload = bio.getvalue()
                ext = "npy"
            with open(os.path.join(d, f"{r['tile_col']}.{ext}"), "wb") as f:
                f.write(payload)

    tiles.foreachPartition(write_partition)
    return n


def write_vector_tile_directory(
    features: DataFrame,
    path: str,
    pyramid: TilePyramid,
    schema,
    name: str = "layer",
    max_tiles: int = 100_000,
    node_size: int = 16,
) -> int:
    """S9: export a vector feature table (run_vector_process rows:
    zoom/tile_row/tile_col/tile_key + WKB geometry + JSON properties)
    to a ``{zoom}/{row}/{col}.fgb`` FlatGeobuf tree — the reference's
    FlatGeobuf output driver (formats/default/flatgeobuf.py +
    _fiona_base.py:18-60) without fiona, via the repo's own
    spec-implemented codec (sources/fgb.py). ``schema`` is the ordered
    [(property_name, column_type)] list, like the reference's
    output ``schema.properties`` config. Returns the tile (file)
    count.

    Scale shape: one repartition on tile_key co-locates each tile's
    features, then every executor writes its own tiles' files
    (foreachPartition, no driver collect); per-task memory is bounded
    by its largest single tile."""
    n_tiles = features.select("tile_key").distinct().count()
    if n_tiles > max_tiles:
        raise ValueError(
            f"refusing to write {n_tiles} tile files (> {max_tiles}); "
            "export a bounded extract or raise max_tiles"
        )
    os.makedirs(path, exist_ok=True)
    meta = dict(
        pyramid=pyramid.to_dict(),
        driver=dict(
            format="tile_directory_fgb",
            schema={"properties": dict(schema)},
        ),
    )
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)

    schema_local = list(schema)
    crs = getattr(pyramid, "crs", None) or "EPSG:4326"
    crs_code = int(str(crs).split(":")[-1])

    def write_partition(rows):
        from mapchete_spark.geometry.wkb import from_wkb
        from mapchete_spark.sources.fgb import write_fgb

        groups = {}
        for r in rows:
            key = (int(r["zoom"]), int(r["tile_row"]), int(r["tile_col"]))
            groups.setdefault(key, []).append(
                {
                    "geometry": from_wkb(bytes(r["geometry"])),
                    "properties": json.loads(r["properties"]),
                }
            )
        for (z, trow, tcol), feats in groups.items():
            gtypes = {f["geometry"].geom_type for f in feats}
            gt = gtypes.pop() if len(gtypes) == 1 else "Unknown"
            buf = write_fgb(
                feats, schema_local, geometry_type=gt, name=name,
                crs_code=crs_code, node_size=node_size,
            )
            d = os.path.join(path, str(z), str(trow))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{tcol}.fgb"), "wb") as f:
                f.write(buf)

    features.repartition("tile_key").foreachPartition(write_partition)
    return n_tiles


def tile_index_geojson(index_df: DataFrame, path: str) -> int:
    """J8: write a GeoJSON FeatureCollection of tile footprints from a
    tile_index query result (small per-zoom driver-side write, like the
    reference's gdaltindex-style files, mapchete/index.py:54-130)."""
    rows = index_df.collect()
    feats = []
    for r in rows:
        l, b, rt, t = r["left"], r["bottom"], r["right"], r["top"]
        feats.append(
            {
                "type": "Feature",
                "properties": {
                    "zoom": r["zoom"],
                    "row": r["tile_row"],
                    "col": r["tile_col"],
                },
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[l, b], [rt, b], [rt, t], [l, t], [l, b]]
                    ],
                },
            }
        )
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return len(feats)
