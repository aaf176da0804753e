"""Packed int64 tile keys (z-order / morton) — the physical partition key.

The reference keys tiles by the (zoom, row, col) triple; for Spark we
additionally pack it into one int64 so joins / repartitioning / sorting
shuffle a single long instead of a struct, and so that range-partitioning
on the key gives z-order spatial locality (SURVEY.md §7 risk 7: WMTS
(zoom,row,col) stays the semantic key; this is the physical key).

Layout: [ sign 0 | 5 bits zoom (bits 58-62) | 58 bits morton(row, col) ]
supports zoom <= 31 with row/col < 2^29 each, far beyond the z0-12
target, and never touches the int64 sign bit (zoom<<59 would at
zoom >= 16 — caught by a hypothesis property test).

All functions are numpy-vectorized so they can run over whole Arrow
batches inside pandas UDFs. The exact Spark Column twin is
``functions.geo.zorder_key_col`` (JVM-side, codegen-friendly), which the
job runner uses as the within-partition WRITE ORDER (plans/job.py):
parquet row groups then carry spatial locality so row/col min-max stats
prune spatial range scans. The linear ``zoom<<54 | row<<27 | col``
packing (functions.geo.tile_key_col) remains the semantic join key —
the two serve different purposes and both are tested against each
other (tests/test_tilegrid.py).
"""

from __future__ import annotations

import numpy as np

_B = [
    0x5555555555555555,
    0x3333333333333333,
    0x0F0F0F0F0F0F0F0F,
    0x00FF00FF00FF00FF,
    0x0000FFFF0000FFFF,
]


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the lower 29 bits of x so there is a 0 bit between each."""
    x = x.astype(np.int64) & 0x1FFFFFFF
    x = (x | (x << 16)) & 0x0000FFFF0000FFFF
    x = (x | (x << 8)) & 0x00FF00FF00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0F
    x = (x | (x << 2)) & 0x3333333333333333
    x = (x | (x << 1)) & 0x5555555555555555
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int64) & 0x5555555555555555
    x = (x | (x >> 1)) & 0x3333333333333333
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0F
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FF
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFF
    x = (x | (x >> 16)) & 0x00000000FFFFFFFF
    return x


def pack_tile_key(zoom, row, col) -> np.ndarray:
    """Pack (zoom, row, col) arrays (or scalars) into int64 z-order keys."""
    zoom = np.asarray(zoom, dtype=np.int64)
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    morton = (_part1by1(row) << 1) | _part1by1(col)
    return (zoom << np.int64(58)) | morton


def unpack_tile_key(key) -> tuple:
    """Inverse of pack_tile_key → (zoom, row, col) int64 arrays."""
    key = np.asarray(key, dtype=np.int64)
    zoom = key >> np.int64(58)
    morton = key & np.int64((1 << 58) - 1)
    col = _compact1by1(morton)
    row = _compact1by1(morton >> 1)
    return zoom, row, col


# ---- linear (semantic) tile key -------------------------------------------------
#
# zoom<<54 | row<<27 | col — the SEMANTIC join/grouping key used by every
# operator (joins, checkpoint, halo targets). The morton key above is the
# WRITE-LAYOUT key only (within-partition sort order for parquet row-group
# locality, plans/job.py). Column twin: functions.geo.tile_key_col; SQL
# twin: functions.geo.tile_key_sql — all three share these constants.

LINEAR_ZOOM_SHIFT = 54
LINEAR_ROW_SHIFT = 27
LINEAR_MASK = (1 << 27) - 1


def linear_tile_key(zoom, row, col):
    """Pack (zoom, row, col) — python ints or numpy arrays — into the
    canonical linear int64 key."""
    if isinstance(zoom, (int, np.integer)) and isinstance(row, (int, np.integer)):
        return (int(zoom) << LINEAR_ZOOM_SHIFT) | (int(row) << LINEAR_ROW_SHIFT) | int(col)
    zoom = np.asarray(zoom, dtype=np.int64)
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    return (zoom << np.int64(LINEAR_ZOOM_SHIFT)) | (row << np.int64(LINEAR_ROW_SHIFT)) | col


def split_linear_tile_key(key):
    """Inverse of linear_tile_key -> (zoom, row, col); python ints or
    numpy arrays, pure shift/mask (no float division — exact)."""
    if isinstance(key, (int, np.integer)):
        k = int(key)
        return (
            k >> LINEAR_ZOOM_SHIFT,
            (k >> LINEAR_ROW_SHIFT) & LINEAR_MASK,
            k & LINEAR_MASK,
        )
    k = np.asarray(key, dtype=np.int64)
    return (
        k >> np.int64(LINEAR_ZOOM_SHIFT),
        (k >> np.int64(LINEAR_ROW_SHIFT)) & np.int64(LINEAR_MASK),
        k & np.int64(LINEAR_MASK),
    )
