"""Pure-python FlatGeobuf (FGB) writer + reader.

The reference writes FlatGeobuf through fiona/GDAL
(mapchete/formats/default/flatgeobuf.py + _fiona_base.py:18-60); this
container has neither, so the format is implemented from the public
spec (flatgeobuf.org, BSD reference implementations' header.fbs /
feature.fbs): magic bytes ``fgb\\x03fgb\\x01``, a size-prefixed
flatbuffers Header, an optional packed Hilbert R-tree index, then
size-prefixed flatbuffers Features — the same move that made the
GeoTIFF driver real in round 4 (sources/gtiff.py).

Layout notes (all little-endian):
- Header table: name, envelope [minx,miny,maxx,maxy], geometry_type,
  columns, features_count, index_node_size, crs.
- Packed Hilbert R-tree: features sorted by the Hilbert value of their
  bbox center (16-bit grid over the envelope); 40-byte node items
  (4 float64 bbox + uint64 offset) stored root level first; leaf item
  offsets point at the feature's byte offset within the features
  section, internal item offsets at the first child node item's byte
  offset within the index.
- Feature table: geometry + properties. Geometry: flat ``xy`` double
  vector, ``ends`` = cumulative ring lengths in xy-array units
  (doubles), ``parts`` for multi-geometries. Properties: packed
  [uint16 column index | value] pairs; strings as uint32 length +
  utf-8 bytes.
"""

from __future__ import annotations

import json
import math
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mapchete_spark.geometry.core import (
    LineString,
    MultiLineString,
    MultiPolygon,
    Point,
    Polygon,
)
from mapchete_spark.sources.flatbuf import Builder, Table, root_table

MAGIC = b"fgb\x03fgb\x01"

GEOMETRY_TYPES = {
    "Unknown": 0, "Point": 1, "LineString": 2, "Polygon": 3,
    "MultiPoint": 4, "MultiLineString": 5, "MultiPolygon": 6,
    "GeometryCollection": 7,
}
_GEOM_NAME = {v: k for k, v in GEOMETRY_TYPES.items()}

# ColumnType enum (header.fbs)
COLUMN_TYPES = {
    "bool": 2, "int": 5, "long": 7, "float": 9, "double": 10,
    "string": 11, "json": 12, "binary": 14,
}
_COL_NAME = {v: k for k, v in COLUMN_TYPES.items()}

NODE_ITEM_SIZE = 40  # 4 float64 + uint64
DEFAULT_NODE_SIZE = 16
_HILBERT_ORDER = 16
_HILBERT_MAX = (1 << _HILBERT_ORDER) - 1


# ---------------------------------------------------------------------------
# Hilbert curve (public xy2d algorithm)


def hilbert_d(x: int, y: int, order: int = _HILBERT_ORDER) -> int:
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


# ---------------------------------------------------------------------------
# geometry <-> flatbuffers Geometry table


def _geom_arrays(geom) -> Tuple[Optional[List[int]], List[float], int, list]:
    """(ends, xy, type_id, parts) for one geometry object."""
    if isinstance(geom, Point):
        return None, [float(geom.x), float(geom.y)], 1, []
    if isinstance(geom, LineString):
        return None, [float(v) for v in np.asarray(geom.coords).ravel()], 2, []
    if isinstance(geom, MultiLineString):
        xy: List[float] = []
        ends: List[int] = []
        for ln in geom.lines:
            xy.extend(float(v) for v in np.asarray(ln.coords).ravel())
            ends.append(len(xy))
        return (ends if len(geom.lines) > 1 else None), xy, 5, []
    if isinstance(geom, Polygon):
        xy = []
        ends = []
        for ring in (geom.exterior, *geom.interiors):
            r = _closed(np.asarray(ring, dtype=np.float64))
            xy.extend(float(v) for v in r.ravel())
            ends.append(len(xy))
        return (ends if len(ends) > 1 else None), xy, 3, []
    if isinstance(geom, MultiPolygon):
        return None, [], 6, list(geom.polygons)
    raise ValueError(f"unsupported geometry {type(geom).__name__}")


def _closed(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        return np.vstack([ring, ring[:1]])
    return ring


def _write_geometry(b: Builder, geom) -> int:
    ends, xy, type_id, parts = _geom_arrays(geom)
    part_locs = [_write_geometry(b, p) for p in parts]
    parts_vec = b.create_offset_vector(part_locs) if part_locs else None
    xy_vec = b.create_scalar_vector("d", 8, xy) if xy else None
    ends_vec = b.create_scalar_vector("I", 4, ends) if ends else None
    b.start_table(8)
    b.add_offset(0, ends_vec)
    b.add_offset(1, xy_vec)
    b.add_scalar(6, "B", 1, type_id, 0)
    b.add_offset(7, parts_vec)
    return b.end_table()


def _read_geometry(t: Table):
    type_id = t.scalar(6, "B", 0)
    parts = t.table_vector(7)
    if parts:
        return MultiPolygon(tuple(_read_geometry(p) for p in parts))
    xy = t.scalar_vector(1, "d", 8) or []
    ends = t.scalar_vector(0, "I", 4)
    coords = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
    if type_id == 1:
        return Point(float(coords[0, 0]), float(coords[0, 1]))
    if type_id == 2:
        return LineString(coords)
    if type_id == 5:
        bounds = ends or [len(xy)]
        lines, start = [], 0
        for e in bounds:
            lines.append(LineString(coords[start // 2 : e // 2]))
            start = e
        return MultiLineString(tuple(lines))
    if type_id == 3:
        bounds = ends or [len(xy)]
        rings, start = [], 0
        for e in bounds:
            rings.append(coords[start // 2 : e // 2])
            start = e
        return Polygon(rings[0], tuple(rings[1:]))
    raise ValueError(f"unsupported FGB geometry type {type_id}")


# ---------------------------------------------------------------------------
# properties codec


def _pack_properties(schema: Sequence[Tuple[str, str]], props: Dict) -> bytes:
    out = bytearray()
    for idx, (name, typ) in enumerate(schema):
        if name not in props or props[name] is None:
            continue  # absent -> null (FGB omits the column index)
        v = props[name]
        out += struct.pack("<H", idx)
        if typ == "bool":
            out += struct.pack("<B", 1 if v else 0)
        elif typ == "int":
            out += struct.pack("<i", int(v))
        elif typ == "long":
            out += struct.pack("<q", int(v))
        elif typ == "float":
            out += struct.pack("<f", float(v))
        elif typ == "double":
            out += struct.pack("<d", float(v))
        elif typ in ("string", "json"):
            raw = (v if typ == "string" else json.dumps(v, sort_keys=True)).encode(
                "utf-8"
            )
            out += struct.pack("<I", len(raw)) + raw
        elif typ == "binary":
            raw = bytes(v)
            out += struct.pack("<I", len(raw)) + raw
        else:
            raise ValueError(f"unsupported column type {typ}")
    return bytes(out)


def _unpack_properties(schema: Sequence[Tuple[str, str]], raw: bytes) -> Dict:
    props: Dict = {}
    pos = 0
    while pos + 2 <= len(raw):
        (idx,) = struct.unpack_from("<H", raw, pos)
        pos += 2
        name, typ = schema[idx]
        if typ == "bool":
            props[name] = bool(raw[pos])
            pos += 1
        elif typ == "int":
            props[name] = struct.unpack_from("<i", raw, pos)[0]
            pos += 4
        elif typ == "long":
            props[name] = struct.unpack_from("<q", raw, pos)[0]
            pos += 8
        elif typ == "float":
            props[name] = struct.unpack_from("<f", raw, pos)[0]
            pos += 4
        elif typ == "double":
            props[name] = struct.unpack_from("<d", raw, pos)[0]
            pos += 8
        elif typ in ("string", "json", "binary"):
            (n,) = struct.unpack_from("<I", raw, pos)
            pos += 4
            chunk = raw[pos : pos + n]
            pos += n
            if typ == "string":
                props[name] = chunk.decode("utf-8")
            elif typ == "json":
                props[name] = json.loads(chunk.decode("utf-8"))
            else:
                props[name] = bytes(chunk)
        else:
            raise ValueError(f"unsupported column type {typ}")
    return props


# ---------------------------------------------------------------------------
# packed Hilbert R-tree


def _tree_level_sizes(n: int, node_size: int) -> List[int]:
    """Bottom-up node counts per level: [n, ceil(n/ns), ..., 1]."""
    sizes = [n]
    while sizes[-1] > 1:
        sizes.append(math.ceil(sizes[-1] / node_size))
    return sizes


def tree_size(n: int, node_size: int = DEFAULT_NODE_SIZE) -> int:
    if n == 0:
        return 0
    return sum(_tree_level_sizes(n, node_size)) * NODE_ITEM_SIZE


def _build_index(
    boxes: List[Tuple[float, float, float, float]],
    feature_offsets: List[int],
    node_size: int,
) -> bytes:
    """Packed Hilbert R-tree over features ALREADY in Hilbert order;
    stored root level first."""
    n = len(boxes)
    sizes = _tree_level_sizes(n, node_size)  # bottom-up
    # start index (in node items) of each level in the stored
    # (top-down) array: levels stored [root ... leaves]
    starts_bottom_up = []
    pos = sum(sizes)
    for s in sizes:  # leaf level first
        pos -= s
        starts_bottom_up.append(pos)
    items: List[Optional[Tuple[float, float, float, float, int]]] = (
        [None] * sum(sizes)
    )
    for i, (bx, off) in enumerate(zip(boxes, feature_offsets)):
        items[starts_bottom_up[0] + i] = (*bx, off)
    for lvl in range(1, len(sizes)):
        child_start = starts_bottom_up[lvl - 1]
        for j in range(sizes[lvl]):
            lo = j * node_size
            hi = min(lo + node_size, sizes[lvl - 1])
            children = [items[child_start + k] for k in range(lo, hi)]
            minx = min(c[0] for c in children)
            miny = min(c[1] for c in children)
            maxx = max(c[2] for c in children)
            maxy = max(c[3] for c in children)
            items[starts_bottom_up[lvl] + j] = (
                minx, miny, maxx, maxy,
                (child_start + lo) * NODE_ITEM_SIZE,
            )
    return b"".join(struct.pack("<4dQ", *it) for it in items)


def _search_index(
    index: bytes, n: int, node_size: int, rect: Tuple[float, float, float, float]
) -> List[int]:
    """Feature byte offsets (within the features section) whose bbox
    intersects rect, via the packed tree."""
    sizes = _tree_level_sizes(n, node_size)
    leaf_start = (sum(sizes) - n) * NODE_ITEM_SIZE
    rx0, ry0, rx1, ry1 = rect
    out = []
    stack = [0]  # byte offset of root node item
    while stack:
        base = stack.pop()
        is_leaf = base >= leaf_start
        count = node_size
        # clamp to level end: node items run to the end of their level
        for lvl in range(len(sizes)):
            start = (sum(sizes) - sum(sizes[: lvl + 1])) * NODE_ITEM_SIZE
            end = start + sizes[lvl] * NODE_ITEM_SIZE
            if start <= base < end:
                count = min(node_size, (end - base) // NODE_ITEM_SIZE)
                break
        for k in range(count):
            off = base + k * NODE_ITEM_SIZE
            minx, miny, maxx, maxy, ptr = struct.unpack_from("<4dQ", index, off)
            if maxx < rx0 or maxy < ry0 or minx > rx1 or miny > ry1:
                continue
            if is_leaf:
                out.append(ptr)
            else:
                stack.append(int(ptr))
    return out


# ---------------------------------------------------------------------------
# file writer / reader


def _geom_bounds(geom) -> Tuple[float, float, float, float]:
    b = geom.bounds
    return float(b.left), float(b.bottom), float(b.right), float(b.top)


def write_fgb(
    features: Sequence[Dict],
    schema: Sequence[Tuple[str, str]],
    geometry_type: str = "Unknown",
    name: str = "layer",
    crs_code: int = 4326,
    node_size: int = DEFAULT_NODE_SIZE,
) -> bytes:
    """Serialize features [{'geometry': <core geometry>, 'properties':
    {...}}] into one FlatGeobuf byte string. ``schema`` is an ordered
    [(column_name, column_type)] list (COLUMN_TYPES keys). Features are
    Hilbert-sorted when an index is written (node_size > 0), like the
    reference implementation."""
    feats = list(features)
    boxes = [_geom_bounds(f["geometry"]) for f in feats]
    if feats:
        minx = min(b[0] for b in boxes)
        miny = min(b[1] for b in boxes)
        maxx = max(b[2] for b in boxes)
        maxy = max(b[3] for b in boxes)
    else:
        minx = miny = maxx = maxy = 0.0
    indexed = node_size > 0 and len(feats) > 0
    if indexed:
        w = (maxx - minx) or 1.0
        h = (maxy - miny) or 1.0

        def hval(b):
            cx = (b[0] + b[2]) / 2.0
            cy = (b[1] + b[3]) / 2.0
            return hilbert_d(
                int(_HILBERT_MAX * (cx - minx) / w),
                int(_HILBERT_MAX * (cy - miny) / h),
            )

        order = sorted(range(len(feats)), key=lambda i: hval(boxes[i]))
        feats = [feats[i] for i in order]
        boxes = [boxes[i] for i in order]

    # header
    hb = Builder()
    col_locs = []
    for cname, ctype in schema:
        nm = hb.create_string(cname)
        hb.start_table(11)
        hb.add_offset(0, nm)
        hb.add_scalar(1, "B", 1, COLUMN_TYPES[ctype], 0)
        col_locs.append(hb.end_table())
    cols_vec = hb.create_offset_vector(col_locs) if col_locs else None
    hb.start_table(6)
    hb.add_scalar(1, "i", 4, int(crs_code), 0)
    crs_loc = hb.end_table()
    env_vec = hb.create_scalar_vector("d", 8, [minx, miny, maxx, maxy])
    name_loc = hb.create_string(name)
    hb.start_table(14)
    hb.add_offset(0, name_loc)
    hb.add_offset(1, env_vec)
    hb.add_scalar(2, "B", 1, GEOMETRY_TYPES[geometry_type], 0)
    hb.add_offset(7, cols_vec)
    hb.add_scalar(8, "Q", 8, len(feats), 0)
    hb.add_scalar(9, "H", 2, node_size if indexed else 0, 16)
    hb.add_offset(10, crs_loc)
    header = hb.finish(hb.end_table(), size_prefixed=True)

    # features (size-prefixed flatbuffers), tracking byte offsets
    bufs: List[bytes] = []
    offsets: List[int] = []
    pos = 0
    for f in feats:
        fb = Builder()
        geom_loc = _write_geometry(fb, f["geometry"])
        packed = _pack_properties(schema, f.get("properties") or {})
        props_vec = (
            fb.create_scalar_vector("B", 1, packed) if packed else None
        )
        fb.start_table(3)
        fb.add_offset(0, geom_loc)
        fb.add_offset(1, props_vec)
        raw = fb.finish(fb.end_table(), size_prefixed=True)
        offsets.append(pos)
        bufs.append(raw)
        pos += len(raw)

    index = _build_index(boxes, offsets, node_size) if indexed else b""
    return MAGIC + header + index + b"".join(bufs)


def read_fgb(buf: bytes, bbox: Optional[Tuple[float, float, float, float]] = None):
    """Parse an FGB byte string -> (header dict, [feature dict]).
    With ``bbox``, only features whose bounds intersect it are decoded
    (served straight from the packed R-tree)."""
    if buf[:8] != MAGIC:
        raise ValueError("not a FlatGeobuf (bad magic)")
    body = buf[8:]
    (hsize,) = struct.unpack_from("<I", body, 0)
    ht = root_table(body[: 4 + hsize], size_prefixed=True)
    cols = []
    for c in ht.table_vector(7) or []:
        cols.append((c.string(0), _COL_NAME[c.scalar(1, "B", 0)]))
    crs_t = ht.table(10)
    header = {
        "name": ht.string(0),
        "envelope": ht.scalar_vector(1, "d", 8),
        "geometry_type": _GEOM_NAME[ht.scalar(2, "B", 0)],
        "columns": cols,
        "features_count": ht.scalar(8, "Q", 0),
        "index_node_size": ht.scalar(9, "H", 16),
        "crs_code": crs_t.scalar(1, "i", 0) if crs_t else None,
    }
    pos = 4 + hsize
    n = header["features_count"]
    node_size = header["index_node_size"]
    isize = tree_size(n, node_size) if node_size > 0 else 0
    index = body[pos : pos + isize]
    feat_base = pos + isize

    wanted: Optional[set] = None
    if bbox is not None and isize:
        wanted = set(_search_index(index, n, node_size, bbox))

    feats = []
    fpos = feat_base
    while fpos < len(body):
        rel = fpos - feat_base  # this feature's offset (= leaf ptr)
        (fsize,) = struct.unpack_from("<I", body, fpos)
        if wanted is None or rel in wanted:
            ft = root_table(body[fpos : fpos + 4 + fsize], size_prefixed=True)
            geom_t = ft.table(0)
            raw_props = ft.bytes_vector(1) or b""
            feats.append(
                {
                    "geometry": _read_geometry(geom_t),
                    "properties": _unpack_properties(cols, bytes(raw_props)),
                }
            )
        fpos += 4 + fsize
    return header, feats
