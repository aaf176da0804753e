"""Pure-python GeoPackage (GPKG) writer/reader on stdlib ``sqlite3``.

The reference produces GPKG in two places — per-zoom tile-index files
(``mapchete index --gpkg``, mapchete/index.py:60-100,205-320, via
fiona's GPKG driver) and vector-file input (``.gpkg`` in
formats/default/vector_file.py:43). This container has no fiona/GDAL,
but GeoPackage is "just" SQLite (stdlib) plus three registry tables
and a 2-byte-magic geometry BLOB, all specified publicly in OGC
12-128r18 (GeoPackage 1.3). Implementing the spec directly — the same
move that replaced rasterio for GeoTIFF (sources/gtiff.py) and fiona
for FlatGeobuf (sources/fgb.py) — closes the last env-imposed S9 gap.

Spec subset implemented:

- ``PRAGMA application_id = 0x47504B47`` ('GPKG') and
  ``user_version = 10300`` (GeoPackage 1.3.0), Req 2.
- ``gpkg_spatial_ref_sys`` with the three mandatory rows (4326, -1
  undefined cartesian, 0 undefined geographic), Req 11.
- ``gpkg_contents`` (Req 13) and ``gpkg_geometry_columns`` (Req 21)
  rows per feature table.
- GeometryBlob format (Req 19): magic ``GP``, version 0, flags byte
  (little-endian header, envelope indicator 1 = [minx,maxx,miny,maxy]),
  int32 srs_id, envelope doubles, then ISO WKB via geometry/wkb.py.

Determinism: ``last_change`` is pinned (not wall-clock) so identical
inputs produce byte-identical registry rows — the engine's exports are
content-addressed in tests.

Scale shape: GPKG files are written one-per-task inside
``foreachPartition`` (like the FGB tree) or driver-side for the
per-zoom tile index, which is O(tiles-at-zoom) rows — the same
driver-side-with-size-guard posture as the GeoJSON index
(sources/tiledir_export.py:241).
"""

from __future__ import annotations

import os
import sqlite3
import struct
from typing import Dict, List, Optional, Sequence, Tuple

from mapchete_spark.geometry.wkb import from_wkb, to_wkb

_APPLICATION_ID = 0x47504B47  # 'GPKG'
_USER_VERSION = 10300  # GeoPackage 1.3.0
_LAST_CHANGE = "2000-01-01T00:00:00.000Z"  # pinned: deterministic output

_WGS84_WKT = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],UNIT["degree",'
    '0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4326"]]'
)

# schema column type -> SQLite declared type (GPKG table 1, Req 5)
_SQL_TYPES = {
    "double": "DOUBLE",
    "float": "FLOAT",
    "int": "MEDIUMINT",
    "integer": "INTEGER",
    "long": "INTEGER",
    "bigint": "INTEGER",
    "str": "TEXT",
    "string": "TEXT",
    "text": "TEXT",
    "bool": "BOOLEAN",
}


def _geometry_blob(geom, srs_id: int) -> bytes:
    """GeometryBlob per spec Req 19: GP magic, version 0, flags with
    envelope indicator 1 (2D envelope) + little-endian bit, srs_id,
    envelope, WKB."""
    b = geom.bounds
    flags = 0b00000011  # envelope indicator 1 (bits 1-3), LE header (bit 0)
    header = b"GP" + struct.pack("<BB", 0, flags) + struct.pack("<i", srs_id)
    envelope = struct.pack("<4d", b.left, b.right, b.bottom, b.top)
    return header + envelope + to_wkb(geom)


def _parse_geometry_blob(blob: bytes):
    """Returns (srs_id, envelope_or_None, geometry)."""
    if blob[:2] != b"GP":
        raise ValueError("not a GPKG geometry blob (bad magic)")
    version, flags = blob[2], blob[3]
    if version != 0:
        raise ValueError(f"unsupported GPKG geometry blob version {version}")
    le = bool(flags & 1)
    env_ind = (flags >> 1) & 0b111
    bo = "<" if le else ">"
    (srs_id,) = struct.unpack(f"{bo}i", blob[4:8])
    n_env = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}.get(env_ind)
    if n_env is None:
        raise ValueError(f"invalid envelope indicator {env_ind}")
    off = 8 + 8 * n_env
    envelope = (
        struct.unpack(f"{bo}{n_env}d", blob[8:off]) if n_env else None
    )
    return srs_id, envelope, from_wkb(blob[off:])


def _init_gpkg(conn: sqlite3.Connection) -> None:
    cur = conn.cursor()
    cur.execute(f"PRAGMA application_id = {_APPLICATION_ID}")
    cur.execute(f"PRAGMA user_version = {_USER_VERSION}")
    cur.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
            srs_name TEXT NOT NULL,
            srs_id INTEGER PRIMARY KEY,
            organization TEXT NOT NULL,
            organization_coordsys_id INTEGER NOT NULL,
            definition TEXT NOT NULL,
            description TEXT)"""
    )
    cur.executemany(
        "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        [
            ("WGS 84 geodetic", 4326, "EPSG", 4326, _WGS84_WKT, None),
            ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
            ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
        ],
    )
    cur.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_contents (
            table_name TEXT NOT NULL PRIMARY KEY,
            data_type TEXT NOT NULL,
            identifier TEXT UNIQUE,
            description TEXT DEFAULT '',
            last_change DATETIME NOT NULL,
            min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
            srs_id INTEGER,
            CONSTRAINT fk_gc_r_srs_id FOREIGN KEY (srs_id)
                REFERENCES gpkg_spatial_ref_sys(srs_id))"""
    )
    cur.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
            table_name TEXT NOT NULL,
            column_name TEXT NOT NULL,
            geometry_type_name TEXT NOT NULL,
            srs_id INTEGER NOT NULL,
            z TINYINT NOT NULL,
            m TINYINT NOT NULL,
            CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"""
    )
    conn.commit()


def _ensure_srs(conn: sqlite3.Connection, srs_id: int, definition: str) -> None:
    conn.execute(
        "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
        (f"EPSG:{srs_id}", srs_id, "EPSG", srs_id, definition, None),
    )


def write_gpkg(
    path: str,
    features: Sequence[Dict],
    schema: Sequence[Tuple[str, str]],
    layer: str = "layer",
    srs_id: int = 4326,
    geometry_type: Optional[str] = None,
    srs_definition: str = "undefined",
) -> int:
    """Write ``features`` (``{"geometry": Geometry, "properties":
    dict}`` rows, the engine's in-memory vector feature shape) as one
    GPKG layer. ``schema`` is the ordered [(name, type)] property list,
    like the reference's output ``schema.properties`` config. Appends
    the layer if ``path`` already is a GeoPackage (the per-zoom index
    files each hold one layer; multi-layer packs are valid spec-wise).
    Returns the feature count."""
    if not features:
        raise ValueError("refusing to write an empty GPKG layer")
    import re as _re

    if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", layer):
        raise ValueError(
            f"invalid layer name {layer!r} (identifier required — the "
            "name is interpolated into DDL)"
        )
    for name, _t in schema:
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", str(name)):
            raise ValueError(f"invalid property column name {name!r}")
    gtypes = {f["geometry"].geom_type for f in features}
    gt = geometry_type or (gtypes.pop().upper() if len(gtypes) == 1 else "GEOMETRY")
    cols = ", ".join(
        f'"{name}" {_SQL_TYPES.get(str(ctype).lower(), "TEXT")}'
        for name, ctype in schema
    )
    conn = sqlite3.connect(path)
    try:
        _init_gpkg(conn)
        if srs_id not in (4326, 0, -1):
            _ensure_srs(conn, srs_id, srs_definition)
        conn.execute(
            f'''CREATE TABLE "{layer}" (
                fid INTEGER PRIMARY KEY AUTOINCREMENT,
                geom BLOB{"," if cols else ""} {cols})'''
        )
        minx = min(f["geometry"].bounds.left for f in features)
        miny = min(f["geometry"].bounds.bottom for f in features)
        maxx = max(f["geometry"].bounds.right for f in features)
        maxy = max(f["geometry"].bounds.top for f in features)
        conn.execute(
            "INSERT INTO gpkg_contents VALUES (?,?,?,?,?,?,?,?,?,?)",
            (layer, "features", layer, "", _LAST_CHANGE,
             minx, miny, maxx, maxy, srs_id),
        )
        conn.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?,?,?,?,?,?)",
            (layer, "geom", gt.upper(), srs_id, 0, 0),
        )
        names = [name for name, _ in schema]
        placeholders = ",".join("?" * (1 + len(names)))
        conn.executemany(
            f'INSERT INTO "{layer}" (geom{"".join("," + chr(34) + n + chr(34) for n in names)}) '
            f"VALUES ({placeholders})",
            (
                tuple(
                    [_geometry_blob(f["geometry"], srs_id)]
                    + [f["properties"].get(n) for n in names]
                )
                for f in features
            ),
        )
        conn.commit()
    finally:
        conn.close()
    return len(features)


def read_gpkg(path: str, layer: Optional[str] = None):
    """Read one layer back: returns (header, features) mirroring
    ``read_fgb`` — header has layer/srs_id/geometry_type/feature count
    and the gpkg_contents bbox; features are
    ``{"geometry": Geometry, "properties": dict}`` rows in fid order.
    Validates the application_id magic and each blob's envelope
    against its decoded geometry."""
    conn = sqlite3.connect(path)
    try:
        (app_id,) = conn.execute("PRAGMA application_id").fetchone()
        if app_id != _APPLICATION_ID:
            raise ValueError(f"not a GeoPackage (application_id={app_id:#x})")
        layers = [r[0] for r in conn.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type='features' "
            "ORDER BY table_name")]
        if layer is None:
            if len(layers) != 1:
                raise ValueError(f"layer required; package has {layers}")
            layer = layers[0]
        elif layer not in layers:
            raise ValueError(f"no such layer {layer!r}; package has {layers}")
        gc = conn.execute(
            "SELECT geometry_type_name, srs_id, column_name "
            "FROM gpkg_geometry_columns "
            "WHERE table_name=?", (layer,)).fetchone()
        ct = conn.execute(
            "SELECT min_x, min_y, max_x, max_y, srs_id FROM gpkg_contents "
            "WHERE table_name=?", (layer,)).fetchone()
        # OGC 12-128r18 does not fix the geometry column or PK names
        # ('geom'/'fid' are conventions, not requirements): the
        # geometry column comes from gpkg_geometry_columns.column_name
        # (Req 21) and the PK is the table's INTEGER PRIMARY KEY per
        # PRAGMA table_info — externally-produced packages use e.g.
        # 'geometry'/'id'. Fall back to rowid ordering when the PK is
        # not a single integer column.
        def _qi(name: str) -> str:
            # quote an identifier read from package metadata; doubling
            # embedded quotes is the sqlite escape
            return '"' + str(name).replace('"', '""') + '"'

        geom_col = gc[2]
        info = list(conn.execute(f"PRAGMA table_info({_qi(layer)})"))
        pk_cols = [r for r in info if r[5] > 0]
        pk = (
            pk_cols[0][1]
            if len(pk_cols) == 1
            and str(pk_cols[0][2]).upper() == "INTEGER"
            else None
        )
        prop_cols = [
            r[1] for r in info if r[1] not in (pk, geom_col)
        ]
        sel = ", ".join([_qi(geom_col)] + [_qi(c) for c in prop_cols])
        order = _qi(pk) if pk else "rowid"
        features: List[Dict] = []
        for row in conn.execute(
            f"SELECT {sel} FROM {_qi(layer)} ORDER BY {order}"
        ):
            srs_id, envelope, geom = _parse_geometry_blob(row[0])
            if srs_id != gc[1]:
                raise ValueError(
                    f"blob srs_id {srs_id} != layer srs_id {gc[1]}")
            if envelope is not None:
                b = geom.bounds
                got = (b.left, b.right, b.bottom, b.top)
                if any(abs(e - g) > 1e-9 for e, g in zip(envelope[:4], got)):
                    raise ValueError(
                        f"blob envelope {envelope[:4]} != geometry {got}")
            features.append(
                {"geometry": geom,
                 "properties": dict(zip(prop_cols, row[1:]))}
            )
        header = {
            "layer": layer,
            "geometry_type": gc[0],
            "srs_id": gc[1],
            "features_count": len(features),
            "bbox": tuple(ct[:4]),
            "bbox_srs_id": ct[4],
        }
        return header, features
    finally:
        conn.close()


def write_gpkg_tile_index(
    index_rows: Sequence[Dict],
    out_dir: str,
    zoom: int,
    srs_id: int = 4326,
    layer: Optional[str] = None,
) -> str:
    """Per-zoom GPKG tile index, the reference's ``mapchete index
    --gpkg`` output (mapchete/index.py:60-100 writes ``{zoom}.gpkg``
    per zoom). Field schema matches the reference's spatial_schema +
    writer (index.py:48-51, 270-283) so consumers keyed on its fields
    read both interchangeably: ``tile_id`` is ``str(tile.id)`` — the
    "(zoom, row, col)" tuple rendering — and zoom/row/col are written
    as STRINGS (the reference passes str() despite the declared int
    schema; fiona coerces, we match the written form), plus the
    ``location`` path field. ``index_rows`` carry zoom/tile_row/
    tile_col/left/bottom/right/top[/location]. Returns the file
    path."""
    import numpy as np

    from mapchete_spark.geometry.core import Polygon

    feats = []
    for r in index_rows:
        left, bottom = float(r["left"]), float(r["bottom"])
        right, top = float(r["right"]), float(r["top"])
        ring = np.array(
            [[left, bottom], [right, bottom], [right, top],
             [left, top], [left, bottom]]
        )
        z, tr, tc = int(r["zoom"]), int(r["tile_row"]), int(r["tile_col"])
        feats.append(
            {
                "geometry": Polygon(ring),
                "properties": {
                    "tile_id": str((z, tr, tc)),
                    # int-typed, matching the reference's spatial_schema
                    # (index.py:50 declares zoom/row/col int; ADVICE r6
                    # #2 — the earlier str values broke schema parity)
                    "zoom": z,
                    "row": tr,
                    "col": tc,
                    "location": r.get(
                        "location", f"{z}/{tr}/{tc}.tif"
                    ),
                },
            }
        )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{zoom}.gpkg")
    if os.path.exists(path):
        os.remove(path)
    write_gpkg(
        path,
        feats,
        schema=[("tile_id", "str"), ("zoom", "int"), ("row", "int"),
                ("col", "int"), ("location", "str")],
        layer=layer or f"index_z{zoom}",
        srs_id=srs_id,
        geometry_type="POLYGON",
    )
    return path
