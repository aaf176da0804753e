"""GeoPackage codec tests (sources/gpkg.py): OGC 12-128r18 conformance
of the stdlib-sqlite3 writer, blob-level validation, and the tile-index
writer the reference produces via ``mapchete index --gpkg``
(mapchete/index.py:60-100,205-320)."""

import os
import sqlite3

import numpy as np
import pytest

from mapchete_spark.geometry.core import LineString, Point, Polygon
from mapchete_spark.sources.gpkg import (
    _APPLICATION_ID,
    _parse_geometry_blob,
    read_gpkg,
    write_gpkg,
    write_gpkg_tile_index,
)


def _square(x0, y0, s=1.0):
    return Polygon(
        np.array(
            [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]],
            dtype=float,
        )
    )


@pytest.fixture()
def pack(tmp_path):
    path = os.path.join(tmp_path, "t.gpkg")
    feats = [
        {"geometry": _square(0, 0), "properties": {"name": "a", "v": 1.5}},
        {"geometry": _square(2, 2), "properties": {"name": "b", "v": -2.0}},
        {"geometry": _square(-1, -3, 0.5), "properties": {"name": None, "v": 0.0}},
    ]
    write_gpkg(path, feats, schema=[("name", "str"), ("v", "double")],
               layer="polys")
    return path, feats


def test_roundtrip(pack):
    path, feats = pack
    header, back = read_gpkg(path)
    assert header["features_count"] == len(feats)
    assert header["geometry_type"] == "POLYGON"
    assert header["srs_id"] == 4326
    assert header["bbox"] == (-1.0, -3.0, 3.0, 3.0)
    for orig, dec in zip(feats, back):
        assert dec["geometry"].bounds == orig["geometry"].bounds
        assert dec["properties"] == orig["properties"]


def test_spec_conformance(pack):
    """The registry tables and pragmas a generic GPKG reader checks."""
    path, _ = pack
    conn = sqlite3.connect(path)
    (app_id,) = conn.execute("PRAGMA application_id").fetchone()
    assert app_id == _APPLICATION_ID  # 'GPKG'
    (uv,) = conn.execute("PRAGMA user_version").fetchone()
    assert uv == 10300
    # three mandatory SRS rows (Req 11)
    srs = {r[0] for r in conn.execute(
        "SELECT srs_id FROM gpkg_spatial_ref_sys")}
    assert {4326, 0, -1} <= srs
    row = conn.execute(
        "SELECT data_type, srs_id FROM gpkg_contents "
        "WHERE table_name='polys'").fetchone()
    assert row == ("features", 4326)
    row = conn.execute(
        "SELECT column_name, geometry_type_name, z, m "
        "FROM gpkg_geometry_columns WHERE table_name='polys'").fetchone()
    assert row == ("geom", "POLYGON", 0, 0)
    conn.close()


def test_geometry_blob_layout(pack):
    path, feats = pack
    conn = sqlite3.connect(path)
    blob = conn.execute(
        "SELECT geom FROM polys ORDER BY fid LIMIT 1").fetchone()[0]
    conn.close()
    assert blob[:2] == b"GP" and blob[2] == 0
    srs_id, envelope, geom = _parse_geometry_blob(blob)
    assert srs_id == 4326
    b = feats[0]["geometry"].bounds
    assert envelope == (b.left, b.right, b.bottom, b.top)
    assert geom.bounds == b


def test_mixed_and_nonpolygon_types(tmp_path):
    path = os.path.join(tmp_path, "m.gpkg")
    feats = [
        {"geometry": Point(1.0, 2.0), "properties": {"k": 1}},
        {"geometry": LineString(np.array([[0, 0], [1, 1]], float)),
         "properties": {"k": 2}},
    ]
    write_gpkg(path, feats, schema=[("k", "int")], layer="mix")
    header, back = read_gpkg(path)
    assert header["geometry_type"] == "GEOMETRY"
    assert back[0]["geometry"].geom_type == "Point"
    assert back[1]["geometry"].geom_type == "LineString"


def test_rejects_non_gpkg(tmp_path):
    path = os.path.join(tmp_path, "plain.sqlite")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE t (a)")
    conn.commit()
    conn.close()
    with pytest.raises(ValueError, match="application_id"):
        read_gpkg(path)


def test_rejects_empty_layer(tmp_path):
    with pytest.raises(ValueError, match="empty"):
        write_gpkg(os.path.join(tmp_path, "e.gpkg"), [], schema=[])


def test_layer_selection(tmp_path):
    path = os.path.join(tmp_path, "two.gpkg")
    write_gpkg(path, [{"geometry": _square(0, 0), "properties": {}}],
               schema=[], layer="one")
    write_gpkg(path, [{"geometry": _square(5, 5), "properties": {}}],
               schema=[], layer="two")
    with pytest.raises(ValueError, match="layer required"):
        read_gpkg(path)
    h, feats = read_gpkg(path, layer="two")
    assert feats[0]["geometry"].bounds.left == 5.0
    with pytest.raises(ValueError, match="no such layer"):
        read_gpkg(path, layer="three")


def test_tile_index(tmp_path):
    rows = [
        dict(zoom=3, tile_row=r, tile_col=c,
             left=-180 + c * 22.5, bottom=90 - (r + 1) * 22.5,
             right=-180 + (c + 1) * 22.5, top=90 - r * 22.5)
        for r in range(2) for c in range(3)
    ]
    path = write_gpkg_tile_index(rows, str(tmp_path), 3)
    assert path.endswith("3.gpkg")
    header, feats = read_gpkg(path)
    assert header["features_count"] == 6
    assert header["geometry_type"] == "POLYGON"
    # reference field parity (mapchete/index.py:48-51): the fiona
    # spatial_schema declares zoom/row/col INT, so the stored columns
    # are INTEGER (ADVICE r6 #2 — str values broke schema parity)
    got = {(f["properties"]["row"], f["properties"]["col"]) for f in feats}
    assert got == {(r, c) for r in range(2) for c in range(3)}
    f0 = next(f for f in feats
              if (f["properties"]["row"], f["properties"]["col"]) == (0, 0))
    assert tuple(f0["geometry"].bounds) == (-180.0, 67.5, -157.5, 90.0)
    assert f0["properties"]["location"] == "3/0/0.tif"
    assert f0["properties"]["tile_id"] == "(3, 0, 0)"
    assert f0["properties"]["zoom"] == 3
    # idempotent overwrite
    path2 = write_gpkg_tile_index(rows, str(tmp_path), 3)
    assert path2 == path
    _, feats2 = read_gpkg(path2)
    assert len(feats2) == 6
