"""FlatGeobuf codec (sources/fgb.py) + vector tile-directory export.

Reference parity target: formats/default/flatgeobuf.py (fiona/GDAL
driver) — here the format itself is implemented from the public spec,
so these tests pin the binary layout (magic, size-prefixed header,
packed Hilbert R-tree geometry) as well as value round-trips."""

import json
import os
import struct

import numpy as np
import pytest

from mapchete_spark.geometry.core import (
    LineString,
    MultiLineString,
    MultiPolygon,
    Point,
    Polygon,
)
from mapchete_spark.sources.fgb import (
    MAGIC,
    NODE_ITEM_SIZE,
    hilbert_d,
    read_fgb,
    tree_size,
    write_fgb,
)

SCHEMA = [
    ("fid", "long"), ("name", "string"), ("score", "double"),
    ("ok", "bool"), ("meta", "json"), ("blob", "binary"), ("cnt", "int"),
]


def _square(cx, cy, s=1.0):
    return Polygon(
        np.array(
            [[cx, cy], [cx + s, cy], [cx + s, cy + s], [cx, cy + s], [cx, cy]],
            dtype=np.float64,
        )
    )


def _corpus():
    rng = np.random.default_rng(3)
    feats = []
    for i in range(40):
        cx, cy = float(rng.uniform(-170, 170)), float(rng.uniform(-80, 80))
        feats.append(
            {
                "geometry": _square(cx, cy),
                "properties": {
                    "fid": i, "name": f"f{i}", "score": i * 0.5,
                    "ok": i % 2 == 0, "meta": {"a": i},
                    "blob": bytes([i, i + 1]), "cnt": -i,
                },
            }
        )
    hole = Polygon(
        np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]),
        (np.array([[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0], [2.0, 2.0]]),),
    )
    feats += [
        {"geometry": Point(1.5, 2.5),
         "properties": {"fid": 100, "name": "pt", "ok": True, "cnt": 7}},
        {"geometry": LineString(np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 1.0]])),
         "properties": {"fid": 101, "name": "ls", "score": 1.25, "ok": False,
                        "meta": [1, 2], "blob": b"", "cnt": 0}},
        {"geometry": MultiLineString(
            (LineString(np.array([[0.0, 0.0], [1.0, 0.0]])),
             LineString(np.array([[2.0, 2.0], [3.0, 3.0], [4.0, 2.0]])))),
         "properties": {"fid": 102, "name": "mls", "score": 2.0, "ok": True,
                        "meta": {}, "blob": b"xyz", "cnt": 1}},
        {"geometry": hole,
         "properties": {"fid": 103, "name": "holey", "score": 9.0, "ok": False,
                        "cnt": 2}},
        {"geometry": MultiPolygon((hole, _square(20.0, 20.0))),
         "properties": {"fid": 104, "name": "mp", "score": 3.5, "ok": True,
                        "meta": {"b": [1]}, "blob": b"\x00\x01", "cnt": 3}},
    ]
    return feats


class TestCodec:
    def test_roundtrip_all_types(self):
        feats = _corpus()
        buf = write_fgb(feats, SCHEMA, name="test", crs_code=4326)
        assert buf[:8] == MAGIC
        header, out = read_fgb(buf)
        assert header["features_count"] == len(feats)
        assert header["crs_code"] == 4326
        assert header["columns"] == SCHEMA
        by_in = {f["properties"]["fid"]: f for f in feats}
        by_out = {f["properties"]["fid"]: f for f in out}
        assert set(by_in) == set(by_out)
        for fid, fin in by_in.items():
            fout = by_out[fid]
            # null / absent properties drop out; the rest round-trip
            expect = {k: v for k, v in fin["properties"].items()
                      if v is not None}
            assert fout["properties"] == expect
            assert type(fout["geometry"]).__name__ == type(
                fin["geometry"]).__name__
        g = by_out[103]["geometry"]
        assert len(g.interiors) == 1
        assert g.area == by_in[103]["geometry"].area
        mp = by_out[104]["geometry"]
        assert len(mp.polygons) == 2 and mp.area == by_in[104]["geometry"].area

    def test_bbox_search_equals_brute_force(self):
        feats = _corpus()
        buf = write_fgb(feats, SCHEMA)
        for rect in [(0, 0, 5, 5), (-180, -90, 180, 90), (500, 500, 501, 501),
                     (-170, -80, -100, 0)]:
            _, sub = read_fgb(buf, bbox=rect)
            got = sorted(f["properties"]["fid"] for f in sub)
            exp = sorted(
                f["properties"]["fid"] for f in feats
                if not (f["geometry"].bounds.right < rect[0]
                        or f["geometry"].bounds.top < rect[1]
                        or f["geometry"].bounds.left > rect[2]
                        or f["geometry"].bounds.bottom > rect[3])
            )
            assert got == exp, rect

    def test_tree_layout_and_magic(self):
        """Binary layout pins: magic bytes per spec; index sized
        sum(levels)*40; root node's bbox equals the header envelope."""
        feats = _corpus()
        buf = write_fgb(feats, SCHEMA)
        n = len(feats)
        (hsize,) = struct.unpack_from("<I", buf, 8)
        idx_start = 8 + 4 + hsize
        isize = tree_size(n)
        assert isize == (n + int(np.ceil(n / 16)) + 1) * NODE_ITEM_SIZE
        minx, miny, maxx, maxy, _ = struct.unpack_from("<4dQ", buf, idx_start)
        header, _ = read_fgb(buf)
        assert [minx, miny, maxx, maxy] == header["envelope"]

    def test_unindexed_file(self):
        feats = _corpus()[:3]
        buf = write_fgb(feats, SCHEMA, node_size=0)
        header, out = read_fgb(buf)
        assert header["index_node_size"] == 0
        assert len(out) == 3
        # unindexed files keep input order
        assert [f["properties"]["fid"] for f in out] == [
            f["properties"]["fid"] for f in feats
        ]

    def test_hilbert_locality(self):
        """Adjacent Hilbert values are grid neighbors (the property the
        packed tree's page locality relies on)."""
        pts = {}
        for x in range(16):
            for y in range(16):
                pts[hilbert_d(x * 4096, y * 4096)] = (x, y)
        ds = sorted(pts)
        assert len(ds) == 256  # injective on the grid
        for a, b in zip(ds, ds[1:]):
            (x0, y0), (x1, y1) = pts[a], pts[b]
            assert abs(x0 - x1) + abs(y0 - y1) == 1

    def test_empty_layer(self):
        buf = write_fgb([], SCHEMA)
        header, out = read_fgb(buf)
        assert header["features_count"] == 0 and out == []


class TestVectorTileDirectory:
    def test_contours_fgb_tree_roundtrip(self, spark, tmp_path):
        from mapchete_spark.operators.process import (
            process_contours,
            run_vector_process,
        )
        from mapchete_spark.operators.rastertable import materialize_dem
        from mapchete_spark.sources.tiledir_export import (
            write_vector_tile_directory,
        )
        from mapchete_spark.tilegrid import Bounds, TilePyramid

        pyr = TilePyramid("geodetic")
        aoi = Bounds(0.0, 20.0, 22.5, 42.5)
        dem = materialize_dem(spark, 4, pyr, bounds=aoi, hole=False)
        feats = run_vector_process(
            dem, pyr, process_contours, params={"interval": 200}
        )
        rows = feats.collect()
        out = str(tmp_path / "fgbtree")
        n = write_vector_tile_directory(
            feats, out, pyr, schema=[("elev", "double")], name="contours"
        )
        with open(os.path.join(out, "metadata.json")) as f:
            meta = json.load(f)
        assert meta["driver"]["format"] == "tile_directory_fgb"
        assert meta["driver"]["schema"]["properties"] == {"elev": "double"}

        # decode every tile file; features must match the DataFrame rows
        from mapchete_spark.sources.fgb import read_fgb as _read

        expect = {}
        for r in rows:
            key = (r["zoom"], r["tile_row"], r["tile_col"])
            expect.setdefault(key, []).append(
                (json.loads(r["properties"])["elev"], len(r["geometry"]))
            )
        got_tiles = 0
        for zdir in os.listdir(out):
            if not zdir.isdigit():
                continue
            for rdir in os.listdir(os.path.join(out, zdir)):
                for fname in os.listdir(os.path.join(out, zdir, rdir)):
                    with open(os.path.join(out, zdir, rdir, fname), "rb") as f:
                        header, decoded = _read(f.read())
                    key = (int(zdir), int(rdir), int(fname.split(".")[0]))
                    assert header["geometry_type"] == "LineString"
                    assert len(decoded) == len(expect[key])
                    got_tiles += 1
                    levels = sorted(
                        f2["properties"]["elev"] for f2 in decoded
                    )
                    assert levels == sorted(e[0] for e in expect[key])
        assert got_tiles == n == len(expect)
