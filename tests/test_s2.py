"""S2 cell keys: Hilbert automaton properties + three-way parity
(numpy / Column / SQL)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from mapchete_spark.functions.s2 import (
    IJ_TO_POS,
    POS_TO_ORIENTATION,
    s2_key_np,
    s2_key_sql,
    with_s2_key,
)


def _pos_of(face, i, j, level):
    orient = face & 1
    pos = 0
    for k in range(level - 1, -1, -1):
        ij = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        sub = IJ_TO_POS[orient][ij]
        pos = pos * 4 + sub
        orient ^= POS_TO_ORIENTATION[sub]
    return pos


class TestHilbertAutomaton:
    def test_bijective_and_adjacent_on_all_faces(self):
        """The defining Hilbert property: the level-4 curve visits all
        n^2 cells of each face exactly once and consecutive curve
        positions are edge-adjacent."""
        level, n = 4, 16
        for face in range(6):
            grid = {}
            for i in range(n):
                for j in range(n):
                    grid[_pos_of(face, i, j, level)] = (i, j)
            assert len(grid) == n * n
            for p in range(n * n - 1):
                (i1, j1), (i2, j2) = grid[p], grid[p + 1]
                assert abs(i1 - i2) + abs(j1 - j2) == 1

    def test_parent_is_key_div_4(self):
        rng = np.random.RandomState(5)
        lon = rng.uniform(-180, 180, 1000)
        lat = rng.uniform(-89.9, 89.9, 1000)
        for lvl in (4, 9, 15):
            assert np.array_equal(
                s2_key_np(lon, lat, lvl) // 4, s2_key_np(lon, lat, lvl - 1)
            )

    def test_faces_partition_the_sphere(self):
        rng = np.random.RandomState(6)
        lon = rng.uniform(-180, 180, 5000)
        lat = rng.uniform(-89.9, 89.9, 5000)
        k = s2_key_np(lon, lat, 2)
        faces = k // 16
        assert set(faces.tolist()) == set(range(6))

    def test_locality_nearby_points_share_prefix(self):
        base = s2_key_np(np.array([11.0]), np.array([47.0]), 16)[0]
        near = s2_key_np(np.array([11.0001]), np.array([47.0001]), 16)[0]
        far = s2_key_np(np.array([-70.0]), np.array([-30.0]), 16)[0]
        # shared ancestor depth: nearby within a few levels, far none
        d = 0
        a, b = base, near
        while a != b:
            a //= 4
            b //= 4
            d += 1
        assert d <= 6
        assert far // (4**14) != base // (4**14)


class TestS2Parity:
    def test_column_and_sql_match_numpy(self, spark):
        from pyspark.sql import functions as SF

        rng = np.random.RandomState(31)
        lon = rng.uniform(-180, 180, 1500)
        lat = rng.uniform(-89.9, 89.9, 1500)
        pdf = pd.DataFrame({"doc_id": range(1500), "lon": lon, "lat": lat})
        sdf = spark.createDataFrame(pdf)
        out = (
            with_s2_key(sdf, level=12)
            .select("doc_id", "s2_key")
            .orderBy("doc_id")
            .toPandas()
        )
        npk = s2_key_np(lon, lat, 12)
        assert np.array_equal(out["s2_key"].values, npk)
        con = duckdb.connect()
        con.execute("CREATE TABLE documents AS SELECT * FROM pdf")
        d = con.execute(s2_key_sql("lon", "lat", 12) + " ORDER BY doc_id").df()
        assert np.array_equal(d["s2_key"].values, npk)

    def test_map_only_plan(self, spark):
        pdf = pd.DataFrame({"doc_id": [1], "lon": [0.0], "lat": [0.0]})
        plan = (
            with_s2_key(spark.createDataFrame(pdf), level=12)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
