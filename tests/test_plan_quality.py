"""Physical-plan regression tests: the .explain audits as assertions.

These lock in the scale properties the engine promises (SURVEY.md §4):
column pruning reaches the parquet scan, small dimensions broadcast,
algebraic tile reductions use exactly one shuffle pair, and the
assignment fan-out adds no shuffle at all.
"""

import re

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


SF = "/root/testdata/sf0.001"


class TestPruningAndPushdown:
    def test_assign_reads_only_doc_id(self, spark):
        import __spark_entry__ as e

        df = e.queries()["tile_assign_z8"](spark, SF)
        plan = plan_of(df)
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m, plan
        assert m.group(1) == "doc_id:bigint"

    def test_quality_reads_only_needed_columns(self, spark):
        import __spark_entry__ as e

        plan = plan_of(e.queries()["text_quality"](spark, SF))
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        cols = set(c.split(":")[0] for c in m.group(1).split(","))
        assert cols == {"doc_id", "text"}  # lang/source/n_chars pruned


class TestJoins:
    def test_cosine_topk_broadcasts_queries(self, spark):
        import __spark_entry__ as e

        plan = plan_of(e.queries()["cosine_topk"](spark, SF))
        assert "Broadcast" in plan

    def test_revenue_join_broadcasts_nation(self, spark):
        import __spark_entry__ as e

        plan = plan_of(e.queries()["revenue_by_nation"](spark, SF))
        assert "BroadcastHashJoin" in plan

    def test_minhash_bucket_join_is_equi(self, spark):
        import __spark_entry__ as e

        plan = plan_of(e.queries()["minhash_lsh"](spark, SF))
        # bucket join must be hash-based (broadcast or sort-merge),
        # never a nested-loop cross product
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestShuffleBudget:
    def _exchanges(self, plan: str) -> int:
        return len(re.findall(r"\bExchange\b", plan))

    def test_assign_fanout_adds_no_shuffle(self, spark):
        """explode(sequence) over 13 zooms stays in one stage."""
        from mapchete_spark.operators.assign import assign_point_tiles
        from mapchete_spark.sources.tables import load_docs

        df = assign_point_tiles(load_docs(spark, SF), range(0, 13))
        assert self._exchanges(plan_of(df)) == 0

    def test_algebraic_tile_reduce_single_shuffle(self, spark):
        from mapchete_spark.operators.assign import assign_point_tiles
        from mapchete_spark.operators.pyramid import reduce_docs_to_tiles
        from mapchete_spark.sources.tables import load_docs

        assigned = assign_point_tiles(load_docs(spark, SF), [8])
        df = reduce_docs_to_tiles(assigned, {"n": F.count(F.lit(1))})
        assert self._exchanges(plan_of(df)) == 1

    def test_output_split_adds_no_shuffle(self, spark):
        from mapchete_spark.operators.outputsplit import split_to_output_tiles
        from mapchete_spark.operators.rastertable import materialize_dem
        from mapchete_spark.tilegrid import Bounds, TilePyramid

        meta = TilePyramid("geodetic", metatiling=4)
        base = TilePyramid("geodetic")
        dem = materialize_dem(spark, 4, meta, bounds=Bounds(0, 20, 20, 40), hole=False)
        n_before = self._exchanges(plan_of(dem))
        out = split_to_output_tiles(dem, meta, base)
        assert self._exchanges(plan_of(out)) == n_before  # narrow op

    def test_upsample_adds_no_shuffle(self, spark):
        from mapchete_spark.operators.overviews import overview_upsample
        from mapchete_spark.operators.rastertable import materialize_dem
        from mapchete_spark.tilegrid import Bounds, TilePyramid

        pyr = TilePyramid("geodetic")
        dem = materialize_dem(spark, 4, pyr, bounds=Bounds(0, 20, 20, 40), hole=False)
        n_before = self._exchanges(plan_of(dem))
        up = overview_upsample(dem, pyr)
        assert self._exchanges(plan_of(up)) == n_before


class TestRound2Plans:
    def test_ngram_df_cap_is_broadcast_anti(self, spark):
        """The stop-shingle filter must be a broadcast LEFT ANTI join
        (the hot set is tiny); a shuffled anti-join or window over the
        shingle key would re-create the skew the cap removes.
        eager_release=False exposes the lazy plan (the default eagerly
        checkpoints so the shingle persist can be released)."""
        from mapchete_spark.operators.dedup import ngram_jaccard_pairs
        from mapchete_spark.sources.tables import load_table

        docs = load_table(spark, SF, "documents")
        plan = plan_of(ngram_jaccard_pairs(docs, threshold=0.3, eager_release=False))
        assert re.search(r"BroadcastHashJoin .*LeftAnti", plan), plan[:2000]
        assert "Window" not in plan

    def test_line_clip_no_cartesian(self, spark):
        import __spark_entry__ as e

        plan = plan_of(e.queries()["line_clip"](spark, SF))
        assert "CartesianProduct" not in plan

    def test_utm_reproject_prunes_scan(self, spark):
        import __spark_entry__ as e

        plan = plan_of(e.queries()["utm_reproject"](spark, SF))
        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1) == "doc_id:bigint"

    def test_minhash_clusters_no_cartesian(self, spark):
        """The CC label-propagation rounds must stay hash-join based."""
        from mapchete_spark.operators.dedup import minhash_lsh_clusters
        from mapchete_spark.sources.tables import load_table

        docs = load_table(spark, SF, "documents").limit(100)
        df = minhash_lsh_clusters(docs, max_iterations=2)
        assert "CartesianProduct" not in plan_of(df)

    def test_sessionize_single_window_shuffle(self, spark):
        """Sessionization = one window partition-by user (lag + cumsum
        share it) + the final aggregate; no extra exchanges."""
        from mapchete_spark.streaming.pipeline import sessionize_events

        ev = spark.read.parquet(SF + "/events.parquet")
        plan = plan_of(sessionize_events(ev))
        # both window functions evaluate within the same user_id
        # partitioning; exchanges: scan->window (1) + final agg reuses it
        n_exchanges = plan.count("Exchange")
        assert n_exchanges <= 2, plan[:1500]
