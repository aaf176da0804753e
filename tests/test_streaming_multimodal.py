"""Streaming pipelines (stream == batch on bounded input; checkpoint
resume processes only new files) and multimodal binary-column ops."""

import json
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapchete_spark.operators.multimodal import (
    extract_media_features,
    synthetic_media,
)
from mapchete_spark.streaming.pipeline import (
    batch_events_windowed,
    stream_docs_to_tiles,
    stream_events_windowed,
)

SF = "/root/testdata/sf0.001"



@pytest.fixture(scope="module")
def stream_runs(spark, tmp_path_factory):
    """The seven heavy streaming scenarios own their source/checkpoint/
    output dirs and are independent — run them CONCURRENTLY on the
    shared session (conftest.run_concurrently); assertions run inside
    the thunks, failures re-raise per-test."""
    from tests.conftest import run_concurrently

    base = tmp_path_factory.mktemp("streams")

    def mk(key, fn):
        def thunk():
            d = base / key
            d.mkdir()
            fn(spark, d)
        return thunk

    return run_concurrently(
        {k: mk(k, fn) for k, fn in dict(
            windowed=_run_windowed,
            resume=_run_resume,
            stateful_dedup=_run_stateful_dedup,
            pyramid=_run_pyramid,
            chunking=_run_chunking,
            decontam=_run_decontam,
            quality=_run_quality,
        ).items()},
        max_workers=7,
    )


def _run_windowed(spark, tmp_path):
        # the file stream source requires a directory
        src = tmp_path / "events_dir"
        src.mkdir()
        shutil.copy(f"{SF}/events.parquet", src / "events.parquet")
        q = stream_events_windowed(
            spark,
            str(src),
            str(tmp_path / "ckpt"),
            str(tmp_path / "out"),
        )
        q.awaitTermination(120)
        got = spark.read.parquet(str(tmp_path / "out"))
        want = batch_events_windowed(spark, f"{SF}/events.parquet")
        g = sorted(tuple(r) for r in got.collect())
        w = sorted(tuple(r) for r in want.collect())
        # append-mode semantics: windows still inside the watermark
        # horizon at end-of-input are never finalized — the stream
        # output is the batch result minus only those trailing windows
        assert len(g) > 0
        assert set(g) <= set(w)
        missing = sorted(set(w) - set(g))
        if missing:
            horizon_start = min(m[0] for m in missing)
            max_end = max(x[1] for x in w)
            # all missing windows sit within the 2h watermark of the end
            assert (max_end - horizon_start).total_seconds() <= 3 * 3600

def _run_resume(spark, tmp_path):
        src = tmp_path / "docs_src"
        src.mkdir()
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        docs.where(F.col("doc_id") < 250).coalesce(1).write.mode("overwrite").parquet(
            str(src / "batch1")
        )
        # stream over a glob dir: use the parent with two subdirs merged
        flat = tmp_path / "flat"
        flat.mkdir()
        for f in (src / "batch1").glob("*.parquet"):
            shutil.copy(f, flat / "a.parquet")
        q = stream_docs_to_tiles(
            spark, str(flat), str(tmp_path / "ck"), str(tmp_path / "out"), zoom=8
        )
        q.awaitTermination(120)
        n1 = spark.read.parquet(str(tmp_path / "out")).count()
        assert n1 == 250
        # add new file, resume from checkpoint: only the delta processed
        docs.where(F.col("doc_id") >= 250).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / "batch2"))
        for f in (src / "batch2").glob("*.parquet"):
            shutil.copy(f, flat / "b.parquet")
        q2 = stream_docs_to_tiles(
            spark, str(flat), str(tmp_path / "ck"), str(tmp_path / "out"), zoom=8
        )
        q2.awaitTermination(120)
        out = spark.read.parquet(str(tmp_path / "out"))
        assert out.count() == docs.count()
        # assignments identical to the batch path
        from mapchete_spark.operators.assign import assign_point_tiles
        from mapchete_spark.sources.tables import load_docs

        batch = assign_point_tiles(load_docs(spark, SF), [8]).select(
            "doc_id", "tile_row", "tile_col"
        )
        a = sorted(tuple(r) for r in out.select("doc_id", "tile_row", "tile_col").collect())
        b = sorted(tuple(r) for r in batch.collect())
        assert a == b


class TestStreaming:
    def test_windowed_agg_stream_equals_batch(self, stream_runs):
        from tests.conftest import assert_ok

        assert_ok(stream_runs, "windowed")

    def test_stream_docs_checkpoint_resume(self, stream_runs):
        from tests.conftest import assert_ok

        assert_ok(stream_runs, "resume")


class TestMultimodal:
    def test_media_deterministic(self, spark):
        a = synthetic_media(spark, 30).select("media_ref", F.md5("payload")).collect()
        b = synthetic_media(spark, 30).select("media_ref", F.md5("payload")).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_feature_extraction(self, spark):
        media = synthetic_media(spark, 60)
        feats = extract_media_features(media).collect()
        assert len(feats) == 60
        by_kind = {}
        for r in feats:
            by_kind.setdefault(r["kind"], []).append(r)
        assert set(by_kind) == {"image", "audio", "video"}
        img = by_kind["image"][0]
        assert len(img["signature"]) == 64  # 8x8 thumbnail bits
        assert 0 <= img["feat_mean"] <= 255
        aud = by_kind["audio"][0]
        assert 0 <= aud["feat_mean"] <= 1.0

    def test_pluggable_decoder_reaches_executors(self, spark):
        """A registered toy decoder replaces the stub without touching
        the operator: every image decodes to a constant array, so the
        features show mean 7 / std 0 through the real Spark plumbing."""
        import numpy as np

        from mapchete_spark.operators.multimodal import (
            extract_media_features,
            register_media_decoder,
            MEDIA_DECODERS,
            _fake_decode,
        )

        def toy(kind, payload, meta):
            return np.full((16, 16, 3), 7, dtype=np.uint8)

        register_media_decoder("image", toy)
        try:
            media = synthetic_media(spark, 40)
            feats = extract_media_features(media).collect()
            imgs = [r for r in feats if r["kind"] == "image"]
            assert imgs and all(r["feat_mean"] == 7.0 for r in imgs)
            assert all(r["feat_std"] == 0.0 for r in imgs)
            # other kinds still use the stub
            auds = [r for r in feats if r["kind"] == "audio"]
            assert auds and any(r["feat_std"] > 0 for r in auds)
            # per-call override beats the registry
            feats2 = extract_media_features(
                media, decoders={"image": _fake_decode}
            ).collect()
            imgs2 = [r for r in feats2 if r["kind"] == "image"]
            assert any(r["feat_std"] > 0 for r in imgs2)
        finally:
            MEDIA_DECODERS["image"] = _fake_decode

    def test_spans_media_join(self, spark):
        from mapchete_spark.functions.spans import with_spans
        from mapchete_spark.operators.multimodal import join_spans_to_media
        from mapchete_spark.sources.tables import load_docs

        docs = load_docs(spark, SF, with_spans_col=True, geo=False).limit(20)
        flat = docs.select(
            "doc_id", F.explode("spans").alias("s")
        ).select("doc_id", F.col("s.kind").alias("kind"), F.col("s.media_ref").alias("media_ref"))
        media = synthetic_media(spark, 50)
        joined = join_spans_to_media(flat, media)
        assert joined.count() == flat.where(F.col("kind") != "text").count()

    def test_png_codec_roundtrip_all_types_and_filters(self):
        import struct
        import zlib

        from mapchete_spark.sources.png_codec import (
            _MAGIC,
            decode_png,
            encode_png_rgb,
        )
        from mapchete_spark.sources.tiledir_export import encode_png

        rng = np.random.default_rng(7)
        gray = rng.integers(0, 256, (13, 17), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(gray)), gray)
        ga = rng.integers(0, 256, (9, 5, 2), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(ga)), ga)
        rgba = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(rgba)), rgba)
        rgb = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png_rgb(rgb)), rgb)

        # foreign PNGs use Sub/Up/Average/Paeth filters our encoder
        # never emits — forward-filter by hand, decoder must invert
        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        arr = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
        h, w, c = arr.shape
        lines = arr.reshape(h, -1).astype(int)
        prev = np.zeros(w * c, dtype=int)
        stream = b""
        for y in range(h):
            ft = (y % 5)
            cur = lines[y]
            out = []
            for x in range(w * c):
                left = cur[x - c] if x >= c else 0
                ul = prev[x - c] if x >= c else 0
                if ft == 0:
                    v = cur[x]
                elif ft == 1:
                    v = cur[x] - left
                elif ft == 2:
                    v = cur[x] - prev[x]
                elif ft == 3:
                    v = cur[x] - ((left + prev[x]) >> 1)
                else:
                    v = cur[x] - paeth(left, prev[x], ul)
                out.append(v & 0xFF)
            stream += bytes([ft]) + bytes(out)
            prev = cur
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        buf = (
            _MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(stream)) + chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(buf), arr)

    def test_png_media_features_match_stub_pixels(self, spark):
        """The PNG round-trip is lossless, so features over real PNG
        payloads equal the stub path's raw-pixel features (n_bytes is
        the one column that differs: file size vs pixel count)."""
        from mapchete_spark.operators.multimodal import (
            extract_media_features,
            png_image_decoder,
            synthetic_png_media,
        )

        raw = extract_media_features(synthetic_media(spark, 30)).collect()
        png = extract_media_features(
            synthetic_png_media(spark, 30),
            decoders={"image": png_image_decoder},
        ).collect()
        raw_by = {r["media_ref"]: r for r in raw}
        assert len(png) == 30
        saw_image = False
        for r in png:
            b = raw_by[r["media_ref"]]
            assert (r["feat_mean"], r["feat_std"], r["signature"]) == (
                b["feat_mean"], b["feat_std"], b["signature"]
            )
            if r["kind"] == "image":
                saw_image = True
                assert r["n_bytes"] != b["n_bytes"]  # file size, not pixels
            else:
                assert r["n_bytes"] == b["n_bytes"]
        assert saw_image


def _run_stateful_dedup(spark, tmp_path):
        from mapchete_spark.streaming.pipeline import stream_dedup_first_seen
        import pyspark.sql.functions as F

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        src = tmp_path / "dup_src"
        src.mkdir()
        # file A: docs 0..99; file B: the SAME texts with shifted ids
        # (duplicates) plus fresh docs 100..149
        a = docs.where(F.col("doc_id") < 100)
        a.coalesce(1).write.parquet(str(tmp_path / "a"))
        dup = a.withColumn("doc_id", F.col("doc_id") + 1000)
        fresh = docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 150))
        dup.unionByName(fresh).coalesce(1).write.parquet(str(tmp_path / "b"))
        for f in (tmp_path / "a").glob("*.parquet"):
            shutil.copy(f, src / "a.parquet")

        q = stream_dedup_first_seen(
            spark, str(src), str(tmp_path / "ck"), str(tmp_path / "out")
        )
        q.awaitTermination(120)
        out1 = spark.read.parquet(str(tmp_path / "out"))
        assert out1.count() == 100

        # second micro-batch: duplicates must be suppressed by STATE
        for f in (tmp_path / "b").glob("*.parquet"):
            shutil.copy(f, src / "b.parquet")
        q2 = stream_dedup_first_seen(
            spark, str(src), str(tmp_path / "ck"), str(tmp_path / "out")
        )
        q2.awaitTermination(120)
        out2 = spark.read.parquet(str(tmp_path / "out"))
        assert out2.count() == 150  # 100 originals + 50 fresh, 100 dups dropped
        # every emitted doc_id is the FIRST-seen one (original ids, not +1000)
        assert out2.where(F.col("doc_id") >= 1000).count() == 0


class TestStatefulDedup:
    def test_first_seen_dedup_across_batches(self, stream_runs):
        from tests.conftest import assert_ok

        assert_ok(stream_runs, "stateful_dedup")


def _run_pyramid(spark, tmp_path):
        """Two micro-batches of base tiles through
        stream_pyramid_maintenance == a from-scratch batch overview
        build of the full base level (Z2 on Structured Streaming)."""
        import os

        from mapchete_spark.operators.overviews import build_overviews
        from mapchete_spark.operators.rastertable import materialize_dem
        from mapchete_spark.streaming.pipeline import stream_pyramid_maintenance
        from mapchete_spark.tilegrid import Bounds, TilePyramid

        pyr = TilePyramid("geodetic")
        aoi = Bounds(0.0, 20.0, 45.0, 50.0)
        dem = materialize_dem(spark, 5, pyr, bounds=aoi, hole=False).cache()
        dem.count()

        stream_dir = str(tmp_path / "incoming")
        os.makedirs(stream_dir)
        out_dir = str(tmp_path / "pyr")
        ck = str(tmp_path / "ck")

        # batch 1: western half of the AOI
        dem.where(F.col("tile_col") < 36).write.mode("append").parquet(stream_dir)
        q = stream_pyramid_maintenance(
            spark, stream_dir, ck, out_dir, pyr, base_zoom=5, min_zoom=3
        )
        q.awaitTermination(300)
        # batch 2: the rest
        dem.where(F.col("tile_col") >= 36).write.mode("append").parquet(stream_dir)
        q = stream_pyramid_maintenance(
            spark, stream_dir, ck, out_dir, pyr, base_zoom=5, min_zoom=3
        )
        q.awaitTermination(300)

        want = {}
        for z, df in build_overviews(dem, pyr, 5, 3, resampling="average"):
            want[z] = {
                r["tile_key"]: r["h"]
                for r in df.select("tile_key", F.md5("data").alias("h")).collect()
            }
        for z in (4, 3):
            got = {
                r["tile_key"]: r["h"]
                for r in spark.read.parquet(os.path.join(out_dir, f"zoom={z}"))
                .select("tile_key", F.md5("data").alias("h"))
                .collect()
            }
            assert got == want[z], f"zoom {z} mismatch"
        dem.unpersist()


class TestStreamingPyramid:
    def test_incremental_overviews_match_batch(self, stream_runs):
        from tests.conftest import assert_ok

        assert_ok(stream_runs, "pyramid")


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        import datetime as dt

        from mapchete_spark.streaming.pipeline import sessionize_events

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            (1, t0, 7, "a", 1.0, "{}"),
            (2, t0 + dt.timedelta(minutes=10), 7, "a", 2.0, "{}"),
            (3, t0 + dt.timedelta(minutes=55), 7, "a", 4.0, "{}"),  # gap > 30
            (4, t0, 8, "a", 8.0, "{}"),
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, event_type string, "
            "value double, props string",
        )
        got = {
            (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_us"], r["sum_value"])
            for r in sessionize_events(ev, gap_minutes=30).collect()
        }
        assert got[(7, 1)] == (2, 10 * 60 * 1_000_000, 3.0)
        assert got[(7, 2)] == (1, 0, 4.0)
        assert got[(8, 1)] == (1, 0, 8.0)

    def test_sessionize_parallelism_invariant(self, spark):
        from mapchete_spark.streaming.pipeline import sessionize_events

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        a = sorted(tuple(r) for r in sessionize_events(ev).collect())
        b = sorted(
            tuple(r) for r in sessionize_events(ev.repartition(13)).collect()
        )
        assert a == b


def _run_chunking(spark, tmp_path, sf_dir=None):
        """chunk_spans lifted onto a stream (map-only, so unchanged):
        two micro-batch deliveries produce exactly the batch result."""
        import shutil

        from mapchete_spark.functions.chunking import chunk_spans
        from mapchete_spark.streaming.pipeline import stream_chunk_spans

        docs = spark.read.parquet(f"{SF}/documents.parquet").cache()
        half1 = docs.where(F.col("doc_id") % 2 == 0)
        half2 = docs.where(F.col("doc_id") % 2 == 1)
        in_dir = str(tmp_path / "docs_in")
        out_dir = str(tmp_path / "chunks_out")
        ckpt = str(tmp_path / "ckpt")
        half1.write.mode("overwrite").parquet(in_dir)
        q = stream_chunk_spans(spark, in_dir, ckpt, out_dir)
        q.awaitTermination(120)
        half2.write.mode("append").parquet(in_dir)
        q2 = stream_chunk_spans(spark, in_dir, ckpt, out_dir)
        q2.awaitTermination(120)
        got = sorted(
            tuple(r) for r in spark.read.parquet(out_dir).collect()
        )
        want = sorted(tuple(r) for r in chunk_spans(docs).collect())
        assert got == want
        docs.unpersist()


class TestStreamChunking:
    def test_stream_chunks_equal_batch(self, stream_runs):
        from tests.conftest import assert_ok

        assert_ok(stream_runs, "chunking")


def _run_decontam(spark, tmp_path, sf_dir=None):
        """Streaming decontamination (stream-static broadcast join) over
        two micro-batch deliveries reproduces the batch operator."""
        from mapchete_spark.operators.dedup import ngram_contamination
        from mapchete_spark.streaming.pipeline import stream_decontaminate

        docs = spark.read.parquet(f"{SF}/documents.parquet").cache()
        in_dir = str(tmp_path / "docs_in")
        out_dir = str(tmp_path / "flags_out")
        ckpt = str(tmp_path / "ckpt")
        docs.where(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(in_dir)
        # static blocklist reads the FULL corpus (fixed benchmark set)
        q = stream_decontaminate(
            spark, in_dir, ckpt, out_dir, blocklist_docs=docs.where(
                (F.col("doc_id") % 17) == 5
            )
        )
        q.awaitTermination(120)
        docs.where(F.col("doc_id") % 2 == 1).write.mode("append").parquet(in_dir)
        q2 = stream_decontaminate(
            spark, in_dir, ckpt, out_dir, blocklist_docs=docs.where(
                (F.col("doc_id") % 17) == 5
            )
        )
        q2.awaitTermination(120)
        got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
        want = sorted(tuple(r) for r in ngram_contamination(docs).collect())
        assert got == want
        docs.unpersist()


class TestStreamDecontamination:
    def test_stream_static_join_equals_batch(self, stream_runs):
        from tests.conftest import assert_ok

        assert_ok(stream_runs, "decontam")


def _run_quality(spark, tmp_path, sf_dir=None):
        """stream_quality_filter over two micro-batch arrivals produces
        exactly the batch repetition_stats survivors, row-exact."""
        import shutil

        from mapchete_spark.functions.repetition import repetition_stats
        from mapchete_spark.streaming.pipeline import stream_quality_filter

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        src = tmp_path / "qf_src"
        src.mkdir()
        out, ck = str(tmp_path / "qf_out"), str(tmp_path / "qf_ck")
        docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src))
        q = stream_quality_filter(spark, str(src), ck, out)
        q.awaitTermination(120)
        docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        q = stream_quality_filter(spark, str(src), ck, out)
        q.awaitTermination(120)
        got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
        want = sorted(
            tuple(r)
            for r in repetition_stats(docs)
            .where(F.col("gopher_keep"))
            .collect()
        )
        assert got == want and len(got) > 0


class TestStreamingQualityFilter:
    def test_two_batches_equal_batch_operator(self, stream_runs):
        from tests.conftest import assert_ok

        assert_ok(stream_runs, "quality")


def _run_pii(spark, tmp_path, sf_dir=None):
        """stream_pii_scrub over two micro-batch arrivals produces
        exactly the batch operator's redactions, row-exact."""
        from mapchete_spark.functions.pii import pii_count_cols, redact_col
        from mapchete_spark.streaming.pipeline import stream_pii_scrub

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        # sprinkle deterministic PII so the scrub has work to do
        salted = docs.withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.when(F.col("doc_id") % 7 == 0,
                       F.lit(" mail x@example.com or 555-123-4567"))
                 .otherwise(F.lit("")),
            ),
        )
        src = tmp_path / "pii_src"
        src.mkdir()
        out, ck = str(tmp_path / "pii_out"), str(tmp_path / "pii_ck")
        salted.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src))
        q = stream_pii_scrub(spark, str(src), ck, out)
        q.awaitTermination(120)
        salted.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        q = stream_pii_scrub(spark, str(src), ck, out)
        q.awaitTermination(120)
        got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
        counts = pii_count_cols(F.col("text"))
        want = sorted(
            tuple(r)
            for r in salted.select(
                "doc_id",
                *[v.alias(k) for k, v in counts.items()],
                redact_col(F.col("text")).alias("redacted_text"),
            ).collect()
        )
        assert got == want and len(got) > 0
        assert any(t[1] > 0 for t in got)  # emails actually found


class TestStreamingPiiScrub:
    def test_two_batches_equal_batch_operator(self, spark, tmp_path):
        _run_pii(spark, tmp_path)
