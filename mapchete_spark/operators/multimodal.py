"""Multimodal (image/audio/video) columns: opaque binary payloads with
typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake (documented stub): payload bytes are generated from
the media_ref hash, 'decoding' parses our own header, 'resize' and
'frame sampling' operate on the fake pixel buffer. Everything
Spark-side — schema, partitioning, UDF signatures, Arrow batch shape —
is real and tested; swapping ``_fake_decode`` for PIL/ffmpeg is a
one-function change.

Media table schema:
  media_ref string, kind string (image|audio|video), payload binary,
  meta string (JSON: width/height/duration/sample_rate...)
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_ref string, kind string, payload binary, meta string"

_KINDS = ("image", "audio", "video")


def media_dims(i: int) -> dict:
    """Deterministic media metadata per index — shared by the table
    generator and the SQL twin (oracle-twin pattern)."""
    kind = _KINDS[i % 3]
    if kind == "image":
        w, h = 32 + (i % 4) * 16, 32 + (i % 3) * 16
        return dict(kind=kind, n_bytes=w * h * 3,
                    meta={"width": w, "height": h, "channels": 3})
    if kind == "audio":
        sr, dur = 16000, 1 + (i % 3)
        return dict(kind=kind, n_bytes=sr * dur,
                    meta={"sample_rate": sr, "duration_s": dur})
    w, h, frames = 16, 16, 4 + (i % 5)
    return dict(kind=kind, n_bytes=w * h * frames,
                meta={"width": w, "height": h, "n_frames": frames})


def seeded_bytes(ref: str, n: int) -> bytes:
    """Deterministic payload bytes: an md5 chain over (ref, block) —
    reproducible in DuckDB SQL (md5 of the same strings), unlike a PRNG."""
    import hashlib

    out = bytearray()
    for blk in range((n + 15) // 16):
        out += hashlib.md5(f"{ref}:{blk}".encode()).digest()
    return bytes(out[:n])


def synthetic_media(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic fake media table: payload = md5-chain byte pattern,
    meta carries the 'decoded' dimensions."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_ref": [], "kind": [], "payload": [], "meta": []}
            for i in pdf["id"].values:
                i = int(i)
                d = media_dims(i)
                ref = f"media://{i}"
                rows["media_ref"].append(ref)
                rows["kind"].append(d["kind"])
                rows["payload"].append(seeded_bytes(ref, d["n_bytes"]))
                rows["meta"].append(json.dumps(d["meta"], sort_keys=True))
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthetic_png_media(spark: SparkSession, n: int = 200) -> DataFrame:
    """Like ``synthetic_media`` but image payloads are REAL PNG bytes
    (color type 2, the repo's own codec): the same deterministic
    md5-chain pixels, encoded. Audio/video stay raw (no public
    pure-python codec fits this container for those)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mapchete_spark.sources.png_codec import encode_png_rgb

        for pdf in batches:
            rows = {"media_ref": [], "kind": [], "payload": [], "meta": []}
            for i in pdf["id"].values:
                i = int(i)
                d = media_dims(i)
                ref = f"media://{i}"
                payload = seeded_bytes(ref, d["n_bytes"])
                if d["kind"] == "image":
                    m = d["meta"]
                    pixels = np.frombuffer(payload, dtype=np.uint8).reshape(
                        m["height"], m["width"], m["channels"]
                    )
                    payload = encode_png_rgb(pixels)
                rows["media_ref"].append(ref)
                rows["kind"].append(d["kind"])
                rows["payload"].append(payload)
                rows["meta"].append(json.dumps(d["meta"], sort_keys=True))
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def png_image_decoder(kind: str, payload: bytes, meta: dict) -> np.ndarray:
    """REAL image decoder (register via ``register_media_decoder`` or
    the ``decoders=`` override): full-spec PNG decode from
    sources/png_codec (bit depth 8, gray/RGB/gray+alpha/RGBA, all five
    filters). Grayscale expands to (h, w, 1) to keep the HxWxC
    contract."""
    if kind != "image":
        raise NotImplementedError("png_image_decoder handles kind='image' only")
    from mapchete_spark.sources.png_codec import decode_png

    arr = decode_png(bytes(payload))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if "height" in meta and arr.shape[:2] != (meta["height"], meta["width"]):
        raise ValueError(
            f"decoded PNG {arr.shape[:2]} != meta "
            f"({meta['height']}, {meta['width']})"
        )
    return arr


def media_features_png_sql(n: int) -> str:
    """Oracle twin of extract_media_features(synthetic_png_media(n),
    decoders={'image': png_image_decoder}): feature values equal the
    raw-bytes twin (PNG round-trip is lossless) but image n_bytes is
    the encoded PNG size, computed here by running the same encoder at
    SQL-generation time."""
    from mapchete_spark.sources.png_codec import encode_png_rgb

    def payload_len(i: int, d: dict) -> int:
        if d["kind"] != "image":
            return d["n_bytes"]
        m = d["meta"]
        pixels = np.frombuffer(
            seeded_bytes(f"media://{i}", d["n_bytes"]), dtype=np.uint8
        ).reshape(m["height"], m["width"], m["channels"])
        return len(encode_png_rgb(pixels))

    return media_features_sql(n, payload_len=payload_len)


def _fake_decode(kind: str, payload: bytes, meta: dict) -> np.ndarray:
    """STUB decode: interpret the payload per the meta header.
    Replace with PIL.Image.open / soundfile / pyav in a real deployment
    by registering a real codec via ``register_media_decoder`` —
    the NotImplementedError path below documents the contract."""
    if kind == "image":
        return np.frombuffer(payload, dtype=np.uint8).reshape(
            meta["height"], meta["width"], meta["channels"]
        )
    if kind == "audio":
        # float64 (not float32): downstream means/rms then reduce with
        # exact dyadic samples, keeping the SQL twin's sums comparable
        return np.frombuffer(payload, dtype=np.int8).astype(np.float64) / 128.0
    if kind == "video":
        return np.frombuffer(payload, dtype=np.uint8).reshape(
            meta["n_frames"], meta["height"], meta["width"]
        )
    raise NotImplementedError(f"no decoder for kind={kind}")


# pluggable decode registry: kind -> callable(kind, payload, meta) ->
# ndarray with the contract shapes (image HxWxC uint8-ish, audio 1-D
# float, video FxHxW). The deterministic stub is the default; a real
# deployment registers PIL/soundfile/pyav decoders without touching the
# operator. The registry is captured by value into each UDF closure at
# DataFrame-construction time, so registrations made on the driver
# reach executors through cloudpickle (a module-level lookup would see
# a fresh module there).
MEDIA_DECODERS = {"image": _fake_decode, "audio": _fake_decode, "video": _fake_decode}


def register_media_decoder(kind: str, fn) -> None:
    """Install a real codec for one media kind (driver-side, before the
    features DataFrame is built)."""
    MEDIA_DECODERS[kind] = fn


def extract_media_features(media: DataFrame, decoders=None) -> DataFrame:
    """Decode + feature-extract per media row (Arrow batches):
    image -> mean/std per channel + 8x8 thumbnail signature,
    audio -> rms / zero-crossing rate, video -> per-frame means of a
    deterministic frame sample. ``decoders`` overrides the registry
    per call (kind -> callable)."""
    decode_map = dict(MEDIA_DECODERS)
    decode_map.update(decoders or {})

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_ref": [], "kind": [], "n_bytes": [],
                "feat_mean": [], "feat_std": [], "signature": [],
            }
            for ref, kind, payload, meta_s in zip(
                pdf["media_ref"].values, pdf["kind"].values,
                pdf["payload"].values, pdf["meta"].values,
            ):
                meta = json.loads(meta_s)
                decoder = decode_map.get(kind, _fake_decode)
                arr = decoder(kind, payload, meta)
                if kind == "image":
                    # resize to 8x8 via block mean (the 'resize' op)
                    h, w, c = arr.shape
                    th = arr[: h - h % 8, : w - w % 8].reshape(
                        8, h // 8, 8, w // 8, c
                    ).mean(axis=(1, 3))
                    sig = (th.mean(axis=2) > th.mean()).astype(np.uint8).ravel()
                    signature = "".join(map(str, sig))
                    feat_mean = float(arr.mean())
                    feat_std = float(arr.std())
                elif kind == "audio":
                    feat_mean = float(np.abs(arr).mean())
                    feat_std = float(np.sqrt((arr**2).mean()))  # rms
                    zc = int(((arr[:-1] * arr[1:]) < 0).sum())
                    signature = str(zc)
                else:
                    # frame-sample: every 2nd frame
                    sample = arr[::2]
                    feat_mean = float(sample.mean())
                    feat_std = float(sample.std())
                    signature = ",".join(
                        str(int(f.mean())) for f in sample[:4]
                    )
                out["media_ref"].append(ref)
                out["kind"].append(kind)
                out["n_bytes"].append(len(payload))
                out["feat_mean"].append(round(feat_mean, 6))
                out["feat_std"].append(round(feat_std, 6))
                out["signature"].append(signature)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        gen,
        schema=(
            "media_ref string, kind string, n_bytes long, "
            "feat_mean double, feat_std double, signature string"
        ),
    )


# ---- DuckDB SQL twin -----------------------------------------------------------


def media_features_sql(n: int, payload_len=None) -> str:
    """Recompute extract_media_features(synthetic_media(n)) in DuckDB:
    the md5-chain payload bytes are re-derived per index (hex-pair ->
    value), then every feature (means, stds, thumbnail signature,
    zero crossings, frame means) is re-aggregated from them. Generated
    from the same media_dims() the table generator uses.

    ``payload_len(i, dims) -> int`` overrides the emitted n_bytes
    column per row (the feature math still runs over the raw byte
    chain): the PNG-payload variant stores len(encode_png(pixels)) as
    the on-disk payload size while features come from the decoded
    pixels."""
    rows = []
    for i in range(n):
        d = media_dims(i)
        m = d["meta"]
        out_b = d["n_bytes"] if payload_len is None else payload_len(i, d)
        rows.append(
            f"('media://{i}', '{d['kind']}', {d['n_bytes']}, {out_b}, "
            f"{m.get('width', 0)}, {m.get('height', 0)}, {m.get('n_frames', 0)})"
        )
    vals = ",\n        ".join(rows)
    # byte k of the chain lives in md5(ref || ':' || k//16) hex chars
    # (k%16)*2 .. +1
    val = (
        "(strpos('0123456789abcdef', substr(hx, (k % 16) * 2 + 1, 1)) - 1) * 16"
        " + (strpos('0123456789abcdef', substr(hx, (k % 16) * 2 + 2, 1)) - 1)"
    )
    return f"""
    WITH media AS (
        SELECT * FROM (VALUES
        {vals}
        ) AS m(media_ref, kind, n_bytes, out_bytes, w, h, n_frames)
    ),
    bytes AS (
        SELECT media_ref, kind, n_bytes, w, h, k, {val} AS v
        FROM (
            SELECT media_ref, kind, out_bytes AS n_bytes, w, h, k,
                   md5(media_ref || ':' || CAST(k // 16 AS VARCHAR)) AS hx
            FROM (
                SELECT media_ref, kind, n_bytes, out_bytes, w, h,
                       UNNEST(generate_series(0, n_bytes - 1)) AS k
                FROM media
            )
        )
    ),
    -- image: channel-interleaved uint8 (h, w, 3)
    img AS (
        SELECT media_ref, n_bytes, k % 3 AS ch,
               (k // 3) % w AS jp, (k // 3) // w AS ip,
               (ip_b // (h // 8)) AS bi, (jp_b // (w // 8)) AS bj, v, h, w
        FROM (
            SELECT media_ref, n_bytes, k, v, w, h,
                   (k // 3) % w AS jp_b, (k // 3) // w AS ip_b
            FROM bytes WHERE kind = 'image'
        )
    ),
    img_mean AS (
        SELECT media_ref, n_bytes, SUM(v) / COUNT(*) AS m FROM img GROUP BY 1, 2
    ),
    img_stats AS (
        SELECT i.media_ref, im.n_bytes, im.m,
               sqrt(SUM((i.v - im.m) * (i.v - im.m)) / COUNT(*)) AS s
        FROM img i JOIN img_mean im USING (media_ref)
        GROUP BY 1, 2, 3
    ),
    th AS (
        SELECT media_ref, bi, bj, ch, SUM(v) / COUNT(*) AS tv
        FROM img GROUP BY 1, 2, 3, 4
    ),
    thm AS (
        SELECT media_ref, bi, bj, SUM(tv) / COUNT(*) AS tm
        FROM th GROUP BY 1, 2, 3
    ),
    th_all AS (
        SELECT media_ref, SUM(tv) / COUNT(*) AS overall FROM th GROUP BY 1
    ),
    img_sig AS (
        SELECT t.media_ref,
               string_agg(CASE WHEN t.tm > a.overall THEN '1' ELSE '0' END,
                          '' ORDER BY t.bi, t.bj) AS sig
        FROM thm t JOIN th_all a USING (media_ref)
        GROUP BY t.media_ref
    ),
    img_out AS (
        SELECT s.media_ref, 'image' AS kind, CAST(s.n_bytes AS BIGINT) AS n_bytes,
               round_even(s.m, 6) AS feat_mean, round_even(s.s, 6) AS feat_std, g.sig AS signature
        FROM img_stats s JOIN img_sig g USING (media_ref)
    ),
    -- audio: int8 samples scaled to [-1, 1)
    aud AS (
        SELECT media_ref, n_bytes, k,
               (CASE WHEN v > 127 THEN v - 256 ELSE v END) AS sv,
               (CASE WHEN v > 127 THEN v - 256 ELSE v END) / 128.0 AS a
        FROM bytes WHERE kind = 'audio'
    ),
    aud_zc AS (
        SELECT media_ref,
               SUM(CASE WHEN prev_sv * sv < 0 THEN 1 ELSE 0 END) AS zc
        FROM (
            SELECT media_ref, sv,
                   LAG(sv) OVER (PARTITION BY media_ref ORDER BY k) AS prev_sv
            FROM aud
        )
        GROUP BY 1
    ),
    aud_out AS (
        SELECT s.media_ref, 'audio' AS kind, CAST(s.n_bytes AS BIGINT) AS n_bytes,
               round_even(s.m, 6) AS feat_mean, round_even(s.s, 6) AS feat_std,
               CAST(z.zc AS VARCHAR) AS signature
        FROM (
            SELECT media_ref, n_bytes,
                   SUM(ABS(a)) / COUNT(*) AS m,
                   sqrt(SUM(a * a) / COUNT(*)) AS s
            FROM aud GROUP BY 1, 2
        ) s JOIN aud_zc z USING (media_ref)
    ),
    -- video: (frames, 16, 16) uint8; every 2nd frame sampled
    vid AS (
        SELECT media_ref, n_bytes, k, v, k // 256 AS f
        FROM bytes WHERE kind = 'video'
    ),
    vid_s AS (SELECT * FROM vid WHERE f % 2 = 0),
    vid_mean AS (
        SELECT media_ref, n_bytes, SUM(v) / COUNT(*) AS m FROM vid_s GROUP BY 1, 2
    ),
    vid_stats AS (
        SELECT v.media_ref, vm.n_bytes, vm.m,
               sqrt(SUM((v.v - vm.m) * (v.v - vm.m)) / COUNT(*)) AS s
        FROM vid_s v JOIN vid_mean vm USING (media_ref)
        GROUP BY 1, 2, 3
    ),
    vid_sig AS (
        SELECT media_ref,
               string_agg(CAST(fm AS VARCHAR), ',' ORDER BY f) AS sig
        FROM (
            SELECT media_ref, f,
                   CAST(FLOOR(SUM(v) / 256.0) AS BIGINT) AS fm
            FROM vid_s WHERE f < 8 GROUP BY 1, 2
        )
        GROUP BY 1
    ),
    vid_out AS (
        SELECT s.media_ref, 'video' AS kind, CAST(s.n_bytes AS BIGINT) AS n_bytes,
               round_even(s.m, 6) AS feat_mean, round_even(s.s, 6) AS feat_std, g.sig AS signature
        FROM vid_stats s JOIN vid_sig g USING (media_ref)
    )
    SELECT * FROM (
        SELECT * FROM img_out
        UNION ALL SELECT * FROM aud_out
        UNION ALL SELECT * FROM vid_out
    )
    ORDER BY media_ref
    """


def join_spans_to_media(spans_flat: DataFrame, media: DataFrame) -> DataFrame:
    """Interleaved-doc media spans joined to the media table on
    media_ref — the multimodal side of the spans invariant (broadcast
    the media dimension when small)."""
    return spans_flat.where(F.col("kind") != "text").join(
        F.broadcast(media.select("media_ref", F.col("kind").alias("media_kind"))),
        on="media_ref",
        how="left",
    )
