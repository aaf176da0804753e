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


def synthetic_media(spark: SparkSession, n: int = 200) -> DataFrame:
    """Deterministic fake media table: payload = seeded byte pattern,
    meta carries the 'decoded' dimensions."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_ref": [], "kind": [], "payload": [], "meta": []}
            for i in pdf["id"].values:
                i = int(i)
                kind = _KINDS[i % 3]
                rng = np.random.default_rng(i)  # seeded by id: deterministic
                if kind == "image":
                    w, h = 32 + (i % 4) * 16, 32 + (i % 3) * 16
                    payload = rng.integers(0, 256, w * h * 3, dtype=np.uint8)
                    meta = {"width": w, "height": h, "channels": 3}
                elif kind == "audio":
                    sr, dur = 16000, 1 + (i % 3)
                    payload = rng.integers(-128, 128, sr * dur, dtype=np.int8)
                    meta = {"sample_rate": sr, "duration_s": dur}
                else:
                    w, h, frames = 16, 16, 4 + (i % 5)
                    payload = rng.integers(0, 256, w * h * frames, dtype=np.uint8)
                    meta = {"width": w, "height": h, "n_frames": frames}
                rows["media_ref"].append(f"media://{i}")
                rows["kind"].append(kind)
                rows["payload"].append(payload.tobytes())
                rows["meta"].append(json.dumps(meta, sort_keys=True))
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(kind: str, payload: bytes, meta: dict) -> np.ndarray:
    """STUB decode: interpret the payload per the meta header.
    Replace with PIL.Image.open / soundfile / pyav in a real deployment
    (NotImplementedError path below documents the contract)."""
    if kind == "image":
        return np.frombuffer(payload, dtype=np.uint8).reshape(
            meta["height"], meta["width"], meta["channels"]
        )
    if kind == "audio":
        return np.frombuffer(payload, dtype=np.int8).astype(np.float32) / 128.0
    if kind == "video":
        return np.frombuffer(payload, dtype=np.uint8).reshape(
            meta["n_frames"], meta["height"], meta["width"]
        )
    raise NotImplementedError(f"no decoder for kind={kind}")


def extract_media_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract per media row (Arrow batches):
    image -> mean/std per channel + 8x8 thumbnail signature,
    audio -> rms / zero-crossing rate, video -> per-frame means of a
    deterministic frame sample."""

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
                arr = _fake_decode(kind, payload, meta)
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


def join_spans_to_media(spans_flat: DataFrame, media: DataFrame) -> DataFrame:
    """Interleaved-doc media spans joined to the media table on
    media_ref — the multimodal side of the spans invariant (broadcast
    the media dimension when small)."""
    return spans_flat.where(F.col("kind") != "text").join(
        F.broadcast(media.select("media_ref", F.col("kind").alias("media_kind"))),
        on="media_ref",
        how="left",
    )
