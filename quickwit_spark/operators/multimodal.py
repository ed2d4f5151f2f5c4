"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators.

The decode kernels are STUBBED (image/audio libs are not in this container):
``decode_image_batch`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case a seeded, content-derived fake is
produced so the Spark-side plumbing — schema, partitioning, UDF signature,
batch shape — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feat", T.ArrayType(T.FloatType()), True),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
    ]
)


def decode_image_batch(payloads: pd.Series, deterministic_fake: bool = False) -> list[np.ndarray]:
    """Decode a batch of encoded image bytes → HxWx3 uint8 arrays.

    STUB: real decoding needs Pillow/opencv (not in this container). The
    deterministic fake derives pixels from a sha256 of the payload, so tests
    exercise identical plumbing with stable outputs.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires Pillow/opencv; not available in this container "
            "— pass deterministic_fake=True for plumbing tests"
        )
    out = []
    for p in payloads:
        if p is None:
            out.append(None)
            continue
        digest = hashlib.sha256(bytes(p)).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        out.append(rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8))
    return out


def image_features(
    media: DataFrame,
    target: tuple[int, int] = (8, 8),
    deterministic_fake: bool = False,
) -> DataFrame:
    """decode → resize → feature-extract as one ``mapInPandas`` pass.

    Batches stream through Arrow; the per-batch kernel is numpy-vectorized.
    Partitioning: inherit the scan partitions (payloads are large — do NOT
    shuffle binaries; filter/project first, extract features, then drop the
    payload column before any join).
    """
    th, tw = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch(pdf["payload"], deterministic_fake=deterministic_fake)
            feats, ws, hs = [], [], []
            for img in imgs:
                if img is None:
                    feats.append(None), ws.append(None), hs.append(None)
                    continue
                h, w, _ = img.shape
                # nearest-neighbor resize, vectorized
                yi = (np.arange(th) * h // th)[:, None]
                xi = (np.arange(tw) * w // tw)[None, :]
                small = img[yi, xi]  # th x tw x 3
                feats.append((small.astype(np.float32) / 255.0).mean(axis=2).ravel())
                ws.append(tw), hs.append(th)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feat": feats,
                    "out_width": pd.array(ws, dtype="Int32"),
                    "out_height": pd.array(hs, dtype="Int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(
    media: DataFrame, every_ms: int = 1000, deterministic_fake: bool = False
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (duration-driven explode — JVM-side), decode stubbed."""
    if not deterministic_fake:
        raise NotImplementedError("video decode not available in this container")
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames.withColumn("frame_key", F.xxhash64("media_id", "frame_ts_ms"))


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("rms", T.FloatType(), True),
        T.StructField("zero_crossings", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
    ]
)


def decode_audio_batch(payloads: pd.Series, deterministic_fake: bool = False) -> list:
    """Decode encoded audio bytes → float32 PCM arrays. STUB (no soundfile/
    ffmpeg in this container); the deterministic fake derives a 1k-sample
    waveform from a sha256 of the payload."""
    if not deterministic_fake:
        raise NotImplementedError(
            "audio decode requires soundfile/ffmpeg; not available in this "
            "container — pass deterministic_fake=True for plumbing tests"
        )
    out = []
    for p in payloads:
        if p is None:
            out.append(None)
            continue
        digest = hashlib.sha256(bytes(p)).digest()
        rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
        out.append(rng.standard_normal(1024).astype(np.float32))
    return out


def audio_features(media: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """decode → per-clip features (RMS loudness, zero-crossing count) in one
    ``mapInPandas`` pass — numpy-vectorized per batch, payloads never
    shuffled."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pcms = decode_audio_batch(pdf["payload"], deterministic_fake=deterministic_fake)
            rms, zc, ns = [], [], []
            for pcm in pcms:
                if pcm is None:
                    rms.append(None), zc.append(None), ns.append(None)
                    continue
                rms.append(float(np.sqrt((pcm * pcm).mean())))
                zc.append(int((np.diff(np.signbit(pcm)) != 0).sum()))
                ns.append(len(pcm))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "rms": pd.array(rms, dtype="float32"),
                    "zero_crossings": pd.array(zc, dtype="Int32"),
                    "n_samples": pd.array(ns, dtype="Int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


TEXT_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)


def extract_text(media: DataFrame, min_run: int = 4) -> DataFrame:
    """REAL (not stubbed) fallback text extraction from document binaries:
    printable-ASCII runs of length ≥ ``min_run`` (the classic `strings`
    heuristic — works on any payload without format libs). Proper PDF/DOCX
    parsing would slot into the same mapInPandas signature."""
    import re as _re

    run_re = _re.compile(rb"[\x20-\x7e]{%d,}" % min_run)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, sizes = [], []
            for p in pdf["payload"]:
                if p is None:
                    texts.append(None), sizes.append(None)
                    continue
                b = bytes(p)
                texts.append(" ".join(m.decode("ascii") for m in run_re.findall(b)))
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "extracted_text": texts,
                    "n_bytes": pd.array(sizes, dtype="Int32"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=TEXT_EXTRACT_SCHEMA)
