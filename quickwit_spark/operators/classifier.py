"""Hashed bag-of-words text classifier — the fastText-style quality
filter of LLM data pipelines (CCNet / DCLM / GPT-3-style "looks like
reference text" filtering), Spark-first.

Model: logistic regression over the *hashing trick* — each token hashes to
one of ``buckets`` slots, a document's feature vector is the mean of its
token one-hots, score = sigmoid(bias + sum(w[h(t)]) / n_tokens). This is
the linear core of fastText's supervised mode (Joulin et al. 2016,
"Bag of Tricks for Efficient Text Classification") without the embedding
layer, which is exactly what the big corpus-curation pipelines deploy
(quality filtering in CCNet: Wenzek et al. 2020; DCLM: Li et al. 2024).

Scale shape (the 100 TB path): training runs driver-side over a BOUNDED
labeled sample (quality-filter training sets are small curated corpora —
same contract as functions/bpe.py's tokenizer trainer), while INFERENCE is
pure Spark codegen: tokenize → portable hash (a fixed unrolled polynomial,
no UDF) → broadcast-join a ``buckets``-row weight table → one map-side
pre-aggregated groupBy(id). The corpus text is read once and the only
shuffle carries ~one row per document. No Python in the hot path.

The token hash is deliberately engine-portable (ascii/substr/modular
arithmetic only) so the whole inference path can be restated in ANSI SQL —
the DuckDB oracle in __spark_entry__ replays it end-to-end.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

# --- portable token hash -------------------------------------------------
#
# h(tok) = ( sum_{i=1..HASH_PREFIX} (codepoint(tok[i]) % 256) * (31^(i-1) mod B)
#            + 7919 * (length(tok) % 64) ) % B
#
# Weak by cryptographic standards, but the hashing trick only needs a FIXED
# hash shared by trainer and scorer — collisions are part of the model.
# Expressible in Spark Columns, DuckDB SQL, and plain Python char-for-char.

HASH_PREFIX = 12
_LEN_SALT = 7919
_LEN_MOD = 64


def _pows(buckets: int) -> list[int]:
    return [pow(31, i, buckets) for i in range(HASH_PREFIX)]


def hash_token_col(tok: Column, buckets: int) -> Column:
    """The portable hash as a pure Column expression (no UDF)."""
    pows = _pows(buckets)
    acc = F.lit(0)
    for i in range(HASH_PREFIX):
        ch = F.when(
            F.length(tok) >= i + 1, F.ascii(F.substring(tok, i + 1, 1)) % 256
        ).otherwise(F.lit(0))
        acc = acc + ch * F.lit(pows[i])
    acc = acc + F.lit(_LEN_SALT) * (F.length(tok) % _LEN_MOD)
    return (acc % buckets).cast("int")


def hash_token_py(tok: str, buckets: int) -> int:
    """Same hash in plain Python — used by the driver-side trainer."""
    pows = _pows(buckets)
    acc = 0
    for i, c in enumerate(tok[:HASH_PREFIX]):
        acc += (ord(c) % 256) * pows[i]
    acc += _LEN_SALT * (len(tok) % _LEN_MOD)
    return acc % buckets


def tokenize_col(col: Column) -> Column:
    """Lowercase alnum tokens; '' entries filtered (split artifacts).

    DuckDB restatement: ``unnest(regexp_split_to_array(lower(text),
    '[^a-z0-9]+'))`` with ``token <> ''``."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != F.lit("")
    )


class TextClassifier(NamedTuple):
    """A trained (or hand-set) model: dense per-bucket weights + bias."""

    weights: np.ndarray  # shape (buckets,), float64
    bias: float
    buckets: int


def formula_weights(buckets: int, scale: float = 1.0) -> np.ndarray:
    """Deterministic pseudo-random weights from a pure-arithmetic formula —
    lets an end-to-end inference test (or a SQL oracle) regenerate the
    exact weight table without shipping it: w[b] = scale * (((b*1103515245
    + 12345) mod 2001) - 1000) / 1000."""
    b = np.arange(buckets, dtype=np.int64)
    return scale * (((b * 1103515245 + 12345) % 2001) - 1000) / 1000.0


def _featurize_rows(
    texts: list[str], buckets: int
) -> tuple[list[dict[int, float]], np.ndarray]:
    feats: list[dict[int, float]] = []
    ntok = np.zeros(len(texts), dtype=np.float64)
    import re

    splitter = re.compile(r"[^a-z0-9]+")
    for i, t in enumerate(texts):
        toks = [x for x in splitter.split((t or "").lower()) if x]
        ntok[i] = len(toks)
        d: dict[int, float] = {}
        for tok in toks:
            h = hash_token_py(tok, buckets)
            d[h] = d.get(h, 0.0) + 1.0
        if toks:
            inv = 1.0 / len(toks)
            d = {k: v * inv for k, v in d.items()}
        feats.append(d)
    return feats, ntok


def train_text_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    epochs: int = 300,
    lr: float = 2.0,
    l2: float = 1e-4,
    max_sample: int = 100_000,
) -> TextClassifier:
    """Driver-side full-batch logistic regression on a bounded, id-ordered
    sample (deterministic: no shuffling, no random init — weights start at
    zero, full-batch gradient steps only).

    Quality-filter training sets are small curated corpora (CCNet trains
    its fastText filter on Wikipedia vs crawl samples), so a bounded
    driver-side fit is the honest scale story — the corpus-sized work is
    all in :func:`score_text_classifier`.
    """
    rows = (
        df.select(F.col(id_col), F.col(text_col), F.col(label_col).cast("double"))
        .orderBy(id_col)
        .limit(max_sample)
        .collect()
    )
    texts = [r[1] for r in rows]
    y = np.array([r[2] for r in rows], dtype=np.float64)
    feats, _ = _featurize_rows(texts, buckets)

    w = np.zeros(buckets, dtype=np.float64)
    b = 0.0
    n = max(len(rows), 1)
    for _ in range(epochs):
        # forward
        z = np.fromiter(
            (sum(w[k] * v for k, v in f.items()) + b for f in feats),
            dtype=np.float64,
            count=len(feats),
        )
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y  # dL/dz per row
        gb = float(err.sum()) / n
        gw = np.zeros_like(w)
        for e, f in zip(err, feats):
            for k, v in f.items():
                gw[k] += e * v
        gw /= n
        gw += l2 * w
        w -= lr * gw
        b -= lr * gb
    return TextClassifier(w, float(b), buckets)


def score_text_classifier(
    df: DataFrame,
    model: TextClassifier,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "score",
    threshold: float = 0.5,
    round_decimals: int = 6,
) -> DataFrame:
    """Distributed inference, pure codegen: tokenize → portable hash →
    broadcast weight join → one groupBy(id) (map-side pre-aggregated, the
    shuffle carries ~one row per doc). Zero-token docs score
    sigmoid(bias). Output: (id, n_tokens, score, pred).
    """
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(int(i), float(wv)) for i, wv in enumerate(model.weights)],
        "bucket int, w double",
    )
    toks = tokenize_col(F.col(text_col))
    base = df.select(
        F.col(id_col), F.explode_outer(toks).alias("tok"), F.size(toks).alias("n_tokens")
    ).withColumn(
        "bucket",
        F.when(F.col("tok").isNotNull(), hash_token_col(F.col("tok"), model.buckets)),
    )
    joined = base.join(F.broadcast(wdf), "bucket", "left")
    scored = (
        joined.groupBy(id_col, "n_tokens")
        .agg(F.sum(F.coalesce(F.col("w"), F.lit(0.0))).alias("wsum"))
        .withColumn(
            "z",
            F.lit(model.bias)
            + F.when(F.col("n_tokens") > 0, F.col("wsum") / F.col("n_tokens")).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(score_col, F.round(1.0 / (1.0 + F.exp(-F.col("z"))), round_decimals))
        .withColumn("pred", (F.col(score_col) >= threshold).cast("int"))
        .select(id_col, "n_tokens", score_col, "pred")
    )
    return scored


def score_text_classifier_py(
    texts: list[str], model: TextClassifier
) -> np.ndarray:
    """Reference scorer (numpy, same featurization as the trainer) — used
    by tests to pin the Spark path to the trainer's own arithmetic."""
    feats, _ = _featurize_rows(texts, model.buckets)
    z = np.fromiter(
        (
            sum(model.weights[k] * v for k, v in f.items()) + model.bias
            for f in feats
        ),
        dtype=np.float64,
        count=len(feats),
    )
    return 1.0 / (1.0 + np.exp(-z))
