"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: JVM-side zip_with dot
  product, TakeOrdered (no full sort). The correctness baseline.
- :func:`lsh_topk` — random-hyperplane LSH bucketing: probe only the
  query's bucket(s) — the scale path (candidates shrink ~2^bits).
- :func:`embedding_near_dup_pairs` — pairwise cosine ≥ threshold via
  LSH-bucketed self-join (near-dup dedup on embeddings).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine to ``query_vec``.

    The literal array goes into the plan once; Catalyst evaluates the dot
    product per row in codegen and TakeOrderedAndProject keeps only k rows
    per partition — no global sort, no Python.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col), F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def _hyperplanes(dim: int, bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).astype(np.float64)


def lsh_bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane signature: bit i = sign(v · plane_i) — pure Column
    ops (the planes become array literals in the plan)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(vec_col, plane) > 0).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    multiprobe_hamming: int = 1,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane bucket is
    within ``multiprobe_hamming`` of the query's bucket."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, bits, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbucket = 0
    for i, p in enumerate(planes):
        if float(qv @ p) > 0:
            qbucket |= 1 << i
    bucketed = df.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
    probe = F.bit_count(F.col("_bucket").bitwiseXOR(F.lit(qbucket))) <= multiprobe_hamming
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.filter(probe)
        .select(F.col(id_col), F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 0,
    seed: int = 11,
) -> DataFrame:
    """Pairs (a < b) with cosine ≥ threshold.

    ``bits=0`` → exact pairwise (sort-merge self-join on a crossable key;
    only for verification scale). ``bits>0`` → LSH-bucketed self-join: pairs
    are only compared within a bucket — the 100 TB path.
    """
    base = df.select(F.col(id_col), F.col(vec_col))
    if bits > 0:
        dim = len(base.select(vec_col).first()[0])
        planes = _hyperplanes(dim, bits, seed)
        base = base.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
        cond = (F.col(f"l._bucket") == F.col(f"r._bucket")) & (
            F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
        )
    else:
        cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    pairs = base.alias("l").join(base.alias("r"), cond)
    cos = cosine_col(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"))
    return (
        pairs.select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style ANN: vectors pre-assigned to their nearest centroid; the
    query probes the ``n_probe`` nearest centroid cells only. ``centroids``
    would come from a KMeans fit (offline); here any (c, dim) array works.
    """
    qv = np.asarray(query_vec, dtype=np.float64)
    dists = ((centroids - qv) ** 2).sum(axis=1)
    probe_cells = [int(i) for i in np.argsort(dists)[:n_probe]]

    # assign each row to its nearest centroid, JVM-side
    best = None
    for ci, c in enumerate(centroids):
        cc = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), cc, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        entry = F.struct(d.alias("d"), F.lit(ci).alias("cell"))
        best = entry if best is None else F.when(entry["d"] < best["d"], entry).otherwise(best)
    assigned = df.withColumn("_cell", best["cell"])
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("_cell").isin(probe_cells))
        .select(F.col(id_col), F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
