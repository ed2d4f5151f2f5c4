"""Distributed Lloyd k-means (similarity.kmeans_step / kmeans_fit) — the
codebook trainer for IVF / PQ / SemDeDup."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators.similarity import (
    kmeans_fit,
    kmeans_step,
    nearest_cell_udf,
)


def _blob_df(spark, parts=4):
    """3 well-separated deterministic blobs in 4-d, 60 rows."""
    rows = []
    centers = np.array(
        [[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 0.0, 0.0], [0.0, 0.0, 10.0, 10.0]]
    )
    i = 0
    for c in range(3):
        for j in range(20):
            off = np.array([(j % 5) - 2, (j // 5) - 2, (j % 3) - 1, (j % 2)]) * 0.1
            rows.append((i, [float(x) for x in centers[c] + off]))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(
        parts
    ), centers


def _numpy_step(X, C):
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    best = d.argmin(axis=1)
    out = {}
    for c in range(C.shape[0]):
        mask = best == c
        if mask.any():
            out[c] = (X[mask].mean(axis=0), int(mask.sum()))
    return out


def test_kmeans_step_matches_numpy(spark):
    df, _ = _blob_df(spark)
    X = np.stack(
        [np.asarray(r["embedding"]) for r in df.orderBy("vec_id").collect()]
    )
    C = np.array([[0.0, 0, 0, 0], [5.0, 5, 5, 5], [10.0, 10, 10, 10]])
    got = kmeans_step(df, C).collect()
    expected = _numpy_step(X, C)
    by_cluster: dict = {}
    for r in got:
        mean, n = by_cluster.setdefault(r["cluster"], [np.zeros(4), None])
        mean[r["idx"]] = r["value"]
        by_cluster[r["cluster"]][1] = r["n"]
    assert set(by_cluster) == set(expected)
    for c, (mean, n) in by_cluster.items():
        assert n == expected[c][1]
        assert np.allclose(mean, expected[c][0], atol=1e-9)


def test_kmeans_fit_recovers_planted_blobs(spark):
    df, centers = _blob_df(spark)
    C, n_iter, shift = kmeans_fit(df, k=3, max_iter=20, tol=1e-9)
    assert shift <= 1e-9 and n_iter <= 20
    # one fitted centroid lands near each planted blob center (order may
    # differ from the plant order)
    dists = ((C[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    match = dists.argmin(axis=1)
    assert sorted(match.tolist()) == [0, 1, 2]
    assert float(dists.min(axis=1).max()) < 1.0
    # all 20 members of each blob assign to the same fitted centroid
    assign = nearest_cell_udf(C)
    counts = sorted(
        r["n"]
        for r in df.withColumn("c", assign(F.col("embedding")))
        .groupBy("c")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert counts == [20, 20, 20]


def test_kmeans_partitioning_independence(spark):
    df1, _ = _blob_df(spark, parts=2)
    df7, _ = _blob_df(spark, parts=7)
    C1, _, _ = kmeans_fit(df1, k=3, max_iter=8)
    C7, _, _ = kmeans_fit(df7, k=3, max_iter=8)
    assert np.allclose(C1, C7, atol=1e-9)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    df, _ = _blob_df(spark)
    far = np.full((1, 4), 1e6)
    init = np.vstack(
        [np.zeros((1, 4)), np.array([[10.0, 10, 0, 0]]), np.array([[0.0, 0, 10, 10]]), far]
    )
    C, _, _ = kmeans_fit(df, k=4, init=init, max_iter=5)
    assert np.allclose(C[3], far[0])  # never assigned → retained verbatim


def test_kmeans_cosine_metric(spark):
    # directions matter, magnitudes don't: two rays with mixed magnitudes
    rows = [(i, [float(m), 0.0]) for i, m in enumerate([1, 5, 9])] + [
        (i + 3, [0.0, float(m)]) for i, m in enumerate([2, 4, 8])
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C, _, _ = kmeans_fit(df, k=2, metric="cosine", max_iter=6)
    # each centroid is the mean of one ray's members → axis-aligned
    axes = {tuple((np.abs(c) > 1e-9).tolist()) for c in C}
    assert axes == {(True, False), (False, True)}


def test_kmeans_fit_feeds_ivf(spark, sf_dir):
    from quickwit_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    C, n_iter, _ = kmeans_fit(emb, k=8, max_iter=3)
    assert C.shape == (8, 64) and n_iter == 3
    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    hits = ivf_topk(emb, [float(x) for x in q], C, k=5, n_probe=8).collect()
    # probe-all == exact: the query vector itself must rank first
    assert hits[0]["vec_id"] == 0 and len(hits) == 5


def test_kmeans_init_validation(spark):
    df, _ = _blob_df(spark)
    with pytest.raises(ValueError, match="expected k=5"):
        kmeans_fit(df, k=5, init=np.zeros((3, 4)))
    with pytest.raises(ValueError, match="unknown metric"):
        kmeans_step(df, np.zeros((2, 4)), metric="manhattan")
