"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: JVM-side zip_with dot
  product, TakeOrdered (no full sort). The correctness baseline.
- :func:`lsh_topk` — random-hyperplane LSH bucketing: probe only the
  query's bucket(s) — the scale path (candidates shrink ~2^bits).
- :func:`embedding_near_dup_pairs` — pairwise cosine ≥ threshold via
  OR-amplified LSH tables + exact verify (near-dup dedup on embeddings).
- :func:`embedding_exact_pairs_blocked` — EXACT threshold self-join as an
  evenly-tiled block-matmul grid (audit/verification path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
    bits: int = 8,
    tables: int = 8,
    seed: int = 11,
    dim: int | None = None,
) -> DataFrame:
    """Near-dup pairs (a < b) with cosine ≥ threshold — the 100 TB path.

    OR-amplified hyperplane LSH: ``tables`` independent hash tables of
    ``bits`` hyperplanes each; a pair becomes a candidate if it shares a
    bucket in ANY table (one shuffle on (table, bucket), never a full
    cross-product), then candidates are verified with the EXACT cosine.
    Per-pair recall is 1-(1-p^bits)^tables with p = 1 - angle/π — for true
    near-dups (cosine ≥ 0.9, p ≥ 0.86) the defaults give recall > 0.999.
    For exhaustive exactness (audits, oracle verification) use
    :func:`embedding_exact_pairs_blocked`.
    """
    base = df.select(F.col(id_col), F.col(vec_col))
    if bits <= 0:
        raise ValueError(
            "bits must be > 0; the all-pairs exact path moved to "
            "embedding_exact_pairs_blocked()"
        )
    if dim is None:
        dim = len(base.select(vec_col).first()[0])
    # all T×bits hyperplane projections in ONE BLAS matmul per Arrow batch
    # (T*bits separate zip_with/aggregate SQL folds were ~10× slower)
    P = np.concatenate(
        [_hyperplanes(dim, bits, seed + 1000 * t) for t in range(tables)]
    )  # (tables*bits, dim)
    weights = 1 << np.arange(bits, dtype=np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bucketize(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        signs = (X @ P.T > 0).reshape(len(X), tables, bits)
        bkt = (signs * weights).sum(axis=2).astype(np.int64)
        return pd.Series(list(bkt))

    # one bucketize pass (checkpointed — the self-join would otherwise run
    # the UDF on both sides), with the vector and its norm riding along so
    # the exact-cosine verify happens IN the bucket join itself: candidates
    # are verified and threshold-filtered BEFORE the distinct, so the only
    # re-fetch joins and the big candidate dedup disappear. Norms are
    # computed once per row instead of twice per candidate (same sqrt-of-
    # sum-of-squares expression — bit-identical cosine).
    bucketed = base.select(
        F.col(id_col),
        F.col(vec_col),
        _norm(F.col(vec_col)).alias("_nrm"),
        bucketize(F.col(vec_col)).alias("_bkts"),
    ).localCheckpoint()
    left = bucketed.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("_va"),
        F.col("_nrm").alias("_na"), F.posexplode("_bkts").alias("t", "bkt"),
    )
    right = bucketed.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"),
        F.col("_nrm").alias("_nb"), F.posexplode("_bkts").alias("t", "bkt"),
    )
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        left.join(right, ["t", "bkt"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def embedding_exact_pairs_blocked(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_blocks: int = 8,
) -> DataFrame:
    """EXACT cosine-threshold self-join as a tiled block join.

    The O(n²) compare grid is split into B(B+1)/2 block tiles; each tile is
    one task that gathers two id-hash blocks (bounded memory: 2·n/B rows) and
    runs ONE BLAS matmul over the normalized vectors — evenly distributed, no
    skew, no unbounded single-task self-join, and ~100× faster per pair than
    a per-element SQL fold. Replication factor is B (each row joins B tiles).
    This is the right exact shape when the threshold is too loose for LSH to
    prune (e.g. verification / audit passes); for real near-dup thresholds
    use :func:`embedding_near_dup_pairs`.
    """
    B = num_blocks
    base = df.select(F.col(id_col), F.col(vec_col)).withColumn(
        "_blk", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(B))
    )
    tiles = F.transform(
        F.sequence(F.lit(0), F.lit(B - 1)),
        lambda x: F.struct(
            F.least(F.col("_blk"), x).alias("ti"), F.greatest(F.col("_blk"), x).alias("tj")
        ),
    )
    exploded = base.withColumn("_t", F.explode(tiles)).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"), "_blk",
        F.col("_t.ti").alias("ti"), F.col("_t.tj").alias("tj"),
    )

    thr = float(threshold)

    def tile_pairs(key, pdf):
        ti, tj = key
        X = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        ids = pdf["_id"].to_numpy()
        if ti == tj:
            S = np.round(X @ X.T, 6)
            iu, ju = np.nonzero(np.triu(S >= thr, k=1))
            ia, ib = ids[iu], ids[ju]
        else:
            left = (pdf["_blk"] == ti).to_numpy()
            S = np.round(X[left] @ X[~left].T, 6)
            iu, ju = np.nonzero(S >= thr)
            ia, ib = ids[left][iu], ids[~left][ju]
        return pd.DataFrame(
            {"a": np.minimum(ia, ib), "b": np.maximum(ia, ib), "cosine": S[iu, ju]}
        )

    return exploded.groupBy("ti", "tj").applyInPandas(
        tile_pairs, schema="a long, b long, cosine double"
    )


def nearest_cell_udf(centroids: np.ndarray, metric: str = "l2"):
    """Vectorized nearest-centroid assignment: ONE BLAS matmul per Arrow
    batch against the broadcast (c×d) codebook, so plan size is O(1) in the
    number of centroids (a 64k-cell IVF codebook is just a bigger literal
    in the UDF closure, not a 64k-deep expression tree). Ties break toward
    the smallest centroid index for both metrics (first argmin/argmax).

    ``metric``: "l2" (squared-distance argmin — the IVF convention) or
    "cosine" (similarity argmax — the SemDeDup convention)."""
    C = np.asarray(centroids, dtype=np.float64)
    if metric == "cosine":
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    elif metric == "l2":
        c_sq = (C * C).sum(axis=1)
    else:  # pragma: no cover
        raise ValueError(f"unknown metric {metric!r}")

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        if metric == "cosine":
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
            best = (Xn @ Cn.T).argmax(axis=1)
        else:
            # argmin over ||x-c||² = ||x||² - 2x·c + ||c||²; the ||x||² term
            # is constant per row and cannot change the argmin
            best = (c_sq[None, :] - 2.0 * (X @ C.T)).argmin(axis=1)
        return pd.Series(best.astype("int32"))

    return assign


def kmeans_step(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    metric: str = "l2",
    round_decimals: int | None = None,
) -> DataFrame:
    """ONE distributed Lloyd iteration: assign every vector to its nearest
    centroid, return the per-cluster means as exploded rows
    ``(cluster, idx, value, n)`` (absent clusters emit nothing).

    Scale shape — the map-side-combine k-means (the pattern behind every
    distributed k-means, e.g. Spark MLlib's): per Arrow batch, ONE BLAS
    matmul assigns the whole batch and a scatter-add collapses it to a
    (k × d) partial-sum block, so the corpus-sized scan emits only
    ``batches × k`` tiny rows. Those partials explode to (cluster, idx)
    and shuffle ``batches × k × d`` rows — independent of n, i.e. the same
    cost at 10^12 vectors as at 10^6. The corpus itself never shuffles.

    Assignment ties break toward the smallest centroid index (same
    convention as :func:`nearest_cell_udf`)."""
    C = np.asarray(centroids, dtype=np.float64)
    kk, dim = C.shape
    if metric == "cosine":
        Cn = (C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)).T.copy()
    elif metric == "l2":
        c_sq = (C * C).sum(axis=1)
        CT = C.T.copy()
    else:  # pragma: no cover
        raise ValueError(f"unknown metric {metric!r}")

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if metric == "cosine":
                Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
                best = (Xn @ Cn).argmax(axis=1)
            else:
                # argmin ||x-c||² = argmin (||c||² - 2x·c); ||x||² is
                # row-constant and drops out
                best = (c_sq[None, :] - 2.0 * (X @ CT)).argmin(axis=1)
            sums = np.zeros((kk, dim))
            np.add.at(sums, best, X)
            counts = np.bincount(best, minlength=kk)
            nz = np.flatnonzero(counts)
            yield pd.DataFrame(
                {
                    "cluster": nz.astype("int32"),
                    "n": counts[nz].astype("int64"),
                    "sums": list(sums[nz]),
                }
            )

    partial = df.select(vec_col).mapInPandas(
        partials, "cluster int, n long, sums array<double>"
    )
    exploded = partial.select("cluster", "n", F.posexplode("sums").alias("idx", "s"))
    value = F.sum("s") / F.sum("n")
    if round_decimals is not None:
        value = F.round(value, round_decimals)
    return exploded.groupBy("cluster", "idx").agg(
        value.alias("value"), F.sum("n").alias("n")
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 10,
    tol: float = 1e-6,
    metric: str = "l2",
    init: np.ndarray | None = None,
) -> tuple[np.ndarray, int, float]:
    """Distributed Lloyd k-means over the full corpus — the online codebook
    trainer feeding :func:`ivf_topk`, :func:`semantic_dedup` and
    :func:`pq_encode` (the offline sample-based
    :func:`pq_codebooks_from_rows` remains for per-subspace PQ training).

    Deterministic by construction: ``init`` defaults to the k lowest-id
    vectors (content-keyed, partitioning-independent — the same convention
    as the BPE trainer's sample), each iteration is one
    :func:`kmeans_step` scan, and the only collect is the (k × d) codebook
    itself — driver-sized by definition. Empty clusters retain their
    previous centroid (standard Lloyd repair). Callers should cache/persist
    ``df`` when it isn't already materialized — every iteration re-scans it.

    Returns ``(centroids, n_iter, last_shift)`` where ``last_shift`` is the
    max L2 movement of any centroid in the final iteration."""
    if init is not None:
        C = np.asarray(init, dtype=np.float64).copy()
        if C.shape[0] != k:
            raise ValueError(f"init has {C.shape[0]} rows, expected k={k}")
    else:
        rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
        if len(rows) < k:
            raise ValueError(f"corpus has {len(rows)} rows < k={k}")
        C = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])

    shift = float("inf")
    it = 0
    for it in range(1, max_iter + 1):
        new_c = C.copy()  # empty clusters keep their centroid
        stats = kmeans_step(df, C, vec_col=vec_col, metric=metric).collect()
        for r in stats:
            new_c[r["cluster"], r["idx"]] = r["value"]
        shift = float(np.sqrt(((new_c - C) ** 2).sum(axis=1)).max())
        C = new_c
        if shift <= tol:
            break
    return C, it, shift


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

    Assignment is the matmul UDF (:func:`nearest_cell_udf`), not a per-
    centroid expression chain — plan depth stays O(1) at real codebook
    sizes (4k-64k cells); scoring the probed cells stays JVM-side codegen.
    """
    qv = np.asarray(query_vec, dtype=np.float64)
    dists = ((np.asarray(centroids, dtype=np.float64) - qv) ** 2).sum(axis=1)
    probe_cells = [int(i) for i in np.argsort(dists)[:n_probe]]

    assign = nearest_cell_udf(centroids, metric="l2")
    assigned = df.withColumn("_cell", assign(F.col(vec_col)))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("_cell").isin(probe_cells))
        .select(F.col(id_col), F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_decimals: int = 6,
) -> DataFrame:
    """Batch exact k-NN join: for EVERY query row, the top-k corpus rows by
    cosine. Returns (qid, vec_id, cosine) with k rows per query.

    Scale shape (the batch analog of :func:`cosine_topk`): the small query
    side is collected and broadcast (sc.broadcast — one copy per executor,
    like a broadcast hash join's build side), the corpus is scanned ONCE by
    a mapInPandas block that runs a single BLAS matmul per Arrow batch and
    emits only the per-batch top-k per query. The global merge then ranks
    #batches × k candidate rows per query — the full n_corpus × n_queries
    score matrix never materializes and the corpus is never shuffled.

    Batch-local selection uses the same total order as the final merge
    (rounded cosine desc, id asc), so merging per-batch top-k is exactly the
    global top-k.
    """
    rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    bc = corpus.sparkSession.sparkContext.broadcast((qids, Q.T.copy()))
    kk = int(k)
    nd = int(round_decimals)

    def scan(batches):
        bqids, QT = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            X /= np.linalg.norm(X, axis=1, keepdims=True)
            S = np.round(X @ QT, nd)  # (batch, nq)
            ids = pdf[id_col].to_numpy()
            out_q, out_i, out_s = [], [], []
            for j in range(S.shape[1]):
                order = np.lexsort((ids, -S[:, j]))[:kk]
                out_q.append(np.full(len(order), bqids[j]))
                out_i.append(ids[order])
                out_s.append(S[order, j])
            yield pd.DataFrame(
                {
                    "qid": np.concatenate(out_q),
                    id_col: np.concatenate(out_i),
                    "cosine": np.concatenate(out_s),
                }
            )

    candidates = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        scan, schema=f"qid long, {id_col} long, cosine double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= kk)
        .select("qid", id_col, "cosine")
    )


def semantic_dedup(
    df: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_rows: int = 100_000,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023 shape): cluster the
    corpus against a fixed centroid codebook, then prune within clusters —
    a row is dropped when its cosine to ANY lower-id member of the SAME
    cluster is ≥ ``threshold`` (the deterministic "any earlier example"
    variant of the paper's ε-ball pruning; greedy keep-set pruning differs
    only on chain cases and is not order-stable under retries).

    Returns (id, cluster, kept).

    Scale shape: centroid assignment is ONE BLAS matmul per Arrow batch
    against the broadcast (k×d) codebook — no shuffle; pruning shuffles
    once on cluster id and does the pairwise matmul per cluster, which is
    the point of clustering first: O(n²/k) FLOPs instead of O(n²).

    Hot-cluster skew: a cluster larger than ``max_cluster_rows`` does NOT
    become one O(viral²) task. Because "dropped" compares against ALL
    lower-id members (kept or not), the predicate is tileable exactly like
    :func:`embedding_exact_pairs_blocked`: viral-cluster rows are hash-
    split into ~max_cluster_rows blocks, every block pair becomes one
    bounded matmul task, and a per-id OR-aggregate recovers the identical
    kept set — same semantics at any skew, per-task memory capped at two
    blocks. The O(m²) FLOPs of a viral cluster are inherent to the exact
    rule; the cap distributes them instead of concentrating them.
    """
    assign = nearest_cell_udf(centroids, metric="cosine")
    assigned = df.select(
        F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("cluster")
    )

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("kept", T.BooleanType()),
        ]
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        sims = np.round(Xn @ Xn.T, 6)
        close = sims >= threshold
        lower = np.tri(len(pdf), k=-1, dtype=bool)
        kept = ~(close & lower).any(axis=1)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cluster": pdf["cluster"],
                "kept": kept,
            }
        )

    # cluster-size census is a tiny aggregate (one row per centroid) — the
    # hot-cluster list is driver-sized by construction
    assigned = assigned.localCheckpoint(eager=False)
    sizes = assigned.groupBy("cluster").count().collect()
    hot = {int(r["cluster"]): int(r["count"]) for r in sizes
           if r["count"] > max_cluster_rows}
    cold = assigned if not hot else assigned.filter(
        ~F.col("cluster").isin(list(hot))
    )
    cold_out = cold.groupBy("cluster").applyInPandas(prune, schema=out_schema)
    if not hot:
        return cold_out
    hot_out = _semantic_dedup_tiled(
        assigned.filter(F.col("cluster").isin(list(hot))),
        hot, threshold, vec_col, id_col, max_cluster_rows,
    )
    return cold_out.unionByName(hot_out)


def _semantic_dedup_tiled(
    assigned: DataFrame,
    hot_sizes: dict[int, int],
    threshold: float,
    vec_col: str,
    id_col: str,
    max_cluster_rows: int,
) -> DataFrame:
    """Exact viral-cluster pruning as a bounded tile grid.

    Rows of each hot cluster are hash-assigned to ``nb = ceil(size/cap)``
    blocks; each row is replicated once per tile it participates in
    (tiles (lo, hi) with lo = its block or hi = its block), one shuffle on
    (cluster, lo, hi) runs one bounded matmul per tile, and a final
    groupBy(id) ORs the per-tile "has an earlier close member" verdicts.
    Identical output to the single-task path; per-task rows ≤ ~2 blocks."""
    nb_for = {c: -(-s // max_cluster_rows) for c, s in hot_sizes.items()}
    nb_col = F.element_at(
        F.create_map(*[F.lit(x) for kv in nb_for.items() for x in kv]),
        F.col("cluster"),
    )
    blk = F.pmod(F.xxhash64(F.col(id_col)), nb_col).cast("int")
    tiled = (
        assigned.withColumn("_blk", blk)
        .withColumn("_t", F.explode(F.sequence(F.lit(0), nb_col - 1)))
        .select(
            id_col, vec_col, "cluster",
            F.least("_blk", "_t").alias("_lo"),
            F.greatest("_blk", "_t").alias("_hi"),
            "_blk",
        )
    )

    def tile_verdict(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.reset_index(drop=True)
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
        ids = pdf[id_col].to_numpy()
        lo, hi = int(pdf["_lo"].iloc[0]), int(pdf["_hi"].iloc[0])
        in_lo = (pdf["_blk"] == lo).to_numpy()
        sims = np.round(Xn @ Xn.T, 6)
        close = sims >= threshold
        earlier = ids[None, :] < ids[:, None]
        if lo != hi:
            # cross-block pairs only; within-block pairs belong to tile (b, b)
            cross = in_lo[None, :] != in_lo[:, None]
            close = close & cross
        dropped = (close & earlier).any(axis=1)
        return pd.DataFrame({
            id_col: ids,
            "cluster": pdf["cluster"],
            "dropped": dropped,
        })

    verdicts = tiled.groupBy("cluster", "_lo", "_hi").applyInPandas(
        tile_verdict,
        schema=f"{id_col} long, cluster int, dropped boolean",
    )
    return (
        verdicts.groupBy(id_col)
        .agg(
            F.first("cluster").alias("cluster"),
            (~F.bool_or("dropped")).alias("kept"),
        )
        .select(id_col, "cluster", "kept")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-vector ANN, the 100 TB memory path
# ---------------------------------------------------------------------------


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode vectors to PQ codes (Jégou et al. 2011, public): the
    dimension is split into ``m = codebooks.shape[0]`` subspaces; each
    subvector is replaced by the index of its nearest subspace centroid
    (``codebooks``: (m, ksub, dsub), from an offline k-means — any
    deterministic array works). Output (id, codes: array<int>) is
    m bytes-worth per vector instead of 4·d — the compression that lets a
    10^12-vector index live in executor memory.

    One Arrow batch = m small BLAS matmuls against the broadcast codebook;
    no shuffle. Ties break toward the smallest centroid index (argmin)."""
    C = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = C.shape
    c_sq = (C * C).sum(axis=2)  # (m, ksub)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, d)
        n = len(X)
        codes = np.empty((n, m), dtype=np.int32)
        for j in range(m):
            sub = X[:, j * dsub:(j + 1) * dsub]
            # argmin ||x - c||² = argmin (||c||² - 2 x·c)
            codes[:, j] = (c_sq[j][None, :] - 2.0 * (sub @ C[j].T)).argmin(axis=1)
        return pd.Series(list(codes))

    return df.select(F.col(id_col), encode(F.col(vec_col)).alias("codes"))


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codes_col: str | None = None,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance (ADC): the query stays
    exact; each database vector's distance is the sum over subspaces of
    ``LUT[j][code_j]`` where ``LUT[j][c] = ||q_j - codebook[j][c]||²`` —
    an (m × ksub) table computed ONCE on the driver and baked into the
    plan as literals.

    If ``codes_col`` is given the scan reads PRE-ENCODED codes (the real
    deployment: encode once at ingest, query forever) and the whole
    scoring pass is JVM-side codegen — element_at into the literal LUT
    arrays, no Python at query time. Otherwise vectors are encoded on the
    fly first. TakeOrdered keeps k rows per partition; no global sort.

    Returns (id, adc) ascending (smaller = closer), ties by id."""
    C = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = C.shape
    q = np.asarray(query_vec, dtype=np.float64)
    lut = np.empty((m, ksub))
    for j in range(m):
        diff = C[j] - q[j * dsub:(j + 1) * dsub][None, :]
        lut[j] = (diff * diff).sum(axis=1)

    if codes_col is None:
        encoded = pq_encode(df, C, vec_col=vec_col, id_col=id_col)
        codes_col = "codes"
    else:
        encoded = df.select(F.col(id_col), F.col(codes_col))

    adc = F.lit(0.0)
    for j in range(m):
        table = F.array(*[F.lit(float(v)) for v in lut[j]])
        adc = adc + F.element_at(table, F.element_at(F.col(codes_col), j + 1) + 1)
    scored = encoded.select(F.col(id_col), F.round(adc, 6).alias("adc"))
    return scored.orderBy(F.col("adc").asc(), F.col(id_col).asc()).limit(k)


def pq_codebooks_from_rows(
    vectors: np.ndarray, m: int, ksub: int, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Deterministic seeded Lloyd k-means per subspace over a sample — the
    offline codebook-training step (driver-side: the sample is small by
    construction; a production pipeline would train once per index epoch).
    Returns (m, ksub, dsub)."""
    X = np.asarray(vectors, dtype=np.float64)
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for j in range(m):
        sub = X[:, j * dsub:(j + 1) * dsub]
        cent = sub[rng.choice(n, size=ksub, replace=n < ksub)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                pts = sub[assign == c]
                if len(pts):
                    cent[c] = pts.mean(axis=0)
        books[j] = cent
    return books


def ivf_pq_build(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    residual: bool = True,
) -> DataFrame:
    """Build the IVF-PQ index table ``(id, cell, codes)`` in ONE scan — the
    IVFADC layout of Jégou et al. 2011 (public; the structure behind FAISS
    IndexIVFPQ). Each vector is assigned to its nearest coarse centroid,
    then the RESIDUAL ``x − centroid[cell]`` (or ``x`` itself with
    ``residual=False``) is product-quantized to ``m`` sub-codes.

    Reference analog: the immutable per-split index structures the
    reference builds once at indexing time so queries never touch raw
    documents (quickwit-indexing split build); here the "split" is a
    parquet table and the posting list is the cell.

    Scale shape: one Arrow kernel per batch (one coarse matmul + m sub
    matmuls), NO shuffle. Write the result ``partitionBy("cell")`` and a
    probed query becomes file-level partition pruning — a 4096-cell,
    n_probe=8 query reads ~0.2% of the index. Codes are m small ints per
    vector instead of 4·d floats — the compression that lets a
    10^12-vector index live in a scannable table."""
    C = np.asarray(centroids, dtype=np.float64)  # (ncell, d)
    B = np.asarray(codebooks, dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = B.shape
    c_sq = (C * C).sum(axis=1)
    b_sq = (B * B).sum(axis=2)  # (m, ksub)

    out_t = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    @F.pandas_udf(out_t)
    def build(vecs: pd.Series) -> pd.DataFrame:
        if len(vecs) == 0:
            return pd.DataFrame(
                {"cell": pd.Series([], dtype="int32"), "codes": pd.Series([], dtype=object)}
            )
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        n = len(X)
        # argmin ||x-c||² = argmin (||c||² - 2 x·c); ties → smallest index
        cell = (c_sq[None, :] - 2.0 * (X @ C.T)).argmin(axis=1)
        R = X - C[cell] if residual else X
        codes = np.empty((n, m), dtype=np.int32)
        for j in range(m):
            sub = R[:, j * dsub : (j + 1) * dsub]
            codes[:, j] = (b_sq[j][None, :] - 2.0 * (sub @ B[j].T)).argmin(axis=1)
        return pd.DataFrame({"cell": cell.astype("int32"), "codes": list(codes)})

    built = df.select(F.col(id_col), build(F.col(vec_col)).alias("_ix"))
    return built.select(
        id_col, F.col("_ix.cell").alias("cell"), F.col("_ix.codes").alias("codes")
    )


def ivf_pq_topk(
    index: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    residual: bool = True,
) -> DataFrame:
    """Query an :func:`ivf_pq_build` table: probe the ``n_probe`` coarse
    cells nearest the query, ADC-score ONLY their codes, take top-k.

    Driver side: rank cells by ``||q − centroid||²`` and precompute ONE
    (m × ksub) LUT per probed cell — ``LUT_c[j][code] =
    ||(q − centroid_c)_j − codebook[j][code]||²`` (with ``residual=False``
    the LUT is cell-independent). n_probe·m·ksub doubles: driver-trivial
    at real sizes (8·16·256 = 32k).

    Executor side: ``cell ∈ probed`` filters BEFORE anything else (file
    pruning on a cell-partitioned table — unprobed cells are never read),
    a broadcast of the tiny (cell → LUT) table, then the ADC sum is pure
    codegen (element_at chains) — no Python at query time, raw vectors
    never read. TakeOrdered(k) ends it: k rows per partition, no global
    sort. Returns (id, adc) ascending (smaller = closer), ties by id."""
    C = np.asarray(centroids, dtype=np.float64)
    B = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = B.shape
    q = np.asarray(query_vec, dtype=np.float64)
    cell_d = ((C - q[None, :]) ** 2).sum(axis=1)
    probed = [int(c) for c in np.argsort(cell_d, kind="stable")[:n_probe]]

    lut_rows = []
    for c in probed:
        r = q - C[c] if residual else q
        lut = []
        for j in range(m):
            diff = B[j] - r[j * dsub : (j + 1) * dsub][None, :]
            lut.append([float(v) for v in (diff * diff).sum(axis=1)])
        lut_rows.append((c, lut))
    lut_df = index.sparkSession.createDataFrame(
        lut_rows, schema="cell int, _lut array<array<double>>"
    )

    adc = F.lit(0.0)
    for j in range(m):
        adc = adc + F.element_at(
            F.element_at(F.col("_lut"), j + 1), F.element_at(F.col("codes"), j + 1) + 1
        )
    return (
        index.filter(F.col("cell").isin(probed))
        .join(F.broadcast(lut_df), "cell")
        .select(F.col(id_col), F.round(adc, 6).alias("adc"))
        .orderBy(F.col("adc").asc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_recall(
    truth: DataFrame,
    approx: DataFrame,
    k: int,
    qid_col: str = "qid",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of an approximate neighbor result against exact ground
    truth — the measurement that justifies every ANN shortcut in this
    module (LSH table/bit trade-offs, IVF nprobe, PQ distortion). Both
    inputs are (qid, vec_id[, ...]) frames, ``truth`` holding the exact
    top-k per query (e.g. :func:`knn_join`) and ``approx`` the candidate
    result. Returns one summary row
    (n_queries, mean_recall, min_recall, p50_recall) plus a per-query
    frame is available via ``knn_recall_per_query``.

    Scale shape: one hash join on (qid, id) over two already-small top-k
    frames (≤ k rows per query each) + one two-level aggregation —
    evaluation cost is independent of corpus size.
    """
    per = knn_recall_per_query(truth, approx, k, qid_col, id_col)
    return per.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("recall"), 6).alias("mean_recall"),
        F.round(F.min("recall"), 6).alias("min_recall"),
        F.round(F.expr("percentile(recall, 0.5)"), 6).alias("p50_recall"),
    )


def knn_recall_per_query(
    truth: DataFrame,
    approx: DataFrame,
    k: int,
    qid_col: str = "qid",
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, n_hits, recall) — |approx ∩ truth| / min(k, |truth|) per
    query. Queries the approximate method returned NOTHING for still
    appear (recall 0) via the left join from the truth side."""
    t = truth.select(F.col(qid_col).alias("qid"), F.col(id_col).alias("_id"))
    a = approx.select(
        F.col(qid_col).alias("qid"), F.col(id_col).alias("_id"), F.lit(1).alias("_hit")
    ).dropDuplicates(["qid", "_id"])
    joined = t.join(a, ["qid", "_id"], "left")
    return (
        joined.groupBy("qid")
        .agg(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hits"),
            F.count(F.lit(1)).alias("_n_truth"),
        )
        .select(
            "qid",
            "n_hits",
            F.round(
                F.col("n_hits") / F.least(F.lit(k), F.col("_n_truth")), 6
            ).alias("recall"),
        )
    )


def embedding_dedup_incremental(
    new_df: DataFrame,
    index_emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    bits: int = 8,
    tables: int = 8,
    seed: int = 11,
    round_decimals: int = 6,
):
    """Semantic dedup of a NEW batch against an already-deduped embedding
    index — the embedding analog of dedup.minhash_dedup_incremental, for
    continuous ingestion with near-duplicate-by-meaning suppression.
    ``index_emb`` is the persisted (id, embedding) table of prior
    survivors; ids must be disjoint from the batch.

    Returns the shared :class:`~quickwit_spark.operators.dedup.
    IncrementalDedup` shape: pairs (a, b, cosine, partner old/new),
    new_kept ids, kept_sigs = survivors' (id, embedding) rows (the
    per-epoch index delta), updated_index = index ∪ delta. Survivor rule
    is dedup.incremental_keep (corpus copy canonical, min-id within
    all-new components).

    Scale shape: the batch is collected and BROADCAST as one normalized
    matrix (batches are driver-sized next to the corpus, same contract as
    knn_join's query side); the index is scanned ONCE by a mapInPandas
    kernel doing a single BLAS matmul per Arrow batch and emitting only
    ≥-threshold pairs — the corpus never shuffles and the n_index × n_new
    score matrix never materializes. In-batch pairs use the OR-amplified
    LSH self-join (embedding_near_dup_pairs) over the batch alone.
    """
    from quickwit_spark.operators.dedup import IncrementalDedup, incremental_keep

    base_new = new_df.select(F.col(id_col), F.col(vec_col)).localCheckpoint()
    rows = base_new.collect()
    nd = int(round_decimals)
    thr = float(threshold)
    if rows:
        bids = np.array([r[0] for r in rows], dtype=np.int64)
        Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        bc = new_df.sparkSession.sparkContext.broadcast((bids, Q.T.copy()))

        def probe(batches):
            pbids, QT = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                X /= np.linalg.norm(X, axis=1, keepdims=True)
                S = np.round(X @ QT, nd)  # (index-batch, n_new)
                iu, ju = np.nonzero(S >= thr)
                yield pd.DataFrame(
                    {
                        "a": pdf[id_col].to_numpy()[iu],
                        "b": pbids[ju],
                        "cosine": S[iu, ju],
                    }
                )

        nv_old = (
            index_emb.select(F.col(id_col), F.col(vec_col))
            .mapInPandas(probe, schema="a long, b long, cosine double")
            .withColumn("partner", F.lit("old"))
        )
    else:
        nv_old = new_df.sparkSession.createDataFrame(
            [], "a long, b long, cosine double, partner string"
        )
    if rows:
        nv_new = embedding_near_dup_pairs(
            base_new, threshold=thr, vec_col=vec_col, id_col=id_col,
            bits=bits, tables=tables, seed=seed,
            dim=len(np.asarray(rows[0][1])),
        ).withColumn("partner", F.lit("new"))
        pairs = nv_old.unionByName(nv_new).localCheckpoint()
    else:
        pairs = nv_old

    new_ids = base_new.select(id_col)
    kept = incremental_keep(new_ids, index_emb.select(id_col), pairs, id_col)
    kept_embs = base_new.join(kept, id_col, "semi")
    return IncrementalDedup(
        pairs, kept, kept_embs, index_emb.unionByName(kept_embs)
    )


# --- scalar quantization (SQ8) -------------------------------------------


def sq8_params(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, scale) for 8-bit scalar quantization — the
    "train" step (Faiss's ScalarQuantizer QT_8bit layout, public): one
    posexplode → groupBy(dim) min/max pass (map-side combined, the shuffle
    carries dims × partitions rows regardless of corpus size). Returns
    (mins, scales) with scale_d = (max_d - min_d) / 255."""
    stats = (
        df.select(F.posexplode(F.col(vec_col)).alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("dim")
        .collect()
    )
    mins = np.array([r["mn"] for r in stats], dtype=np.float64)
    maxs = np.array([r["mx"] for r in stats], dtype=np.float64)
    return mins, (maxs - mins) / 255.0


def sq8_encode(
    df: DataFrame,
    mins: np.ndarray,
    scales: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode vectors to per-dim uint8 codes, pure codegen: code_d =
    clip(round((v_d - min_d) / scale_d), 0, 255), zero-range dims code 0.
    4x smaller than float32 (vs PQ's ~32x) but with NO codebook training
    and much tighter reconstruction — the standard middle rung of the
    compression ladder. One projection, no shuffle, no Python."""
    mins_a = F.array(*[F.lit(float(v)) for v in mins])
    scales_a = F.array(*[F.lit(float(v)) for v in scales])
    codes = F.transform(
        F.col(vec_col),
        lambda x, i: F.when(F.element_at(scales_a, i + 1) == 0.0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.round(
                        (x - F.element_at(mins_a, i + 1))
                        / F.element_at(scales_a, i + 1)
                    ).cast("int"),
                ),
            )
        ),
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def sq8_topk(
    encoded: DataFrame,
    query_vec: list[float],
    mins: np.ndarray,
    scales: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Approximate L2 top-k over SQ8 codes: dist = sum_d (q_d - recon_d)^2
    with recon_d = min_d + code_d * scale_d. Like pq_topk's ADC pass this
    is pure JVM codegen — per-dim constants are baked into the plan as
    literals, vectors are never decoded to a column, TakeOrdered keeps k
    per partition (no global sort). Returns (id, dist) ascending, ties by
    id."""
    q = np.asarray(query_vec, dtype=np.float64)
    dist = F.lit(0.0)
    for d in range(len(q)):
        recon = F.lit(float(mins[d])) + F.element_at(
            F.col(codes_col), d + 1
        ) * F.lit(float(scales[d]))
        dist = dist + (F.lit(float(q[d])) - recon) * (F.lit(float(q[d])) - recon)
    scored = encoded.select(F.col(id_col), F.round(dist, 6).alias("dist"))
    return scored.orderBy(F.col("dist").asc(), F.col(id_col).asc()).limit(k)
