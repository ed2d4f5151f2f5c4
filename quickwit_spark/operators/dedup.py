"""Deduplication operators for large-scale training-data pipelines.

All shuffle-aware: exact dedup is a single hash groupBy; MinHash-LSH shuffles
once on (band, bucket) — candidate pairs never materialize the full
cross-product; SimHash buckets on rotated prefixes. Python appears only in
Arrow-vectorized pandas UDFs (hashing batches with numpy).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per identical text — one hash groupBy.

    At scale: group on ``xxhash64(text)`` first (fixed-width shuffle key)
    then break the rare collisions on the text itself.
    """
    return (
        df.groupBy(F.xxhash64(F.col(text_col)).alias("_h"), F.col(text_col))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------

def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    # odd multipliers → bijections mod 2^64; (a*h + b) wrapping is a cheap,
    # fully-vectorizable min-wise hash family
    a = (rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
    num_perm: int = 64,
    seed: int = 1,
) -> DataFrame:
    """(id, signature array<long>) — word-shingle MinHash.

    Shingles are built JVM-side (split + transform over index sequence); the
    permutation mins run zero-copy over Arrow list batches (flat values +
    offsets — see :func:`_sig_arrow_frame`).
    """
    return _sig_arrow_frame(
        df, text_col, id_col, shingle_size, num_perm, seed, want_sh=False
    )


def _sig_arrow_frame(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_size: int,
    num_perm: int,
    seed: int,
    want_sh: bool,
) -> DataFrame:
    """Signature (+ optional distinct-shingle-set) frame via ``mapInArrow``.

    An Arrow ``list<int64>`` column IS a flat value buffer plus an offsets
    array (guide §4.2) — exactly the (flat, offsets) layout the segmented-
    min kernel needs — so the batch converts zero-copy instead of paying
    the pandas per-row list→ndarray materialization (measured: the pandas
    serde blocked executor threads ~4× longer than the numpy work itself).
    The minhash arithmetic is byte-identical to the previous pandas UDF
    (same params, same reduceat over the same offsets), so signatures are
    unchanged. ``sh`` (when requested) is the per-row distinct shingle-hash
    set; downstream consumes only intersection SIZES and counts, so its
    sorted order (np.unique) vs first-occurrence order is immaterial."""
    a, b = _minhash_params(num_perm, seed)
    tok_df = df.select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), r"\s+").alias("_toks")
    )
    hashed = F.transform(_shingles_expr(shingle_size), lambda s: F.xxhash64(s))
    base = tok_df.select(F.col(id_col), hashed.alias("_hs"))
    fields = [base.schema[id_col], T.StructField("signature", T.ArrayType(T.LongType()))]
    if want_sh:
        fields += [
            T.StructField("sh", T.ArrayType(T.LongType())),
            T.StructField("n", T.IntegerType()),
        ]
    out_schema = T.StructType(fields)

    def batches(it):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            ids, lst = batch.column(0), batch.column(1)
            lens = pc.list_value_length(lst).to_numpy().astype(np.int64)
            flat = pc.list_flatten(lst).to_numpy().astype(np.uint64)
            offsets = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            sigs = np.empty((n, num_perm), dtype=np.int64)
            for lo in range(0, num_perm, 16):
                hi = min(lo + 16, num_perm)
                vals = flat[None, :] * a[lo:hi, None] + b[lo:hi, None]
                mins = np.minimum.reduceat(vals, offsets, axis=1)
                sigs[:, lo:hi] = mins.T.astype(np.int64)
            sig_off = pa.array(
                np.arange(0, (n + 1) * num_perm, num_perm, dtype=np.int32)
            )
            sig_arr = pa.ListArray.from_arrays(
                sig_off, pa.array(sigs.reshape(-1), pa.int64())
            )
            cols = [ids, sig_arr]
            if want_sh:
                uniq = [
                    np.unique(flat[offsets[i]:offsets[i] + lens[i]])
                    for i in range(n)
                ]
                ulens = np.fromiter((len(u) for u in uniq), np.int64, count=n)
                uoff = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(ulens, out=uoff[1:])
                sh_arr = pa.ListArray.from_arrays(
                    pa.array(uoff.astype(np.int32)),
                    pa.array(
                        np.concatenate(uniq).astype(np.int64)
                        if len(uniq)
                        else np.array([], np.int64),
                        pa.int64(),
                    ),
                )
                cols += [sh_arr, pa.array(ulens.astype(np.int32))]
            yield pa.RecordBatch.from_arrays(
                cols, names=[f.name for f in fields]
            )

    return base.mapInArrow(batches, schema=out_schema)


def _shingles_expr(shingle_size: int, toks_col: str = "_toks"):
    """Word-shingle array over a materialized token-array column (element_at
    reads an attribute; inlining the split would be O(tokens²) string
    splits per row).

    ``try_element_at``: a doc shorter than the shingle size still emits its
    one forced shingle (n_sh floors at 1); plain ``element_at`` past the
    end RAISES under ANSI mode (Spark 4 default), crashing the whole job
    on the first short document. The nulls are skipped by ``concat_ws``,
    so the short-doc shingle is the join of the available tokens — exactly
    what the DuckDB oracle's bounds-clamped ``words[i:i+k]`` slice
    produces; full-length shingles are untouched (indices in range)."""
    toks = F.col(toks_col)
    n_sh = F.greatest(F.size(toks) - F.lit(shingle_size - 1), F.lit(1))
    idx = F.sequence(F.lit(0), n_sh - 1)
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            *[F.try_element_at(toks, i + F.lit(k + 1)) for k in range(shingle_size)],
        ),
    )


def _sig_udf(num_perm: int, seed: int = 1):
    """Reference pandas-UDF MinHash signature (the pre-Arrow formulation).
    Retained only as the golden cross-check for the zero-copy
    :func:`_sig_arrow_frame` path (same rule as ``_simhash_col_sql`` for
    SimHash): the parity test pins the two bit-identical."""
    a, b = _minhash_params(num_perm, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig(hashes: pd.Series) -> pd.Series:
        # fully vectorized: one (perm-block × total-shingles) broadcast per
        # block + segmented min (reduceat) — no per-row Python loop. Perm
        # blocks bound the temporary to ~#shingles × 16 × 8B.
        arrs = [np.asarray(hs, dtype=np.int64) for hs in hashes]
        n = len(arrs)
        if n == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(x) for x in arrs), dtype=np.int64, count=n)
        flat = np.concatenate(arrs).astype(np.uint64)
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        sigs = np.empty((n, num_perm), dtype=np.int64)
        for lo in range(0, num_perm, 16):
            hi = min(lo + 16, num_perm)
            vals = flat[None, :] * a[lo:hi, None] + b[lo:hi, None]  # wraps mod 2^64
            mins = np.minimum.reduceat(vals, offsets, axis=1)  # (block, n)
            sigs[:, lo:hi] = mins.T.astype(np.int64)
        return pd.Series(list(sigs))

    return sig


def _signatures_with_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
    num_perm: int = 64,
    seed: int = 1,
) -> DataFrame:
    """(id, signature, sh, n) in ONE scan: the exact-verify tier needs both
    the MinHash signature and the distinct shingle set; deriving them from
    the same shingle pipeline lets the caller checkpoint once.

    The verify tier works on the DISTINCT HASHED shingle set: Jaccard over
    64-bit hashes equals Jaccard over the strings (collisions are ~n²/2^64
    — none at any realistic shingle count), the checkpoint shrinks from
    ~30B/shingle of text to 8B, and the verify array_intersect compares
    longs instead of strings (measured win at sf0.1). Signature + sh + n
    all come out of ONE zero-copy Arrow pass (:func:`_sig_arrow_frame`)."""
    return _sig_arrow_frame(
        df, text_col, id_col, shingle_size, num_perm, seed, want_sh=True
    )


def minhash_postings(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 16,
    num_perm: int = 64,
) -> DataFrame:
    """(id, band, bucket) — the banded-LSH posting table derived from a
    signature table, pure codegen (element_at + xxhash64; no UDF, no
    shuffle). This IS the persistable index of the incremental path: write
    it ``partitionBy("band")`` (or bucketed by (band, bucket)) and a new
    batch probes it without the stored corpus ever being re-read or
    re-hashed — the DataFrame re-expression of the reference's immutable
    per-split index structures that make queries independent of raw
    documents."""
    rows_per_band = num_perm // num_bands
    return signatures.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("signature", band * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for band in range(num_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 16,
    num_perm: int = 64,
) -> DataFrame:
    """Banded LSH: rows sharing any band bucket become candidate pairs.

    One shuffle on (band, bucket); self-join within buckets only. Returns
    distinct (a, b) with a < b. ``num_perm`` must match the signature width
    (explicit — no driver-side ``.first()`` probe).
    """
    banded = minhash_postings(signatures, id_col, num_bands, num_perm)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )


def _sig_est_col(sig_a="sig_a", sig_b="sig_b"):
    """Signature agreement ratio — the MinHash Jaccard estimator."""
    agree = F.size(
        F.filter(
            F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return agree / F.size(sig_a)


class IncrementalDedup(NamedTuple):
    """Result of :func:`minhash_dedup_incremental`. ``kept_sigs`` is the
    batch's contribution to the signature index (survivors only) — the
    row set a streaming sink appends per epoch; ``updated_index`` is the
    full next-batch index (``index_sigs ∪ kept_sigs``)."""

    pairs: DataFrame
    new_kept: DataFrame
    kept_sigs: DataFrame
    updated_index: DataFrame


def incremental_keep(
    new_ids: DataFrame, index_ids: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """The incremental-dedup survivor rule, shared by the MinHash and
    embedding variants: connected components over all matched pairs; a
    component touching ANY index doc keeps no new doc (the corpus copy is
    canonical), an all-new component keeps its min id; unmatched new docs
    survive. ``pairs`` needs columns (a, b)."""
    if pairs.isEmpty():
        return new_ids
    clusters = near_dup_clusters(pairs.select("a", "b"))
    old_members = clusters.join(
        index_ids.select(F.col(id_col).alias("member")), "member", "semi"
    ).select("cluster").distinct()
    # min NEW member per cluster, unless the cluster touches the index
    new_members = clusters.join(
        new_ids.withColumnRenamed(id_col, "member"), "member", "semi"
    )
    cluster_keep = (
        new_members.join(old_members, "cluster", "anti")
        .groupBy("cluster")
        .agg(F.min("member").alias(id_col))
        .select(id_col)
    )
    matched = clusters.select(F.col("member").alias(id_col))
    return new_ids.join(matched, id_col, "anti").unionByName(cluster_keep)


def minhash_dedup_incremental(
    new_df: DataFrame,
    index_sigs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_size: int = 3,
    num_perm: int = 64,
    num_bands: int = 16,
    seed: int = 1,
    broadcast_new: bool = True,
) -> IncrementalDedup:
    """Dedup a NEW batch against an already-deduped corpus without
    re-reading the corpus — the continuous-ingestion shape. ``index_sigs``
    is the persisted (id, signature) table from prior batches (build with
    :func:`minhash_signatures`, same shingle/perm/seed params — signatures
    are deterministic per seed, so estimates equal the batch-mode values).
    Ids must be disjoint between the index and the new batch.

    Returns an :class:`IncrementalDedup`:

    - ``pairs`` — (a, b, est_jaccard, partner) with est ≥ threshold;
      ``partner`` is ``old`` for new-vs-index matches (a = index id) and
      ``new`` for matches inside the batch (a < b).
    - ``new_kept`` — (id) new docs that survive: connected components over
      all matched pairs (same min-id rule as :func:`near_dup_clusters`);
      a component containing ANY index doc keeps no new doc (the corpus
      copy is the canonical one), an all-new component keeps its min id.
    - ``kept_sigs`` — survivors' (id, signature): the delta a streaming
      sink appends per epoch (streaming/dedup_stream.py).
    - ``updated_index`` — ``index_sigs ∪ kept_sigs``, ready to persist
      whole for the next batch.

    Equivalence: if the index corpus has no internal near-dups at the
    threshold, (new_kept ∪ index ids) equals the kept set of a full-batch
    ``minhash_dedup_pairs`` + ``near_dup_clusters`` run over old ∪ new —
    pytest-asserted on planted fixtures.

    Scale shape (the point of the operator): the 100 TB corpus contributes
    ONLY its posting table — derived from stored signatures in pure
    codegen, or read directly if :func:`minhash_postings` output was
    persisted partitionBy(band). With ``broadcast_new`` (a batch is small
    next to the corpus) the probe is a BroadcastHashJoin: the index side
    streams map-side, zero shuffle of corpus data, plan-asserted in tests.
    Old signatures are fetched for VERIFICATION only for matched candidate
    ids (a semi-join-sized subset), never for the whole corpus. The
    new-vs-new path is the ordinary banded self-join over the batch."""
    new_sigs = minhash_signatures(
        new_df, text_col, id_col, shingle_size, num_perm, seed
    ).localCheckpoint()

    new_post = minhash_postings(new_sigs, id_col, num_bands, num_perm)
    old_post = minhash_postings(index_sigs, id_col, num_bands, num_perm)
    probe = F.broadcast(new_post) if broadcast_new else new_post
    nv_old = (
        old_post.withColumnRenamed(id_col, "a")
        .join(probe.withColumnRenamed(id_col, "b"), ["band", "bucket"])
        .select("a", "b")
        .distinct()
    )
    nv_old_scored = (
        nv_old.join(
            index_sigs.select(F.col(id_col).alias("a"), F.col("signature").alias("sig_a")),
            "a",
        )
        .join(
            new_sigs.select(F.col(id_col).alias("b"), F.col("signature").alias("sig_b")),
            "b",
        )
        .select(
            "a", "b", F.round(_sig_est_col(), 6).alias("est_jaccard"),
            F.lit("old").alias("partner"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )

    nv_new = lsh_candidate_pairs(new_sigs, id_col, num_bands, num_perm)
    sl = new_sigs.select(F.col(id_col).alias("a"), F.col("signature").alias("sig_a"))
    sr = new_sigs.select(F.col(id_col).alias("b"), F.col("signature").alias("sig_b"))
    nv_new_scored = (
        nv_new.join(sl, "a")
        .join(sr, "b")
        .select(
            "a", "b", F.round(_sig_est_col(), 6).alias("est_jaccard"),
            F.lit("new").alias("partner"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    pairs = nv_old_scored.unionByName(nv_new_scored).localCheckpoint()

    new_ids = new_sigs.select(F.col(id_col))
    kept = incremental_keep(new_ids, index_sigs.select(id_col), pairs, id_col)
    kept_sigs = new_sigs.join(kept, id_col, "semi")
    return IncrementalDedup(
        pairs, kept, kept_sigs, index_sigs.unionByName(kept_sigs)
    )


def _shingle_sets(df: DataFrame, text_col: str, id_col: str, shingle_size: int) -> DataFrame:
    """(id, sh: distinct word-shingle array, n: |sh|) — shared by the exact
    Jaccard paths (JVM-side: split + transform over an index sequence)."""
    tok_df = df.select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), r"\s+").alias("_toks")
    )
    toks = F.col("_toks")
    n_sh = F.greatest(F.size(toks) - F.lit(shingle_size - 1), F.lit(1))
    idx = F.sequence(F.lit(0), n_sh - 1)
    # try_element_at: same short-doc/ANSI rationale as _shingles_expr
    shingles = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                *[F.try_element_at(toks, i + F.lit(k + 1)) for k in range(shingle_size)],
            ),
        )
    )
    return tok_df.select(F.col(id_col), shingles.alias("sh")).select(
        F.col(id_col), F.col("sh"), F.size("sh").alias("n")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_size: int = 3,
    num_perm: int = 64,
    num_bands: int = 16,
    verify: str = "est",
) -> DataFrame:
    """Near-dup pairs: LSH candidates verified by Jaccard ≥ threshold.

    ``verify="est"`` scores candidates by signature agreement ratio (cheap,
    approximate — the classic sketch-only path). ``verify="exact"`` computes
    the TRUE Jaccard over the full shingle sets of each candidate pair (the
    production precision step: LSH bounds the candidate set, the exact
    verify removes estimator false positives; cost is O(candidates), never
    O(n²)). Exact verify makes the output deterministic given only the data
    — estimator noise can otherwise promote a 0.98-Jaccard pair past a 1.0
    threshold when all ``num_perm`` mins happen to collide.

    Materialization: signatures are ALWAYS localCheckpointed — the banded
    self-join consumes them on both sides and the measured AQE plan does
    NOT reuse the exchange (the ArrowEval signature UDF shows up twice
    without the checkpoint; A/B at sf0.1 measured ~2× slower). The est path
    additionally feeds the two agreement joins (4 consumers total).

    The exact path builds signatures AND distinct shingle sets in one scan
    behind ONE checkpoint (MinHash over the shingle multiset equals MinHash
    over the set — duplicates never change a min — so both derive from the
    same shingle pipeline; measured: saves a second checkpoint barrier and
    a second corpus scan)."""
    if verify == "exact":
        base = _signatures_with_shingles(
            df, text_col, id_col, shingle_size, num_perm
        ).localCheckpoint()
        sigs = base.select(id_col, "signature")
        sh = base.select(id_col, "sh", "n")
        cands = lsh_candidate_pairs(sigs, id_col, num_bands, num_perm=num_perm)
        joined = (
            cands.join(
                sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"),
                          F.col("n").alias("na")), "a")
            .join(
                sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"),
                          F.col("n").alias("nb")), "b")
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        jac = inter / (F.col("na") + F.col("nb") - inter)
        return joined.select("a", "b", F.round(jac, 6).alias("jaccard")).filter(
            F.col("jaccard") >= threshold
        )
    sigs = minhash_signatures(df, text_col, id_col, shingle_size, num_perm)
    sigs = sigs.localCheckpoint()
    cands = lsh_candidate_pairs(sigs, id_col, num_bands, num_perm=num_perm)
    sl = sigs.select(F.col(id_col).alias("a"), F.col("signature").alias("sig_a"))
    sr = sigs.select(F.col(id_col).alias("b"), F.col("signature").alias("sig_b"))
    joined = cands.join(sl, "a").join(sr, "b")
    est = _sig_est_col()
    return joined.select("a", "b", F.round(est, 6).alias("est_jaccard")).filter(
        F.col("est_jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification / small-side oracle)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_size: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Exact word-shingle Jaccard over candidate pairs that share ≥1 shingle
    (inverted-index join — never a full cross product).

    Stop-shingle pruning: a shingle appearing in k docs contributes k² rows
    to the candidate self-join, so shingles with document frequency >
    ``max_shingle_df`` are dropped from the INDEX before the join (standard
    AllPairs/prefix-filter trick). Jaccard is then computed EXACTLY from the
    full shingle sets of each surviving candidate pair (array_intersect), so
    pruning only affects candidate generation — a pair is missed only if it
    shares NOTHING but stop-shingles, in which case its Jaccard is ≤
    n_common_stop / (na + nb - n_common_stop), far below useful thresholds.
    """
    sh = _shingle_sets(df, text_col, id_col, shingle_size)
    inv = sh.select(id_col, F.explode("sh").alias("s"))
    rare = (
        inv.groupBy("s")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_shingle_df)
        .select("s")
    )
    inv = inv.join(rare, "s")
    cands = (
        inv.alias("l")
        .join(
            inv.alias("r"),
            (F.col("l.s") == F.col("r.s"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("a"), F.col(f"r.{id_col}").alias("b"))
        .distinct()
    )
    joined = (
        cands.join(sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"), F.col("n").alias("na")), "a")
        .join(sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"), F.col("n").alias("nb")), "b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("na") + F.col("nb") - inter)
    return joined.select("a", "b", F.round(jac, 6).alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_SIMHASH_UDF = None


def _simhash_kernel(flat: np.ndarray, offsets: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-row 64-bit SimHash from flattened token hashes + row offsets —
    the popcount-majority vote, fully vectorized (shared by the pandas
    column UDF and the zero-copy Arrow frame path; one implementation ⇒
    bit-identical values on both)."""
    weights = np.arange(64, dtype=np.uint64)
    bits = ((flat[:, None] >> weights) & np.uint64(1)).astype(np.int64)
    counts = np.add.reduceat(bits, offsets, axis=0)
    sim = (counts * 2 > lens[:, None]).astype(np.uint64)
    return (sim << weights).sum(axis=1, dtype=np.uint64).astype(np.int64)


def _simhash_frame(
    df: DataFrame, text_col: str, id_col: str, verify_exact: bool
) -> DataFrame:
    """(id, sim[, _ms]) via ``mapInArrow``: token hashes arrive as ONE flat
    Arrow value buffer + offsets (no per-row pandas list materialization —
    same zero-copy shape as :func:`_sig_arrow_frame`, guide §4.2); the
    sorted-token multiset column used by exact verify passes through the
    batch untouched. Values are bit-identical to ``simhash_col`` (shared
    kernel)."""
    hashed = F.transform(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.xxhash64(t)
    )
    cols = [F.col(id_col), hashed.alias("_hs")]
    fields = [df.select(F.col(id_col)).schema[id_col], T.StructField("sim", T.LongType())]
    if verify_exact:
        cols.append(
            F.array_sort(F.split(F.lower(F.col(text_col)), r"\s+")).alias("_ms")
        )
        fields.append(T.StructField("_ms", T.ArrayType(T.StringType())))
    base = df.select(*cols)
    out_schema = T.StructType(fields)
    names = [f.name for f in fields]

    def batches(it):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            lst = batch.column(1)
            lens = pc.list_value_length(lst).to_numpy().astype(np.int64)
            flat = pc.list_flatten(lst).to_numpy().astype(np.uint64)
            offsets = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            vals = _simhash_kernel(flat, offsets, lens)
            out = [batch.column(0), pa.array(vals, pa.int64())]
            if verify_exact:
                out.append(batch.column(2))
            yield pa.RecordBatch.from_arrays(out, names=names)

    return base.mapInArrow(batches, schema=out_schema)


def _simhash_udf():
    """Arrow-batched popcount-majority over per-token hash arrays.

    Cached module-level so repeated plan builds reuse one UDF (fresh pandas
    UDFs per plan churn the Python workers)."""
    global _SIMHASH_UDF
    if _SIMHASH_UDF is None:

        @F.pandas_udf(T.LongType())
        def _sim(hashes: pd.Series) -> pd.Series:
            arrs = [np.asarray(h, dtype=np.int64) for h in hashes]
            if not arrs:
                return pd.Series([], dtype="int64")
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
            flat = np.concatenate(arrs).astype(np.uint64)
            offsets = np.zeros(len(arrs), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            return pd.Series(_simhash_kernel(flat, offsets, lens))

        _SIMHASH_UDF = _sim
    return _SIMHASH_UDF


def simhash_col(text_col: str = "text"):
    """64-bit SimHash over word tokens: per-token xxhash64 JVM-side, then ONE
    Arrow-batched pandas UDF does the per-bit majority vote with a fully
    vectorized numpy reduceat (same style as the MinHash signature UDF).

    Bit-for-bit identical to the previous all-SQL formulation
    (:func:`_simhash_col_sql`, kept for the parity test) — the 64-iteration
    zip_with/aggregate SQL megaexpression defeated codegen and was ~10×
    slower than this Arrow path.
    """
    hashed = F.transform(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.xxhash64(t)
    )
    return _simhash_udf()(hashed)


def _simhash_col_sql(text_col: str = "text"):
    """Reference all-SQL SimHash (per-bit majority via zip_with/aggregate).
    Retained only as the golden cross-check for :func:`simhash_col`."""
    # transform over a 1-element array binds the token split ONCE (SQL has no
    # `let`); without it the split would be re-evaluated per bit
    return F.expr(
        f"""
        transform(array(split(lower({text_col}), '\\\\s+')), toks ->
          aggregate(
            zip_with(
              transform(
                aggregate(
                  transform(toks, t -> xxhash64(t)),
                  array_repeat(0, 64),
                  (acc, h) -> zip_with(
                    acc,
                    transform(sequence(0, 63),
                              i -> CAST(shiftrightunsigned(h, CAST(i AS INT)) & 1 AS INT)),
                    (a, b) -> a + b
                  )
                ),
                c -> IF(c * 2 > size(toks), 1L, 0L)
              ),
              sequence(0, 63),
              (b, i) -> shiftleft(b, CAST(i AS INT))
            ),
            0L, (acc, v) -> acc | v
          )
        )[0]
        """
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    verify_exact: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ k, bucketed on 16-bit
    chunks (pigeonhole: any pair within distance 3 shares ≥1 of 4 chunks).

    ``verify_exact=True`` adds the classic precision step behind the sketch:
    surviving pairs are checked for equality of their sorted token multisets
    (SimHash's own invariant — it is order-blind), so hash collisions between
    genuinely different documents are filtered. With ``max_hamming=0`` this
    is exact content dedup with SimHash doing the bucketing.

    Signatures are materialized once (localCheckpoint) — both sides of the
    chunk join would otherwise recompute the SimHash UDF. With
    ``verify_exact`` the sorted token multiset rides in the SAME checkpointed
    frame (one corpus scan, one write barrier — the a/b verify joins would
    otherwise re-split the text twice; same shape as the minhash exact
    tier). The frame is built zero-copy via :func:`_simhash_frame` (values
    bit-identical to ``simhash_col`` — shared kernel)."""
    sh = _simhash_frame(df, text_col, id_col, verify_exact).localCheckpoint()
    if max_hamming == 0:
        # hamming-0 fast path: such pairs share the WHOLE hash, so bucket on
        # the full 64-bit value — one equi-join instead of the 4× chunk
        # explode + 4-way duplicated candidates + distinct, and the verify
        # columns ride the same join (no re-fetch joins). Same rows as the
        # pigeonhole path at k=0 (a pair shares all 4 chunks ⟺ it shares
        # the hash; each id occurs once per side so a<b emits each pair
        # exactly once).
        keys = ["sim"] + (["_ms"] if verify_exact else [])
        left = sh.select(
            F.col(id_col).alias("a"), *[F.col(k).alias(f"{k}_a") for k in keys]
        )
        right = sh.select(
            F.col(id_col).alias("b"), *[F.col(k).alias(f"{k}_b") for k in keys]
        )
        cond = F.col("a") < F.col("b")
        for k in keys:
            cond = (F.col(f"{k}_a") == F.col(f"{k}_b")) & cond
        return left.join(right, cond).select(
            "a",
            "b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
    chunks = sh.select(
        id_col,
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col("sim"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select(id_col, "sim", "c.chunk", "c.key")
    pairs = (
        chunks.alias("l")
        .join(
            chunks.alias("r"),
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("a"),
            F.col(f"r.{id_col}").alias("b"),
            F.col("l.sim").alias("sim_a"),
            F.col("r.sim").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    out = pairs.select("a", "b", ham.alias("hamming")).filter(F.col("hamming") <= max_hamming)
    if verify_exact:
        norm = sh.select(F.col(id_col), F.col("_ms"))
        out = (
            out.join(norm.select(F.col(id_col).alias("a"), F.col("_ms").alias("ms_a")), "a")
            .join(norm.select(F.col(id_col).alias("b"), F.col("_ms").alias("ms_b")), "b")
            .filter(F.col("ms_a") == F.col("ms_b"))
            .select("a", "b", "hamming")
        )
    return out


# ---------------------------------------------------------------------------
# near-dup clustering (pairs → connected components → keep-one selection)
# ---------------------------------------------------------------------------


def near_dup_clusters(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
    small_graph_edges: int = 200_000,
) -> DataFrame:
    """Connected components over near-dup pairs: (member, cluster) where
    ``cluster`` is the smallest id reachable from the member — the canonical
    document a dedup pipeline KEEPS (min-id selection).

    Two-level contraction (the scalable CC pattern): each round runs an
    EXACT union-find (union-by-min, path compression) inside every partition
    via one Arrow batch pass, contracts the edge set through the local roots,
    and keeps only edges that still CROSS partitions — the boundary graph,
    which shrinks geometrically. Rounds ≈ O(log #partitions), not graph
    diameter: a chain of length 10⁶ inside one partition resolves in its
    single local pass, where min-label propagation needs 10⁶ joins. The
    global (node → label) map composes through one join per round. Raises
    if ``max_iter`` rounds don't converge (never observed: boundary rounds
    are logarithmic in partition count) rather than returning non-final
    labels.

    Small-graph fast path: when the (distinct) edge set is at most
    ``small_graph_edges`` rows it is coalesced into ONE partition, so the
    first local union-find pass solves the whole graph and the loop exits
    after a single round — dedup candidate graphs are orders of magnitude
    smaller than the corpus, and paying log-P contraction rounds of tiny
    scheduled jobs for a graph far below one partition's capacity is pure
    overhead (guide §1.2: fix the distributed algorithm's pass count
    first). The labels are identical either way: union-by-min union-find
    yields the min reachable id per component regardless of partitioning.
    The count() that gates the path reads the just-checkpointed edge set —
    a metadata-cheap job, not a recompute.
    """
    import pandas as pd

    node_t = pairs.schema[a_col].dataType
    from pyspark.sql.types import StructField, StructType

    rep_schema = StructType(
        [StructField("node", node_t), StructField("root", node_t)]
    )

    def _local_cc(batches):
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        for x, y in zip(pdf["x"], pdf["y"]):
            rx, ry = find(x), find(y)
            if rx != ry:
                if rx < ry:
                    parent[ry] = rx
                else:
                    parent[rx] = ry
        nodes = set(pdf["x"]) | set(pdf["y"])
        yield pd.DataFrame(
            {"node": list(nodes), "root": [find(n) for n in nodes]}
        )

    edges = (
        pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
        .distinct()
        .localCheckpoint()
    )
    if small_graph_edges and edges.count() <= small_graph_edges:
        # one partition sees every edge → the local union-find IS the full
        # solution; the contraction round would be empty by construction,
        # so don't schedule it (checkpointed because callers like
        # incremental_keep consume the mapping more than once)
        rep = (
            edges.coalesce(1)
            .mapInPandas(_local_cc, schema=rep_schema)
            .localCheckpoint()
        )
        return rep.select(
            F.col("node").alias("member"), F.col("root").alias("cluster")
        )
    mapping = None
    for _ in range(max_iter):
        rep = edges.mapInPandas(_local_cc, schema=rep_schema).localCheckpoint()
        if mapping is None:
            mapping = rep.withColumnsRenamed({"root": "label"})
        else:
            r2 = rep.withColumnsRenamed({"node": "_n", "root": "_r"})
            mapping = (
                mapping.join(r2, mapping.label == r2._n, "left")
                .select(
                    "node",
                    F.coalesce(F.col("_r"), F.col("label")).alias("label"),
                )
                .localCheckpoint()
            )
        ra = rep.withColumnsRenamed({"node": "_n", "root": "_ra"})
        rb = rep.withColumnsRenamed({"node": "_m", "root": "_rb"})
        edges = (
            edges.join(ra, edges.x == ra._n)
            .join(rb, edges.y == rb._m)
            .select(F.col("_ra").alias("x"), F.col("_rb").alias("y"))
            .filter(F.col("x") != F.col("y"))
            .distinct()
            .localCheckpoint()
        )
        if edges.isEmpty():
            return mapping.select(
                F.col("node").alias("member"), F.col("label").alias("cluster")
            )
    raise RuntimeError(f"near_dup_clusters did not converge in {max_iter} rounds")


def dedup_paragraphs(
    df: DataFrame,
    paras_col: str = "paras",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style paragraph-level exact dedup: across the WHOLE corpus, each
    distinct paragraph survives only at its globally-first occurrence
    (smallest ``(id, position)``); every later repeat is dropped from its
    document. Returns (id, n_paras, n_kept, kept_text).

    Scale shape: posexplode → ONE hash shuffle partitioned by paragraph
    (row_number keeps the first occurrence — no self-join back, and each
    paragraph's partition is tiny so there is no skew beyond genuinely
    viral paragraphs) → one shuffle by id to reassemble documents. This is
    the C4 pipeline's dedup step expressed as two shuffles, both on keys
    that stay balanced at 10^12 docs.
    """
    from pyspark.sql import Window

    paras = df.select(
        F.col(id_col), F.posexplode(F.col(paras_col)).alias("pos", "para")
    )
    w = Window.partitionBy("para").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    marked = paras.withColumn("_rn", F.row_number().over(w))
    kept = marked.withColumn("_keep", F.col("_rn") == 1)
    return (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(F.col("_keep").cast("long")).alias("n_kept"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct(F.col("pos"), F.col("para")),
                            )
                        )
                    ),
                    lambda s: s.para,
                ),
            ).alias("kept_text"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Train/test decontamination: find training documents that share any
    word ``n``-gram with a benchmark/eval set (the standard 13-gram overlap
    rule used to scrub eval contamination from web corpora). Returns
    (id, n_contaminated) for CONTAMINATED docs only — n_contaminated is the
    number of distinct benchmark n-grams the doc contains.

    Scale shape: the benchmark's distinct n-gram hashes are the BROADCAST
    side (eval sets are tiny next to the corpus); the corpus explodes its
    n-gram hashes in a narrow map and broadcast-joins — the 10^12-doc side
    is never shuffled; only matched (doc, gram) rows reach the final
    per-doc count, whose partial aggregation happens map-side.
    """
    bench_toks = benchmark.select(
        F.split(F.lower(F.col(bench_text_col or text_col)), r"\s+").alias("_toks")
    )
    bench_grams = (
        bench_toks.select(
            F.explode(
                F.transform(_shingles_expr(n), lambda s: F.xxhash64(s))
            ).alias("gram")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), r"\s+").alias("_toks")
    ).select(
        F.col(id_col),
        F.explode(
            F.transform(_shingles_expr(n), lambda s: F.xxhash64(s))
        ).alias("gram"),
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.countDistinct("gram").alias("n_contaminated"))
    )


def dedup_substrings(
    df: DataFrame,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring-level duplication (Lee et al. 2021 "Deduplicating
    Training Data" semantics, token-window form): every ``window``-token
    sliding span that re-occurs ANYWHERE in the corpus — other docs or
    earlier in the same doc — counts as duplicated except its globally
    first occurrence (smallest ``(id, pos)``). Returns per-doc
    (id, n_windows, n_dup_windows, dup_frac).

    The reference paper uses a corpus-wide suffix array; the Spark-first
    re-expression is banded window hashing: windows are generated JVM-side
    (sequence + slice over a token array materialized ONCE per row —
    inlining the split would re-split per window, O(tokens·window) string
    work per doc), then each distinct span's globally-first occurrence is
    found with ONE ``min(struct(id, pos))`` aggregation keyed by
    ``(xxhash64(win), win)`` — the 8-byte hash drives partitioning while
    the span text rides along only to break hash collisions exactly (same
    trick as dedup_exact). min/count are map-side combinable, so repeated
    spans collapse before the exchange and there is no per-span sort or
    row_number pass; per-doc window totals come straight from the span
    array size with no shuffle at all. Window keys stay balanced at 10^12
    docs except genuinely viral spans, which is the skew already inherent
    to the problem.
    """
    toks_df = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    spans = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, window)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    wins = toks_df.select(F.col(id_col), F.posexplode(spans).alias("pos", "win"))
    # per-doc totals from the SAME exploded frame (map-side-combined count):
    # a size(spans)-based projection looks cheaper but its >0 filter pushes
    # below any upstream repartition and re-builds every span string inside
    # the (often single-task) scan stage — measured 10× slower
    counts = wins.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_windows"))
    # a span's first occurrence = lexicographic min of (id, pos); every doc's
    # non-duplicated window count is the number of spans whose min lands in it
    firsts = (
        wins.groupBy(F.xxhash64("win").alias("_h"), "win")
        .agg(F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias("_first"))
        .groupBy(F.col("_first.i").alias(id_col))
        .agg(F.count(F.lit(1)).alias("_n_first"))
    )
    return (
        counts.join(firsts, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_windows"),
            (F.col("n_windows") - F.coalesce(F.col("_n_first"), F.lit(0))).alias(
                "n_dup_windows"
            ),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6),
        )
    )
