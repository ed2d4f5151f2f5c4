"""DSIR importance weights + exact-quota stratified sampling.

DSIR (Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling", public) — hashed unigram+bigram bag-of-words importance
weights log p̂(x)/q̂(x). stratified_sample — deterministic per-stratum
rank-and-cut with the shared Lehmer-pair mix (sample_mix_cols), with a
census-driven hash-fraction pre-filter bounding viral strata.
"""

import math

import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators import corpus as CP


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(1, "a b"), (2, "c c")], ["doc_id", "text"]
    )


@pytest.fixture(scope="module")
def tiny_target(spark):
    return spark.createDataFrame([(100, "a b")], ["doc_id", "text"])


def test_dsir_hand_computed(spark, tiny, tiny_target):
    # features: doc1 {a, b, "a b"}, doc2 {c, c, "c c"}; target {a, b, "a b"}
    # union V=5, T=3, R=6; add-1:
    #   λ_a = λ_b = λ_ab = ln(2/8) - ln(2/11) = ln(11/8)
    #   λ_c  = ln(1/8) - ln(3/11) = ln(11/24)
    #   λ_cc = ln(1/8) - ln(2/11) = ln(11/16)
    out = {
        r["doc_id"]: r
        for r in CP.dsir_weights(tiny, tiny_target, num_buckets=None).collect()
    }
    assert out[1]["n_features"] == 3
    assert out[2]["n_features"] == 3
    assert out[1]["log_weight"] == pytest.approx(3 * math.log(11 / 8), rel=1e-9)
    assert out[2]["log_weight"] == pytest.approx(
        2 * math.log(11 / 24) + math.log(11 / 16), rel=1e-9
    )
    # the target-looking doc scores strictly higher
    assert out[1]["log_weight"] > out[2]["log_weight"]


def test_dsir_hashed_equals_exact_without_collisions(spark, tiny_dir):
    """With a bucket space far larger than the corpus vocabulary the hashed
    (100 TB) mode computes the same weights as the exact-feature mode —
    hashing only renames features, it never changes the estimator. Also
    crosses the two target spellings: exact via target_df, hashed via the
    one-pass target_filter — all three must agree."""
    import os

    docs = spark.read.parquet(os.path.join(tiny_dir, "documents.parquet")).limit(120)
    target = docs.filter(F.col("lang") == "en")
    exact = {
        r["doc_id"]: r["log_weight"]
        for r in CP.dsir_weights(docs, target, num_buckets=None).collect()
    }
    hashed = {
        r["doc_id"]: r["log_weight"]
        for r in CP.dsir_weights(docs, target, num_buckets=1 << 30).collect()
    }
    one_pass = {
        r["doc_id"]: r["log_weight"]
        for r in CP.dsir_weights(
            docs, num_buckets=1 << 30, target_filter=F.col("lang") == "en"
        ).collect()
    }
    assert set(exact) == set(hashed) == set(one_pass)
    for k in exact:
        assert hashed[k] == pytest.approx(exact[k], rel=1e-9, abs=1e-9)
        assert one_pass[k] == pytest.approx(exact[k], rel=1e-9, abs=1e-9)

    with pytest.raises(ValueError, match="exactly one"):
        CP.dsir_weights(docs)
    with pytest.raises(ValueError, match="exactly one"):
        CP.dsir_weights(docs, target, target_filter=F.col("lang") == "en")


def test_dsir_partitioning_independent(spark, tiny_dir):
    import os

    docs = spark.read.parquet(os.path.join(tiny_dir, "documents.parquet")).limit(60)
    target = docs.filter(F.col("lang") == "en")
    a = sorted(
        (r["doc_id"], round(r["log_weight"], 9))
        for r in CP.dsir_weights(docs.repartition(7), target, num_buckets=256).collect()
    )
    b = sorted(
        (r["doc_id"], round(r["log_weight"], 9))
        for r in CP.dsir_weights(docs.coalesce(1), target, num_buckets=256).collect()
    )
    assert a == b


def test_stratified_sample_exact_quota_and_determinism(spark, tiny_dir):
    import os

    docs = spark.read.parquet(os.path.join(tiny_dir, "documents.parquet"))
    out = CP.stratified_sample(docs, quota=7, strata_col="source").collect()
    per = {}
    for r in out:
        per.setdefault(r["stratum"], []).append(r)
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, members in per.items():
        assert len(members) == min(7, sizes[s])
        assert sorted(r["sample_rank"] for r in members) == list(range(1, len(members) + 1))
    assert set(per) == set(sizes)

    # kept set matches a driver-side oracle of the documented rule
    rows = docs.select("doc_id", "source").collect()
    want = {}
    for r in rows:
        want.setdefault(r["source"], []).append(r["doc_id"])
    def _mix(i: int) -> tuple[int, int, int]:
        k1 = (i % 2147483647 + 1) * 48271 % 2147483647
        k2 = (i % 2147483629 + 1) * 16807 % 2147483629
        k3 = ((2147483629 * k1 + k2) % 2147483647 + 1) * 48271 % 2147483647
        return (k3, k1, k2)

    for s in want:
        want[s] = sorted(want[s], key=lambda i: (*_mix(i), i))[:7]
    got = {s: sorted(r["doc_id"] for r in members) for s, members in per.items()}
    assert got == {s: sorted(v) for s, v in want.items()}

    # partitioning-independent
    again = CP.stratified_sample(docs.repartition(13), quota=7, strata_col="source").collect()
    assert sorted((r["doc_id"], r["sample_rank"]) for r in again) == sorted(
        (r["doc_id"], r["sample_rank"]) for r in out
    )


def test_stratified_sample_quota_larger_than_stratum(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], ["doc_id", "source"]
    )
    out = CP.stratified_sample(df, quota=10, strata_col="source").collect()
    assert len(out) == 3  # everything kept, ranks still dense
    assert {(r["stratum"], r["sample_rank"]) for r in out} == {
        ("x", 1), ("x", 2), ("y", 1),
    }


def test_curation_funnel_matches_individual_ops(spark, tiny_dir):
    """The one-pass funnel must agree with applying each op separately."""
    import os

    from quickwit_spark.functions.text import c4_keep_col, gopher_keep_col
    from quickwit_spark.operators.dedup import dedup_exact

    docs = spark.read.parquet(os.path.join(tiny_dir, "documents.parquet"))
    funnel = {r["stage"]: r["n_docs"] for r in CP.curation_funnel(docs).collect()}
    assert funnel["input"] == docs.count()

    uniq = dedup_exact(docs)
    assert funnel["after_exact_dedup"] == uniq.count()

    c4 = uniq.filter(c4_keep_col(F.col("text")))
    assert funnel["after_c4"] == c4.count()
    assert funnel["curated"] == c4.filter(gopher_keep_col(F.col("text"))).count()

    # funnel is monotone non-increasing and ordered by stage_idx
    rows = sorted(CP.curation_funnel(docs).collect(), key=lambda r: r["stage_idx"])
    ns = [r["n_docs"] for r in rows]
    assert ns == sorted(ns, reverse=True)

    # curate_corpus returns exactly the surviving rows
    kept = CP.curate_corpus(docs)
    assert kept.count() == funnel["curated"]
    assert set(kept.columns) == {"doc_id", "text"}


def test_corpus_stats_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a a"), (3, "d")], ["doc_id", "text"]
    )
    row = CP.corpus_stats(df).collect()[0]
    assert row["n_docs"] == 3
    assert row["total_tokens"] == 6          # 3 + 2 + 1
    assert row["mean_tokens"] == 2.0
    assert (row["min_tokens"], row["max_tokens"]) == (1, 3)
    assert row["p50_tokens"] == 2.0
    assert row["vocab_size"] == 4            # a b c d
    assert row["type_token_ratio"] == pytest.approx(4 / 6, abs=1e-6)


def test_pack_nocross_invariants(spark, tiny_dir):
    import os

    docs = spark.read.parquet(os.path.join(tiny_dir, "documents.parquet"))
    CTX = 64
    out = CP.pack_sequences_nocross(docs, context_len=CTX, num_shards=4).collect()
    assert len(out) == docs.count()
    assert {r["doc_id"] for r in out} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }
    by_chunk = {}
    for r in out:
        by_chunk.setdefault((r["shard"], r["chunk"]), []).append(r)
    for (shard, chunk), members in by_chunk.items():
        total = sum(r["n_tokens"] for r in members)
        assert total <= CTX, (shard, chunk, total)
        # offsets tile [0, total) contiguously — no overlap, no hole
        ivs = sorted((r["offset"], r["offset"] + r["n_tokens"]) for r in members)
        assert ivs[0][0] == 0
        for (a0, a1), (b0, _b1) in zip(ivs, ivs[1:]):
            assert a1 == b0, (shard, chunk, ivs)
        # a truncated doc sits alone in its chunk at full width
        if any(r["truncated"] for r in members):
            assert len(members) == 1 and members[0]["n_tokens"] == CTX

    # truncation flag matches the real token count
    ntok = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n"),
        ).collect()
    }
    for r in out:
        assert r["truncated"] == (ntok[r["doc_id"]] > CTX)

    # deterministic and partitioning-independent
    again = CP.pack_sequences_nocross(
        docs.repartition(13), context_len=CTX, num_shards=4
    ).collect()
    key = lambda rows: sorted(
        (r["doc_id"], r["shard"], r["chunk"], r["offset"]) for r in rows
    )
    assert key(again) == key(out)

    # padding economics: BFD should beat one-doc-per-chunk by a wide margin
    n_chunks = len(by_chunk)
    assert n_chunks < len(out)


def test_stratified_sample_viral_stratum_guard(spark):
    """A planted 10^6-row stratum must (a) never become one unbounded
    window ordering unit — the census-driven hash-fraction pre-filter keeps
    ~16*quota+64 survivors before any ranking — and (b) produce EXACTLY the
    same kept set as the unguarded full rank (the pre-filter is lossless)."""
    df = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 995_000, F.lit("viral"))
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 7).cast("string")))
        .alias("source"),
    )
    quota = 5
    cap = 16 * quota + 64

    surv = CP._stratified_survivors(
        df, quota, "source", "doc_id", guard_min_stratum=200_000
    )
    per = {
        r["stratum"]: r["n"]
        for r in surv.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # viral stratum's window unit is bounded near cap (binomial around cap),
    # small strata pass through whole
    assert per["viral"] <= 3 * cap
    assert per["viral"] >= quota
    for s, n in per.items():
        if s != "viral":
            assert n <= 5_000 // 7 + 1

    guarded = sorted(
        (r["doc_id"], r["stratum"], r["sample_rank"])
        for r in CP.stratified_sample(
            df, quota, strata_col="source", guard_min_stratum=200_000
        ).collect()
    )
    unguarded = sorted(
        (r["doc_id"], r["stratum"], r["sample_rank"])
        for r in CP.stratified_sample(
            df, quota, strata_col="source", guard_min_stratum=10**12
        ).collect()
    )
    assert guarded == unguarded
    assert len([g for g in guarded if g[1] == "viral"]) == quota


def test_stratified_sample_mix_uniformity(spark):
    """The 62-bit Lehmer-pair mix must sample uniformly across the id range
    of a >65k-row stratum — the regression the old 16-bit LCG failed (only
    65,536 distinct keys, rank ties broken by ascending id biased samples
    toward low ids). Chi-square-ish check: 10k kept out of 200k ids, 20
    equal id-range buckets, each within 6 binomial sigmas of 500."""
    n, quota, buckets = 200_000, 10_000, 20
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("one").alias("source")
    )
    kept = CP.stratified_sample(
        df, quota, strata_col="source", guard_min_stratum=10**12
    )
    counts = (
        kept.groupBy((F.col("doc_id") / (n // buckets)).cast("int").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    per = {r["b"]: r["c"] for r in counts}
    mean = quota / buckets
    sigma = math.sqrt(quota * (1 / buckets) * (1 - 1 / buckets))
    assert set(per) == set(range(buckets))
    for b, c in per.items():
        assert abs(c - mean) < 6 * sigma, (b, c)
