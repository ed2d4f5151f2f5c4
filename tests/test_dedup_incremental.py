"""Incremental MinHash-LSH dedup (dedup.py minhash_dedup_incremental):
a new batch deduped against a persisted signature index without re-reading
the corpus. Checks batch-mode equivalence (pairs, estimates, kept set),
the old-corpus-never-shuffles plan shape, and index round-tripping across
two consecutive batches."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from quickwit_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_dedup_incremental,
    minhash_dedup_pairs,
    minhash_postings,
    minhash_signatures,
    near_dup_clusters,
)

# an already-deduped "corpus": mutually distant texts
OLD = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "spark executes distributed dataframe plans with catalyst and tungsten"),
    (2, "minhash signatures estimate jaccard similarity between shingle sets"),
    (3, "completely unrelated text about cooking pasta with tomato sauce basil"),
]
# batch: 10 = near-dup of old 0, 11/12 = near-dups of each other,
# 13 = unique, 14 = exact dup of old 2
NEW = [
    (10, "the quick brown fox jumps over the lazy dog near the river edge"),
    (11, "streaming ingestion commits offsets atomically after durable writes ok"),
    (12, "streaming ingestion commits offsets atomically after durable writes yes"),
    (13, "a totally fresh document about alpine hiking trails in early summer"),
    (14, "minhash signatures estimate jaccard similarity between shingle sets"),
]
KW = dict(threshold=0.5, shingle_size=3, num_perm=64, num_bands=16)


def _df(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


@pytest.fixture()
def fixture(spark):
    old = _df(spark, OLD)
    new = _df(spark, NEW)
    index = minhash_signatures(old, num_perm=64).localCheckpoint()
    return old, new, index


def test_matches_full_batch_run(spark, fixture):
    old, new, index = fixture
    res = minhash_dedup_incremental(new, index, **KW)
    pairs, kept, updated = res.pairs, res.new_kept, res.updated_index

    got_pairs = {(r["a"], r["b"]): r["est_jaccard"] for r in pairs.collect()}
    batch_pairs = {
        (r["a"], r["b"]): r["est_jaccard"]
        for r in minhash_dedup_pairs(old.unionByName(new), **KW).collect()
    }
    # old corpus has no internal near-dups, so batch pairs == incremental
    # pairs, with IDENTICAL estimates (same seed → same signatures)
    assert got_pairs == batch_pairs
    assert (0, 10) in got_pairs and (2, 14) in got_pairs and (11, 12) in got_pairs
    assert got_pairs[(2, 14)] == 1.0

    # kept set: 10 and 14 collapse into corpus docs, 12 loses to 11 in-batch
    assert sorted(r["doc_id"] for r in kept.collect()) == [11, 13]
    # batch-mode kept set over the union equals old ∪ incremental survivors
    clusters = near_dup_clusters(
        minhash_dedup_pairs(old.unionByName(new), **KW).select("a", "b")
    )
    all_ids = {i for i, _ in OLD + NEW}
    dropped = {
        r["member"] for r in clusters.collect() if r["member"] != r["cluster"]
    }
    assert all_ids - dropped == {0, 1, 2, 3, 11, 13}
    assert sorted(r["doc_id"] for r in updated.select("doc_id").collect()) == [
        0, 1, 2, 3, 11, 13,
    ]


def test_index_round_trip_two_batches(spark, fixture):
    """updated_index from batch 1 is a working index for batch 2."""
    old, new, index = fixture
    updated = minhash_dedup_incremental(new, index, **KW).updated_index
    updated = updated.localCheckpoint()

    batch2 = _df(
        spark,
        [
            # near-dup of survivor 11 (kept in batch 1) and one unique doc
            (20, "streaming ingestion commits offsets atomically after durable writes maybe"),
            (21, "yet another entirely novel subject like underwater basket weaving"),
        ],
    )
    res2 = minhash_dedup_incremental(batch2, updated, **KW)
    pairs2, kept2, updated2 = res2.pairs, res2.new_kept, res2.updated_index
    got = {(r["a"], r["b"]): r["partner"] for r in pairs2.collect()}
    assert (11, 20) in got and got[(11, 20)] == "old"
    assert sorted(r["doc_id"] for r in kept2.collect()) == [21]
    assert sorted(r["doc_id"] for r in updated2.select("doc_id").collect()) == [
        0, 1, 2, 3, 11, 13, 21,
    ]


def test_no_matches_keeps_everything(spark, fixture):
    old, _, index = fixture
    fresh = _df(
        spark,
        [(30, "zebra quantum lattice harmonics"), (31, "volcanic glacier erosion basalt")],
    )
    res = minhash_dedup_incremental(fresh, index, **KW)
    pairs, kept, updated = res.pairs, res.new_kept, res.updated_index
    assert pairs.isEmpty()
    assert sorted(r["doc_id"] for r in kept.collect()) == [30, 31]
    assert updated.count() == len(OLD) + 2


def test_old_corpus_never_shuffles_on_probe(spark, fixture):
    """The probe join must broadcast the NEW postings: the index side
    streams map-side (BroadcastHashJoin), no Exchange over corpus rows on
    the probe path — the property that makes the operator incremental."""
    old, new, index = fixture
    new_sigs = minhash_signatures(new, num_perm=64)
    probe = (
        minhash_postings(index)
        .withColumnRenamed("doc_id", "a")
        .join(
            F.broadcast(minhash_postings(new_sigs).withColumnRenamed("doc_id", "b")),
            ["band", "bucket"],
        )
        .select("a", "b")
        .distinct()
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_signature_determinism_across_sessions_analog(spark, fixture):
    """Signatures recomputed from the same text equal the stored index —
    the property that lets estimates match batch mode exactly."""
    old, _, index = fixture
    again = minhash_signatures(old, num_perm=64)
    a = {r["doc_id"]: tuple(r["signature"]) for r in index.collect()}
    b = {r["doc_id"]: tuple(r["signature"]) for r in again.collect()}
    assert a == b


def test_lsh_candidate_pairs_unchanged_by_postings_refactor(spark, fixture):
    """minhash_postings extraction must not change lsh_candidate_pairs:
    pin the candidate set on the union fixture."""
    old, new, _ = fixture
    sigs = minhash_signatures(old.unionByName(new), num_perm=64)
    got = {(r["a"], r["b"]) for r in lsh_candidate_pairs(sigs).collect()}
    assert {(0, 10), (2, 14), (11, 12)} <= got
