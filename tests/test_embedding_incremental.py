"""Incremental + streaming embedding (semantic) dedup
(similarity.embedding_dedup_incremental, streaming/dedup_stream.py
stream_embedding_dedup): a new batch of vectors deduped against the
persisted survivor index — broadcast batch, one index scan, corpus never
shuffles — with batch-mode equivalence and the epoch-layout stream."""

import os

import pytest
from pyspark.sql import Row

from quickwit_spark.operators.dedup import near_dup_clusters
from quickwit_spark.operators.similarity import (
    embedding_dedup_incremental,
    embedding_near_dup_pairs,
)

# an already-deduped index: three orthogonal unit vectors
OLD = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.0, 1.0, 0.0]),
    (2, [0.0, 0.0, 1.0]),
]
# batch: 10 ≈ old 0 (cos ≈ 0.990), 11/12 near-dups of each other
# (cos ≈ 0.9998), 13 far from everything
NEW = [
    (10, [0.99, 0.14, 0.0]),
    (11, [0.70, 0.70, 0.10]),
    (12, [0.71, 0.69, 0.10]),
    (13, [0.50, -0.50, 0.70]),
]
KW = dict(threshold=0.9, bits=4, tables=16)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_incremental_matches_batch_semantics(spark):
    old, new = _df(spark, OLD), _df(spark, NEW)
    res = embedding_dedup_incremental(new, old, **KW)

    got = {(r["a"], r["b"]): r["partner"] for r in res.pairs.collect()}
    assert got[(0, 10)] == "old"
    assert got[(11, 12)] == "new"
    assert len(got) == 2

    kept = sorted(r["vec_id"] for r in res.new_kept.collect())
    assert kept == [11, 13]
    assert sorted(r["vec_id"] for r in res.kept_sigs.collect()) == [11, 13]
    assert sorted(r["vec_id"] for r in res.updated_index.collect()) == [
        0, 1, 2, 11, 13,
    ]

    # batch-mode equivalence: full LSH pairs + clustering over old ∪ new
    # keeps exactly old ∪ incremental survivors
    union = old.unionByName(new)
    clusters = near_dup_clusters(
        embedding_near_dup_pairs(union, threshold=0.9, bits=4, tables=16)
        .select("a", "b")
    )
    dropped = {
        r["member"] for r in clusters.collect() if r["member"] != r["cluster"]
    }
    all_ids = {i for i, _ in OLD + NEW}
    assert all_ids - dropped == {0, 1, 2, 11, 13}


def test_empty_index_bootstrap_and_empty_batch(spark):
    old, new = _df(spark, OLD), _df(spark, NEW)
    empty = _df(spark, [])

    res = embedding_dedup_incremental(new, empty, **KW)
    # no index: only the in-batch pair (11,12) fires
    assert {(r["a"], r["b"]) for r in res.pairs.collect()} == {(11, 12)}
    assert sorted(r["vec_id"] for r in res.new_kept.collect()) == [10, 11, 13]

    res2 = embedding_dedup_incremental(empty, old, **KW)
    assert res2.pairs.isEmpty() and res2.new_kept.isEmpty()
    assert res2.updated_index.count() == len(OLD)


def test_index_never_shuffles_probe_is_scan(spark):
    """The old-partner probe is a mapInPandas kernel directly over the
    index scan (pairs itself is checkpointed, so pin the construction:
    scan → ArrowEval/mapInPandas with no Exchange of index rows)."""
    old = _df(spark, OLD)
    probe_df = old.select("vec_id", "embedding").mapInPandas(
        lambda it: it, schema="vec_id long, embedding array<double>"
    )
    plan = probe_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stream_embedding_dedup_two_waves(spark, tmp_path_factory):
    import glob
    import shutil

    from quickwit_spark.streaming.dedup_stream import (
        read_emb_index,
        stream_embedding_dedup,
    )

    base = tmp_path_factory.mktemp("estream")
    input_dir, out_dir = str(base / "in"), str(base / "out")
    os.makedirs(input_dir)

    def write_wave(rows, name, ts):
        stage = os.path.join(input_dir, "_stage")
        _df(spark, rows).coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(input_dir, f"{name}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(stage)
        os.utime(dst, (ts, ts))

    write_wave(OLD, "wave1", 1_700_000_060)
    write_wave(NEW, "wave2", 1_700_000_120)
    q = stream_embedding_dedup(
        spark, input_dir, out_dir, max_files_per_trigger=1, **KW
    )
    q.awaitTermination(300)

    kept = sorted(
        r["vec_id"]
        for r in spark.read.parquet(os.path.join(out_dir, "kept")).collect()
    )
    assert kept == [0, 1, 2, 11, 13]
    idx = read_emb_index(spark, os.path.join(out_dir, "emb_index"))
    assert sorted(r["vec_id"] for r in idx.collect()) == [0, 1, 2, 11, 13]
    pairs = spark.read.parquet(os.path.join(out_dir, "pairs"))
    got = {(r["a"], r["b"]): r["partner"] for r in pairs.collect()}
    assert got[(0, 10)] == "old" and got[(11, 12)] == "new"
