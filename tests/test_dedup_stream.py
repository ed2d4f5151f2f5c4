"""Streaming MinHash-LSH dedup (streaming/dedup_stream.py): a continuous
document feed deduped against the accumulated signature index, one epoch
per micro-batch. Checks cross-epoch dedup (later file waves collapse into
earlier survivors), checkpoint-resumed continuation, crash-replay safety
(a half-written attempt of the CURRENT epoch's sig_index is pruned out of
its own probe and then overwritten), and the epoch-scoped index layout."""

import os

import pytest
from pyspark.sql import Row

from quickwit_spark.streaming.dedup_stream import (
    read_sig_index,
    stream_minhash_dedup,
)

KW = dict(threshold=0.5, shingle_size=3, num_perm=64, num_bands=16)

WAVE1 = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "spark executes distributed dataframe plans with catalyst and tungsten"),
    (2, "minhash signatures estimate jaccard similarity between shingle sets"),
]
# 10 = near-dup of 0 (cross-epoch), 11/12 = near-dups of each other
# (in-batch), 13 = unique
WAVE2 = [
    (10, "the quick brown fox jumps over the lazy dog near the river edge"),
    (11, "streaming ingestion commits offsets atomically after durable writes ok"),
    (12, "streaming ingestion commits offsets atomically after durable writes yes"),
    (13, "a totally fresh document about alpine hiking trails in early summer"),
]
# 20 = near-dup of survivor 11, 21 = exact dup of wave-1 doc 2, 22 = unique
WAVE3 = [
    (20, "streaming ingestion commits offsets atomically after durable writes maybe"),
    (21, "minhash signatures estimate jaccard similarity between shingle sets"),
    (22, "yet another entirely novel subject like underwater basket weaving"),
]


def _write_wave(spark, input_dir, rows, name):
    """One parquet FILE per wave, directly under input_dir (the file
    source lists plain files; non-key=value subdirectories are ignored)."""
    import glob
    import shutil

    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])
    stage = os.path.join(input_dir, "_stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    dst = os.path.join(input_dir, f"{name}.parquet")
    shutil.move(part, dst)
    shutil.rmtree(stage)
    # deterministic epoch order: the source sorts candidate files by
    # modification time, so stamp each wave strictly later than the last
    _write_wave.counter += 1
    ts = 1_700_000_000 + _write_wave.counter * 60
    os.utime(dst, (ts, ts))


_write_wave.counter = 0


def _drain(spark, input_dir, out_dir):
    q = stream_minhash_dedup(
        spark, input_dir, out_dir, max_files_per_trigger=1, **KW
    )
    q.awaitTermination(300)


def _kept_ids(spark, out_dir):
    kept_dir = os.path.join(out_dir, "kept")
    if not os.path.isdir(kept_dir):
        return []
    return sorted(
        r["doc_id"] for r in spark.read.parquet(kept_dir).collect()
    )


@pytest.fixture()
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("dstream")
    input_dir, out_dir = str(base / "in"), str(base / "out")
    os.makedirs(input_dir)
    return input_dir, out_dir


def test_cross_epoch_dedup_and_resume(spark, dirs):
    input_dir, out_dir = dirs
    # the stream source lists whole directories of files; one file per
    # wave + maxFilesPerTrigger=1 → one epoch per wave, in name order
    _write_wave(spark, input_dir, WAVE1, "wave1")
    _write_wave(spark, input_dir, WAVE2, "wave2")
    _drain(spark, input_dir, out_dir)

    # wave1 all unique; wave2: 10 collapses into 0 (cross-epoch via the
    # persisted index), 12 loses to 11 in-batch, 11+13 survive
    assert _kept_ids(spark, out_dir) == [0, 1, 2, 11, 13]

    pairs = spark.read.parquet(os.path.join(out_dir, "pairs"))
    got = {(r["a"], r["b"]): r["partner"] for r in pairs.collect()}
    assert got[(0, 10)] == "old" and got[(11, 12)] == "new"

    # the accumulated index holds exactly the survivors' signatures
    idx = read_sig_index(spark, os.path.join(out_dir, "sig_index"))
    assert sorted(r["doc_id"] for r in idx.collect()) == [0, 1, 2, 11, 13]

    # resume from checkpoint: a third wave dedups against BOTH prior
    # epochs' survivors without reprocessing waves 1-2
    _write_wave(spark, input_dir, WAVE3, "wave3")
    _drain(spark, input_dir, out_dir)
    assert _kept_ids(spark, out_dir) == [0, 1, 2, 11, 13, 22]
    got = {
        (r["a"], r["b"]): r["partner"]
        for r in spark.read.parquet(os.path.join(out_dir, "pairs")).collect()
    }
    assert got[(11, 20)] == "old" and got[(2, 21)] == "old"


def test_crash_replay_overwrites_own_epoch(spark, dirs):
    """A crashed attempt leaves a half-written sig_index/epoch=N containing
    the batch's OWN doc ids. The replay must (a) not probe that directory
    (else every doc self-matches and is dropped) and (b) replace it."""
    input_dir, out_dir = dirs
    _write_wave(spark, input_dir, WAVE1, "wave1")

    # forge the crashed attempt of epoch 0: doc 0's true signature under
    # sig_index/epoch=0 before the stream ever runs
    from quickwit_spark.operators.dedup import minhash_signatures

    poison = minhash_signatures(
        spark.createDataFrame([Row(doc_id=0, text=WAVE1[0][1])]),
        num_perm=KW["num_perm"],
    )
    epoch0 = os.path.join(out_dir, "sig_index", "epoch=0")
    poison.write.mode("overwrite").parquet(epoch0)

    _drain(spark, input_dir, out_dir)
    # no self-match: everything in wave1 survives
    assert _kept_ids(spark, out_dir) == [0, 1, 2]
    # the poison directory was replaced by the real epoch-0 output
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(epoch0).collect()
    ) == [0, 1, 2]
    assert spark.read.parquet(os.path.join(out_dir, "pairs")).isEmpty()


def test_empty_index_bootstrap(spark, dirs):
    input_dir, out_dir = dirs
    idx = read_sig_index(spark, os.path.join(out_dir, "sig_index"))
    assert idx.isEmpty()
    assert [f.name for f in idx.schema.fields] == ["doc_id", "signature"]
