"""Compaction of the streaming-dedup signature index (dedup_stream.py):
epoch deltas fold into generational base dirs behind a manifest commit
point. Verifies read-equivalence before/after compaction, the stream
continuing over a compacted index, crash-point consistency (data without
manifest is invisible; manifest without cleanup excludes folded dirs),
no-op bounds, and repeated compaction."""

from __future__ import annotations

import json
import os
import shutil

from quickwit_spark.streaming.dedup_stream import (
    compact_index,
    read_sig_index,
    stream_minhash_dedup,
)

DOCS = {
    0: "the quick brown fox jumps over the lazy dog again and again today",
    1: "completely different text about spark shuffles and partition pruning",
    2: "the quick brown fox jumps over the lazy dog again and again today!",  # ~dup of 0
    3: "yet another unrelated document discussing parquet column statistics",
    4: "completely different text about spark shuffles and partition pruning now",  # ~dup of 1
}


def _run_wave(spark, in_dir, out_dir, ids):
    df = spark.createDataFrame(
        [(i, DOCS[i]) for i in ids], "doc_id long, text string"
    )
    df.coalesce(1).write.mode("append").parquet(in_dir)
    q = stream_minhash_dedup(
        spark, in_dir, out_dir, threshold=0.6, available_now=True
    )
    q.awaitTermination(120)


def _index_rows(spark, index_dir, before=None):
    return {
        r["doc_id"]
        for r in read_sig_index(spark, index_dir, before_epoch=before).collect()
    }


class TestCompaction:
    def test_fold_preserves_reads_and_stream_continues(self, spark, tmp_path):
        in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
        idx = os.path.join(out_dir, "sig_index")
        _run_wave(spark, in_dir, out_dir, [0, 1])   # epoch 0: both kept
        _run_wave(spark, in_dir, out_dir, [2])      # epoch 1: dup of 0 -> dropped
        before = _index_rows(spark, idx)
        assert before == {0, 1}

        res = compact_index(spark, idx, upto_epoch=2)
        assert res["version"] == 1 and res["folded"] >= 1
        assert _index_rows(spark, idx) == before
        # folded epoch dirs are gone; the base is committed
        assert not [d for d in os.listdir(idx) if d.startswith("epoch=")]
        assert os.path.isfile(os.path.join(idx, "base_v1.manifest.json"))

        # wave 3 probes the compacted base: 4 dups 1 (in base), so only 3 kept
        _run_wave(spark, in_dir, out_dir, [3, 4])
        assert _index_rows(spark, idx) == {0, 1, 3}

    def test_crash_before_manifest_is_invisible(self, spark, tmp_path):
        in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
        idx = os.path.join(out_dir, "sig_index")
        _run_wave(spark, in_dir, out_dir, [0, 1])
        # simulate: base data fully written but manifest never landed
        spark.read.parquet(os.path.join(idx, "epoch=0")).write.parquet(
            os.path.join(idx, "base_v1")
        )
        assert _index_rows(spark, idx) == {0, 1}  # still reads the epoch dir

        # a later compaction claims the NEXT version cleanly over leftovers
        res = compact_index(spark, idx, upto_epoch=1)
        assert res["version"] == 1 or res["version"] == 2
        assert _index_rows(spark, idx) == {0, 1}

    def test_manifest_without_cleanup_excludes_folded_dirs(self, spark, tmp_path):
        in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
        idx = os.path.join(out_dir, "sig_index")
        _run_wave(spark, in_dir, out_dir, [0, 1])
        _run_wave(spark, in_dir, out_dir, [3])
        compact_index(spark, idx, upto_epoch=2)
        # resurrect a folded epoch dir (simulates crash-between-commit-and-rm)
        spark.createDataFrame(
            [(99, [1, 2, 3])], "doc_id long, signature array<bigint>"
        ).write.parquet(os.path.join(idx, "epoch=0"))
        # reader must ignore it: epoch 0 < manifest.upto_epoch
        assert 99 not in _index_rows(spark, idx)
        # the next compaction clears the leftover too
        compact_index(spark, idx, upto_epoch=3)
        assert not [d for d in os.listdir(idx) if d.startswith("epoch=")]
        assert 99 not in _index_rows(spark, idx)

    def test_noop_when_nothing_below_bound(self, spark, tmp_path):
        in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
        idx = os.path.join(out_dir, "sig_index")
        _run_wave(spark, in_dir, out_dir, [0])
        res1 = compact_index(spark, idx, upto_epoch=1)
        res2 = compact_index(spark, idx, upto_epoch=1)
        assert res1["folded"] == 1 and res2["folded"] == 0
        assert res2["version"] == res1["version"]
        assert _index_rows(spark, idx) == {0}
