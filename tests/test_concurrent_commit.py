"""Concurrent-writer atomicity: janitor swaps racing an ingest publish.

This is the metastore-transaction guarantee the reference gets from
`quickwit-metastore` (checkpoint.rs:286-330 delta compat + publish_splits'
all-or-nothing metadata transaction; garbage_collector.rs sweeps the rest):
a merge or delete rewrite that crashes at ANY point of its swap, with an
ingest publish landing concurrently, must leave the index repairable to an
exact state — the published commit intact exactly once, the rewritten
commits all-or-nothing, nothing lost, nothing duplicated.

Interleavings are injected deterministically by wrapping the janitor's
``shutil.move`` (every swap step is a move): a crash matrix aborts the swap
at each move index in turn, and a barrier test suspends the merge mid-swap
while a full publish runs inside the window.
"""

import json
import glob
import os
import shutil
import threading

import pytest
from pyspark.sql import functions as F

import quickwit_spark.pipeline.janitor as jan
from quickwit_spark.operators.query import QueryCompiler
from quickwit_spark.pipeline.janitor import garbage_collect, merge_splits, next_opstamp
from quickwit_spark.pipeline.runner import (
    PipelineConfig,
    run_chunk,
    run_pipeline,
    read_sinks,
)
from quickwit_spark.pipeline.transcripts import materialize

CFG = PipelineConfig()


class SimulatedCrash(Exception):
    pass


class _CrashingMove:
    """shutil.move wrapper that raises SimulatedCrash on the Nth call
    (crash_at=None just counts — used to size the crash matrix)."""

    def __init__(self, crash_at: int | None):
        self.crash_at = crash_at
        self.calls = 0
        self._real = shutil.move

    def __call__(self, src, dst):
        self.calls += 1
        if self.crash_at is not None and self.calls == self.crash_at:
            raise SimulatedCrash(f"injected at move #{self.calls}: {src} -> {dst}")
        return self._real(src, dst)


class _patched_move:
    def __init__(self, mover):
        self.mover = mover

    def __enter__(self):
        self._saved = jan.shutil.move
        jan.shutil.move = self.mover
        return self.mover

    def __exit__(self, *exc):
        jan.shutil.move = self._saved
        return False


@pytest.fixture(scope="module")
def base(spark, tmp_path_factory):
    """A committed 3-chunk pipeline index + the racing-publish ingredients."""
    root = str(tmp_path_factory.mktemp("concur"))
    vin = os.path.join(root, "in")
    materialize(2_000, vin, seed=7)
    out = os.path.join(root, "idx")
    run_pipeline(spark, vin, out, CFG, num_chunks=3)

    transcripts = spark.read.parquet(os.path.join(vin, "transcripts.parquet"))
    tenants = spark.read.parquet(os.path.join(vin, "tenants.parquet"))
    max_turn = transcripts.agg(F.max("turn_idx")).collect()[0][0]
    shift = int(max_turn) + 1
    race_df = transcripts.limit(400).withColumn(
        "turn_idx", F.col("turn_idx") + F.lit(shift)
    ).withColumn("conv_id", F.concat(F.lit("race-"), F.col("conv_id")))
    base_keys = _keys(spark, out)

    # reference run: the same publish on a pristine copy, no crash — defines
    # the exact key set the racing commit must contribute
    probe = os.path.join(root, "probe")
    shutil.copytree(out, probe)
    _publish_race(spark, race_df, tenants, probe, shift)
    race_keys = _keys(spark, probe) - base_keys
    assert race_keys, "race chunk must contribute valid rows"
    shutil.rmtree(probe)
    return {
        "out": out, "tenants": tenants, "race_df": race_df,
        "shift": shift, "base_keys": base_keys, "race_keys": race_keys,
        "root": root,
    }


def _publish_race(spark, race_df, tenants, out_dir, shift):
    delta = {"turn_range": (shift, 2 * shift)}
    m = run_chunk(spark, race_df, tenants, out_dir, CFG, chunk_id="race01", delta=delta)
    return m, delta


def _keys(spark, out_dir) -> set:
    return {
        (r["conv_id"], r["turn_idx"])
        for r in read_sinks(spark, out_dir).select("conv_id", "turn_idx").collect()
    }


def _assert_consistent(spark, out_dir, expect_keys):
    """Exactness + data/metadata agreement after repair."""
    rows = read_sinks(spark, out_dir).select("conv_id", "turn_idx").collect()
    keys = {(r["conv_id"], r["turn_idx"]) for r in rows}
    assert len(rows) == len(keys), "duplicate rows visible to readers"
    assert keys == expect_keys, (
        f"lost={len(expect_keys - keys)} extra={len(keys - expect_keys)}"
    )
    # lineage (the metadata plane) must agree with the data plane per commit
    data_counts = {
        r["commit"]: r["n"]
        for r in read_sinks(spark, out_dir)
        .groupBy("commit").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    lin_counts = {
        r["commit_id"]: r["n"]
        for r in jan.read_lineage(spark, out_dir)
        .groupBy("commit_id").agg(F.sum("num_docs").alias("n")).collect()
    }
    assert lin_counts == data_counts
    # no pending intent manifests survive repair
    assert glob.glob(os.path.join(out_dir, "_merges", "*.json")) == []


def _merge_move_count(spark, base) -> int:
    tmp = os.path.join(base["root"], "count")
    shutil.copytree(base["out"], tmp)
    counter = _CrashingMove(crash_at=None)
    with _patched_move(counter):
        res = merge_splits(spark, tmp, merge_factor=2, source_id=CFG.source_id)
    shutil.rmtree(tmp)
    assert res["merged"], "fixture must produce at least one merge group"
    return counter.calls


def test_merge_crash_matrix_vs_racing_publish(spark, base):
    """Crash the merge swap at EVERY move step; a publish lands while the
    merge is wedged; garbage_collect repairs. Readers then see exactly
    base ∪ race — per-step all-or-nothing, the concurrent commit never lost."""
    n_moves = _merge_move_count(spark, base)
    assert n_moves >= 4
    expect = base["base_keys"] | base["race_keys"]
    for k in range(1, n_moves + 1):
        idx = os.path.join(base["root"], f"m{k}")
        shutil.copytree(base["out"], idx)
        with _patched_move(_CrashingMove(crash_at=k)):
            with pytest.raises(SimulatedCrash):
                merge_splits(spark, idx, merge_factor=2, source_id=CFG.source_id)
        # ingest publish races in while the merge swap is wedged mid-flight
        m, delta = _publish_race(spark, base["race_df"], base["tenants"], idx, base["shift"])
        assert m is not None and m["num_valid"] == len(base["race_keys"])
        # crash-repair (janitor self-repair pass)
        garbage_collect(idx, grace_seconds=0.0)
        _assert_consistent(spark, idx, expect)
        # the raced delta is durably committed exactly once
        m2 = run_chunk(
            spark, base["race_df"], base["tenants"], idx, CFG,
            chunk_id="race01", delta=delta,
        )
        assert m2 is None, "replay of the raced delta must be a no-op"
        shutil.rmtree(idx)


def test_publish_inside_merge_swap_window(spark, base):
    """Deterministic barrier interleave: the merge thread is suspended at
    its FIRST swap move (an original already trashed, merged copy not yet
    live) while a full publish runs to completion inside the window. Both
    writers then succeed with no repair needed."""
    idx = os.path.join(base["root"], "barrier")
    shutil.copytree(base["out"], idx)
    in_window = threading.Event()
    resume = threading.Event()
    real_move = shutil.move

    def barrier_move(src, dst):
        r = real_move(src, dst)
        if not in_window.is_set():
            in_window.set()
            assert resume.wait(timeout=120), "publisher never released the barrier"
        return r

    merge_res: dict = {}

    def run_merge():
        with _patched_move(barrier_move):
            merge_res.update(merge_splits(spark, idx, merge_factor=2, source_id=CFG.source_id))

    t = threading.Thread(target=run_merge)
    t.start()
    assert in_window.wait(timeout=300), "merge never reached its swap window"
    m, _ = _publish_race(spark, base["race_df"], base["tenants"], idx, base["shift"])
    assert m is not None
    resume.set()
    t.join(timeout=300)
    assert not t.is_alive()
    assert merge_res["merged"]
    _assert_consistent(spark, idx, base["base_keys"] | base["race_keys"])
    shutil.rmtree(idx)


def test_delete_crash_matrix_all_or_nothing(spark, base):
    """Crash delete_by_query at every swap move; publish races in; repair.
    Every rewritten commit must read back as EITHER its full pre-delete or
    full post-delete row set (never half), the opstamp is burned (a retry
    gets a fresh one), and the raced commit survives exactly once."""
    qc = QueryCompiler({"level": "raw", "role": "raw"})
    query = "level:ERROR"

    # reference copies: pre-delete and post-delete per-commit key sets
    pre = _per_commit_keys(spark, base["out"])
    clean = os.path.join(base["root"], "dclean")
    shutil.copytree(base["out"], clean)
    stats = jan.delete_by_query(spark, clean, query, qc, source_id=CFG.source_id)
    assert stats["rows_deleted"] > 0 and stats["commits_rewritten"]
    post = _per_commit_keys(spark, clean)
    shutil.rmtree(clean)

    # size the matrix: 3 moves per affected commit (trash, data-in, lin-in)
    n_moves = 3 * len(stats["commits_rewritten"])
    for k in range(1, n_moves + 1):
        idx = os.path.join(base["root"], f"d{k}")
        shutil.copytree(base["out"], idx)
        with _patched_move(_CrashingMove(crash_at=k)):
            with pytest.raises(SimulatedCrash):
                jan.delete_by_query(spark, idx, query, qc, source_id=CFG.source_id)
        burned = stats["opstamp"]
        assert next_opstamp(idx) == burned + 1, "crashed opstamp must not be reused"
        m, _ = _publish_race(spark, base["race_df"], base["tenants"], idx, base["shift"])
        assert m is not None
        garbage_collect(idx, grace_seconds=0.0)
        got = _per_commit_keys(spark, idx)
        race_commits = {c for c in got if c not in pre}
        assert len(race_commits) == 1
        race_keys = set().union(*(got[c] for c in race_commits))
        assert race_keys == base["race_keys"]
        for c in pre:
            assert got.get(c, set()) in (pre[c], post.get(c, set())), (
                f"commit {c} is neither pre- nor post-delete after crash at move {k}"
            )
        # no cross-commit loss or duplication
        all_keys = [kk for s in got.values() for kk in s]
        assert len(all_keys) == len(set(all_keys))
        # the metadata plane must agree with the data plane for every
        # surviving commit (a crash between lineage-rmtree and the staged
        # lineage move must not orphan a commit from the lineage index)
        lin_counts = {
            r["commit_id"]: r["n"]
            for r in jan.read_lineage(spark, idx)
            .groupBy("commit_id").agg(F.sum("num_docs").alias("n")).collect()
        }
        assert lin_counts == {c: len(s) for c, s in got.items() if s}, (
            f"lineage/data divergence after crash at move {k}"
        )
        shutil.rmtree(idx)


def _per_commit_keys(spark, out_dir) -> dict[str, set]:
    out: dict[str, set] = {}
    for r in read_sinks(spark, out_dir).select("commit", "conv_id", "turn_idx").collect():
        out.setdefault(r["commit"], set()).add((r["conv_id"], r["turn_idx"]))
    return out
