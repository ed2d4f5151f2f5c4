"""Janitor tests: delete-by-query, retention, GC over a time-partitioned
index (reference behavior: quickwit-janitor actors — delete_task_planner,
retention_policy_executor, garbage_collector)."""

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators.query import QueryCompiler
from quickwit_spark.pipeline.janitor import (
    apply_retention,
    build_time_partitioned_index,
    delete_by_query,
    garbage_collect,
    read_index,
    read_lineage,
)

EVENTS_FIELDS = {"event_type": "raw", "user_id": "numeric", "value": "numeric", "ts": "datetime"}


@pytest.fixture(scope="module")
def base_index(spark, tiny_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("janitor_base"))
    events = spark.read.parquet(os.path.join(tiny_dir, "events.parquet"))
    build_time_partitioned_index(
        spark, events, out, sink_expr=F.col("event_type"), ts_col="ts", source_id="events"
    )
    return out


@pytest.fixture()
def index_dir(base_index, tmp_path_factory):
    """Fresh mutable copy per test (janitor ops mutate the index)."""
    import shutil

    out = os.path.join(str(tmp_path_factory.mktemp("janitor_idx")), "idx")
    shutil.copytree(base_index, out)
    return out


def _events_path(tiny_dir):
    return os.path.join(tiny_dir, "events.parquet")


def test_index_roundtrip(spark, tiny_dir, index_dir):
    got = read_index(spark, index_dir).count()
    want = duckdb.sql(f"SELECT count(*) FROM '{_events_path(tiny_dir)}'").fetchone()[0]
    assert got == want


def test_delete_by_query_rewrites_only_matches(spark, tiny_dir, index_dir):
    qc = QueryCompiler(EVENTS_FIELDS)
    stats = delete_by_query(
        spark, index_dir, "event_type:error AND value:>=50", qc, source_id="events"
    )
    want = duckdb.sql(
        f"SELECT count(*) FROM '{_events_path(tiny_dir)}' "
        "WHERE NOT (event_type = 'error' AND value >= 50)"
    ).fetchone()[0]
    after = read_index(spark, index_dir)
    assert after.count() == want
    assert stats["rows_deleted"] > 0
    # no matching row survives anywhere
    assert after.filter((F.col("event_type") == "error") & (F.col("value") >= 50)).count() == 0
    # rewritten splits carry the delete opstamp; untouched ones stay at 0
    lin = read_lineage(spark, index_dir)
    ops = {r["commit_id"]: r["delete_opstamp"] for r in lin.collect()}
    assert stats["opstamp"] in set(ops.values())
    # lineage doc counts still match the data
    lin_total = lin.agg(F.sum("num_docs")).collect()[0][0]
    assert lin_total == want
    # a second delete gets a new opstamp
    stats2 = delete_by_query(spark, index_dir, "event_type:signup", qc, source_id="events")
    assert stats2["opstamp"] == stats["opstamp"] + 1


def test_delete_by_query_no_match_is_noop(spark, index_dir):
    qc = QueryCompiler(EVENTS_FIELDS)
    before = read_index(spark, index_dir).count()
    stats = delete_by_query(spark, index_dir, "event_type:nope_never", qc)
    assert stats["rows_deleted"] == 0 and stats["commits_rewritten"] == []
    assert read_index(spark, index_dir).count() == before


def test_retention_drops_whole_day_splits(spark, tiny_dir, index_dir):
    cutoff = "2024-01-04 00:00:00"
    stats = apply_retention(spark, index_dir, cutoff)
    assert stats["splits_dropped"], "fixture should have old splits"
    got = read_index(spark, index_dir).count()
    # day-aligned splits ⇒ split-granularity retention == row-level cutoff
    want = duckdb.sql(
        f"SELECT count(*) FROM '{_events_path(tiny_dir)}' WHERE ts >= TIMESTAMP '{cutoff}'"
    ).fetchone()[0]
    assert got == want
    # lineage agrees and has no pre-cutoff split left
    lin = read_lineage(spark, index_dir)
    assert lin.agg(F.sum("num_docs")).collect()[0][0] == want
    assert lin.filter(F.col("time_range_end") < F.lit(cutoff).cast("timestamp")).count() == 0


def test_gc_removes_dangling_commits_only(spark, index_dir):
    sinks = os.path.join(index_dir, "sinks")
    committed_before = len(glob.glob(os.path.join(sinks, "commit=*")))
    # fabricate a dangling commit (written but never checkpoint-published)
    dangling = os.path.join(sinks, "commit=zz-dangling", "sink=error")
    os.makedirs(dangling)
    with open(os.path.join(dangling, "part-000.parquet"), "wb") as fh:
        fh.write(b"not really parquet")
    # and a leftover staging dir
    os.makedirs(os.path.join(index_dir, ".staging", "delete-9-zz"))

    # inside the grace period nothing is removed
    stats = garbage_collect(index_dir, grace_seconds=3600)
    assert stats["dangling_commits_removed"] == [] and stats["tmp_swept"] == 0

    stats = garbage_collect(index_dir, grace_seconds=0)
    assert stats["dangling_commits_removed"] == ["zz-dangling"]
    assert stats["tmp_swept"] == 1
    assert len(glob.glob(os.path.join(sinks, "commit=*"))) == committed_before


def test_retention_lineage_swap_crash_repair(spark, index_dir):
    """A crash between retention's rename-first steps (old lineage trashed,
    staged copy not yet moved in) must be rolled forward by GC — a live
    commit may never be left without a lineage entry (it would silently
    vanish from split pruning)."""
    import shutil

    lin_root = os.path.join(index_dir, "_lineage")
    ldirs = sorted(glob.glob(os.path.join(lin_root, "commit_id=*")))
    commit_a = os.path.basename(ldirs[0]).split("=", 1)[1]
    commit_b = os.path.basename(ldirs[1]).split("=", 1)[1]
    staging = os.path.join(index_dir, ".staging")
    os.makedirs(staging, exist_ok=True)

    def _stage(src, commit):
        dst = os.path.join(staging, f"retention-lin-{commit}")
        shutil.copytree(src, dst)
        # the real staged write is a direct (non-partitioned) Spark write,
        # which marks completion with _SUCCESS; replicate that marker
        open(os.path.join(dst, "_SUCCESS"), "w").close()

    # case A: old lineage already gone (trashed), staged copy complete
    la = os.path.join(lin_root, f"commit_id={commit_a}")
    _stage(la, commit_a)
    shutil.rmtree(la)
    # case B: staged copy complete, old lineage still in place
    lb = os.path.join(lin_root, f"commit_id={commit_b}")
    _stage(lb, commit_b)
    # case C: partial staged write (no _SUCCESS) for a bogus commit
    os.makedirs(os.path.join(staging, "retention-lin-zz-partial"))

    stats = garbage_collect(index_dir, grace_seconds=3600)
    assert sorted(stats["retention_repaired"]) == sorted([commit_a, commit_b])
    assert os.path.isdir(la) and os.path.isdir(lb)
    # case B's displaced old entry went to trash, not oblivion
    assert os.path.isdir(
        os.path.join(index_dir, ".trash", f"retention-lin-{commit_b}-old")
    )
    # partial staged copy dropped, nothing adopted for it
    assert not os.path.isdir(os.path.join(staging, "retention-lin-zz-partial"))
    assert not os.path.isdir(os.path.join(lin_root, "commit_id=zz-partial"))
    # repaired lineage still reads clean and covers all commits
    lin = read_lineage(spark, index_dir)
    assert lin.filter(F.col("commit_id").isin([commit_a, commit_b])).count() > 0


def test_delete_opstamp_reserved_before_swap(spark, tiny_dir, index_dir, monkeypatch):
    """The delete record is a write-ahead intent: a crash mid-swap must leave
    the opstamp reserved so the next (unrelated) delete can't alias it."""
    import shutil as _shutil

    qc = QueryCompiler(EVENTS_FIELDS)
    real_move = _shutil.move
    calls = {"n": 0}

    def exploding_move(src, dst, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("simulated crash mid-swap")
        return real_move(src, dst, *a, **kw)

    monkeypatch.setattr("quickwit_spark.pipeline.janitor.shutil.move", exploding_move)
    with pytest.raises(OSError):
        delete_by_query(spark, index_dir, "event_type:error", qc, source_id="events")
    monkeypatch.undo()

    import json

    recs = sorted(glob.glob(os.path.join(index_dir, "_deletes", "*.json")))
    assert recs, "write-ahead delete record must exist despite the crash"
    with open(recs[-1]) as fh:
        rec = json.load(fh)
    assert rec["complete"] is False
    crashed_opstamp = rec["opstamp"]

    # repair, then run a DIFFERENT delete: it must get a fresh opstamp
    garbage_collect(index_dir, grace_seconds=0)
    stats = delete_by_query(spark, index_dir, "event_type:click", qc, source_id="events")
    assert stats["opstamp"] > crashed_opstamp


def test_delete_then_retention_then_gc_consistent(spark, tiny_dir, index_dir):
    qc = QueryCompiler(EVENTS_FIELDS)
    delete_by_query(spark, index_dir, "event_type:click", qc, source_id="events")
    apply_retention(spark, index_dir, "2024-01-03 00:00:00")
    garbage_collect(index_dir, grace_seconds=0)
    got = read_index(spark, index_dir).count()
    want = duckdb.sql(
        f"SELECT count(*) FROM '{_events_path(tiny_dir)}' "
        "WHERE event_type <> 'click' AND ts >= TIMESTAMP '2024-01-03 00:00:00'"
    ).fetchone()[0]
    assert got == want


def test_delete_on_transcripts_pipeline_output(spark, tmp_path_factory):
    """delete_by_query over the runner's sink layout (tagged lineage schema)."""
    from quickwit_spark.pipeline.runner import PipelineConfig, run_pipeline, read_sinks
    from quickwit_spark.pipeline.transcripts import materialize

    src = str(tmp_path_factory.mktemp("jan_pipe_in"))
    out = str(tmp_path_factory.mktemp("jan_pipe_out"))
    materialize(3_000, src, seed=7)
    run_pipeline(spark, src, out, PipelineConfig(), num_chunks=2)

    before = read_sinks(spark, out)
    n_err = before.filter(F.col("level") == "ERROR").count()
    n_all = before.count()
    assert n_err > 0

    qc = QueryCompiler({"level": "raw"})
    stats = delete_by_query(
        spark, out, "level:ERROR", qc, tag_fields=("level", "tier"),
        source_id="transcripts",
    )
    assert stats["rows_deleted"] == n_err
    after = read_sinks(spark, out)
    assert after.count() == n_all - n_err
    assert after.filter(F.col("level") == "ERROR").count() == 0
    # lineage schema kept the tag columns and the opstamp advanced
    lin = read_lineage(spark, out)
    assert "tags_level" in lin.columns
    assert lin.filter(F.col("delete_opstamp") == stats["opstamp"]).count() > 0


def test_merge_policy_planning():
    from quickwit_spark.pipeline.janitor import plan_merges

    rows = [{"commit_id": f"c{i:02d}", "num_docs": 100} for i in range(25)]
    rows.append({"commit_id": "mature", "num_docs": 20_000_000})
    groups = plan_merges(rows, merge_factor=10, max_merge_factor=12,
                         split_num_docs_target=10_000_000)
    # 25 immature: 12 + 12, leftover 1 < merge_factor stays unmerged
    assert [len(g) for g in groups] == [12, 12]
    assert all("mature" not in g for g in groups)
    # below merge_factor: no merge
    assert plan_merges(rows[:5], merge_factor=10) == []


def test_merge_executor_preserves_rows_and_unions_lineage(spark, tiny_dir, index_dir):
    from quickwit_spark.pipeline.janitor import merge_splits

    before = read_index(spark, index_dir)
    rows_before = {tuple(r) for r in before.select("event_id", "sink").collect()}
    lin_before = read_lineage(spark, index_dir)
    total_docs = lin_before.agg(F.sum("num_docs")).collect()[0][0]
    tmin = lin_before.agg(F.min("time_range_start")).collect()[0][0]
    n_commits_before = lin_before.select("commit_id").distinct().count()

    stats = merge_splits(spark, index_dir, merge_factor=5, max_merge_factor=10,
                         source_id="events")
    assert stats["merged"], "day splits are small: should merge"

    after = read_index(spark, index_dir)
    rows_after = {tuple(r) for r in after.select("event_id", "sink").collect()}
    assert rows_after == rows_before  # row set exactly preserved
    lin_after = read_lineage(spark, index_dir)
    assert lin_after.agg(F.sum("num_docs")).collect()[0][0] == total_docs
    assert lin_after.agg(F.min("time_range_start")).collect()[0][0] == tmin
    assert lin_after.select("commit_id").distinct().count() < n_commits_before
    # merged commits are still queryable + retention still works on them
    from quickwit_spark.pipeline.janitor import apply_retention

    apply_retention(spark, index_dir, "2100-01-01 00:00:00")
    assert read_index_count_or_zero(spark, index_dir) == 0


def read_index_count_or_zero(spark, out):
    import glob as g

    if not g.glob(os.path.join(out, "sinks", "commit=*")):
        return 0
    return read_index(spark, out).count()


def test_tag_based_split_pruning(spark, tmp_path_factory):
    """tag_pruning.rs analog: pruning by lineage tags reads fewer commits but
    returns exactly the same rows as the full scan."""
    from quickwit_spark.pipeline.janitor import prune_splits_by_tag
    from quickwit_spark.pipeline.runner import PipelineConfig, read_sinks, run_pipeline
    from quickwit_spark.pipeline.transcripts import materialize

    src = str(tmp_path_factory.mktemp("tags_in"))
    out = str(tmp_path_factory.mktemp("tags_out"))
    materialize(3_000, src, seed=11)
    run_pipeline(spark, src, out, PipelineConfig(), num_chunks=3)

    commits = prune_splits_by_tag(spark, out, "level", ["ERROR"])
    assert commits, "ERROR appears in some chunk"
    full = read_sinks(spark, out).filter(F.col("level") == "ERROR")
    pruned = read_sinks(spark, out).filter(
        F.col("commit").isin(commits) & (F.col("level") == "ERROR")
    )
    assert pruned.count() == full.count()
    # pruning something absent keeps nothing (no false keeps when tag sets
    # are small and explicit)
    assert prune_splits_by_tag(spark, out, "level", ["NO_SUCH_LEVEL"]) == []


def test_negative_tag_queries_null_safe(spark):
    """tag_fields/0002_negative_tags.yaml: negation over a NULL-bearing tag
    column keeps the null docs (num_hits 4 / 2 vectors)."""
    from quickwit_spark.operators.query import QueryCompiler

    df = spark.createDataFrame(
        [(1, 1), (2, 2), (1, 1), (3, None), (4, 1)], "seq long, tag long"
    )
    qc = QueryCompiler({"tag": "numeric", "seq": "numeric"})
    assert qc.where(df, "tag:1").count() == 3
    assert qc.where(df, "-tag:2").count() == 4
    assert qc.where(df, "tag:2").count() == 1
    assert qc.where(df, "-tag:1").count() == 2


def test_time_range_split_pruning(spark, tiny_dir, index_dir):
    """root.rs:1230-1245 analog: time pruning from lineage reads fewer
    commits but returns exactly the full-scan rows."""
    from quickwit_spark.pipeline.janitor import prune_splits_by_time

    start, end = "2024-01-05 00:00:00", "2024-01-08 00:00:00"
    commits = prune_splits_by_time(spark, index_dir, start, end)
    all_commits = [
        r["commit_id"]
        for r in read_lineage(spark, index_dir).select("commit_id").distinct().collect()
    ]
    assert 0 < len(commits) < len(all_commits)  # actually prunes

    full = read_index(spark, index_dir).filter(
        (F.col("ts") >= start) & (F.col("ts") < end)
    )
    pruned = read_index(spark, index_dir).filter(
        F.col("commit").isin(commits) & (F.col("ts") >= start) & (F.col("ts") < end)
    )
    assert pruned.count() == full.count() > 0
    # open-ended bounds
    assert len(prune_splits_by_time(spark, index_dir, start=None, end=None)) == len(all_commits)
    assert prune_splits_by_time(spark, index_dir, start="2099-01-01") == []


def test_gc_survives_merge_and_restores_interrupted_swap(spark, tiny_dir, index_dir):
    """Two janitor crash-safety properties: (1) merged commits (lineage-only,
    no checkpoint file) are NOT swept as dangling; (2) a commit whose live
    dir vanished mid-swap is RESTORED from trash before any sweeping."""
    import shutil as sh

    from quickwit_spark.pipeline.janitor import merge_splits

    before = read_index(spark, index_dir).count()
    merge_splits(spark, index_dir, merge_factor=5, max_merge_factor=10, source_id="events")
    stats = garbage_collect(index_dir, grace_seconds=0)
    assert stats["dangling_commits_removed"] == []  # merged commits are LIVE
    assert read_index(spark, index_dir).count() == before

    # simulate a crash between trash-move and staged-move: a live commit's
    # dir sits in .trash, nothing at the live path
    sinks = os.path.join(index_dir, "sinks")
    victim = sorted(glob.glob(os.path.join(sinks, "commit=*")))[0]
    commit = os.path.basename(victim).split("=", 1)[1]
    os.makedirs(os.path.join(index_dir, ".trash"), exist_ok=True)
    sh.move(victim, os.path.join(index_dir, ".trash", f"delete-9-{commit}"))
    assert read_index(spark, index_dir).count() < before

    stats = garbage_collect(index_dir, grace_seconds=0)
    assert commit in stats["restored"]
    assert read_index(spark, index_dir).count() == before  # no data lost


def test_merge_crash_repair_rolls_back_and_forward(spark, tiny_dir, index_dir):
    """Interrupted merges repair deterministically from the intent manifest:
    mid-swap → roll back to pre-merge; post-data-move → roll forward."""
    import json as _json
    import shutil as sh

    from quickwit_spark.pipeline.janitor import merge_splits

    before = read_index(spark, index_dir).count()
    stats = merge_splits(spark, index_dir, merge_factor=5, max_merge_factor=10,
                         source_id="events")
    merged_id = stats["merged"][0]
    sinks = os.path.join(index_dir, "sinks")

    # ---- simulate a MID-SWAP crash: merged live data moved back to staging,
    # merged lineage removed, manifest re-created (as if we died after
    # trashing originals but before installing the merged copy)
    staged = os.path.join(index_dir, ".staging", f"crash-{merged_id}")
    sh.move(os.path.join(sinks, f"commit={merged_id}"), staged)
    staged_lin = os.path.join(index_dir, ".staging", "crash-lineage")
    sh.move(os.path.join(index_dir, "_lineage", f"commit_id={merged_id}"), staged_lin)
    trash = {
        c: {"data": p, "lineage": p.replace(f"merge-0-{c}", f"merge-0-lin-{c}")}
        for c, p in (
            (c, os.path.join(index_dir, ".trash", f"merge-0-{c}"))
            for c in stats["groups"][0]
        )
    }
    os.makedirs(os.path.join(index_dir, "_merges"), exist_ok=True)
    with open(os.path.join(index_dir, "_merges", f"{merged_id}.json"), "w") as fh:
        _json.dump({"merged_id": merged_id, "group": stats["groups"][0],
                    "staged_data": staged, "staged_lineage": staged_lin,
                    "trash": trash}, fh)

    out = garbage_collect(index_dir, grace_seconds=3600)
    assert merged_id in out["merges_repaired"]
    # rolled BACK: original commits restored, full row count intact
    assert read_index(spark, index_dir).count() == before
    lin_ids = {
        os.path.basename(p).split("=", 1)[1]
        for p in glob.glob(os.path.join(index_dir, "_lineage", "commit_id=*"))
    }
    assert merged_id not in lin_ids and len(lin_ids) > 1

    # ---- roll FORWARD: redo the merge, then fake a crash AFTER both moves
    # (manifest left behind) — repair just cleans up
    stats2 = merge_splits(spark, index_dir, merge_factor=5, max_merge_factor=10,
                          source_id="events")
    m2 = stats2["merged"][0]
    with open(os.path.join(index_dir, "_merges", f"{m2}.json"), "w") as fh:
        _json.dump({"merged_id": m2, "group": stats2["groups"][0],
                    "staged_data": "/nonexistent", "staged_lineage": "/nonexistent",
                    "trash": {c: {"data": os.path.join(index_dir, ".trash", f"x-{c}"),
                                  "lineage": os.path.join(index_dir, ".trash", f"x-lin-{c}")}
                              for c in stats2["groups"][0]}}, fh)
    out2 = garbage_collect(index_dir, grace_seconds=3600)
    assert m2 in out2["merges_repaired"]
    assert read_index(spark, index_dir).count() == before


def test_search_index_auto_time_pruning(spark, tiny_dir, index_dir):
    """search_index extracts ts bounds from the query AST automatically
    (root.rs:1230-1245 analog): a one-day query over the day-partitioned
    index must open only the overlapping commit(s), with results identical
    to the full scan."""
    from quickwit_spark.api import es_search, pruned_index_df, search_index
    from quickwit_spark.pipeline.janitor import read_index

    field_types = {"event_type": "raw", "value": "numeric", "ts": "datetime"}
    body = {
        "q": "ts:[2024-01-02T00:00:00Z TO 2024-01-03T00:00:00Z} AND value:>=10",
        "size": 0,
        "aggs": {"by_type": {"terms": {"field": "event_type"}}},
    }
    all_commits = sorted(
        os.path.basename(p).split("=", 1)[1]
        for p in glob.glob(os.path.join(index_dir, "sinks", "commit=*"))
    )
    df, commits = pruned_index_df(spark, index_dir, body, field_types)
    assert set(commits) == {"d2024-01-02"}, commits
    assert len(all_commits) > 1
    # only the surviving commit's files are opened
    assert all("commit=d2024-01-02" in f for f in df.inputFiles())

    got = search_index(spark, index_dir, body, field_types)
    want = es_search(read_index(spark, index_dir), body, field_types)
    got.pop("took"), want.pop("took")
    assert got == want

    # ES DSL range + extra_filters both contribute bounds (intersection)
    body2 = {
        "query": {"range": {"ts": {"gte": "2024-01-01T00:00:00Z",
                                   "lt": "2024-01-04T00:00:00Z"}}},
        "extra_filters": "ts:[2024-01-03T00:00:00Z TO *]",
        "size": 0,
    }
    _, commits2 = pruned_index_df(spark, index_dir, body2, field_types)
    assert set(commits2) == {"d2024-01-03"}, commits2
    got2 = search_index(spark, index_dir, body2, field_types)
    want2 = es_search(read_index(spark, index_dir), body2, field_types)
    got2.pop("took"), want2.pop("took")
    assert got2 == want2

    # un-bounded query prunes nothing and still matches the full scan
    body3 = {"q": "event_type:error", "size": 0}
    _, commits3 = pruned_index_df(spark, index_dir, body3, field_types)
    assert sorted(commits3) == all_commits


def test_query_lifecycle_prune_then_aggregate(spark, tiny_dir, index_dir):
    """SURVEY §3.2 end-to-end at the storage layer: time-prune splits from
    lineage, scan ONLY those commits, run the date_histogram — identical
    buckets to the naive full scan (the 10^12-turn query path)."""
    from quickwit_spark.operators.aggs import date_histogram
    from quickwit_spark.pipeline.janitor import prune_splits_by_time

    start, end = "2024-01-03 00:00:00", "2024-01-09 00:00:00"
    commits = prune_splits_by_time(spark, index_dir, start, end)
    pruned_scan = read_index(spark, index_dir).filter(F.col("commit").isin(commits))
    full_scan = read_index(spark, index_dir)

    def buckets(df):
        return [
            (r["key"], r["doc_count"])
            for r in date_histogram(
                df.filter((F.col("ts") >= start) & (F.col("ts") < end)),
                "ts", "1d", min_doc_count=1,
            ).collect()
        ]

    got, want = buckets(pruned_scan), buckets(full_scan)
    assert got == want and len(got) == 6


def test_search_index_auto_tag_pruning(spark, tmp_path_factory):
    """tag_fields/0002_negative_tags.yaml end-to-end, with AUTOMATIC query →
    tag split pruning (tag_pruning.rs:35 extract_tags_from_query → metastore
    tag filter): the `simple` index's three ingest splits carry u64 `tag`
    tags; a positive tag query opens only matching splits, a negative one
    must open all (negation can never prune), and hit counts match the
    scenario's vectors either way."""
    from quickwit_spark.api import pruned_index_df, search_index
    from quickwit_spark.pipeline.janitor import build_lineage

    out = str(tmp_path_factory.mktemp("tag_prune_idx"))
    splits = {
        "c1": [(1, 1), (2, 2)],
        "c2": [(1, 1), (3, None)],
        "c3": [(4, 1)],
    }
    for cid, rows in splits.items():
        df = (
            spark.createDataFrame(rows, "seq long, tag long")
            .withColumn("sink", F.lit("default"))
            .withColumn("commit", F.lit(cid))
        )
        df.write.mode("append").partitionBy("commit", "sink").parquet(
            os.path.join(out, "sinks")
        )
        lin = build_lineage(df, source_id="simple", tag_fields=("tag",))
        lin.withColumn("commit_id", F.lit(cid)).write.mode("append").partitionBy(
            "commit_id"
        ).parquet(os.path.join(out, "_lineage"))

    field_types = {"tag": "numeric", "seq": "numeric"}

    def run(q):
        _, commits = pruned_index_df(spark, out, q_body := {"q": q, "size": 0}, field_types)
        res = search_index(spark, out, q_body, field_types)
        return res["hits"]["total"]["value"], sorted(commits)

    # scenario vectors: hits AND which splits were opened
    assert run("tag:1") == (3, ["c1", "c2", "c3"])
    assert run("tag:2") == (1, ["c1"])
    assert run("-tag:2") == (4, ["c1", "c2", "c3"])  # negation never prunes
    assert run("-tag:1") == (2, ["c1", "c2", "c3"])
    # absent value prunes everything before any file is read
    assert run("tag:7") == (0, [])
    # non-tag field conjunct does not prune; tag conjunct still does
    assert run("tag:2 AND seq:2") == (1, ["c1"])


def test_delete_task_api(spark, tiny_dir, index_dir):
    """delete_task_api/handler.rs analog: deny_unknown_fields, invalid-query
    400, ts-bounded deletes, DeleteTask response shape, list ordering."""
    from quickwit_spark.api import create_delete_task, list_delete_tasks

    ft = {"event_type": "raw", "value": "numeric", "ts": "datetime"}
    before = read_index(spark, index_dir).count()
    n_err_day1 = (
        read_index(spark, index_dir)
        .filter((F.col("event_type") == "error")
                & (F.col("ts") < "2024-01-02 00:00:00"))
        .count()
    )
    assert n_err_day1 > 0

    task = create_delete_task(
        spark, index_dir,
        # i64 epoch seconds, as DeleteQueryRequest types them
        # (= 2024-01-02T00:00:00Z)
        {"query": "event_type:error",
         "end_timestamp": 1704153600},
        ft,
    )
    assert task["opstamp"] >= 1
    assert task["delete_query"]["query"] == "event_type:error"
    after = read_index(spark, index_dir).count()
    assert after == before - n_err_day1  # only the bounded slice deleted

    # second task gets a later opstamp; list returns oldest-first
    task2 = create_delete_task(spark, index_dir, {"query": "value:>=99999"}, ft)
    assert task2["opstamp"] > task["opstamp"]
    tasks = list_delete_tasks(index_dir)
    assert [t["opstamp"] for t in tasks] == sorted(t["opstamp"] for t in tasks)
    assert tasks[-1]["delete_query"]["query"] == "value:>=99999"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown field"):
        create_delete_task(spark, index_dir, {"query": "*", "bogus": 1}, ft)
    with _pytest.raises(ValueError, match="invalid delete query"):
        create_delete_task(spark, index_dir, {"query": "value:"}, ft)
    # DeleteQueryRequest types timestamps i64: strings are a 400, never
    # interpolated into the effective query
    with _pytest.raises(ValueError, match="must be an integer"):
        create_delete_task(
            spark, index_dir,
            {"query": "*", "end_timestamp": "2024-01-02T00:00:00Z"}, ft)


def test_sql_over_index(spark, tiny_dir, index_dir):
    """datafusion_api analog: plain SQL over a registered index view, with
    results matching the DataFrame path."""
    from quickwit_spark.api import register_sql_views

    assert register_sql_views(spark, {"events_idx": index_dir}) == ["events_idx"]
    got = spark.sql(
        "SELECT event_type, count(*) AS n FROM events_idx "
        "WHERE value >= 10 GROUP BY event_type ORDER BY event_type"
    ).collect()
    want = (
        read_index(spark, index_dir)
        .filter(F.col("value") >= 10)
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
        .collect()
    )
    assert got == want and len(got) > 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="invalid index id"):
        register_sql_views(spark, {"BAD NAME": index_dir})


def test_janitor_cycle_composition(spark, tiny_dir, index_dir):
    """One cycle = retention → merge → GC, idempotent: second run is a
    no-op and row sets survive exactly."""
    from quickwit_spark.pipeline.janitor import janitor_cycle

    before = (
        read_index(spark, index_dir)
        .filter(F.col("ts") >= "2024-01-03 00:00:00")
        .count()
    )
    s1 = janitor_cycle(
        spark, index_dir,
        retention_cutoff="2024-01-03 00:00:00",
        split_num_docs_target=10_000,
    )
    assert read_index_count_or_zero(spark, index_dir) == before
    s2 = janitor_cycle(spark, index_dir, split_num_docs_target=10_000)
    assert read_index_count_or_zero(spark, index_dir) == before
    assert s2["gc"]["dangling_commits_removed"] == []
    assert s2["merge"].get("merged_groups", s2["merge"]) is not None and s1 is not None


def test_delete_task_request_validation(spark, index_dir):
    """Review regressions: an absent/empty query must 400 (never delete-all),
    a string search_field must 400 (not explode per-character), an unknown
    field in the query is a request error, and the sanitized SQL view name
    for a dashed index id is legal."""
    from quickwit_spark.api import create_delete_task, register_sql_views

    ft = {"event_type": "raw", "value": "numeric", "ts": "datetime"}
    before = read_index(spark, index_dir).count()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="`query` is required"):
        create_delete_task(spark, index_dir, {}, ft)
    with _pytest.raises(ValueError, match="`query` is required"):
        create_delete_task(spark, index_dir, {"query": "  "}, ft)
    with _pytest.raises(ValueError, match="`search_field` must be an array"):
        create_delete_task(
            spark, index_dir, {"query": "hello", "search_field": "body"}, ft
        )
    with _pytest.raises(ValueError, match="unknown field `no_such_field`"):
        create_delete_task(spark, index_dir, {"query": "no_such_field:3"}, ft)
    assert read_index(spark, index_dir).count() == before  # nothing deleted

    views = register_sql_views(spark, {"otel-logs-v0.7": index_dir})
    assert views == ["otel_logs_v0_7"]
    assert spark.sql("SELECT count(*) FROM otel_logs_v0_7").collect()[0][0] == before
