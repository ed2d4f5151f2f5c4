"""Janitor surface: delete-by-query, retention, garbage collection.

Spark re-expression of the reference janitor actors (behavior studied from
quickwit-janitor/src/actors/delete_task_planner.rs,
retention_policy_executor.rs, garbage_collector.rs and the retention config
in quickwit-config/src/index_config/mod.rs:311-328):

- **Delete-by-query**: a delete task is (opstamp, query). Splits whose rows
  match are REWRITTEN (the reference piggy-backs deletes on merges; here the
  rewrite is an explicit anti-filter job per affected commit directory),
  staged then atomically swapped, so a crash mid-delete never loses data.
  Split lineage records the applied ``delete_opstamp``.
- **Retention**: splits age out by their lineage ``time_range_end`` — a
  METADATA-ONLY plan (no data scan), exactly like the reference dropping
  whole splits; data is only deleted at split granularity.
- **GC**: dangling split directories that were staged/written but never
  published (no checkpoint commit) are removed after a grace period, plus
  leftover ``.staging``/``.trash`` from interrupted janitor runs.

Scale notes: delete planning reads lineage + one pass over only the AFFECTED
commit dirs (predicate evaluated once to find them — pushed-down parquet
filter); retention/GC touch metadata and the filesystem only. At 10^12 turns
the data plane is never scanned for retention, and delete rewrites
parallelize per (commit, sink) leaf like any other partitioned write.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quickwit_spark.operators.query import QueryCompiler
from quickwit_spark.pipeline.checkpoint import CheckpointStore

MAX_VALUES_PER_TAG = 64


def build_lineage(
    written: DataFrame,
    source_id: str = "",
    tag_fields: tuple[str, ...] = (),
    ts_col: str = "ts",
    text_col: str = "text",
    delete_opstamp: int = 0,
    extra_keys: tuple[str, ...] = (),
    num_merge_ops: int = 0,
) -> DataFrame:
    """Per-(sink, partition_bucket) split metadata (SplitMetadata analog).

    Column-presence aware so one builder serves the transcripts pipeline and
    generic indexes; always includes ``delete_opstamp`` (delete-task water
    mark, delete_task_planner.rs behavior)."""
    cols = set(written.columns)
    keys = list(extra_keys) + ["sink"] + (
        ["partition_bucket"] if "partition_bucket" in cols else []
    )
    aggs = [F.count(F.lit(1)).alias("num_docs")]
    if text_col in cols:
        aggs.append(F.sum(F.length(text_col)).alias("uncompressed_size_bytes"))
    if ts_col in cols:
        aggs.append(F.min(ts_col).alias("time_range_start"))
        aggs.append(F.max(ts_col).alias("time_range_end"))
    for t in tag_fields:
        if t in cols:
            aggs.append(
                F.slice(F.collect_set(t), 1, MAX_VALUES_PER_TAG).alias(f"tags_{t}")
            )
    return (
        written.groupBy(*keys)
        .agg(*aggs)
        .withColumn("source_id", F.lit(source_id))
        .withColumn("create_timestamp", F.current_timestamp())
        .withColumn("delete_opstamp", F.lit(delete_opstamp))
        .withColumn("num_merge_ops", F.lit(num_merge_ops))
    )


def _sinks_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "sinks")


def _commit_dirs(out_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(_sinks_dir(out_dir), "commit=*")))


def read_index(spark: SparkSession, out_dir: str) -> DataFrame:
    """All rows across commits with `commit` + `sink` partition columns."""
    return spark.read.option("basePath", _sinks_dir(out_dir)).parquet(
        os.path.join(_sinks_dir(out_dir), "commit=*")
    )


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "_lineage"))


def read_index_commits(
    spark: SparkSession, out_dir: str, commits: list[str]
) -> DataFrame:
    """Rows of ONLY the given commits (the post-pruning read: files of
    non-matching splits are never opened). Empty commit list → empty frame
    with the index schema."""
    if not commits:
        return read_index(spark, out_dir).filter(F.lit(False))
    sinks = _sinks_dir(out_dir)
    return spark.read.option("basePath", sinks).parquet(
        *[os.path.join(sinks, f"commit={c}") for c in commits]
    )


# ---------------------------------------------------------------------------
# delete-by-query
# ---------------------------------------------------------------------------


def next_opstamp(out_dir: str) -> int:
    d = os.path.join(out_dir, "_deletes")
    existing = [int(os.path.basename(p)[: -len(".json")]) for p in glob.glob(os.path.join(d, "*.json"))]
    return (max(existing) + 1) if existing else 1


def delete_by_query(
    spark: SparkSession,
    out_dir: str,
    query: str,
    compiler: QueryCompiler,
    tag_fields: tuple[str, ...] = (),
    source_id: str = "",
) -> dict:
    """Apply a delete task: rewrite every commit containing matching rows.

    Plan phase finds affected commits with ONE filtered scan (predicate pushes
    to parquet); rewrite phase runs one staged write per affected commit and
    swaps it in atomically (stage → trash original → rename staged). Lineage
    for rewritten commits is recomputed with the new ``delete_opstamp``.
    """
    opstamp = next_opstamp(out_dir)
    pred = F.coalesce(compiler.compile(compiler.parse(query)), F.lit(False))
    every = read_index(spark, out_dir)
    plan = every.filter(pred).groupBy("commit").agg(F.count(F.lit(1)).alias("n")).collect()
    affected = [r["commit"] for r in plan]
    rows_deleted = int(sum(r["n"] for r in plan))

    # write-ahead: persist the delete record BEFORE any swap (mirroring the
    # merge intent manifest) so a crash mid-swap can never recycle this
    # opstamp for an unrelated later query — next_opstamp scans _deletes/
    record_path = os.path.join(out_dir, "_deletes", f"{opstamp}.json")
    os.makedirs(os.path.join(out_dir, "_deletes"), exist_ok=True)
    with open(record_path, "w") as fh:
        json.dump({"opstamp": opstamp, "query": query,
                   "applied_commits": affected, "complete": False}, fh)

    staging_root = os.path.join(out_dir, ".staging")
    trash_root = os.path.join(out_dir, ".trash")
    os.makedirs(staging_root, exist_ok=True)
    os.makedirs(trash_root, exist_ok=True)
    sinks = _sinks_dir(out_dir)

    if affected:
        # ONE staged rewrite job over all affected commits (partitioned write
        # fans the work out per (commit, sink) leaf), then per-commit atomic
        # swaps — a crash mid-swap leaves each commit either old or new, never
        # half-written
        staged = os.path.join(staging_root, f"delete-{opstamp}")
        kept_all = every.filter(F.col("commit").isin(affected)).filter(~pred)
        kept_all.write.mode("overwrite").partitionBy("commit", "sink").parquet(staged)

        # recompute lineage for every rewritten commit in one aggregate
        staged_lineage = os.path.join(staging_root, f"delete-{opstamp}-lineage")
        new_rows = spark.read.option("basePath", staged).parquet(
            os.path.join(staged, "commit=*")
        )
        (
            build_lineage(
                new_rows.withColumnRenamed("commit", "commit_id"),
                source_id=source_id, tag_fields=tag_fields, delete_opstamp=opstamp,
                extra_keys=("commit_id",),
            )
            .write.mode("overwrite").partitionBy("commit_id").parquet(staged_lineage)
        )

        for commit in affected:
            commit_dir = os.path.join(sinks, f"commit={commit}")
            staged_commit = os.path.join(staged, f"commit={commit}")
            lineage_dir = os.path.join(out_dir, "_lineage", f"commit_id={commit}")
            staged_lin = os.path.join(staged_lineage, f"commit_id={commit}")
            # order matters for crash recovery: the OLD lineage entry stays in
            # place until the new data is live — garbage_collect's restore
            # pass keys on lineage presence
            shutil.move(commit_dir, os.path.join(trash_root, f"delete-{opstamp}-{commit}"))
            if os.path.isdir(staged_commit) and glob.glob(os.path.join(staged_commit, "sink=*")):
                shutil.move(staged_commit, commit_dir)
                shutil.rmtree(lineage_dir, ignore_errors=True)
                shutil.move(staged_lin, lineage_dir)
            else:
                shutil.rmtree(lineage_dir, ignore_errors=True)
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(staged_lineage, ignore_errors=True)

    with open(record_path, "w") as fh:
        json.dump({"opstamp": opstamp, "query": query,
                   "applied_commits": affected, "complete": True}, fh)
    # rewrites are applied; trash is GC'd separately (grace period)
    return {"opstamp": opstamp, "commits_rewritten": affected, "rows_deleted": rows_deleted}


# ---------------------------------------------------------------------------
# retention
# ---------------------------------------------------------------------------


def apply_retention(spark: SparkSession, out_dir: str, cutoff) -> dict:
    """Drop every (commit, sink) split whose lineage ``time_range_end`` <
    ``cutoff`` — metadata-only planning, split-granularity deletion
    (retention_policy_executor.rs: splits are dropped whole, rows inside a
    straddling split are retained until the whole split ages out)."""
    lineage = read_lineage(spark, out_dir)
    doomed = (
        lineage.groupBy("commit_id", "sink")
        .agg(F.max("time_range_end").alias("end"))
        .filter(F.col("end") < F.lit(cutoff).cast("timestamp"))
        .select("commit_id", "sink")
        .collect()
    )
    sinks = _sinks_dir(out_dir)
    dropped = []
    for r in doomed:
        leaf = os.path.join(sinks, f"commit={r['commit_id']}", f"sink={r['sink']}")
        shutil.rmtree(leaf, ignore_errors=True)
        dropped.append((r["commit_id"], r["sink"]))

    # rewrite lineage for affected commits (driver-side: metadata plane).
    # Staged copy lives under .staging (NOT ldir+'.new', which would pollute
    # partition discovery on _lineage reads); swap is rename-first — old to
    # trash, then staged into place — so a crash between the two is rolled
    # forward by garbage_collect._repair_retention instead of leaving a live
    # commit with no lineage entry (silently excluded from split pruning).
    staging_root = os.path.join(out_dir, ".staging")
    trash_root = os.path.join(out_dir, ".trash")
    os.makedirs(staging_root, exist_ok=True)
    os.makedirs(trash_root, exist_ok=True)
    for commit in {c for c, _ in dropped}:
        ldir = os.path.join(out_dir, "_lineage", f"commit_id={commit}")
        gone = {s for c, s in dropped if c == commit}
        cur = spark.read.parquet(ldir)
        kept = cur.filter(~F.col("sink").isin(list(gone)))
        rows = kept.collect()
        if rows:
            staged = os.path.join(staging_root, f"retention-lin-{commit}")
            spark.createDataFrame(rows, kept.schema).write.mode("overwrite").parquet(
                staged
            )
            shutil.move(ldir, os.path.join(trash_root, f"retention-lin-{commit}"))
            shutil.move(staged, ldir)
        else:
            shutil.rmtree(ldir)
        commit_dir = os.path.join(sinks, f"commit={commit}")
        if not glob.glob(os.path.join(commit_dir, "sink=*")):
            shutil.rmtree(commit_dir, ignore_errors=True)
    return {"splits_dropped": dropped}


# ---------------------------------------------------------------------------
# garbage collection
# ---------------------------------------------------------------------------


def garbage_collect(
    out_dir: str,
    grace_seconds: float = 0.0,
    now: float | None = None,
) -> dict:
    """Remove dangling data (garbage_collector.rs behavior) and repair
    interrupted janitor swaps:

    - a commit is LIVE if the metadata plane knows it: a checkpoint commit
      OR a lineage entry (delete/merge rewrites produce lineage-only commits
      like ``merge-a-b`` — they must never be swept);
    - RESTORE pass first: a live commit whose sink dir is missing (crash
      between a swap's trash-move and staged-move) is recovered from the
      staged copy (post-operation state) or, failing that, from trash;
    - then commit dirs known to NEITHER plane are removed after the grace
      period, and leftover ``.staging``/``.trash`` entries are swept.
    """
    now = time.time() if now is None else now
    merges_repaired = _repair_merges(out_dir)
    retention_repaired = _repair_retention(out_dir)
    store = CheckpointStore(out_dir)
    committed = {
        os.path.basename(p)[: -len(".json")]
        for p in glob.glob(os.path.join(store.dir, "*.json"))
        if not os.path.basename(p).startswith(".tmp-")
    }
    lineage_ids = {
        os.path.basename(p).split("=", 1)[1]
        for p in glob.glob(os.path.join(out_dir, "_lineage", "commit_id=*"))
    }
    live = committed | lineage_ids
    sinks = _sinks_dir(out_dir)

    # restore pass keys on LINEAGE presence only: retention legitimately
    # leaves checkpoint-committed commits with no data AND no lineage, and
    # must never be "repaired" from stale trash copies
    restored = []
    for commit in sorted(lineage_ids):
        commit_dir = os.path.join(sinks, f"commit={commit}")
        if os.path.isdir(commit_dir):
            continue
        staged_data = glob.glob(os.path.join(out_dir, ".staging", "*", f"commit={commit}"))
        if staged_data:
            os.makedirs(sinks, exist_ok=True)
            shutil.move(staged_data[0], commit_dir)
            staged_lin = glob.glob(
                os.path.join(out_dir, ".staging", "*-lineage", f"commit_id={commit}")
            )
            if staged_lin:
                lin_dir = os.path.join(out_dir, "_lineage", f"commit_id={commit}")
                shutil.rmtree(lin_dir, ignore_errors=True)
                shutil.move(staged_lin[0], lin_dir)
            restored.append(commit)
            continue
        trashed = [
            p
            for p in glob.glob(os.path.join(out_dir, ".trash", f"*-{commit}"))
            if "-lin-" not in os.path.basename(p)
        ]
        if trashed:
            os.makedirs(sinks, exist_ok=True)
            shutil.move(trashed[0], commit_dir)
            restored.append(commit)

    # lineage-adoption pass: a delete rewrite that crashed between removing
    # the old lineage entry and moving the staged one in leaves the commit
    # with live (post-delete) data but NO lineage — orphaning it from the
    # metadata plane (time/tag pruning, merge planning). The staged lineage
    # is always the forward state for live post-op data, so adopt it.
    lineage_adopted = []
    for staged_lin in glob.glob(
        os.path.join(out_dir, ".staging", "*-lineage", "commit_id=*")
    ):
        commit = os.path.basename(staged_lin).split("=", 1)[1]
        lin_dir = os.path.join(out_dir, "_lineage", f"commit_id={commit}")
        if os.path.isdir(lin_dir):
            continue
        if os.path.isdir(os.path.join(sinks, f"commit={commit}")):
            shutil.move(staged_lin, lin_dir)
            lineage_adopted.append(commit)
    # adopted commits are back on the metadata plane — never dangling
    live |= set(lineage_adopted)

    removed = []
    for commit_dir in _commit_dirs(out_dir):
        commit = os.path.basename(commit_dir).split("=", 1)[1]
        if commit in live:
            continue
        if now - os.path.getmtime(commit_dir) >= grace_seconds:
            shutil.rmtree(commit_dir, ignore_errors=True)
            shutil.rmtree(
                os.path.join(out_dir, "_lineage", f"commit_id={commit}"),
                ignore_errors=True,
            )
            removed.append(commit)
    swept = 0
    for root in (".staging", ".trash"):
        for p in glob.glob(os.path.join(out_dir, root, "*")):
            if now - os.path.getmtime(p) >= grace_seconds:
                shutil.rmtree(p, ignore_errors=True)
                swept += 1
    return {"dangling_commits_removed": removed, "restored": restored,
            "lineage_adopted": lineage_adopted,
            "merges_repaired": merges_repaired,
            "retention_repaired": retention_repaired, "tmp_swept": swept}


# ---------------------------------------------------------------------------
# generic time-partitioned index builder (one commit per time bucket)
# ---------------------------------------------------------------------------


def build_time_partitioned_index(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    sink_expr,
    ts_col: str = "ts",
    source_id: str = "index",
) -> None:
    """Materialize a DataFrame as a janitor-manageable index: one commit per
    DAY of ``ts_col`` (split time-alignment is what makes retention's
    split-granularity pruning exact), fan-out by ``sink_expr``, per-commit
    lineage, one checkpoint commit per day. Single partitioned write job.
    """
    # "d" prefix keeps partition-value type inference from turning the commit
    # id into a DATE on read
    day_expr = F.concat(
        F.lit("d"), F.date_format(F.col(ts_col).cast("timestamp"), "yyyy-MM-dd")
    )
    days = df.select(day_expr.alias("commit")).distinct().orderBy("commit").collect()
    day_ids = [r["commit"] for r in days]

    staged = df.withColumn("sink", sink_expr).withColumn("commit", day_expr)
    staged.write.mode("overwrite").partitionBy("commit", "sink").parquet(
        _sinks_dir(out_dir)
    )
    # lineage for ALL commits in one aggregate + one partitioned write
    written = read_index(spark, out_dir)
    cols = set(written.columns)
    aggs = [F.count(F.lit(1)).alias("num_docs")]
    if "text" in cols:
        aggs.append(F.sum(F.length("text")).alias("uncompressed_size_bytes"))
    aggs.append(F.min(ts_col).alias("time_range_start"))
    aggs.append(F.max(ts_col).alias("time_range_end"))
    (
        written.groupBy(F.col("commit").alias("commit_id"), "sink")
        .agg(*aggs)
        .withColumn("source_id", F.lit(source_id))
        .withColumn("create_timestamp", F.current_timestamp())
        .withColumn("delete_opstamp", F.lit(0))
        .withColumn("num_merge_ops", F.lit(0))
        .write.mode("overwrite")
        .partitionBy("commit_id")
        .parquet(os.path.join(out_dir, "_lineage"))
    )

    store = CheckpointStore(out_dir)
    for i, day in enumerate(day_ids):
        delta = {"time": (i, i + 1)}
        if not store.already_committed(source_id, delta):
            store.commit(source_id, delta, commit_id=day)


# ---------------------------------------------------------------------------
# merge policy + merge executor
# ---------------------------------------------------------------------------


def plan_merges(
    lineage_rows: list,
    merge_factor: int = 10,
    max_merge_factor: int = 12,
    split_num_docs_target: int = 10_000_000,
    policy=None,
) -> list[list[str]]:
    """Merge planning over per-commit lineage rows using a real merge policy
    (default: level-by-doc-count StableLogMergePolicy,
    stable_log_merge_policy.rs:181-297 — splits only merge WITHIN a log-scale
    doc-count level, so a 9M-doc split is never rewritten alongside 100-doc
    splits; that level isolation is what bounds write amplification at scale).
    A commit spans all its sinks; the rewrite preserves the per-sink fan-out.

    ``policy.operations`` is looped to a fixpoint, mirroring the reference
    MergePlanner's repeated wake-ups draining in-flight merge candidates
    (merge_planner.rs send_merge_ops). Rows may carry optional
    ``time_range_end`` (epoch secs or timestamp), ``create_timestamp`` and
    ``num_merge_ops`` columns; absent ones fall back to the policy's
    deterministic tiebreaks. Returns lists of commit ids to merge together.
    """
    from quickwit_spark.pipeline.merge_policy import SplitMeta, StableLogMergePolicy

    if policy is None:
        policy = StableLogMergePolicy(
            merge_factor=merge_factor,
            max_merge_factor=max_merge_factor,
            split_num_docs_target=split_num_docs_target,
        )

    def _epoch(v):
        if v is None:
            return None
        if hasattr(v, "timestamp"):
            return int(v.timestamp())
        return int(v)

    def get(r, key, default=None):
        try:
            return r[key] if key in r else default
        except TypeError:  # Row supports `in`; plain objects may not
            return getattr(r, key, default)

    now_secs = time.time()
    splits = []
    for r in lineage_rows:
        num_docs = int(r["num_docs"])
        num_merge_ops = int(get(r, "num_merge_ops", 0) or 0)
        created = _epoch(get(r, "create_timestamp"))
        splits.append(
            SplitMeta(
                split_id=str(r["commit_id"]),
                num_docs=num_docs,
                time_range_end=_epoch(get(r, "time_range_end")),
                # absent create_timestamp = freshly observed split
                create_timestamp=now_secs if created is None else created,
                num_merge_ops=num_merge_ops,
                maturation_period_secs=policy.split_maturity(num_docs, num_merge_ops),
            )
        )
    out: list[list[str]] = []
    while True:
        ops = policy.operations(splits, now_secs=now_secs)
        if not ops:
            break
        out.extend([s.split_id for s in op] for op in ops)
    return out


def merge_splits(
    spark: SparkSession,
    out_dir: str,
    merge_factor: int = 10,
    max_merge_factor: int = 12,
    split_num_docs_target: int = 10_000_000,
    tag_fields: tuple[str, ...] = (),
    source_id: str = "",
    policy=None,
) -> dict:
    """Merge executor (merge_executor.rs:191-219,273,344 behavior): each
    planned group of small commits is rewritten into ONE merged commit whose
    lineage is the union — time ranges merged min/max, doc counts summed,
    tags unioned (cap 64) — and the inputs are swapped out atomically.

    The row SET is exactly preserved (pytest-asserted); only the file layout
    compacts. Data identity means the checkpoint is untouched — merges are
    invisible to resume, like the reference's merge pipeline.
    """
    lineage = read_lineage(spark, out_dir)
    # a commit holding ANY non-Published split is not a merge candidate —
    # the reference merge planner only ever sees Published splits
    # (merge_planner.rs consumes NewSplits post-publish; marked splits are
    # awaiting deletion and must not be folded into a merged commit)
    hidden_commits = {
        sid.split("/", 1)[0]
        for sid, st in load_split_states(out_dir).items()
        if st.get("split_state") != "Published"
    }
    if hidden_commits:
        lineage = lineage.filter(~F.col("commit_id").isin(sorted(hidden_commits)))
    lcols = set(lineage.columns)
    per_commit_aggs = [F.sum("num_docs").alias("num_docs")]
    if "time_range_end" in lcols:
        per_commit_aggs.append(F.max("time_range_end").alias("time_range_end"))
    if "create_timestamp" in lcols:
        per_commit_aggs.append(F.min("create_timestamp").alias("create_timestamp"))
    if "num_merge_ops" in lcols:
        per_commit_aggs.append(F.max("num_merge_ops").alias("num_merge_ops"))
    per_commit = lineage.groupBy("commit_id").agg(*per_commit_aggs).collect()
    groups = plan_merges(
        per_commit, merge_factor, max_merge_factor, split_num_docs_target,
        policy=policy,
    )
    ops_by_commit = {
        # pre-upgrade lineage files may read back null num_merge_ops
        str(r["commit_id"]): int(r["num_merge_ops"] or 0) if "num_merge_ops" in lcols else 0
        for r in per_commit
    }
    sinks = _sinks_dir(out_dir)
    staging_root = os.path.join(out_dir, ".staging")
    trash_root = os.path.join(out_dir, ".trash")
    os.makedirs(staging_root, exist_ok=True)
    os.makedirs(trash_root, exist_ok=True)

    merged_ids = []
    for gi, group in enumerate(groups):
        merged_id = f"merge-{group[0]}-{group[-1]}"
        staged = os.path.join(staging_root, f"merge-{gi}-{merged_id}")
        src = spark.read.option("basePath", sinks).parquet(
            *[os.path.join(sinks, f"commit={c}") for c in group]
        )
        src.drop("commit").write.mode("overwrite").partitionBy("sink").parquet(staged)
        merged = spark.read.option("basePath", staged).parquet(staged)
        # const_write_amplification.rs split_num_merge_ops: the merged split
        # records one more merge op than the deepest input, so limit_merge
        # maturity (max_merge_ops) is enforceable across janitor cycles
        merged_ops = max((ops_by_commit.get(c, 0) for c in group), default=0) + 1
        build_lineage(
            merged, source_id=source_id, tag_fields=tag_fields,
            num_merge_ops=merged_ops,
        ).write.mode("overwrite").parquet(
            os.path.join(staging_root, f"merge-{gi}-lineage")
        )
        # write-ahead intent: a crash anywhere in the swap is repaired by
        # garbage_collect (roll forward if the merged copy made it live,
        # roll back from trash otherwise)
        manifest = {
            "merged_id": merged_id,
            "group": group,
            "staged_data": staged,
            "staged_lineage": os.path.join(staging_root, f"merge-{gi}-lineage"),
            "trash": {
                c: {
                    "data": os.path.join(trash_root, f"merge-{gi}-{c}"),
                    "lineage": os.path.join(trash_root, f"merge-{gi}-lin-{c}"),
                }
                for c in group
            },
        }
        os.makedirs(os.path.join(out_dir, "_merges"), exist_ok=True)
        manifest_path = os.path.join(out_dir, "_merges", f"{merged_id}.json")
        with open(manifest_path, "w") as fh:
            json.dump(manifest, fh)

        for c in group:
            shutil.move(
                os.path.join(sinks, f"commit={c}"), manifest["trash"][c]["data"]
            )
            lin = os.path.join(out_dir, "_lineage", f"commit_id={c}")
            if os.path.isdir(lin):
                shutil.move(lin, manifest["trash"][c]["lineage"])
        shutil.move(staged, os.path.join(sinks, f"commit={merged_id}"))
        shutil.move(
            manifest["staged_lineage"],
            os.path.join(out_dir, "_lineage", f"commit_id={merged_id}"),
        )
        os.remove(manifest_path)  # swap complete
        merged_ids.append(merged_id)
    return {"merged": merged_ids, "groups": groups}


def _repair_retention(out_dir: str) -> list[str]:
    """Roll forward retention lineage swaps interrupted mid-rename: a
    complete staged copy (``.staging/retention-lin-<commit>`` with _SUCCESS)
    is adopted as the commit's lineage — the old entry, if still present,
    goes to trash first (apply_retention removed the data leaves before
    staging, so the staged copy is always the correct forward state). A
    partial staged write (no _SUCCESS) is dropped. Idempotent."""
    sinks_trash = os.path.join(out_dir, ".trash")
    repaired = []
    prefix = "retention-lin-"
    for staged in sorted(glob.glob(os.path.join(out_dir, ".staging", prefix + "*"))):
        commit = os.path.basename(staged)[len(prefix):]
        if not os.path.exists(os.path.join(staged, "_SUCCESS")):
            shutil.rmtree(staged, ignore_errors=True)
            continue
        ldir = os.path.join(out_dir, "_lineage", f"commit_id={commit}")
        if os.path.isdir(ldir):
            os.makedirs(sinks_trash, exist_ok=True)
            shutil.move(ldir, os.path.join(sinks_trash, f"{prefix}{commit}-old"))
        shutil.move(staged, ldir)
        repaired.append(commit)
    return repaired


def _repair_merges(out_dir: str) -> list[str]:
    """Complete or roll back merges interrupted mid-swap (leftover intent
    manifests in ``_merges/``). Roll FORWARD when the merged data and lineage
    both made it live; otherwise roll BACK every original from trash and drop
    any partial merged state. Idempotent."""
    sinks = _sinks_dir(out_dir)
    repaired = []
    for mpath in sorted(glob.glob(os.path.join(out_dir, "_merges", "*.json"))):
        with open(mpath) as fh:
            m = json.load(fh)
        merged_dir = os.path.join(sinks, f"commit={m['merged_id']}")
        merged_lin = os.path.join(out_dir, "_lineage", f"commit_id={m['merged_id']}")
        if os.path.isdir(merged_dir) and os.path.isdir(merged_lin):
            # roll forward: finish trashing any original remnants
            for c, t in m["trash"].items():
                src = os.path.join(sinks, f"commit={c}")
                if os.path.isdir(src):
                    shutil.move(src, t["data"])
                lin = os.path.join(out_dir, "_lineage", f"commit_id={c}")
                if os.path.isdir(lin):
                    shutil.move(lin, t["lineage"])
        else:
            # roll back: originals return from trash; partial merged state and
            # staged copies are dropped
            shutil.rmtree(merged_dir, ignore_errors=True)
            shutil.rmtree(merged_lin, ignore_errors=True)
            for c, t in m["trash"].items():
                dst = os.path.join(sinks, f"commit={c}")
                if not os.path.isdir(dst) and os.path.isdir(t["data"]):
                    shutil.move(t["data"], dst)
                lin = os.path.join(out_dir, "_lineage", f"commit_id={c}")
                if not os.path.isdir(lin) and os.path.isdir(t["lineage"]):
                    shutil.move(t["lineage"], lin)
            shutil.rmtree(m["staged_data"], ignore_errors=True)
            shutil.rmtree(m["staged_lineage"], ignore_errors=True)
        os.remove(mpath)
        repaired.append(m["merged_id"])
    return repaired


# ---------------------------------------------------------------------------
# tag-based split pruning (query-time metadata pruning)
# ---------------------------------------------------------------------------


def prune_splits_by_tag(
    spark: SparkSession, out_dir: str, field: str, values: list[str]
) -> list[str]:
    """Commits that can possibly contain ``field ∈ values`` — decided from
    lineage tags ONLY (tag_pruning.rs:35,165 behavior): a commit is kept if
    any of its splits' ``tags_<field>`` intersects ``values``, or if the tag
    set overflowed (cap 64 → the split may contain anything). Commits without
    the tag column at all are kept (un-taggable ⇒ never prunable).

    Metadata-only: at 10^12 turns this is the difference between scanning
    every sink file and opening only the commits whose tag sets match.
    """
    lineage = read_lineage(spark, out_dir)
    col = f"tags_{field}"
    if col not in lineage.columns:
        return [r["commit_id"] for r in lineage.select("commit_id").distinct().collect()]
    overflowed = F.size(F.col(col)) >= MAX_VALUES_PER_TAG
    hit = F.arrays_overlap(F.col(col), F.array(*[F.lit(v) for v in values]))
    rows = (
        lineage.filter(F.coalesce(hit, F.lit(False)) | overflowed)
        .select("commit_id")
        .distinct()
        .collect()
    )
    return [r["commit_id"] for r in rows]


def prune_splits_by_time(
    spark: SparkSession, out_dir: str, start=None, end=None,
    end_inclusive: bool = False,
) -> list[str]:
    """Commits that can possibly contain rows with ``start <= ts < end`` —
    decided from lineage time ranges ONLY (the reference's PRIMARY split
    pruning: query AST → ts bounds → metastore list_relevant_splits,
    root.rs:1230-1245). A commit survives if any of its splits' range
    overlaps [start, end); commits lacking time metadata are kept.

    At 10^12 turns this is what turns a one-day query over a year of data
    into a 1/365 scan before any file is opened.
    """
    lineage = read_lineage(spark, out_dir)
    if "time_range_start" not in lineage.columns:
        return [r["commit_id"] for r in lineage.select("commit_id").distinct().collect()]
    cond = F.lit(True)
    if end is not None:
        end_lit = F.lit(end).cast("timestamp")
        cond = cond & (
            F.col("time_range_start") <= end_lit
            if end_inclusive
            else F.col("time_range_start") < end_lit
        )
    if start is not None:
        cond = cond & (F.col("time_range_end") >= F.lit(start).cast("timestamp"))
    # splits without metadata are never prunable
    cond = F.coalesce(cond, F.lit(True))
    rows = lineage.filter(cond).select("commit_id").distinct().collect()
    return [r["commit_id"] for r in rows]


def _tag_filter_col(filt, lineage: DataFrame):
    """Compile a query-derived :class:`TagFilter` into a Column over one
    lineage row (TagFilterAst::evaluate, tag_pruning.rs:216-226 — behavior).

    Leaf semantics against the ``tags_<field>`` arrays:
    - ``field!`` present ⇔ the split recorded tags for ``field`` (column
      exists and is non-null). A missing column means the index never tagged
      that field → ``¬field!`` is True → the split is kept.
    - ``field:value`` present ⇔ value ∈ the recorded set — OR the set
      overflowed the 64-value cap (then the split may contain anything, so a
      positive test must conservatively pass).
    """
    schema = {f.name: f.dataType for f in lineage.schema.fields}

    def leaf(tag: str, is_present: bool):
        if tag.endswith("!") and ":" not in tag:
            fcol = f"tags_{tag[:-1]}"
            present = (
                F.col(fcol).isNotNull() if fcol in schema else F.lit(False)
            )
            return present if is_present else ~present
        fname, value = tag.split(":", 1)
        fcol = f"tags_{fname}"
        if fcol not in schema:
            # untaggable split: a positive term test may pass, its negation
            # may too — evaluate to the conservative constant
            return F.lit(True)
        elem = schema[fcol].elementType
        contains = F.coalesce(
            F.array_contains(F.col(fcol), F.lit(value).cast(elem)), F.lit(False)
        )
        overflowed = F.size(F.col(fcol)) >= MAX_VALUES_PER_TAG
        if is_present:
            return contains | overflowed
        # a listed value is definitely in the set; absence is only definite
        # when the set did not overflow
        return ~contains | overflowed

    def compile_(node):
        if node.op == "tag":
            return leaf(node.tag, node.is_present)
        cols = [compile_(c) for c in node.children]
        out = cols[0]
        for c in cols[1:]:
            out = (out | c) if node.op == "or" else (out & c)
        return out

    return compile_(filt)


def prune_splits_by_tag_filter(
    spark: SparkSession, out_dir: str, filt
) -> list[str]:
    """Commits whose tag sets might satisfy a query-derived
    :class:`~quickwit_spark.operators.query.TagFilter` — the metadata-only
    second pruning axis next to :func:`prune_splits_by_time` (the reference
    root search runs both: root.rs list_relevant_splits passes the
    TagFilterAst to the metastore). ``filt=None`` (no tag constraint) keeps
    every commit."""
    return prune_splits(spark, out_dir, tag_filter=filt)


def prune_splits(
    spark: SparkSession,
    out_dir: str,
    start=None,
    end=None,
    end_inclusive: bool = False,
    tag_filter=None,
) -> list[str]:
    """Both metadata pruning axes — time range AND query-derived tag filter
    — in ONE lineage scan (the reference metastore's list_relevant_splits
    also evaluates both predicates in a single query). A split survives
    only if it can overlap [start, end) and its tag set can satisfy
    ``tag_filter``; either axis may be None (no constraint)."""
    lineage = read_lineage(spark, out_dir)
    cond = F.lit(True)
    if "time_range_start" in lineage.columns and (start is not None or end is not None):
        tcond = F.lit(True)
        if end is not None:
            end_lit = F.lit(end).cast("timestamp")
            tcond = tcond & (
                F.col("time_range_start") <= end_lit
                if end_inclusive
                else F.col("time_range_start") < end_lit
            )
        if start is not None:
            tcond = tcond & (F.col("time_range_end") >= F.lit(start).cast("timestamp"))
        cond = cond & F.coalesce(tcond, F.lit(True))
    if tag_filter is not None:
        cond = cond & _tag_filter_col(tag_filter, lineage)
    lineage = _drop_non_searchable(lineage, out_dir)
    rows = lineage.filter(cond).select("commit_id").distinct().collect()
    return [r["commit_id"] for r in rows]


# ---------------------------------------------------------------------------
# split states: list / mark-for-deletion / deferred delete
# ---------------------------------------------------------------------------
#
# The metastore Split surface (quickwit-metastore file_backed_index/mod.rs:
# split_query_predicate :1229, mark_splits_for_deletion :338; REST params in
# quickwit-serve index_api/split_resource.rs:38-67). A "split" here is one
# lineage row — grain (commit_id, sink[, partition_bucket]) — and the state
# overlay is a tiny driver-side JSON (the metastore is metadata-plane in the
# reference too). Splits default to Published; marking flips them out of
# every search/prune path immediately, and the janitor physically deletes
# them after a grace period (garbage_collector.rs deletion flow).

SPLIT_STATES = ("Staged", "Published", "MarkedForDeletion")


def split_id_of(commit_id, sink, partition_bucket=None) -> str:
    sid = f"{commit_id}/{sink}"
    if partition_bucket is not None:
        sid += f"/{partition_bucket}"
    return sid


def _split_states_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_split_states.json")


def load_split_states(out_dir: str) -> dict:
    """Overlay of non-default split states: {split_id: {split_state,
    update_timestamp}}. Splits absent from the overlay are Published."""
    path = _split_states_path(out_dir)
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        return json.load(fh)


def _save_split_states(out_dir: str, states: dict) -> None:
    path = _split_states_path(out_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(states, fh, sort_keys=True)
    os.replace(tmp, path)


def _lineage_split_id_col(lineage: DataFrame):
    parts = [F.col("commit_id"), F.lit("/"), F.col("sink")]
    if "partition_bucket" in lineage.columns:
        parts += [
            F.when(
                F.col("partition_bucket").isNotNull(),
                F.concat(F.lit("/"), F.col("partition_bucket").cast("string")),
            ).otherwise(F.lit(""))
        ]
    return F.concat(*parts)


def _drop_non_searchable(lineage: DataFrame, out_dir: str) -> DataFrame:
    """Lineage rows of splits a search may touch — Published only, exactly
    like the reference root search's ListSplitsQuery (root.rs asks for
    SplitState::Published). Metadata-only."""
    hidden = [
        sid
        for sid, st in load_split_states(out_dir).items()
        if st.get("split_state") != "Published"
    ]
    if not hidden:
        return lineage
    return lineage.filter(~_lineage_split_id_col(lineage).isin(hidden))


def exclude_marked_splits(df: DataFrame, out_dir: str) -> DataFrame:
    """Row-plane guard for partially-hidden commits: filter out rows of any
    non-Published split. The predicate is on partition columns
    (commit, sink[, partition_bucket]) so Catalyst partition pruning skips
    those directories entirely — no file of a marked split is opened."""
    hidden = {
        sid: st
        for sid, st in load_split_states(out_dir).items()
        if st.get("split_state") != "Published"
    }
    if not hidden:
        return df
    cond = F.lit(False)
    for sid in hidden:
        bits = sid.split("/")
        c = (F.col("commit") == bits[0]) & (F.col("sink") == bits[1])
        if len(bits) > 2 and "partition_bucket" in df.columns:
            c = c & (F.col("partition_bucket").cast("string") == bits[2])
        cond = cond | c
    return df.filter(~cond)


def list_splits(
    spark: SparkSession,
    out_dir: str,
    offset: int | None = None,
    limit: int | None = None,
    split_states: list[str] | None = None,
    start_timestamp: int | None = None,
    end_timestamp: int | None = None,
    end_create_timestamp: int | None = None,
) -> list[dict]:
    """GET /indexes/{index}/splits — ListSplitsQueryParams semantics
    (split_resource.rs:38-67 → split_query_predicate mod.rs:1229-1276):

    - ``split_states``: exact state membership (unknown state → ValueError,
      the serde enum 400);
    - ``start_timestamp``/``end_timestamp`` (epoch seconds): overlap of the
      query's ``[start, end)`` with the split's INCLUSIVE time range; splits
      without a time range are never filtered by time (the reference's
      ``if let Some(range)``);
    - ``end_create_timestamp``: ``create_timestamp < v``;
    - ``offset``/``limit`` paginate over a stable split_id order.

    One lineage scan; the result is driver-sized (one dict per split), same
    as the reference metastore's Vec<Split>."""
    if split_states:
        bad = set(split_states) - set(SPLIT_STATES)
        if bad:
            raise ValueError(f"unknown split state(s): {sorted(bad)}")
    lineage = read_lineage(spark, out_dir)
    cols = set(lineage.columns)
    sel = [
        _lineage_split_id_col(lineage).alias("split_id"),
        F.col("num_docs"),
        F.col("delete_opstamp"),
        F.col("source_id"),
        F.unix_timestamp("create_timestamp").alias("create_ts"),
    ]
    sel.append(
        F.col("uncompressed_size_bytes")
        if "uncompressed_size_bytes" in cols
        else F.lit(None).cast("long").alias("uncompressed_size_bytes")
    )
    sel.append(
        F.coalesce(F.col("num_merge_ops"), F.lit(0)).alias("num_merge_ops")
        if "num_merge_ops" in cols
        else F.lit(0).alias("num_merge_ops")
    )
    if "time_range_start" in cols:
        sel.append(F.unix_timestamp("time_range_start").alias("ts_start"))
        sel.append(F.unix_timestamp("time_range_end").alias("ts_end"))
    else:
        sel.append(F.lit(None).cast("long").alias("ts_start"))
        sel.append(F.lit(None).cast("long").alias("ts_end"))
    tag_cols = sorted(c for c in cols if c.startswith("tags_"))
    states = load_split_states(out_dir)
    rows = lineage.select(*sel, *tag_cols).collect()

    splits = []
    for r in rows:
        sid = r["split_id"]
        overlay = states.get(sid, {})
        state = overlay.get("split_state", "Published")
        create_ts = int(r["create_ts"]) if r["create_ts"] is not None else 0
        update_ts = int(overlay.get("update_timestamp", create_ts))
        if split_states and state not in split_states:
            continue
        if r["ts_start"] is not None:
            if end_timestamp is not None and not r["ts_start"] < end_timestamp:
                continue
            if start_timestamp is not None and not r["ts_end"] >= start_timestamp:
                continue
        if end_create_timestamp is not None and not create_ts < end_create_timestamp:
            continue
        tags = sorted(
            f"{c[len('tags_'):]}:{v}"
            for c in tag_cols
            if r[c] is not None
            for v in r[c]
        )
        splits.append(
            {
                "split_state": state,
                "update_timestamp": update_ts,
                "publish_timestamp": create_ts if state != "Staged" else None,
                "version": "0.9",
                "split_metadata": {
                    "split_id": sid,
                    "source_id": r["source_id"],
                    "num_docs": int(r["num_docs"]),
                    "uncompressed_docs_size_in_bytes": int(
                        r["uncompressed_size_bytes"] or 0
                    ),
                    "time_range": (
                        {"start": int(r["ts_start"]), "end": int(r["ts_end"])}
                        if r["ts_start"] is not None
                        else None
                    ),
                    "create_timestamp": create_ts,
                    "tags": tags,
                    "delete_opstamp": int(r["delete_opstamp"] or 0),
                    "num_merge_ops": int(r["num_merge_ops"] or 0),
                },
            }
        )
    splits.sort(key=lambda s: s["split_metadata"]["split_id"])
    if offset:
        splits = splits[offset:]
    if limit is not None:
        splits = splits[:limit]
    return splits


def mark_splits_for_deletion(
    spark: SparkSession,
    out_dir: str,
    split_ids: list[str],
    now: float | None = None,
) -> dict:
    """PUT /indexes/{index}/splits/mark-for-deletion —
    file_backed_index mark_splits_for_deletion (mod.rs:338-378) with the
    REST caller's arguments: any current state is deletable, already-marked
    splits are silently skipped, and unknown split ids are reported but NOT
    an error (``return_error_on_splits_not_found=false``)."""
    now = time.time() if now is None else now
    lineage = read_lineage(spark, out_dir)
    known = {
        r["sid"]
        for r in lineage.select(
            _lineage_split_id_col(lineage).alias("sid")
        ).collect()
    }
    states = load_split_states(out_dir)
    not_found, mutated = [], False
    for sid in split_ids:
        if sid not in known:
            not_found.append(sid)
            continue
        if states.get(sid, {}).get("split_state") == "MarkedForDeletion":
            continue
        states[sid] = {
            "split_state": "MarkedForDeletion",
            "update_timestamp": int(now),
        }
        mutated = True
    if mutated:
        _save_split_states(out_dir, states)
    return {"mutation_occurred": mutated, "split_not_found_ids": not_found}


def delete_marked_splits(
    spark: SparkSession,
    out_dir: str,
    grace_seconds: float = 0.0,
    now: float | None = None,
) -> dict:
    """Physically remove MarkedForDeletion splits older than the grace
    period (garbage_collector.rs delete flow: marked splits live on as
    metadata until the janitor's deletion pass). Split-granularity: only
    the split's own leaf directory is deleted; lineage for the commit is
    rewritten without the removed rows (same staged-swap discipline as
    :func:`apply_retention`, repaired by ``_repair_retention`` on crash)."""
    now = time.time() if now is None else now
    states = load_split_states(out_dir)
    due = sorted(
        sid
        for sid, st in states.items()
        if st.get("split_state") == "MarkedForDeletion"
        and now - st.get("update_timestamp", 0) >= grace_seconds
    )
    if not due:
        return {"deleted_splits": [], "removed_commits": []}

    sinks = _sinks_dir(out_dir)
    staging_root = os.path.join(out_dir, ".staging")
    trash_root = os.path.join(out_dir, ".trash")
    os.makedirs(staging_root, exist_ok=True)
    os.makedirs(trash_root, exist_ok=True)
    by_commit: dict[str, list[list[str]]] = {}
    for sid in due:
        bits = sid.split("/")
        by_commit.setdefault(bits[0], []).append(bits)

    removed_commits = []
    for commit, keys in sorted(by_commit.items()):
        ldir = os.path.join(out_dir, "_lineage", f"commit_id={commit}")
        for bits in keys:
            leaf = os.path.join(sinks, f"commit={commit}", f"sink={bits[1]}")
            if len(bits) > 2:
                leaf = os.path.join(leaf, f"partition_bucket={bits[2]}")
            shutil.rmtree(leaf, ignore_errors=True)
        if os.path.isdir(ldir):
            cur = spark.read.parquet(ldir)
            gone = F.lit(False)
            for bits in keys:
                c = F.col("sink") == bits[1]
                if len(bits) > 2 and "partition_bucket" in cur.columns:
                    c = c & (F.col("partition_bucket").cast("string") == bits[2])
                gone = gone | c
            kept = cur.filter(~gone)
            rows = kept.collect()
            if rows:
                staged = os.path.join(staging_root, f"retention-lin-{commit}")
                spark.createDataFrame(rows, kept.schema).write.mode(
                    "overwrite"
                ).parquet(staged)
                shutil.move(ldir, os.path.join(trash_root, f"retention-lin-{commit}-old"))
                shutil.move(staged, ldir)
            else:
                shutil.rmtree(ldir)
        commit_dir = os.path.join(sinks, f"commit={commit}")
        if not glob.glob(os.path.join(commit_dir, "sink=*")):
            shutil.rmtree(commit_dir, ignore_errors=True)
            removed_commits.append(commit)

    for sid in due:
        states.pop(sid, None)
    _save_split_states(out_dir, states)
    return {"deleted_splits": due, "removed_commits": removed_commits}


def janitor_cycle(
    spark: SparkSession,
    out_dir: str,
    retention_cutoff=None,
    merge_factor: int = 10,
    max_merge_factor: int = 12,
    split_num_docs_target: int = 10_000_000,
    gc_grace_seconds: float = 0.0,
    tag_fields: tuple[str, ...] = (),
    merge_policy_config: dict | None = None,
) -> dict:
    """One janitor service cycle — the reference janitor's periodic loops
    composed in their order (quickwit-janitor: delete-task execution is
    already synchronous here; then retention policy, merge policy/executor,
    garbage collection). Idempotent: each stage repairs its own interrupted
    state before acting, so running a cycle after a crash converges.

    ``merge_policy_config`` is the index config's ``merge_policy`` dict
    (merge_policy_config.rs enum: no_merge / limit_merge / stable_log);
    absent → stable_log built from the explicit factor kwargs.

    Returns a per-stage summary (docs dropped by retention, commits merged,
    dangling paths removed).
    """
    policy = None
    if merge_policy_config is not None:
        from quickwit_spark.pipeline.merge_policy import merge_policy_from_config

        policy = merge_policy_from_config(
            merge_policy_config, split_num_docs_target=split_num_docs_target
        )
    summary: dict = {}
    if retention_cutoff is not None:
        summary["retention"] = apply_retention(spark, out_dir, retention_cutoff)
    summary["marked_split_deletion"] = delete_marked_splits(
        spark, out_dir, grace_seconds=gc_grace_seconds
    )
    summary["merge"] = merge_splits(
        spark, out_dir,
        merge_factor=merge_factor,
        max_merge_factor=max_merge_factor,
        split_num_docs_target=split_num_docs_target,
        tag_fields=tag_fields,
        policy=policy,
    )
    summary["gc"] = garbage_collect(out_dir, grace_seconds=gc_grace_seconds)
    return summary
