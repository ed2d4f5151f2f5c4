"""End-to-end pipeline runner: parse → enrich → route → sinks → aggregates,
with per-partition lineage + metrics and checkpointed, resumable commits.

Spark re-expression of the reference's actor chain
(indexing_pipeline.rs:60-66: Source → DocProcessor → Indexer → … →
Publisher): one declarative DataFrame DAG per chunk; the "publish" step
commits the checkpoint delta after sink writes land, and replayed chunks are
skipped via the delta-compatibility check, so a killed run resumes exactly.

Scale design:
- Chunks = contiguous ``turn_idx`` ranges per source partition (stand-in for
  WAL offsets / Kafka offsets); at 10^12 turns each chunk is a bounded batch
  (the reference's commit_timeout/num-docs-target cadence).
- One shuffle per chunk (the salted repartition before the partitioned
  write); aggregates reuse the same scan via cache.
- Sinks are written ``partitionBy(sink)`` — the fan-out is a write-side
  partitioning, not N separate jobs.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quickwit_spark.pipeline.checkpoint import CheckpointStore
from quickwit_spark.pipeline.stages import (
    enrich_stage,
    fingerprint_col,
    parse_stage,
    route_stage,
    salted_repartition,
)

@dataclass
class PipelineConfig:
    partition_expr: str = "tenant_id"
    max_num_partitions: int = 200
    salt_buckets: int = 16
    shuffle_partitions: int | None = None
    tag_fields: tuple[str, ...] = ("level", "tier")
    agg_interval: str = "1d"
    source_id: str = "transcripts"
    # True = physically partition sink dirs by partition_bucket too
    # (indexer.rs one-split-builder-per-partition; enables per-bucket file
    # pruning at 10^12 turns). Default False: at small scale sink×200 bucket
    # dirs just mean tiny files — partition_bucket stays a column either way.
    partition_bucket_layout: bool = False
    extra: dict = field(default_factory=dict)


def build_dag(
    transcripts: DataFrame, tenants: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """The full parse→enrich→route plan (lazy; no action)."""
    parsed = parse_stage(transcripts)
    enriched = enrich_stage(parsed, tenants)
    routed = route_stage(enriched, cfg.partition_expr, cfg.max_num_partitions)
    return routed.withColumn("fingerprint", fingerprint_col("msg"))


def run_chunk(
    spark: SparkSession,
    transcripts: DataFrame,
    tenants: DataFrame,
    out_dir: str,
    cfg: PipelineConfig,
    chunk_id: str,
    delta: dict[str, tuple[int | None, int]],
) -> dict | None:
    """Process one source chunk end-to-end and publish it.

    ``delta``: source partition → (from_turn_exclusive, to_turn_inclusive];
    returns the metrics dict, or None if the chunk was already committed
    (idempotent replay)."""
    store = CheckpointStore(out_dir)
    if store.already_committed(cfg.source_id, delta):
        return None
    store.check_compatibility(cfg.source_id, delta)

    commit_id = chunk_id or uuid.uuid4().hex
    t0 = time.time()

    routed = build_dag(transcripts, tenants, cfg)
    n_shuffle = cfg.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )

    # ONE pass over the input: the valid write, quarantine write and outcome
    # counters all consume the persisted frame (spill-friendly) instead of
    # re-running the regex-heavy parse + broadcast join three times
    from pyspark import StorageLevel

    routed = routed.persist(StorageLevel.MEMORY_AND_DISK)
    valid = routed.filter(F.col("_error_category") == "valid")
    quarantine = routed.filter(F.col("_error_category") != "valid")

    # ---- sink fan-out write (one shuffle; stable within-file order) -------
    sink_dir = os.path.join(out_dir, "sinks")
    out_cols = [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
        "level", "tenant_id", "latency_ms", "msg", "_dynamic",
        "tenant_name", "tier", "region",
        "partition_id", "partition_bucket", "fingerprint",
    ]
    # per-commit writes use mode("overwrite") on the commit-scoped directory:
    # a crash after the sink job commits but before store.commit() leaves an
    # uncheckpointed directory that the retry REPLACES (not appends), keeping
    # the publish exactly-once (publisher.rs behavior: splits are staged, the
    # metastore publish is the commit point).
    layout = ["sink", "partition_bucket"] if cfg.partition_bucket_layout else ["sink"]
    (
        salted_repartition(valid.select("sink", *out_cols), n_shuffle, cfg.salt_buckets)
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode("overwrite")
        .partitionBy(*layout)
        .parquet(os.path.join(sink_dir, f"commit={commit_id}"))
    )
    (
        quarantine.select("sink", "conv_id", "turn_idx", "text", "_error", "_error_category")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "quarantine", f"commit={commit_id}"))
    )

    # outcome counters (doc_processor.rs counters) — cached-scan, no recompute
    outcome = {
        r["_error_category"]: r["n"]
        for r in routed.groupBy("_error_category").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    routed.unpersist()

    # ---- per-sink lineage (SplitMetadata analog) + metrics -----------------
    # an ALL-INVALID chunk writes an empty sink dir (only _SUCCESS): reading
    # it back would fail schema inference and wedge the pipeline on retry —
    # it has no lineage/metrics to record, but MUST still publish its
    # checkpoint delta so the run moves past the poison chunk
    if outcome.get("valid", 0) > 0:
        from quickwit_spark.pipeline.janitor import build_lineage

        written = spark.read.parquet(os.path.join(sink_dir, f"commit={commit_id}"))
        lineage = build_lineage(written, source_id=cfg.source_id, tag_fields=cfg.tag_fields)
        # commit_id comes back as a partition column on read; per-commit overwrite
        # makes the lineage write idempotent under crash-retry.
        lineage.write.mode("overwrite").parquet(
            os.path.join(out_dir, "_lineage", f"commit_id={commit_id}")
        )

        # per-sink aggregates: date_histogram + terms + cardinality in ONE pass
        aggs = (
            written.groupBy(
                "sink",
                F.window("ts", "1 day").start.alias("bucket_start"),
            )
            .agg(
                F.count(F.lit(1)).alias("doc_count"),
                F.approx_count_distinct("tenant_id").alias("tenant_cardinality_approx"),
                F.sum(F.when(F.col("level") == "ERROR", 1).otherwise(0)).alias("error_count"),
                F.avg("latency_ms").alias("avg_latency_ms"),
            )
        )
        aggs.write.mode("overwrite").parquet(
            os.path.join(out_dir, "_metrics", f"commit_id={commit_id}")
        )

    # ---- publish: checkpoint delta commits only after data is durable -----
    store.commit(cfg.source_id, delta, commit_id=commit_id)

    elapsed = time.time() - t0
    n_valid = int(outcome.get("valid", 0))
    metrics = {
        "commit_id": commit_id,
        "outcome_counts": outcome,
        "num_valid": n_valid,
        "elapsed_sec": elapsed,
        "turns_per_sec": n_valid / elapsed if elapsed > 0 else 0.0,
    }
    with open(os.path.join(out_dir, f"_commit_{commit_id}.json"), "w") as fh:
        json.dump(metrics, fh)
    return metrics


def run_pipeline(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    cfg: PipelineConfig | None = None,
    num_chunks: int = 1,
) -> list[dict]:
    """Batch-incremental run over the transcripts table in ``num_chunks``
    turn-range chunks (resume-safe: committed chunks are skipped)."""
    cfg = cfg or PipelineConfig()
    os.makedirs(out_dir, exist_ok=True)
    transcripts = spark.read.parquet(os.path.join(input_dir, "transcripts.parquet"))
    tenants = spark.read.parquet(os.path.join(input_dir, "tenants.parquet"))

    max_turn = transcripts.agg(F.max("turn_idx")).collect()[0][0]
    if max_turn is None:
        return []  # empty table: nothing to chunk, nothing to commit
    bounds = [
        int((max_turn + 1) * i / num_chunks) for i in range(num_chunks + 1)
    ]
    results = []
    first_chunk = True
    for i in range(num_chunks):
        lo, hi = bounds[i], bounds[i + 1]
        if hi <= lo:
            continue  # degenerate chunking (num_chunks > turns): empty range
        chunk_df = transcripts.filter(
            (F.col("turn_idx") >= lo) & (F.col("turn_idx") < hi)
        )
        # Beginning ('') for the first NON-EMPTY chunk only: `lo > 0` alone
        # conflated "resumes after position 0" with Beginning, which reads
        # as an overlap once position 0 is committed
        delta = {"turn_range": (None if first_chunk else lo, hi)}
        first_chunk = False
        m = run_chunk(
            spark, chunk_df, tenants, out_dir, cfg,
            chunk_id=f"chunk{i:04d}", delta=delta,
        )
        if m is not None:
            results.append(m)
    return results


def read_sinks(spark: SparkSession, out_dir: str) -> DataFrame:
    """All routed rows across commits, with sink recovered from the path."""
    return spark.read.option("basePath", os.path.join(out_dir, "sinks")).parquet(
        os.path.join(out_dir, "sinks", "commit=*")
    )
