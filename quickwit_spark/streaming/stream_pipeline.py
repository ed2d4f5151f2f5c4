"""Structured Streaming variant of the parse→enrich→route→aggregate pipeline.

Mirrors the reference's continuous micro-batching model (SURVEY §2.12):
Quickwit has no watermark semantics — docs with any timestamp are accepted
and become searchable at the next commit — so the streaming pipeline is a
`foreachBatch` loop with the same stage functions as the batch runner, plus
Spark's own offset checkpointing (the analog of the reference's
`commit_timeout_secs` micro-batch cadence and WAL offsets). For a bounded
backfill, `Trigger.AvailableNow` drains the source then stops — that is the
"local-ingest" CLI mode.

Kafka would plug in by swapping ``readStream.format("parquet")`` for
``format("kafka")`` + a `from_json`/text parse — the stage functions are
source-agnostic DataFrame→DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quickwit_spark.pipeline.runner import PipelineConfig, build_dag

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def stream_pipeline(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    cfg: PipelineConfig | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming pipeline; returns the StreamingQuery.

    - source: parquet file stream over ``input_dir`` (new files = new data,
      the file-source analog of the reference's doc_file_reader byte-offset
      checkpoints; Spark's checkpointLocation persists consumed-file offsets
      → exactly-once with the idempotent per-batch sink writes below);
    - each micro-batch runs the identical batch DAG and appends to the
      per-sink layout used by the batch runner.
    """
    cfg = cfg or PipelineConfig()
    tenants = spark.read.parquet(os.path.join(input_dir, "tenants.parquet"))

    reader = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(os.path.join(input_dir, "transcripts.parquet"))

    sink_dir = os.path.join(out_dir, "sinks_stream")
    quarantine_dir = os.path.join(out_dir, "quarantine_stream")
    metrics_dir = os.path.join(out_dir, "_metrics_stream")

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # every write targets an EPOCH-SCOPED directory with overwrite: a
        # re-executed epoch after a failure REPLACES its own output instead
        # of appending duplicates — the idempotence that makes foreachBatch
        # + Spark's offset checkpoint exactly-once (same invariant as the
        # batch runner's per-commit overwrite). One pass: the three
        # consumers share the persisted frame instead of re-running the
        # parse + broadcast join per output.
        from pyspark import StorageLevel

        routed = build_dag(batch_df, tenants, cfg).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        valid = routed.filter(F.col("_error_category") == "valid")
        (
            valid.drop("_error", "_error_category")
            .write.mode("overwrite")
            .partitionBy("sink")
            .parquet(os.path.join(sink_dir, f"epoch={epoch_id}"))
        )
        (
            routed.filter(F.col("_error_category") != "valid")
            .select("conv_id", "turn_idx", "text", "_error", "_error_category")
            .write.mode("overwrite")
            .parquet(os.path.join(quarantine_dir, f"epoch={epoch_id}"))
        )
        (
            valid.groupBy(
                "sink", F.window(F.col("ts").cast("timestamp"), "1 day").start.alias("bucket")
            )
            .agg(
                F.count(F.lit(1)).alias("doc_count"),
                F.approx_count_distinct("tenant_id").alias("tenant_cardinality_approx"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(metrics_dir, f"epoch={epoch_id}"))
        )
        routed.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_stream_aggregate(
    spark: SparkSession,
    input_dir: str,
    window: str = "1 day",
    watermark: str = "1 day",
):
    """Watermarked windowed aggregate as a first-class streaming operator
    (beyond the reference, which has no ingest-time windows): per (role,
    window) counts with late-data tolerance ``watermark``."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .format("parquet")
        .load(os.path.join(input_dir, "transcripts.parquet"))
    )
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "role")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .select(
            F.col("window.start").alias("bucket_start"),
            "role",
            "doc_count",
        )
    )
