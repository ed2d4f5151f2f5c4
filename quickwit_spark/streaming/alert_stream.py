"""Streaming alerting: the percolator (operators/percolate.py) run
continuously over an ingest stream by ``foreachBatch`` — every micro-batch
is matched against the stored alert-query catalog and the (doc, query_id)
matches land in an epoch-scoped alert log.

Layout and replay discipline are the package's standard exactly-once
protocol (dedup_stream.py / rollup_stream.py / stream_pipeline.py):

    <out>/alerts/epoch=N      (overwrite per epoch)

so a replayed micro-batch replaces its own matches instead of duplicating
them, and ``read_alerts(before_epoch=...)`` never lists a crashed
attempt's half-written epoch — the streaming analog of the reference's
commit-then-checkpoint publish (`qw/quickwit-metastore` checkpoint
discipline, behavior only).

Scale shape: the per-batch cost is the percolator's — ONE zero-shuffle
projection over the batch regardless of catalog size; only matches are
written. The alert log grows with match volume, not ingest volume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from quickwit_spark.operators.percolate import percolate
from quickwit_spark.operators.query import QueryCompiler
from quickwit_spark.streaming.dedup_stream import _read_index


def read_alerts(
    spark: SparkSession,
    out_dir: str,
    id_schema: str = "event_id long",
    before_epoch: int | None = None,
) -> DataFrame:
    """Accumulated alert matches (id cols + query_id). ``before_epoch``
    excludes a possibly-in-flight epoch from a reader running next to a
    live stream."""
    cols = [s.strip().split()[0] for s in id_schema.split(",")] + ["query_id"]
    return _read_index(
        spark,
        os.path.join(out_dir, "alerts"),
        id_schema + ", query_id string",
        cols,
        before_epoch,
    )


def stream_alerts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    stored: dict[str, str],
    compiler: QueryCompiler,
    id_cols: list[str],
    schema: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start continuous percolation; returns the StreamingQuery.

    Source: parquet file stream over ``input_dir``; Spark's
    checkpointLocation persists source offsets, the epoch-overwrite alert
    log makes replays idempotent — together exactly-once alert delivery."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_dir)
    alerts_dir = os.path.join(out_dir, "alerts")

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        matches = percolate(batch_df, stored, compiler, id_cols=id_cols)
        matches.write.mode("overwrite").parquet(
            os.path.join(alerts_dir, f"epoch={int(epoch_id)}")
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", os.path.join(out_dir, "_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
