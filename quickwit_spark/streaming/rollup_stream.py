"""Streaming rollup maintenance: the materialized-aggregate plane of
operators/rollup.py kept continuously up to date by a Structured Streaming
``foreachBatch`` loop.

Each micro-batch aggregates ONLY ITS OWN rows to mergeable partials
(cnt/sum/sumsq/min/max — one map-side-combined groupBy over the batch) and
writes them to an EPOCH-SCOPED directory with overwrite:

    <out>/rollup/epoch=N

so a replayed epoch replaces its own partials instead of double-counting —
the same exactly-once layout as dedup_stream.py / stream_pipeline.py, and
the streaming analog of the reference's commit-then-checkpoint publish
discipline. Readers merge the partials (associativity makes the merge
exact, proven by the batch operator's oracle), so dashboards see every
committed batch without ever re-reading raw data.

Compaction folds old epoch deltas into generational bases exactly like the
dedup signature index — but rollup compaction RE-AGGREGATES while folding
(rollup_merge), so the base holds one row per (keys, bucket) no matter how
many epochs it absorbed. A year of minutely micro-batches stays
|keys|×|buckets| rows, not 525k epoch files.

Scale shape at 10^12 turns/day: per-batch work is one partial-agg shuffle
whose output is key-cardinality-sized; the read path scans partials only.
The raw table is touched once per row, ever.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from quickwit_spark.operators.rollup import (
    PARTIAL_COLS,
    rollup_build,
    rollup_merge,
)
from quickwit_spark.streaming.dedup_stream import (
    _base_state,
    _epoch_dirs,
    _read_index,
)


def read_rollup(
    spark: SparkSession,
    rollup_dir: str,
    keys: list[str],
    key_schema: str,
    before_epoch: int | None = None,
    merged: bool = True,
) -> DataFrame:
    """The accumulated rollup — newest compacted base + epoch deltas
    before ``before_epoch`` (driver-side dir selection: a crashed
    attempt's half-written epoch dir is never scanned). ``merged=True``
    re-merges across epochs to one row per (keys, bucket)."""
    schema = (
        f"{key_schema}, bucket timestamp, cnt long, sum_v double,"
        " sumsq_v double, min_v double, max_v double"
    )
    df = _read_index(
        spark,
        rollup_dir,
        schema,
        keys + ["bucket", *PARTIAL_COLS],
        before_epoch,
    )
    return rollup_merge(df, keys, grain=None) if merged else df


def compact_rollup(
    spark: SparkSession,
    rollup_dir: str,
    keys: list[str],
    upto_epoch: int,
    num_files: int = 8,
) -> dict:
    """Fold epoch deltas below ``upto_epoch`` (plus the previous base)
    into a new base generation, RE-AGGREGATED to one row per (keys,
    bucket). Same manifest-last commit protocol as the dedup index: the
    base parquet lands first, the ``base_vN.manifest.json`` rename is the
    commit point, cleanup is best-effort and idempotent. ``upto_epoch``
    must not exceed the stream's last committed epoch + 1."""
    ver, base_upto, base_dir = _base_state(rollup_dir)
    for e, d in _epoch_dirs(rollup_dir).items():
        if e < base_upto:
            shutil.rmtree(d, ignore_errors=True)
    fold = [
        d
        for e, d in sorted(_epoch_dirs(rollup_dir).items())
        if base_upto <= e < upto_epoch
    ]
    if not fold:
        return {"version": ver, "upto_epoch": base_upto, "folded": 0}
    paths = ([base_dir] if base_dir else []) + fold
    merged = rollup_merge(spark.read.parquet(*paths), keys, grain=None)
    new_dir = os.path.join(rollup_dir, f"base_v{ver + 1}")
    shutil.rmtree(new_dir, ignore_errors=True)
    merged.coalesce(num_files).write.mode("overwrite").parquet(new_dir)
    manifest = os.path.join(rollup_dir, f"base_v{ver + 1}.manifest.json")
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"upto_epoch": int(upto_epoch)}, f)
    os.replace(tmp, manifest)  # <- commit point
    for d in fold:
        shutil.rmtree(d, ignore_errors=True)
    if base_dir:
        shutil.rmtree(base_dir, ignore_errors=True)
        try:
            os.remove(os.path.join(rollup_dir, f"base_v{ver}.manifest.json"))
        except OSError:
            pass
    return {
        "version": ver + 1,
        "upto_epoch": int(upto_epoch),
        "folded": len(fold),
    }


def stream_rollup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    keys: list[str],
    ts_col: str,
    value_col: str,
    grain: str = "hour",
    schema: str = "conv_id string, turn_idx int, role string, text string,"
    " tool string, ts timestamp",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming rollup maintenance; returns the StreamingQuery.

    Source: parquet file stream over ``input_dir``. Each micro-batch adds
    an epoch-scoped partial-aggregate delta under <out>/rollup; Spark's
    checkpointLocation persists source offsets, and the epoch-overwrite
    layout makes replays idempotent — together exactly-once."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_dir)
    rollup_dir = os.path.join(out_dir, "rollup")

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partials = rollup_build(batch_df, keys, ts_col, value_col, grain)
        partials.write.mode("overwrite").parquet(
            os.path.join(rollup_dir, f"epoch={epoch_id}")
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", os.path.join(out_dir, "_rollup_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
