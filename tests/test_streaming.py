"""Structured Streaming pipeline tests: availableNow drain, exactly-once
resume via Spark checkpoint, and watermarked windowed aggregate."""

import os

import pytest
from pyspark.sql import functions as F

from quickwit_spark.pipeline.runner import PipelineConfig
from quickwit_spark.pipeline.transcripts import materialize
from quickwit_spark.streaming.stream_pipeline import (
    stream_pipeline,
    windowed_stream_aggregate,
)

N = 4000


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_in")
    return materialize(N, str(d), seed=42)


def test_stream_available_now_matches_batch(spark, data_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_out"))
    q = stream_pipeline(spark, data_dir, out, PipelineConfig(), available_now=True)
    q.awaitTermination(300)

    sinks = spark.read.option("basePath", os.path.join(out, "sinks_stream")).parquet(
        os.path.join(out, "sinks_stream", "epoch=*")
    )
    batch_valid = (
        spark.read.parquet(os.path.join(data_dir, "transcripts.parquet"))
        .filter(F.col("text").rlike("level="))
        .count()
    )
    assert sinks.count() == batch_valid

    # restart with the same checkpoint: nothing new to consume → no new rows
    q2 = stream_pipeline(spark, data_dir, out, PipelineConfig(), available_now=True)
    q2.awaitTermination(300)
    assert sinks.count() == batch_valid  # no duplicates

    metrics = spark.read.parquet(os.path.join(out, "_metrics_stream"))
    assert metrics.agg(F.sum("doc_count")).collect()[0][0] == batch_valid


def test_windowed_stream_aggregate(spark, data_dir):
    agg = windowed_stream_aggregate(spark, data_dir)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("winagg")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT sum(doc_count) AS n FROM winagg").collect()[0]["n"]
    assert got == N
    roles = {r["role"] for r in spark.sql("SELECT DISTINCT role FROM winagg").collect()}
    assert {"user", "assistant", "tool"} <= roles


def test_streaming_dedup_across_microbatches(spark, tmp_path_factory):
    """Exactly-one-emission per distinct text even when duplicates arrive in
    DIFFERENT micro-batches (maxFilesPerTrigger=1 forces multi-batch)."""
    import pandas as pd

    from quickwit_spark.streaming.stateful import streaming_dedup

    d = tmp_path_factory.mktemp("sdedup")
    src = str(d / "in")
    os.makedirs(src)
    # batch 1: a, b ; batch 2: b (dup), c ; batch 3: a (dup), c (dup), d
    pd.DataFrame({"text": ["a", "b"]}).to_parquet(os.path.join(src, "f1.parquet"))
    pd.DataFrame({"text": ["b", "c"]}).to_parquet(os.path.join(src, "f2.parquet"))
    pd.DataFrame({"text": ["a", "c", "d"]}).to_parquet(os.path.join(src, "f3.parquet"))

    stream = (
        spark.readStream.schema("text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(d / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["first_value"]
        for r in spark.sql("SELECT * FROM sdedup_out").collect()
    }
    assert got == {"a", "b", "c", "d"}
    # exactly one emission per distinct value
    assert spark.sql("SELECT count(*) FROM sdedup_out").collect()[0][0] == 4


def test_streaming_dedup_hash_collision_safe(spark, tmp_path_factory):
    """Distinct texts that COLLIDE on the grouping hash must each be emitted
    once (suppression matches full text, not just the 64-bit hash). Forced
    with a degenerate hash_expr that maps everything to one bucket."""
    import pandas as pd

    from quickwit_spark.streaming.stateful import streaming_dedup

    d = tmp_path_factory.mktemp("sdedup_coll")
    src = str(d / "in")
    os.makedirs(src)
    pd.DataFrame({"text": ["x", "y"]}).to_parquet(os.path.join(src, "f1.parquet"))
    pd.DataFrame({"text": ["y", "z", "x"]}).to_parquet(os.path.join(src, "f2.parquet"))

    stream = (
        spark.readStream.schema("text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_dedup(stream, hash_expr=F.lit(0).cast("long"))
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup_coll_out")
        .outputMode("append")
        .option("checkpointLocation", str(d / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sdedup_coll_out").collect()
    assert {r["first_value"] for r in rows} == {"x", "y", "z"}
    assert len(rows) == 3  # one emission per distinct text, despite collisions


def test_conversation_sessions_state_accumulates(spark, tmp_path_factory):
    import pandas as pd

    from quickwit_spark.streaming.stateful import conversation_sessions

    d = tmp_path_factory.mktemp("sess")
    src = str(d / "in")
    os.makedirs(src)
    pd.DataFrame(
        {"conv_id": ["c1", "c1"], "turn_idx": [0, 1],
         "text": ["level=INFO ok", "level=ERROR boom"]}
    ).to_parquet(os.path.join(src, "f1.parquet"))
    pd.DataFrame(
        {"conv_id": ["c1", "c2"], "turn_idx": [2, 0],
         "text": ["level=ERROR again", "level=INFO hi"]}
    ).to_parquet(os.path.join(src, "f2.parquet"))

    stream = (
        spark.readStream.schema("conv_id string, turn_idx long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        conversation_sessions(stream)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .option("checkpointLocation", str(d / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_out").collect()
    # the memory sink keeps every update; the LATEST c1 update (highest
    # n_turns) must reflect ALL 3 turns and both errors
    c1 = max((r for r in rows if r["conv_id"] == "c1"), key=lambda r: r["n_turns"])
    assert c1["n_turns"] == 3
    assert c1["max_turn_idx"] == 2
    assert c1["n_error_turns"] == 2
    c2 = [r for r in rows if r["conv_id"] == "c2"]
    assert c2 and c2[0]["n_turns"] == 1
