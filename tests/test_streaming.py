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
