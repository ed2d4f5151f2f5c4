"""Streaming percolation (streaming/alert_stream.py): stream==batch match
equality, checkpoint resume over new files without re-alerting old rows,
idempotent replay, and in-flight epoch exclusion."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from quickwit_spark.operators.percolate import percolate
from quickwit_spark.operators.query import QueryCompiler
from quickwit_spark.streaming.alert_stream import read_alerts, stream_alerts

FIELDS = {"event_type": "raw", "value": "numeric"}
STORED = {
    "q_err": "event_type:error",
    "q_hot": "value:[400 TO 500]",
}
SCHEMA = "event_id long, event_type string, value double"


def _rows(start, n):
    out = []
    for i in range(start, start + n):
        out.append(
            Row(
                event_id=i,
                event_type="error" if i % 5 == 0 else "click",
                value=float(450 if i % 7 == 0 else 10),
            )
        )
    return out


def _write_batch(spark, path, start, n):
    spark.createDataFrame(_rows(start, n), SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _alert_set(spark, out_dir):
    return {
        (r["event_id"], r["query_id"])
        for r in read_alerts(spark, out_dir).collect()
    }


def _expected(spark, rows):
    qc = QueryCompiler(FIELDS)
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r["event_id"], r["query_id"])
        for r in percolate(df, STORED, qc, id_cols=["event_id"]).collect()
    }


class TestAlertStream:
    def test_stream_equals_batch_and_resumes(self, spark, tmp_path):
        inp, out = str(tmp_path / "in"), str(tmp_path / "out")
        _write_batch(spark, inp, 0, 40)
        qc = QueryCompiler(FIELDS)
        q = stream_alerts(spark, inp, out, STORED, qc, ["event_id"], SCHEMA)
        q.awaitTermination(120)
        assert _alert_set(spark, out) == _expected(spark, _rows(0, 40))

        # replay with the same checkpoint: no new epochs, alerts unchanged
        before = _alert_set(spark, out)
        q = stream_alerts(spark, inp, out, STORED, qc, ["event_id"], SCHEMA)
        q.awaitTermination(120)
        assert _alert_set(spark, out) == before

        # new file arrives -> only its rows alert, accumulated set is the
        # union (old rows not re-alerted: counts stay exact)
        _write_batch(spark, inp, 100, 25)
        q = stream_alerts(spark, inp, out, STORED, qc, ["event_id"], SCHEMA)
        q.awaitTermination(120)
        assert _alert_set(spark, out) == _expected(
            spark, _rows(0, 40) + _rows(100, 25)
        )

    def test_inflight_epoch_excluded(self, spark, tmp_path):
        inp, out = str(tmp_path / "in"), str(tmp_path / "out")
        _write_batch(spark, inp, 0, 10)
        qc = QueryCompiler(FIELDS)
        q = stream_alerts(spark, inp, out, STORED, qc, ["event_id"], SCHEMA)
        q.awaitTermination(120)
        # forge a poison half-written epoch ABOVE the committed ones
        poison = os.path.join(out, "alerts", "epoch=999")
        spark.createDataFrame(
            [Row(event_id=12345, query_id="q_err")], "event_id long, query_id string"
        ).write.mode("overwrite").parquet(poison)
        full = _alert_set(spark, out)
        assert (12345, "q_err") in full  # unbounded read sees it...
        bounded = {
            (r["event_id"], r["query_id"])
            for r in read_alerts(spark, out, before_epoch=999).collect()
        }
        assert (12345, "q_err") not in bounded  # ...the bounded read never
        assert bounded == _expected(spark, _rows(0, 10))
