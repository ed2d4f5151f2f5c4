"""Streaming rollup maintenance (streaming/rollup_stream.py): transcript
micro-batches aggregate to epoch-scoped mergeable partials; reading the
accumulated rollup equals a direct batch aggregation of everything
ingested so far; replays and compaction never double-count."""

import datetime as dt
import glob
import os
import shutil

import pytest
from pyspark.sql import Row, functions as F

from quickwit_spark.operators.rollup import rollup_finalize
from quickwit_spark.streaming.rollup_stream import (
    compact_rollup,
    read_rollup,
    stream_rollup,
)

T0 = dt.datetime(2024, 3, 1)
KEYS = ["role"]
KEY_SCHEMA = "role string"


def _turns(wave, n=40):
    return [
        Row(
            conv_id=f"c{i % 7}",
            turn_idx=i,
            role=["user", "assistant", "tool"][i % 3],
            text=f"w{wave} turn {i}",
            tool=None if i % 3 != 2 else "search",
            ts=T0 + dt.timedelta(hours=wave * 3, minutes=i),
        )
        for i in range(n)
    ]


def _write_wave(spark, input_dir, rows, name):
    df = spark.createDataFrame(rows)
    stage = os.path.join(input_dir, "_stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    dst = os.path.join(input_dir, f"{name}.parquet")
    shutil.move(part, dst)
    shutil.rmtree(stage)
    _write_wave.counter += 1
    ts = 1_700_000_000 + _write_wave.counter * 60
    os.utime(dst, (ts, ts))


_write_wave.counter = 0


def _drain(spark, input_dir, out_dir):
    q = stream_rollup(
        spark,
        input_dir,
        out_dir,
        keys=KEYS,
        ts_col="ts",
        value_col="turn_idx",
        grain="hour",
        schema="conv_id string, turn_idx long, role string, text string,"
        " tool string, ts timestamp",
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)


def _finalized(spark, out_dir, **kw):
    r = read_rollup(
        spark, os.path.join(out_dir, "rollup"), KEYS, KEY_SCHEMA, **kw
    )
    return {
        (row["role"], row["bucket"]): (
            row["cnt"],
            row["sum_v"],
            row["min_v"],
            row["max_v"],
        )
        for row in rollup_finalize(r, KEYS).collect()
    }


def _direct(spark, waves):
    rows = [r for w in waves for r in w]
    df = spark.createDataFrame(rows)
    out = df.groupBy(
        "role", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(
        F.count("turn_idx").cast("long").alias("cnt"),
        F.round(F.sum(F.col("turn_idx").cast("double")), 6).alias("sum_v"),
        F.min(F.col("turn_idx").cast("double")).alias("min_v"),
        F.max(F.col("turn_idx").cast("double")).alias("max_v"),
    )
    return {
        (r["role"], r["bucket"]): (r["cnt"], r["sum_v"], r["min_v"], r["max_v"])
        for r in out.collect()
    }


@pytest.fixture()
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("rstream")
    input_dir, out_dir = str(base / "in"), str(base / "out")
    os.makedirs(input_dir)
    return input_dir, out_dir


def test_stream_equals_direct_and_resumes(spark, dirs):
    input_dir, out_dir = dirs
    w1, w2 = _turns(0), _turns(1)
    _write_wave(spark, input_dir, w1, "w1")
    _write_wave(spark, input_dir, w2, "w2")
    _drain(spark, input_dir, out_dir)
    assert _finalized(spark, out_dir) == _direct(spark, [w1, w2])

    # restart from checkpoint: only the new wave is processed, totals
    # still equal a full direct aggregation
    w3 = _turns(2, n=25)
    _write_wave(spark, input_dir, w3, "w3")
    _drain(spark, input_dir, out_dir)
    assert _finalized(spark, out_dir) == _direct(spark, [w1, w2, w3])
    # w1/w2 epochs were NOT rewritten by the resumed run
    epochs = sorted(
        d for d in os.listdir(os.path.join(out_dir, "rollup"))
        if d.startswith("epoch=")
    )
    assert len(epochs) == 3


def test_crash_replay_overwrites_own_epoch(spark, dirs):
    input_dir, out_dir = dirs
    w1 = _turns(0)
    _write_wave(spark, input_dir, w1, "w1")
    _drain(spark, input_dir, out_dir)
    # forge a half-written CURRENT-epoch attempt: duplicate epoch=1 dir
    # as if a crashed trigger had partially written it, then ingest the
    # real wave 2 — the replayed epoch must overwrite, not double-count
    rollup_dir = os.path.join(out_dir, "rollup")
    poison = os.path.join(rollup_dir, "epoch=1")
    shutil.copytree(os.path.join(rollup_dir, "epoch=0"), poison)
    w2 = _turns(1)
    _write_wave(spark, input_dir, w2, "w2")
    _drain(spark, input_dir, out_dir)
    assert _finalized(spark, out_dir) == _direct(spark, [w1, w2])


def test_compaction_preserves_totals_and_shrinks(spark, dirs):
    input_dir, out_dir = dirs
    waves = [_turns(i) for i in range(3)]
    for i, w in enumerate(waves):
        _write_wave(spark, input_dir, w, f"w{i}")
    _drain(spark, input_dir, out_dir)
    before = _finalized(spark, out_dir)

    rollup_dir = os.path.join(out_dir, "rollup")
    res = compact_rollup(spark, rollup_dir, KEYS, upto_epoch=2)
    assert res["folded"] == 2 and res["version"] == 1
    assert _finalized(spark, out_dir) == before
    # folded epoch dirs are gone; the base is re-aggregated (one row per
    # key+bucket, strictly fewer rows than the two folded deltas had)
    assert not os.path.isdir(os.path.join(rollup_dir, "epoch=0"))
    base = spark.read.parquet(os.path.join(rollup_dir, "base_v1"))
    assert base.groupBy("role", "bucket").count().filter("count > 1").count() == 0

    # second compaction folds the rest into v2
    res2 = compact_rollup(spark, rollup_dir, KEYS, upto_epoch=3)
    assert res2["version"] == 2 and res2["folded"] >= 1
    assert _finalized(spark, out_dir) == before
    assert not os.path.isdir(os.path.join(rollup_dir, "base_v1"))

    # another wave after compaction still lands as a delta on top
    w4 = _turns(5, n=10)
    _write_wave(spark, input_dir, w4, "w4")
    _drain(spark, input_dir, out_dir)
    assert _finalized(spark, out_dir) == _direct(spark, waves + [w4])
