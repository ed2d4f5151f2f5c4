"""File-tail source: per-file byte-offset checkpoints, exactly-once resume
(reference: doc_file_reader.rs:83-136 + checkpoint.rs delta semantics)."""

import os

import pytest

from quickwit_spark.pipeline.checkpoint import IncompatibleCheckpointDelta
from quickwit_spark.sources.file_tail import FileTailSource


@pytest.fixture()
def tail_env(tmp_path_factory):
    d = tmp_path_factory.mktemp("tail")
    src = d / "logs"
    out = d / "out"
    src.mkdir()
    return str(src), str(out)


def _append(path, lines, final_newline=True):
    with open(path, "a") as fh:
        fh.write("\n".join(lines) + ("\n" if final_newline else ""))


def test_tail_reads_only_new_lines(spark, tail_env):
    src, out = tail_env
    f1 = os.path.join(src, "a.log")
    _append(f1, [f"line{i}" for i in range(5)])

    tail = FileTailSource(spark, os.path.join(src, "*.log"), out)
    df, delta = tail.poll()
    got = sorted(r["line"] for r in df.collect())
    assert got == [f"line{i}" for i in range(5)]
    tail.commit(delta)

    # nothing new ⇒ None
    assert tail.poll() is None

    # produce-while-running: append to the old file AND add a new file
    _append(f1, ["line5", "line6"])
    f2 = os.path.join(src, "b.log")
    _append(f2, ["other0"])
    df2, delta2 = tail.poll()
    got2 = sorted(r["line"] for r in df2.collect())
    assert got2 == ["line5", "line6", "other0"]
    tail.commit(delta2)


def test_partial_trailing_line_waits(spark, tail_env):
    src, out = tail_env
    f1 = os.path.join(src, "a.log")
    _append(f1, ["complete"], final_newline=True)
    with open(f1, "a") as fh:
        fh.write("partia")  # no newline yet

    tail = FileTailSource(spark, os.path.join(src, "*.log"), out)
    df, delta = tail.poll()
    assert [r["line"] for r in df.collect()] == ["complete"]
    tail.commit(delta)
    assert tail.poll() is None  # the partial line is NOT consumed

    with open(f1, "a") as fh:
        fh.write("l done\n")
    df2, delta2 = tail.poll()
    assert [r["line"] for r in df2.collect()] == ["partial done"]
    tail.commit(delta2)


def test_crash_before_commit_replays_exactly_once(spark, tail_env):
    src, out = tail_env
    f1 = os.path.join(src, "a.log")
    _append(f1, [f"x{i}" for i in range(10)])

    tail = FileTailSource(spark, os.path.join(src, "*.log"), out)
    df, delta = tail.poll()
    assert df.count() == 10
    # CRASH here: no commit. A fresh instance (restart) re-plans the SAME delta
    tail2 = FileTailSource(spark, os.path.join(src, "*.log"), out)
    df2, delta2 = tail2.poll()
    assert delta2 == delta and df2.count() == 10
    tail2.commit(delta2)

    # replaying an already-committed delta is rejected (overlap), exactly-once
    with pytest.raises(IncompatibleCheckpointDelta):
        tail2.store.check_compatibility(tail2.source_id, delta)
    assert tail2.poll() is None


def test_byte_offsets_are_stable_identities(spark, tail_env):
    src, out = tail_env
    f1 = os.path.join(src, "a.log")
    _append(f1, ["aa", "bbbb", "c"])
    tail = FileTailSource(spark, os.path.join(src, "*.log"), out)
    df, _ = tail.poll()
    rows = {r["line"]: r["byte_offset"] for r in df.collect()}
    assert rows == {"aa": 0, "bbbb": 3, "c": 8}


def test_tail_feeds_the_pipeline_exactly_once(spark, tail_env, tmp_path_factory):
    """End-to-end: tail NDJSON-ish log lines → parse stage → sink write →
    commit; restart mid-stream loses nothing and duplicates nothing."""
    import json

    from pyspark.sql import functions as F

    src, out = tail_env
    f1 = os.path.join(src, "events.ndjson")
    _append(f1, [json.dumps({"id": i, "kind": "a" if i % 2 else "b"}) for i in range(20)])

    sink = str(tmp_path_factory.mktemp("tail_sink"))
    tail = FileTailSource(spark, os.path.join(src, "*.ndjson"), out)

    def run_once():
        polled = tail.poll()
        if polled is None:
            return 0
        df, delta = polled
        parsed = df.select(
            F.get_json_object("line", "$.id").cast("long").alias("id"),
            F.get_json_object("line", "$.kind").alias("kind"),
        )
        commit_id = "c%020d" % sum(to for _, to in delta.values())
        parsed.write.mode("overwrite").parquet(os.path.join(sink, f"commit={commit_id}"))
        tail.commit(delta, commit_id=commit_id)
        return 1

    assert run_once() == 1
    _append(f1, [json.dumps({"id": i, "kind": "c"}) for i in range(20, 30)])
    assert run_once() == 1
    assert run_once() == 0  # drained

    got = spark.read.parquet(os.path.join(sink, "commit=*"))
    assert got.count() == 30
    assert got.select("id").distinct().count() == 30
