"""SQS-notified file source: the reference queue-source coordinator's own
test scenarios (coordinator.rs:409-564) replayed over the file-backed queue
double — empty queue, single message, local duplicates, shared complete
message, stale-ownership acquire, commit-time ownership conflict, and
crash-between-publish-and-ack exactly-once."""

import os

import pytest

from quickwit_spark.sources.sqs_files import FileQueue, ShardTable, SqsFileSource

NOW = 1_700_000_000.0


def write_file(tmp, name, lines):
    p = tmp / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_empty_queue(spark, tmp_path):
    q = FileQueue(str(tmp_path / "q"))
    src = SqsFileSource(spark, q, str(tmp_path / "meta"))
    assert src.poll(now=NOW) is None


def test_one_message_processed_exactly_once(spark, tmp_path):
    q = FileQueue(str(tmp_path / "q"))
    f = write_file(tmp_path, "a.ndjson", ["l1", "l2", "l3"])
    q.send(f)
    src = SqsFileSource(spark, q, str(tmp_path / "meta"))
    df, msgs = src.poll(now=NOW)
    assert sorted(r["value"] for r in df.collect()) == ["l1", "l2", "l3"]
    src.commit(msgs, now=NOW)
    assert q.size() == 0  # acked
    # a later duplicate notification is acked inside poll, never re-read
    q.send(f)
    assert src.poll(now=NOW + 1) is None
    assert q.size() == 0


def test_local_duplicate_in_one_batch(spark, tmp_path):
    # coordinator.rs test_process_local_duplicate_message
    q = FileQueue(str(tmp_path / "q"))
    f = write_file(tmp_path, "dup.ndjson", ["x"])
    q.send(f)
    q.send(f)
    src = SqsFileSource(spark, q, str(tmp_path / "meta"))
    df, msgs = src.poll(now=NOW)
    # both notifications resolve to ONE file read
    assert [r["value"] for r in df.collect()] == ["x"]
    src.commit(msgs, now=NOW)
    assert q.size() == 0


def test_shared_complete_message_acked_without_reprocess(spark, tmp_path):
    # coordinator.rs test_process_shared_complete_message: pipeline B sees a
    # shard pipeline A already EOF'd → ack + drop
    q = FileQueue(str(tmp_path / "q"))
    f = write_file(tmp_path, "done.ndjson", ["y"])
    q.send(f)
    a = SqsFileSource(spark, q, str(tmp_path / "meta"), token="pipeA")
    df, msgs = a.poll(now=NOW)
    a.commit(msgs, now=NOW)
    q.send(f)  # duplicate notification lands on pipeline B
    b = SqsFileSource(spark, q, str(tmp_path / "meta"), token="pipeB")
    assert b.poll(now=NOW + 1) is None
    assert q.size() == 0


def test_fresh_foreign_ownership_dropped_without_ack(spark, tmp_path):
    """A shard being processed by a live pipeline is left alone — no ack,
    the visibility timeout will redeliver."""
    q = FileQueue(str(tmp_path / "q"), visibility_secs=30)
    f = write_file(tmp_path, "busy.ndjson", ["z"])
    a = SqsFileSource(spark, q, str(tmp_path / "meta"), token="pipeA",
                      stale_secs=60)
    a.shards.open(f, "pipeA", now=NOW)  # A owns, still fresh, no EOF
    q.send(f)
    b = SqsFileSource(spark, q, str(tmp_path / "meta"), token="pipeB",
                      stale_secs=60)
    assert b.poll(now=NOW + 10) is None
    assert q.size() == 1  # NOT acked — will redeliver after visibility


def test_stale_ownership_acquired_and_loser_fails_at_commit(spark, tmp_path):
    q = FileQueue(str(tmp_path / "q"))
    f = write_file(tmp_path, "stale.ndjson", ["s1", "s2"])
    meta = str(tmp_path / "meta")
    a = SqsFileSource(spark, q, meta, token="pipeA", stale_secs=60)
    a.shards.open(f, "pipeA", now=NOW)  # A started then died
    q.send(f)
    b = SqsFileSource(spark, q, meta, token="pipeB", stale_secs=60)
    got = b.poll(now=NOW + 120)  # A's ownership is stale → B acquires
    assert got is not None
    df, msgs = got
    assert sorted(r["value"] for r in df.collect()) == ["s1", "s2"]
    b.commit(msgs, now=NOW + 121)
    # A comes back and tries to commit: ownership lost → commit-time error
    with pytest.raises(RuntimeError, match="ownership lost"):
        a.shards.commit_eof(f, "pipeA")


def test_crash_between_publish_and_ack_is_exactly_once(spark, tmp_path):
    q = FileQueue(str(tmp_path / "q"), visibility_secs=30)
    f = write_file(tmp_path, "crash.ndjson", ["c1", "c2"])
    sink = tmp_path / "sink"
    q.send(f)
    src = SqsFileSource(spark, q, str(tmp_path / "meta"), stale_secs=1000)
    df, msgs = src.poll(now=NOW)
    # durable publish keyed by uri (idempotent), then CRASH before commit
    df.write.mode("overwrite").parquet(str(sink / "f0"))
    # redelivery after the visibility timeout; same pipeline reprocesses
    df2, msgs2 = src.poll(now=NOW + 100)
    assert sorted(r["value"] for r in df2.collect()) == ["c1", "c2"]
    df2.write.mode("overwrite").parquet(str(sink / "f0"))  # same dir: no dup
    src.commit(msgs2, now=NOW + 101)
    assert q.size() == 0
    vals = [r["value"] for r in spark.read.parquet(str(sink / "f0")).collect()]
    assert sorted(vals) == ["c1", "c2"]


def test_shard_pruning(tmp_path):
    t = ShardTable(str(tmp_path / "meta"))
    t.open("u1", "tok", now=NOW)
    t.commit_eof("u1", "tok", now=NOW)
    t.open("u2", "tok", now=NOW)  # not EOF — never pruned
    assert t.prune(dedup_window_secs=3600, now=NOW + 10) == 0  # too recent
    assert t.prune(dedup_window_secs=3600, now=NOW + 7200) == 1
    assert t.prune(dedup_window_secs=3600, now=NOW + 7200) == 0
