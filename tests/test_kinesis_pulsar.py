"""Kinesis + Pulsar tail sources over their file-backed doubles: resume
semantics, reshard ordering, position encodings (incl. the reference's own
pulsar position vector), kill-and-resume exactly-once."""

import glob
import os

import pytest

from quickwit_spark.pipeline.checkpoint import IncompatibleCheckpointDelta
from quickwit_spark.sources.kinesis import (
    FileKinesisStream,
    KinesisTailSource,
    seq_no,
)
from quickwit_spark.sources.pulsar import (
    FilePulsarBroker,
    PulsarTailSource,
    msg_id_to_position,
)


def test_pulsar_position_encoding_reference_vector():
    # pulsar_source.rs:698 test vector:
    # format!("{:0>20},{:0>20},{:010},,{:010}", 1, 134, 3, 6)
    assert (
        msg_id_to_position(1, 134, batch_index=3, batch_size=6)
        == "00000000000000000001,00000000000000000134,0000000003,,0000000006"
    )
    # ordering: ledger first, then entry — across a ledger roll
    assert msg_id_to_position(0, 99) < msg_id_to_position(1, 0)
    assert msg_id_to_position(2, 5) < msg_id_to_position(2, 50)


def test_kinesis_resume_and_exactly_once(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("kin")
    stream = FileKinesisStream(str(root / "stream"))
    ckpt = str(root / "ckpt")
    sink = str(root / "sink")
    os.makedirs(sink)

    stream.put_records("shardId-000000000000", [f"a{i}" for i in range(5)])
    stream.put_records("shardId-000000000001", [f"b{i}" for i in range(3)])

    src = KinesisTailSource(spark, stream, ckpt)
    df, ck = src.poll()
    rows = df.collect()
    assert len(rows) == 8
    assert {r["sequence_number"] for r in rows if r["shard_id"].endswith("0")} == {
        seq_no(i) for i in range(5)
    }
    df.write.mode("overwrite").parquet(os.path.join(sink, "c0"))
    src.commit(ck, commit_id="c0")
    assert src.poll() is None

    # more data; planted crash between write and commit
    stream.put_records("shardId-000000000000", ["a5", "a6"])
    df2, ck2 = src.poll()
    df2.write.mode("overwrite").parquet(os.path.join(sink, "c1"))
    # restart → same batch replays (exclusive resume after last seq)
    src2 = KinesisTailSource(spark, stream, ckpt)
    df2b, ck2b = src2.poll()
    assert ck2b == ck2
    got = sorted(r["value"] for r in df2b.collect())
    assert got == ["a5", "a6"]
    df2b.write.mode("overwrite").parquet(os.path.join(sink, "c1"))
    src2.commit(ck2b, commit_id="c1")
    with pytest.raises(IncompatibleCheckpointDelta):
        src2.commit(ck2b)

    allv = [
        r["value"]
        for r in spark.read.parquet(*glob.glob(os.path.join(sink, "c*"))).collect()
    ]
    assert sorted(allv) == sorted([f"a{i}" for i in range(7)] + ["b0", "b1", "b2"])
    assert len(allv) == len(set(allv)) == 10


def test_kinesis_reshard_children_wait_for_parent(spark, tmp_path_factory):
    """kinesis_source.rs:232-238: child shards only start after the closed
    parent is fully drained — per-key order across the reshard boundary."""
    root = tmp_path_factory.mktemp("kin_reshard")
    stream = FileKinesisStream(str(root / "stream"))
    ckpt = str(root / "ckpt")

    stream.put_records("shardId-000000000000", ["p0", "p1", "p2"])
    stream.split_shard(
        "shardId-000000000000",
        ["shardId-000000000002", "shardId-000000000003"],
    )
    stream.put_records("shardId-000000000002", ["c0"])
    stream.put_records("shardId-000000000003", ["d0", "d1"])

    src = KinesisTailSource(spark, stream, ckpt)
    delta1 = src.plan()
    # children NOT eligible: parent has unconsumed records
    assert set(delta1) == {"shardId-000000000000"}
    df, ck = src.poll()
    assert sorted(r["value"] for r in df.collect()) == ["p0", "p1", "p2"]
    src.commit(ck)

    # parent drained → children become eligible, from the beginning
    delta2 = src.plan()
    assert set(delta2) == {"shardId-000000000002", "shardId-000000000003"}
    df2, ck2 = src.poll()
    assert sorted(r["value"] for r in df2.collect()) == ["c0", "d0", "d1"]
    src.commit(ck2)
    assert src.poll() is None


def test_pulsar_resume_skip_rule_and_ledger_roll(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pul")
    broker = FilePulsarBroker(str(root / "broker"), ledger_size=4)
    ckpt = str(root / "ckpt")

    broker.send("turns", 0, [f"m{i}" for i in range(6)])  # crosses ledger roll
    broker.send("turns", 1, ["n0", "n1"])

    src = PulsarTailSource(spark, broker, "turns", ckpt)
    df, delta = src.poll()
    rows = df.collect()
    assert len(rows) == 8
    # positions are the pulsar encoding, ordered across the ledger roll
    p0 = sorted(r["position"] for r in rows if r["partition_topic"].endswith("-0"))
    assert p0[0].startswith("00000000000000000000,00000000000000000000")
    assert p0[-1].startswith("00000000000000000001,")  # rolled to ledger 1
    src.commit(delta, commit_id="c0")

    # the ≤-position skip rule: replayed messages are invisible next poll
    assert src.poll() is None
    broker.send("turns", 0, ["m6"])
    df2, delta2 = src.poll()
    assert [r["value"] for r in df2.collect()] == ["m6"]

    # planted crash: restart replays exactly the same delta
    src2 = PulsarTailSource(spark, broker, "turns", ckpt)
    df2b, delta2b = src2.poll()
    assert delta2b == delta2
    assert [r["value"] for r in df2b.collect()] == ["m6"]
    src2.commit(delta2b)
    with pytest.raises(IncompatibleCheckpointDelta):
        src2.commit(delta2b)
