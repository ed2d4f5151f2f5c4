"""Kafka source offset semantics (kafka_source.rs behavior) — the planning,
Spark-offset translation, and exactly-once commit math, broker-free."""

import pytest

from quickwit_spark.pipeline.checkpoint import IncompatibleCheckpointDelta
from quickwit_spark.sources.kafka import (
    KafkaTailSource,
    delta_to_spark_offsets,
    offsets_to_delta,
    partition_key,
)


def test_offsets_to_delta_from_beginning_and_resume():
    # nothing consumed yet → read [0, end) on every partition with data
    d = offsets_to_delta({}, {0: 100, 1: 0, 2: 7}, "logs")
    assert d == {"logs:00000": (0, 100), "logs:00002": (0, 7)}
    # resume: only the new tail of each partition
    current = {"logs:00000": "%020d" % 100, "logs:00002": "%020d" % 7}
    d2 = offsets_to_delta(current, {0: 150, 1: 3, 2: 7}, "logs")
    assert d2 == {"logs:00000": (100, 150), "logs:00001": (0, 3)}


def test_delta_to_spark_offsets_json():
    import json

    starting, ending = delta_to_spark_offsets(
        {"logs:00000": (100, 150), "logs:00002": (0, 7)}, "logs"
    )
    assert json.loads(starting) == {"logs": {"0": 100, "2": 0}}
    assert json.loads(ending) == {"logs": {"0": 150, "2": 7}}


def test_kafka_commit_is_exactly_once(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kafka_ckpt"))
    src = KafkaTailSource(spark, "broker:9092", "logs", out)
    delta = src.plan({0: 100, 1: 50})
    assert delta == {"logs:00000": (0, 100), "logs:00001": (0, 50)}
    src.commit(delta, commit_id="batch0")
    # replaying the same delta is rejected (overlap) — exactly-once publish
    with pytest.raises(IncompatibleCheckpointDelta):
        src.commit(delta)
    # a restart resumes from the committed positions
    src2 = KafkaTailSource(spark, "broker:9092", "logs", out)
    assert src2.plan({0: 100, 1: 50}) == {}
    assert src2.plan({0: 120, 1: 50}) == {"logs:00000": (100, 120)}


def test_kafka_read_raises_clearly_without_package(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kafka_nopkg"))
    src = KafkaTailSource(spark, "broker:9092", "logs", out)
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        src.read({partition_key("logs", 0): (0, 10)}).collect()
