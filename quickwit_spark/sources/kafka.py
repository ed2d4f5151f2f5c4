"""Kafka source with Quickwit checkpoint semantics (broker-gated).

Mirrors the reference's Kafka source (quickwit-indexing/src/source/
kafka_source.rs — behavior only): the source checkpoint is
``"topic:partition" → last consumed offset``; each poll reads
``(current, latest]`` per partition as one bounded batch and publishes the
delta through the same CheckpointStore compatibility check as every other
source — replays of committed offsets are rejected, so a crash between sink
write and checkpoint commit re-reads exactly one batch.

The OFFSET ARITHMETIC (checkpoint → Spark `startingOffsets`/`endingOffsets`
JSON, delta construction, resume math) is pure logic and unit-tested without
a broker. The broker-facing read uses Spark's own Kafka batch source
(`spark.read.format("kafka")`) and requires the spark-sql-kafka package on
the classpath — absent in this sandbox, so :meth:`KafkaTailSource.read`
raises a clear error unless the package is available; the file-tail source
(sources/file_tail.py) exercises the identical publish model end-to-end.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from quickwit_spark.pipeline.checkpoint import CheckpointStore


def partition_key(topic: str, partition: int) -> str:
    """Checkpoint partition id for a Kafka (topic, partition)."""
    return f"{topic}:{partition:05d}"


def offsets_to_delta(
    current: dict[str, str], latest: dict[int, int], topic: str
) -> dict[str, tuple[int, int]]:
    """``(current, latest]`` per partition with anything new.

    ``current``: CheckpointStore positions (20-digit strings; '' = beginning
    → Kafka offset -2 semantics, we start at 0). ``latest``: partition →
    next-offset-to-produce (Kafka's endOffsets convention, exclusive)."""
    delta: dict[str, tuple[int, int]] = {}
    for part, end in sorted(latest.items()):
        pid = partition_key(topic, part)
        cur = current.get(pid, "")
        frm = int(cur) if cur else 0
        if end > frm:
            delta[pid] = (frm, end)
    return delta


def delta_to_spark_offsets(
    delta: dict[str, tuple[int, int]], topic: str
) -> tuple[str, str]:
    """Delta → (startingOffsets, endingOffsets) JSON for Spark's Kafka batch
    source. Spark offsets are [start, end) — our delta is (from, to], and
    both store "the next offset to read" at the low end, so start = from and
    end = to."""
    starting = {topic: {}}
    ending = {topic: {}}
    for pid, (frm, to) in delta.items():
        part = int(pid.rsplit(":", 1)[1])
        starting[topic][str(part)] = frm
        ending[topic][str(part)] = to
    return json.dumps(starting), json.dumps(ending)


class KafkaTailSource:
    """Poll/commit over a Kafka topic with external checkpointed offsets —
    the same interface as :class:`~quickwit_spark.sources.file_tail.FileTailSource`."""

    def __init__(
        self,
        spark: SparkSession,
        bootstrap_servers: str,
        topic: str,
        out_dir: str,
        source_id: str = "kafka",
    ):
        self.spark = spark
        self.servers = bootstrap_servers
        self.topic = topic
        self.source_id = source_id
        self.store = CheckpointStore(out_dir)

    def plan(self, latest: dict[int, int]) -> dict[str, tuple[int, int]]:
        """``latest`` comes from the broker's endOffsets (injected so the
        planning math is testable without one)."""
        return offsets_to_delta(self.store.current(self.source_id), latest, self.topic)

    def read(self, delta: dict[str, tuple[int, int]]) -> DataFrame:
        starting, ending = delta_to_spark_offsets(delta, self.topic)
        try:
            return (
                self.spark.read.format("kafka")
                .option("kafka.bootstrap.servers", self.servers)
                .option("subscribe", self.topic)
                .option("startingOffsets", starting)
                .option("endingOffsets", ending)
                .load()
                .selectExpr(
                    "CAST(value AS STRING) AS value",
                    "topic", "partition", "offset", "timestamp",
                )
            )
        except Exception as e:  # pragma: no cover - no kafka jars in sandbox
            raise RuntimeError(
                "Spark Kafka source unavailable (add the spark-sql-kafka "
                "package to the classpath); offset planning/commit logic is "
                "broker-independent and tested"
            ) from e

    def commit(self, delta: dict, commit_id: str | None = None) -> str:
        self.store.check_compatibility(self.source_id, delta)
        return self.store.commit(self.source_id, delta, commit_id=commit_id)
