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
) -> dict[str, tuple[int | None, int]]:
    """``(current, latest]`` per partition with anything new.

    ``current``: CheckpointStore positions (20-digit strings; '' = Beginning).
    ``latest``: partition → next-offset-to-produce (Kafka's endOffsets
    convention, exclusive).

    A never-committed partition yields ``from=None`` — Position::Beginning,
    NOT offset 0 (kafka_source.rs:616-618 previous_position_for_offset and
    :364 Position::Beginning → Offset::Beginning). The distinction matters
    on a real cluster: a retention-truncated topic has log-start > 0, where
    an explicit offset 0 is out-of-range but Beginning reads from log-start.
    It also keeps the checkpoint compat check quiet ('' == '' is no gap;
    from=0 over an empty checkpoint would warn a spurious gap)."""
    delta: dict[str, tuple[int | None, int]] = {}
    for part, end in sorted(latest.items()):
        pid = partition_key(topic, part)
        cur = current.get(pid, "")
        frm = int(cur) if cur else None
        if end > (frm or 0):
            delta[pid] = (frm, end)
    return delta


def delta_to_spark_offsets(
    delta: dict[str, tuple[int | None, int]], topic: str
) -> tuple[str, str]:
    """Delta → (startingOffsets, endingOffsets) JSON for Spark's Kafka batch
    source. Spark offsets are [start, end) — our delta is (from, to], and
    both store "the next offset to read" at the low end, so start = from and
    end = to. ``from=None`` (Beginning) maps to -2, Spark's per-partition
    "earliest" sentinel in the offsets JSON — the exact equivalent of
    rdkafka's Offset::Beginning (kafka_source.rs:364)."""
    starting = {topic: {}}
    ending = {topic: {}}
    for pid, (frm, to) in delta.items():
        part = int(pid.rsplit(":", 1)[1])
        starting[topic][str(part)] = -2 if frm is None else frm
        ending[topic][str(part)] = to
    return json.dumps(starting), json.dumps(ending)


def spark_read_options(
    bootstrap_servers: str, topic: str, delta: dict[str, tuple[int | None, int]]
) -> dict[str, str]:
    """The EXACT options dict handed to ``spark.read.format("kafka")`` for a
    checkpoint-planned batch — pure and golden-tested (the sandbox has no
    spark-sql-kafka on the classpath, so this contract is what pins the
    cluster wiring against kafka_source.rs's startingOffsets semantics)."""
    starting, ending = delta_to_spark_offsets(delta, topic)
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting,
        "endingOffsets": ending,
        # exactly-once is OUR checkpoint's job; a missing broker offset must
        # surface, not silently skip (kafka_source.rs treats out-of-range as
        # an error, not a reset)
        "failOnDataLoss": "true",
    }


class FileKafkaBroker:
    """File-backed broker double implementing the exact (topic, partition,
    offset) contract of a Kafka cluster, for end-to-end tests without
    spark-sql-kafka on the classpath (the reference tests its Kafka source
    against a dockerized broker, kafka_source.rs test mod; this double
    plays that role in-sandbox).

    Layout: one NDJSON file per partition (``{topic}-{p:05d}.jsonl``);
    offset = line index, so ``end_offsets`` is the line count (Kafka's
    next-offset-to-produce convention) and a batch read of [start, end)
    returns exactly those lines. Reads run executor-side via mapInPandas —
    one (partition, start, end) slice per task, like the real batch source.
    """

    def __init__(self, root: str):
        import os

        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, topic: str, partition: int) -> str:
        import os

        return os.path.join(self.root, f"{topic}-{partition:05d}.jsonl")

    def produce(self, topic: str, partition: int, values: list[str]) -> None:
        with open(self._path(topic, partition), "a", encoding="utf-8") as fh:
            for v in values:
                fh.write(v.rstrip("\n") + "\n")

    def end_offsets(self, topic: str) -> dict[int, int]:
        import glob
        import os

        out: dict[int, int] = {}
        for p in glob.glob(self._path(topic, 0).replace("-00000", "-*")):
            part = int(os.path.basename(p).rsplit("-", 1)[1].split(".")[0])
            with open(p, "rb") as fh:
                out[part] = sum(1 for _ in fh)
        return out

    def read_batch(
        self, spark: SparkSession, topic: str, starting: str, ending: str
    ) -> DataFrame:
        """Spark offsets JSON → DataFrame in the Kafka source's column shape
        (value/topic/partition/offset/timestamp), offsets [start, end)."""
        from pyspark.sql import functions as F

        from quickwit_spark.sources._slices import read_line_slices

        start_map = json.loads(starting)[topic]
        end_map = json.loads(ending)[topic]
        specs = [
            # -2 = earliest; this broker's log always starts at line 0
            (self._path(topic, int(p)), str(int(p)), max(0, int(frm)), int(end_map[p]))
            for p, frm in start_map.items()
        ]
        return read_line_slices(spark, specs).select(
            "value",
            F.lit(topic).alias("topic"),
            F.col("key").cast("int").alias("partition"),
            F.col("line_index").alias("offset"),
            F.lit(None).cast("timestamp").alias("timestamp"),
        )


class KafkaTailSource:
    """Poll/commit over a Kafka topic with external checkpointed offsets —
    the same interface as :class:`~quickwit_spark.sources.file_tail.FileTailSource`.

    ``broker`` (optional) is any object with ``end_offsets(topic)`` and
    ``read_batch(spark, topic, starting, ending)`` — production wires the
    real Spark Kafka batch source; tests inject :class:`FileKafkaBroker`
    so poll → durable write → commit → crash → resume is exercised
    end-to-end without a cluster."""

    def __init__(
        self,
        spark: SparkSession,
        bootstrap_servers: str,
        topic: str,
        out_dir: str,
        source_id: str = "kafka",
        broker=None,
    ):
        self.spark = spark
        self.servers = bootstrap_servers
        self.topic = topic
        self.source_id = source_id
        self.store = CheckpointStore(out_dir)
        self.broker = broker

    def plan(self, latest: dict[int, int] | None = None) -> dict[str, tuple[int, int]]:
        """``latest`` comes from the broker's endOffsets (injected so the
        planning math is testable without one; with a ``broker`` attached it
        is fetched automatically)."""
        if latest is None:
            if self.broker is None:
                raise ValueError("plan() needs `latest` offsets or a broker")
            latest = self.broker.end_offsets(self.topic)
        return offsets_to_delta(self.store.current(self.source_id), latest, self.topic)

    def read(self, delta: dict[str, tuple[int, int]]) -> DataFrame:
        starting, ending = delta_to_spark_offsets(delta, self.topic)
        if self.broker is not None:
            return self.broker.read_batch(self.spark, self.topic, starting, ending)
        try:
            return (
                self.spark.read.format("kafka")
                .options(**spark_read_options(self.servers, self.topic, delta))
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

    def poll(self) -> tuple[DataFrame, dict] | None:
        """One micro-batch: (rows DataFrame, delta) or None if caught up.
        Same publish model as FileTailSource.poll: the caller durably
        writes its outputs, then calls :meth:`commit` with the delta."""
        delta = self.plan()
        if not delta:
            return None
        self.store.check_compatibility(self.source_id, delta)
        return self.read(delta), delta

    def commit(self, delta: dict, commit_id: str | None = None) -> str:
        self.store.check_compatibility(self.source_id, delta)
        return self.store.commit(self.source_id, delta, commit_id=commit_id)
