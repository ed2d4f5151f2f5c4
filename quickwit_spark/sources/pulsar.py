"""Pulsar source with Quickwit checkpoint semantics (file-backed double).

Behavioral contract studied from quickwit-indexing/src/source/
pulsar_source.rs (behavior only):

- the checkpoint position of a (topic, partition) is the encoded message
  id ``"{ledger_id:020},{entry_id:020},{batch_index:010},{partition},
  {batch_size:010}"`` — ledger then entry then batch index give the
  sorting, the remaining parts only reconstruct the id
  (pulsar_source.rs:340-370 msg_id_to_position);
- messages whose position is ≤ the current recorded position are SKIPPED
  (pulsar_source.rs:170-176) — replay safety lives in the position
  comparison, not in broker acknowledgements;
- partitions of a topic are independent checkpoint partitions keyed by the
  partition topic name.

The pulsar client is absent in this sandbox; :class:`FilePulsarBroker`
implements the same contract over one JSONL file per partition, rolling
the ledger id every ``ledger_size`` entries so positions exercise both id
components. Reads fan out executor-side like the other tail sources.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from quickwit_spark.pipeline.checkpoint import CheckpointStore


def msg_id_to_position(
    ledger_id: int, entry_id: int, batch_index: int | None = None,
    partition: int | None = None, batch_size: int | None = None,
) -> str:
    """The reference's position encoding (pulsar_source.rs:340-370),
    byte-for-byte: zero-padded ledger + entry, optional batch/partition/
    batch-size components."""
    return "{:0>20},{:0>20},{},{},{}".format(
        ledger_id,
        entry_id,
        f"{batch_index:010d}" if batch_index is not None else "",
        partition if partition is not None else "",
        f"{batch_size:010d}" if batch_size is not None else "",
    )


class FilePulsarBroker:
    """File-backed broker double: one JSONL file per partition topic
    (``{topic}-part-{p}.jsonl``); message ids derive from the line index
    with the ledger rolling every ``ledger_size`` entries."""

    def __init__(self, root: str, ledger_size: int = 100):
        self.root = root
        self.ledger_size = ledger_size
        os.makedirs(root, exist_ok=True)

    def partition_topic(self, topic: str, partition: int) -> str:
        return f"{topic}-part-{partition}"

    def _path(self, topic: str, partition: int) -> str:
        return os.path.join(self.root, f"{self.partition_topic(topic, partition)}.jsonl")

    def send(self, topic: str, partition: int, values: list[str]) -> None:
        with open(self._path(topic, partition), "a", encoding="utf-8") as fh:
            for v in values:
                fh.write(v.rstrip("\n") + "\n")

    def msg_id(self, line_index: int) -> tuple[int, int]:
        return line_index // self.ledger_size, line_index % self.ledger_size

    def end_positions(self, topic: str) -> dict[int, str]:
        """partition → position of the LAST message (inclusive), absent if
        the partition is empty."""
        out: dict[int, str] = {}
        pat = os.path.join(self.root, f"{topic}-part-*.jsonl")
        for p in glob.glob(pat):
            part = int(os.path.basename(p).rsplit("-", 1)[1].split(".")[0])
            with open(p, "rb") as fh:
                n = sum(1 for _ in fh)
            if n:
                out[part] = msg_id_to_position(*self.msg_id(n - 1), partition=part)
        return out


class PulsarTailSource:
    """Poll/commit over a Pulsar topic with external checkpointed message-id
    positions — same publish model as the Kafka/Kinesis tail sources."""

    def __init__(
        self,
        spark: SparkSession,
        broker: FilePulsarBroker,
        topic: str,
        out_dir: str,
        source_id: str = "pulsar",
    ):
        self.spark = spark
        self.broker = broker
        self.topic = topic
        self.source_id = source_id
        self.store = CheckpointStore(out_dir)

    def plan(self) -> dict[str, tuple[str, str]]:
        """``partition_topic → (from_position_exclusive, to_position]`` for
        every partition with messages NEWER than the checkpoint (the ≤
        skip rule of pulsar_source.rs:170-176 becomes the delta's
        exclusive lower bound)."""
        current = self.store.current(self.source_id)
        delta: dict[str, tuple[str, str]] = {}
        for part, end_pos in sorted(self.broker.end_positions(self.topic).items()):
            pt = self.broker.partition_topic(self.topic, part)
            cur = current.get(pt, "")
            if end_pos > cur:
                delta[pt] = (cur, end_pos)
        return delta

    def read(self, delta: dict[str, tuple[str, str]]) -> DataFrame:
        from pyspark.sql import functions as F

        from quickwit_spark.sources._slices import read_line_slices

        # read whole partitions (end = -1), derive the pulsar position from
        # the line index with Column ops, then apply the reference's skip
        # rule (≤ current dropped) as a per-partition filter
        specs = [
            (os.path.join(self.broker.root, f"{pt}.jsonl"), pt, 0, -1)
            for pt in sorted(delta)
        ]
        ls = self.broker.ledger_size
        bounds = F.create_map(
            *[F.lit(x) for pt, (frm, to) in delta.items() for x in (pt, frm)]
        )
        uppers = F.create_map(
            *[F.lit(x) for pt, (frm, to) in delta.items() for x in (pt, to)]
        )
        part = F.split(F.col("key"), "-part-").getItem(1).cast("int")
        pos = F.format_string(
            "%020d,%020d,,%d,",
            F.expr(f"line_index div {ls}"),  # integer div: exact at any index
            F.pmod(F.col("line_index"), F.lit(ls)),
            part,
        )
        return (
            read_line_slices(self.spark, specs)
            .select(
                "value",
                F.col("key").alias("partition_topic"),
                pos.alias("position"),
            )
            .filter(
                (F.col("position") > F.element_at(bounds, F.col("partition_topic")))
                & (F.col("position") <= F.element_at(uppers, F.col("partition_topic")))
            )
        )

    def poll(self) -> tuple[DataFrame, dict] | None:
        delta = self.plan()
        if not delta:
            return None
        self.store.check_compatibility(self.source_id, delta)
        return self.read(delta), delta

    def commit(self, delta: dict, commit_id: str | None = None) -> str:
        self.store.check_compatibility(self.source_id, delta)
        return self.store.commit(self.source_id, delta, commit_id=commit_id)
