"""Kinesis source with Quickwit checkpoint semantics (file-backed double).

Behavioral contract studied from quickwit-indexing/src/source/kinesis/
kinesis_source.rs (behavior only):

- the source checkpoint is ``shard_id → last consumed sequence number``;
  a shard consumer resumes AFTER that sequence number (exclusive —
  kinesis_source.rs:149-157 ``from_sequence_number_exclusive``);
- sequence numbers are opaque, lexicographically ordered strings;
- RESHARDING: when a shard is closed (split/merged), its consumer drains
  it to the end and only then are its CHILD shards spawned
  (kinesis_source.rs:232-238 ``ChildShards`` handling) — a child is never
  consumed before its parent is fully drained, preserving per-key order
  across the reshard boundary.

The AWS SDK is absent in this sandbox, so the broker facade is injectable:
:class:`FileKinesisStream` implements the same (shard, sequence-number,
parent/child) contract over one JSONL file per shard with a sidecar
``.meta.json`` for closed shards. Reads fan out executor-side (one shard
slice per task) exactly like the other tail sources.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession

from quickwit_spark.pipeline.checkpoint import CheckpointStore


def seq_no(i: int) -> str:
    """Zero-padded line index as an opaque, ordered sequence number (real
    Kinesis sequence numbers are huge decimal strings; same ordering)."""
    return f"{i:020d}"


class FileKinesisStream:
    """File-backed stream double: ``shard-XXXXX.jsonl`` per shard; a closed
    shard has ``shard-XXXXX.meta.json`` with ``{"closed": true,
    "children": [...]}``. Sequence number of a record = its line index."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, shard_id: str) -> str:
        return os.path.join(self.root, f"{shard_id}.jsonl")

    def put_records(self, shard_id: str, values: list[str]) -> None:
        if self.describe(shard_id).get("closed"):
            raise ValueError(f"shard {shard_id} is closed")
        with open(self._path(shard_id), "a", encoding="utf-8") as fh:
            for v in values:
                fh.write(v.rstrip("\n") + "\n")

    def split_shard(self, shard_id: str, children: list[str]) -> None:
        """Close ``shard_id`` and register its children (resharding)."""
        meta = {"closed": True, "children": children}
        with open(os.path.join(self.root, f"{shard_id}.meta.json"), "w") as fh:
            json.dump(meta, fh)
        for child in children:
            open(self._path(child), "a").close()

    def describe(self, shard_id: str) -> dict:
        p = os.path.join(self.root, f"{shard_id}.meta.json")
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
        return {"closed": False, "children": []}

    def list_shards(self) -> list[dict]:
        out = []
        parents: dict[str, str] = {}
        for p in sorted(glob.glob(os.path.join(self.root, "*.jsonl"))):
            sid = os.path.basename(p)[: -len(".jsonl")]
            meta = self.describe(sid)
            with open(p, "rb") as fh:
                end = sum(1 for _ in fh)
            out.append({"shard_id": sid, "end": end, "closed": meta["closed"],
                        "children": meta["children"]})
            for c in meta["children"]:
                parents[c] = sid
        for s in out:
            s["parent"] = parents.get(s["shard_id"])
        return out


class KinesisTailSource:
    """Poll/commit over a Kinesis-shaped stream with external checkpointed
    sequence numbers — same publish model as the Kafka/file tail sources."""

    def __init__(
        self,
        spark: SparkSession,
        stream: FileKinesisStream,
        out_dir: str,
        source_id: str = "kinesis",
    ):
        self.spark = spark
        self.stream = stream
        self.source_id = source_id
        self.store = CheckpointStore(out_dir)

    def plan(self) -> dict[str, tuple[int, int]]:
        """``shard_id → (from_line_exclusive, to_line)`` for every shard
        with new records whose parent (if any) is fully drained. The
        checkpoint stores the last consumed sequence number; resume is
        exclusive (kinesis_source.rs from_sequence_number_exclusive)."""
        current = self.store.current(self.source_id)
        shards = {s["shard_id"]: s for s in self.stream.list_shards()}
        delta: dict[str, tuple[int, int]] = {}
        for sid, s in sorted(shards.items()):
            parent = s.get("parent")
            if parent is not None and parent in shards:
                p = shards[parent]
                consumed = current.get(parent, "")
                drained = p["closed"] and (
                    p["end"] == 0 or consumed >= seq_no(p["end"] - 1)
                )
                if not drained:
                    # child shards wait for the parent to drain — the
                    # reshard ordering guarantee
                    continue
            cur = current.get(sid, "")
            frm = (int(cur) + 1) if cur else 0
            if s["end"] > frm:
                delta[sid] = (frm, s["end"])
        return delta

    def read(self, delta: dict[str, tuple[int, int]]) -> DataFrame:
        from pyspark.sql import functions as F

        from quickwit_spark.sources._slices import read_line_slices

        specs = [
            (self.stream._path(sid), sid, frm, to)
            for sid, (frm, to) in sorted(delta.items())
        ]
        return read_line_slices(self.spark, specs).select(
            "value",
            F.col("key").alias("shard_id"),
            F.format_string("%020d", F.col("line_index")).alias("sequence_number"),
        )

    def poll(self) -> tuple[DataFrame, dict] | None:
        delta = self.plan()
        if not delta:
            return None
        # checkpoint delta stores the LAST consumed sequence number per
        # shard, as positions (from_exclusive_line-1 → to_line-1)
        ck = {
            sid: (int(frm) - 1 if frm > 0 else "", to - 1)
            for sid, (frm, to) in delta.items()
        }
        self.store.check_compatibility(self.source_id, ck)
        return self.read(delta), ck

    def commit(self, delta: dict, commit_id: str | None = None) -> str:
        self.store.check_compatibility(self.source_id, delta)
        return self.store.commit(self.source_id, delta, commit_id=commit_id)
