"""Queue-notified file source (SQS pattern) with Quickwit's shard-table
exactly-once semantics.

Behavioral contract studied from quickwit-indexing/src/source/queue_sources/
(design.md + coordinator.rs / shared_state.rs / visibility.rs — behavior
only):

- the queue (SQS/PubSub analog) is AT-LEAST-ONCE: messages carry object
  URIs and may be redelivered after their visibility timeout;
- exactly-once comes from the SHARD TABLE, not the queue: each file URI is
  a shard; the first pipeline to open it gets ownership (its publish token
  is recorded); the shard is marked EOF in the same step that publishes
  the data, so a redelivered message for an EOF shard is simply
  acknowledged and dropped;
- a shard owned by ANOTHER pipeline is dropped without ack if its
  ownership is fresh (still being processed — the visibility timeout will
  redeliver), or ACQUIRED if stale (the owner presumably died). Concurrent
  acquires are allowed to race; the loser fails at commit time when its
  token no longer matches (design.md "fails at commit time");
- old EOF shards are pruned after a deduplication window.

The AWS SDK is absent here; :class:`FileQueue` is the at-least-once queue
double (visibility timeouts, redelivery, ack) and :class:`ShardTable` the
metastore Shard-API analog over JSON files. File contents are read
executor-side exactly like the file-tail source.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class FileQueue:
    """At-least-once queue double: one JSON file per message; receive()
    makes messages invisible for ``visibility_secs`` (they come back if
    neither acked nor extended — the SQS redelivery behavior)."""

    def __init__(self, root: str, visibility_secs: float = 30.0):
        self.root = root
        self.visibility_secs = visibility_secs
        os.makedirs(root, exist_ok=True)

    def send(self, uri: str) -> str:
        msg_id = uuid.uuid4().hex
        with open(os.path.join(self.root, f"{msg_id}.json"), "w") as fh:
            json.dump({"msg_id": msg_id, "uri": uri, "invisible_until": 0.0}, fh)
        return msg_id

    def receive(self, max_messages: int = 10, now: float | None = None) -> list[dict]:
        now = time.time() if now is None else now
        out = []
        for p in sorted(glob.glob(os.path.join(self.root, "*.json"))):
            with open(p) as fh:
                msg = json.load(fh)
            if msg["invisible_until"] > now:
                continue
            msg["invisible_until"] = now + self.visibility_secs
            with open(p, "w") as fh:
                json.dump(msg, fh)
            out.append(msg)
            if len(out) >= max_messages:
                break
        return out

    def extend_visibility(self, msg_id: str, secs: float, now: float | None = None) -> None:
        p = os.path.join(self.root, f"{msg_id}.json")
        now = time.time() if now is None else now
        with open(p) as fh:
            msg = json.load(fh)
        msg["invisible_until"] = now + secs
        with open(p, "w") as fh:
            json.dump(msg, fh)

    def acknowledge(self, msg_id: str) -> None:
        try:
            os.remove(os.path.join(self.root, f"{msg_id}.json"))
        except FileNotFoundError:
            pass  # ack is idempotent

    def size(self) -> int:
        return len(glob.glob(os.path.join(self.root, "*.json")))


class ShardTable:
    """Shard-API analog (shared_state.rs): one JSON record per file URI
    with (token, eof, updated_at). open() returns the OWNING token —
    callers compare it with their own to learn ownership."""

    def __init__(self, root: str, stale_secs: float = 60.0):
        self.dir = os.path.join(root, "_shards")
        self.stale_secs = stale_secs
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, uri: str) -> str:
        return os.path.join(self.dir, hashlib.sha256(uri.encode()).hexdigest()[:32] + ".json")

    def _read(self, uri: str) -> dict | None:
        try:
            with open(self._path(uri)) as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def open(self, uri: str, token: str, now: float | None = None) -> dict:
        """OpenShards semantics: first caller records its token; later
        callers get the existing record back."""
        now = time.time() if now is None else now
        rec = self._read(uri)
        if rec is None:
            rec = {"uri": uri, "token": token, "eof": False, "updated_at": now}
            tmp = self._path(uri) + f".tmp-{token[:8]}"
            with open(tmp, "w") as fh:
                json.dump(rec, fh)
            try:
                # O_EXCL-style create: the first rename wins; a loser simply
                # re-reads the winner's record
                os.link(tmp, self._path(uri))
                os.remove(tmp)
            except FileExistsError:
                os.remove(tmp)
                rec = self._read(uri)
        return rec

    def is_stale(self, rec: dict, now: float | None = None) -> bool:
        now = time.time() if now is None else now
        return not rec["eof"] and now - rec["updated_at"] > self.stale_secs

    def acquire(self, uri: str, token: str, now: float | None = None) -> dict:
        """AcquireShards: overwrite the token (deliberately racy — the
        loser of a concurrent acquire fails at commit time)."""
        now = time.time() if now is None else now
        rec = self._read(uri) or {"uri": uri, "eof": False}
        rec.update(token=token, updated_at=now)
        with open(self._path(uri), "w") as fh:
            json.dump(rec, fh)
        return rec

    def commit_eof(self, uri: str, token: str, now: float | None = None) -> None:
        """Mark the shard fully processed. Raises if ``token`` no longer
        owns the shard (a concurrent acquire stole it) — the commit-time
        conflict of design.md."""
        rec = self._read(uri)
        if rec is None or rec["token"] != token:
            raise RuntimeError(
                f"shard {uri} ownership lost (owner {rec and rec['token']})"
            )
        rec["eof"] = True
        rec["updated_at"] = time.time() if now is None else now
        with open(self._path(uri), "w") as fh:
            json.dump(rec, fh)

    def prune(self, dedup_window_secs: float, now: float | None = None) -> int:
        """PruneShards: drop EOF shards older than the dedup window."""
        now = time.time() if now is None else now
        n = 0
        for p in glob.glob(os.path.join(self.dir, "*.json")):
            with open(p) as fh:
                rec = json.load(fh)
            if rec["eof"] and now - rec["updated_at"] > dedup_window_secs:
                os.remove(p)
                n += 1
        return n


class SqsFileSource:
    """QueueCoordinator analog: receive → ownership check → distributed
    read → (caller publishes durably) → commit_eof + ack.

    ``poll()`` returns (DataFrame of new-file lines, list of processable
    messages); after durably writing the batch the caller calls
    :meth:`commit` with the same messages. Duplicate deliveries of
    completed files are acked inside poll() and never reach the caller."""

    def __init__(
        self,
        spark: SparkSession,
        queue: FileQueue,
        shard_root: str,
        token: str | None = None,
        stale_secs: float = 60.0,
    ):
        self.spark = spark
        self.queue = queue
        self.shards = ShardTable(shard_root, stale_secs=stale_secs)
        self.token = token or uuid.uuid4().hex

    def poll(self, max_messages: int = 10, now: float | None = None):
        msgs = self.queue.receive(max_messages, now=now)
        todo: list[dict] = []
        for msg in msgs:
            rec = self.shards.open(msg["uri"], self.token, now=now)
            if rec["eof"]:
                # duplicate of a completed file: ack + drop (design.md)
                self.queue.acknowledge(msg["msg_id"])
                continue
            if rec["token"] != self.token:
                if self.shards.is_stale(rec, now=now):
                    self.shards.acquire(msg["uri"], self.token, now=now)
                else:
                    # another pipeline is on it: drop WITHOUT ack, the
                    # visibility timeout will redeliver
                    continue
            todo.append(msg)
        if not todo:
            return None
        return self.read([m["uri"] for m in todo]), todo

    def read(self, uris: list[str]) -> DataFrame:
        from pyspark.sql import functions as F

        from quickwit_spark.sources._slices import read_line_slices

        specs = [(u, u, 0, -1) for u in sorted(set(uris))]
        return read_line_slices(self.spark, specs).select(
            "value",
            F.col("key").alias("uri"),
            F.col("line_index").alias("line_number"),
        )

    def commit(self, msgs: list[dict], now: float | None = None) -> None:
        """After the durable publish: EOF every shard (raising on lost
        ownership BEFORE any ack), then acknowledge the messages."""
        for msg in msgs:
            self.shards.commit_eof(msg["uri"], self.token, now=now)
        for msg in msgs:
            self.queue.acknowledge(msg["msg_id"])
