"""Checkpoint table with Quickwit's delta-compatibility semantics.

Replicates quickwit-metastore/src/checkpoint.rs:286-330 (behavior only):

- A source checkpoint is a map ``partition_id → position`` (inclusive
  "consumed up to").
- A delta is ``(from, to]`` per partition. Applying requires
  ``from == current`` (contiguous) or ``from > current`` (gap — applied
  with a warning). ``from < current`` ⇒ overlap ⇒
  ``IncompatibleCheckpointDelta`` and the checkpoint is left unchanged —
  this is what makes replays idempotent (exactly-once publish).
- Positions compare as zero-padded 20-digit strings for numeric offsets
  (checkpoint.rs:68-79); ``""`` is Beginning.

Storage: a parquet append-log under ``<dir>/_checkpoints``; the current
checkpoint is the last committed row per (source_id, partition_id). A commit
is staged as ``.tmp-`` files then renamed — single-writer semantics, same
trust model as the reference's metastore transaction. (On a real deployment
this table would be an Iceberg table committed atomically with the data;
parquet + rename is the sandbox stand-in behind the same interface.)
"""

from __future__ import annotations

import glob
import json
import logging
import os
import uuid

logger = logging.getLogger(__name__)


class IncompatibleCheckpointDelta(Exception):
    pass


class EmptyOrNegativeDelta(Exception):
    pass


def format_position(pos: int | str | None) -> str:
    """Zero-padded 20-digit string for ints; '' = Beginning."""
    if pos is None:
        return ""
    if isinstance(pos, int):
        return f"{pos:020d}"
    return pos


class CheckpointStore:
    """File-backed checkpoint log (one JSON line per committed delta)."""

    def __init__(self, root: str):
        self.dir = os.path.join(root, "_checkpoints")
        os.makedirs(self.dir, exist_ok=True)

    def current(self, source_id: str) -> dict[str, str]:
        """partition_id → inclusive position (the max committed `to`)."""
        state: dict[str, str] = {}
        for path in sorted(glob.glob(os.path.join(self.dir, "*.json"))):
            with open(path) as fh:
                for line in fh:
                    rec = json.loads(line)
                    if rec["source_id"] != source_id:
                        continue
                    pid = rec["partition_id"]
                    # file order is commit-id order, not commit time; the
                    # compat check makes positions monotone, so max is current
                    if rec["to"] > state.get(pid, ""):
                        state[pid] = rec["to"]
        return state

    def check_compatibility(
        self, source_id: str, delta: dict[str, tuple[int | str | None, int | str]]
    ) -> None:
        """delta: partition_id → (from_exclusive, to_inclusive).

        Raises on overlap; warns on gap (checkpoint.rs:286-330).
        """
        current = self.current(source_id)
        for pid, (frm, to) in delta.items():
            f, t = format_position(frm), format_position(to)
            if t <= f:
                raise EmptyOrNegativeDelta(f"partition {pid}: delta ({f!r}, {t!r}] is empty")
            cur = current.get(pid, "")
            if f < cur:
                raise IncompatibleCheckpointDelta(
                    f"partition {pid}: delta from {f!r} overlaps current position {cur!r}"
                )
            if f > cur:
                logger.warning(
                    "checkpoint gap on source %s partition %s: current %r, delta from %r",
                    source_id, pid, cur, f,
                )

    def commit(
        self,
        source_id: str,
        delta: dict[str, tuple[int | str | None, int | str]],
        commit_id: str | None = None,
    ) -> str:
        """Validate + atomically append the delta. Returns the commit id."""
        self.check_compatibility(source_id, delta)
        commit_id = commit_id or uuid.uuid4().hex
        lines = [
            json.dumps(
                {
                    "source_id": source_id,
                    "partition_id": pid,
                    "from": format_position(frm),
                    "to": format_position(to),
                    "commit_id": commit_id,
                }
            )
            for pid, (frm, to) in sorted(delta.items())
        ]
        tmp = os.path.join(self.dir, f".tmp-{commit_id}.json")
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        os.rename(tmp, os.path.join(self.dir, f"{commit_id}.json"))
        return commit_id

    def already_committed(self, source_id: str, delta: dict) -> bool:
        """True iff every delta partition is already fully consumed —
        the idempotent-replay fast path."""
        current = self.current(source_id)
        return all(
            format_position(to) <= current.get(pid, "")
            for pid, (_, to) in delta.items()
        )

    def reset_source(self, source_id: str) -> int:
        """Drop every committed position of ``source_id`` (the
        reset-checkpoint endpoint's storage effect: the next run replays
        the source from Beginning). Other sources' records in the same
        commit files are preserved; each file is rewritten atomically
        (tmp + rename). Returns the number of records dropped."""
        dropped = 0
        for path in sorted(glob.glob(os.path.join(self.dir, "*.json"))):
            kept_lines = []
            file_dropped = 0
            with open(path) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    if json.loads(line)["source_id"] == source_id:
                        file_dropped += 1
                    else:
                        kept_lines.append(line.rstrip("\n"))
            if not file_dropped:
                continue
            dropped += file_dropped
            if kept_lines:
                tmp = path + ".tmp"
                with open(tmp, "w") as fh:
                    fh.write("\n".join(kept_lines) + "\n")
                os.rename(tmp, path)
            else:
                os.remove(path)
        return dropped
