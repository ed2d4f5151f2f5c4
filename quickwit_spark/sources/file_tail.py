"""File-tail source: checkpointed per-file byte offsets, exactly-once.

Spark re-expression of the reference's file source
(quickwit-indexing/src/source/doc_file_reader.rs:83-136 — behavior only):
the source checkpoint is ``file path → byte offset consumed``; each poll
reads only the NEW bytes of each file, cut at the last complete newline
(a partially-written trailing line is left for the next poll), and the
offset delta is published through the same
:class:`~quickwit_spark.pipeline.checkpoint.CheckpointStore` compat check as
the batch pipeline — an overlap replay is rejected, so a crash between data
write and checkpoint commit replays exactly one chunk (same publish model as
Kafka offsets; this is the sandbox stand-in for a broker-backed source).

Scale design: the driver touches METADATA only (file sizes + a bounded
backward scan for the newline cut); the byte ranges are read executor-side —
one (file, start, end) slice per task via ``mapInPandas``, so a poll over
thousands of files fans out like any other scan. New files are picked up
automatically (offset starts at 0).
"""

from __future__ import annotations

import glob as globmod
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from quickwit_spark.pipeline.checkpoint import CheckpointStore

_LINES_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType(), False),
        T.StructField("byte_offset", T.LongType(), False),
        T.StructField("line", T.StringType(), True),
    ]
)


def _newline_cut(path: str, start: int, size: int, block: int = 1 << 20) -> int:
    """Largest offset in (start, size] that ends a complete line; ``start``
    if no complete new line exists yet (partial trailing line ⇒ wait)."""
    with open(path, "rb") as fh:
        pos = size
        while pos > start:
            lo = max(start, pos - block)
            fh.seek(lo)
            buf = fh.read(pos - lo)
            idx = buf.rfind(b"\n")
            if idx >= 0:
                return lo + idx + 1
            pos = lo
    return start


class FileTailSource:
    """Poll/commit interface over a file glob with external offsets."""

    def __init__(self, spark: SparkSession, pattern: str, out_dir: str, source_id: str = "file_tail"):
        self.spark = spark
        self.pattern = pattern
        self.source_id = source_id
        self.store = CheckpointStore(out_dir)

    def plan(self) -> dict[str, tuple[int, int]]:
        """``file → (from_offset_exclusive, to_offset_inclusive]`` for every
        file with new complete lines. Metadata-only on the driver."""
        current = self.store.current(self.source_id)
        delta: dict[str, tuple[int, int]] = {}
        for path in sorted(globmod.glob(self.pattern)):
            start = int(current.get(path) or 0)
            size = os.path.getsize(path)
            if size <= start:
                continue
            cut = _newline_cut(path, start, size)
            if cut > start:
                delta[path] = (start, cut)
        return delta

    def read(self, delta: dict[str, tuple[int, int]]) -> DataFrame:
        """Distributed read of the planned byte slices: one row per line,
        with its starting byte offset (stable replay identity)."""
        specs = [(path, frm, to) for path, (frm, to) in sorted(delta.items())]
        spec_df = self.spark.createDataFrame(
            specs, "file string, start long, end long"
        ).repartition(max(len(specs), 1))

        def read_slices(batches):
            for pdf in batches:
                files, offs, lines = [], [], []
                for path, start, end in zip(pdf["file"], pdf["start"], pdf["end"]):
                    with open(path, "rb") as fh:
                        fh.seek(int(start))
                        data = fh.read(int(end) - int(start))
                    off = int(start)
                    for raw in data.split(b"\n")[:-1]:  # end cut ⇒ trailing ''
                        files.append(path)
                        offs.append(off)
                        lines.append(raw.decode("utf-8", errors="replace"))
                        off += len(raw) + 1
                yield pd.DataFrame({"file": files, "byte_offset": offs, "line": lines})

        return spec_df.mapInPandas(read_slices, schema=_LINES_SCHEMA)

    def poll(self) -> tuple[DataFrame, dict] | None:
        """One micro-batch: (lines DataFrame, delta) or None if nothing new.

        The caller durably writes its outputs, then calls :meth:`commit`
        with the same delta — publish-after-durable, exactly-once."""
        delta = self.plan()
        if not delta:
            return None
        self.store.check_compatibility(self.source_id, delta)
        return self.read(delta), delta

    def commit(self, delta: dict, commit_id: str | None = None) -> str:
        return self.store.commit(self.source_id, delta, commit_id=commit_id)
