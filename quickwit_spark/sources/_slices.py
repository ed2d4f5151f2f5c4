"""Shared executor-side line-slice reader for the tail sources.

Kafka/Kinesis/Pulsar brokers (file-backed doubles) and the SQS file source
all reduce to the same distributed read: a driver-planned list of
(path, key, start_line, end_line) slices fanned out one-per-task via
``mapInPandas``, each task opening its file and emitting the lines whose
index falls in ``[start, end)``. Centralizing it means encoding handling,
newline semantics and empty-batch dtypes are fixed in ONE place — each
source derives its own column shape from (key, line_index, value) with
plain Column expressions afterwards.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SLICE_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("line_index", T.LongType()),
    T.StructField("value", T.StringType()),
])


def read_line_slices(
    spark: SparkSession, specs: list[tuple[str, str, int, int]]
) -> DataFrame:
    """``specs``: (path, key, start_line, end_line) — lines with index in
    ``[start, end)`` (``end = -1`` → to EOF). Returns (key, line_index,
    value); one slice per task."""
    spec_df = spark.createDataFrame(
        specs, "path string, key string, start long, end long"
    ).repartition(max(len(specs), 1))

    def read_slices(batches):
        for pdf in batches:
            keys, idxs, vals = [], [], []
            for path, key, start, end in zip(
                pdf["path"], pdf["key"], pdf["start"], pdf["end"]
            ):
                start, end = int(start), int(end)
                with open(path, encoding="utf-8") as fh:
                    for i, line in enumerate(fh):
                        if i < start or (end >= 0 and i >= end):
                            continue
                        keys.append(key)
                        idxs.append(i)
                        vals.append(line.rstrip("\n"))
            yield pd.DataFrame(
                {
                    "key": pd.array(keys, dtype="string"),
                    "line_index": pd.array(idxs, dtype="int64"),
                    "value": pd.array(vals, dtype="string"),
                }
            )

    return spec_df.mapInPandas(read_slices, schema=SLICE_SCHEMA)
