"""Iceberg table sink/source, gated behind runtime availability.

The production deployment target (BASELINE.json north star) stores sinks,
lineage and checkpoints as Iceberg tables: the `sinks` fan-out becomes a
partitioned Iceberg table, and "publish" = ONE Iceberg transaction committing
the data files AND the checkpoint row atomically (the exact analog of the
reference's metastore publish, SURVEY §2.4). Retention/GC map to
`expire_snapshots` / `remove_orphan_files`, merge to `rewrite_data_files`.

This sandbox ships no Iceberg jars, so everything here degrades to the
parquet-directory layout the rest of the package uses — same interface,
weaker atomicity (rename-based), which the checkpoint compat check already
tolerates. The import-try keeps the code importable and TESTED on the
fallback path; on a real cluster set::

    spark.sql.catalog.qw              org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.qw.type        hadoop            # or hive/rest
    spark.sql.catalog.qw.warehouse   s3://bucket/warehouse
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg SparkCatalog is on the classpath AND a catalog is
    configured. Never raises."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        return False
    try:
        for key in spark.sparkContext.getConf().getAll():
            if key[0].startswith("spark.sql.catalog.") and "iceberg" in key[1].lower():
                return True
    except Exception:
        pass
    return False


def write_sink(
    spark: SparkSession,
    df: DataFrame,
    target: str,
    partition_cols: tuple[str, ...] = ("sink",),
    mode: str = "append",
) -> str:
    """Write a sink table: Iceberg table if available (atomic snapshot
    commit), else a parquet directory (per-commit overwrite idempotency is
    handled by the callers). ``target`` is a table name under the configured
    catalog, or a filesystem path on the fallback. Returns the engine used.
    """
    if iceberg_available(spark) and not os.path.isabs(target):
        writer = df.writeTo(target)
        if mode == "append":
            try:
                writer.append()
            except Exception:
                writer.partitionedBy(*partition_cols).create()
        else:
            writer.partitionedBy(*partition_cols).createOrReplace()
        return "iceberg"
    (
        df.write.mode("overwrite" if mode != "append" else "append")
        .partitionBy(*partition_cols)
        .parquet(target)
    )
    return "parquet"


def read_sink(spark: SparkSession, target: str) -> DataFrame:
    """Read a sink table written by :func:`write_sink` from either engine."""
    if iceberg_available(spark) and not os.path.isabs(target):
        return spark.read.table(target)
    return spark.read.parquet(target)
