"""SparkSession factory with scale-aware defaults.

Defaults follow the deployment guidance for a large cluster while remaining
correct in ``local[N]``: AQE on (runtime coalesce + skew handling), Arrow on
(all our Python-side operators are pandas/Arrow vectorized, never per-row),
UTC session timezone (oracle comparisons against DuckDB are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "quickwit_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else ``local[*]``).
    ``shuffle_partitions`` defaults to the core count — on a real cluster this
    should be ~2-3x total executor cores; the pipeline code never depends on
    the value for correctness.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's coalescing targets BYTES per partition, but this engine's hot
        # stages (tokenize/explode/hash over text) are CPU-bound at tiny byte
        # sizes — the 64 MB default collapses them to 1-2 tasks and serializes
        # 32 cores. 8 MB keeps small shuffles spread across cores; on a real
        # cluster raise via QS_ADVISORY_PARTITION_BYTES (guide: 100 MB-1 GB
        # partitions for shuffle-bound jobs; coalescing never splits, so a
        # small advisory only stops over-merging).
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("QS_ADVISORY_PARTITION_BYTES", "8m"),
        )
        # allow shuffled-hash joins when the per-partition build side fits
        # (sort-merge pays an unnecessary sort for this engine's id-keyed
        # verify joins); spills fall back gracefully under AQE
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # malformed input must quarantine, never kill a job: a repeated k=v
        # key inside one log line (str_to_map in parse_stage) or a
        # duplicated OTLP attribute key (map_from_entries) dedups last-wins
        # instead of raising DUPLICATED_MAP_KEY
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("QS_DRIVER_MEMORY", "48g"))
    )
    if shuffle_partitions is None:
        # local mode: one partition per core keeps small-SF tests fast.
        ncpu = os.cpu_count() or 8
        shuffle_partitions = int(os.environ.get("QS_SHUFFLE_PARTITIONS", ncpu))
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None):
    """Register the driver-provided parquet tables as temp views; return dict."""
    if names is None:
        names = (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    dfs = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            dfs[name] = df
    return dfs
