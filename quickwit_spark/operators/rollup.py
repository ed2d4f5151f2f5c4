"""Pre-aggregated rollups (materialized time-bucket aggregates) with exact
merge-to-coarser-grain semantics — the log-analytics pattern that makes
dashboard queries over a 10^12-row table read R rollup rows instead of N
raw rows.

The partial layout is the classic mergeable-statistics tuple
(cnt, sum, sumsq, min, max): every one re-aggregates associatively, so a
rollup built at HOUR grain answers any DAY/WEEK/subset-of-keys question by
re-merging partials — no raw scan. Finalized stats (avg, variance) are
derived from partials at read time, never stored, so merges can never
produce the mean-of-means bug.

At 100 TB the shape is: one map-side-combined groupBy over the raw scan
writes the rollup (the only pass that touches raw data, typically appended
incrementally per ingest commit via :func:`rollup_upsert`); every query
thereafter is a groupBy over the rollup — row count = |keys| × buckets,
independent of raw volume. This is the Spark-native analog of the rollup /
downsampling planes log engines bolt on (the reference itself answers
date_histogram + metric aggs by scanning; a rollup is how the same answer
stays interactive at three more orders of magnitude).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_GRAINS = ("minute", "hour", "day", "week", "month", "year")

PARTIAL_COLS = ("cnt", "sum_v", "sumsq_v", "min_v", "max_v")


def _check_grain(grain: str) -> str:
    g = grain.lower()
    if g not in _GRAINS:
        raise ValueError(f"unknown grain {grain!r}; have {_GRAINS}")
    return g


def rollup_build(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    grain: str = "hour",
) -> DataFrame:
    """ONE pass over raw data → partials at ``grain``:
    (keys..., bucket, cnt, sum_v, sumsq_v, min_v, max_v). Null values are
    excluded from sum/min/max/sumsq but counted in cnt_null (not stored:
    cnt counts non-null values, matching SQL aggregate semantics)."""
    g = _check_grain(grain)
    v = F.col(value_col).cast("double")
    return (
        df.groupBy(
            *keys, F.date_trunc(g, F.col(ts_col)).alias("bucket")
        ).agg(
            F.count(v).cast("long").alias("cnt"),
            F.sum(v).alias("sum_v"),
            F.sum(v * v).alias("sumsq_v"),
            F.min(v).alias("min_v"),
            F.max(v).alias("max_v"),
        )
    )


def rollup_merge(
    rollup: DataFrame,
    keys: list[str],
    grain: str | None = None,
) -> DataFrame:
    """Re-aggregate partials to a coarser grain and/or a key subset.
    ``keys`` may be any subset of the build keys; ``grain`` must be coarser
    than (or equal to) the build grain — date_trunc of the bucket column
    enforces it structurally. Output schema == rollup_build's."""
    bucket = (
        F.date_trunc(_check_grain(grain), F.col("bucket"))
        if grain is not None
        else F.col("bucket")
    )
    return (
        rollup.groupBy(*keys, bucket.alias("bucket")).agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("sum_v").alias("sum_v"),
            F.sum("sumsq_v").alias("sumsq_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def rollup_upsert(
    existing: DataFrame, batch: DataFrame, keys: list[str]
) -> DataFrame:
    """Incremental maintenance: merge a new batch's partials into an
    existing rollup (same keys + grain). Union + re-merge — associativity
    makes this exact, so per-commit rollup appends compose to the same
    result as a full rebuild."""
    return rollup_merge(existing.unionByName(batch), keys, grain=None)


def rollup_finalize(rollup: DataFrame, keys: list[str]) -> DataFrame:
    """Partials → presentation stats: (keys..., bucket, cnt, sum_v, min_v,
    max_v, avg_v, var_v). Variance is population variance from the moment
    partials (sumsq/cnt − mean²), clamped at 0 against float cancellation;
    rounded to 6 places like the stats aggs. avg is derived from the
    ROUNDED sum so the presented value is reproducible across engines and
    accumulation orders (otherwise a sum that differs by 1 ulp can flip a
    round-half boundary)."""
    mean = F.col("sum_v") / F.col("cnt")
    mean_presented = F.round(F.col("sum_v"), 6) / F.col("cnt")
    var = F.greatest(
        F.col("sumsq_v") / F.col("cnt") - mean * mean, F.lit(0.0)
    )
    return rollup.select(
        *keys,
        "bucket",
        "cnt",
        F.round("sum_v", 6).alias("sum_v"),
        "min_v",
        "max_v",
        F.round(mean_presented, 6).alias("avg_v"),
        F.round(var, 6).alias("var_v"),
    )
