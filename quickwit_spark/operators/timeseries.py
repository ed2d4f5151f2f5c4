"""Time-series anomaly flagging over bucketed log metrics — the alerting
primitive of a log-analytics plane: bucket a metric per series (e.g. error
count per tenant per hour), then flag buckets whose value deviates from the
series' own typical level by a robust threshold.

Detection is the modified z-score of Iglewicz & Hoaglin (public NIST
handbook): ``0.6745 · (x − median) / MAD`` with MAD = median absolute
deviation. Median/MAD resist the very outliers being hunted (a mean/stddev
gate moves toward its own anomalies), which is why it is the standard
robust rule for ops telemetry.

Scale shape: the ONLY pass over raw data is the bucketing groupBy
(map-side-combined; output = |series| × |buckets| rows, independent of raw
volume — at 10^12 turns the bucket frame is millions of rows, not
trillions). The median/MAD passes and the final join run on that small
bucket frame; per-series stats broadcast back. Exact interpolated
percentiles (Spark ``percentile`` ≡ DuckDB ``quantile_cont``) keep the
operator engine-portable and deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bucket_metric(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    grain: str = "hour",
    metric: Column | None = None,
) -> DataFrame:
    """Raw rows → (series..., bucket, metric). ``metric`` is any aggregate
    Column (default: row count). One map-side-combined shuffle."""
    m = metric if metric is not None else F.count(F.lit(1))
    return df.groupBy(
        *series_cols, F.date_trunc(grain, F.col(ts_col)).alias("bucket")
    ).agg(m.cast("double").alias("metric"))


def robust_anomalies(
    buckets: DataFrame,
    series_cols: list[str],
    threshold: float = 3.5,
) -> DataFrame:
    """Flag anomalous buckets per series via the modified z-score.

    A series whose MAD is 0 (more than half its buckets share one value —
    e.g. a flat-lined counter) yields a null score; such buckets are never
    flagged (matching the NIST rule's domain), so constant series cannot
    spam alerts on a single changed bucket without a caller opt-in.

    Returns buckets + (med, mad, score, is_anomaly); score rounded to 6.
    Two tiny groupBys over the bucket frame + one broadcast join back.
    """
    med = buckets.groupBy(*series_cols).agg(
        F.percentile("metric", 0.5).alias("med")
    )
    with_med = buckets.join(F.broadcast(med), series_cols)
    mad = (
        with_med.groupBy(*series_cols)
        .agg(F.percentile(F.abs(F.col("metric") - F.col("med")), 0.5).alias("mad"))
    )
    scored = with_med.join(F.broadcast(mad), series_cols)
    score = F.when(
        F.col("mad") > 0,
        F.round(
            F.lit(0.6745) * (F.col("metric") - F.col("med")) / F.col("mad"), 6
        ),
    )
    return scored.select(
        *series_cols,
        "bucket",
        "metric",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        score.alias("score"),
        F.coalesce(F.abs(score) > F.lit(threshold), F.lit(False)).alias(
            "is_anomaly"
        ),
    )
