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


def hist_build(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    grain: str,
    lo: float,
    hi: float,
    nbins: int = 64,
) -> DataFrame:
    """Mergeable histogram sketch partials — the quantile plane of the
    rollup story: one raw pass bins values into ``nbins`` uniform buckets
    over [lo, hi) (outliers clamp into the edge bins, the standard
    fixed-range HDR trade-off), producing (keys..., bucket, bin, cnt)
    rows. Partials merge by PLAIN SUM — coarser grains, key subsets, and
    incremental appends all reuse :func:`hist_merge` — so a p99 dashboard
    over 10^12 rows reads |keys|×|buckets|×nbins sketch rows, never raw
    data. Quantile error is bounded by one bin width by construction
    (tested), the knob being nbins.

    Engine-portable bin arithmetic (floor-scale-clamp), no UDF."""
    if nbins < 1 or not hi > lo:
        raise ValueError("need nbins >= 1 and hi > lo")
    v = F.col(value_col).cast("double")
    raw_bin = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(nbins))
    bin_ = F.least(F.greatest(raw_bin, F.lit(0)), F.lit(nbins - 1))
    return (
        df.filter(v.isNotNull())
        .groupBy(
            *keys,
            F.date_trunc(_check_grain(grain), F.col(ts_col)).alias("bucket"),
            bin_.cast("long").alias("bin"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hist_merge(
    hist: DataFrame, keys: list[str], grain: str | None = None
) -> DataFrame:
    """Re-aggregate histogram partials to a coarser grain / key subset —
    plain sum per (keys, bucket, bin)."""
    bucket = (
        F.date_trunc(_check_grain(grain), F.col("bucket"))
        if grain is not None
        else F.col("bucket")
    )
    return hist.groupBy(*keys, bucket.alias("bucket"), "bin").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def hist_quantile(
    hist: DataFrame,
    keys: list[str],
    q: float,
    lo: float,
    hi: float,
    nbins: int = 64,
) -> DataFrame:
    """Quantile estimate from merged histogram partials: per (keys...,
    bucket), find the first bin whose cumulative count reaches
    ``ceil(q·n)`` and interpolate linearly inside it —
    ``lo + (bin + (target − cum_before)/cnt) · width``. Deterministic,
    engine-portable arithmetic; |estimate − exact| ≤ one bin width
    whenever the true quantile lies inside [lo, hi).

    Runs entirely on the sketch frame: one window cumsum + one groupBy.
    Returns (keys..., bucket, n: long, q_est: double rounded to 6)."""
    from pyspark.sql import Window

    if not 0.0 < q <= 1.0:
        raise ValueError("q must be in (0, 1]")
    width = (hi - lo) / nbins
    grp = [*keys, "bucket"]
    w = Window.partitionBy(*grp).orderBy("bin")
    wn = Window.partitionBy(*grp)
    cum = hist.select(
        *grp,
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("__cum"),
        F.sum("cnt").over(wn).alias("__n"),
    )
    target = F.ceil(F.lit(q) * F.col("__n")).cast("double")
    frac = (target - (F.col("__cum") - F.col("cnt"))) / F.col("cnt")
    est = F.lit(lo) + (F.col("bin") + frac) * F.lit(width)
    return (
        cum.filter(F.col("__cum") >= target)
        .groupBy(*grp)
        .agg(
            F.max("__n").cast("long").alias("n"),
            F.round(F.min_by(est, F.col("bin")), 6).alias("q_est"),
        )
    )
