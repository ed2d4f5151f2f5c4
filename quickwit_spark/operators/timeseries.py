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


_PERIOD_UNITS = {"day": 1, "week": 7}


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    grain: str = "week",
) -> DataFrame:
    """Cohort retention — the log-analytics staple: bucket users by their
    first-seen period (the cohort), then count how many of each cohort are
    active again k periods later. ``grain``: day or week (fixed-width
    periods so the offset is a plain date arithmetic, engine-portable).

    Returns (cohort: timestamp, period_idx: long ≥ 0, n_users: long) —
    period_idx 0 is the cohort's own period, so n_users at 0 is cohort
    size and retention% = n_users(k) / n_users(0).

    Scale shape: ONE shuffle over raw data — groupBy(user) computes the
    user's first-seen period AND the distinct set of active periods in the
    same aggregate (collect_set of truncated buckets is bounded by
    periods-in-retention-window, not by the user's event count, because
    truncation happens BEFORE the set), then the cohort matrix is an
    explode + tiny groupBy over |cohorts| × |periods| cells. The classic
    self-join-on-user formulation shuffles the event table twice; this
    shape never re-reads it.
    """
    if grain not in _PERIOD_UNITS:
        raise ValueError(f"grain must be one of {sorted(_PERIOD_UNITS)}")
    days = _PERIOD_UNITS[grain]
    period = F.date_trunc(grain, F.col(ts_col))
    per_user = df.groupBy(user_col).agg(
        F.min(period).alias("cohort"),
        F.collect_set(period).alias("__periods"),
    )
    return (
        per_user.select(
            "cohort", F.explode("__periods").alias("__p")
        )
        .select(
            "cohort",
            (F.datediff(F.col("__p"), F.col("cohort")) / days)
            .cast("long")
            .alias("period_idx"),
        )
        .groupBy("cohort", "period_idx")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def transition_matrix(
    df: DataFrame,
    group_col: str,
    order_col: str,
    state_col: str,
    drop_null_states: bool = True,
) -> DataFrame:
    """First-order transition matrix over ordered per-group sequences —
    for agent transcripts: which tool follows which tool, which role
    follows which role (the Markov structure of trajectories); for logs:
    event-type flow. Consecutive pairs are taken WITHIN each group in
    ``order_col`` order; groups never chain into each other.

    Returns (from_state, to_state, n: long, p: double) where p is the
    row-normalized transition probability (n / Σ n over from_state),
    rounded to 6.

    Scale shape: one window shuffle on (group) for the lead pair, then a
    map-side-combined groupBy on the (from,to) pairs — state-pair
    cardinality, not event cardinality. No self-join (the lag/lead
    formulation reads the table once)."""
    from pyspark.sql import Window

    if drop_null_states:
        df = df.filter(F.col(state_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(order_col)
    pairs = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("__tot"))
    return pairs.join(F.broadcast(totals), "from_state").select(
        "from_state",
        "to_state",
        "n",
        F.round(F.col("n") / F.col("__tot"), 6).alias("p"),
    )


_GRAIN_SECONDS = {"hour": 3600, "day": 86400}


def breach_spans(
    buckets: DataFrame,
    series_cols: list[str],
    threshold: float,
    grain: str = "hour",
) -> DataFrame:
    """Collapse threshold breaches into maximal CONSECUTIVE spans — the
    alerting report behind "errors were elevated from 14:00 to 17:00":
    buckets where metric > threshold, grouped into islands of adjacent
    periods (gaps-and-islands: period_index − row_number is constant
    within a consecutive run). Adjacency is defined by ``grain`` — a
    missing (no-data) bucket breaks the span.

    Input: the (series..., bucket, metric) frame of :func:`bucket_metric`.
    Returns (series..., span_start, span_end, n_buckets, peak) — span
    bounds inclusive bucket timestamps.

    Scale shape: runs entirely on the bucket frame (already raw-volume
    independent); one window shuffle on (series) + one groupBy on the
    island key. Pure codegen, engine-portable arithmetic."""
    from pyspark.sql import Window

    if grain not in _GRAIN_SECONDS:
        raise ValueError(f"grain must be one of {sorted(_GRAIN_SECONDS)}")
    unit = _GRAIN_SECONDS[grain]
    flagged = buckets.filter(F.col("metric") > threshold)
    idx = F.floor(F.unix_timestamp(F.col("bucket")) / unit)
    w = Window.partitionBy(*series_cols).orderBy("bucket")
    return (
        flagged.withColumn("__island", idx - F.row_number().over(w))
        .groupBy(*series_cols, "__island")
        .agg(
            F.min("bucket").alias("span_start"),
            F.max("bucket").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.max("metric").alias("peak"),
        )
        .drop("__island")
    )


def pipeline_aggs(
    buckets: DataFrame,
    series_cols: list[str],
    moving_window: int = 3,
) -> DataFrame:
    """ES pipeline aggregations over a date_histogram result — the
    sibling-bucket family (public aggs DSL: ``derivative``,
    ``cumulative_sum``, ``moving_fn``/``moving_avg``) computed over the
    (series..., bucket, metric) frame:

    - ``derivative``: metric − previous bucket's metric (null for each
      series' first bucket, as ES emits no derivative there);
    - ``cum_sum``: running total in bucket order;
    - ``moving_avg``: trailing mean over the last ``moving_window``
      buckets INCLUDING the current one (ES moving_fn with
      ``shift = 0`` and window = moving_window), partial at the series
      head like ES.

    All three share ONE window partitioning (series, ordered by bucket),
    so the whole family costs a single exchange of the already-tiny
    bucket frame. Doubles rounded to 6."""
    from pyspark.sql import Window

    w = Window.partitionBy(*series_cols).orderBy("bucket")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    wm = w.rowsBetween(-(moving_window - 1), 0)
    return buckets.select(
        *series_cols,
        "bucket",
        "metric",
        F.round(F.col("metric") - F.lag("metric").over(w), 6).alias(
            "derivative"
        ),
        F.round(F.sum("metric").over(wc), 6).alias("cum_sum"),
        F.round(F.avg("metric").over(wm), 6).alias("moving_avg"),
    )


def slo_burn_rate(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str,
    error_pred: Column,
    budget: float = 0.01,
    short_minutes: int = 60,
    long_minutes: int = 360,
    threshold: float = 1.0,
    grain_minutes: int = 60,
) -> DataFrame:
    """Multi-window multi-burn-rate SLO alerting (the Google SRE workbook
    rule): per series and bucket, the error ratio over a trailing SHORT and
    trailing LONG window, each divided by the error budget; alert iff BOTH
    burn rates exceed ``threshold`` (the long window proves sustained burn,
    the short window guarantees the alert resets quickly once the burn
    stops). This is the alerting layer the reference leaves to an external
    evaluator polling its date-histogram aggregations — here it is the same
    one-pass bucket frame the rollup plane already produces.

    Shape at 10^12 rows: the groupBy to ``grain_minutes`` buckets is the
    only pass that touches raw rows (map-side combined: one row out per
    series x bucket). The trailing windows run with RANGE frames over epoch
    seconds on the BUCKET frame, whose size is bounded by the time span,
    not the data volume; partitioned by series, so no global sort.

    Trailing windows are time-based (RANGE), not row-based, so gaps
    (buckets with no traffic) shrink the window's sample rather than
    silently stretching it over more wall-clock.

    Returns (series..., bucket, n, n_err, plus short/long ratio + burn and
    the alert flag). Ratios and burns rounded to 6.
    """
    from pyspark.sql import Window

    sec = F.col("_epoch")
    step = grain_minutes * 60
    epoch_bucket = (F.floor(F.unix_timestamp(F.col(ts_col)) / step) * step).cast(
        "long"
    )
    buckets = (
        df.groupBy(*series_cols, epoch_bucket.alias("_epoch"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(error_pred.cast("long")).cast("long").alias("n_err"),
        )
        .withColumn("bucket", F.timestamp_seconds(sec))
    )
    base = Window.partitionBy(*series_cols).orderBy(sec)
    w_short = base.rangeBetween(-(short_minutes * 60 - 1), 0)
    w_long = base.rangeBetween(-(long_minutes * 60 - 1), 0)
    short_ratio = F.sum("n_err").over(w_short) / F.sum("n").over(w_short)
    long_ratio = F.sum("n_err").over(w_long) / F.sum("n").over(w_long)
    short_burn = short_ratio / F.lit(budget)
    long_burn = long_ratio / F.lit(budget)
    return buckets.select(
        *series_cols,
        "bucket",
        "n",
        "n_err",
        F.round(short_ratio, 6).alias("short_ratio"),
        F.round(long_ratio, 6).alias("long_ratio"),
        F.round(short_burn, 6).alias("short_burn"),
        F.round(long_burn, 6).alias("long_burn"),
        ((short_burn > threshold) & (long_burn > threshold)).alias("alert"),
    )


def log_throttle(
    df,
    quota: int,
    category_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
    grain: str = "hour",
    guard_min_stratum: int = 200_000,
):
    """Deterministic log throttling: keep at most ``quota`` rows per
    (categories × time bucket) — the ingestion rate-limit / exemplar rule
    that stops one chatty service from drowning a shared sink, with a
    reproducible (not first-come) survivor set.

    This IS stratified sampling with the stratum = category × bucket, so
    it delegates to corpus.stratified_sample and inherits its guarantees:
    the Lehmer-pair rank is engine/partitioning-independent, and the
    census-driven viral-stratum pre-filter bounds every window unit
    (~16·quota rows) even when one (service, hour) cell holds 10^9 rows.

    Returns (id, stratum, sample_rank) for the kept rows; semi-join on
    ``id_col`` to recover full payloads.
    """
    from quickwit_spark.operators.corpus import stratified_sample

    stratum = F.concat_ws(
        "|",
        *[F.col(c) for c in category_cols],
        F.unix_timestamp(F.date_trunc(grain, F.col(ts_col))).cast("string"),
    )
    keyed = df.withColumn("__stratum", stratum)
    return stratified_sample(
        keyed,
        quota,
        strata_col="__stratum",
        id_col=id_col,
        guard_min_stratum=guard_min_stratum,
    )
