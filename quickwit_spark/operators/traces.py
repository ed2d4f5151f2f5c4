"""Trace-plane pipeline operators over a span frame — the decision/rollup
layer a log pipeline runs BETWEEN ingest and the Jaeger query surface
(operators/jaeger.py).

Behavioral contracts (no code ported):

- ``tail_sample``: tail-based trace sampling — the OpenTelemetry
  collector's tail-sampling decision model (decide per TRACE from an
  aggregate over its finished spans: error / latency / probabilistic
  policies, first match wins) executed in the reference's two-phase
  FindTraces shape (`qw/quickwit-jaeger/src/lib.rs:98-130`: aggregate to
  trace ids first, then fetch every span of the surviving ids).
- ``service_dependencies``: the Jaeger GetDependencies model — parent→child
  span links collapsed to service-level call edges
  (DependencyLink{parent, child, callCount}).
- ``red_metrics``: per-(service, time-bucket) Rate/Error/Duration rollups —
  the span-metrics shape, same family as the reference's date-histogram +
  terms aggregations (`qw/quickwit-search/src/collector.rs` aggregation
  pipeline) but keyed on the span schema.

Scale notes (10^12 spans): every operator here is one or two hash
shuffles keyed on trace_id / (service, bucket) with map-side partial
aggregation; no window over an unbounded trace, no driver-side state.
``red_metrics``' exact percentile is a sort-based aggregate per group —
for dashboard-grade quantiles over huge groups use the mergeable
histogram sketch (operators/rollup.py hist_build/hist_quantile) instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.operators.corpus import sample_mix_cols, _MIX_M1


def trace_decisions(
    spans: DataFrame,
    trace_col: str = "trace_id",
    duration_col: str = "duration_ms",
    error_col: str = "is_error",
    latency_threshold_ms: float | None = None,
    sample_rate: float = 0.0,
) -> DataFrame:
    """Phase 1 of tail sampling: one map-side-combined ``groupBy(trace)``
    producing the per-trace decision.

    Policy order (first match wins, the OTel composite-policy contract):

    1. ``error``        — any span of the trace has ``error_col`` true;
    2. ``latency``      — the trace's max span duration ≥ threshold;
    3. ``probabilistic``— deterministic hash fraction of the trace id
       (``sample_mix_cols`` k3 < rate·M — same engine-portable Lehmer
       mix as stratified_sample, so replays and engines agree exactly).

    Returns (trace, any_error, max_duration_ms, sample_reason) for kept
    traces only. The aggregate shuffles one row per trace regardless of
    span fan-in — hot 10^5-span traces cost nothing extra beyond their
    map-side partials.
    """
    per_trace = spans.groupBy(F.col(trace_col).alias(trace_col)).agg(
        F.max(F.col(error_col).cast("int")).cast("boolean").alias("any_error"),
        F.max(F.col(duration_col)).alias("max_duration_ms"),
    )
    k3 = sample_mix_cols(trace_col)[2]
    reason = F.when(F.col("any_error"), F.lit("error"))
    if latency_threshold_ms is not None:
        reason = reason.when(
            F.col("max_duration_ms") >= F.lit(latency_threshold_ms), F.lit("latency")
        )
    if sample_rate > 0.0:
        reason = reason.when(
            k3 < F.lit(float(sample_rate) * _MIX_M1), F.lit("probabilistic")
        )
    return (
        per_trace.withColumn("sample_reason", reason)
        .filter(F.col("sample_reason").isNotNull())
    )


def tail_sample(
    spans: DataFrame,
    trace_col: str = "trace_id",
    duration_col: str = "duration_ms",
    error_col: str = "is_error",
    latency_threshold_ms: float | None = None,
    sample_rate: float = 0.0,
    broadcast_decisions: bool | None = None,
) -> DataFrame:
    """Tail-based trace sampling: every span of every sampled trace, plus
    the trace's ``sample_reason``.

    Phase 2 fetch = join the span frame against the kept-trace id table on
    ``trace_col`` — the FindTraces fetch shape. ``broadcast_decisions``:
    True forces a broadcast hint (right when policies keep a small
    fraction), False forces a shuffle join, None (default) lets AQE pick
    from the decision table's runtime size — at 10^12 spans the kept-id
    table for a 1% probabilistic policy is still ~10^7 rows, so the
    default defers to the optimizer rather than guessing.
    """
    decisions = trace_decisions(
        spans, trace_col, duration_col, error_col, latency_threshold_ms, sample_rate
    ).select(trace_col, "sample_reason")
    if broadcast_decisions is True:
        decisions = F.broadcast(decisions)
    return spans.join(decisions, on=trace_col, how="inner")


def service_dependencies(
    spans: DataFrame,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_span_id",
    service_col: str = "service",
    duration_col: str | None = None,
) -> DataFrame:
    """Service dependency graph (Jaeger GetDependencies): join each child
    span to its parent WITHIN the same trace and collapse to service-level
    edges.

    Returns (parent_service, child_service, call_count[, avg_child_ms]).

    Scale shape: both sides hash-shuffle once on the composite
    (trace, span-id) key — joining on the pair keeps the key space dense
    and collision-free even when span ids repeat across traces — then the
    edge groupBy is catalog-sized (|services|²), map-side combined.
    Root spans (null parent) drop out of the inner join, exactly as
    Jaeger's dependency builder ignores them.
    """
    child_cols = [
        F.col(trace_col).alias("_t"),
        F.col(parent_col).alias("_p"),
        F.col(service_col).alias("child_service"),
    ]
    if duration_col is not None:
        child_cols.append(F.col(duration_col).alias("_child_ms"))
    children = spans.filter(F.col(parent_col).isNotNull()).select(*child_cols)
    parents = spans.select(
        F.col(trace_col).alias("_t"),
        F.col(span_col).alias("_p"),
        F.col(service_col).alias("parent_service"),
    )
    edges = children.join(parents, on=["_t", "_p"], how="inner")
    aggs = [F.count(F.lit(1)).alias("call_count")]
    if duration_col is not None:
        aggs.append(F.round(F.avg("_child_ms"), 6).alias("avg_child_ms"))
    return edges.groupBy("parent_service", "child_service").agg(*aggs)


def red_metrics(
    spans: DataFrame,
    service_col: str = "service",
    ts_col: str = "ts",
    duration_col: str = "duration_ms",
    error_col: Column | str = "is_error",
    grain: str = "day",
    percentile: float = 0.95,
) -> DataFrame:
    """RED (Rate / Errors / Duration) rollup per (service, time bucket):
    one map-side-combined groupBy.

    Returns (service, bucket, n_calls, n_errors, error_rate, avg_ms,
    max_ms, p_ms) with error_rate/avg/percentile rounded to 6 dp for
    cross-engine reproducibility (the rollup plane's lesson: derive
    presentation values from rounded terms).

    The exact interpolated percentile sorts each group's durations — fine
    at catalog×bucket group counts; switch to hist_quantile
    (operators/rollup.py) when individual groups stop fitting an executor.
    """
    err = F.col(error_col) if isinstance(error_col, str) else error_col
    return (
        spans.groupBy(
            F.col(service_col).alias("service"),
            F.date_trunc(grain, F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum(err.cast("long")).alias("n_errors"),
            F.round(F.avg(err.cast("double")), 6).alias("error_rate"),
            F.round(F.avg(duration_col), 6).alias("avg_ms"),
            F.max(duration_col).alias("max_ms"),
            F.round(F.percentile(F.col(duration_col), F.lit(percentile)), 6).alias(
                "p_ms"
            ),
        )
    )
