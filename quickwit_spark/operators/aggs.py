"""ES-compatible aggregations, Spark-first.

Replicates the aggregation semantics Quickwit exposes
(quickwit-query/src/aggregations.rs:86-195, docs/reference/aggregation.md —
behavior only). Every bucket/metric agg compiles to built-in Spark
aggregates (partial/final hash aggregation, WholeStageCodegen) — no Python
in the aggregation path. Distributed-merge concerns from the reference
(leaf partial aggs merged at root, collector.rs:870-905) are Spark's
partial/final HashAggregate, which we get for free.

Flat DataFrame outputs (drive the oracle checks); :func:`run_es_aggs`
interprets an ES-JSON aggregations request into the nested response shape
for golden-vector parity (rest-api-tests/scenarii/aggregations).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# intervals
# ---------------------------------------------------------------------------

_INTERVAL_RE = re.compile(r"^(-?\d+)(ms|s|m|h|d)$")
_UNIT_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}


def interval_to_millis(interval: str) -> int:
    """Parse a fixed_interval (ms|s|m|h|d only — no calendar intervals,
    matching Quickwit's date_histogram restriction)."""
    m = _INTERVAL_RE.match(interval.strip())
    if not m:
        raise ValueError(f"invalid fixed_interval `{interval}` (expected e.g. 30d, 5m, 100ms)")
    return int(m.group(1)) * _UNIT_MS[m.group(2)]


def _ts_ms(col: Column) -> Column:
    """Epoch millis of a timestamp column; tolerates TIMESTAMP_NTZ parquet
    columns (session timezone is pinned UTC, so the cast is lossless)."""
    return F.unix_millis(col.cast("timestamp"))


def _bucket_key(value_ms: Column, interval_ms: int, offset_ms: int) -> Column:
    # key = floor((val - offset) / interval) * interval + offset
    # (docs/reference/aggregation.md:329-333); F.floor handles negatives
    return (
        F.floor((value_ms - F.lit(offset_ms)) / F.lit(interval_ms)) * F.lit(interval_ms)
        + F.lit(offset_ms)
    ).cast("long")


def key_as_string_col(key_ms: Column) -> Column:
    """Epoch-millis bucket key → RFC3339 string (UTC session timezone)."""
    ts = F.timestamp_millis(key_ms)
    base = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
    frac = key_ms % 1000
    return F.when(frac == 0, F.concat(base, F.lit("Z"))).otherwise(
        F.concat(base, F.lit("."), F.lpad(frac.cast("string"), 3, "0"), F.lit("Z"))
    )


# ---------------------------------------------------------------------------
# metric sub-agg expressions (shared by all bucket aggs: one shuffle total)
# ---------------------------------------------------------------------------


def metric_exprs(metrics: dict[str, tuple[str, str]] | None, prefix: str = "") -> list[Column]:
    """``{out_name: (kind, field)}`` → aggregate Columns.

    Kinds: avg, sum, min, max, value_count, cardinality (approx),
    cardinality_exact, stats_* via explicit kinds, variance/std via
    extended-stats kinds, percentile_approx handled by `percentiles()`.
    """
    out: list[Column] = []
    for name, (kind, fld) in (metrics or {}).items():
        c = F.col(fld)
        if kind == "avg":
            e = F.avg(c)
        elif kind == "sum":
            e = F.sum(c)
        elif kind == "min":
            e = F.min(c)
        elif kind == "max":
            e = F.max(c)
        elif kind == "value_count":
            e = F.count(c)
        elif kind == "cardinality":
            e = F.approx_count_distinct(c)
        elif kind == "cardinality_exact":
            e = F.countDistinct(c)
        elif kind == "var_pop":
            e = F.var_pop(c)
        elif kind == "stddev_pop":
            e = F.stddev_pop(c)
        else:
            raise ValueError(f"unknown metric kind `{kind}`")
        out.append(e.alias(prefix + name))
    return out


# ---------------------------------------------------------------------------
# bucket aggs
# ---------------------------------------------------------------------------


def date_histogram(
    df: DataFrame,
    field: str,
    fixed_interval: str,
    offset: str = "0ms",
    min_doc_count: int = 0,
    extended_bounds: tuple[int, int] | None = None,
    hard_bounds: tuple[int, int] | None = None,
    metrics: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Quickwit/ES date_histogram over a timestamp column.

    Returns ``(key: long epoch-millis, key_as_string, doc_count, *metrics)``
    ordered by key. ``min_doc_count=0`` gap-fills empty buckets between the
    first and last occupied bucket (extended by ``extended_bounds``) — done
    with one extra tiny aggregate + ``sequence`` explode + broadcast outer
    join, so the scale path stays a single shuffle over the fact table.
    """
    interval_ms = interval_to_millis(fixed_interval)
    offset_ms = interval_to_millis(offset) if isinstance(offset, str) else int(offset)

    val_ms = _ts_ms(F.col(field))
    base = df.filter(F.col(field).isNotNull())
    if hard_bounds is not None:
        lo, hi = hard_bounds
        kc = _bucket_key(_ts_ms(F.col(field)), interval_ms, offset_ms)
        base = base.filter((kc >= F.lit(lo)) & (kc <= F.lit(hi)))

    buckets = (
        base.groupBy(_bucket_key(val_ms, interval_ms, offset_ms).alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"), *metric_exprs(metrics))
    )

    if min_doc_count == 0:
        # bounds of the gap-fill domain
        bounds = buckets.agg(
            F.min("key").alias("lo"), F.max("key").alias("hi")
        )
        if extended_bounds is not None:
            eb_lo, eb_hi = extended_bounds
            lo_c = _bucket_key(F.lit(eb_lo), interval_ms, offset_ms)
            hi_c = _bucket_key(F.lit(eb_hi), interval_ms, offset_ms)
            bounds = bounds.select(
                F.least(F.col("lo"), lo_c).alias("lo"),
                F.greatest(F.col("hi"), hi_c).alias("hi"),
            )
        domain = (
            bounds.filter(F.col("lo").isNotNull())
            .select(
                F.explode(
                    F.sequence(F.col("lo"), F.col("hi"), F.lit(interval_ms))
                ).alias("key")
            )
        )
        buckets = (
            domain.join(buckets, "key", "left")
            .select(
                "key",
                *[
                    F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count")
                    if name == "doc_count"
                    else F.col(name)
                    for name in ["doc_count", *(metrics or {})]
                ],
            )
        )
    elif min_doc_count > 1:
        buckets = buckets.filter(F.col("doc_count") >= min_doc_count)

    return buckets.select(
        "key", key_as_string_col(F.col("key")).alias("key_as_string"), "doc_count",
        *[F.col(n) for n in (metrics or {})],
    ).orderBy("key")


def histogram(
    df: DataFrame,
    field: str,
    interval: float,
    offset: float = 0.0,
    min_doc_count: int = 0,
    metrics: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Numeric histogram; same key formula on doubles."""
    key = (
        F.floor((F.col(field) - F.lit(offset)) / F.lit(interval)) * F.lit(interval)
        + F.lit(offset)
    ).cast("double")
    buckets = (
        df.filter(F.col(field).isNotNull())
        .groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"), *metric_exprs(metrics))
    )
    if min_doc_count == 0:
        bounds = buckets.agg(F.min("key").alias("lo"), F.max("key").alias("hi"))
        domain = bounds.filter(F.col("lo").isNotNull()).select(
            F.explode(F.sequence(F.lit(0), ((F.col("hi") - F.col("lo")) / interval).cast("long")))
            .alias("i"),
            "lo",
        ).select((F.col("lo") + F.col("i") * interval).alias("key"))
        buckets = domain.join(buckets, "key", "left").select(
            "key",
            F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count"),
            *[F.col(n) for n in (metrics or {})],
        )
    elif min_doc_count > 1:
        buckets = buckets.filter(F.col("doc_count") >= min_doc_count)
    return buckets.orderBy("key")


def terms(
    df: DataFrame,
    field: str,
    size: int = 10,
    min_doc_count: int = 1,
    missing: Any | None = None,
    metrics: dict[str, tuple[str, str]] | None = None,
    order_by_key: bool = False,
) -> DataFrame:
    """Terms agg: top-``size`` buckets by doc_count desc (key asc tiebreak).

    Exact mode (no per-shard cutoff): ``doc_count_error_upper_bound`` is 0,
    matching the reference when a single segment is searched. Emits
    ``sum_other_doc_count`` via one extra global count.
    """
    key = F.col(field)
    if missing is not None:
        key = F.coalesce(key, F.lit(missing))
    grouped = (
        df.withColumn("__key", key)
        .filter(F.col("__key").isNotNull())
        .groupBy(F.col("__key").alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"), *metric_exprs(metrics))
    )
    if min_doc_count > 1:
        grouped = grouped.filter(F.col("doc_count") >= min_doc_count)
    if order_by_key:
        return grouped.orderBy("key").limit(size)
    return grouped.orderBy(F.col("doc_count").desc(), F.col("key").asc()).limit(size)


def terms_with_other(df: DataFrame, field: str, size: int = 10) -> tuple[DataFrame, int, int]:
    """(buckets, sum_other_doc_count, doc_count_error_upper_bound=0)."""
    buckets = terms(df, field, size=size)
    total = df.filter(F.col(field).isNotNull()).count()
    in_buckets = buckets.agg(F.sum("doc_count")).collect()[0][0] or 0
    return buckets, int(total - in_buckets), 0


def multi_terms(
    df: DataFrame,
    fields: list[str],
    size: int = 10,
    metrics: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Tuple-key terms; key_as_string is the pipe-joined key
    (aggregations.rs:392-401)."""
    cols = [F.col(f) for f in fields]
    not_null = cols[0].isNotNull()
    for c in cols[1:]:
        not_null = not_null & c.isNotNull()
    grouped = (
        df.filter(not_null)
        .groupBy(*[c.alias(f) for c, f in zip(cols, fields)])
        .agg(F.count(F.lit(1)).alias("doc_count"), *metric_exprs(metrics))
        .withColumn(
            "key_as_string",
            F.concat_ws("|", *[F.col(f).cast("string") for f in fields]),
        )
    )
    return grouped.orderBy(F.col("doc_count").desc(), F.col("key_as_string").asc()).limit(size)


def range_agg(
    df: DataFrame,
    field: str,
    ranges: list[dict],
    metrics: dict[str, tuple[str, str]] | None = None,
    keyed_names: bool = True,
) -> DataFrame:
    """ES range agg: user buckets ``[from, to)``; unbounded edges allowed.

    Bucket name defaults to ``from-to`` with ``*`` for open edges. Ranges may
    OVERLAP — a doc is counted in every matching range (ES semantics), so the
    row fans out via an explode over its matching range keys (still one
    shuffle; rows matching nothing drop at the explode).
    """
    c = F.col(field)
    tagged = []
    names = []
    for r in ranges:
        frm, to = r.get("from"), r.get("to")
        name = r.get("key") or f"{frm if frm is not None else '*'}-{to if to is not None else '*'}"
        names.append(name)
        cond = F.lit(True)
        if frm is not None:
            cond = cond & (c >= F.lit(frm))
        if to is not None:
            cond = cond & (c < F.lit(to))
        tagged.append(F.when(cond, F.lit(name)))
    matching = F.filter(F.array(*tagged), lambda x: x.isNotNull())
    grouped = (
        df.filter(c.isNotNull())
        .withColumn("range_key", F.explode(matching))
        .groupBy("range_key")
        .agg(F.count(F.lit(1)).alias("doc_count"), *metric_exprs(metrics))
    )
    # emit empty buckets too (ES returns all requested ranges)
    spark = df.sparkSession
    all_names = spark.createDataFrame([(n,) for n in names], ["range_key"])
    return (
        all_names.join(grouped, "range_key", "left")
        .select(
            "range_key",
            F.coalesce("doc_count", F.lit(0)).alias("doc_count"),
            *[F.col(n) for n in (metrics or {})],
        )
    )


def composite(
    df: DataFrame,
    sources: list[str],
    size: int = 10,
    after: dict[str, Any] | None = None,
) -> DataFrame:
    """Composite agg: cross-product buckets ordered by keys, paginated by
    ``after_key`` (aggregations.rs:176-183). The after-filter is a
    lexicographic predicate so pagination pushes into the aggregate."""
    grouped = df.groupBy(*sources).agg(F.count(F.lit(1)).alias("doc_count"))
    if after:
        pred = F.lit(False)
        eq = F.lit(True)
        for s in sources:
            pred = pred | (eq & (F.col(s) > F.lit(after[s])))
            eq = eq & (F.col(s) == F.lit(after[s]))
        grouped = grouped.filter(pred)
    return grouped.orderBy(*[F.col(s).asc() for s in sources]).limit(size)


# ---------------------------------------------------------------------------
# metric aggs
# ---------------------------------------------------------------------------


def stats(df: DataFrame, field: str) -> DataFrame:
    c = F.col(field)
    return df.agg(
        F.count(c).alias("count"),
        F.min(c).cast("double").alias("min"),
        F.max(c).cast("double").alias("max"),
        F.sum(c).cast("double").alias("sum"),
        F.avg(c).alias("avg"),
    )


def extended_stats(df: DataFrame, field: str, sigma: float = 2.0) -> DataFrame:
    c = F.col(field).cast("double")
    base = df.agg(
        F.count(c).alias("count"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.sum(c).alias("sum"),
        F.avg(c).alias("avg"),
        F.sum(c * c).alias("sum_of_squares"),
        F.var_pop(c).alias("variance"),
        F.stddev_pop(c).alias("std_deviation"),
    )
    return base.select(
        "*",
        (F.col("avg") + sigma * F.col("std_deviation")).alias("std_deviation_bounds_upper"),
        (F.col("avg") - sigma * F.col("std_deviation")).alias("std_deviation_bounds_lower"),
    )


def percentiles(
    df: DataFrame,
    field: str,
    percents: tuple[float, ...] = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0),
    exact: bool = True,
) -> DataFrame:
    """Percentiles; ``exact=True`` uses Spark's exact interpolated percentile
    (matches DuckDB quantile_cont — our oracle), else percentile_approx
    (t-digest-style, like the reference's sketch)."""
    c = F.col(field)
    fn = F.percentile if exact else F.percentile_approx
    return df.agg(
        *[
            fn(c, F.lit(p / 100.0)).alias(f"p{str(p).replace('.', '_').removesuffix('_0')}")
            for p in percents
        ]
    )


def cardinality(df: DataFrame, field: str, exact: bool = False) -> DataFrame:
    """Approximate distinct (HLL++ in Spark ~ the reference's HLL sketch);
    exact mode for the correctness oracle."""
    c = F.col(field)
    e = F.countDistinct(c) if exact else F.approx_count_distinct(c)
    return df.agg(e.alias("value"))


def top_hits(
    df: DataFrame,
    group_fields: list[str],
    sort_field: str,
    size: int = 1,
    descending: bool = True,
) -> DataFrame:
    """Per-bucket top docs by sort (window row_number ≤ k)."""
    from pyspark.sql import Window

    order = F.col(sort_field).desc() if descending else F.col(sort_field).asc()
    w = Window.partitionBy(*group_fields).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= size)
        .drop("__rn")
    )


def find_trace_ids(df: DataFrame, trace_field: str, ts_field: str, k: int = 10) -> DataFrame:
    """Jaeger FindTraceIds (find_trace_ids_collector.rs:33-78): distinct
    trace ids with max span timestamp, top-k by recency."""
    return (
        df.groupBy(F.col(trace_field).alias("trace_id"))
        .agg(F.max(F.col(ts_field)).alias("max_ts"))
        .orderBy(F.col("max_ts").desc(), F.col("trace_id").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# ES-JSON interpreter (golden-vector parity)
# ---------------------------------------------------------------------------


def run_es_aggs(df: DataFrame, aggs: dict[str, dict]) -> dict[str, Any]:
    """Interpret an ES-style aggregations request → nested response dict.

    Supports the Quickwit-supported set: date_histogram, histogram, terms,
    range, and the metric aggs, with arbitrary nesting of metric sub-aggs
    under buckets (sub-buckets recurse — fine for golden tests; the scale
    path uses the flat functions above)."""
    out: dict[str, Any] = {}
    for name, spec in aggs.items():
        sub = spec.get("aggs") or spec.get("aggregations") or {}
        if "date_histogram" in spec:
            p = spec["date_histogram"]
            metrics, metric_specs = _collect_metric_subaggs(sub)
            eb = p.get("extended_bounds")
            interval_ms = interval_to_millis(p["fixed_interval"])
            offset_ms = interval_to_millis(p.get("offset", "0ms"))
            buckets_df = date_histogram(
                df,
                p["field"],
                p["fixed_interval"],
                offset=p.get("offset", "0ms"),
                min_doc_count=p.get("min_doc_count", 0),
                extended_bounds=(eb["min"], eb["max"]) if eb else None,
                hard_bounds=(
                    (p["hard_bounds"]["min"], p["hard_bounds"]["max"])
                    if p.get("hard_bounds")
                    else None
                ),
                metrics=metrics,
            )

            def dh_pred(key, _f=p["field"], _i=interval_ms, _o=offset_ms):
                return _bucket_key(_ts_ms(F.col(_f)), _i, _o) == F.lit(key)

            out[name] = {
                "buckets": [
                    _bucket_dict(r, metric_specs, df, dh_pred)
                    for r in buckets_df.collect()
                ]
            }
        elif "terms" in spec:
            p = spec["terms"]
            metrics, metric_specs = _collect_metric_subaggs(sub)
            total = df.filter(F.col(p["field"]).isNotNull()).count()
            bdf = terms(
                df,
                p["field"],
                size=p.get("size", 10),
                min_doc_count=p.get("min_doc_count", 1),
                missing=p.get("missing"),
                metrics=metrics,
            )
            rows = bdf.collect()
            shown = sum(r["doc_count"] for r in rows)

            def t_pred(key, _f=p["field"]):
                return F.col(_f) == F.lit(key)

            out[name] = {
                "buckets": [_bucket_dict(r, metric_specs, df, t_pred) for r in rows],
                "sum_other_doc_count": int(total - shown),
                "doc_count_error_upper_bound": 0,
            }
        elif "histogram" in spec:
            p = spec["histogram"]
            metrics, metric_specs = _collect_metric_subaggs(sub)
            bdf = histogram(
                df, p["field"], p["interval"], offset=p.get("offset", 0.0),
                min_doc_count=p.get("min_doc_count", 0), metrics=metrics,
            )

            def h_pred(key, _f=p["field"], _i=p["interval"], _o=p.get("offset", 0.0)):
                return (
                    F.floor((F.col(_f) - F.lit(_o)) / F.lit(_i)) * F.lit(_i) + F.lit(_o)
                ) == F.lit(key)

            out[name] = {
                "buckets": [_bucket_dict(r, metric_specs, df, h_pred) for r in bdf.collect()]
            }
        elif "range" in spec:
            p = spec["range"]
            metrics, metric_specs = _collect_metric_subaggs(sub)
            bdf = range_agg(df, p["field"], p["ranges"], metrics=metrics)

            def r_pred(key, _f=p["field"], _ranges=p["ranges"]):
                for r in _ranges:
                    frm, to = r.get("from"), r.get("to")
                    nm = r.get("key") or f"{frm if frm is not None else '*'}-{to if to is not None else '*'}"
                    if nm == key:
                        cond = F.lit(True)
                        if frm is not None:
                            cond = cond & (F.col(_f) >= F.lit(frm))
                        if to is not None:
                            cond = cond & (F.col(_f) < F.lit(to))
                        return cond
                return F.lit(False)

            out[name] = {
                "buckets": [_bucket_dict(r, metric_specs, df, r_pred) for r in bdf.collect()]
            }
        elif "stats" in spec:
            r = stats(df.filter(F.col(spec["stats"]["field"]).isNotNull()), spec["stats"]["field"]).collect()[0]
            out[name] = {k: r[k] for k in ("count", "min", "max", "sum", "avg")}
        elif "extended_stats" in spec:
            r = extended_stats(df, spec["extended_stats"]["field"]).collect()[0]
            out[name] = r.asDict()
        elif "percentiles" in spec:
            r = percentiles(df, spec["percentiles"]["field"]).collect()[0]
            out[name] = {"values": r.asDict()}
        elif "cardinality" in spec:
            r = cardinality(df, spec["cardinality"]["field"]).collect()[0]
            out[name] = {"value": r["value"]}
        elif any(k in spec for k in ("avg", "sum", "min", "max", "value_count")):
            kind = next(k for k in ("avg", "sum", "min", "max", "value_count") if k in spec)
            col = metric_exprs({"value": (kind, spec[kind]["field"])})[0]
            out[name] = {"value": df.agg(col).collect()[0]["value"]}
        else:
            raise ValueError(f"unsupported aggregation spec: {spec}")
    return out


def _collect_metric_subaggs(sub: dict) -> tuple[dict, dict]:
    """Flatten metric sub-aggs into same-groupBy agg expressions.

    stats expands to 5 columns; returns (metrics_for_groupby, reassembly_spec).
    """
    metrics: dict[str, tuple[str, str]] = {}
    specs: dict[str, dict] = {}
    for sname, sspec in sub.items():
        if "stats" in sspec:
            fld = sspec["stats"]["field"]
            for part, kind in (
                ("count", "value_count"), ("min", "min"), ("max", "max"),
                ("sum", "sum"), ("avg", "avg"),
            ):
                metrics[f"{sname}__{part}"] = (kind, fld)
            specs[sname] = {"kind": "stats"}
        elif any(k in sspec for k in ("avg", "sum", "min", "max", "value_count", "cardinality")):
            kind = next(
                k for k in ("avg", "sum", "min", "max", "value_count", "cardinality") if k in sspec
            )
            metrics[sname] = (kind, sspec[kind]["field"])
            specs[sname] = {"kind": kind}
        else:
            specs[sname] = {"kind": "nested", "spec": sspec}
    return metrics, specs


def _bucket_dict(row, metric_specs: dict, df: DataFrame, bucket_pred) -> dict:
    fields = row.__fields__
    d = {"key": row["key"] if "key" in fields else row["range_key"], "doc_count": row["doc_count"]}
    if "key_as_string" in fields:
        d["key_as_string"] = row["key_as_string"]
    for sname, spec in metric_specs.items():
        if spec["kind"] == "stats":
            cnt = row[f"{sname}__count"]
            d[sname] = {
                "count": cnt if cnt is not None else 0,
                "min": _f(row[f"{sname}__min"]),
                "max": _f(row[f"{sname}__max"]),
                "sum": _f(row[f"{sname}__sum"]) if cnt else 0.0,
                "avg": _f(row[f"{sname}__avg"]),
            }
        elif spec["kind"] == "nested":
            # bucket-in-bucket: re-filter the frame to this bucket and recurse
            # (golden-test path; the scale path composes the flat functions)
            d[sname] = run_es_aggs(df.filter(bucket_pred(d["key"])), {sname: spec["spec"]})[sname]
        else:
            d[sname] = {"value": _f(row[sname])}
    return d


def _f(v):
    return float(v) if v is not None else None
