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
    order: tuple[str, str] | None = None,
) -> DataFrame:
    """Terms agg: top-``size`` buckets, default doc_count desc (key asc
    tiebreak).

    ``order=(target, "asc"|"desc")`` supports the reference's custom orders
    (docs/reference/aggregation.md:504-566): ``"_count"``, ``"_key"``, or the
    NAME of a metric in ``metrics`` (order by sub-aggregation value).

    Exact mode (no per-shard cutoff): ``doc_count_error_upper_bound`` is 0,
    matching the reference when a single segment is searched; see
    :func:`terms_shard_emulated` for the per-shard ``shard_size`` cutoff +
    error-bound emulation.
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
    if order is None:
        order = ("_key", "asc") if order_by_key else ("_count", "desc")
    target, direction = order
    col = {"_count": F.col("doc_count"), "_key": F.col("key")}.get(target)
    if col is None:
        if not metrics or target not in metrics:
            raise ValueError(f"terms order target `{target}` is not a metric sub-agg name")
        col = F.col(target)
    lead = col.desc() if direction == "desc" else col.asc()
    return grouped.orderBy(lead, F.col("key").asc()).limit(size)


def terms_shard_emulated(
    df: DataFrame,
    field: str,
    size: int = 10,
    shard_size: int | None = None,
) -> tuple[DataFrame, int]:
    """Distributed terms with ES ``shard_size`` semantics and a non-zero
    ``doc_count_error_upper_bound`` (docs/reference/aggregation.md:504-566).

    Each Spark partition plays the reference's per-segment collector: it
    keeps only its local top ``shard_size`` terms (default ``size*1.5+10``);
    survivors merge globally. A term missing from a shard was DROPPED there,
    so its hidden count is at most that shard's LARGEST DROPPED bucket — the
    bound is the sum of those over cut shards (the reference's accounting:
    sum of largest dropped bucket per split, golden-tested against
    0001-aggregations.yaml's split_size vectors; slightly tighter than ES's
    last-returned bound). Returns ``(buckets, doc_count_error_upper_bound)``;
    buckets may undercount by ≤ the bound (the price of bounded per-shard
    state at scale).
    """
    from pyspark.sql import Window

    shard_size = shard_size or int(size * 1.5 + 10)
    local = (
        df.filter(F.col(field).isNotNull())
        .groupBy(F.spark_partition_id().alias("__shard"), F.col(field).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("__shard").orderBy(F.col("cnt").desc(), F.col("key").asc())
    ranked = local.withColumn("__rn", F.row_number().over(w))
    kept = ranked.filter(F.col("__rn") <= shard_size)
    # per-shard bound = the largest DROPPED count (rank shard_size+1 in the
    # count-desc order) for shards that were actually cut
    cut = (
        ranked.groupBy("__shard")
        .agg(
            F.max("__rn").alias("n"),
            F.max(F.when(F.col("__rn") == shard_size + 1, F.col("cnt"))).alias("dropped"),
        )
        .filter(F.col("n") > shard_size)
    )
    error_bound = int(cut.agg(F.coalesce(F.sum("dropped"), F.lit(0))).collect()[0][0])
    buckets = (
        kept.groupBy("key")
        .agg(F.sum("cnt").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("key").asc())
        .limit(size)
    )
    return buckets, error_bound


def terms_with_other(df: DataFrame, field: str, size: int = 10) -> tuple[DataFrame, int, int]:
    """(buckets, sum_other_doc_count, doc_count_error_upper_bound=0).

    ONE Spark job over ONE scan, no global window: after the per-key count
    shuffle, each partition keeps only its local top-``size`` (a key lives in
    exactly one post-groupBy partition, so the global top-k is the top-k of
    the union of local top-ks) and stamps its partial mass on its first row;
    the driver merges ≤ ``numPartitions × size`` candidate rows. Was three
    actions / three scans of ``df``."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    counts = (
        df.filter(F.col(field).isNotNull())
        .groupBy(F.col(field).alias("key"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    out_schema = StructType(
        list(counts.schema.fields) + [StructField("__ptotal", LongType())]
    )

    def _local_topk(batches):
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        top = pdf.sort_values(
            ["doc_count", "key"], ascending=[False, True], kind="mergesort"
        ).head(size).copy()
        top["__ptotal"] = 0
        top.iloc[0, top.columns.get_loc("__ptotal")] = int(pdf["doc_count"].sum())
        yield top

    rows = counts.mapInPandas(_local_topk, schema=out_schema).collect()
    total = sum(r["__ptotal"] for r in rows)
    top = sorted(rows, key=lambda r: (-r["doc_count"], r["key"]))[:size]
    in_top = sum(r["doc_count"] for r in top)
    buckets = df.sparkSession.createDataFrame(
        [(r["key"], r["doc_count"]) for r in top], schema=counts.schema
    )
    return buckets, int(total - in_top), 0


def multi_terms(
    df: DataFrame,
    fields: list[str],
    size: int = 10,
    metrics: dict[str, tuple[str, str]] | None = None,
    order_by_key: bool = False,
) -> DataFrame:
    """Tuple-key terms; key_as_string is the pipe-joined key
    (aggregations.rs:392-401). ``order_by_key`` gives the `{_key: asc}`
    order; multi-valued (array) source fields should be exploded by the
    caller first (ES counts a doc once per value combination)."""
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
    if order_by_key:
        return grouped.orderBy(*[F.col(f).asc() for f in fields]).limit(size)
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


def _composite_source(src) -> tuple[str, Column, bool]:
    """A composite source: a plain column name, or an ES-style spec
    ``{name: {"terms"|"date_histogram"|"histogram": {...}}}``
    (quickwit-query/src/aggregations.rs:500-570 source kinds). Returns
    ``(name, key_expr, missing_bucket)`` — docs whose source key is null are
    EXCLUDED unless the source sets ``missing_bucket: true``, in which case
    the null bucket sorts FIRST (0001-aggregations.yaml composite vectors).
    """
    if isinstance(src, str):
        return src, F.col(src), False
    (name, spec), = src.items()
    if "terms" in spec:
        p = spec["terms"]
        return name, F.col(p["field"]), bool(p.get("missing_bucket", False))
    if "date_histogram" in spec:
        p = spec["date_histogram"]
        interval_ms = interval_to_millis(p["fixed_interval"])
        offset_ms = interval_to_millis(p.get("offset", "0ms"))
        return (
            name,
            _bucket_key(_ts_ms(F.col(p["field"])), interval_ms, offset_ms),
            bool(p.get("missing_bucket", False)),
        )
    if "histogram" in spec:
        p = spec["histogram"]
        key = (
            F.floor(F.col(p["field"]) / F.lit(p["interval"])) * F.lit(p["interval"])
        ).cast("double")
        return name, key, bool(p.get("missing_bucket", False))
    raise ValueError(f"unsupported composite source {spec}")


def composite(
    df: DataFrame,
    sources: list,
    size: int = 10,
    after: dict[str, Any] | None = None,
) -> DataFrame:
    """Composite agg: cross-product buckets ordered by keys, paginated by
    ``after_key`` (aggregations.rs:176-183). Sources may be plain columns or
    date_histogram/histogram specs (bucket keys become composite key parts).
    The after-filter is a lexicographic predicate over the computed keys so
    pagination pushes into the aggregate."""
    named = [_composite_source(s) for s in sources]
    base = df
    for n, expr, missing_ok in named:
        if not missing_ok:
            base = base.filter(expr.isNotNull())
    grouped = base.groupBy(*[expr.alias(n) for n, expr, _ in named]).agg(
        F.count(F.lit(1)).alias("doc_count")
    )
    if after:
        pred = F.lit(False)
        eq = F.lit(True)
        for n, _, missing_ok in named:
            a = after.get(n)
            c = F.col(n)
            if a is None:
                # null sorts first: anything non-null is strictly after it
                pred = pred | (eq & c.isNotNull())
                eq = eq & c.isNull()
            else:
                step = c > F.lit(a)
                if missing_ok:
                    step = F.coalesce(step, F.lit(False))  # null is before any value
                pred = pred | (eq & step)
                eq = eq & (c == F.lit(a))
        grouped = grouped.filter(F.coalesce(pred, F.lit(False)))
    return grouped.orderBy(
        *[F.col(n).asc_nulls_first() for n, _, _ in named]
    ).limit(size)


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


def _bucket_kind(spec: dict) -> str | None:
    for k in ("date_histogram", "histogram", "terms", "range"):
        if k in spec:
            return k
    return None


def _fmt_key_ms(key_ms: int) -> str:
    """Python mirror of :func:`key_as_string_col` (driver-side assembly)."""
    from datetime import datetime, timezone

    sec, ms = divmod(int(key_ms), 1000)
    base = datetime.fromtimestamp(sec, tz=timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")
    return f"{base}Z" if ms == 0 else f"{base}.{ms:03d}Z"


def _collect_metric_subaggs(sub: dict) -> tuple[list, dict, dict]:
    """Split sub-aggs into same-groupBy metric exprs and nested bucket aggs.

    Returns ``(agg_exprs, metric_specs, nested_bucket_specs)``; every metric
    kind the reference supports under a bucket (avg/sum/min/max/value_count/
    cardinality/stats/extended_stats/percentiles) aggregates in the SAME pass
    as the bucket keys — no per-bucket queries.
    """
    exprs: list[Column] = []
    specs: dict[str, dict] = {}
    nested: dict[str, dict] = {}
    for sname, sspec in sub.items():
        if _bucket_kind(sspec) is not None:
            nested[sname] = sspec
            continue
        if "stats" in sspec:
            c = F.col(sspec["stats"]["field"])
            exprs += [
                F.count(c).alias(f"{sname}__count"),
                F.min(c).cast("double").alias(f"{sname}__min"),
                F.max(c).cast("double").alias(f"{sname}__max"),
                F.sum(c).cast("double").alias(f"{sname}__sum"),
                F.avg(c).alias(f"{sname}__avg"),
            ]
            specs[sname] = {"kind": "stats"}
        elif "extended_stats" in sspec:
            c = F.col(sspec["extended_stats"]["field"]).cast("double")
            exprs += [
                F.count(c).alias(f"{sname}__count"),
                F.min(c).alias(f"{sname}__min"),
                F.max(c).alias(f"{sname}__max"),
                F.sum(c).alias(f"{sname}__sum"),
                F.avg(c).alias(f"{sname}__avg"),
                F.sum(c * c).alias(f"{sname}__sum_of_squares"),
                F.var_pop(c).alias(f"{sname}__variance"),
                F.stddev_pop(c).alias(f"{sname}__std_deviation"),
            ]
            specs[sname] = {"kind": "extended_stats", "sigma": sspec["extended_stats"].get("sigma", 2.0)}
        elif "percentiles" in sspec:
            c = F.col(sspec["percentiles"]["field"])
            percents = tuple(sspec["percentiles"].get("percents", (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)))
            exprs += [
                F.percentile(c, F.lit(p / 100.0)).alias(f"{sname}__q{i}")
                for i, p in enumerate(percents)
            ]
            specs[sname] = {"kind": "percentiles", "percents": percents}
        else:
            kinds = ("avg", "sum", "min", "max", "value_count", "cardinality")
            kind = next((k for k in kinds if k in sspec), None)
            if kind is None:
                raise ValueError(f"unsupported sub-aggregation spec: {sspec}")
            exprs += metric_exprs({sname: (kind, sspec[kind]["field"])})
            specs[sname] = {"kind": kind}
    return exprs, specs, nested


def _metrics_from_row(row, specs: dict) -> dict:
    out = {}
    for sname, spec in specs.items():
        kind = spec["kind"]
        if kind == "stats":
            cnt = row[f"{sname}__count"] or 0
            out[sname] = {
                "count": cnt,
                "min": _f(row[f"{sname}__min"]),
                "max": _f(row[f"{sname}__max"]),
                "sum": _f(row[f"{sname}__sum"]) if cnt else 0.0,
                "avg": _f(row[f"{sname}__avg"]),
            }
        elif kind == "extended_stats":
            cnt = row[f"{sname}__count"] or 0
            avg = _f(row[f"{sname}__avg"])
            std = _f(row[f"{sname}__std_deviation"])
            out[sname] = {
                "count": cnt,
                "min": _f(row[f"{sname}__min"]),
                "max": _f(row[f"{sname}__max"]),
                "sum": _f(row[f"{sname}__sum"]) if cnt else 0.0,
                "avg": avg,
                "sum_of_squares": _f(row[f"{sname}__sum_of_squares"]),
                "variance": _f(row[f"{sname}__variance"]),
                "std_deviation": std,
                "std_deviation_bounds_upper": (
                    avg + spec["sigma"] * std if avg is not None and std is not None else None
                ),
                "std_deviation_bounds_lower": (
                    avg - spec["sigma"] * std if avg is not None and std is not None else None
                ),
            }
        elif kind == "percentiles":
            out[sname] = {
                "values": {
                    str(p): _f(row[f"{sname}__q{i}"])
                    for i, p in enumerate(spec["percents"])
                }
            }
        else:
            out[sname] = {"value": _f(row[sname])}
    return out


class _Level:
    """One bucket level in a nested aggregation chain: its key expression
    over the (possibly range-exploded) frame, plus assembly parameters."""

    def __init__(self, df: DataFrame, name: str, spec: dict, depth: int):
        self.name = name
        self.kind = _bucket_kind(spec)
        self.alias = f"__k{depth}"
        p = spec[self.kind]
        self.params = p
        self.df = df  # frame for this level and below (range levels explode)
        if self.kind == "terms":
            key = F.col(p["field"])
            if p.get("missing") is not None:
                key = F.coalesce(key, F.lit(p["missing"]))
            self.key = key
        elif self.kind == "date_histogram":
            self.interval = interval_to_millis(p["fixed_interval"])
            self.offset = interval_to_millis(p.get("offset", "0ms"))
            self.key = _bucket_key(_ts_ms(F.col(p["field"])), self.interval, self.offset)
            if p.get("hard_bounds"):
                hb = p["hard_bounds"]
                self.df = df.filter(
                    (self.key >= F.lit(hb["min"])) & (self.key <= F.lit(hb["max"]))
                )
        elif self.kind == "histogram":
            self.interval = float(p["interval"])
            self.offset = float(p.get("offset", 0.0))
            self.key = (
                F.floor((F.col(p["field"]) - F.lit(self.offset)) / F.lit(self.interval))
                * F.lit(self.interval) + F.lit(self.offset)
            ).cast("double")
        elif self.kind == "range":
            self.range_names = []
            tagged = []
            c = F.col(p["field"])
            for r in p["ranges"]:
                frm, to = r.get("from"), r.get("to")
                nm = r.get("key") or f"{frm if frm is not None else '*'}-{to if to is not None else '*'}"
                self.range_names.append(nm)
                cond = F.lit(True)
                if frm is not None:
                    cond = cond & (c >= F.lit(frm))
                if to is not None:
                    cond = cond & (c < F.lit(to))
                tagged.append(F.when(cond, F.lit(nm)))
            matching = F.filter(F.array(*tagged), lambda x: x.isNotNull())
            # explode BEFORE grouping this level and everything below it:
            # overlapping ranges count the doc in every matching bucket, and
            # sub-aggs see the doc in each bucket (ES semantics). Ancestor
            # levels grouped separately on the unexploded frame stay exact.
            self.df = df.filter(c.isNotNull()).withColumn(
                self.alias, F.explode(matching)
            )
            self.key = F.col(self.alias)
        else:  # pragma: no cover
            raise ValueError(f"unknown bucket kind {self.kind}")

    def assemble(self, rows: list, metric_specs: dict, children: dict) -> dict:
        """rows: collected Rows for THIS level (already restricted to one
        parent bucket); children: {child_name: {key: child_result}}."""
        def mk(row):
            d = {"key": row[self.alias], "doc_count": row["doc_count"]}
            if self.kind == "date_histogram":
                d["key_as_string"] = _fmt_key_ms(d["key"])
            d.update(_metrics_from_row(row, metric_specs))
            for cname, by_key in children.items():
                d[cname] = by_key.get(d["key"], _EMPTY_BUCKETS)
            return d

        def empty(key):
            d = {"key": key, "doc_count": 0}
            if self.kind == "date_histogram":
                d["key_as_string"] = _fmt_key_ms(key)
            d.update({cname: _EMPTY_BUCKETS for cname in children})
            # zero-bucket metrics: value-style metrics are null/0-count
            for sname, spec in metric_specs.items():
                if spec["kind"] in ("stats", "extended_stats"):
                    d[sname] = {"count": 0, "min": None, "max": None, "sum": 0.0, "avg": None}
                elif spec["kind"] == "percentiles":
                    d[sname] = {"values": {}}
                else:
                    d[sname] = {"value": 0 if spec["kind"] == "value_count" else None}
            return d

        p = self.params
        if self.kind == "terms":
            size = p.get("size", 10)
            mdc = p.get("min_doc_count", 1)
            buckets = [mk(r) for r in rows if r[self.alias] is not None]
            total = sum(b["doc_count"] for b in buckets)
            buckets = [b for b in buckets if b["doc_count"] >= mdc]
            order = p.get("order") or {"_count": "desc"}
            (target, direction), = order.items()

            def sort_val(b):
                if target == "_count":
                    return b["doc_count"]
                if target == "_key":
                    return b["key"]
                head, _, part = target.partition(".")
                v = b[head]
                return v[part] if part else v["value"]

            rev = direction == "desc"
            buckets.sort(key=lambda b: b["key"])  # stable key-asc tiebreak
            buckets.sort(key=sort_val, reverse=rev)
            shown = buckets[:size]
            return {
                "buckets": shown,
                "sum_other_doc_count": int(total - sum(b["doc_count"] for b in shown)),
                "doc_count_error_upper_bound": 0,
            }
        if self.kind == "range":
            by_key = {r[self.alias]: mk(r) for r in rows if r[self.alias] is not None}
            return {"buckets": [by_key.get(nm, empty(nm)) for nm in self.range_names]}
        # date_histogram / histogram
        mdc = p.get("min_doc_count", 0)
        buckets = {r[self.alias]: mk(r) for r in rows if r[self.alias] is not None}
        if mdc == 0 and buckets:
            keys = sorted(buckets)
            lo, hi = keys[0], keys[-1]
            eb = p.get("extended_bounds")
            if eb and self.kind == "date_histogram":
                lo = min(lo, (eb["min"] - self.offset) // self.interval * self.interval + self.offset)
                hi = max(hi, (eb["max"] - self.offset) // self.interval * self.interval + self.offset)
            # integer stepping: accumulating a float interval (e.g. 0.1)
            # drifts off the Spark-computed keys after a few buckets
            n_steps = int(round((hi - lo) / self.interval))
            by_index = {int(round((k - lo) / self.interval)): k for k in buckets}
            out = []
            for i in range(n_steps + 1):
                k = by_index.get(i, lo + i * self.interval)
                out.append(buckets.get(k, empty(k)))
            return {"buckets": out}
        ordered = [buckets[k] for k in sorted(buckets)]
        if mdc > 1:
            ordered = [b for b in ordered if b["doc_count"] >= mdc]
        return {"buckets": ordered}


_EMPTY_BUCKETS: dict = {"buckets": []}

# ES `search.max_buckets` default — the ceiling on buckets a single
# aggregation response may materialize
MAX_BUCKETS = 65536


def _eval_bucket_tree(
    df: DataFrame, spec: dict, ancestors: list
) -> dict:
    """Evaluate one bucket agg (+ its whole sub-tree) with ONE groupBy per
    level — grouped on (ancestor keys…, own key) — and driver-side
    reassembly. No per-bucket filtering, no per-bucket collects: the number
    of Spark jobs equals the number of bucket levels in the request
    (SURVEY §2.7's prescribed groupBy(bucket_key, sub_key) shape).

    ``ancestors``: list of ``(alias, Column)`` for enclosing bucket keys.
    Returns ``{parent_key_tuple: result_dict}``.
    """
    name = "__root"
    level = _Level(df, name, spec, depth=len(ancestors))
    sub = spec.get("aggs") or spec.get("aggregations") or {}
    agg_exprs, metric_specs, nested = _collect_metric_subaggs(sub)

    keys = [expr.alias(a) for a, expr in ancestors] + [level.key.alias(level.alias)]
    grouped = level.df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("doc_count"), *agg_exprs
    )
    # ES search.max_buckets guard: the assembly is driver-side, so cap what
    # can come back (the reference rejects too_many_buckets the same way)
    rows = grouped.limit(MAX_BUCKETS + 1).collect()
    if len(rows) > MAX_BUCKETS:
        raise ValueError(
            f"too_many_buckets: aggregation produced more than {MAX_BUCKETS} "
            "buckets; narrow the query or raise the interval/size"
        )

    child_maps: dict[str, dict] = {}
    next_ancestors = ancestors + [(level.alias, level.key)]
    for cname, cspec in nested.items():
        child_maps[cname] = _eval_bucket_tree(level.df, cspec, next_ancestors)

    # group collected rows by parent tuple and assemble each parent's buckets
    by_parent: dict[tuple, list] = {}
    for r in rows:
        pk = tuple(r[a] for a, _ in ancestors)
        by_parent.setdefault(pk, []).append(r)

    out: dict[tuple, dict] = {}
    for pk, prows in by_parent.items():
        children_for_parent = {
            cname: {
                k[-1]: v for k, v in cmap.items() if k[:-1] == pk
            }
            for cname, cmap in child_maps.items()
        }
        out[pk] = level.assemble(prows, metric_specs, children_for_parent)
    return out


def run_es_aggs(df: DataFrame, aggs: dict[str, dict]) -> dict[str, Any]:
    """Interpret an ES-style aggregations request → nested response dict.

    Supports the Quickwit-supported set (date_histogram, histogram, terms,
    range + the metric aggs) with arbitrary nesting; every bucket level is a
    single distributed groupBy over (ancestor keys, level key) — metric
    sub-aggs ride along in the same pass, and bucket-in-bucket costs exactly
    one extra shuffle per level, never a per-bucket re-query."""
    out: dict[str, Any] = {}
    for name, spec in aggs.items():
        if _bucket_kind(spec) is not None:
            out[name] = _eval_bucket_tree(df, spec, []).get((), _EMPTY_BUCKETS)
            if "terms" in spec and "buckets" not in out[name]:
                out[name] = {
                    "buckets": [], "sum_other_doc_count": 0,
                    "doc_count_error_upper_bound": 0,
                }
        elif "stats" in spec:
            r = stats(
                df.filter(F.col(spec["stats"]["field"]).isNotNull()),
                spec["stats"]["field"],
            ).collect()[0]
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


def _f(v):
    return float(v) if v is not None else None


def significant_terms(
    df: DataFrame,
    field: str,
    foreground: Column,
    size: int = 10,
    min_doc_count: int = 3,
) -> DataFrame:
    """Elasticsearch ``significant_terms`` semantics (public aggs DSL) with
    the default JLH heuristic: terms that are unusually frequent in the
    foreground document set (the query's hits) relative to the background
    (the whole index). ``jlh = (fg% − bg%) · (fg%/bg%)`` over DOCUMENT
    frequencies (a term counts once per document); only terms with
    ``fg% > bg%`` and foreground df ≥ ``min_doc_count`` qualify; top
    ``size`` by score, ties broken by term ascending.

    The "what is special about the error logs / this tenant / this agent's
    failures" aggregation — foreground is any boolean Column over the row.

    Scale shape: ONE corpus scan — the foreground flag is evaluated
    row-side in the scan's codegen stage, tokens explode (array_distinct
    first, so per-doc duplicates die before the shuffle), and one
    map-side-combined groupBy(term) carries (term → fg_df, bg_df). Set
    sizes come from the same scan pattern as the reference's count path
    (a one-row aggregate). Final top-k is a TakeOrdered, never a global
    sort.

    Returns (term, fg_df, bg_df, score) — score rounded to 6 places.
    """
    from quickwit_spark.functions.tokenizers import tokenize_default

    fg = foreground.cast("boolean")
    sizes = df.agg(
        F.count(F.lit(1)).alias("__n_bg"), F.count_if(fg).alias("__n_fg")
    ).first()
    n_bg, n_fg = float(sizes["__n_bg"]), float(sizes["__n_fg"])
    if n_fg == 0:
        raise ValueError("significant_terms: empty foreground set")

    freqs = (
        df.select(
            fg.alias("__fg"),
            F.explode(F.array_distinct(tokenize_default(F.col(field)))).alias(
                "term"
            ),
        )
        .groupBy("term")
        .agg(
            F.count_if(F.col("__fg")).cast("long").alias("fg_df"),
            F.count(F.lit(1)).cast("long").alias("bg_df"),
        )
    )
    fg_pct = F.col("fg_df") / F.lit(n_fg)
    bg_pct = F.col("bg_df") / F.lit(n_bg)
    return (
        freqs.filter(
            (F.col("fg_df") >= min_doc_count) & (fg_pct > bg_pct)
        )
        .withColumn(
            "score", F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6)
        )
        .orderBy(F.col("score").desc(), F.col("term").asc())
        .limit(size)
    )


def percentile_ranks(
    df: DataFrame, field: str, values: list[float]
) -> DataFrame:
    """Elasticsearch ``percentile_ranks`` semantics (public aggs DSL),
    exact: for each probe value v, the percentage of non-null field values
    ≤ v. (ES estimates this from a t-digest; at driver-gate scale the
    exact definition is the ground truth the sketch approximates — the
    HDR sketch path for 10^12 rows is operators/rollup.py hist_build +
    hist_quantile, the same trade documented for percentiles.)

    One scan, one 1-row aggregate — every probe is a conditional count in
    the same map-side-combined pass. Returns one row per probe:
    (value, rank_pct rounded to 6)."""
    probes = [float(v) for v in values]
    if not probes:
        raise ValueError("percentile_ranks needs at least one value")
    c = F.col(field).cast("double")
    aggs = [F.count(c).alias("__n")] + [
        F.count_if(c <= F.lit(v)).alias(f"__le{i}") for i, v in enumerate(probes)
    ]
    row = df.agg(*aggs).first()
    n = row["__n"] or 0
    spark = df.sparkSession
    out = [
        (v, round(100.0 * row[f"__le{i}"] / n, 6) if n else None)
        for i, v in enumerate(probes)
    ]
    return spark.createDataFrame(out, "value double, rank_pct double")
