"""Parse → enrich → route stages over the transcripts table.

This is the Spark re-expression of Quickwit's DocProcessor → Indexer path
(quickwit-indexing/src/actors/doc_processor.rs, indexer.rs:151-183 — behavior
only): grok-style field extraction, dynamic-field capture, error-category
quarantine, broadcast tenant enrich, SipHash routing to partitions and
role/tool sinks.

Scale notes (100 TB / 1000 executors):
- Extraction is pure `regexp_extract`/`str_to_map` Column work —
  WholeStageCodegen, no Python, no shuffle.
- The dynamic-field map is built with `str_to_map` + `map_filter` —
  stays columnar.
- Routing hash = the SipHash pandas UDF (Arrow batches, numpy rounds); it is
  the only Python in the hot path and is embarrassingly parallel.
- Enrich = broadcast hash join (tenants ≤1000 rows) — no shuffle.
- Fingerprint (log clustering) = token-type template hash via JVM regexes +
  xxhash64 — the per-policy template trick from the reference's
  docs_clustering/fingerprinter.rs (numbers/hex/uuid → type tags).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quickwit_spark.routing import RoutingExpr

# fields the parse stage declares (everything else in k=v form → _dynamic)
DECLARED_FIELDS = ("level", "tenant", "latency_ms", "msg")

_KV_RE = r"(\w+)=([^\s\"]+)"


def parse_stage(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Extract declared fields from the log-line text, capture undeclared
    k=v pairs into ``_dynamic``, flag malformed rows with Quickwit's error
    categories. Pure Column ops — no Python.

    Per-field ``regexp_extract`` is deliberately chosen over one
    ``str_to_map`` + getItem: measured on this box (16M rows, zero steal),
    the map approach is ~3.5x slower — building a per-row MapData allocates,
    while anchored regex scans don't; codegen keeps the extracts in one
    pipelined stage."""
    c = F.col(text_col)
    # declared fields extract from the msg-MASKED text, like the dynamic
    # path: k=v text inside the quoted message body is message CONTENT, not
    # fields — without the mask, 'msg="set tenant=evil"' would fabricate a
    # tenant and route/aggregate under it
    masked = F.regexp_replace(c, r'msg="[^"]*"', "")
    level = F.regexp_extract(masked, r"level=(\w+)", 1)
    tenant = F.regexp_extract(masked, r"tenant=([\w-]+)", 1)
    latency = F.regexp_extract(masked, r"latency_ms=(\d+)", 1)
    msg = F.regexp_extract(c, r'msg="([^"]*)"', 1)

    # undeclared k=v pairs → dynamic map (mode=dynamic semantics).
    # str_to_map needs mapKeyDedupPolicy=LAST_WIN (set by session.get_spark)
    # so a repeated key in one line dedups instead of killing the job.
    kv = F.expr(
        f"map_filter(str_to_map(regexp_replace({text_col}, 'msg=\"[^\"]*\"', ''), ' ', '='), "
        f"(k, v) -> k NOT IN {DECLARED_FIELDS!r} AND v IS NOT NULL AND k != '')"
    )

    out = df.select(
        "*",
        F.when(level == "", None).otherwise(level).alias("level"),
        F.when(tenant == "", None).otherwise(tenant).alias("tenant_id"),
        # try_cast: an overflowing digit run must quarantine as a null
        # field, not abort the chunk under ANSI mode
        F.when(latency == "", None).otherwise(latency).try_cast("long").alias("latency_ms"),
        F.when(msg == "", None).otherwise(msg).alias("msg"),
        kv.alias("_dynamic"),
        F.length(c).cast("long").alias("_doc_length"),
    )
    # error accounting (doc_processor.rs outcome counters)
    return out.withColumn(
        "_error_category",
        F.when(F.col(text_col).isNull(), F.lit("json_parse_error"))
        .when(F.col("level").isNull() | F.col("tenant_id").isNull(), F.lit("doc_mapper_error"))
        .otherwise(F.lit("valid")),
    ).withColumn(
        "_error",
        F.when(
            F.col("_error_category") == "doc_mapper_error",
            F.concat(F.lit("missing required field in: "), F.substring(c, 1, 64)),
        ).when(F.col("_error_category") == "json_parse_error", F.lit("null document")),
    )


def enrich_stage(df: DataFrame, tenants: DataFrame) -> DataFrame:
    """Broadcast lookup enrich (the reference's VRL static-map enrichment,
    generalized): left join, unknown tenants get tier='unknown'."""
    dim = F.broadcast(tenants.select("tenant_id", "tenant_name", "tier", "region"))
    out = df.join(dim, "tenant_id", "left")
    return out.fillna({"tier": "unknown", "region": "unknown"})


_ROUTING_SCHEMA = T.LongType()
_ROUTE_UDF_CACHE: dict[tuple, object] = {}


def routing_hash_col(expr_dsl: str, field_cols: list[str]):
    """Column: Quickwit partition hash of ``expr_dsl`` over ``field_cols``.

    Pandas UDF (Arrow batches); numpy-vectorized SipHash rounds. The returned
    value is the reference's u64 partition id, two's-complemented into
    Spark's signed long — bit-for-bit comparable. The UDF object is cached
    per (expr, fields) so repeated plan builds reuse one function (fresh
    UDFs per plan churn the Python workers).
    """
    key = (expr_dsl, tuple(field_cols))
    udf = _ROUTE_UDF_CACHE.get(key)
    if udf is None:
        expr = RoutingExpr(expr_dsl)
        fields = tuple(field_cols)

        @F.pandas_udf(_ROUTING_SCHEMA)
        def _route(*cols: pd.Series) -> pd.Series:
            named = dict(zip(fields, cols))
            hashes = expr.eval_hash_columns(named)
            return pd.Series(hashes.astype("int64"))  # two's complement view

        udf = _ROUTE_UDF_CACHE[key] = _route

    return udf(*[F.col(f) for f in field_cols])


def route_stage(
    df: DataFrame,
    partition_expr: str = "tenant_id",
    max_num_partitions: int = 200,
) -> DataFrame:
    """Assign ``partition_id`` (SipHash routing hash, capped into
    ``max_num_partitions`` classes like hash_mod) and the fan-out ``sink``
    key (role; tool-role rows fan out per tool) — indexer.rs:151-183's
    one-split-builder-per-partition becomes partitionBy(sink, partition_bucket).
    """
    expr = RoutingExpr(partition_expr)
    fields = sorted({f.split(".")[0] for f in expr.field_names()})
    out = df.withColumn("partition_id", routing_hash_col(partition_expr, fields))
    # hash_mod semantics are u64 % N; partition_id is the signed two's-complement
    # view, so for hashes >= 2^63 (negative longs) correct the signed pmod by
    # the missing 2^64 % N term — exact u64 modulo, pure codegen.
    wrap = (1 << 64) % max_num_partitions
    pid = F.col("partition_id")
    out = out.withColumn(
        "partition_bucket",
        F.pmod(
            F.pmod(pid, F.lit(max_num_partitions))
            + F.when(pid < 0, F.lit(wrap)).otherwise(F.lit(0)),
            F.lit(max_num_partitions),
        ),
    )
    return out.withColumn(
        "sink",
        F.when(F.col("role") == "tool", F.concat(F.lit("tool_"), F.coalesce("tool", F.lit("nil"))))
        .otherwise(F.col("role")),
    )


def fingerprint_col(text_col: str = "msg"):
    """Log-clustering fingerprint: token-type template hash
    (docs_clustering/fingerprinter.rs behavior — 'server started at 8080' ≡
    '... at 9090'). Numbers/hex/uuids collapse to type tags; hash the
    template. Pure JVM: regexp_replace chain + xxhash64."""
    c = F.col(text_col)
    t = F.regexp_replace(c, r"\b[0-9a-fA-F]{8}-[0-9a-fA-F-]{27,}\b", "<uuid>")
    t = F.regexp_replace(t, r"\b0x[0-9a-fA-F]+\b", "<hex>")
    t = F.regexp_replace(t, r"\b\d+(\.\d+)?\b", "<num>")
    return F.xxhash64(t)


def salted_repartition(df: DataFrame, num_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """conv_id-salted repartition: hot conversations spread over
    ``salt_buckets`` shuffle keys; readers restore order with a
    Window over (conv_id, turn_idx). Deterministic (salt = turn bucket)."""
    return df.repartition(
        num_partitions, F.col("conv_id"), F.pmod(F.col("turn_idx"), F.lit(salt_buckets))
    )


def stable_order(df: DataFrame) -> DataFrame:
    """Reader-side stable turn ordering (Window.partitionBy(conv_id)
    .orderBy(turn_idx)) guaranteeing per-turn text equality checks."""
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return df.withColumn("turn_seq", F.row_number().over(w))
