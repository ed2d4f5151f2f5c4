"""File sources with Quickwit input-format semantics (SURVEY §2.1).

Behavior from quickwit-indexing/src/actors/doc_processor.rs:152-189 and
source/doc_file_reader.rs (studied for behavior only):

- ``json`` (NDJSON, optionally gzip): one JSON object per line; parse errors
  are counted per line, not fatal.
- ``plain_text``: each line becomes ``{"plain_text": <line>}``.
- ``otlp_logs_json``: one OTLP ExportLogsServiceRequest JSON per line fans
  out to one doc per LogRecord (a UDTF shape → explode), with the field
  names of the reference's OTel doc mapping (timestamp_nanos, severity_text,
  body, attributes, resource_attributes, ...). Protobuf variants are out of
  scope (no protobuf dependency in this container) and raise.

All readers return a DataFrame of raw docs ready for the DocMapper; Spark's
file listing + byte-offset ranges replace the reference's per-file byte
checkpoints (a resume never re-reads consumed files thanks to the
checkpoint/lineage layer or Structured Streaming's file-source log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_ndjson_lines(spark: SparkSession, path: str) -> DataFrame:
    """Raw NDJSON lines (gzip transparently decompressed by Spark's text
    source). Returns ``value: string`` — feed to DocMapper.apply()."""
    return spark.read.text(path)


def read_plain_text(spark: SparkSession, path: str) -> DataFrame:
    """plain_text input format: wrap each line in {"plain_text": line}."""
    lines = spark.read.text(path)
    return lines.select(
        F.to_json(F.struct(F.col("value").alias("plain_text"))).alias("value")
    )


# OTLP logs: struct schema for the JSON body (proto3 JSON mapping)
_OTLP_ANY_VALUE = T.StructType(
    [
        T.StructField("stringValue", T.StringType()),
        T.StructField("intValue", T.StringType()),
        T.StructField("doubleValue", T.DoubleType()),
        T.StructField("boolValue", T.BooleanType()),
    ]
)
_OTLP_KV = T.ArrayType(
    T.StructType(
        [T.StructField("key", T.StringType()), T.StructField("value", _OTLP_ANY_VALUE)]
    )
)
_OTLP_LOG_RECORD = T.StructType(
    [
        T.StructField("timeUnixNano", T.StringType()),
        T.StructField("observedTimeUnixNano", T.StringType()),
        T.StructField("severityNumber", T.IntegerType()),
        T.StructField("severityText", T.StringType()),
        T.StructField("body", T.StructType([T.StructField("stringValue", T.StringType())])),
        T.StructField("attributes", _OTLP_KV),
        T.StructField("droppedAttributesCount", T.IntegerType()),
        T.StructField("traceId", T.StringType()),
        T.StructField("spanId", T.StringType()),
    ]
)
_OTLP_LOGS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceLogs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType(
                                [
                                    T.StructField("attributes", _OTLP_KV),
                                    T.StructField("droppedAttributesCount", T.IntegerType()),
                                ]
                            ),
                        ),
                        T.StructField(
                            "scopeLogs",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [
                                                    T.StructField("name", T.StringType()),
                                                    T.StructField("version", T.StringType()),
                                                    T.StructField("attributes", _OTLP_KV),
                                                ]
                                            ),
                                        ),
                                        T.StructField("logRecords", T.ArrayType(_OTLP_LOG_RECORD)),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def _attrs_to_map(col):
    return F.map_from_entries(
        F.transform(
            col,
            lambda kv: F.struct(
                kv["key"].alias("key"),
                F.coalesce(
                    kv["value"]["stringValue"],
                    kv["value"]["intValue"],
                    # cast, NOT format_number: the latter inserts thousands
                    # separators (12345.6 -> '12,345.600000'), breaking term
                    # matching on numeric attribute values.
                    kv["value"]["doubleValue"].cast("string"),
                    kv["value"]["boolValue"].cast("string"),
                ).alias("value"),
            ),
        )
    )


def parse_otlp_logs_json(requests: DataFrame, input_col: str = "value") -> DataFrame:
    """OTLP logs JSON → one row per LogRecord (UDTF semantics via explode).

    Output columns mirror the reference's OTel logs doc mapping
    (quickwit-opentelemetry/src/otlp/logs.rs:146-191): timestamp_nanos,
    observed_timestamp_nanos, severity_text, severity_number, body,
    attributes, resource_attributes, scope_name, trace_id, span_id.
    Entirely JVM-side: from_json + three explodes.
    """
    parsed = requests.select(
        F.from_json(F.col(input_col), _OTLP_LOGS_SCHEMA).alias("req")
    )
    rl = parsed.select(F.explode("req.resourceLogs").alias("rl"))
    sl = rl.select(
        F.col("rl.resource.attributes").alias("_res_attrs"),
        F.explode("rl.scopeLogs").alias("sl"),
    )
    lr = sl.select(
        "_res_attrs",
        F.col("sl.scope.name").alias("scope_name"),
        F.explode("sl.logRecords").alias("lr"),
    )
    return lr.select(
        F.col("lr.timeUnixNano").cast("long").alias("timestamp_nanos"),
        F.col("lr.observedTimeUnixNano").cast("long").alias("observed_timestamp_nanos"),
        F.col("lr.severityText").alias("severity_text"),
        F.col("lr.severityNumber").alias("severity_number"),
        F.col("lr.body.stringValue").alias("body"),
        _attrs_to_map(F.col("lr.attributes")).alias("attributes"),
        _attrs_to_map(F.col("_res_attrs")).alias("resource_attributes"),
        "scope_name",
        F.col("lr.traceId").alias("trace_id"),
        F.col("lr.spanId").alias("span_id"),
    )


_OTLP_SPAN = T.StructType(
    [
        T.StructField("traceId", T.StringType()),
        T.StructField("spanId", T.StringType()),
        T.StructField("parentSpanId", T.StringType()),
        T.StructField("traceState", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("kind", T.IntegerType()),
        T.StructField("startTimeUnixNano", T.StringType()),
        T.StructField("endTimeUnixNano", T.StringType()),
        T.StructField("attributes", _OTLP_KV),
        T.StructField("droppedAttributesCount", T.IntegerType()),
        T.StructField(
            "events",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("timeUnixNano", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("attributes", _OTLP_KV),
                    ]
                )
            ),
        ),
        T.StructField(
            "status",
            T.StructType(
                [T.StructField("message", T.StringType()), T.StructField("code", T.IntegerType())]
            ),
        ),
    ]
)
_OTLP_TRACES_SCHEMA = T.StructType(
    [
        T.StructField(
            "resourceSpans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "resource",
                            T.StructType([T.StructField("attributes", _OTLP_KV)]),
                        ),
                        T.StructField(
                            "scopeSpans",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField(
                                            "scope",
                                            T.StructType(
                                                [
                                                    T.StructField("name", T.StringType()),
                                                    T.StructField("version", T.StringType()),
                                                ]
                                            ),
                                        ),
                                        T.StructField("spans", T.ArrayType(_OTLP_SPAN)),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)

# OTLP SpanKind / StatusCode enum names (proto3; traces.rs:95-135 behavior)
_SPAN_KINDS = ["unspecified", "internal", "server", "client", "producer", "consumer"]
_STATUS_CODES = ["unset", "ok", "error"]


def parse_otlp_traces_json(requests: DataFrame, input_col: str = "value") -> DataFrame:
    """OTLP traces JSON → one row per Span (UDTF semantics via explode).

    Output mirrors the reference's OTel trace doc mapping
    (quickwit-opentelemetry/src/otlp/traces.rs — behavior only): trace_id,
    span_id, parent_span_id, trace_state, span_name, span_kind,
    span_start/end_timestamp_nanos, span_duration_millis, span_status_*,
    span_attributes, resource_attributes, scope_name, event_names.
    Entirely JVM-side: from_json + three explodes.
    """
    parsed = requests.select(
        F.from_json(F.col(input_col), _OTLP_TRACES_SCHEMA).alias("req")
    )
    rs = parsed.select(F.explode("req.resourceSpans").alias("rs"))
    ss = rs.select(
        F.col("rs.resource.attributes").alias("_res_attrs"),
        F.explode("rs.scopeSpans").alias("ss"),
    )
    sp = ss.select(
        "_res_attrs",
        F.col("ss.scope.name").alias("scope_name"),
        F.explode("ss.spans").alias("sp"),
    )
    start = F.col("sp.startTimeUnixNano").cast("long")
    end = F.col("sp.endTimeUnixNano").cast("long")
    kind_arr = F.array(*[F.lit(k) for k in _SPAN_KINDS])
    code_arr = F.array(*[F.lit(c) for c in _STATUS_CODES])
    return sp.select(
        F.col("sp.traceId").alias("trace_id"),
        F.col("sp.spanId").alias("span_id"),
        F.col("sp.parentSpanId").alias("parent_span_id"),
        F.col("sp.traceState").alias("trace_state"),
        F.col("sp.name").alias("span_name"),
        F.element_at(kind_arr, F.coalesce(F.col("sp.kind"), F.lit(0)) + 1).alias("span_kind"),
        start.alias("span_start_timestamp_nanos"),
        end.alias("span_end_timestamp_nanos"),
        ((end - start) / F.lit(1_000_000)).cast("long").alias("span_duration_millis"),
        F.element_at(code_arr, F.coalesce(F.col("sp.status.code"), F.lit(0)) + 1).alias(
            "span_status_code"
        ),
        F.col("sp.status.message").alias("span_status_message"),
        _attrs_to_map(F.col("sp.attributes")).alias("span_attributes"),
        _attrs_to_map(F.col("_res_attrs")).alias("resource_attributes"),
        "scope_name",
        F.transform(F.coalesce(F.col("sp.events"), F.array()), lambda e: e["name"]).alias(
            "event_names"
        ),
    )


def parse_otlp_logs_protobuf(*_args, **_kwargs):
    raise NotImplementedError(
        "otlp_logs_protobuf requires a protobuf runtime (not in this container); "
        "use otlp_logs_json"
    )


def parse_otlp_traces_protobuf(*_args, **_kwargs):
    raise NotImplementedError(
        "otlp_traces_protobuf requires a protobuf runtime (not in this container); "
        "use otlp_traces_json"
    )


def read_vec_source(spark: SparkSession, docs: list[str]) -> DataFrame:
    """The reference's `Vec` test source: an in-memory list of raw docs."""
    return spark.createDataFrame([(d,) for d in docs], T.StructType([T.StructField("value", T.StringType())]))


def read_void_source(spark: SparkSession) -> DataFrame:
    """The reference's `Void` source: no docs, stable schema."""
    return spark.createDataFrame([], T.StructType([T.StructField("value", T.StringType())]))
