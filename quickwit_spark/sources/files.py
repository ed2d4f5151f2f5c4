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
                    F.format_number(kv["value"]["doubleValue"], 6),
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


def parse_otlp_logs_protobuf(*_args, **_kwargs):
    raise NotImplementedError(
        "otlp_logs_protobuf requires a protobuf runtime (not in this container); "
        "use otlp_logs_json"
    )


def read_vec_source(spark: SparkSession, docs: list[str]) -> DataFrame:
    """The reference's `Vec` test source: an in-memory list of raw docs."""
    return spark.createDataFrame([(d,) for d in docs], T.StructType([T.StructField("value", T.StringType())]))


def read_void_source(spark: SparkSession) -> DataFrame:
    """The reference's `Void` source: no docs, stable schema."""
    return spark.createDataFrame([], T.StructType([T.StructField("value", T.StringType())]))
