"""File sources with Quickwit input-format semantics (SURVEY §2.1).

Behavior from quickwit-indexing/src/actors/doc_processor.rs:152-189 and
source/doc_file_reader.rs (studied for behavior only):

- ``json`` (NDJSON, optionally gzip): one JSON object per line; parse errors
  are counted per line, not fatal.
- ``plain_text``: each line becomes ``{"plain_text": <line>}``.
- ``otlp_logs_json``: one OTLP ExportLogsServiceRequest JSON per line fans
  out to one doc per LogRecord (a UDTF shape → explode), with the field
  names of the reference's OTel doc mapping (timestamp_nanos, severity_text,
  body, attributes, resource_attributes, ...).
- ``otlp_logs_protobuf`` / ``otlp_traces_protobuf``: binary OTLP wire
  payloads, decoded by a pure-Python proto3 walker into the JSON dict shape
  (no protobuf dependency needed), then the JSON pipeline runs unchanged.

All readers return a DataFrame of raw docs ready for the DocMapper; Spark's
file listing + byte-offset ranges replace the reference's per-file byte
checkpoints (a resume never re-reads consumed files thanks to the
checkpoint/lineage layer or Structured Streaming's file-source log).
"""

from __future__ import annotations

import pandas as pd
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


def _enum_or_unspecified(arr, idx, n: int):
    """Enum-int → name lookup that treats out-of-range values (future enum
    additions, junk varints from permissive decoders) as the UNSPECIFIED
    first entry instead of raising INVALID_ARRAY_INDEX under ANSI mode."""
    i = F.coalesce(idx, F.lit(0))
    return F.when(i.between(0, n - 1), F.element_at(arr, i + 1)).otherwise(
        F.element_at(arr, 1)
    )


def _attrs_to_map(col):
    # null attribute keys are legal on the OTLP wire (buggy exporters emit
    # them) but illegal as map keys — drop those entries; duplicated keys
    # dedup last-wins via the session's mapKeyDedupPolicy
    return F.map_from_entries(
        F.transform(
            F.filter(col, lambda kv: kv["key"].isNotNull()),
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
        F.col("lr.timeUnixNano").try_cast("long").alias("timestamp_nanos"),
        F.col("lr.observedTimeUnixNano").try_cast("long").alias("observed_timestamp_nanos"),
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
    res_attrs = _attrs_to_map(F.col("_res_attrs"))
    service_name = F.element_at(res_attrs, "service.name")
    kind_int = F.coalesce(F.col("sp.kind"), F.lit(0))
    # SpanFingerprint (traces.rs:406-421): service \0 kind-digit \0 span_name
    # — ONE sortable term whose [start_key, end_key) ranges answer Jaeger
    # GetOperations straight from the term dictionary
    fingerprint = F.concat(
        F.coalesce(service_name, F.lit("")),
        F.lit("\x00"),
        kind_int.cast("string"),
        F.lit("\x00"),
        F.col("sp.name"),
    )
    return sp.select(
        F.col("sp.traceId").alias("trace_id"),
        F.col("sp.spanId").alias("span_id"),
        F.col("sp.parentSpanId").alias("parent_span_id"),
        F.col("sp.traceState").alias("trace_state"),
        F.col("sp.name").alias("span_name"),
        _enum_or_unspecified(kind_arr, F.col("sp.kind"), len(_SPAN_KINDS)).alias("span_kind"),
        start.alias("span_start_timestamp_nanos"),
        end.alias("span_end_timestamp_nanos"),
        ((end - start) / F.lit(1_000_000)).cast("long").alias("span_duration_millis"),
        _enum_or_unspecified(code_arr, F.col("sp.status.code"), len(_STATUS_CODES)).alias(
            "span_status_code"
        ),
        F.col("sp.status.message").alias("span_status_message"),
        _attrs_to_map(F.col("sp.attributes")).alias("span_attributes"),
        _attrs_to_map(F.col("_res_attrs")).alias("resource_attributes"),
        "scope_name",
        F.transform(F.coalesce(F.col("sp.events"), F.array()), lambda e: e["name"]).alias(
            "event_names"
        ),
        service_name.alias("service_name"),
        fingerprint.alias("span_fingerprint"),
    )


# ---------------------------------------------------------------------------
# OTLP protobuf wire decoding (pure Python — no protobuf runtime needed)
#
# The OTLP wire format is plain proto3: varint tags, length-delimited
# submessages, fixed64 times. A ~100-line schema-driven walker decodes
# LogsData / TracesData payloads into the SAME camelCase dict shape as the
# OTLP JSON encoding, so the binary path reuses the JSON explode pipeline
# verbatim — output parity by construction (reference accepts both bodies in
# quickwit-indexing/src/actors/doc_processor.rs:152-189).
# ---------------------------------------------------------------------------


def _pb_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _pb_decode(buf: bytes, schema: dict) -> dict:
    """Decode one message given {field_no: (json_name, type, repeated, sub)}.
    Types: str, hex (bytes→lowercase hex, the OTLP JSON id encoding),
    varint (int), bool, i64str (signed varint → decimal string, proto3 JSON
    int64 mapping), double (fixed64), u64str (fixed64 → decimal string, the
    *UnixNano JSON mapping), msg (nested). Unknown fields are skipped."""
    import struct

    out: dict = {}
    i, n = 0, len(buf)
    while i < n:
        tag, i = _pb_varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            raw, i = _pb_varint(buf, i)
        elif wt == 1:
            raw, i = buf[i: i + 8], i + 8
        elif wt == 5:
            raw, i = buf[i: i + 4], i + 4
        elif wt == 2:
            ln, i = _pb_varint(buf, i)
            raw, i = buf[i: i + ln], i + ln
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")
        spec = schema.get(fno)
        if spec is None:
            continue
        name, typ, repeated, sub = spec
        if typ == "str":
            val = raw.decode("utf-8")
        elif typ == "hex":
            val = raw.hex()
        elif typ == "msg":
            val = _pb_decode(raw, sub)
        elif typ == "varint":
            val = int(raw)
        elif typ == "bool":
            val = bool(raw)
        elif typ == "i64str":
            v = int(raw)
            val = str(v - (1 << 64) if v >= 1 << 63 else v)
        elif typ == "double":
            val = struct.unpack("<d", raw)[0]
        elif typ == "u64str":
            if wt == 1:
                val = str(struct.unpack("<Q", raw)[0])
            else:  # writers may emit varint for the nano fields
                val = str(int(raw))
        else:  # pragma: no cover
            raise ValueError(f"unknown pb type {typ}")
        if repeated:
            out.setdefault(name, []).append(val)
        else:
            out[name] = val
    return out


_PB_ANYVALUE: dict = {
    1: ("stringValue", "str", False, None),
    2: ("boolValue", "bool", False, None),
    3: ("intValue", "i64str", False, None),
    4: ("doubleValue", "double", False, None),
}
_PB_KV = {1: ("key", "str", False, None), 2: ("value", "msg", False, _PB_ANYVALUE)}
_PB_RESOURCE = {1: ("attributes", "msg", True, _PB_KV)}
_PB_SCOPE = {1: ("name", "str", False, None), 2: ("version", "str", False, None)}
_PB_LOG_RECORD = {
    1: ("timeUnixNano", "u64str", False, None),
    11: ("observedTimeUnixNano", "u64str", False, None),
    2: ("severityNumber", "varint", False, None),
    3: ("severityText", "str", False, None),
    5: ("body", "msg", False, _PB_ANYVALUE),
    6: ("attributes", "msg", True, _PB_KV),
    7: ("droppedAttributesCount", "varint", False, None),
    9: ("traceId", "hex", False, None),
    10: ("spanId", "hex", False, None),
}
_PB_SCOPE_LOGS = {
    1: ("scope", "msg", False, _PB_SCOPE),
    2: ("logRecords", "msg", True, _PB_LOG_RECORD),
}
_PB_RESOURCE_LOGS = {
    1: ("resource", "msg", False, _PB_RESOURCE),
    2: ("scopeLogs", "msg", True, _PB_SCOPE_LOGS),
}
_PB_LOGS_DATA = {1: ("resourceLogs", "msg", True, _PB_RESOURCE_LOGS)}

_PB_EVENT = {
    1: ("timeUnixNano", "u64str", False, None),
    2: ("name", "str", False, None),
    3: ("attributes", "msg", True, _PB_KV),
}
_PB_STATUS = {2: ("message", "str", False, None), 3: ("code", "varint", False, None)}
_PB_SPAN = {
    1: ("traceId", "hex", False, None),
    2: ("spanId", "hex", False, None),
    3: ("traceState", "str", False, None),
    4: ("parentSpanId", "hex", False, None),
    5: ("name", "str", False, None),
    6: ("kind", "varint", False, None),
    7: ("startTimeUnixNano", "u64str", False, None),
    8: ("endTimeUnixNano", "u64str", False, None),
    9: ("attributes", "msg", True, _PB_KV),
    10: ("droppedAttributesCount", "varint", False, None),
    11: ("events", "msg", True, _PB_EVENT),
    15: ("status", "msg", False, _PB_STATUS),
}
_PB_SCOPE_SPANS = {
    1: ("scope", "msg", False, _PB_SCOPE),
    2: ("spans", "msg", True, _PB_SPAN),
}
_PB_RESOURCE_SPANS = {
    1: ("resource", "msg", False, _PB_RESOURCE),
    2: ("scopeSpans", "msg", True, _PB_SCOPE_SPANS),
}
_PB_TRACES_DATA = {1: ("resourceSpans", "msg", True, _PB_RESOURCE_SPANS)}


def _pb_to_json_udf(root_schema: dict):
    import json

    @F.pandas_udf(T.StringType())
    def decode(payloads: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            try:
                return json.dumps(_pb_decode(bytes(b), root_schema))
            except (IndexError, ValueError, UnicodeDecodeError, KeyError):
                # corrupt/truncated wire payload: degrade to null exactly
                # like the JSON path (from_json → null → dropped), instead
                # of failing the whole Arrow batch. Decoder bugs on VALID
                # input are covered by the protobuf≡json parity goldens.
                return None

        return payloads.map(one)

    return decode


def parse_otlp_logs_protobuf(requests: DataFrame, input_col: str = "value") -> DataFrame:
    """OTLP logs PROTOBUF (binary column) → one row per LogRecord. Wire
    payloads decode to the OTLP-JSON dict shape in one Arrow-batched UDF,
    then the JSON explode pipeline runs unchanged — identical output columns
    to :func:`parse_otlp_logs_json` (golden-tested)."""
    as_json = requests.select(
        _pb_to_json_udf(_PB_LOGS_DATA)(F.col(input_col)).alias("value")
    )
    return parse_otlp_logs_json(as_json)


def parse_otlp_traces_protobuf(requests: DataFrame, input_col: str = "value") -> DataFrame:
    """OTLP traces PROTOBUF (binary column) → one row per Span; see
    :func:`parse_otlp_logs_protobuf` for the decode strategy."""
    as_json = requests.select(
        _pb_to_json_udf(_PB_TRACES_DATA)(F.col(input_col)).alias("value")
    )
    return parse_otlp_traces_json(as_json)


def read_vec_source(spark: SparkSession, docs: list[str]) -> DataFrame:
    """The reference's `Vec` test source: an in-memory list of raw docs."""
    return spark.createDataFrame([(d,) for d in docs], T.StructType([T.StructField("value", T.StringType())]))


def read_void_source(spark: SparkSession) -> DataFrame:
    """The reference's `Void` source: no docs, stable schema."""
    return spark.createDataFrame([], T.StructType([T.StructField("value", T.StringType())]))
