"""Jaeger query surface over the OTLP traces source — the analog of
quickwit-jaeger/src/lib.rs + quickwit-serve jaeger_api (behavior only):

- :func:`get_services`      — GET /{index}/jaeger/api/services
- :func:`get_operations`    — GET .../services/{service}/operations
- :func:`find_traces`       — GET .../traces?service=...&tags=...
- :func:`get_trace`         — GET .../traces/{trace_id}

All four run over the span frame produced by
``sources.files.parse_otlp_traces_json`` (one row per span). The reference
answers services/operations from the term DICTIONARY (root_list_terms over
``service_name`` / the composite ``span_fingerprint`` term) and traces via
the FindTraceIds aggregation followed by a fetch — the same two-phase
shape here: a distinct/TakeOrdered for listings, find_trace_ids + a
semi-join fetch for traces.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUL = "\x00"
_SOH = "\x01"

# OTLP SpanKind ints ↔ Jaeger span.kind tag values (jaeger model)
_KIND_NAMES = ["unspecified", "internal", "server", "client", "producer", "consumer"]


def get_services(spans: DataFrame) -> list[str]:
    """Sorted distinct service names (get_services_impl: ListTerms over
    ``service_name``, max 1000)."""
    from quickwit_spark.api import list_terms

    return list_terms(
        spans.sparkSession, spans, "service_name", {"service_name": "raw"},
        max_hits=1000,
    )


def get_operations(spans: DataFrame, service: str, span_kind: str = "") -> list[dict]:
    """Operations of a service (get_operations_impl): a term-range scan over
    the composite ``span_fingerprint`` (service ``\\0`` kind ``\\0`` name) —
    [start_key, end_key) exactly as SpanFingerprint::start_key/end_key
    build them (traces.rs:446-472), so no span rows are grouped, only the
    term space."""
    from quickwit_spark.api import list_terms

    kind_digit = (
        str(_KIND_NAMES.index(span_kind)) if span_kind in _KIND_NAMES[1:] else None
    )
    start_key = service + _NUL + (kind_digit + _NUL if kind_digit else "")
    end_key = service + ((_NUL + kind_digit) if kind_digit else "") + _SOH
    fps = list_terms(
        spans.sparkSession, spans, "span_fingerprint", {"span_fingerprint": "raw"},
        start_key=start_key, end_key=end_key, max_hits=1000,
    )
    out = []
    for fp in fps:
        parts = fp.split(_NUL)
        if len(parts) != 3:
            continue
        kind_i = int(parts[1]) if parts[1].isdigit() else 0
        out.append({"name": parts[2], "spanKind": _KIND_NAMES[kind_i]})
    return sorted(out, key=lambda o: (o["name"], o["spanKind"]))


def _traces_filter(
    spans: DataFrame,
    service: str = "",
    operation: str = "",
    tags: dict[str, str] | None = None,
    min_start_secs: int | None = None,
    max_start_secs: int | None = None,
    min_duration_millis: int | None = None,
    max_duration_millis: int | None = None,
) -> DataFrame:
    """build_search_query (quickwit-jaeger/src/lib.rs:553-680) as a Column
    predicate: service/operation terms, per-tag OR over span and resource
    attributes, the `error` pseudo-tag on the status code, duration range,
    span-start range."""
    df = spans
    if service:
        df = df.filter(F.col("service_name") == service)
    if operation:
        df = df.filter(F.col("span_name") == operation)
    for key, value in sorted((tags or {}).items()):
        if key == "error":
            cond = F.col("span_status_code") == "error"
            df = df.filter(cond if value == "true" else ~F.coalesce(cond, F.lit(False)))
        elif key == "event":
            df = df.filter(F.array_contains(F.col("event_names"), value))
        else:
            df = df.filter(
                (F.element_at(F.col("span_attributes"), key) == value)
                | (F.element_at(F.col("resource_attributes"), key) == value)
            )
    if min_duration_millis is not None:
        df = df.filter(F.col("span_duration_millis") >= min_duration_millis)
    if max_duration_millis is not None:
        df = df.filter(F.col("span_duration_millis") <= max_duration_millis)
    if min_start_secs is not None:
        df = df.filter(F.col("span_start_timestamp_nanos") >= min_start_secs * 1_000_000_000)
    if max_start_secs is not None:
        df = df.filter(F.col("span_start_timestamp_nanos") <= max_start_secs * 1_000_000_000)
    return df


def find_traces(spans: DataFrame, num_traces: int = 20, **query) -> list[dict[str, Any]]:
    """FindTraces: phase 1 = FindTraceIds over the filtered spans (top
    ``num_traces`` trace ids by most-recent span start, the reference's
    aggregation); phase 2 = fetch ALL spans of the surviving ids (a
    broadcast semi-join against the tiny id list — at 10^12 spans the
    corpus side is one scan, never shuffled on the span key) and assemble
    Jaeger-model traces."""
    from quickwit_spark.operators.aggs import find_trace_ids

    filtered = _traces_filter(spans, **query)
    ids = find_trace_ids(
        filtered, "trace_id", "span_start_timestamp_nanos", k=num_traces
    )
    id_rows = [r["trace_id"] for r in ids.collect()]
    if not id_rows:
        return []
    fetched = spans.filter(F.col("trace_id").isin(id_rows))
    by_trace: dict[str, list] = {tid: [] for tid in id_rows}
    for r in fetched.collect():
        by_trace[r["trace_id"]].append(_jaeger_span(r))
    return [
        {
            "traceID": tid,
            "spans": sorted(by_trace[tid], key=lambda s: (s["startTime"], s["spanID"])),
            "processes": _processes(by_trace[tid]),
        }
        for tid in id_rows
    ]


def get_trace(spans: DataFrame, trace_id: str) -> dict[str, Any] | None:
    """GET traces/{trace_id}: every span of one trace in Jaeger shape, or
    None (the handler's 404)."""
    rows = [_jaeger_span(r) for r in spans.filter(F.col("trace_id") == trace_id).collect()]
    if not rows:
        return None
    return {
        "traceID": trace_id,
        "spans": sorted(rows, key=lambda s: (s["startTime"], s["spanID"])),
        "processes": _processes(rows),
    }


def _jaeger_span(r) -> dict[str, Any]:
    """Span row → Jaeger JSON span (jaeger_api/model.rs shape): µs times,
    attribute tags, CHILD_OF reference, process keyed by service."""
    tags = [
        {"key": k, "type": "string", "value": v}
        for k, v in sorted((r["span_attributes"] or {}).items())
    ]
    kind = r["span_kind"]
    if kind and kind != "unspecified":
        tags.append({"key": "span.kind", "type": "string", "value": kind})
    if r["span_status_code"] == "error":
        tags.append({"key": "error", "type": "bool", "value": True})
    refs = (
        [{"refType": "CHILD_OF", "traceID": r["trace_id"], "spanID": r["parent_span_id"]}]
        if r["parent_span_id"]
        else []
    )
    return {
        "traceID": r["trace_id"],
        "spanID": r["span_id"],
        "operationName": r["span_name"],
        "startTime": int(r["span_start_timestamp_nanos"] // 1000),
        "duration": int(
            (r["span_end_timestamp_nanos"] - r["span_start_timestamp_nanos"]) // 1000
        ),
        "tags": tags,
        "references": refs,
        "processID": "p-" + (r["service_name"] or "unknown"),
        "_serviceName": r["service_name"] or "unknown",
    }


def _processes(spans: list[dict]) -> dict[str, dict]:
    procs = {}
    for s in spans:
        procs[s["processID"]] = {"serviceName": s.pop("_serviceName", "unknown"), "tags": []}
    return procs
