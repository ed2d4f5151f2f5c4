"""Jaeger query surface over the OTLP traces source (quickwit-jaeger/src/
lib.rs + jaeger_api rest_handler.rs behavior — services/operations from the
term space, FindTraceIds + fetch for traces, Jaeger-model JSON shapes)."""

import json

import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators import jaeger as J
from quickwit_spark.sources.files import parse_otlp_traces_json, read_vec_source


def _span(trace, span, name, kind, start_s, dur_ms, parent=None, attrs=None, status=None):
    s = {
        "traceId": trace,
        "spanId": span,
        "name": name,
        "kind": kind,
        "startTimeUnixNano": str(start_s * 1_000_000_000),
        "endTimeUnixNano": str(start_s * 1_000_000_000 + dur_ms * 1_000_000),
    }
    if parent:
        s["parentSpanId"] = parent
    if attrs:
        s["attributes"] = [
            {"key": k, "value": {"stringValue": v}} for k, v in attrs.items()
        ]
    if status is not None:
        s["status"] = {"code": status}
    return s


@pytest.fixture(scope="module")
def spans(spark):
    def req(service, spans_):
        return {
            "resourceSpans": [
                {
                    "resource": {
                        "attributes": [
                            {"key": "service.name", "value": {"stringValue": service}},
                            {"key": "deployment", "value": {"stringValue": "prod"}},
                        ]
                    },
                    "scopeSpans": [{"scope": {"name": "lib"}, "spans": spans_}],
                }
            ]
        }

    reqs = [
        req(
            "frontend",
            [
                _span("t1", "a1", "GET /", 2, 1_700_000_100, 120, status=2),
                _span("t1", "a2", "auth", 3, 1_700_000_100, 30, parent="a1"),
                _span("t2", "b1", "GET /", 2, 1_700_000_200, 40,
                      attrs={"http.method": "GET"}),
            ],
        ),
        req(
            "billing",
            [
                _span("t3", "c1", "charge", 2, 1_700_000_300, 500),
                _span("t1", "c2", "charge", 5, 1_700_000_100, 80, parent="a2"),
            ],
        ),
    ]
    df = parse_otlp_traces_json(read_vec_source(spark, [json.dumps(r) for r in reqs]))
    return df.cache()


def test_get_services(spans):
    assert J.get_services(spans) == ["billing", "frontend"]


def test_get_operations(spans):
    ops = J.get_operations(spans, "frontend")
    assert ops == [
        {"name": "GET /", "spanKind": "server"},
        {"name": "auth", "spanKind": "client"},
    ]
    # span-kind-scoped term range (SpanFingerprint start/end keys)
    assert J.get_operations(spans, "frontend", "server") == [
        {"name": "GET /", "spanKind": "server"}
    ]
    assert J.get_operations(spans, "billing") == [
        {"name": "charge", "spanKind": "consumer"},
        {"name": "charge", "spanKind": "server"},
    ]
    assert J.get_operations(spans, "nope") == []


def test_find_traces_service_and_tags(spans):
    # most-recent-first trace ordering (FindTraceIds max span start desc)
    traces = J.find_traces(spans, service="frontend")
    assert [t["traceID"] for t in traces] == ["t2", "t1"]
    # fetch returns ALL spans of a matched trace, even other services' spans
    t1 = next(t for t in traces if t["traceID"] == "t1")
    assert {s["spanID"] for s in t1["spans"]} == {"a1", "a2", "c2"}
    assert t1["processes"]["p-billing"]["serviceName"] == "billing"

    # tag matches span OR resource attributes (build_search_query semantics)
    assert [t["traceID"] for t in J.find_traces(spans, tags={"http.method": "GET"})] == ["t2"]
    byres = J.find_traces(spans, service="billing", tags={"deployment": "prod"})
    assert sorted(t["traceID"] for t in byres) == ["t1", "t3"]
    # error pseudo-tag → status code
    assert [t["traceID"] for t in J.find_traces(spans, tags={"error": "true"})] == ["t1"]
    # duration + time-range bounds
    assert [t["traceID"] for t in J.find_traces(spans, min_duration_millis=400)] == ["t3"]
    assert [
        t["traceID"]
        for t in J.find_traces(spans, min_start_secs=1_700_000_150,
                               max_start_secs=1_700_000_250)
    ] == ["t2"]


def test_get_trace_shape(spans):
    tr = J.get_trace(spans, "t1")
    assert tr["traceID"] == "t1"
    spans_by_id = {s["spanID"]: s for s in tr["spans"]}
    root = spans_by_id["a1"]
    assert root["operationName"] == "GET /"
    assert root["startTime"] == 1_700_000_100 * 1_000_000  # µs
    assert root["duration"] == 120_000  # µs
    assert {"key": "error", "type": "bool", "value": True} in root["tags"]
    child = spans_by_id["a2"]
    assert child["references"] == [
        {"refType": "CHILD_OF", "traceID": "t1", "spanID": "a1"}
    ]
    assert J.get_trace(spans, "missing") is None


def test_span_fingerprint_column(spans):
    fp = (
        spans.filter(F.col("span_id") == "a2")
        .select("span_fingerprint")
        .first()[0]
    )
    assert fp == "frontend\x003\x00auth"  # service \0 kind-int \0 name
