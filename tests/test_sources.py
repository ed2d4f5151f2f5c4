"""File-source input formats (doc_processor.rs:152-189 semantics)."""

import gzip
import json
import os

import pytest

from quickwit_spark.sources.files import (
    parse_otlp_logs_json,
    parse_otlp_logs_protobuf,
    read_ndjson_lines,
    read_plain_text,
    read_vec_source,
    read_void_source,
)


def test_ndjson_gzip(spark, tmp_path):
    p = tmp_path / "logs.ndjson.gz"
    rows = [{"a": i} for i in range(5)]
    with gzip.open(p, "wt") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    df = read_ndjson_lines(spark, str(p))
    assert df.count() == 5


def test_plain_text_wraps_lines(spark, tmp_path):
    p = tmp_path / "plain.log"
    p.write_text("hello world\nsecond line\n")
    df = read_plain_text(spark, str(p))
    vals = [json.loads(r["value"]) for r in df.collect()]
    assert {"plain_text": "hello world"} in vals
    assert {"plain_text": "second line"} in vals


def test_otlp_logs_json_fan_out(spark):
    req = {
        "resourceLogs": [
            {
                "resource": {
                    "attributes": [
                        {"key": "service.name", "value": {"stringValue": "web"}}
                    ]
                },
                "scopeLogs": [
                    {
                        "scope": {"name": "scope1"},
                        "logRecords": [
                            {
                                "timeUnixNano": "1700000000000000001",
                                "severityText": "INFO",
                                "severityNumber": 9,
                                "body": {"stringValue": "started"},
                                "attributes": [
                                    {"key": "port", "value": {"intValue": "8080"}}
                                ],
                                "traceId": "0102",
                                "spanId": "0a0b",
                            },
                            {
                                "timeUnixNano": "1700000000000000002",
                                "severityText": "ERROR",
                                "body": {"stringValue": "boom"},
                                "attributes": [],
                            },
                        ],
                    }
                ],
            }
        ]
    }
    df = read_vec_source(spark, [json.dumps(req)])
    out = parse_otlp_logs_json(df).orderBy("timestamp_nanos").collect()
    assert len(out) == 2  # 1 request -> 2 docs (UDTF fan-out)
    assert out[0]["timestamp_nanos"] == 1700000000000000001
    assert out[0]["severity_text"] == "INFO"
    assert out[0]["body"] == "started"
    assert out[0]["attributes"]["port"] == "8080"
    assert out[0]["resource_attributes"]["service.name"] == "web"
    assert out[0]["scope_name"] == "scope1"
    assert out[1]["severity_text"] == "ERROR"


def test_otlp_protobuf_stubbed():
    with pytest.raises(NotImplementedError):
        parse_otlp_logs_protobuf()


def test_void_source(spark):
    assert read_void_source(spark).count() == 0


def test_otlp_traces_json(spark):
    import json

    from quickwit_spark.sources.files import parse_otlp_traces_json, read_vec_source

    req = {
        "resourceSpans": [
            {
                "resource": {"attributes": [{"key": "service.name", "value": {"stringValue": "qs"}}]},
                "scopeSpans": [
                    {
                        "scope": {"name": "lib", "version": "1"},
                        "spans": [
                            {
                                "traceId": "0102", "spanId": "aa", "name": "root",
                                "kind": 2,
                                "startTimeUnixNano": "1700000000000000000",
                                "endTimeUnixNano": "1700000001500000000",
                                "attributes": [{"key": "http.status", "value": {"intValue": "200"}}],
                                "events": [{"timeUnixNano": "1700000000100000000", "name": "ev1"}],
                                "status": {"code": 2, "message": "boom"},
                            },
                            {
                                "traceId": "0102", "spanId": "bb", "parentSpanId": "aa",
                                "name": "child",
                                "startTimeUnixNano": "1700000000200000000",
                                "endTimeUnixNano": "1700000000300000000",
                            },
                        ],
                    }
                ],
            }
        ]
    }
    df = read_vec_source(spark, [json.dumps(req)])
    rows = {r["span_id"]: r for r in parse_otlp_traces_json(df).collect()}
    assert set(rows) == {"aa", "bb"}
    root = rows["aa"]
    assert root["span_name"] == "root" and root["span_kind"] == "server"
    assert root["span_duration_millis"] == 1500
    assert root["span_status_code"] == "error" and root["span_status_message"] == "boom"
    assert root["span_attributes"]["http.status"] == "200"
    assert root["resource_attributes"]["service.name"] == "qs"
    assert root["event_names"] == ["ev1"]
    child = rows["bb"]
    assert child["parent_span_id"] == "aa" and child["span_kind"] == "unspecified"
    assert child["span_status_code"] == "unset"


def test_otlp_protobuf_variants_raise(spark):
    import pytest as _pytest

    from quickwit_spark.sources.files import (
        parse_otlp_logs_protobuf,
        parse_otlp_traces_protobuf,
    )

    with _pytest.raises(NotImplementedError):
        parse_otlp_logs_protobuf()
    with _pytest.raises(NotImplementedError):
        parse_otlp_traces_protobuf()


def test_iceberg_gated_sink_falls_back_to_parquet(spark, tmp_path_factory):
    from quickwit_spark.sources.iceberg import iceberg_available, read_sink, write_sink

    assert iceberg_available(spark) is False  # no jars in this sandbox
    out = os.path.join(str(tmp_path_factory.mktemp("ice")), "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "sink"])
    engine = write_sink(spark, df, out, partition_cols=("sink",))
    assert engine == "parquet"
    back = read_sink(spark, out)
    assert back.count() == 2 and set(back.columns) == {"id", "sink"}
