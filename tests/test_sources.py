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


def _pb_varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _pb_len(fno: int, payload: bytes) -> bytes:
    return _pb_varint(fno << 3 | 2) + _pb_varint(len(payload)) + payload


def _pb_str(fno: int, s: str) -> bytes:
    return _pb_len(fno, s.encode())


def _pb_fixed64(fno: int, v: int) -> bytes:
    import struct

    return _pb_varint(fno << 3 | 1) + struct.pack("<Q", v)


def _pb_vint(fno: int, v: int) -> bytes:
    return _pb_varint(fno << 3 | 0) + _pb_varint(v)


def _pb_kv(key: str, value_payload: bytes) -> bytes:
    return _pb_str(1, key) + _pb_len(2, value_payload)


def test_otlp_logs_protobuf_matches_json(spark):
    """Hand-encoded LogsData wire bytes decode to EXACTLY the rows the JSON
    path produces for the equivalent request (output parity golden)."""
    import json

    from quickwit_spark.sources.files import read_vec_source

    rec1 = (
        _pb_fixed64(1, 1700000000000000001)
        + _pb_vint(2, 9)
        + _pb_str(3, "INFO")
        + _pb_len(5, _pb_str(1, "started"))          # body.stringValue
        + _pb_len(6, _pb_kv("port", _pb_vint(3, 8080)))  # intValue attr
        + _pb_len(9, bytes.fromhex("0102"))
        + _pb_len(10, bytes.fromhex("0a0b"))
    )
    rec2 = _pb_fixed64(1, 1700000000000000002) + _pb_str(3, "ERROR") + _pb_len(
        5, _pb_str(1, "boom")
    )
    scope_logs = _pb_len(1, _pb_str(1, "scope1")) + _pb_len(2, rec1) + _pb_len(2, rec2)
    resource = _pb_len(1, _pb_kv("service.name", _pb_str(1, "web")))
    payload = _pb_len(1, _pb_len(1, resource) + _pb_len(2, scope_logs))

    bin_df = spark.createDataFrame([(bytearray(payload),)], "value binary")
    got = parse_otlp_logs_protobuf(bin_df).orderBy("timestamp_nanos").collect()

    req = {
        "resourceLogs": [
            {
                "resource": {"attributes": [
                    {"key": "service.name", "value": {"stringValue": "web"}}]},
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
                                    {"key": "port", "value": {"intValue": "8080"}}],
                                "traceId": "0102",
                                "spanId": "0a0b",
                            },
                            {
                                "timeUnixNano": "1700000000000000002",
                                "severityText": "ERROR",
                                "body": {"stringValue": "boom"},
                            },
                        ],
                    }
                ],
            }
        ]
    }
    want = (
        parse_otlp_logs_json(read_vec_source(spark, [json.dumps(req)]))
        .orderBy("timestamp_nanos")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_otlp_traces_protobuf_matches_json(spark):
    import json

    from quickwit_spark.sources.files import (
        parse_otlp_traces_json,
        parse_otlp_traces_protobuf,
        read_vec_source,
    )

    span1 = (
        _pb_len(1, bytes.fromhex("0102"))
        + _pb_len(2, bytes.fromhex("aa"))
        + _pb_str(5, "root")
        + _pb_vint(6, 2)
        + _pb_fixed64(7, 1700000000000000000)
        + _pb_fixed64(8, 1700000001500000000)
        + _pb_len(9, _pb_kv("http.status", _pb_vint(3, 200)))
        + _pb_len(11, _pb_fixed64(1, 1700000000100000000) + _pb_str(2, "ev1"))
        + _pb_len(15, _pb_str(2, "boom") + _pb_vint(3, 2))
    )
    span2 = (
        _pb_len(1, bytes.fromhex("0102"))
        + _pb_len(2, bytes.fromhex("bb"))
        + _pb_len(4, bytes.fromhex("aa"))
        + _pb_str(5, "child")
        + _pb_fixed64(7, 1700000000200000000)
        + _pb_fixed64(8, 1700000000300000000)
    )
    scope_spans = (
        _pb_len(1, _pb_str(1, "lib") + _pb_str(2, "1"))
        + _pb_len(2, span1)
        + _pb_len(2, span2)
    )
    resource = _pb_len(1, _pb_kv("service.name", _pb_str(1, "qs")))
    payload = _pb_len(1, _pb_len(1, resource) + _pb_len(2, scope_spans))

    bin_df = spark.createDataFrame([(bytearray(payload),)], "value binary")
    got = parse_otlp_traces_protobuf(bin_df).orderBy("span_id").collect()

    req = {
        "resourceSpans": [
            {
                "resource": {"attributes": [
                    {"key": "service.name", "value": {"stringValue": "qs"}}]},
                "scopeSpans": [
                    {
                        "scope": {"name": "lib", "version": "1"},
                        "spans": [
                            {
                                "traceId": "0102", "spanId": "aa", "name": "root",
                                "kind": 2,
                                "startTimeUnixNano": "1700000000000000000",
                                "endTimeUnixNano": "1700000001500000000",
                                "attributes": [{"key": "http.status",
                                                "value": {"intValue": "200"}}],
                                "events": [{"timeUnixNano": "1700000000100000000",
                                            "name": "ev1"}],
                                "status": {"code": 2, "message": "boom"},
                            },
                            {
                                "traceId": "0102", "spanId": "bb",
                                "parentSpanId": "aa", "name": "child",
                                "startTimeUnixNano": "1700000000200000000",
                                "endTimeUnixNano": "1700000000300000000",
                            },
                        ],
                    }
                ],
            }
        ]
    }
    want = (
        parse_otlp_traces_json(read_vec_source(spark, [json.dumps(req)]))
        .orderBy("span_id")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


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


def test_iceberg_gated_sink_falls_back_to_parquet(spark, tmp_path_factory):
    from quickwit_spark.sources.iceberg import iceberg_available, read_sink, write_sink

    assert iceberg_available(spark) is False  # no jars in this sandbox
    out = os.path.join(str(tmp_path_factory.mktemp("ice")), "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "sink"])
    engine = write_sink(spark, df, out, partition_cols=("sink",))
    assert engine == "parquet"
    back = read_sink(spark, out)
    assert back.count() == 2 and set(back.columns) == {"id", "sink"}


def test_otlp_protobuf_corrupt_payload_degrades_to_null(spark):
    """Self-review r4: one truncated wire payload must drop like the JSON
    path's unparseable row, not kill the batch."""
    from quickwit_spark.sources.files import parse_otlp_logs_protobuf

    good = bytes.fromhex("0a00")  # empty ResourceLogs entry
    corrupt = b"\x0a\xff\xff\xff\xff\xff"  # length prefix past the buffer
    df = spark.createDataFrame([(corrupt,), (good,)], "value binary")
    # no exception; the corrupt row yields no records
    assert parse_otlp_logs_protobuf(df).count() == 0


def test_otlp_duplicate_and_null_attr_keys_do_not_crash(spark):
    from quickwit_spark.sources.files import parse_otlp_logs_json

    body = {
        "resourceLogs": [{
            "resource": {"attributes": [
                {"key": "k", "value": {"stringValue": "a"}},
                {"key": "k", "value": {"stringValue": "b"}},   # duplicate
                {"key": None, "value": {"stringValue": "x"}},  # null key
            ]},
            "scopeLogs": [{
                "scope": {"name": "s"},
                "logRecords": [{
                    "timeUnixNano": "1700000000000000000",
                    "severityText": "INFO",
                    "body": {"stringValue": "m"},
                    "attributes": [],
                }],
            }],
        }]
    }
    import json as _json

    df = spark.createDataFrame([(_json.dumps(body),)], "value string")
    rows = parse_otlp_logs_json(df).collect()
    assert len(rows) == 1
    # duplicate key resolved last-wins; null key dropped
    assert rows[0]["resource_attributes"] == {"k": "b"}


def test_otlp_out_of_range_enums_map_to_unspecified(spark):
    from quickwit_spark.sources.files import parse_otlp_traces_json

    body = {
        "resourceSpans": [{
            "resource": {"attributes": []},
            "scopeSpans": [{
                "scope": {"name": "s"},
                "spans": [{
                    "traceId": "ab", "spanId": "cd", "name": "sp",
                    "kind": 99, "status": {"code": 7},
                    "startTimeUnixNano": "1", "endTimeUnixNano": "2",
                    "attributes": [], "events": [],
                }],
            }],
        }]
    }
    import json as _json

    df = spark.createDataFrame([(_json.dumps(body),)], "value string")
    row = parse_otlp_traces_json(df).collect()[0]
    assert "UNSPECIFIED" in row["span_kind"].upper() or row["span_kind"] == "unspecified"
    assert "UNSET" in row["span_status_code"].upper() or "UNSPECIFIED" in row["span_status_code"].upper()


def test_otlp_rest_ingest_endpoints(spark):
    """api.otlp_ingest_logs/traces — the OTLP HTTP ingest wrapper
    (otlp_api/rest_handler.rs): Export request body in → parsed rows +
    partialSuccess response out; json and protobuf agree."""
    import json

    from quickwit_spark import api

    req = {
        "resourceLogs": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "web"}}
            ]},
            "scopeLogs": [{
                "scope": {"name": "s1"},
                "logRecords": [
                    {"timeUnixNano": "1700000000000000001",
                     "severityText": "INFO", "severityNumber": 9,
                     "body": {"stringValue": "started"}},
                    {"timeUnixNano": "1700000000000000002",
                     "severityText": "WARN", "severityNumber": 13,
                     "body": {"stringValue": "slow"}},
                ],
            }],
        }]
    }
    resp, df = api.otlp_ingest_logs(spark, json.dumps(req), fmt="json")
    assert resp == {"partialSuccess": {"rejectedLogRecords": 0}}
    rows = sorted(df.collect(), key=lambda r: r["timestamp_nanos"])
    assert [r["severity_text"] for r in rows] == ["INFO", "WARN"]
    assert rows[0]["body"] == "started"

    with pytest.raises(ValueError, match="unsupported OTLP content format"):
        api.otlp_ingest_logs(spark, "{}", fmt="xml")
    with pytest.raises(ValueError, match="must be bytes"):
        api.otlp_ingest_logs(spark, "{}", fmt="protobuf")
