"""VRL-equivalent transform spec tests (vrl_processing.rs semantics)."""

import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators.transforms import GROK_PATTERNS, apply_transforms, expand_grok


def test_expand_grok():
    p = expand_grok("%{LOGLEVEL:level} tenant=%{WORD:tenant} took %{INT:ms}ms")
    assert "(?<level>" in p and "(?<tenant>" in p and "(?<ms>" in p
    assert GROK_PATTERNS["INT"] in p


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "INFO tenant=acme took 12ms extra=1 k=v"),
        (2, "ERROR tenant=umbrella took 999ms"),
        (3, "no match here"),
    ]
    return spark.createDataFrame(rows, ["id", "line"])


def test_grok_extraction_and_error(df):
    out = apply_transforms(
        df,
        [
            {
                "op": "grok",
                "field": "line",
                "pattern": "%{LOGLEVEL:level} tenant=%{WORD:tenant} took %{INT:ms}ms",
                "groups": {"ms": "long"},
            }
        ],
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["level"] == "INFO" and rows[1]["tenant"] == "acme" and rows[1]["ms"] == 12
    assert rows[2]["ms"] == 999
    assert rows[3]["level"] is None
    assert rows[3]["_transform_error"] is not None
    assert rows[1]["_transform_error"] is None


def test_rename_drop_set_mask(df):
    out = apply_transforms(
        df,
        [
            {"op": "rename", "from": "line", "to": "raw"},
            {"op": "set", "field": "source", "value": "syslog"},
            {"op": "mask", "field": "raw", "pattern": r"tenant=\w+", "replacement": "tenant=***"},
        ],
    )
    r = out.filter(F.col("id") == 1).collect()[0]
    assert r["source"] == "syslog"
    assert "tenant=***" in r["raw"]
    assert "raw" in out.columns and "line" not in out.columns


def test_parse_kv(df):
    out = apply_transforms(df, [{"op": "parse_kv", "field": "line", "to": "attrs"}])
    r = out.filter(F.col("id") == 1).collect()[0]
    assert r["attrs"]["extra"] == "1" and r["attrs"]["k"] == "v"


def test_case_and_trim(spark):
    df = spark.createDataFrame([(1, "  MiXeD  ")], ["id", "v"])
    out = apply_transforms(
        df,
        [{"op": "trim", "field": "v"}, {"op": "lowercase", "field": "v"}],
    )
    assert out.collect()[0]["v"] == "mixed"


def test_chinese_compatible_tokenizer(spark):
    from pyspark.sql import functions as F

    from quickwit_spark.functions.tokenizers import tokenize_chinese_compatible

    df = spark.createDataFrame([("Hello 你好世界 rust",)], ["t"])
    toks = df.select(tokenize_chinese_compatible(F.col("t")).alias("x")).first()["x"]
    assert toks == ["hello", "你", "好", "世", "界", "rust"]


def test_ascii_folding_tokenizer(spark):
    from pyspark.sql import functions as F

    from quickwit_spark.functions.tokenizers import tokenize_ascii_folding

    df = spark.createDataFrame([("Café Über straße Œuvre łódź",)], ["t"])
    toks = df.select(tokenize_ascii_folding(F.col("t")).alias("x")).first()["x"]
    assert toks == ["cafe", "uber", "strasse", "oeuvre", "lodz"]


def test_multilang_tokenizer_dispatch(spark):
    from pyspark.sql import functions as F

    from quickwit_spark.functions.tokenizers import tokenize_multilang

    df = spark.createDataFrame([("搜索 engine",), ("plain English text",)], ["t"])
    got = [r["x"] for r in df.select(tokenize_multilang(F.col("t")).alias("x")).collect()]
    assert got[0] == ["搜", "索", "engine"]
    assert got[1] == ["plain", "english", "text"]


def test_source_code_with_hex_tokenizer(spark):
    from pyspark.sql import functions as F

    from quickwit_spark.functions.tokenizers import tokenize_source_code_hex

    df = spark.createDataFrame(
        [("segfault at 0xDEADbeef1234 in parseHttpRequest snake_case",)], ["t"]
    )
    toks = df.select(tokenize_source_code_hex(F.col("t")).alias("x")).first()["x"]
    assert toks == [
        "segfault", "at", "0xdeadbeef1234", "in", "parse", "http", "request",
        "snake", "case",
    ]


def test_vrl_round2_ops(spark):
    import json

    from pyspark.sql import functions as F

    from quickwit_spark.operators.transforms import apply_transforms

    df = spark.createDataFrame(
        [("  42 ", json.dumps({"a": "x", "n": 7}), "alice", "a,b,c")],
        "raw string, payload string, user string, csv string",
    )
    out = apply_transforms(
        df,
        [
            {"op": "trim", "field": "raw"},
            {"op": "to_int", "field": "raw"},
            {"op": "parse_json", "field": "payload", "to": "attrs"},
            {"op": "split", "field": "csv", "to": "csv_parts", "separator": ","},
            {"op": "concat", "to": "who", "fields": ["user", "raw"], "separator": "#"},
            {"op": "hash", "field": "user", "to": "user_hash"},
            {"op": "replace", "field": "csv", "pattern": "a", "replacement": "z"},
        ],
    ).first()
    assert out["raw"] == 42
    assert list(out["csv_parts"]) == ["a", "b", "c"]
    assert out["csv"] == "z,b,c"
    assert out["attrs"]["a"] == "x" and out["attrs"]["n"] == "7"
    assert out["who"] == "alice#42"
    import hashlib

    assert out["user_hash"] == hashlib.sha256(b"alice").hexdigest()
    assert out["_transform_error"] is None


def test_vrl_round5_ops(spark):
    """set_expr (derived fields), default (`.x ?? v`), parse_timestamp,
    and `where` guards — the VRL conditional/expression layer
    (vrl_processing.rs:50-96 behavior; declarative Spark re-expression)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from quickwit_spark.operators.transforms import apply_transforms

    df = spark.createDataFrame(
        [
            (1, 10, None, "2024-03-05 06:07:08", "ERROR"),
            (2, 20, "keep", "2024-03-06 07:08:09", "INFO"),
        ],
        "id long, n long, note string, ts_raw string, level string",
    )
    out = {
        r["id"]: r
        for r in apply_transforms(
            df,
            [
                {"op": "set_expr", "field": "n2", "expr": "n * 2 + id"},
                {"op": "default", "field": "note", "value": "none"},
                {"op": "default", "field": "brand_new", "value": "x"},
                {"op": "parse_timestamp", "field": "ts_raw", "to": "ts",
                 "format": "yyyy-MM-dd HH:mm:ss"},
                # guard: only ERROR rows get flagged; others keep old value
                {"op": "set", "field": "flag", "value": "alert",
                 "where": "level = 'ERROR'"},
                {"op": "uppercase", "field": "note", "where": "id = 2"},
            ],
        ).collect()
    }
    assert out[1]["n2"] == 21 and out[2]["n2"] == 42
    assert out[1]["note"] == "none"        # null → default
    assert out[2]["note"] == "KEEP"        # guarded uppercase hit id=2 only
    assert out[1]["brand_new"] == "x"      # default creates missing columns
    assert out[1]["ts"] == datetime(2024, 3, 5, 6, 7, 8)
    assert out[1]["flag"] == "alert" and out[2]["flag"] is None
    assert out[1]["_transform_error"] is None


def test_grok_presets(spark):
    """Library presets: apache_common and syslog_line parse canonical lines
    into typed fields without hand-written regex."""
    from quickwit_spark.operators.transforms import apply_transforms

    df = spark.createDataFrame(
        [('127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
          '"GET /apache_pb.gif HTTP/1.0" 200 2326',)],
        "line string",
    )
    r = apply_transforms(
        df,
        [{"op": "grok", "field": "line", "preset": "apache_common",
          "groups": {"status": "int", "bytes": "long"}}],
    ).first()
    assert r["client_ip"] == "127.0.0.1"
    assert r["auth"] == "frank"
    assert r["method"] == "GET" and r["path"] == "/apache_pb.gif"
    assert r["status"] == 200 and r["bytes"] == 2326
    assert r["_transform_error"] is None

    df2 = spark.createDataFrame(
        [("Dec 10 06:55:46 web-01 sshd[3541]: Accepted publickey for root",),
         ("Dec 10 06:55:47 web-01 cron: session opened",)],
        "line string",
    )
    rows = apply_transforms(
        df2, [{"op": "grok", "field": "line", "preset": "syslog_line",
               "groups": {"pid": "int"}}],
    ).collect()
    assert rows[0]["host"] == "web-01" and rows[0]["program"] == "sshd"
    assert rows[0]["pid"] == 3541
    assert rows[0]["message"] == "Accepted publickey for root"
    assert rows[1]["program"] == "cron" and rows[1]["pid"] is None
    assert rows[1]["_transform_error"] is None
