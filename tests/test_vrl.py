"""VRL source-program compiler (operators/vrl.py): the reference's
transform scripts (docs/configuration/source-config.md examples) compiled
to single-projection Column plans, with the transform-error contract of
vrl_processing.rs (failures mark the row, never abort the batch)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from quickwit_spark.operators.vrl import apply_vrl, parse_vrl, strptime_to_spark


def rows(df, *cols):
    return [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]


def test_reference_docs_example_downcase_del(spark):
    """The source-config.md transform example: downcase + now() + del."""
    df = spark.createDataFrame(
        [Row(message="Hello World", username="alice", id=1)]
    )
    out = apply_vrl(
        df,
        """
        .message = downcase(string!(.message))
        .timestamp = now()
        del(.username)
        """,
    )
    assert "username" not in out.columns
    r = out.collect()[0]
    assert r["message"] == "hello world"
    assert r["timestamp"] is not None
    assert r["_transform_error"] is None


def test_reference_docs_example_csv(spark):
    """The plain_text CSV example: locals, indexing, to_int!, del."""
    df = spark.createDataFrame(
        [Row(plain_text="John,Doe,32"), Row(plain_text="Jane,Roe,abc")]
    )
    out = apply_vrl(
        df,
        """
        user = parse_csv!(.plain_text)
        .first_name = user[0]
        .last_name = user[1]
        .age = to_int!(user[2])
        del(.plain_text)
        """,
    ).orderBy("first_name")
    assert out.columns == ["first_name", "last_name", "age", "_transform_error"]
    got = rows(out, "first_name", "last_name", "age", "_transform_error")
    assert got[0] == ("Jane", "Roe", None, "to_int! failed")
    assert got[1] == ("John", "Doe", 32, None)


def test_if_else_chain_and_comparison(spark):
    df = spark.createDataFrame(
        [Row(status=200), Row(status=404), Row(status=503)]
    )
    out = apply_vrl(
        df,
        """
        if .status >= 500 { .severity = "error" }
        else if .status >= 400 { .severity = "warn" }
        else { .severity = "ok" }
        """,
    ).orderBy("status")
    assert rows(out, "severity") == [("ok",), ("warn",), ("error",)]


def test_arithmetic_coalesce_and_string_concat(spark):
    df = spark.createDataFrame(
        [Row(latency_ms=1500, tenant=None, host="web"), Row(latency_ms=250, tenant="t1", host="db")],
        "latency_ms long, tenant string, host string",
    )
    out = apply_vrl(
        df,
        """
        .latency_s = .latency_ms / 1000.0
        .tenant = .tenant ?? "unknown"
        .label = .host + ":" + string!(.latency_ms)
        .bucket = (.latency_ms - .latency_ms % 1000) / 1000
        """,
    ).orderBy("latency_ms")
    assert rows(out, "latency_s", "tenant", "label", "bucket") == [
        (0.25, "t1", "db:250", 0.0),
        (1.5, "unknown", "web:1500", 1.0),
    ]


def test_string_functions_and_booleans(spark):
    df = spark.createDataFrame([Row(msg="  ERROR: disk Full  ", path="/api/v1/users")])
    out = apply_vrl(
        df,
        """
        .msg = trim(.msg)
        .is_err = contains(downcase(.msg), "error") && !starts_with(.msg, "WARN")
        .api = starts_with(.path, "/api") || ends_with(.path, ".html")
        .n = length(.msg)
        .redacted = replace(.msg, "disk Full", "***")
        """,
    )
    r = out.collect()[0]
    assert r["msg"] == "ERROR: disk Full"
    assert r["is_err"] is True and r["api"] is True
    assert r["n"] == 16
    assert r["redacted"] == "ERROR: ***"


def test_parse_json_key_value_and_map_read(spark):
    df = spark.createDataFrame(
        [Row(body='{"k": "87", "lvl": "info"}', kv="a=1 b=two")]
    )
    out = apply_vrl(
        df,
        """
        .parsed = parse_json!(.body)
        .k = to_int!(.parsed["k"])
        .attrs = parse_key_value!(.kv)
        .b = .attrs["b"]
        """,
    )
    r = out.collect()[0]
    assert r["k"] == 87 and r["b"] == "two"
    assert r["_transform_error"] is None


def test_parse_timestamp_strptime_and_fallibility(spark):
    df = spark.createDataFrame(
        [Row(raw="2024-03-05 10:30:00"), Row(raw="not a date")]
    )
    out = apply_vrl(
        df,
        '.ts = parse_timestamp!(.raw, "%Y-%m-%d %H:%M:%S")',
    ).orderBy("raw")
    got = out.collect()
    assert got[0]["ts"].year == 2024 and got[0]["_transform_error"] is None
    assert got[1]["ts"] is None and got[1]["_transform_error"] == "parse_timestamp! failed"


def test_strptime_mapping():
    assert strptime_to_spark("%Y-%m-%dT%H:%M:%S%z") == "yyyy-MM-dd'T'HH:mm:ssxx"
    assert strptime_to_spark("%d/%b/%Y") == "dd/MMM/yyyy"
    with pytest.raises(ValueError):
        strptime_to_spark("%Q")


def test_fallible_inside_if_only_fires_on_branch(spark):
    """An error from a fallible call inside `if` marks only rows that take
    the branch — the columnar re-expression of VRL's per-event abort."""
    df = spark.createDataFrame(
        [Row(kind="num", v="12"), Row(kind="txt", v="hello"), Row(kind="num", v="oops")]
    )
    out = apply_vrl(
        df,
        'if .kind == "num" { .n = to_int!(.v) }',
    ).orderBy("v")
    got = rows(out, "v", "n", "_transform_error")
    assert got == [
        ("12", 12, None),
        ("hello", None, None),  # branch not taken: no error
        ("oops", None, "to_int! failed"),
    ]


def test_guarded_assignment_preserves_old_value(spark):
    df = spark.createDataFrame([Row(lvl="dbg", keep="x"), Row(lvl="err", keep="y")])
    out = apply_vrl(
        df, 'if .lvl == "err" { .keep = upcase(.keep) }'
    ).orderBy("lvl")
    assert rows(out, "keep") == [("x",), ("Y",)]


def test_single_projection_plan(spark):
    """The whole program compiles to ONE Project over the scan — no
    per-statement plan nodes, everything in codegen."""
    df = spark.createDataFrame([Row(a="x", b=1)])
    out = apply_vrl(
        df,
        """
        .a = upcase(.a)
        .c = .b * 2
        .d = .a + "!"
        if .b > 0 { .e = "pos" } else { .e = "neg" }
        """,
    )
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("Project") == 1
    assert "BatchEvalPython" not in optimized and "ArrowEvalPython" not in optimized


def test_compile_errors():
    with pytest.raises(ValueError, match="nested path"):
        parse_and_apply_stub(".a.b = 1")
    with pytest.raises(ValueError, match="unknown function"):
        parse_and_apply_stub(".a = frobnicate(.b)")
    with pytest.raises(ValueError, match="unexpected"):
        parse_vrl(".a = @@@")


def parse_and_apply_stub(program):
    """Compile against a 1-column stand-in without a SparkSession row job."""
    import pyspark.sql

    class FakeDF:
        columns = ["a", "b"]

    from quickwit_spark.operators.vrl import _Compiler

    comp = _Compiler(FakeDF())
    for stmt in parse_vrl(program):
        comp.compile_stmt(stmt)


def test_del_inside_if_rejected(spark):
    with pytest.raises(ValueError, match="del\\(\\) inside"):
        parse_and_apply_stub('if .a == 1 { del(.b) }')


def test_locals_do_not_leak_into_output(spark):
    df = spark.createDataFrame([Row(text="a b c")])
    out = apply_vrl(df, 'parts = split(.text, " ")\n.first = parts[0]')
    assert out.columns == ["text", "first", "_transform_error"]
    assert out.collect()[0]["first"] == "a"


def test_sequential_rebinding_reads_updated_value(spark):
    df = spark.createDataFrame([Row(a="Mixed")])
    out = apply_vrl(df, '.a = downcase(.a)\n.b = upcase(.a)')
    r = out.collect()[0]
    assert r["a"] == "mixed" and r["b"] == "MIXED"


def test_parse_grok_named_groups_to_map(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(line="10.1.2.3 GET /health 204"), Row(line="malformed !!")]
    )
    out = apply_vrl(
        df,
        """
        .g = parse_grok!(.line, "%{IP:client} %{WORD:method} %{NOTSPACE:path} %{INT:status}")
        .client = .g["client"]
        .status = to_int!(.g["status"])
        """,
    ).orderBy("line")
    good, bad = out.collect()[0], out.collect()[1]
    assert good["client"] == "10.1.2.3" and good["status"] == 204
    assert good["_transform_error"] is None
    assert bad["g"] is None and bad["_transform_error"] == "parse_grok! failed"


def test_parse_grok_apache_line(spark):
    """The apache_common preset shape, written inline as a VRL program
    (aliases + explicit named groups mixed, like the transforms preset)."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(line='1.2.3.4 - frank [10/Oct/2000:13:55:36 -0700] '
                  '"GET /index.html HTTP/1.0" 200 2326')]
    )
    out = apply_vrl(
        df,
        '.g = parse_grok!(.line, "%{IP:client_ip} %{NOTSPACE:ident} '
        '%{NOTSPACE:auth} \\[(?<http_ts>%{HTTPDATE})\\] \\"(?<method>\\w+) '
        '%{NOTSPACE:path} HTTP/%{NUMBER:http_version}\\" %{INT:status} '
        '%{NOTSPACE:bytes}")',
    )
    r = out.collect()[0]
    assert r["g"]["client_ip"] == "1.2.3.4"
    assert r["g"]["method"] == "GET" and r["g"]["status"] == "200"
