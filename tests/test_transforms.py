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
