"""Nested bucket-in-bucket aggregation (terms under date_histogram) and
multi_terms golden vector from 0003-multi-terms.yaml."""

import json

import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators.aggs import run_es_aggs


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("2015-01-01T10:00:00", "a", 1.0),
        ("2015-01-01T11:00:00", "a", 2.0),
        ("2015-01-01T12:00:00", "b", 3.0),
        ("2015-02-15T10:00:00", "a", 4.0),
        ("2015-02-15T11:00:00", "c", 5.0),
    ]
    return (
        spark.createDataFrame(rows, ["ts_str", "kind", "v"])
        .withColumn("date", F.to_timestamp("ts_str"))
        .cache()
    )


def test_terms_nested_under_date_histogram(df):
    res = run_es_aggs(
        df,
        {
            "by_month": {
                "date_histogram": {"field": "date", "fixed_interval": "30d"},
                "aggs": {"kinds": {"terms": {"field": "kind"}}},
            }
        },
    )
    buckets = res["by_month"]["buckets"]
    # min_doc_count defaults to 0: the empty 30d bucket between the two
    # occupied ones is gap-filled (reference semantics)
    assert [b["doc_count"] for b in buckets] == [3, 0, 2]
    b1_kinds = {x["key"]: x["doc_count"] for x in buckets[0]["kinds"]["buckets"]}
    assert b1_kinds == {"a": 2, "b": 1}
    assert buckets[1]["kinds"]["buckets"] == []
    b3_kinds = {x["key"]: x["doc_count"] for x in buckets[2]["kinds"]["buckets"]}
    assert b3_kinds == {"a": 1, "c": 1}


def test_avg_nested_under_terms(df):
    res = run_es_aggs(
        df,
        {
            "kinds": {
                "terms": {"field": "kind"},
                "aggs": {"avg_v": {"avg": {"field": "v"}}},
            }
        },
    )
    got = {b["key"]: b["avg_v"]["value"] for b in res["kinds"]["buckets"]}
    assert got["a"] == pytest.approx((1 + 2 + 4) / 3)
    assert got["b"] == 3.0 and got["c"] == 5.0
