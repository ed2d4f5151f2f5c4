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


def test_terms_order_by_subagg(df):
    res = run_es_aggs(
        df,
        {
            "kinds": {
                "terms": {"field": "kind", "order": {"avg_v": "desc"}},
                "aggs": {"avg_v": {"avg": {"field": "v"}}},
            }
        },
    )
    assert [b["key"] for b in res["kinds"]["buckets"]] == ["c", "b", "a"]
    res2 = run_es_aggs(
        df, {"kinds": {"terms": {"field": "kind", "order": {"_key": "desc"}}}}
    )
    assert [b["key"] for b in res2["kinds"]["buckets"]] == ["c", "b", "a"]


def test_three_level_nesting_single_pass(df):
    """date_histogram > terms > stats: one groupBy per level, assembled."""
    res = run_es_aggs(
        df,
        {
            "by_month": {
                "date_histogram": {"field": "date", "fixed_interval": "30d"},
                "aggs": {
                    "kinds": {
                        "terms": {"field": "kind"},
                        "aggs": {"vstats": {"stats": {"field": "v"}}},
                    }
                },
            }
        },
    )
    b0 = res["by_month"]["buckets"][0]
    a_bucket = next(x for x in b0["kinds"]["buckets"] if x["key"] == "a")
    assert a_bucket["vstats"]["count"] == 2
    assert a_bucket["vstats"]["sum"] == 3.0
    assert a_bucket["vstats"]["avg"] == 1.5


def test_nested_range_overlap_and_extended_stats(df):
    res = run_es_aggs(
        df,
        {
            "vr": {
                "range": {
                    "field": "v",
                    "ranges": [{"from": 0, "to": 3}, {"from": 2, "to": 10}, {"from": 100}],
                },
                "aggs": {"es": {"extended_stats": {"field": "v"}}},
            }
        },
    )
    buckets = {b["key"]: b for b in res["vr"]["buckets"]}
    assert buckets["0-3"]["doc_count"] == 2   # v=1,2
    assert buckets["2-10"]["doc_count"] == 4  # v=2,3,4,5 (2.0 counted in BOTH)
    assert buckets["100-*"]["doc_count"] == 0
    assert buckets["2-10"]["es"]["avg"] == pytest.approx(3.5)
    assert buckets["2-10"]["es"]["std_deviation_bounds_upper"] > 3.5


def test_terms_shard_size_error_bound(spark):
    from quickwit_spark.operators.aggs import terms, terms_shard_emulated

    rows = [(f"k{i % 7}",) for i in range(700)] + [("rare",)] * 3
    df = spark.createDataFrame(rows, ["k"]).repartition(8)
    exact = {r["key"]: r["doc_count"] for r in terms(df, "k", size=20).collect()}
    buckets, bound = terms_shard_emulated(df, "k", size=5, shard_size=3)
    got = {r["key"]: r["doc_count"] for r in buckets.collect()}
    # cutoff applied (only 3 of 8 terms survive per shard) → non-zero bound
    assert bound > 0
    # every reported count can undercount by at most the bound
    for k, v in got.items():
        assert exact[k] - v <= bound
        assert v <= exact[k]
    # with shard_size >= #terms nothing is cut: exact result, zero bound
    buckets2, bound2 = terms_shard_emulated(df, "k", size=5, shard_size=100)
    got2 = {r["key"]: r["doc_count"] for r in buckets2.collect()}
    assert bound2 == 0
    top5 = dict(sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5])
    assert got2 == top5


def test_composite_datehist_source(spark, df):
    from quickwit_spark.operators.aggs import composite

    out = composite(
        df,
        [
            {"day": {"date_histogram": {"field": "date", "fixed_interval": "1d"}}},
            {"kind": {"terms": {"field": "kind"}}},
        ],
        size=10,
    ).collect()
    assert [(r["day"], r["kind"], r["doc_count"]) for r in out] == [
        (1420070400000, "a", 2),
        (1420070400000, "b", 1),
        (1423958400000, "a", 1),
        (1423958400000, "c", 1),
    ]
    # after_key pagination resumes mid-stream
    page2 = composite(
        df,
        [
            {"day": {"date_histogram": {"field": "date", "fixed_interval": "1d"}}},
            {"kind": {"terms": {"field": "kind"}}},
        ],
        size=10,
        after={"day": 1420070400000, "kind": "b"},
    ).collect()
    assert [(r["day"], r["kind"]) for r in page2] == [
        (1423958400000, "a"),
        (1423958400000, "c"),
    ]


def test_histogram_float_interval_gap_fill(spark):
    """0.1-wide buckets: float accumulation must not drift off the computed
    keys (a naive `k += 0.1` loop misses buckets after a few steps)."""
    vals = [0.05, 0.35, 0.95]  # buckets 0.0, 0.3, 0.9 → 10 buckets incl. gaps
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    res = run_es_aggs(df, {"h": {"histogram": {"field": "x", "interval": 0.1}}})
    buckets = res["h"]["buckets"]
    assert len(buckets) == 10
    got = {round(b["key"], 6): b["doc_count"] for b in buckets}
    assert got[0.0] == 1 and got[0.3] == 1 and got[0.9] == 1
    assert sum(b["doc_count"] for b in buckets) == 3


def test_mixed_toplevel_aggs_one_request(df):
    """Several sibling top-level aggs (bucket + nested + metric) in one
    request — the dispatch path for a realistic dashboard query."""
    res = run_es_aggs(
        df,
        {
            "by_month": {
                "date_histogram": {"field": "date", "fixed_interval": "30d"},
                "aggs": {"kinds": {"terms": {"field": "kind"}}},
            },
            "kinds_top": {"terms": {"field": "kind"}},
            "v_stats": {"stats": {"field": "v"}},
            "v_card": {"cardinality": {"field": "kind"}},
            "v_pcts": {"percentiles": {"field": "v"}},
        },
    )
    assert [b["doc_count"] for b in res["by_month"]["buckets"]] == [3, 0, 2]
    assert {b["key"] for b in res["kinds_top"]["buckets"]} == {"a", "b", "c"}
    assert res["v_stats"]["count"] == 5 and res["v_stats"]["sum"] == 15.0
    assert res["v_card"]["value"] == 3
    assert res["v_pcts"]["values"]["p50"] == 3.0
