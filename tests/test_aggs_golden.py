"""Aggregation golden vectors from the reference's REST test suite
(rest-api-tests/scenarii/aggregations/0001-aggregations.yaml + _setup fixture;
see FIXTURES.md F2)."""

import json

import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators.aggs import (
    cardinality,
    composite,
    date_histogram,
    find_trace_ids,
    histogram,
    multi_terms,
    percentiles,
    range_agg,
    run_es_aggs,
    stats,
    terms,
    top_hits,
)
from quickwit_spark.operators.docmapper import (
    DocMapper,
    DocMapping,
    FieldMapping,
    split_quarantine,
)

_DOCS = [
    {"name": "Albert", "response": 100, "id": 1, "date": "2015-01-01T12:10:30Z", "host": "192.168.0.10", "tags": ["nice"]},
    {"name": "Fred", "response": 100, "id": 3, "date": "2015-01-01T12:10:30Z", "host": "192.168.0.1", "tags": ["nice"]},
    {"name": "Manfred", "response": 120, "id": 13, "date": "2015-01-11T12:10:30Z", "host": "192.168.0.11", "tags": ["nice"]},
    {"name": "Horst", "id": 2, "date": "2015-01-01T11:11:30Z", "host": "192.168.0.10", "tags": ["nice", "cool"]},
    {"name": "Fritz", "response": 30, "id": 5, "host": "192.168.0.1", "tags": ["nice", "cool"]},
    {"name": "Fritz", "high_prec_test": 1769070189829214200, "response": 30, "id": 0},
    {"name": "Fritz", "response": 30, "id": 0},
    {"name": "Holger", "response": 30, "id": 4, "date": "2015-02-06T00:00:00Z", "host": "192.168.0.10"},
    {"name": "Werner", "response": 20, "id": 5, "date": "2015-01-02T00:00:00Z", "host": "192.168.0.10"},
    {"name": "Bernhard", "response": 130, "id": 14, "date": "2015-02-16T00:00:00Z"},
]


@pytest.fixture(scope="module")
def fixture_df(spark):
    mapping = DocMapping(
        field_mappings=[
            FieldMapping("name", "text"),
            FieldMapping("response", "f64"),
            FieldMapping("id", "u64"),
            FieldMapping("date", "datetime", input_formats=("rfc3339", "unix_timestamp")),
            FieldMapping("host", "ip"),
            FieldMapping("tags", "text", multi=True),
            FieldMapping("high_prec_test", "u64"),
        ],
        mode="dynamic",
    )
    mapper = DocMapper(mapping)
    df = spark.createDataFrame([(json.dumps(d),) for d in _DOCS], ["value"])
    parsed = mapper.apply(df)
    valid, _ = split_quarantine(parsed)
    valid = valid.cache()
    assert valid.count() == 10
    return valid


def test_date_histogram_golden(fixture_df):
    out = date_histogram(fixture_df, "date", "30d", offset="-4d").collect()
    assert [(r["doc_count"], r["key"], r["key_as_string"]) for r in out] == [
        (5, 1420070400000, "2015-01-01T00:00:00Z"),
        (2, 1422662400000, "2015-01-31T00:00:00Z"),
    ]


def test_date_histogram_extended_bounds_gap_fill(fixture_df):
    out = date_histogram(
        fixture_df, "date", "30d", offset="-4d",
        extended_bounds=(1420070400000, 1425254400000),
    ).collect()
    assert [(r["doc_count"], r["key"], r["key_as_string"]) for r in out] == [
        (5, 1420070400000, "2015-01-01T00:00:00Z"),
        (2, 1422662400000, "2015-01-31T00:00:00Z"),
        (0, 1425254400000, "2015-03-02T00:00:00Z"),
    ]


def test_date_histogram_stats_subagg_golden(fixture_df):
    res = run_es_aggs(
        fixture_df,
        {
            "date_histo": {
                "date_histogram": {"field": "date", "fixed_interval": "30d", "offset": "-4d"},
                "aggs": {"response": {"stats": {"field": "response"}}},
            }
        },
    )
    buckets = res["date_histo"]["buckets"]
    assert buckets[0]["doc_count"] == 5
    assert buckets[0]["response"] == {"avg": 85.0, "count": 4, "max": 120.0, "min": 20.0, "sum": 340.0}
    assert buckets[1]["doc_count"] == 2
    assert buckets[1]["response"] == {"avg": 80.0, "count": 2, "max": 130.0, "min": 30.0, "sum": 160.0}


def test_terms_golden(fixture_df):
    # F7: terms(name): Fritz=3, everyone else 1
    rows = terms(fixture_df, "name", size=20).collect()
    counts = {r["key"]: r["doc_count"] for r in rows}
    assert counts["Fritz"] == 3
    assert sum(counts.values()) == 10
    assert rows[0]["key"] == "Fritz"


def test_terms_on_multivalued_tags(fixture_df):
    exploded = fixture_df.select(F.explode("tags").alias("tag"))
    counts = {r["key"]: r["doc_count"] for r in terms(exploded, "tag").collect()}
    # golden: 0001-aggregations.yaml:146-152 (nice=5, cool=2)
    assert counts == {"nice": 5, "cool": 2}


def test_terms_size_and_sum_other(fixture_df):
    res = run_es_aggs(fixture_df, {"names": {"terms": {"field": "name", "size": 2}}})
    names = res["names"]
    assert names["buckets"][0]["key"] == "Fritz" and names["buckets"][0]["doc_count"] == 3
    assert names["doc_count_error_upper_bound"] == 0
    # 10 docs total, top-2 buckets = 3 + 1 → 6 others
    shown = sum(b["doc_count"] for b in names["buckets"])
    assert names["sum_other_doc_count"] == 10 - shown


def test_doc_length_sum_and_source_exclusion_golden(fixture_df):
    """0002-doc-len.yaml: sum over `_doc_length` equals the total ingested
    byte length (952 for the fixture's ndjson lines, reference harness
    serialization), and `_doc_length` never appears in search hit _source."""
    from quickwit_spark.api import es_search

    res = run_es_aggs(fixture_df, {"doc_len": {"sum": {"field": "_doc_length"}}})
    assert res["doc_len"]["value"] == 952.0
    hits = es_search(
        fixture_df,
        {"query": {"term": {"id": {"value": 1}}}, "size": 1},
        field_types={"id": "numeric"},
    )["hits"]["hits"]
    assert len(hits) == 1
    assert "_doc_length" not in hits[0]["_source"]
    assert hits[0]["_source"]["name"] == "Albert"


def test_terms_with_other_single_job(fixture_df):
    # parity with terms() + exact sum_other mass, via the partial-topk path
    from quickwit_spark.operators.aggs import terms_with_other

    buckets, other, err = terms_with_other(fixture_df, "name", size=2)
    rows = buckets.collect()
    assert [r["key"] for r in rows] == [r["key"] for r in terms(fixture_df, "name", size=2).collect()]
    assert rows[0]["key"] == "Fritz" and rows[0]["doc_count"] == 3
    total = fixture_df.filter(F.col("name").isNotNull()).count()
    assert other == total - sum(r["doc_count"] for r in rows)
    assert err == 0
    # size beyond cardinality: everything in buckets, other == 0
    all_b, all_other, _ = terms_with_other(fixture_df, "name", size=100)
    assert all_other == 0
    assert sum(r["doc_count"] for r in all_b.collect()) == total


def test_terms_missing_param(fixture_df):
    counts = {
        r["key"]: r["doc_count"]
        for r in terms(fixture_df, "host", size=20, missing="0.0.0.0").collect()
    }
    assert counts["0.0.0.0"] == 3  # three docs without host


def test_histogram_numeric(fixture_df):
    rows = histogram(fixture_df, "response", 50.0).collect()
    got = {r["key"]: r["doc_count"] for r in rows}
    # responses: 100,100,120,30,30,30,30,20,130 → buckets 0:5, 50:0(gap), 100:4
    assert got == {0.0: 5, 50.0: 0, 100.0: 4}


def test_range_agg(fixture_df):
    rows = range_agg(
        fixture_df,
        "response",
        [{"to": 50}, {"from": 50, "to": 120}, {"from": 120}],
    ).collect()
    got = {r["range_key"]: r["doc_count"] for r in rows}
    assert got == {"*-50": 5, "50-120": 2, "120-*": 2}


def test_stats(fixture_df):
    r = stats(fixture_df.filter(F.col("response").isNotNull()), "response").collect()[0]
    assert r["count"] == 9 and r["min"] == 20.0 and r["max"] == 130.0
    assert r["sum"] == 590.0


def test_cardinality_exact_and_approx(fixture_df):
    exact = cardinality(fixture_df, "name", exact=True).collect()[0]["value"]
    approx = cardinality(fixture_df, "name").collect()[0]["value"]
    assert exact == 8
    assert abs(approx - 8) <= 1


def test_percentiles(fixture_df):
    r = percentiles(fixture_df, "response", percents=(50.0,)).collect()[0]
    assert r["p50"] == 30.0


def test_multi_terms(fixture_df):
    rows = multi_terms(fixture_df, ["name", "id"], size=5).collect()
    assert rows[0]["key_as_string"] == "Fritz|0" and rows[0]["doc_count"] == 2


def test_composite_pagination(fixture_df):
    page1 = composite(fixture_df, ["name"], size=3).collect()
    assert [r["name"] for r in page1] == ["Albert", "Bernhard", "Fred"]
    after = {"name": page1[-1]["name"]}
    page2 = composite(fixture_df, ["name"], size=3, after=after).collect()
    assert [r["name"] for r in page2] == ["Fritz", "Holger", "Horst"]


def test_top_hits(fixture_df):
    rows = top_hits(fixture_df, ["name"], "id", size=1).filter(F.col("name") == "Fritz").collect()
    assert len(rows) == 1 and rows[0]["id"] == 5


def test_find_trace_ids(fixture_df):
    rows = find_trace_ids(fixture_df.filter(F.col("date").isNotNull()), "name", "date", k=2).collect()
    assert rows[0]["trace_id"] == "Bernhard"  # most recent date


def test_empty_input_no_buckets(spark, fixture_df):
    empty = fixture_df.filter(F.lit(False))
    assert date_histogram(empty, "date", "30d").count() == 0


def test_range_agg_overlapping_ranges(spark):
    """ES counts a doc in EVERY matching range, not just the first."""
    from quickwit_spark.operators.aggs import range_agg

    df = spark.createDataFrame([(v,) for v in [5.0, 15.0, 25.0, 35.0]], ["v"])
    out = {
        r["range_key"]: r["doc_count"]
        for r in range_agg(
            df, "v", [{"from": 0, "to": 30}, {"from": 10, "to": 40}]
        ).collect()
    }
    assert out == {"0-30": 3, "10-40": 3}  # 15 and 25 land in both


# ---------------------------------------------------------------------------
# round 2: remaining 0001-aggregations.yaml vectors
# ---------------------------------------------------------------------------

IP1, IP10, IP11 = "::ffff:192.168.0.1", "::ffff:192.168.0.10", "::ffff:192.168.0.11"


def test_terms_split_size_error_bound_golden(spark):
    """0001-aggregations.yaml split_size vectors: two 5-doc splits; with
    shard_size=1 one 'Fritz' is cut (count 2 of 3, sum_other 8, bound 2);
    with shard_size=5 the result is exact (count 3, bound 0)."""
    from quickwit_spark.operators.aggs import terms_shard_emulated

    split1 = ["Albert", "Fred", "Manfred", "Horst", "Fritz"]
    split2 = ["Fritz", "Fritz", "Holger", "Werner", "Bernhard"]
    df = spark.createDataFrame(
        spark.sparkContext.parallelize([(n,) for n in split1 + split2], 2),
        "name string",
    )
    buckets, bound = terms_shard_emulated(df, "name", size=1, shard_size=1)
    rows = buckets.collect()
    assert [(r["key"], r["doc_count"]) for r in rows] == [("Fritz", 2)]
    assert bound == 2
    assert 10 - rows[0]["doc_count"] == 8  # sum_other_doc_count

    buckets5, bound5 = terms_shard_emulated(df, "name", size=1, shard_size=5)
    assert [(r["key"], r["doc_count"]) for r in buckets5.collect()] == [("Fritz", 3)]
    assert bound5 == 0


def test_cardinality_golden(fixture_df):
    got = {
        f: cardinality(fixture_df, f).collect()[0]["value"]
        for f in ("name", "response", "date")
    }
    assert got == {"name": 8, "response": 5, "date": 6}


def test_extended_stats_sum_of_squares_golden(fixture_df):
    from quickwit_spark.operators.aggs import extended_stats

    r = extended_stats(fixture_df, "response").collect()[0]
    assert r["sum_of_squares"] == 55300.0


def test_terms_high_precision_u64_golden(fixture_df):
    rows = terms(fixture_df, "high_prec_test").collect()
    assert [(r["key"], r["doc_count"]) for r in rows] == [(1769070189829214200, 1)]


def test_histogram_golden_vector(fixture_df):
    rows = histogram(fixture_df, "response", 50.0).collect()
    assert [(r["key"], r["doc_count"]) for r in rows] == [(0.0, 5), (50.0, 0), (100.0, 4)]


_COMPOSITE_SOURCES = [
    {"host": {"terms": {"field": "host", "missing_bucket": True}}},
    {"name_": {"terms": {"field": "name"}}},
    {"response": {"histogram": {"field": "response", "interval": 50}}},
]


def test_composite_missing_bucket_and_after_golden(fixture_df):
    # page 1 (size 5): null-host buckets first; Horst (no response) excluded
    rows = composite(fixture_df, _COMPOSITE_SOURCES, size=5).collect()
    got = [(r["host"], r["name_"], r["response"], r["doc_count"]) for r in rows]
    assert got == [
        (None, "Bernhard", 100.0, 1),
        (None, "Fritz", 0.0, 2),
        (IP1, "Fred", 100.0, 1),
        (IP1, "Fritz", 0.0, 1),
        (IP10, "Albert", 100.0, 1),
    ]
    # page 2 via after_key = last row of page 1
    after = {"host": IP10, "name_": "Albert", "response": 100.0}
    rows2 = composite(fixture_df, _COMPOSITE_SOURCES, size=5, after=after).collect()
    got2 = [(r["host"], r["name_"], r["response"], r["doc_count"]) for r in rows2]
    assert got2 == [
        (IP10, "Holger", 0.0, 1),
        (IP10, "Werner", 0.0, 1),
        (IP11, "Manfred", 100.0, 1),
    ]


def test_multi_terms_key_order_and_multivalue_golden(fixture_df):
    # 0003-multi-terms.yaml vector 1: (host, response) ordered by _key asc
    base = fixture_df.filter(F.col("host").isNotNull() & F.col("response").isNotNull())
    rows = multi_terms(base, ["host", "response"], size=10, order_by_key=True).collect()
    got = [(r["host"], r["response"], r["doc_count"]) for r in rows]
    assert got == [
        (IP1, 30.0, 1), (IP1, 100.0, 1),
        (IP10, 20.0, 1), (IP10, 30.0, 1), (IP10, 100.0, 1),
        (IP11, 120.0, 1),
    ]
    # vector 2: multivalued tags exploded + avg sub-agg; Horst (no response)
    # contributes nothing
    tagged = fixture_df.withColumn("tag", F.explode("tags")).filter(
        F.col("response").isNotNull()
    )
    rows2 = multi_terms(
        tagged, ["tag", "response"], size=10,
        metrics={"avg_response": ("avg", "response")}, order_by_key=True,
    ).collect()
    got2 = [(r["tag"], r["response"], r["doc_count"], r["avg_response"]) for r in rows2]
    assert got2 == [
        ("cool", 30.0, 1, 30.0),
        ("nice", 30.0, 1, 30.0),
        ("nice", 100.0, 2, 100.0),
        ("nice", 120.0, 1, 120.0),
    ]
