"""Golden vectors replicated from the reference's REST API test scenarios
(rest-api-tests/scenarii/sort_orders/0001-sort-elasticapi.yaml and
scenarii/search_after/0001-search_after_edge_case.yaml — expected outputs
only; the harness is ours).

Caveat (SURVEY §1.3): Spark LongType cannot hold u64 values above i64::MAX,
so the `val_u64 = 18_000_000_000_000_000_000` vectors are out of scope; the
i64 and f64-cursor vectors (including the i64::MAX edge and the f64
precision quirk near it) are replicated exactly.
"""

import pytest

from quickwit_spark.api import es_search

I64_MAX = 9_223_372_036_854_775_807


@pytest.fixture(scope="module")
def sortorder(spark):
    # _setup.quickwit.yaml shuffle_ndjson docs (missing count → NULL)
    rows = [
        (10.0, 1), (10.0, 2), (15.0, 2), (None, 3), (10.0, 0), (-2.5, 4), (None, 5),
    ]
    return spark.createDataFrame(rows, "count double, id long").cache()


@pytest.fixture(scope="module")
def search_after_docs(spark):
    # the 4 ingest splits' val_i64 values
    rows = [(-100,), (I64_MAX,), (200,), (300,), (I64_MAX,)]
    return spark.createDataFrame(rows, "val_i64 long").cache()


def _ids(res):
    return [h["_source"]["id"] for h in res["hits"]["hits"]]


def _sorts(res):
    return [h["sort"][0] for h in res["hits"]["hits"]]


def test_sort_orders_vectors(sortorder):
    body = {
        "query": {"bool": {"must_not": [{"match": {"count": "10"}}]}},
        "sort": [{"id": {"order": "desc"}}],
        "size": 10,
    }
    res = es_search(sortorder, body, field_types={"count": "numeric", "id": "numeric"})
    assert res["hits"]["total"]["value"] == 4
    assert _ids(res) == [5, 4, 3, 2]

    res = es_search(
        sortorder,
        {**body, "sort": [{"id": {"order": "asc"}}]},
        field_types={"count": "numeric", "id": "numeric"},
    )
    assert _ids(res) == [2, 3, 4, 5]

    res = es_search(
        sortorder,
        {"query": {"match_all": {}}, "sort": [{"id": "asc"}, {"count": "asc"}], "size": 10},
    )
    assert res["hits"]["total"]["value"] == 7
    assert [(h["_source"]["id"], h["_source"]["count"]) for h in res["hits"]["hits"]] == [
        (0, 10.0), (1, 10.0), (2, 10.0), (2, 15.0), (3, None), (4, -2.5), (5, None),
    ]

    # vector 4: missing count sorts LAST even in desc
    res = es_search(
        sortorder,
        {"query": {"match_all": {}}, "sort": [{"count": "desc"}, {"id": "desc"}], "size": 10},
    )
    assert [(h["_source"]["count"], h["_source"]["id"]) for h in res["hits"]["hits"]] == [
        (15.0, 2), (10.0, 2), (10.0, 1), (10.0, 0), (-2.5, 4), (None, 5), (None, 3),
    ]


@pytest.mark.parametrize(
    "after,order,size,expected",
    [
        ([250], "asc", 5, [300, I64_MAX, I64_MAX]),
        ([250], "desc", 5, [200, -100]),
        # beyond i64::MAX: asc matches nothing, desc matches everything
        ([18_000_000_000_000_000_000], "asc", 5, []),
        ([18_000_000_000_000_000_000], "desc", 5, [I64_MAX, I64_MAX, 300, 200, -100]),
        ([I64_MAX - 1], "asc", 1, [I64_MAX]),
        ([I64_MAX], "asc", 1, []),
        ([9_223_372_036_854_775_808], "asc", 1, []),
        # f64 cursor near i64::MAX inherits f64 precision (reference quirk)
        ([9_223_372_036_854_500_000.5], "asc", 1, [I64_MAX]),
        ([19_223_372_036_854_500_000.5], "asc", 1, []),
        ([19_223_372_036_854_500_000.5], "desc", 5, [I64_MAX, I64_MAX, 300, 200, -100]),
    ],
)
def test_search_after_edge_cases(search_after_docs, after, order, size, expected):
    res = es_search(
        search_after_docs,
        {
            "query": {"match_all": {}},
            "sort": [{"val_i64": {"order": order}}],
            "size": size,
            "search_after": after,
        },
    )
    assert res["hits"]["total"]["value"] == 5
    assert _sorts(res) == expected


@pytest.fixture(scope="module")
def fast_only(spark):
    # _setup.quickwit.yaml fast_only index: 2 docs, a root fast-only text
    # field and a fast-only leaf under an object field
    from pyspark.sql import Row

    rows = [
        Row(fast_text="abc-123", obj=Row(nested_text="abc-123")),
        Row(fast_text="def-456", obj=Row(nested_text="ghi-789")),
    ]
    return spark.createDataFrame(rows).cache()


def test_0028_fast_only_field_query(fast_only):
    """0028-fast_only_field_query.yaml: DSL term/terms over fast-only
    (non-indexed) text fields — exact raw-value match, incl. a nested
    object leaf addressed by dotted path."""
    fields = {"fast_text": "raw", "obj.nested_text": "raw"}

    def total(query):
        return es_search(
            fast_only, {"query": query, "size": 0, "track_total_hits": True},
            field_types=fields,
        )["hits"]["total"]["value"]

    assert total({"term": {"fast_text": "abc-123"}}) == 1
    assert total({"term": {"fast_text": "zzz"}}) == 0
    assert total({"terms": {"fast_text": ["abc-123", "zzz"]}}) == 1
    assert total({"terms": {"fast_text": ["abc-123", "def-456"]}}) == 2
    assert total({"term": {"obj.nested_text": "abc-123"}}) == 1
    assert total({"term": {"obj.nested_text": "zzz"}}) == 0
    assert total({"terms": {"obj.nested_text": ["abc-123", "ghi-789"]}}) == 2
    assert total({"terms": {"obj.nested_text": ["zzz"]}}) == 0
