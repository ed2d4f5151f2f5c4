"""Multi-index `_search` golden vectors
(rest-api-tests/scenarii/es_compatibility/multi-indices/0001-0004).

Two indexes with DIFFERENT doc mappings — gharchive-1 is mode=dynamic (every
field captured into `_dynamic`), gharchive-2 is mode=strict with a mapped
actor object — searched through one selector expression: wildcards,
comma lists (URL-encoded too), `-` exclusions, missing-index 404 vs
ignore_unavailable, cross-index sort merge, scroll over the merged stream,
and terms aggs over the union.
"""

from __future__ import annotations

import json as _j

import pytest

from quickwit_spark.api import (
    IndexNotFoundError,
    es_multi_scroll,
    es_multi_search,
    resolve_search_targets,
)
from quickwit_spark.operators.docmapper import (
    DocMapper,
    DocMapping,
    FieldMapping,
    split_quarantine,
)
from quickwit_spark.operators.query import QueryCompiler

DOCS_1 = [
    {"id": 1, "created_at": "2015-02-01T00:00:14Z", "type": "CreateEvent", "actor": {"id": 1, "login": "fmassot"}},
    {"id": 2, "created_at": "2015-02-01T00:00:16Z", "type": "CreateEvent", "actor": {"id": 2, "login": "fulmicoton"}},
]
DOCS_2 = [
    {"id": 3, "created_at": "2015-02-01T00:00:15Z", "type": "CreateEvent", "actor": {"id": 3, "login": "guilload"}},
    {"id": 4, "created_at": "2015-02-01T00:00:17Z", "type": "CreateEvent", "actor": {"id": 4, "login": "trinity"}},
]


@pytest.fixture(scope="module")
def indexes(spark):
    # gharchive-1: _setup.quickwit.yaml index 1 — mode=dynamic, expand_dots,
    # only created_at mapped
    m1 = DocMapping(
        field_mappings=[FieldMapping("created_at", "datetime")],
        mode="dynamic",
        timestamp_field="created_at",
        expand_dots=True,
        store_source=True,
    )
    # gharchive-2: index 2 — mode=strict, actor object mapped
    m2 = DocMapping(
        field_mappings=[
            FieldMapping("created_at", "datetime"),
            FieldMapping("id", "u64"),
            FieldMapping("type", "text"),
            FieldMapping(
                "actor",
                "object",
                fields=[FieldMapping("id", "u64"), FieldMapping("login", "text")],
            ),
        ],
        mode="strict",
        timestamp_field="created_at",
        store_source=True,
    )
    frames = {}
    for name, mapping, docs in (
        ("gharchive-1", m1, DOCS_1),
        ("gharchive-2", m2, DOCS_2),
    ):
        df = spark.createDataFrame([(_j.dumps(d),) for d in docs], ["value"])
        valid, _ = split_quarantine(DocMapper(mapping).apply(df))
        frames[name] = valid.cache()
        assert frames[name].count() == 2
    compilers = {
        "gharchive-1": QueryCompiler.from_doc_mapping(m1),
        "gharchive-2": QueryCompiler.from_doc_mapping(m2),
    }
    return frames, compilers


def _search(indexes, target, body, **kw):
    tables, compilers = indexes
    return es_multi_search(tables, target, body, compilers=compilers, **kw)


class TestSelectorResolution:
    def test_wildcard(self, indexes):
        tables, _ = indexes
        assert resolve_search_targets(tables, "gharchive-*") == [
            "gharchive-1",
            "gharchive-2",
        ]

    def test_comma_list_and_urlencoded(self, indexes):
        tables, _ = indexes
        assert resolve_search_targets(tables, "gharchive-1,gharchive-2") == [
            "gharchive-1",
            "gharchive-2",
        ]
        assert resolve_search_targets(tables, "gharchive-1%2Cgharchive-2") == [
            "gharchive-1",
            "gharchive-2",
        ]

    def test_exclusion_literal_and_pattern(self, indexes):
        tables, _ = indexes
        # 0001: gharchive-*,-gharchive-2 and gharchive-*,-*-2
        assert resolve_search_targets(tables, "gharchive-*,-gharchive-2") == ["gharchive-1"]
        assert resolve_search_targets(tables, "gharchive-*,-*-2") == ["gharchive-1"]

    def test_nonmatching_pattern_is_valid(self, indexes):
        tables, _ = indexes
        assert resolve_search_targets(tables, "invalidptn-*") == []
        # a trailing-dash pattern is still a pattern (invalidptn*-)
        assert resolve_search_targets(tables, "invalidptn*-,gharchive*") == [
            "gharchive-1",
            "gharchive-2",
        ]

    def test_missing_literal_raises(self, indexes):
        tables, _ = indexes
        with pytest.raises(IndexNotFoundError):
            resolve_search_targets(tables, "invalidptn*-,nonexistingindex")
        with pytest.raises(IndexNotFoundError):
            resolve_search_targets(tables, "idontexist")
        # 0004: ignore_unavailable skips missing literals
        assert resolve_search_targets(tables, "idontexist", ignore_unavailable=True) == []
        assert resolve_search_targets(
            tables, "gharchive-*,idontexist", ignore_unavailable=True
        ) == ["gharchive-1", "gharchive-2"]


class Test0001Query:
    def test_match_all_across_indexes(self, indexes):
        res = _search(indexes, "gharchive-*", {"q": "*"})
        assert res["hits"]["total"]["value"] == 4
        assert len(res["hits"]["hits"]) == 4

    def test_query_string_across_mappings(self, indexes):
        # actor.login is a mapped text field on index 2 but a dynamic capture
        # on index 1 — both must match their doc
        for target in (
            "gharchive-*",
            "gharchive-1,gharchive-2",
            "gharchive-1%2Cgharchive-2",
        ):
            res = _search(
                indexes, target, {"q": "actor.login:fmassot OR actor.login:guilload"}
            )
            assert res["hits"]["total"]["value"] == 2, target
            assert len(res["hits"]["hits"]) == 2

    def test_cross_index_sort_merge(self, indexes):
        res = _search(
            indexes,
            "gharchive-1%2Cgharchive-2",
            {"size": 2, "query": {"match_all": {}}, "sort": {"created_at": {"order": "desc"}}},
        )
        assert res["hits"]["total"]["value"] == 4
        hits = res["hits"]["hits"]
        assert [h["_source"]["actor"]["login"] for h in hits] == ["trinity", "fulmicoton"]
        assert [h["_index"] for h in hits] == ["gharchive-2", "gharchive-1"]

    def test_exclusions_shrink_results(self, indexes):
        for target in ("gharchive-*,-gharchive-2", "gharchive-*,-*-2"):
            res = _search(indexes, target, {"q": "*"})
            assert res["hits"]["total"]["value"] == 2, target

    def test_empty_pattern_zero_hits(self, indexes):
        res = _search(
            indexes,
            "invalidptn-*",
            {"size": 2, "query": {"match_all": {}}, "sort": {"created_at": {"order": "desc"}}},
        )
        assert res["hits"]["total"]["value"] == 0
        assert res["hits"]["hits"] == []

    def test_missing_literal_in_search_raises(self, indexes):
        with pytest.raises(IndexNotFoundError):
            _search(indexes, "invalidptn*-,nonexistingindex", {"size": 2, "query": {"match_all": {}}})

    def test_pattern_plus_wildcard_ok(self, indexes):
        # reference expected 104 with the 100-doc gharchive index registered;
        # here only gharchive-1/2 exist → 4 (same selector semantics)
        res = _search(
            indexes,
            "invalidptn*-,gharchive*",
            {"size": 2, "query": {"match_all": {}}, "sort": {"created_at": {"order": "desc"}}},
        )
        assert res["hits"]["total"]["value"] == 4
        assert len(res["hits"]["hits"]) == 2


class Test0002Scroll:
    def test_scroll_walks_merged_stream(self, indexes):
        tables, compilers = indexes
        body = {
            "size": 1,
            "query": {"match_all": {}},
            "sort": [{"actor.id": {"order": "desc"}}],
        }
        state = None
        logins = []
        for _ in range(3):
            res, state = es_multi_scroll(
                tables, "gharchive-*", body, scroll_state=state, compilers=compilers
            )
            assert res["hits"]["total"]["value"] == 4
            logins.append(res["hits"]["hits"][0]["_source"]["actor"]["login"])
        # actor.id desc: trinity(4) → guilload(3) → fulmicoton(2); the walk
        # alternates indexes, so the cursor is genuinely merged
        assert logins == ["trinity", "guilload", "fulmicoton"]

    def test_scroll_missing_index_raises(self, indexes):
        tables, compilers = indexes
        with pytest.raises(IndexNotFoundError):
            es_multi_scroll(
                tables,
                "gharchive-*,non-existing-index",
                {"size": 1, "query": {"match_all": {}}, "sort": [{"actor.id": "desc"}]},
                compilers=compilers,
            )

    def test_scroll_empty_pattern_is_valid(self, indexes):
        tables, compilers = indexes
        res, state = es_multi_scroll(
            tables,
            "non-existing-index-*",
            {"size": 1, "query": {"match_all": {}}, "sort": [{"actor.id": "desc"}]},
            compilers=compilers,
        )
        assert res["hits"]["hits"] == [] and state is None


class Test0003Aggs:
    def test_terms_agg_over_union(self, indexes):
        res = _search(
            indexes,
            "gharchive-*",
            {
                "query": {"match_all": {}},
                "aggs": {"logins": {"terms": {"field": "actor.login", "order": {"_key": "asc"}}}},
            },
        )
        buckets = res["aggregations"]["logins"]["buckets"]
        assert [(b["key"], b["doc_count"]) for b in buckets] == [
            ("fmassot", 1),
            ("fulmicoton", 1),
            ("guilload", 1),
            ("trinity", 1),
        ]
        assert res["aggregations"]["logins"]["sum_other_doc_count"] == 0

    def test_no_matching_index_has_no_aggregations_key(self, indexes):
        res = _search(
            indexes,
            "noindexmatching-*",
            {
                "query": {"match_all": {}},
                "aggs": {"logins": {"terms": {"field": "actor.login", "order": {"_key": "asc"}}}},
            },
        )
        assert "aggregations" not in res


def test_msearch_with_pattern_header(indexes):
    """_msearch header index expressions with wildcards route through the
    multi-index selector (comma lists too); plain names keep the single-index
    path; missing literals produce an error entry, not a batch failure."""
    from quickwit_spark.api import es_msearch

    tables, compilers = indexes
    res = es_msearch(
        tables,
        [
            ("gharchive-*", {"q": "*", "size": 0}),
            ("gharchive-1,gharchive-2", {"q": "actor.login:fmassot OR actor.login:trinity", "size": 0}),
            ("nope-index", {"q": "*"}),
        ],
        compilers=compilers,
    )
    r0, r1, r2 = res["responses"]
    assert r0["hits"]["total"]["value"] == 4
    assert r1["hits"]["total"]["value"] == 2  # one dynamic + one strict match
    assert r2["error"]["type"] == "index_not_found_exception"


def test_single_dynamic_index_aggs(indexes):
    """Aggs over a dynamic-capture field on a SINGLE mode=dynamic index:
    the compiler's JSON extraction materializes the column (dynamic fast
    fields are aggregatable in the reference)."""
    from quickwit_spark.api import es_search

    tables, compilers = indexes
    res = es_search(
        tables["gharchive-1"],
        {
            "size": 0,
            "aggs": {"logins": {"terms": {"field": "actor.login", "order": {"_key": "asc"}}}},
        },
        compiler=compilers["gharchive-1"],
    )
    buckets = res["aggregations"]["logins"]["buckets"]
    assert [(b["key"], b["doc_count"]) for b in buckets] == [
        ("fmassot", 1),
        ("fulmicoton", 1),
    ]


def test_single_dynamic_index_sort(indexes):
    """Sort on a dynamic-capture numeric field (actor.id) on a single
    mode=dynamic index: materialized via JSON extraction (numeric fast
    value), hidden columns never leak into _source."""
    from quickwit_spark.api import es_search

    tables, compilers = indexes
    res = es_search(
        tables["gharchive-1"],
        {"size": 2, "sort": [{"actor.id": {"order": "desc"}}]},
        compiler=compilers["gharchive-1"],
    )
    hits = res["hits"]["hits"]
    assert [h["_source"]["actor"]["login"] for h in hits] == ["fulmicoton", "fmassot"]
    assert not any(k.startswith("__dsort") for k in hits[0]["_source"])
    assert hits[0]["sort"] == [2.0]
