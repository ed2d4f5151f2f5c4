"""ES `_search` request surface: query + aggs + sort + pagination in one body
(root.rs:1224-1290 / rest handler behavior)."""

import pytest
from pyspark.sql import functions as F

from quickwit_spark.api import es_search

FIELDS = {"level": "raw", "msg": "text", "latency": "numeric", "ts": "datetime"}


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        (1, "ERROR", "connection refused to db", 120, "2024-01-01T00:00:00"),
        (2, "INFO", "server started at 8080", 5, "2024-01-01T01:00:00"),
        (3, "ERROR", "disk is full", 300, "2024-01-02T00:00:00"),
        (4, "WARN", "slow query detected", 250, "2024-01-02T06:00:00"),
        (5, "ERROR", "connection reset", 80, "2024-01-03T00:00:00"),
        (6, "INFO", "healthy", 1, "2024-01-03T12:00:00"),
    ]
    return (
        spark.createDataFrame(rows, ["id", "level", "msg", "latency", "ts_str"])
        .withColumn("ts", F.to_timestamp("ts_str"))
        .drop("ts_str")
        .cache()
    )


def test_search_query_sort_size(logs):
    res = es_search(
        logs,
        {
            "query": {"term": {"level": {"value": "ERROR"}}},
            "sort": [{"latency": {"order": "desc"}}],
            "size": 2,
        },
        field_types=FIELDS,
    )
    assert res["hits"]["total"]["value"] == 3
    got = [h["_source"]["id"] for h in res["hits"]["hits"]]
    assert got == [3, 1]
    assert res["hits"]["hits"][0]["sort"] == [300]


def test_search_after_cursor_roundtrip(logs):
    page1 = es_search(
        logs, {"sort": [{"latency": "desc"}], "size": 2}, field_types=FIELDS
    )
    cursor = page1["hits"]["hits"][-1]["sort"]
    page2 = es_search(
        logs,
        {"sort": [{"latency": "desc"}], "size": 2, "search_after": cursor},
        field_types=FIELDS,
    )
    ids1 = [h["_source"]["id"] for h in page1["hits"]["hits"]]
    ids2 = [h["_source"]["id"] for h in page2["hits"]["hits"]]
    assert ids1 == [3, 4] and ids2 == [1, 5]


def test_from_size_offset(logs):
    res = es_search(
        logs, {"sort": [{"latency": "desc"}], "from": 2, "size": 2},
        field_types=FIELDS,
    )
    assert [h["_source"]["id"] for h in res["hits"]["hits"]] == [1, 5]


def test_agg_only_request_size_zero(logs):
    res = es_search(
        logs,
        {
            "query": {"query_string": {"query": "level:ERROR OR level:WARN"}},
            "size": 0,
            "aggs": {
                "levels": {
                    "terms": {"field": "level"},
                    "aggs": {"lat": {"avg": {"field": "latency"}}},
                }
            },
        },
        field_types=FIELDS,
    )
    assert res["hits"]["hits"] == []
    assert res["hits"]["total"]["value"] == 4
    buckets = {b["key"]: b for b in res["aggregations"]["levels"]["buckets"]}
    assert buckets["ERROR"]["doc_count"] == 3
    assert buckets["ERROR"]["lat"]["value"] == pytest.approx((120 + 300 + 80) / 3)
    assert buckets["WARN"]["doc_count"] == 1


def test_combined_query_hits_and_datehist(logs):
    res = es_search(
        logs,
        {
            "query": {"bool": {"must_not": [{"term": {"level": "INFO"}}]}},
            "sort": [{"ts": {"order": "asc"}}],
            "size": 10,
            "aggs": {"daily": {"date_histogram": {"field": "ts", "fixed_interval": "1d"}}},
        },
        field_types=FIELDS,
    )
    assert [h["_source"]["id"] for h in res["hits"]["hits"]] == [1, 3, 4, 5]
    days = [b["doc_count"] for b in res["aggregations"]["daily"]["buckets"]]
    assert days == [1, 2, 1]


def test_msearch_batches_and_index_errors(logs):
    from quickwit_spark.api import es_msearch

    out = es_msearch(
        {"logs": logs},
        [
            ("logs", {"query": {"term": {"level": "ERROR"}}, "size": 0}),
            ("missing_index", {"query": {"match_all": {}}}),
            ("logs", {"size": 0}),
        ],
        field_types={"logs": FIELDS},
    )
    rs = out["responses"]
    assert rs[0]["hits"]["total"]["value"] == 3
    assert rs[1]["error"]["type"] == "index_not_found_exception"
    assert rs[2]["hits"]["total"]["value"] == 6


def test_field_caps_shape(spark):
    from quickwit_spark.api import field_caps

    df = spark.createDataFrame(
        [(1, "x", ("a", 2), "10.0.0.1")],
        "id long, name string, nested struct<label:string, response:long>, host string",
    )
    caps = field_caps(
        df, field_types={"name": "text", "host": "ip"}, index="fieldcaps"
    )
    assert caps["indices"] == ["fieldcaps"]
    f = caps["fields"]
    assert f["nested.response"]["long"]["aggregatable"] is True
    assert set(f["name"]) == {"text", "keyword"}
    assert "ip" in f["host"]
    assert f["id"]["long"]["searchable"] is True


def test_es_scroll_pages_until_drained(logs):
    from quickwit_spark.api import es_scroll

    body = {"query": {"match_all": {}}, "sort": [{"id": "asc"}], "size": 4}
    seen, state = [], None
    for _ in range(10):
        res, state = es_scroll(logs, body, scroll_state=state, field_types=FIELDS)
        if not res["hits"]["hits"]:
            break
        seen += [h["_source"]["id"] for h in res["hits"]["hits"]]
    assert seen == [1, 2, 3, 4, 5, 6]


def test_es_admin_stats_and_cat_indices(spark, tiny_dir, tmp_path_factory):
    """_stats and _cat/indices replay the reference's response shapes
    (es_compatibility 0020-stats.yaml / 0021-cat-indices.yaml) over
    janitor-managed indexes, lineage-metadata only."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from quickwit_spark.api import cat_indices, index_stats
    from quickwit_spark.pipeline.janitor import build_time_partitioned_index

    base = tmp_path_factory.mktemp("admin_idx")
    events = spark.read.parquet(os.path.join(tiny_dir, "events.parquet"))
    n_events = events.count()
    idx_a = str(base / "events_idx")
    build_time_partitioned_index(
        spark, events, idx_a, sink_expr=F.col("event_type"), ts_col="ts",
        source_id="events",
    )
    idx_empty = str(base / "empty_idx")
    os.makedirs(idx_empty)
    indexes = {"events_idx": idx_a, "empty_index": idx_empty}

    # ---- _stats (0020 shape) ----
    stats = index_stats(spark, indexes)
    assert stats["_all"]["primaries"]["docs"]["count"] == n_events
    assert stats["_all"]["total"]["docs"]["count"] == n_events
    assert stats["_all"]["primaries"]["store"]["size_in_bytes"] > 0
    assert stats["indices"]["events_idx"]["total"]["segments"]["count"] > 0
    assert stats["indices"]["empty_index"] == {
        "primaries": {"docs": {"count": 0}, "store": {"size_in_bytes": 0}},
        "total": {"segments": {"count": 0}, "docs": {"count": 0}},
    }
    # selector + wildcard forms (GET {index}/_stats, GET ghar*/_stats)
    one = index_stats(spark, indexes, "events_idx")
    assert list(one["indices"]) == ["events_idx"]
    assert one["_all"]["primaries"]["docs"]["count"] == n_events
    wild = index_stats(spark, indexes, "event*")
    assert list(wild["indices"]) == ["events_idx"]

    # ---- _cat/indices (0021 shape) ----
    rows = cat_indices(spark, indexes)
    assert [r["index"] for r in rows] == ["empty_index", "events_idx"]
    main = rows[1]
    assert main["docs.count"] == str(n_events)
    assert main["docs.deleted"] == "0"
    assert main["health"] == "green" and main["status"] == "open"
    assert main["pri"] == "1" and main["rep"] == "1"
    assert main["store.size"].endswith(("b", "kb", "mb"))
    assert float(main["store.size"].rstrip("bkm")) > 0
    assert rows[0]["docs.count"] == "0"

    # h= column selection (0021: h=docs.count,index)
    sel = cat_indices(spark, indexes, "events_idx", h="docs.count,index")
    assert sel == [{"docs.count": str(n_events), "index": "events_idx"}]
    # wildcard selector
    assert cat_indices(spark, indexes, "event*", h="index") == [{"index": "events_idx"}]
    # health filters: green matches, red matches nothing
    assert len(cat_indices(spark, indexes, health="green")) == 2
    assert cat_indices(spark, indexes, health="red") == []
    # quickwit-parity 400s: non-json format, unsupported params
    with _pytest.raises(ValueError):
        cat_indices(spark, indexes, fmt="text")
    with _pytest.raises(ValueError):
        cat_indices(spark, indexes, v="true")
    with _pytest.raises(ValueError):
        cat_indices(spark, indexes, b="b")


def test_es_admin_resolve_health_info_delete(tmp_path):
    """_resolve/index (0026), _cluster/health (0027), / info
    (es_compatibility_info 0001) and DELETE /{index} (0024) golden shapes."""
    import os

    import pytest as _pytest

    from quickwit_spark.api import (
        IndexNotFoundError,
        cluster_health,
        delete_indexes,
        es_info,
        resolve_index,
    )

    dirs = {}
    for name in ("gharchive", "test_index1", "test_index2"):
        d = str(tmp_path / name)
        os.makedirs(os.path.join(d, "sinks"))
        dirs[name] = d

    # ---- 0026-resolve.yaml: GET _resolve/index/gh* ----
    res = resolve_index(dirs, "gh*")
    assert res == {
        "indices": [{"name": "gharchive", "attributes": ["open"]}],
        "aliases": [],
        "data_streams": [],
    }
    # comma-separated multi-pattern, sorted by name
    multi = resolve_index(dirs, "test*,gh*")
    assert [e["name"] for e in multi["indices"]] == [
        "gharchive", "test_index1", "test_index2",
    ]
    assert resolve_index(dirs, "nomatch*")["indices"] == []

    # ---- 0027-cluster-health.yaml: a 200 with a health body ----
    h = cluster_health(dirs)
    assert h["status"] == "green" and h["timed_out"] is False
    assert h["active_primary_shards"] == 3

    # ---- es_compatibility_info/0001-info.yaml ----
    info = es_info()
    assert info["cluster_name"] != ""
    assert info["version"]["build_date"] != ""
    assert info["tagline"] == "You Know, for Search"

    # ---- 0024-delete_indices.yaml ----
    # partially-missing target list → 404, nothing about the present one
    # guaranteed (the reference deletes the resolved subset; we match)
    with _pytest.raises(IndexNotFoundError):
        delete_indexes(dict(dirs), "does_not_exist,also_missing")
    # wildcard / _all rejected (index.rs:287-301)
    with _pytest.raises(ValueError):
        delete_indexes(dirs, "test*")
    with _pytest.raises(ValueError):
        delete_indexes(dirs, "_all")
    # ignore_unavailable=true deletes the present subset, 200
    out = delete_indexes(dirs, "test_index1,does_not_exist", ignore_unavailable=True)
    assert out == {"acknowledged": True}
    assert "test_index1" not in dirs and not os.path.exists(str(tmp_path / "test_index1"))
    # already deleted → 404
    with _pytest.raises(IndexNotFoundError):
        delete_indexes(dirs, "test_index1")
    # plain delete of a live index → 200
    assert delete_indexes(dirs, "test_index2") == {"acknowledged": True}
    assert set(dirs) == {"gharchive"}


def test_field_caps_fields_selector(spark):
    """es_field_capabilities/0001 third vector: `?fields=a,b` (comma list,
    wildcards allowed) restricts the response to the named leaf paths."""
    from quickwit_spark.api import field_caps

    df = spark.createDataFrame(
        [(1, "x", ("a", 2), "10.0.0.1")],
        "id long, name string, nested struct<name:string, response:long>, host string",
    )
    caps = field_caps(df, fields="nested.response,nested.name")
    assert set(caps["fields"]) == {"nested.response", "nested.name"}
    caps_wild = field_caps(df, fields="nested.*")
    assert set(caps_wild["fields"]) == {"nested.response", "nested.name"}
    assert set(field_caps(df)["fields"]) >= {"id", "name", "host"}


def test_create_index_registers_mapping():
    from quickwit_spark.api import create_index
    import pytest as _pt

    registry = {}
    res = create_index(
        registry,
        {
            "version": "0.8",
            "index_id": "test-index",
            "doc_mapping": {
                "field_mappings": [
                    {"name": "message", "type": "text"},
                    {"name": "timestamp", "type": "datetime"},
                ]
            },
        },
    )
    assert res["index_id"] == "test-index"
    assert "test-index" in registry
    with _pt.raises(ValueError, match="already exists"):
        create_index(registry, {"index_id": "test-index", "doc_mapping": {}})
    with _pt.raises(ValueError, match="invalid index id"):
        create_index(registry, {"index_id": "-bad&name", "doc_mapping": {}})
    with _pt.raises(ValueError):
        # tag fields must be raw-text/u64/i64 (validate_tag parity)
        create_index(
            registry,
            {
                "index_id": "tagged-index",
                "doc_mapping": {
                    "tag_fields": ["f"],
                    "field_mappings": [{"name": "f", "type": "f64"}],
                },
            },
        )


def test_analyze_text_endpoint(spark):
    """/api/v1/analyze analog: tantivy-Token-shaped output from the same
    Column tokenizers the ingest path uses."""
    from quickwit_spark.api import analyze_text
    import pytest as _pt

    toks = analyze_text(spark, "Hello, World! Bonjour", tokenizer="default")
    assert [t["text"] for t in toks] == ["hello", "world", "bonjour"]
    assert [t["position"] for t in toks] == [0, 1, 2]
    assert toks[0]["offset_from"] == 0 and toks[0]["offset_to"] == 5
    assert toks[1]["offset_from"] == 7 and toks[1]["offset_to"] == 12
    raw = analyze_text(spark, "Keep AS-IS", tokenizer="raw")
    assert [t["text"] for t in raw] == ["Keep AS-IS"]
    with _pt.raises(ValueError, match="unknown tokenizer"):
        analyze_text(spark, "x", tokenizer="nope")


def test_list_terms_semantics(spark):
    """list_terms.rs analog: tokenized fields list TOKENS, raw fields list
    values; [start_key, end_key) range; max_hits cap; reference error
    strings for unknown / non-indexed fields."""
    from quickwit_spark.api import list_terms

    df = spark.createDataFrame(
        [("Alpha beta", "E1"), ("beta Gamma", "E2"), ("delta", "E1")],
        "body string, event string",
    )
    ft = {"body": "text", "event": "raw"}
    assert list_terms(spark, df, "body", ft) == ["alpha", "beta", "delta", "gamma"]
    assert list_terms(spark, df, "event", ft) == ["E1", "E2"]
    assert list_terms(spark, df, "body", ft, start_key="b", end_key="d") == ["beta"]
    assert list_terms(spark, df, "body", ft, max_hits=2) == ["alpha", "beta"]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="failed to list terms in `nope`"):
        list_terms(spark, df, "nope", ft)
    with _pytest.raises(ValueError, match="isn't indexed"):
        list_terms(spark, df, "event", ft, indexed_fields={"body"})


def test_list_terms_index_time_pruned(spark, tmp_path_factory):
    """Terms from splits outside the time range never appear (split-granular
    listing, like the reference's metastore pruning)."""
    from quickwit_spark.api import list_terms_index
    from quickwit_spark.pipeline.janitor import build_time_partitioned_index

    out = str(tmp_path_factory.mktemp("lt_idx"))
    df = spark.createDataFrame(
        [("2024-01-01 10:00:00", "early"), ("2024-01-03 10:00:00", "late")],
        "ts_s string, word string",
    ).select(F.to_timestamp("ts_s").alias("ts"), "word")
    build_time_partitioned_index(spark, df, out, sink_expr=F.lit("d"))
    ft = {"word": "raw", "ts": "datetime"}
    assert list_terms_index(spark, out, "word", ft) == ["early", "late"]
    got = list_terms_index(
        spark, out, "word", ft,
        start_timestamp="2024-01-01 00:00:00", end_timestamp="2024-01-02 00:00:00",
    )
    assert got == ["early"]
