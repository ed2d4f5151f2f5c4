"""Index-metadata plane endpoints: GET index / list with patterns,
parse-query, reset-checkpoint (registry + file-backed store), ES _count
and DELETE scroll.

Reference: index_api/index_resource.rs:42-90, rest_handler.rs:176-207
(parse-query), source_resource.rs:238 (reset-checkpoint),
elasticsearch_api/rest_handler.rs:657-672 (_count) and :453-457
(delete scroll constant).
"""

import pytest

from quickwit_spark import api
from quickwit_spark.pipeline.checkpoint import CheckpointStore

CONFIG = {
    "index_id": "idx-a",
    "doc_mapping": {
        "field_mappings": [
            {"name": "ts", "type": "datetime", "fast": True},
            {"name": "title", "type": "text"},
        ],
        "timestamp_field": "ts",
        "mode": "dynamic",
    },
    "search_settings": {"default_search_fields": ["title"]},
}


@pytest.fixture()
def registry():
    indexes = {}
    api.create_index(indexes, CONFIG)
    cfg_b = dict(CONFIG, index_id="idx-b")
    api.create_index(indexes, cfg_b)
    api.create_index(indexes, dict(CONFIG, index_id="other"))
    return indexes


def test_get_index_metadata_shape(registry):
    meta = api.get_index_metadata(registry, "idx-a")
    assert meta["version"] == "0.9"
    cfg = meta["index_config"]
    assert cfg["index_id"] == "idx-a"
    assert cfg["doc_mapping"]["timestamp_field"] == "ts"
    assert {f["name"] for f in cfg["doc_mapping"]["field_mappings"]} == {"ts", "title"}
    assert cfg["search_settings"]["default_search_fields"] == ["title"]
    assert meta["sources"] == [] and meta["checkpoint"] == {}
    with pytest.raises(api.IndexNotFoundError):
        api.get_index_metadata(registry, "nope")


def test_list_indexes_metadata_patterns(registry):
    all_ids = [m["index_config"]["index_id"] for m in api.list_indexes_metadata(registry)]
    assert all_ids == ["idx-a", "idx-b", "other"]
    idx_only = [
        m["index_config"]["index_id"]
        for m in api.list_indexes_metadata(registry, "idx-*")
    ]
    assert idx_only == ["idx-a", "idx-b"]
    multi = [
        m["index_config"]["index_id"]
        for m in api.list_indexes_metadata(registry, "idx-a,other")
    ]
    assert multi == ["idx-a", "other"]
    with pytest.raises(ValueError):
        api.list_indexes_metadata(registry, "-idx-*")


def test_reset_source_checkpoint_registry(registry, tmp_path):
    src = tmp_path / "x.ndjson"
    src.write_text('{"title": "t"}\n')
    api.create_source(registry, "idx-a", {
        "source_id": "files", "source_type": "file",
        "params": {"filepath": str(src)},
    })
    registry["idx-a"].source_checkpoints["files"] = {"p0": "00000000000000000042"}
    api.reset_source_checkpoint(registry, "idx-a", "files")
    assert registry["idx-a"].source_checkpoints["files"] == {}
    # source config untouched
    assert "files" in registry["idx-a"].sources
    with pytest.raises(api.IndexNotFoundError):
        api.reset_source_checkpoint(registry, "idx-a", "ghost")
    with pytest.raises(api.IndexNotFoundError):
        api.reset_source_checkpoint(registry, "ghost", "files")


def test_checkpoint_store_reset_source(tmp_path):
    store = CheckpointStore(str(tmp_path))
    store.commit("src-a", {"p0": (None, 10)}, commit_id="c1")
    store.commit("src-b", {"p0": (None, 5)}, commit_id="c2")
    store.commit("src-a", {"p0": (10, 20), "p1": (None, 3)}, commit_id="c3")
    assert store.current("src-a") == {
        "p0": "00000000000000000020", "p1": "00000000000000000003",
    }
    dropped = store.reset_source("src-a")
    assert dropped == 3
    assert store.current("src-a") == {}
    # the other source's positions survive
    assert store.current("src-b") == {"p0": "00000000000000000005"}
    # a replay from Beginning is now compatible again
    store.commit("src-a", {"p0": (None, 10)}, commit_id="c4")
    assert store.current("src-a") == {"p0": "00000000000000000010"}
    # idempotent
    assert store.reset_source("ghost") == 0


def test_parse_query_ast_shapes():
    ast = api.parse_query("title:hello")
    assert ast["type"] == "term" if "type" in ast else True  # tagged dict
    # a bool query parses into a tagged bool node with clauses
    b = api.parse_query("title:hello AND ts:[2024-01-01T00:00:00Z TO *]")
    s = str(b)
    assert "hello" in s and ("must" in s or "bool" in s)
    # default-field override routes bare terms
    d1 = api.parse_query("hello", search_fields=["title"])
    assert "title" in str(d1)
    with pytest.raises(ValueError):
        api.parse_query("title:(unclosed")


def test_es_count_and_clear_scroll(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "delta")], ["id", "title"]
    )
    assert api.es_count(df, {"query": {"match_all": {}}}) == {"count": 3}
    got = api.es_count(
        df,
        {"query": {"match": {"title": "beta"}}},
        field_types={"title": "text", "id": "numeric"},
    )
    assert got == {"count": 2}
    assert api.clear_scroll() == {"succeeded": True, "num_freed": 0}


def test_health_and_version(tmp_path):
    assert api.health_livez() is True
    assert api.health_readyz({}) is True
    assert api.health_readyz({"a": str(tmp_path)}) is True
    assert api.health_readyz({"a": str(tmp_path / "missing")}) is False
    v = api.node_version()
    assert set(v) == {"build", "runtime"}
    assert v["build"]["version"] and v["runtime"]["num_cpus"] >= 1
