"""Index/source update API golden tests, replaying the reference's
update_tests scenarios (quickwit-integration-tests/src/tests/update_tests/
search_settings_tests.rs:26-130 and doc_mapping_tests.rs) over the
create_index → update_index path, plus the source CRUD + clear_index
surface (index.rs:459-583, index_metadata/mod.rs:102-195)."""

import os

import pytest
from pyspark.sql import functions as F

from quickwit_spark.api import (
    IndexNotFoundError,
    clear_index,
    create_index,
    create_source,
    delete_source,
    es_search,
    toggle_source,
    update_index,
    update_source,
)
from quickwit_spark.operators.query import QueryCompiler


def base_config(**overrides):
    cfg = {
        "index_id": "my-updatable-index",
        "doc_mapping": {
            "field_mappings": [
                {"name": "title", "type": "text"},
                {"name": "body", "type": "text"},
                {"name": "ts", "type": "datetime", "fast": True},
            ],
            "timestamp_field": "ts",
            "mode": "lenient",
        },
        "search_settings": {"default_search_fields": ["title"]},
    }
    cfg.update(overrides)
    return cfg


@pytest.fixture()
def registry():
    indexes = {}
    create_index(indexes, base_config())
    return indexes


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "bonjour", "hello there", "2024-01-01T00:00:00"),
        (2, "farewell", "bonjour in the body only", "2024-01-02T00:00:00"),
        (3, "unrelated", "nothing here", "2024-01-03T00:00:00"),
    ]
    return (
        spark.createDataFrame(rows, ["id", "title", "body", "ts_str"])
        .withColumn("ts", F.to_timestamp("ts_str"))
        .drop("ts_str")
        .cache()
    )


def search_total(mapping, docs, query):
    compiler = QueryCompiler.from_doc_mapping(
        mapping, default_fields=mapping.default_search_fields
    )
    res = es_search(
        docs, {"query": {"query_string": {"query": query}}, "size": 0},
        compiler=compiler,
    )
    return res["hits"]["total"]["value"]


# --- search-settings update (search_settings_tests.rs:26-130) ---------------


def test_update_default_search_fields_changes_results(registry, docs):
    # dsf = [title]: "bonjour" only hits the title doc
    assert search_total(registry["my-updatable-index"], docs, "bonjour") == 1
    out = update_index(
        registry,
        base_config(search_settings={"default_search_fields": ["title", "body"]}),
    )
    assert out["mutation_occurred"] is True
    # identical doc mapping → uid is NOT bumped
    assert out["doc_mapping_uid"] == 1
    assert search_total(registry["my-updatable-index"], docs, "bonjour") == 2


def test_update_noop_reports_no_mutation(registry):
    out = update_index(registry, base_config())
    assert out["mutation_occurred"] is False
    assert out["doc_mapping_uid"] == 1


def test_update_adds_field_bumps_uid(registry):
    cfg = base_config()
    cfg["doc_mapping"]["field_mappings"].append({"name": "tag", "type": "text"})
    out = update_index(registry, cfg)
    assert out["mutation_occurred"] is True
    assert out["doc_mapping_uid"] == 2
    assert "tag" in out["doc_mapping_fields"]


# --- compat rejections (index_config/mod.rs:669-724) ------------------------


def test_update_timestamp_field_rejected(registry):
    cfg = base_config()
    cfg["doc_mapping"]["timestamp_field"] = None
    cfg["doc_mapping"]["field_mappings"].append({"name": "x", "type": "u64"})
    with pytest.raises(ValueError, match="timestamp field is not allowed"):
        update_index(registry, cfg)


def test_update_tokenizer_removal_rejected(registry):
    tok = {"name": "custom_one", "type": "regex", "pattern": "[a-z]+"}
    cfg = base_config()
    cfg["doc_mapping"]["tokenizers"] = [tok]
    out = update_index(registry, cfg)
    assert out["doc_mapping_uid"] == 2  # tokenizer added: a real change
    # removing it again is rejected (superset rule)
    with pytest.raises(ValueError, match="adding new tokenizers"):
        update_index(registry, base_config())
    # adding another on top is fine
    cfg2 = base_config()
    cfg2["doc_mapping"]["tokenizers"] = [
        tok, {"name": "custom_two", "type": "regex", "pattern": "[0-9]+"}]
    assert update_index(registry, cfg2)["doc_mapping_uid"] == 3


def test_update_unknown_index_and_bad_search_fields(registry):
    with pytest.raises(IndexNotFoundError):
        update_index(registry, base_config(index_id="nope"))
    with pytest.raises(ValueError):
        update_index(
            registry,
            base_config(search_settings={"default_search_fields": ["ghost"]}),
        )


def test_update_settings_validation(registry):
    # retention requires a timestamp field
    cfg = base_config(retention={"period": "30 days"})
    cfg["doc_mapping"]["timestamp_field"] = None
    with pytest.raises(ValueError):
        update_index(registry, cfg)
    # bad retention period / schedule
    with pytest.raises(ValueError, match="duration"):
        update_index(registry, base_config(retention={"period": "eleventy"}))
    with pytest.raises(ValueError, match="schedule"):
        update_index(
            registry, base_config(retention={"period": "30 days", "schedule": "x"}))
    # good retention round-trips onto the mapping
    out = update_index(
        registry,
        base_config(retention={"period": "30 days", "schedule": "daily"}),
    )
    assert out["mutation_occurred"] is True
    assert registry["my-updatable-index"].retention_policy == {
        "period": "30 days", "schedule": "daily"}
    # invalid merge policy config rejected (validate_index_config)
    with pytest.raises(ValueError, match="max_merge_factor"):
        update_index(
            registry,
            base_config(indexing_settings={
                "merge_policy": {"type": "stable_log", "merge_factor": 99}}),
        )


# --- source CRUD ------------------------------------------------------------


def test_source_crud_lifecycle(registry, tmp_path):
    f = tmp_path / "in.ndjson"
    f.write_text('{"title": "t"}\n')
    src = {"source_id": "my-file-source", "source_type": "file",
           "params": {"filepath": str(f)}}
    created = create_source(registry, "my-updatable-index", src)
    assert created["enabled"] is True
    with pytest.raises(ValueError, match="already exists"):
        create_source(registry, "my-updatable-index", src)

    mapping = registry["my-updatable-index"]
    mapping.source_checkpoints["my-file-source"] = {"partition_0": 42}
    out = update_source(
        registry, "my-updatable-index",
        {"source_id": "my-file-source", "source_type": "file",
         "params": {"filepath": str(f)}, "num_pipelines": 2},
    )
    assert out["mutation_occurred"] is True
    # checkpoint survives an update (no replay)
    assert mapping.source_checkpoints["my-file-source"] == {"partition_0": 42}

    assert toggle_source(registry, "my-updatable-index", "my-file-source", False)
    assert not toggle_source(registry, "my-updatable-index", "my-file-source", False)

    delete_source(registry, "my-updatable-index", "my-file-source")
    assert "my-file-source" not in mapping.source_checkpoints
    with pytest.raises(IndexNotFoundError):
        delete_source(registry, "my-updatable-index", "my-file-source")


def test_source_validation(registry, tmp_path):
    with pytest.raises(ValueError, match="reserved"):
        create_source(registry, "my-updatable-index",
                      {"source_id": "_ingest-api-source", "source_type": "file",
                       "params": {"filepath": "/tmp/x"}})
    with pytest.raises(ValueError, match="unknown source type"):
        create_source(registry, "my-updatable-index",
                      {"source_id": "src1", "source_type": "carrier-pigeon"})
    with pytest.raises(ValueError, match="not found"):
        create_source(registry, "my-updatable-index",
                      {"source_id": "src1", "source_type": "file",
                       "params": {"filepath": str(tmp_path / "missing.json")}})
    with pytest.raises(ValueError, match="topic"):
        create_source(registry, "my-updatable-index",
                      {"source_id": "src1", "source_type": "kafka", "params": {}})
    with pytest.raises(IndexNotFoundError):
        update_source(registry, "my-updatable-index",
                      {"source_id": "ghost", "source_type": "void"})


# --- clear_index ------------------------------------------------------------


def test_clear_index_wipes_data_keeps_config(registry, spark, tmp_path):
    from quickwit_spark.pipeline.janitor import build_time_partitioned_index

    out_dir = str(tmp_path / "idx")
    rows = [(i, f"e{i % 3}", f"2024-01-0{1 + i % 3}T00:00:00") for i in range(30)]
    df = (
        spark.createDataFrame(rows, ["event_id", "event_type", "ts_str"])
        .withColumn("ts", F.to_timestamp("ts_str"))
        .drop("ts_str")
    )
    build_time_partitioned_index(spark, df, out_dir,
                                 sink_expr=F.col("event_type"), source_id="ev")
    create_source(registry, "my-updatable-index",
                  {"source_id": "evsrc", "source_type": "void"})
    registry["my-updatable-index"].source_checkpoints["evsrc"] = {"time": (0, 3)}

    res = clear_index(spark, registry, "my-updatable-index", out_dir)
    assert res["splits_deleted"] == 3  # three day-commits
    assert res["sources_reset"] == ["evsrc"]
    assert not os.path.exists(os.path.join(out_dir, "sinks"))
    assert registry["my-updatable-index"].source_checkpoints["evsrc"] == {}
    # still registered, config intact
    assert registry["my-updatable-index"].timestamp_field == "ts"
    with pytest.raises(IndexNotFoundError):
        clear_index(spark, registry, "nope", out_dir)
