"""ES `_bulk` golden vectors (rest-api-tests/scenarii/es_compatibility/bulk/
0001-0007; reference bulk_v2.rs semantics).

Setup mirrors _setup.quickwit.yaml: a `test-index` with (message text,
timestamp datetime) and an index template matching `test-index-pattern-*`
with a dynamic doc mapping that auto-creates indexes at first ingest.
"""

from __future__ import annotations

import pytest

from quickwit_spark.api import BulkIndexRegistry, es_bulk
from quickwit_spark.operators.docmapper import DocMapping, FieldMapping


@pytest.fixture()
def registry():
    mapping = DocMapping(
        field_mappings=[
            FieldMapping("message", "text"),
            FieldMapping("timestamp", "datetime"),
        ],
        mode="lenient",
    )
    template = DocMapping(field_mappings=[], mode="dynamic")
    return BulkIndexRegistry(
        indexes={"test-index": mapping},
        templates=[(["test-index-pattern-*"], template)],
    )


def test_0001_happy_path(spark, registry):
    res, frames = es_bulk(
        spark,
        registry,
        [
            {"index": {"_index": "test-index", "_id": "1"}},
            {"message": "Hello, World!"},
            {"index": {"_index": "test-index"}},
            {"message": "Hola, Mundo!"},
        ],
    )
    assert res["errors"] is False
    assert res["items"][0]["index"]["_index"] == "test-index"
    assert res["items"][0]["index"]["_id"] == "1"
    assert res["items"][0]["index"]["status"] == 201
    assert res["items"][1]["index"]["status"] == 201
    assert "_id" not in res["items"][1]["index"]
    got = sorted(r.message for r in frames["test-index"].collect())
    assert got == ["Hello, World!", "Hola, Mundo!"]


def test_0002_malformed_action(spark, registry):
    res, frames = es_bulk(
        spark, registry, [{"del": {"_index": "test-index", "_id": "1"}}]
    )
    assert res["status"] == 400
    assert res["error"]["type"] == "illegal_argument_exception"
    assert res["error"]["reason"].startswith("Malformed action/metadata line [1]")
    assert frames == {}


def test_0003_validation_failed_index_missing(spark, registry):
    res, _ = es_bulk(
        spark, registry, [{"index": {"_id": "1"}}, {"message": "Hello, World!"}]
    )
    assert res["status"] == 400
    assert res["error"]["type"] == "action_request_validation_exception"
    assert res["error"]["reason"] == "Validation Failed: 1: index is missing;"


def test_0004_default_index_from_path(spark, registry):
    # PUT /test-index/_bulk — the path segment is the DEFAULT index
    res, frames = es_bulk(
        spark,
        registry,
        [{"index": {}}, {"message": "Hello, World!"}],
        default_index="test-index",
    )
    assert res["errors"] is False
    assert res["items"][0]["index"] == {"_index": "test-index", "status": 201}
    assert frames["test-index"].count() == 1


def test_0005_document_parsing_exception(spark, registry):
    res, frames = es_bulk(
        spark,
        registry,
        [
            {"index": {"_index": "test-index", "_id": "5"}},
            {"message": "Hello, World!", "timestamp": "timestamp"},
        ],
    )
    assert res["errors"] is True
    item = res["items"][0]["index"]
    assert item["_index"] == "test-index"
    assert item["_id"] == "5"
    assert item["status"] == 400
    assert item["error"]["type"] == "document_parsing_exception"
    assert "timestamp" in item["error"]["reason"]
    assert frames["test-index"].count() == 0


def test_0006_partial_index_not_found(spark, registry):
    res, frames = es_bulk(
        spark,
        registry,
        [
            {"index": {"_index": "test-index-not-found"}},
            {"message": "Hello, World!"},
            {"index": {"_index": "test-index"}},
            {"message": "Hola, Mundo!"},
            {"index": {"_index": "test-index-pattern-777"}},
            {"message": "Hola, Mundo!"},
        ],
    )
    assert res["errors"] is True
    it0, it1, it2 = (it["index"] for it in res["items"])
    assert it0["status"] == 404
    assert it0["error"]["type"] == "index_not_found_exception"
    assert it0["error"]["reason"].startswith("no such index [test-index-not-found]")
    assert it1["status"] == 201
    # the template matched and auto-created the index
    assert it2["status"] == 201
    assert "test-index-pattern-777" in registry.auto_created
    assert frames["test-index-pattern-777"].count() == 1


def test_0007_illegal_index_name(spark, registry):
    res, _ = es_bulk(
        spark,
        registry,
        [
            {"index": {"_index": "test-index"}},
            {"message": "Hola, Mundo!"},
            {"index": {"_index": "test-index-pattern-11"}},
            {"message": "Hola, Mundo!"},
            {"index": {"_index": "test-index-pattern-&1"}},
            {"message": "Hola, Mundo!"},
        ],
    )
    assert res["errors"] is True
    statuses = [it["index"]["status"] for it in res["items"]]
    assert statuses == [201, 201, 400]
    bad = res["items"][2]["index"]
    assert bad["error"]["type"] == "illegal_argument_exception"
    assert bad["error"]["reason"] == "invalid index id [test-index-pattern-&1]"


def test_ndjson_string_payload(spark, registry):
    payload = (
        '{"index": {"_index": "test-index"}}\n'
        '{"message": "line one"}\n'
        '{"index": {"_index": "test-index"}}\n'
        '{"message": "line two"}\n'
    )
    res, frames = es_bulk(spark, registry, payload)
    assert res["errors"] is False
    assert frames["test-index"].count() == 2


def test_trailing_action_without_doc(spark, registry):
    res, _ = es_bulk(spark, registry, [{"index": {"_index": "test-index"}}])
    assert res["status"] == 400
    assert res["error"]["reason"] == "Validation Failed: 1: no requests added;"
