"""Native POST /{index}/ingest (reference ingest_api/rest_handler.rs:145-240
+ response.rs RestIngestResponse; scenario shapes from the handler's own
tests at rest_handler.rs:340-540)."""

from __future__ import annotations

import pytest

from quickwit_spark.api import BulkIndexRegistry, IndexNotFoundError, ingest
from quickwit_spark.operators.docmapper import DocMapping, FieldMapping


@pytest.fixture()
def registry():
    mapping = DocMapping(
        field_mappings=[
            FieldMapping("message", "text"),
            FieldMapping("level", "text", tokenizer="raw"),
        ],
        mode="lenient",
    )
    return BulkIndexRegistry(indexes={"logs": mapping})


def test_ingest_happy_path(spark, registry):
    body = '{"message": "one"}\n\n  \n{"message": "two"}\n{"message": "three"}'
    resp, frame = ingest(spark, registry, "logs", body)
    # blank/whitespace-only lines are skipped (rest_handler.rs lines())
    assert resp == {
        "num_docs_for_processing": 3,
        "num_ingested_docs": 3,
        "num_rejected_docs": 0,
    }
    assert sorted(r.message for r in frame.collect()) == ["one", "three", "two"]


def test_ingest_empty_body(spark, registry):
    resp, frame = ingest(spark, registry, "logs", "\n  \n")
    assert resp == {"num_docs_for_processing": 0}
    assert frame is None


def test_ingest_rejects_and_detailed_response(spark, registry):
    body = '{"message": "ok"}\nnot json at all\n{"message": "ok2"}'
    resp, frame = ingest(spark, registry, "logs", body, detailed_response=True)
    assert resp["num_docs_for_processing"] == 3
    assert resp["num_ingested_docs"] == 2
    assert resp["num_rejected_docs"] == 1
    (failure,) = resp["parse_failures"]
    assert failure["document"] == "not json at all"
    assert failure["reason"] == "invalid_json"
    assert failure["message"]
    assert frame.count() == 2

    # without detailed_response the failures list is absent (serde
    # skip_serializing_if on the Option)
    resp2, _ = ingest(spark, registry, "logs", body)
    assert "parse_failures" not in resp2


def test_ingest_commit_types_and_errors(spark, registry):
    for commit in ("auto", "wait_for", "force"):
        resp, _ = ingest(spark, registry, "logs", '{"message": "x"}', commit=commit)
        assert resp["num_ingested_docs"] == 1
    with pytest.raises(ValueError, match="unknown commit type"):
        ingest(spark, registry, "logs", '{"message": "x"}', commit="later")
    with pytest.raises(ValueError, match="invalid index ID"):
        ingest(spark, registry, "0bad~id", '{"message": "x"}')
    with pytest.raises(IndexNotFoundError):
        ingest(spark, registry, "ghost-index", '{"message": "x"}')
