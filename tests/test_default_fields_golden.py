"""default_search_fields golden vectors
(rest-api-tests/scenarii/default_search_fields/0001_default_fields.yaml and
0002_invalid_default_fields.yaml — expected hits and error strings only; the
harness is ours).

A bare query-string term fans out over `search_settings.default_search_fields`
covering all three resolution tiers at once: a declared text field, a dynamic
capture, and a dotted path into a declared json field. The 0002 vectors pin
the reference's build-time validation errors verbatim
(doc_mapper_impl.rs:245-262).
"""

import json

import pytest

from quickwit_spark.api import create_index, es_search
from quickwit_spark.operators.docmapper import (
    DocMapper,
    DocMapping,
    split_quarantine,
)
from quickwit_spark.operators.query import QueryCompiler

INDEX_CONFIG = {
    "version": "0.7",
    "index_id": "defaultsearchfields",
    "doc_mapping": {
        "mode": "dynamic",
        "field_mappings": [
            {"name": "id", "type": "u64"},
            {"name": "inner_json", "type": "json"},
            {"name": "regular_field", "type": "text"},
        ],
        "dynamic_mapping": {"expand_dots": True, "fast": True},
    },
    "search_settings": {
        "default_search_fields": [
            "regular_field",
            "some_dynamic_field",
            "inner_json.somefieldinjson",
        ]
    },
}

DOCS = [
    {"id": 1, "some_dynamic_field": "hello"},
    {"id": 2, "inner_json": {"somefieldinjson": "allo"}},
    {"id": 3, "regular_field": "bonjour"},
]


@pytest.fixture(scope="module")
def dsf_index(spark):
    registry: dict = {}
    create_index(registry, INDEX_CONFIG)
    mapping = registry["defaultsearchfields"]
    df = spark.createDataFrame([(json.dumps(d),) for d in DOCS], ["value"])
    valid, bad = split_quarantine(DocMapper(mapping).apply(df))
    assert bad.count() == 0
    compiler = QueryCompiler.from_doc_mapping(
        mapping, default_fields=mapping.default_search_fields
    )
    return valid.cache(), compiler


@pytest.mark.parametrize(
    "query,want_id,want_field,want_value",
    [
        ("hello", 1, "some_dynamic_field", "hello"),
        ("allo", 2, "inner_json", {"somefieldinjson": "allo"}),
        ("bonjour", 3, "regular_field", "bonjour"),
    ],
)
def test_0001_default_fields(dsf_index, query, want_id, want_field, want_value):
    df, compiler = dsf_index
    res = es_search(df, {"q": query}, compiler=compiler)
    assert res["hits"]["total"]["value"] == 1
    src = res["hits"]["hits"][0]["_source"]
    assert src["id"] == want_id
    got = src[want_field]
    if isinstance(want_value, dict) and isinstance(got, str):
        got = json.loads(got)
    assert got == want_value


def test_0002_unknown_field_in_lenient_mode():
    # mode=lenient has no dynamic capture to resolve against
    with pytest.raises(ValueError, match="unknown default search field `regular_field`"):
        create_index(
            {},
            {
                "version": "0.7",
                "index_id": "failing1",
                "doc_mapping": {"mode": "lenient", "field_mappings": []},
                "search_settings": {"default_search_fields": ["regular_field"]},
            },
        )


def test_0002_subfield_of_non_json_field():
    # a declared scalar field shadows its sub-paths — no dynamic fallback
    with pytest.raises(ValueError, match="unknown default search field `text.inner`"):
        create_index(
            {},
            {
                "version": "0.7",
                "index_id": "failing2",
                "doc_mapping": {
                    "mode": "dynamic",
                    "field_mappings": [{"name": "text", "type": "text"}],
                },
                "search_settings": {"default_search_fields": ["text.inner"]},
            },
        )


def test_0002_dynamic_not_indexed():
    with pytest.raises(
        ValueError, match="default search field `some_field` is not indexed"
    ):
        create_index(
            {},
            {
                "version": "0.7",
                "index_id": "failing3",
                "doc_mapping": {
                    "mode": "dynamic",
                    "field_mappings": [],
                    "dynamic_mapping": {"indexed": False},
                },
                "search_settings": {"default_search_fields": ["some_field"]},
            },
        )


def test_fast_only_field_rejected_as_default():
    # indexed:false on a declared field (fast-only) is "not indexed" too
    with pytest.raises(
        ValueError, match="default search field `text_fast` is not indexed"
    ):
        create_index(
            {},
            {
                "version": "0.7",
                "index_id": "failing4",
                "doc_mapping": {
                    "mode": "dynamic",
                    "field_mappings": [
                        {"name": "text_fast", "type": "text", "fast": True,
                         "indexed": False}
                    ],
                },
                "search_settings": {"default_search_fields": ["text_fast"]},
            },
        )


def test_duplicate_default_search_field_rejected():
    with pytest.raises(
        ValueError, match="duplicated default search field: `regular_field`"
    ):
        create_index(
            {},
            {
                "version": "0.7",
                "index_id": "failing5",
                "doc_mapping": {
                    "mode": "dynamic",
                    "field_mappings": [{"name": "regular_field", "type": "text"}],
                },
                "search_settings": {
                    "default_search_fields": ["regular_field", "regular_field"]
                },
            },
        )


def test_object_subfield_resolves_as_default(spark):
    # dotted descent through object sub-mappings resolves like the reference
    registry: dict = {}
    create_index(
        registry,
        {
            "version": "0.7",
            "index_id": "objok",
            "doc_mapping": {
                "mode": "lenient",
                "field_mappings": [
                    {
                        "name": "obj",
                        "type": "object",
                        "field_mappings": [{"name": "inner", "type": "text"}],
                    }
                ],
            },
            "search_settings": {"default_search_fields": ["obj.inner"]},
        },
    )
    assert registry["objok"].default_search_fields == ("obj.inner",)


def test_compiler_picks_up_mapping_defaults(dsf_index, spark):
    """QueryCompiler.from_doc_mapping uses the mapping's own stored
    default_search_fields when the caller passes none — a configured index
    answers bare terms without re-plumbing."""
    registry: dict = {}
    create_index(registry, {**INDEX_CONFIG, "index_id": "dsf2"})
    df, _ = dsf_index
    compiler = QueryCompiler.from_doc_mapping(registry["dsf2"])
    res = es_search(df, {"q": "hello"}, compiler=compiler)
    assert res["hits"]["total"]["value"] == 1
