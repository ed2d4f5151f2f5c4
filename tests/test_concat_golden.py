"""Concatenate-field golden vectors
(rest-api-tests/scenarii/concat_fields/0001_concat_field.yaml): the concat
field matches with ITS OWN tokenizer, gathers bools/numbers as strings, json
LEAF values recursively, and dynamic leaves when include_dynamic_fields."""

import json

import pytest

from quickwit_spark.operators.docmapper import (
    DocMapper,
    DocMapping,
    FieldMapping,
    split_quarantine,
)
from quickwit_spark.operators.query import QueryCompiler

_DOCS = [
    {"text1": "AB-CD", "text2": "EF-GH"},
    {"text1": "true"},
    {"boolean": True},
    {"text2": "i like 42"},
    {"int": 42},
    {"other-field": "otherfieldvalue", "other-field-number": 9, "other-field-bool": False},
    {"json": {"some_bool": False, "some_int": 10, "nested": {"some_string": "nestedstring"}}},
    {"float": 1.5},
    {"json": {"val:": 2.5, "date": "2024-01-01T00:13:00Z"}},
    {"other": 3.5},
]

_SOURCES = ("text1", "text2", "boolean", "int", "json", "float")


@pytest.fixture(scope="module")
def concat_df(spark):
    mapping = DocMapping(
        field_mappings=[
            FieldMapping("text1", "text"),
            FieldMapping("text2", "text"),
            FieldMapping("boolean", "bool"),
            FieldMapping("int", "u64"),
            FieldMapping("float", "f64"),
            FieldMapping("json", "json"),
            FieldMapping(
                "concat_raw", "concatenate",
                source_fields=_SOURCES, include_dynamic_fields=True,
            ),
            FieldMapping(
                "concat_default", "concatenate",
                source_fields=_SOURCES, include_dynamic_fields=False,
            ),
        ],
        mode="dynamic",
    )
    df = spark.createDataFrame([(json.dumps(d),) for d in _DOCS], ["value"])
    valid, _ = split_quarantine(DocMapper(mapping).apply(df))
    valid = valid.cache()
    assert valid.count() == len(_DOCS)
    return valid


QC = QueryCompiler({"concat_raw": "concat_raw", "concat_default": "concat_default"})


@pytest.mark.parametrize(
    "query,want",
    [
        # the concat field's tokenizer applies, not the source field's
        ("concat_raw:AB-CD", 1),
        ("concat_raw:EF-GH", 1),
        ("concat_default:AB", 1),
        ("concat_default:GH", 1),
        # bools found in text AND bool fields
        ("concat_raw:true", 2),
        ("concat_default:true", 2),
        # numbers: raw doesn't tokenize "i like 42", default does
        ("concat_raw:42", 1),
        ("concat_default:42", 2),
        # dynamic fields only in concat_raw (include_dynamic_fields)
        ("concat_raw:otherfieldvalue", 1),
        ("concat_raw:9", 1),
        ("concat_default:otherfieldvalue OR concat_default:9", 0),
        # json leaves, recursively
        ("concat_raw:false", 2),
        ("concat_default:false", 1),
        ("concat_raw:10", 1),
        ("concat_raw:nestedstring", 1),
        ("concat_default:10", 1),
        ("concat_default:nestedstring", 1),
        ("concat_default:1.5", 1),
    ],
)
def test_concat_field_vectors(concat_df, query, want):
    assert QC.where(concat_df, query).count() == want, query


def test_default_search_fields_reach_dynamic_and_json(spark):
    """default_search_fields/0001 vectors: a bare term finds hits in the
    declared text field, inside a json field's leaf values, and in dynamic
    fields (via the `_dynamic` capture)."""
    docs = [
        {"id": 1, "some_dynamic_field": "hello"},
        {"id": 2, "inner_json": {"somefieldinjson": "allo"}},
        {"id": 3, "regular_field": "bonjour"},
    ]
    mapping = DocMapping(
        field_mappings=[
            FieldMapping("id", "u64"),
            FieldMapping("inner_json", "json"),
            FieldMapping("regular_field", "text"),
        ],
        mode="dynamic",
    )
    df = spark.createDataFrame([(json.dumps(d),) for d in docs], ["value"])
    valid, _ = split_quarantine(DocMapper(mapping).apply(df))
    valid = valid.cache()
    qc = QueryCompiler(
        {"regular_field": "text", "inner_json": "json", "_dynamic": "json"},
        default_fields=("regular_field", "inner_json", "_dynamic"),
    )

    def hit_ids(q):
        return sorted(r["id"] for r in qc.where(valid, q).select("id").collect())

    assert hit_ids("hello") == [1]
    assert hit_ids("allo") == [2]
    assert hit_ids("bonjour") == [3]
    # keys are NOT searchable as values
    assert hit_ids("somefieldinjson") == []


def test_dynamic_field_queries(spark):
    """mode=dynamic makes every captured field queryable (term / exists /
    numeric range compile against the `_dynamic` JSON via extraction)."""
    docs = [
        {"declared": "x", "svc": "Web-Frontend", "lat": 120, "k8s.pod.name": "web-1"},
        {"declared": "y", "svc": "db", "lat": 30},
        {"declared": "z"},
    ]
    mapping = DocMapping(
        field_mappings=[FieldMapping("declared", "text")],
        mode="dynamic",
        expand_dots=True,
    )
    df = spark.createDataFrame([(json.dumps(d),) for d in docs], ["value"])
    valid, _ = split_quarantine(DocMapper(mapping).apply(df))
    valid = valid.cache()
    qc = QueryCompiler({"declared": "text"}, dynamic_col="_dynamic")

    def n(q):
        return qc.where(valid, q).count()

    assert n("svc:web") == 1  # dynamic text tokenizes with default
    assert n("svc:frontend") == 1
    assert n("svc:db") == 1
    assert n("lat:120") == 1  # numbers match as exact tokens
    assert n("svc:*") == 2  # exists over dynamic
    assert n("lat:[50 TO 200]") == 1  # numeric range over dynamic
    assert n("lat:[10 TO 200]") == 2
    assert n("k8s.pod.name:web-1") == 1  # expand_dots nested path
    assert n("declared:x") == 1  # declared fields unaffected
