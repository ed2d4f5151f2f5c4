"""Sorts/pagination module + concatenate field + ES multi_match tests."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators.docmapper import DocMapper, DocMapping, FieldMapping
from quickwit_spark.operators.query import Bool, FullText, PhrasePrefix, QueryCompiler, Term, es_dsl_to_ast
from quickwit_spark.operators.sorts import paginate, scroll, search_after, top_k


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "events.parquet")).cache()


SORT = [("value", True), ("event_id", False)]


def test_top_k_matches_sql(events):
    got = [r["event_id"] for r in top_k(events, SORT, 5).collect()]
    exp = [
        r["event_id"]
        for r in events.orderBy(F.col("value").desc(), F.col("event_id").asc()).limit(5).collect()
    ]
    assert got == exp


def test_search_after_continues_exactly(events):
    first = top_k(events, SORT, 10).collect()
    cursor = {"value": first[-1]["value"], "event_id": first[-1]["event_id"]}
    nxt = search_after(events, SORT, cursor, 10).collect()
    all20 = top_k(events, SORT, 20).collect()
    assert [r["event_id"] for r in first + nxt] == [r["event_id"] for r in all20]


def test_paginate_equals_search_after_path(events):
    page2 = paginate(events, SORT, 10, 10).collect()
    all20 = top_k(events, SORT, 20).collect()
    assert [r["event_id"] for r in page2] == [r["event_id"] for r in all20[10:]]


def test_scroll_exhausts_without_dupes(events):
    small = events.limit(257).cache()
    seen = []
    for page in scroll(small, SORT, page_size=100):
        seen.extend(r["event_id"] for r in page)
    assert len(seen) == 257 and len(set(seen)) == 257


def test_concatenate_field():
    m = DocMapper(
        DocMapping(
            field_mappings=[
                FieldMapping("title", "text"),
                FieldMapping("count", "u64"),
                FieldMapping("all", "concatenate", source_fields=("title", "count")),
            ],
            mode="dynamic",
        )
    )
    row = m.parse_doc({"title": "hello", "count": 7, "extra": "dyn-val", "flag": True})
    assert row["all"] == ["hello", "7", "dyn-val", "true"]
    # dynamic exclusion
    m2 = DocMapper(
        DocMapping(
            field_mappings=[
                FieldMapping("title", "text"),
                FieldMapping("all", "concatenate", source_fields=("title",), include_dynamic_fields=False),
            ],
        )
    )
    row2 = m2.parse_doc({"title": "a", "extra": "nope"})
    assert row2["all"] == ["a"]


def test_es_multi_match(spark):
    df = spark.createDataFrame(
        [(1, "spark engine", "fast"), (2, "duck db", "spark inside"), (3, "neither", "nope")],
        ["id", "a", "b"],
    )
    qc = QueryCompiler({"a": "text", "b": "text"})
    ast = es_dsl_to_ast({"multi_match": {"query": "spark", "fields": ["a", "b"]}})
    assert isinstance(ast, Bool) and len(ast.should) == 2
    got = sorted(r["id"] for r in df.filter(qc.compile(ast)).collect())
    assert got == [1, 2]


def test_es_match_bool_prefix(spark):
    df = spark.createDataFrame(
        [(1, "quick brown fox"), (2, "quick brother"), (3, "slow brown fox")],
        ["id", "t"],
    )
    qc = QueryCompiler({"t": "text"})
    ast = es_dsl_to_ast({"match_bool_prefix": {"t": "quick bro"}})
    assert isinstance(ast, Bool)
    assert isinstance(ast.must[0], Term) and isinstance(ast.must[-1], PhrasePrefix)
    got = sorted(r["id"] for r in df.filter(F.coalesce(qc.compile(ast), F.lit(False))).collect())
    assert got == [1, 2]
