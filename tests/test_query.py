"""Query-string → predicate tests (docs/reference/query-language.md semantics)."""

import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators.query import (
    Bool,
    Exists,
    MatchAll,
    Phrase,
    PhrasePrefix,
    QueryCompiler,
    Range,
    Regex,
    Term,
    TermSet,
    Wildcard,
    es_dsl_to_ast,
    parse_query,
)


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (1, "server started at 8080", "INFO", 8080, "2024-01-01T00:00:00"),
        (2, "server started at 9090", "INFO", 9090, "2024-02-01T00:00:00"),
        (3, "connection refused", "ERROR", None, "2024-03-01T00:00:00"),
        (4, "Disk almost full", "WARN", None, "2024-04-01T00:00:00"),
        (5, None, "ERROR", 1234, "2024-05-01T00:00:00"),
    ]
    df = spark.createDataFrame(rows, ["id", "msg", "level", "port", "ts_str"]).withColumn(
        "ts", F.to_timestamp("ts_str")
    )
    return df.cache()


@pytest.fixture(scope="module")
def qc():
    return QueryCompiler(
        field_types={"msg": "text", "level": "raw", "port": "numeric", "ts": "datetime"},
        default_fields=("msg",),
    )


def ids(qc, df, q):
    return sorted(r["id"] for r in qc.where(df, q).select("id").collect())


def test_parse_shapes():
    assert parse_query("*") == MatchAll()
    assert parse_query("level:ERROR") == Term("level", "ERROR")
    assert parse_query("level:IN [a b]") == TermSet("level", ("a", "b"))
    assert parse_query("msg:*") == Exists("msg")
    ast = parse_query("level:ERROR AND msg:refused OR level:WARN")
    # AND binds tighter than OR
    assert isinstance(ast, Bool) and len(ast.should) == 2
    assert parse_query('msg:"a b"~2') == Phrase("msg", "a b", 2)
    assert parse_query('msg:"a b"*') == PhrasePrefix("msg", "a b")
    assert parse_query("msg:/serv.*/") == Regex("msg", "serv.*")
    assert parse_query("port:[8000 TO 9090}") == Range(
        "port", "8000", "9090", True, False
    )
    assert parse_query("port:>=8080") == Range("port", lower="8080")
    assert parse_query("msg:serv*") == Wildcard("msg", "serv*")


def test_term_raw_vs_text(qc, docs_df):
    assert ids(qc, docs_df, "level:ERROR") == [3, 5]
    # tokenized text: token equality post-lowercase
    assert ids(qc, docs_df, "msg:SERVER") == [1, 2]


def test_bool_and_not(qc, docs_df):
    assert ids(qc, docs_df, "msg:server AND port:8080") == [1]
    assert ids(qc, docs_df, "msg:server -port:8080") == [2]
    assert ids(qc, docs_df, "NOT level:ERROR") == [1, 2, 4]
    assert ids(qc, docs_df, "(level:ERROR OR level:WARN) AND msg:*") == [3, 4]


def test_implicit_and(qc, docs_df):
    assert ids(qc, docs_df, "msg:server msg:started port:9090") == [2]


def test_termset(qc, docs_df):
    assert ids(qc, docs_df, "level:IN [WARN ERROR]") == [3, 4, 5]


def test_range_numeric(qc, docs_df):
    assert ids(qc, docs_df, "port:[8080 TO 9090]") == [1, 2]
    assert ids(qc, docs_df, "port:[8080 TO 9090}") == [1]
    assert ids(qc, docs_df, "port:>8080") == [2]
    assert ids(qc, docs_df, "port:<=1234") == [5]


def test_range_datetime(qc, docs_df):
    assert ids(qc, docs_df, "ts:[2024-02-01T00:00:00Z TO 2024-04-01T00:00:00Z}") == [2, 3]


def test_exists(qc, docs_df):
    assert ids(qc, docs_df, "msg:*") == [1, 2, 3, 4]
    assert ids(qc, docs_df, "port:*") == [1, 2, 5]


def test_phrase(qc, docs_df):
    assert ids(qc, docs_df, 'msg:"server started"') == [1, 2]
    assert ids(qc, docs_df, 'msg:"started 8080"') == []
    assert ids(qc, docs_df, 'msg:"started 8080"~1') == [1]
    assert ids(qc, docs_df, 'msg:"disk almost full"') == [4]


def test_phrase_prefix(qc, docs_df):
    assert ids(qc, docs_df, 'msg:"connection ref"*') == [3]


def test_wildcard_and_regex(qc, docs_df):
    assert ids(qc, docs_df, "level:ERR*") == [3, 5]
    assert ids(qc, docs_df, "level:?RROR") == [3, 5]
    assert ids(qc, docs_df, "msg:/.*refused/") == [3]


def test_default_field_bare_term(qc, docs_df):
    assert ids(qc, docs_df, "refused") == [3]


def test_match_all(qc, docs_df):
    assert ids(qc, docs_df, "*") == [1, 2, 3, 4, 5]


def test_es_dsl(qc, docs_df):
    ast = es_dsl_to_ast(
        {
            "bool": {
                "must": [{"match": {"msg": "server started"}}],
                "must_not": [{"term": {"port": {"value": "8080"}}}],
            }
        }
    )
    got = sorted(
        r["id"]
        for r in docs_df.filter(F.coalesce(qc.compile(ast), F.lit(False))).select("id").collect()
    )
    assert got == [2]
    ast2 = es_dsl_to_ast({"range": {"port": {"gte": 8080, "lt": 9090}}})
    got2 = sorted(r["id"] for r in docs_df.filter(qc.compile(ast2)).select("id").collect())
    assert got2 == [1]
    ast3 = es_dsl_to_ast({"exists": {"field": "port"}})
    assert docs_df.filter(qc.compile(ast3)).count() == 3
    ast4 = es_dsl_to_ast({"prefix": {"level": "ERR"}})
    assert docs_df.filter(qc.compile(ast4)).count() == 2
