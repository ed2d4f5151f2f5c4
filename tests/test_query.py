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


# ---------------------------------------------------------------------------
# round 2: ES bool should-semantics, token-level regex/wildcard, ip kind
# ---------------------------------------------------------------------------


def test_bool_should_optional_with_must(qc, docs_df):
    """ES/tantivy: should clauses don't filter when must/filter present
    (minimum_should_match defaults to 0)."""
    ast = Bool(
        must=[Term("level", "INFO")],
        should=[Term("port", "8080")],
    )
    got = sorted(r["id"] for r in docs_df.filter(qc.compile(ast)).select("id").collect())
    assert got == [1, 2]  # doc 2 matches the must but not the should — kept

    # explicit minimum_should_match=1 restores the requirement
    ast.minimum_should_match = 1
    got = sorted(r["id"] for r in docs_df.filter(qc.compile(ast)).select("id").collect())
    assert got == [1]


def test_bool_minimum_should_match_2(qc, docs_df):
    ast = Bool(
        should=[Term("level", "INFO"), Term("port", "8080"), Term("port", "9090")],
        minimum_should_match=2,
    )
    got = sorted(r["id"] for r in docs_df.filter(qc.compile(ast)).select("id").collect())
    assert got == [1, 2]


def test_es_dsl_bool_must_plus_should(qc, docs_df):
    ast = es_dsl_to_ast(
        {
            "bool": {
                "must": [{"term": {"level": {"value": "INFO"}}}],
                "should": [{"term": {"port": {"value": "8080"}}}],
            }
        }
    )
    assert docs_df.filter(qc.compile(ast)).count() == 2
    ast2 = es_dsl_to_ast(
        {
            "bool": {
                "must": [{"term": {"level": {"value": "INFO"}}}],
                "should": [{"term": {"port": {"value": "8080"}}}],
                "minimum_should_match": 1,
            }
        }
    )
    assert docs_df.filter(qc.compile(ast2)).count() == 1


def test_regex_over_tokens(qc, docs_df):
    """tantivy regex matches whole TERMS in the token stream — `/conn.*/`
    must hit the token `connection` inside a longer message."""
    assert ids(qc, docs_df, "msg:/conn.*/") == [3]
    # anchored per token: a mid-token pattern without wildcards doesn't match
    assert ids(qc, docs_df, "msg:/onnection/") == []
    assert ids(qc, docs_df, "msg:/.*fused/") == [3]


def test_wildcard_over_tokens(qc, docs_df):
    # token-level, lowercased by the normalizer
    assert ids(qc, docs_df, "msg:Dis*") == [4]
    assert ids(qc, docs_df, "msg:start*") == [1, 2]
    # whole-token: pattern must cover the entire term
    assert ids(qc, docs_df, "msg:tarted") == []


@pytest.fixture(scope="module")
def ip_df(spark):
    from quickwit_spark.functions.ip import ip_normalize

    rows = [
        (1, ip_normalize("10.0.0.5")),
        (2, ip_normalize("10.0.0.200")),
        (3, ip_normalize("10.0.1.5")),
        (4, ip_normalize("2001:db8::1")),
        (5, ip_normalize("::1")),
        (6, None),
    ]
    return spark.createDataFrame(rows, ["id", "addr"]).cache()


def test_ip_term_and_range(ip_df):
    qc_ip = QueryCompiler(field_types={"addr": "ip"})

    def ip_ids(q):
        return sorted(r["id"] for r in qc_ip.where(ip_df, q).select("id").collect())

    # term equality via docmapper normalization (v4 → ::ffff: form)
    assert ip_ids("addr:10.0.0.200") == [2]
    # range must be NUMERIC u128 order: lexicographic on the stored string
    # would put "::ffff:10.0.0.200" < "::ffff:10.0.0.5"
    assert ip_ids("addr:[10.0.0.1 TO 10.0.0.255]") == [1, 2]
    assert ip_ids("addr:[10.0.0.6 TO 10.0.1.255]") == [2, 3]
    # v6 bounds, compressed storage form
    assert ip_ids("addr:[2001:db8:: TO 2001:db8::ffff]") == [4]
    assert ip_ids("addr:[:: TO ::2]") == [5]


def test_ip_sortable_col_matches_python(spark, ip_df):
    from quickwit_spark.functions.ip import ip_sortable_col, ip_sortable_literal

    rows = ip_df.filter(F.col("addr").isNotNull()).select(
        "addr", ip_sortable_col(F.col("addr")).alias("sortable")
    ).collect()
    for r in rows:
        assert r["sortable"] == ip_sortable_literal(r["addr"]), r["addr"]


def test_compiler_from_doc_mapping(spark):
    from quickwit_spark.operators.docmapper import DocMapping, FieldMapping

    mapping = DocMapping(
        field_mappings=[
            FieldMapping("msg", "text"),
            FieldMapping("latency", "u64"),
            FieldMapping("addr", "ip"),
            FieldMapping(
                "nested", "object",
                fields=[FieldMapping("inner", "i64")],
            ),
        ],
        timestamp_field=None,
    )
    qc2 = QueryCompiler.from_doc_mapping(mapping, default_fields=("msg",))
    assert qc2.info("msg").kind == "text"
    assert qc2.info("latency").kind == "numeric"
    assert qc2.info("addr").kind == "ip"
    assert qc2.info("nested.inner").kind == "numeric"
    # dynamic mode: undeclared fields route to _dynamic extraction
    assert qc2.info("unknown").kind == "dynamic"
    mapping.mode = "strict"
    qc3 = QueryCompiler.from_doc_mapping(mapping)
    assert qc3.info("unknown").kind == "raw"


def test_compiler_from_doc_mapping_tokenizers(spark):
    from quickwit_spark.operators.docmapper import DocMapping, FieldMapping

    mapping = DocMapping(
        field_mappings=[
            FieldMapping("msg", "text"),
            FieldMapping("tagline", "text", tokenizer="raw"),
            FieldMapping("all_raw", "concatenate", tokenizer="raw", source_fields=("msg",)),
            FieldMapping("all_def", "concatenate", source_fields=("msg",)),
            FieldMapping("props", "json"),
        ],
        mode="dynamic",
    )
    qc2 = QueryCompiler.from_doc_mapping(mapping)
    assert qc2.info("msg").kind == "text"
    assert qc2.info("tagline").kind == "raw"
    assert qc2.info("all_raw").kind == "concat_raw"
    assert qc2.info("all_def").kind == "concat_default"
    assert qc2.info("props").kind == "json"
    # undeclared fields route to the dynamic column in dynamic mode
    assert qc2.dynamic_col == "_dynamic"
    assert qc2.info("anything").kind == "dynamic"


# ---------------------------------------------------------------------------
# tag-filter extraction (tag_pruning.rs unit vectors, expected strings
# verbatim from the reference's Display)
# ---------------------------------------------------------------------------


def test_extract_tag_filter_reference_vectors():
    from quickwit_spark.operators.query import (
        Bool,
        MatchAll,
        Range,
        Term,
        TermSet,
        extract_tag_filter,
    )

    def s(ast):
        filt = extract_tag_filter(ast)
        return None if filt is None else str(filt)

    # "*" → no tag constraint
    assert s(MatchAll()) == None  # noqa: E711
    # "title:>foo lang:fr" (OR operand): range is uninformative → whole OR True
    assert s(Bool(should=[Range("title", lower="foo"), Term("lang", "fr")])) is None
    # "title:>foo AND lang:fr"
    assert s(Bool(must=[Range("title", lower="foo"), Term("lang", "fr")])) == "(¬lang! ∨ lang:fr)"
    # "title:foo user:bart lang:fr" (OR operand)
    assert (
        s(Bool(should=[Term("title", "foo"), Term("user", "bart"), Term("lang", "fr")]))
        == "((¬title! ∨ title:foo) ∨ (¬user! ∨ user:bart) ∨ (¬lang! ∨ lang:fr))"
    )
    # "title:foo AND (user:bart OR lang:fr)"
    assert (
        s(Bool(must=[Term("title", "foo"),
                     Bool(should=[Term("user", "bart"), Term("lang", "fr")])]))
        == "(¬title! ∨ title:foo) ∧ ((¬user! ∨ user:bart) ∨ (¬lang! ∨ lang:fr))"
    )
    # "(user:bart AND lang:fr)"
    assert (
        s(Bool(must=[Term("user", "bart"), Term("lang", "fr")]))
        == "(¬user! ∨ user:bart) ∧ (¬lang! ∨ lang:fr)"
    )
    # "(user:bart OR lang:fr)"
    assert (
        s(Bool(should=[Term("user", "bart"), Term("lang", "fr")]))
        == "((¬user! ∨ user:bart) ∨ (¬lang! ∨ lang:fr))"
    )
    # "(user:bart -lang:fr)": OR with a negative tag is inconclusive
    assert s(Bool(should=[Term("user", "bart")], must_not=[Term("lang", "fr")])) is None
    # "user:bart AND NOT lang:fr": negatives drop out of AND clauses
    assert (
        s(Bool(must=[Term("user", "bart")], must_not=[Term("lang", "fr")]))
        == "(¬user! ∨ user:bart)"
    )
    # "(+user:bart lang:fr)": should dropped when a must exists
    assert (
        s(Bool(must=[Term("user", "bart")], should=[Term("lang", "fr")]))
        == "(¬user! ∨ user:bart)"
    )
    # TermSet expands to an OR of term tags (tag_pruning.rs:70-85)
    assert (
        s(Bool(must=[TermSet("lang", ("fr", "en"))]))
        == "((¬lang! ∨ lang:fr) ∨ (¬lang! ∨ lang:en))"
    )


def test_wildcard_escape_semantics(spark):
    """wildcard_query.rs:44-71 escapes: `\\*` is a literal star, `\\x` is x,
    a trailing lone backslash is dropped — and the StartsWith pruning guard
    must agree with the matcher on all of them."""
    from quickwit_spark.operators.query import QueryCompiler

    df = spark.createDataFrame(
        [("a*b",), ("aXb",), ("a\\bXYZ",), ("ab",)], "f string"
    )
    qc = QueryCompiler({"f": "raw"})
    from quickwit_spark.operators.query import Wildcard

    def hits(pattern):
        return sorted(
            r["f"] for r in df.filter(qc.compile(Wildcard("f", pattern))).collect()
        )

    assert hits(r"a\*b") == ["a*b"]          # escaped star = literal
    assert hits("a?b") == ["a*b", "aXb"]     # ? = any one char
    assert hits(r"a\\b*") == ["a\\bXYZ"]     # escaped backslash
    assert hits("ab" + chr(92)) == ["ab"]    # trailing lone escape dropped
