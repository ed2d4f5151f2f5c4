"""Snippet generation (snippet_fields) — tantivy-faithful highlighting.

Vectors are hand-derived from tantivy's public snippet algorithm
(search_fragments / select_best_fragment_combination / to_html) — the same
contract quickwit's fetch phase relies on (fetch_docs.rs:150-341)."""

import pytest

from quickwit_spark.operators.query import parse_query
from quickwit_spark.operators.snippets import (
    DEFAULT_MAX_NUM_CHARS,
    encode_minimal,
    query_terms_for_field,
    search_fragments,
    snippet_html,
    snippets_for_value,
    term_scores,
    validate_snippet_fields,
    with_snippet_column,
)


# ---------------------------------------------------------------------------
# pure-kernel vectors
# ---------------------------------------------------------------------------


def test_encode_minimal_five_entities():
    assert (
        encode_minimal("""a & b < c > d " e ' f""")
        == "a &amp; b &lt; c &gt; d &quot; e &#x27; f"
    )
    # & escapes first so entities never double-escape
    assert encode_minimal("&lt;") == "&amp;lt;"


def test_short_text_single_fragment():
    assert (
        snippet_html("the fast key order", {"fast": 0.5})
        == "the <b>fast</b> key order"
    )


def test_trailing_punctuation_outside_fragment():
    # fragment stop = last token's end offset, so trailing punctuation is cut
    assert snippet_html("hello world!!", {"world": 0.5}) == "hello <b>world</b>"


def test_leading_chars_kept_first_fragment_starts_at_zero():
    # the first FragmentCandidate starts at byte 0 regardless of where the
    # first token begins
    assert snippet_html("  ...hello world", {"world": 0.5}) == "  ...hello <b>world</b>"


def test_all_occurrences_highlighted():
    assert (
        snippet_html("cat dog cat", {"cat": 0.5})
        == "<b>cat</b> dog <b>cat</b>"
    )


def test_case_insensitive_token_match_original_case_kept():
    # terms are analyzed (lowercase); the ORIGINAL casing appears in the html
    assert snippet_html("Hello World", {"world": 0.5}) == "Hello <b>World</b>"


def test_no_match_empty_snippet():
    assert snippet_html("nothing here", {"absent": 0.5}) == ""
    assert snippet_html(None, {"x": 0.5}) == ""
    assert snippet_html("text", {}) == ""


def test_escaping_inside_and_outside_highlights():
    assert (
        snippet_html("a<b> match & done", {"match": 0.5})
        == "a&lt;b&gt; <b>match</b> &amp; done"
    )


def test_fragment_window_selects_highest_score():
    # two windows of < 150 bytes each; the second contains the term twice →
    # higher score → selected
    first = "alpha beta gamma " * 5  # 85 chars, one 'target' absent
    second = "target filler target"
    text = first + "x" * (150 - len(first)) + " " + second
    out = snippet_html(text, {"target": 0.4})
    assert out == "<b>target</b> filler <b>target</b>"


def test_tie_goes_to_earliest_fragment():
    # same score in both windows → earliest fragment wins
    pad = "w" * 148
    text = "early target here " + pad + " late target there"
    out = snippet_html(text, {"target": 0.4})
    assert out.startswith("early <b>target</b>")


def test_rare_term_outranks_common_term():
    # scores mirror 1/(1+df): the rare term's fragment wins even though the
    # common term appears twice in its own fragment
    pad = "p" * 148
    text = "common common here " + pad + " rare word"
    scores = {"common": 0.1, "rare": 0.5}
    assert snippet_html(text, scores) == "<b>rare</b> word"


def test_multibyte_window_measured_in_bytes():
    # 'é' is 2 bytes in utf-8: 50 é-tokens + 49 spaces = 99 chars but 149
    # bytes, so ' match' (ending at byte 155) overflows the 150-BYTE window
    # even though the text is only ~109 chars
    tokens = ["é" * 1 for _ in range(50)]  # 50 chars + 49 spaces = 99 chars
    text = " ".join(tokens) + " match end"  # é section = 149 bytes
    out = snippet_html(text, {"match": 0.5})
    # the é prefix is 149 bytes; ' match' would end at byte 155 > 150 → the
    # match lands in a SECOND fragment starting at its own offset
    assert out == "<b>match</b> end"


def test_long_token_removed_by_remove_long_filter():
    long_tok = "z" * 300
    text = f"start {long_tok} match"
    # the 300-char token is dropped from the stream (never matched, never
    # extends a fragment), but its BYTES still push `match` past the 150-byte
    # window of the fragment that started at 0 → match opens its own fragment
    assert snippet_html(text, {"match": 0.5}) == "<b>match</b>"
    # and the long token can never match a term
    assert snippet_html(text, {long_tok: 0.5}) == ""


def test_single_token_longer_than_window_is_its_own_fragment():
    tok = "y" * 200  # longer than the 150-byte window but under 255
    text = f"{tok} tail match"
    out = snippet_html(text, {"y" * 200: 0.5})
    assert out == f"<b>{tok}</b>"


def test_fragments_have_byte_offsets_and_scores():
    frags = search_fragments("a match b", {"match": 0.25})
    assert len(frags) == 1
    assert frags[0].score == pytest.approx(0.25)
    # stop = end offset of the LAST token seen ('b'), not the last match
    assert frags[0].start == 0 and frags[0].stop == len("a match b")
    assert frags[0].highlighted == [(2, 7)]


def test_multi_value_field_empties_dropped():
    vals = ["no hit here", "a match", None, 7]
    assert snippets_for_value(vals, {"match": 0.5}) == ["a <b>match</b>"]
    assert snippets_for_value("a match", {"match": 0.5}) == ["a <b>match</b>"]
    assert snippets_for_value("nothing", {"match": 0.5}) == []


# ---------------------------------------------------------------------------
# query-term extraction
# ---------------------------------------------------------------------------


def test_query_terms_from_term_and_fulltext():
    ast = parse_query("text:fast AND text:(key order)", default_fields=("text",))
    assert set(query_terms_for_field(ast, "text")) == {"fast", "key", "order"}
    assert query_terms_for_field(ast, "other") == []


def test_query_terms_phrase_and_termset():
    ast = parse_query('text:"slow merge" OR text:IN [a b]', default_fields=("text",))
    assert set(query_terms_for_field(ast, "text")) == {"slow", "merge", "a", "b"}


def test_query_terms_automaton_queries_contribute_none():
    ast = parse_query("text:fa*t AND n:[1 TO 5] AND text:other", ("text",))
    assert query_terms_for_field(ast, "text") == ["other"]


def test_validate_snippet_fields():
    types = {"text": "text", "n": "i64"}
    validate_snippet_fields(["text"], types)
    with pytest.raises(ValueError, match="must be of type `Str`"):
        validate_snippet_fields(["n"], types)
    with pytest.raises(ValueError, match="not declared"):
        validate_snippet_fields(["ghost"], types)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def test_term_scores_one_over_one_plus_df(spark):
    df = spark.createDataFrame(
        [("a match here",), ("match again",), ("no hit",), (None,)],
        "text string",
    )
    scores = term_scores(df, "text", ["match", "here", "ghost"])
    assert scores == {"match": 1.0 / 3.0, "here": 0.5}  # df=2, df=1; ghost dropped


def test_with_snippet_column_matches_driver_kernel(spark):
    rows = [
        ("the fast key order sort table",),
        ("slow window merge fast fast",),
        ("nothing relevant",),
        (None,),
    ]
    df = spark.createDataFrame(rows, "text string")
    out = with_snippet_column(df, "text", "text:fast").orderBy("text").collect()
    got = {r["text"]: r["snippet"] for r in out}
    scores = term_scores(df, "text", ["fast"])
    for (t,) in rows:
        if t is not None:
            assert got[t] == snippet_html(t, scores)
    assert got["slow window merge fast fast"] == (
        "slow window merge <b>fast</b> <b>fast</b>"
    )
    assert got["nothing relevant"] == ""


def test_quickwit_search_native_response_with_snippets(spark):
    from quickwit_spark.api import quickwit_search

    df = spark.createDataFrame(
        [
            ("c1", 0, "user", "please sort the table fast", "t", 100.0),
            ("c1", 1, "assistant", "sorting the table now", "t", 101.0),
            ("c2", 0, "user", "fast fast results wanted", "t", 102.0),
            ("c2", 1, "assistant", "no relevant content", "t", 103.0),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts double",
    )
    resp = quickwit_search(
        df,
        {"query": "text:fast", "snippet_fields": "text", "max_hits": 10},
        field_types={"text": "text", "role": "raw"},
        default_fields=("text",),
    )
    assert resp["num_hits"] == 2
    assert resp["errors"] == []
    assert len(resp["hits"]) == 2 and len(resp["snippets"]) == 2
    # default sort (no sort_by): newest-first, the reference's reverse
    # split/doc order on time-ordered data
    assert [h["ts"] for h in resp["hits"]] == [102.0, 100.0]
    # fast: df=2 → score 1/3 each; snippets parallel to hits
    assert resp["snippets"][0] == {"text": ["<b>fast</b> <b>fast</b> results wanted"]}
    assert resp["snippets"][1] == {"text": ["please sort the table <b>fast</b>"]}


def test_quickwit_search_sort_mini_dsl_and_paging(spark):
    from quickwit_spark.api import quickwit_search

    df = spark.createDataFrame(
        [(i, f"doc {i} term", float(i)) for i in range(7)],
        "id int, text string, ts double",
    )
    common = dict(field_types={"text": "text"}, default_fields=("text",))
    # BARE field name = DESCENDING (rest_handler.rs:93-119 — the reference's
    # mini-DSL maps bare and '+' to Desc, '-' to Asc)
    resp = quickwit_search(df, {"query": "term", "sort_by": "id", "max_hits": 3}, **common)
    assert [h["id"] for h in resp["hits"]] == [6, 5, 4]
    resp = quickwit_search(df, {"query": "term", "sort_by": "-id", "max_hits": 3}, **common)
    assert [h["id"] for h in resp["hits"]] == [0, 1, 2]
    resp = quickwit_search(
        df, {"query": "term", "sort_by": "-id", "max_hits": 2, "start_offset": 2}, **common
    )
    assert [h["id"] for h in resp["hits"]] == [2, 3]
    assert resp["num_hits"] == 7


def test_quickwit_search_timestamp_bounds(spark):
    from quickwit_spark.api import quickwit_search

    df = spark.createDataFrame(
        [(i, "hit term", float(100 + i)) for i in range(10)],
        "id int, text string, ts double",
    )
    resp = quickwit_search(
        df,
        # start inclusive, end EXCLUSIVE (SearchRequestQueryString docs)
        {"query": "term", "start_timestamp": 103, "end_timestamp": 106, "sort_by": "-id"},
        field_types={"text": "text"},
        default_fields=("text",),
    )
    assert [h["id"] for h in resp["hits"]] == [3, 4, 5]


def test_quickwit_search_rejects_non_text_snippet_field(spark):
    from quickwit_spark.api import quickwit_search

    df = spark.createDataFrame([(1, "x", 1.0)], "id int, text string, ts double")
    with pytest.raises(ValueError, match="must be of type `Str`"):
        quickwit_search(
            df,
            {"query": "*", "snippet_fields": ["id"]},
            field_types={"text": "text", "id": "i64"},
        )
