"""Snippet generation for ``snippet_fields`` — tantivy-faithful highlighting.

Behavioral contracts studied (reference is Rust; this is an original
re-expression over Spark frames):

- quickwit-search/src/root.rs:321-345  validate_requested_snippet_fields:
  a snippet field must exist, be of type ``Str`` and be stored.
- quickwit-search/src/root.rs:892-900  get_snippet_request: only set when
  snippet_fields is non-empty; carries the resolved query AST.
- quickwit-search/src/fetch_docs.rs:314-341  create_snippet_generator:
  collect the query's terms for the field, score each term
  ``1.0 / (1.0 + doc_freq)`` (terms with doc_freq == 0 dropped), tokenize
  with the field's indexing tokenizer.
- quickwit-search/src/fetch_docs.rs:255-285  snippets_from_field_values:
  one snippet per stored field value, EMPTY snippets dropped; the response
  maps every requested field to its (possibly empty) list of HTML strings.
- tantivy's public snippet module (tantivy/src/snippet/mod.rs — MIT):
  * search_fragments: stream tokens; a fragment closes when the next
    token's end offset exceeds ``start_offset + max_num_chars`` (byte
    offsets); only fragments with score > 0 are kept; every token extends
    the fragment's stop offset, matched tokens add the term score and a
    highlight span.
  * select_best_fragment_combination: highest score wins; ties go to the
    EARLIEST fragment (smallest (start, stop)).
  * to_html: ``<b>``/``</b>`` around highlight spans, all pieces escaped
    with htmlescape::encode_minimal (& < > " ' → &amp; &lt; &gt; &quot;
    &#x27;).
  * DEFAULT_MAX_NUM_CHARS = 150 (quickwit never overrides it).

Scale notes: term doc-freqs are ONE global aggregate over the corpus frame
(no shuffle — partial counts merge on the driver); snippet HTML itself is
only ever computed for fetched hits (page-sized, like the reference's
fetch-docs phase) or via :func:`with_snippet_column`, an Arrow-batched
kernel with the term table broadcast in the closure — the text column never
shuffles.
"""

from __future__ import annotations

import re
from typing import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_NUM_CHARS = 150

# driver/worker-side analog of tokenizers.tokenize_default ([^\p{L}\p{N}]+
# split + lowercase + RemoveLongFilter(255)); offsets are into the ORIGINAL
# text, as tantivy's token stream reports them
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

_ESCAPES = (
    ("&", "&amp;"),  # must run first
    ("<", "&lt;"),
    (">", "&gt;"),
    ('"', "&quot;"),
    ("'", "&#x27;"),
)


def encode_minimal(text: str) -> str:
    """htmlescape::encode_minimal's 5-entity escape set."""
    for ch, ent in _ESCAPES:
        text = text.replace(ch, ent)
    return text


def analyze(text: str) -> list[str]:
    """Driver-side default-tokenizer analysis (lowercased token texts)."""
    return [
        m.group(0).lower()
        for m in _TOKEN_RE.finditer(text)
        if len(m.group(0).encode("utf-8")) <= 255
    ]


def query_terms_for_field(ast, field: str) -> list[str]:
    """The query's analyzed terms targeting ``field`` — the tantivy
    ``Query::query_terms`` walk (fetch_docs.rs:319-327): Term/TermSet/
    FullText/Phrase/PhrasePrefix contribute their analyzed tokens; automaton
    queries (Wildcard, Regex, Range, Exists) contribute none; Bool walks
    every clause list (tantivy visits must_not too)."""
    from quickwit_spark.operators.query import (
        Bool,
        FullText,
        Phrase,
        PhrasePrefix,
        Term,
        TermSet,
    )

    out: list[str] = []

    def walk(node) -> None:
        if isinstance(node, Bool):
            for clause in (*node.must, *node.should, *node.filter, *node.must_not):
                walk(clause)
        elif isinstance(node, Term) and node.field == field:
            out.extend(analyze(node.value) if node.analyzed else [str(node.value)])
        elif isinstance(node, TermSet) and node.field == field:
            for v in node.values:
                out.extend(analyze(v) if node.analyzed else [str(v)])
        elif isinstance(node, (FullText, Phrase, PhrasePrefix)) and node.field == field:
            out.extend(analyze(node.text))

    walk(ast)
    # BTreeMap semantics: dedupe, order irrelevant (scores keyed by text)
    seen: dict[str, None] = {}
    for t in out:
        seen.setdefault(t, None)
    return list(seen)


def term_scores(df: DataFrame, field: str, terms: Iterable[str]) -> dict[str, float]:
    """``term → 1/(1 + doc_freq)`` over ``df`` (fetch_docs.rs:330-337);
    terms absent from the corpus are dropped (doc_freq == 0).

    ONE job, ONE scan, no shuffle: per-term doc counts are conditional sums
    in a single global aggregate. The reference computes doc_freq per split
    from the term dictionary; here the queried frame IS the (merged) split
    view, so frequencies match the single-split case exactly."""
    from quickwit_spark.functions.tokenizers import tokenize_default

    terms = list(dict.fromkeys(terms))
    if not terms:
        return {}
    toks = tokenize_default(F.col(field))
    row = df.agg(
        *[
            F.sum(F.array_contains(toks, t).cast("long")).alias(f"t{i}")
            for i, t in enumerate(terms)
        ]
    ).first()
    return {
        t: 1.0 / (1.0 + float(row[f"t{i}"]))
        for i, t in enumerate(terms)
        if row[f"t{i}"]
    }


class _Fragment:
    __slots__ = ("start", "stop", "score", "highlighted", "char_range", "char_spans")

    def __init__(self, start: int) -> None:
        self.start = start  # byte offset (tantivy offsets are byte-based)
        self.stop = start
        self.score = 0.0
        self.highlighted: list[tuple[int, int]] = []


def _byte_offsets(text: str):
    """char-index → byte-offset mapping; identity for ASCII (fast path)."""
    if text.isascii():
        return None  # identity
    offsets = [0]
    for ch in text:
        offsets.append(offsets[-1] + len(ch.encode("utf-8")))
    return offsets


def search_fragments(
    text: str,
    terms: Mapping[str, float],
    max_num_chars: int = DEFAULT_MAX_NUM_CHARS,
) -> list[_Fragment]:
    """tantivy search_fragments: one pass over the token stream; windows are
    measured in BYTES of the original text; a fragment is kept only if it
    matched at least one scored term."""
    byte_of = _byte_offsets(text)

    def b(i: int) -> int:
        return i if byte_of is None else byte_of[i]

    fragments: list[_Fragment] = []
    frag = _Fragment(0)
    frag_char_start = 0
    char_end = 0
    char_spans: list[tuple[int, int]] = []  # highlight char spans, this frag
    for m in _TOKEN_RE.finditer(text):
        tok = m.group(0)
        tok_lower = tok.lower()
        if len(tok.encode("utf-8")) > 255:  # RemoveLongFilter: not emitted
            continue
        c_from, c_to = m.start(), m.end()
        if b(c_to) - frag.start > max_num_chars:
            if frag.score > 0.0:
                frag.char_range = (frag_char_start, char_end)  # type: ignore[attr-defined]
                frag.char_spans = char_spans  # type: ignore[attr-defined]
                fragments.append(frag)
            frag = _Fragment(b(c_from))
            frag_char_start = c_from
            char_spans = []
        frag.stop = b(c_to)
        char_end = c_to
        score = terms.get(tok_lower)
        if score is not None:
            frag.score += score
            frag.highlighted.append((b(c_from), b(c_to)))
            char_spans.append((c_from, c_to))
    if frag.score > 0.0:
        frag.char_range = (frag_char_start, char_end)  # type: ignore[attr-defined]
        frag.char_spans = char_spans  # type: ignore[attr-defined]
        fragments.append(frag)
    return fragments


def snippet_html(
    text: str | None,
    terms: Mapping[str, float],
    max_num_chars: int = DEFAULT_MAX_NUM_CHARS,
) -> str:
    """Best fragment → escaped HTML with ``<b>`` highlights; '' when no
    fragment scored (tantivy Snippet::empty().to_html())."""
    if text is None or not terms:
        return ""
    fragments = search_fragments(text, terms, max_num_chars)
    if not fragments:
        return ""
    # max score, ties → earliest (smallest (start, stop)): fetch_docs.rs /
    # tantivy select_best_fragment_combination
    best = max(fragments, key=lambda f: (f.score, (-f.start, -f.stop)))
    c_start, c_end = best.char_range  # type: ignore[attr-defined]
    html: list[str] = []
    cursor = c_start
    for s, e in best.char_spans:  # type: ignore[attr-defined]
        html.append(encode_minimal(text[cursor:s]))
        html.append("<b>")
        html.append(encode_minimal(text[s:e]))
        html.append("</b>")
        cursor = e
    html.append(encode_minimal(text[cursor:c_end]))
    return "".join(html)


def snippets_for_value(
    value,
    terms: Mapping[str, float],
    max_num_chars: int = DEFAULT_MAX_NUM_CHARS,
) -> list[str]:
    """Stored field value (scalar or list) → non-empty snippet HTMLs
    (fetch_docs.rs:269-281: one snippet per value, empties filtered)."""
    values = value if isinstance(value, (list, tuple)) else [value]
    out = []
    for v in values:
        if isinstance(v, str):
            s = snippet_html(v, terms, max_num_chars)
            if s:
                out.append(s)
    return out


def validate_snippet_fields(
    snippet_fields: Iterable[str], field_types: Mapping[str, str] | None
) -> None:
    """root.rs:321-345: snippet fields must be Str-typed (and stored — every
    column of a Spark frame is readable, which is the stored contract
    here)."""
    for f in snippet_fields:
        kind = (field_types or {}).get(f)
        if kind is None:
            raise ValueError(f"the field `{f}` is not declared in the doc mapping")
        if kind != "text":
            raise ValueError(
                f"the snippet field `{f}` must be of type `Str`, got `{kind}`"
            )


def with_snippet_column(
    df: DataFrame,
    field: str,
    query: str | None = None,
    *,
    ast=None,
    default_fields: tuple[str, ...] = (),
    out_col: str = "snippet",
    max_num_chars: int = DEFAULT_MAX_NUM_CHARS,
    scores: Mapping[str, float] | None = None,
) -> DataFrame:
    """Distributed variant: append a snippet-HTML column for ``field``
    driven by ``query`` (query-language string) or a pre-parsed ``ast``.

    Two Spark jobs total: the doc-freq aggregate (one scan, no shuffle) and
    the main plan, where the kernel is one Arrow-batched pandas UDF with the
    (tiny) term-score table captured in the closure — at 10^12 rows the text
    column streams through executors without shuffling."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from quickwit_spark.operators.query import parse_query

    if ast is None:
        if query is None:
            raise ValueError("either query or ast is required")
        ast = parse_query(query, default_fields=default_fields or (field,))
    terms = query_terms_for_field(ast, field)
    tscores = dict(scores) if scores is not None else term_scores(df, field, terms)

    def _snip(col: pd.Series) -> pd.Series:
        return col.map(lambda t: snippet_html(t, tscores, max_num_chars))

    _snip.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return df.withColumn(out_col, pandas_udf(_snip, "string")(F.col(field)))
