"""Quickwit's built-in tokenizers as JVM-side Column expressions.

Behavior from quickwit-query/src/tokenizers/mod.rs:35-110 (studied for
behavior): ``raw`` (whole value, one token), ``raw_lowercase``, ``lowercase``
(like raw but lowercased... actually per-token lowercase of raw), ``default``
(simple word split on non-alphanumerics + lowercase + 255-char token cap),
``whitespace``, ``source_code_default`` (split camelCase/snake_case-ish
boundaries + lowercase), plus user ``regex`` and ``ngram`` tokenizers.

All are pure `pyspark.sql.functions` compositions — they run inside
WholeStageCodegen; no Python. Each returns an ``array<string>`` Column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _drop_empty(arr: Column) -> Column:
    return F.filter(arr, lambda t: (t.isNotNull()) & (F.length(t) > 0))


def tokenize_default(col: Column) -> Column:
    """Simple tokenizer: split on non-alphanumerics, lowercase, drop tokens
    longer than 255 chars (the reference's RemoveLongFilter cap)."""
    toks = F.split(F.lower(col), r"[^\p{L}\p{N}]+")
    return F.filter(_drop_empty(toks), lambda t: F.length(t) <= 255)


def tokenize_raw(col: Column) -> Column:
    """One token = the whole value (255-char... reference raw cap applies to
    ridiculous values; we keep the whole string)."""
    return F.when(col.isNotNull(), F.array(col)).otherwise(F.array().cast("array<string>"))


def tokenize_raw_lowercase(col: Column) -> Column:
    return F.when(col.isNotNull(), F.array(F.lower(col))).otherwise(
        F.array().cast("array<string>")
    )


def tokenize_whitespace(col: Column) -> Column:
    return _drop_empty(F.split(col, r"\s+"))


def tokenize_source_code(col: Column) -> Column:
    """Split identifiers: snake_case, kebab, camelCase boundaries, then
    lowercase — approximates the reference's code tokenizer."""
    spaced = F.regexp_replace(col, r"([a-z0-9])([A-Z])", r"$1 $2")
    toks = F.split(F.lower(spaced), r"[^\p{L}\p{N}]+")
    return _drop_empty(toks)


def tokenize_regex(col: Column, pattern: str) -> Column:
    """User-defined regex tokenizer: emit all matches of ``pattern``."""
    return F.regexp_extract_all(col, F.lit(pattern), 0)


def tokenize_ngram(col: Column, min_gram: int = 2, max_gram: int = 3, lowercase: bool = True) -> Column:
    """Character n-grams of the value (for substring-ish search)."""
    base = F.lower(col) if lowercase else col
    n = F.length(base)
    out = None
    for g in range(min_gram, max_gram + 1):
        idx = F.sequence(F.lit(1), F.greatest(n - F.lit(g - 1), F.lit(0)))
        part = F.transform(idx, lambda i, _g=g: base.substr(i, F.lit(_g)))
        out = part if out is None else F.concat(out, part)
    return F.when(col.isNotNull(), out).otherwise(F.array().cast("array<string>"))


TOKENIZERS = {
    "default": tokenize_default,
    "raw": tokenize_raw,
    "raw_lowercase": tokenize_raw_lowercase,
    "lowercase": tokenize_raw_lowercase,
    "whitespace": tokenize_whitespace,
    "source_code_default": tokenize_source_code,
}
