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


_CJK = r"[\p{IsHan}\p{IsHiragana}\p{IsKatakana}\p{IsHangul}]"


def tokenize_chinese_compatible(col: Column) -> Column:
    """chinese_compatible (tokenizers/mod.rs:35-110 behavior): every CJK
    codepoint becomes its own token; non-CJK runs tokenize like `default`
    (lowercase + 255 cap). Implemented by spacing out CJK chars JVM-side."""
    spaced = F.regexp_replace(col, f"({_CJK})", " $1 ")
    return tokenize_default(spaced)


def _build_fold_table() -> tuple[str, str]:
    """1:1 fold pairs for Latin-1 Supplement + Latin Extended-A, derived from
    NFD decomposition (strip combining marks) — guaranteed equal-length
    translate strings — plus the non-decomposable strokes (ø, đ, ħ, ł, ŧ)."""
    import unicodedata

    src, dst = [], []
    for cp in range(0xC0, 0x180):
        ch = chr(cp)
        decomp = unicodedata.normalize("NFD", ch)
        base = "".join(c for c in decomp if not unicodedata.combining(c))
        if base != ch and len(base) == 1 and ord(base) < 128:
            src.append(ch)
            dst.append(base)
    for s, d in zip("øØđĐðÐħĦłŁŧŦıſ", "oOdDdDhHlLtTis"):
        src.append(s)
        dst.append(d)
    return "".join(src), "".join(dst)


_FOLD_SRC, _FOLD_DST = _build_fold_table()


def fold_ascii_col(col: Column) -> Column:
    """ASCII-folding normalization (tantivy AsciiFoldingFilter behavior for
    the Latin-1/Latin-A range): accented chars → ASCII base, plus the 1→2
    expansions (æ→ae, œ→oe, ß→ss). Pure translate/regexp_replace chain."""
    out = F.regexp_replace(col, "æ", "ae")
    out = F.regexp_replace(out, "Æ", "AE")
    out = F.regexp_replace(out, "œ", "oe")
    out = F.regexp_replace(out, "Œ", "OE")
    out = F.regexp_replace(out, "ß", "ss")
    return F.translate(out, _FOLD_SRC, _FOLD_DST)


def tokenize_ascii_folding(col: Column) -> Column:
    """`default` tokenizer + ASCII folding filter: café ≡ cafe."""
    return tokenize_default(fold_ascii_col(col))


def tokenize_multilang(col: Column) -> Column:
    """multilang tokenizer: per-value language dispatch — values containing
    CJK take the chinese_compatible path, everything else the default path
    (the reference detects language per document and picks the tokenizer)."""
    return F.when(
        col.rlike(_CJK), tokenize_chinese_compatible(col)
    ).otherwise(tokenize_default(col))


TOKENIZERS.update(
    {
        "chinese_compatible": tokenize_chinese_compatible,
        "ascii_folding": tokenize_ascii_folding,
        "multilang": tokenize_multilang,
    }
)


def tokenize_source_code_hex(col: Column) -> Column:
    """source_code_with_hex (tokenizers/mod.rs:35-110): like
    `source_code_default`, but a hexadecimal run (≥8 hex digits, optionally
    0x-prefixed) stays ONE token instead of splitting on its internal
    case/boundary changes — addresses/hashes in stack traces stay findable.
    """
    words = F.split(col, r"\s+")
    per_word = F.transform(
        words,
        lambda w: F.when(
            w.rlike(r"^(0x)?[0-9a-fA-F]{8,}$"), F.array(F.lower(w))
        ).otherwise(
            F.split(
                F.lower(F.regexp_replace(w, r"([a-z0-9])([A-Z])", r"$1 $2")),
                r"[^\p{L}\p{N}]+",
            )
        ),
    )
    return _drop_empty(F.flatten(per_word))


TOKENIZERS["source_code_with_hex"] = tokenize_source_code_hex
