"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting. All JVM Column compositions except
the language-ID n-gram scorer (Arrow-vectorized pandas UDF)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def token_count_col(col: Column) -> Column:
    """Whitespace token count."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def word_token_count_col(col: Column) -> Column:
    """BPE-ish token estimate: word pieces + digits + punctuation runs."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"), 0))


def quality_features(col: Column) -> list[Column]:
    """Length / punctuation / stopword-ratio quality features (the classic
    cheap filters for web-scale corpus cleaning)."""
    n_chars = F.length(col)
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    n_toks = F.size(toks)
    stop = F.array(*[F.lit(w) for w in (
        "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "for", "on", "with",
    )])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_punct = F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), 0))
    mean_word_len = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    return [
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_toks, F.lit(1)), 6).alias("stopword_ratio"),
    ]


def quality_score_col(col: Column) -> Column:
    """Composite quality score in [0,1]: penalize too-short docs, extreme
    punctuation, vanishing stopword ratio (gibberish indicator)."""
    feats = dict(zip(
        ("n_chars", "n_tokens", "mean_word_len", "punct_ratio", "stopword_ratio"),
        quality_features(col),
    ))
    len_ok = F.least(feats["n_tokens"] / F.lit(20.0), F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(feats["punct_ratio"] * 5.0, F.lit(1.0))
    stop_ok = F.least(feats["stopword_ratio"] * 4.0, F.lit(1.0))
    return F.round((len_ok + punct_ok + stop_ok) / 3.0, 6)


def fingerprint_col(col: Column, window: int = 8) -> Column:
    """Rolling-hash document fingerprint: min xxhash64 over sliding windows
    of ``window`` tokens (winnowing-style; stable under small edits at the
    ends). Pure Column ops."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    n = F.greatest(F.size(toks) - F.lit(window - 1), F.lit(1))
    windows = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, window))),
    )
    return F.array_min(windows)


# language ID: character-trigram profiles for a few languages (tiny
# public-knowledge profiles: most frequent trigrams per language)
_LANG_PROFILES = {
    "en": (" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", "ng "),
    "de": ("en ", "er ", " de", "der", "ie ", " di", "die", "ch ", "sch", "ein"),
    "fr": (" de", "de ", " le", "es ", "le ", "ent", " la", "la ", "ion", "aux"),
    "es": (" de", "de ", " la", "la ", "os ", " el", "el ", "ción", "ado", " qu"),
    "it": (" di", "di ", " il", "il ", "che", " ch", "to ", "la ", "zion", "gli"),
    "pt": (" de", "de ", " e ", "ão ", "os ", "ção", " qu", "em ", "da ", " da"),
    "nl": ("en ", " de", "de ", "et ", " he", "het", "van", " va", "aar", "ij "),
    "id": ("ang", "an ", " me", "kan", " di", "nya", " ya", "yang", " be", "ber"),
    "tr": ("lar", "ler", " bi", "bir", "ın ", "an ", " ka", "da ", " ve", "ve "),
    "sv": ("en ", " de", "et ", "om ", " oc", "och", "ch ", "för", " fö", "att"),
}

# script-based fast paths: a dominant non-Latin script decides the language
# family before any trigram scoring (cheap and far more reliable)
_SCRIPT_RANGES = (
    ("zh", 0x4E00, 0x9FFF),
    ("ja", 0x3040, 0x30FF),   # hiragana/katakana (checked before han)
    ("ko", 0xAC00, 0xD7AF),
    ("ru", 0x0400, 0x04FF),
    ("ar", 0x0600, 0x06FF),
    ("he", 0x0590, 0x05FF),
    ("el", 0x0370, 0x03FF),
    ("th", 0x0E00, 0x0E7F),
    ("hi", 0x0900, 0x097F),
)


_SCRIPT_LANGS = tuple(lang for lang, _, _ in _SCRIPT_RANGES)


def _script_guess(s: str) -> str | None:
    """Scalar reference for :func:`_script_guess_batch` (parity tests)."""
    counts: dict[str, int] = {}
    n_alpha = 0
    for ch in s:
        if not ch.isalpha():
            continue
        n_alpha += 1
        cp = ord(ch)
        for lang, lo, hi in _SCRIPT_RANGES:
            if lo <= cp <= hi:
                counts[lang] = counts.get(lang, 0) + 1
                break
    if not counts or n_alpha == 0:
        return None
    best = max(counts, key=lambda k: counts[k])
    if counts[best] * 3 >= n_alpha:  # ≥1/3 of letters in one script
        # han chars inside ja text: kana presence wins
        if best == "zh" and counts.get("ja", 0) > 0:
            return "ja"
        return best
    return None


_CP_TABLES = None


def _cp_tables():
    """Cached full-codepoint lookup tables (one ~1 MB gather per property
    replaces any per-character or sort-based classification):

    - alpha:    bool[0x110000] — exact ``str.isalpha`` semantics
    - script:   int8[0x110000] — index into _SCRIPT_RANGES, -1 = none
    - alphabet: uint8[0x110000] — 1-based index into the profile-gram
      alphabet, 0 = not in any gram (so separators/other chars can never
      complete a gram code)
    Built once per worker (~0.5 s), then every batch is pure gathers."""
    global _CP_TABLES
    if _CP_TABLES is None:
        import sys

        size = sys.maxunicode + 1
        alpha = np.zeros(size, dtype=bool)
        # str of ALL codepoints → one C-level isalpha sweep per 64k block
        for lo in range(0, size, 1 << 16):
            hi = min(lo + (1 << 16), size)
            block = "".join(map(chr, range(lo, hi)))
            alpha[lo:hi] = np.frombuffer(
                bytes(ch.isalpha() for ch in block), dtype=bool
            )
        script = np.full(size, -1, dtype=np.int8)
        for si, (_, rlo, rhi) in enumerate(_SCRIPT_RANGES):
            script[rlo: rhi + 1] = si
        chars = sorted({c for grams in _LANG_PROFILES.values() for g in grams for c in g})
        alphabet = np.zeros(size, dtype=np.uint8)
        for i, c in enumerate(chars):
            alphabet[ord(c)] = i + 1
        _CP_TABLES = (alpha, script, alphabet, chars)
    return _CP_TABLES


def _script_guess_batch(cps: np.ndarray, row_idx: np.ndarray, n: int) -> np.ndarray:
    """Vectorized script detection: table gathers + one bincount per
    property over the batch codepoint array. Matches :func:`_script_guess`
    except on exact inter-script count ties (broken by range order here,
    by first occurrence there — unreachable for real text)."""
    alpha_t, script_t, _, _ = _cp_tables()
    alpha = alpha_t[cps]
    script = script_t[cps].astype(np.int64)
    n_alpha = np.bincount(row_idx[alpha], minlength=n)
    m = alpha & (script >= 0)
    S = len(_SCRIPT_RANGES)
    counts = np.bincount(row_idx[m] * S + script[m], minlength=n * S).reshape(n, S)
    best = counts.argmax(axis=1)
    best_cnt = counts[np.arange(n), best]
    ja_ix, zh_ix = _SCRIPT_LANGS.index("ja"), _SCRIPT_LANGS.index("zh")
    best = np.where((best == zh_ix) & (counts[:, ja_ix] > 0), ja_ix, best)
    ok = (best_cnt > 0) & (best_cnt * 3 >= n_alpha)
    out = np.full(n, None, dtype=object)
    langs = np.array(_SCRIPT_LANGS, dtype=object)
    out[ok] = langs[best[ok]]
    return out


def _count_overlapping(s: str, g: str) -> int:
    n, i = 0, s.find(g)
    while i != -1:
        n += 1
        i = s.find(g, i + 1)
    return n


def _lang_id_scalar(texts) -> list:
    """Row-at-a-time reference implementation (parity tests only).

    Gram occurrences count OVERLAPPING positions (the standard n-gram
    profile method) — matches the sliding-window counts of the vectorized
    :func:`lang_id_udf`."""
    out = []
    for t in texts:
        if t is None or len(t) < 6:
            out.append(None)
            continue
        s = f" {t.lower()} "
        script = _script_guess(s)
        if script is not None:
            out.append(script)
            continue
        scores = {}
        for lang, grams in _LANG_PROFILES.items():
            scores[lang] = sum(_count_overlapping(s, g) for g in grams)
        best = max(scores, key=lambda k: (scores[k], k))
        out.append(best if scores[best] > 0 else "unknown")
    return out


_GRAM_TABLES = None


def _gram_tables():
    """Cached profile-gram encoding: every profile gram maps to a base-A
    integer code over the tiny alphabet of characters appearing in any gram
    (index 0 = every other character, so windows containing out-of-alphabet
    chars or row separators can never collide with a gram code). Codes are
    DEDUPED across languages — a shared gram like " de" credits every
    profile containing it via the (codes × langs) membership matrix."""
    global _GRAM_TABLES
    if _GRAM_TABLES is None:
        langs = sorted(_LANG_PROFILES)
        chars = sorted({c for grams in _LANG_PROFILES.values() for g in grams for c in g})
        cmap = {c: i + 1 for i, c in enumerate(chars)}
        A = len(chars) + 1
        by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for L in sorted({len(g) for grams in _LANG_PROFILES.values() for g in grams}):
            code_langs: dict[int, set[int]] = {}
            for j, lang in enumerate(langs):
                for g in _LANG_PROFILES[lang]:
                    if len(g) != L:
                        continue
                    code = 0
                    for c in g:
                        code = code * A + cmap[c]
                    code_langs.setdefault(code, set()).add(j)
            codes = np.array(sorted(code_langs), dtype=np.int32)
            member = np.zeros((len(codes), len(langs)), dtype=np.float64)
            for ci, code in enumerate(codes):
                for j in code_langs[code]:
                    member[ci, j] = 1
            by_len[L] = (codes, member)
        _GRAM_TABLES = (langs, A, by_len)
    return _GRAM_TABLES


@F.pandas_udf(T.StringType())
def lang_id_udf(texts: pd.Series) -> pd.Series:
    """Heuristic n-gram language ID — fully vectorized per Arrow batch.

    ONE utf-32 decode of the concatenated batch feeds both passes: script
    detection classifies UNIQUE codepoints (never per character) and
    bincounts per (row, script); profile scoring base-A-encodes every
    sliding 3/4-char window and bincounts per (row, gram) — Python loops
    only over script ranges and gram lengths, never rows/chars/grams.
    Output parity with :func:`_lang_id_scalar` is pytest-enforced.
    """
    n = len(texts)
    res = np.full(n, None, dtype=object)
    lens = texts.str.len().fillna(0).to_numpy()
    pos = np.flatnonzero(texts.notna().to_numpy() & (lens >= 6))
    if len(pos) == 0:
        return pd.Series(res)
    lowered = (" " + texts.iloc[pos].str.lower() + " ").tolist()
    nv = len(lowered)
    vlens = np.fromiter((len(v) for v in lowered), dtype=np.int64, count=nv)
    # ONE utf-32 decode; '\n' terminators are non-alpha and outside the gram
    # alphabet, so windows spanning two rows can never score
    cps = np.frombuffer(
        ("".join(v + "\n" for v in lowered)).encode("utf-32-le"), dtype=np.uint32
    )
    row_idx = np.repeat(np.arange(nv), vlens + 1)
    labels = _script_guess_batch(cps, row_idx, nv)
    need = np.array([x is None for x in labels], dtype=bool)
    if need.any():
        langs, A, by_len = _gram_tables()
        m = _cp_tables()[2][cps].astype(np.int32)  # codepoint → alphabet idx
        mat = np.zeros((nv, len(langs)), dtype=np.float64)
        for L, (codes, member) in by_len.items():
            code = m[: len(m) - L + 1].copy()  # max code < A^4 ≈ 4.2M: int32
            for k in range(1, L):
                code *= A
                code += m[k: len(m) - L + 1 + k]
            gi = np.searchsorted(codes, code)
            gi_c = np.minimum(gi, len(codes) - 1)
            match = codes[gi_c] == code
            rows = row_idx[: len(code)][match]
            key = rows * len(codes) + gi_c[match]
            per_code = np.bincount(key, minlength=nv * len(codes)).reshape(
                nv, len(codes)
            )
            # float matmul = BLAS dgemm (int64 @ falls back to a slow generic
            # loop); counts are small integers, exact in float64
            mat += per_code.astype(np.float64) @ member
        # max(scores, key=(score, lang)) ≡ ties broken by lexicographically
        # GREATEST lang; argmax picks the first max, so scan columns reversed
        rev = mat[:, ::-1]
        bi = rev.argmax(axis=1)
        bscore = rev[np.arange(nv), bi]
        langs_desc = np.array(langs[::-1], dtype=object)
        chosen = np.where(bscore > 0, langs_desc[bi], "unknown")
        labels[need] = chosen[need]
    res[pos] = labels
    return pd.Series(res)


# ---------------------------------------------------------------------------
# Repetition / boilerplate filters (Gopher-style corpus cleaning rules).
# Reference behavior model: quickwit has no analog — these extend the engine
# for training-data pipelines (brief: dedup/quality ops are first-class).
# All pure Column ops: JVM-side, whole-stage-codegen, no Python in the path.
# ---------------------------------------------------------------------------


def _tokens(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def _max_run_len(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a SORTED
    array == highest multiplicity of any element. Single fold, no explode:
    the per-doc array never leaves the row, so a 10^12-doc scan stays a
    narrow map with zero shuffle."""
    first = F.element_at(sorted_arr, 1)
    init = F.struct(
        first.alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    acc = F.aggregate(
        sorted_arr,
        init,
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a.prev, a.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a.best, F.when(x == a.prev, a.run + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
    )
    return acc.best


def repetition_features(col: Column) -> list[Column]:
    """Word/bigram repetition ratios used as boilerplate indicators:

    - ``dup_word_frac``: 1 - distinct_words / total_words
    - ``top_word_frac``: multiplicity of the most frequent word / total
    - ``top_bigram_frac``: multiplicity of the most frequent word bigram /
      total bigrams (0.0 for docs with < 2 words)

    Highly repetitive documents (templated boilerplate, keyword stuffing,
    scraper loops) score high and get filtered before training.
    """
    toks = _tokens(col)
    n = F.size(toks)
    n_d = F.greatest(n, F.lit(1)).cast("double")
    dup_word = (F.lit(1.0) - F.size(F.array_distinct(toks)) / n_d)
    top_word = _max_run_len(F.sort_array(toks)) / n_d
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
    )
    top_bigram = F.when(
        n >= 2,
        _max_run_len(F.sort_array(bigrams))
        / (n - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    return [
        F.round(dup_word, 6).alias("dup_word_frac"),
        F.round(top_word, 6).alias("top_word_frac"),
        F.round(top_bigram, 6).alias("top_bigram_frac"),
    ]


# PII scrubbing: the cheap regex tier every corpus pipeline runs before
# training. Patterns are deliberately RE2-safe (no lookaround) so the same
# pattern text runs in Spark (Java regex) and any RE2-based checker.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_features(col: Column) -> list[Column]:
    """Counts of email / phone patterns (decide whether to drop the doc)."""
    return [
        F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(col, F.lit(PII_PHONE_RE), 0)).alias("n_phones"),
    ]


def pii_scrub_col(col: Column) -> Column:
    """Redact email/phone matches with typed placeholder tokens."""
    scrubbed = F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(scrubbed, PII_PHONE_RE, "<PHONE>")


URL_RE = r"https?://[A-Za-z0-9.-]+(/[A-Za-z0-9._/%-]*)?"
URL_DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def url_domains_col(col: Column) -> Column:
    """Array of domains of every http(s) URL in the text (source-domain
    frequency analysis / domain blocklists)."""
    urls = F.regexp_extract_all(col, F.lit(URL_DOMAIN_RE), 1)
    return urls


# ---------------------------------------------------------------------------
# text normalization + Gopher-style composite quality rules
# ---------------------------------------------------------------------------


def normalize_text_col(col: Column) -> Column:
    """Training-corpus text cleanup as one codegen expression chain:
    control characters (except \\t \\n) stripped, zero-width/invisible
    unicode (ZWSP/ZWNJ/ZWJ/BOM/soft hyphen) removed, NBSP → space,
    horizontal whitespace runs collapsed, outer whitespace trimmed. (Full
    NFC normalization needs ICU — out of scope; these are the cleanups
    that matter for whitespace-tokenized pipelines.)"""
    c = F.regexp_replace(col, r"[​‌‍﻿­]", "")
    c = F.regexp_replace(c, r"[  -   　]", " ")
    c = F.regexp_replace(c, r"[\x00-\x08\x0B-\x1F\x7F]", "")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    return F.trim(c)


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_features(col: Column) -> list[Column]:
    """The Gopher quality-rule raw signals (Rae et al. 2021 §A1.1, public):
    word count, mean word length, symbol-to-word ratio (# and ...),
    fraction of lines starting with a bullet, fraction ending with an
    ellipsis, stopword hit count. All pure Column ops over one pass."""
    words = F.filter(F.split(F.trim(col), r"\s+"), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    mean_wl = F.aggregate(
        words, F.lit(0.0), lambda acc, w: acc + F.length(w)
    ) / F.greatest(n_words.cast("double"), F.lit(1.0))
    hashes = F.length(col) - F.length(F.regexp_replace(col, r"#", ""))
    ellipses = F.size(F.split(col, r"\.\.\.")) - 1
    sym_ratio = (hashes + ellipses) / F.greatest(n_words.cast("double"), F.lit(1.0))
    lines = F.filter(F.split(col, r"\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.greatest(F.size(lines).cast("double"), F.lit(1.0))
    bullet_frac = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([\-\*•])"))
    ) / n_lines
    ellipsis_line_frac = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$"))
    ) / n_lines
    lowered = F.split(F.lower(F.trim(col)), r"\W+")
    stop_hits = F.size(
        F.filter(lowered, lambda w: w.isin(*_GOPHER_STOPWORDS))
    )
    return [
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_line_frac, 6).alias("ellipsis_line_frac"),
        stop_hits.alias("stopword_hits"),
    ]


def gopher_keep_col(
    col: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wl: float = 3.0,
    max_mean_wl: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_stopword_hits: int = 2,
) -> Column:
    """The composite Gopher keep/drop verdict with the paper's published
    thresholds as defaults — AND of all rules, one boolean Column."""
    n_words, mean_wl, sym, bullet, ellip, stop = gopher_features(col)
    return (
        n_words.between(min_words, max_words)
        & mean_wl.between(min_mean_wl, max_mean_wl)
        & (sym <= max_symbol_ratio)
        & (bullet <= max_bullet_frac)
        & (ellip <= max_ellipsis_frac)
        & (stop >= min_stopword_hits)
    )


def c4_line_keep(line: Column) -> Column:
    """C4's line-level keep rule (Raffel et al. 2020 §2.2, public): a line
    survives iff it ends in terminal punctuation (. ! ? or a closing
    quote), has at least 5 words, and does not contain the word
    "javascript" (case-insensitive — the cookie/JS-warning boilerplate
    heuristic)."""
    t = F.trim(line)
    ends_punct = t.rlike(r'[.!?"”]$')
    n_words = F.size(F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0))
    no_js = ~F.lower(t).rlike(r"\bjavascript\b")
    return ends_punct & (n_words >= 5) & no_js


def c4_features(col: Column) -> list[Column]:
    """C4 cleaning signals, all pure Column ops over one pass: per-line
    keep counts (see :func:`c4_line_keep`), the cleaned text (kept lines
    re-joined), its sentence count, and the page-level poison flags
    ("lorem ipsum" anywhere, a curly brace anywhere — the policy/code
    heuristics)."""
    lines = F.filter(F.split(col, r"\n"), lambda l: F.length(F.trim(l)) > 0)
    kept = F.filter(lines, c4_line_keep)
    clean = F.array_join(F.transform(kept, F.trim), "\n")
    n_sentences = F.size(
        F.filter(F.split(clean, r"[.!?]"), lambda s: F.length(F.trim(s)) > 0)
    )
    return [
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        clean.alias("clean_text"),
        n_sentences.alias("n_sentences"),
        F.lower(col).contains("lorem ipsum").alias("has_lorem_ipsum"),
        col.contains("{").alias("has_curly_brace"),
    ]


def c4_keep_col(col: Column, min_sentences: int = 3) -> Column:
    """C4's page-level keep: at least ``min_sentences`` sentences SURVIVING
    the line filter, no "lorem ipsum", no curly brace. Compose with
    :func:`c4_features`'s ``clean_text`` for the retained content."""
    lines = F.filter(F.split(col, r"\n"), lambda l: F.length(F.trim(l)) > 0)
    kept = F.filter(lines, c4_line_keep)
    clean = F.array_join(F.transform(kept, F.trim), "\n")
    n_sentences = F.size(
        F.filter(F.split(clean, r"[.!?]"), lambda s: F.length(F.trim(s)) > 0)
    )
    return (
        (n_sentences >= min_sentences)
        & ~F.lower(col).contains("lorem ipsum")
        & ~col.contains("{")
    )


def log_template_col(col: Column) -> Column:
    """Variable-masking log template — Drain-style template extraction as a
    pure Column program (the reference's fingerprinter masks token TYPES;
    this masks the standard log-variable classes so unbounded-cardinality
    messages collapse to a bounded template set). Masks, in order (order
    matters — IPs and hex ids contain digit runs): UUIDs → <UUID>,
    0x-hex → <HEX>, dotted-quad IPs → <IP>, digit runs (with optional
    fraction) → <NUM>. Engine-portable regexes (same dialect subset in
    Java and RE2/DuckDB)."""
    t = F.regexp_replace(
        col,
        r"\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b",
        "<UUID>",
    )
    t = F.regexp_replace(t, r"\b0x[0-9a-fA-F]+\b", "<HEX>")
    t = F.regexp_replace(t, r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>")
    return F.regexp_replace(t, r"\d+(\.\d+)?", "<NUM>")


def log_templates(
    df: DataFrame, text_col: str = "text", id_col: str | None = None
) -> DataFrame:
    """Mine the template catalog of a log corpus: mask variables
    (:func:`log_template_col`), then one map-side-combined groupBy —
    (template, n: long, example: the lexicographically-first raw line, a
    deterministic representative). Template cardinality ≈ distinct code
    paths, so the shuffle is catalog-sized regardless of corpus size —
    the standard first step of log-pattern analytics (Drain/Spell family)
    expressed as two Column ops + one aggregation."""
    return (
        df.select(
            log_template_col(F.col(text_col)).alias("template"),
            F.col(text_col).alias("__raw"),
        )
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("__raw").alias("example"),
        )
    )
