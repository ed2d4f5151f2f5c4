"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting. All JVM Column compositions except
the language-ID n-gram scorer (Arrow-vectorized pandas UDF)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
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


def _script_guess(s: str) -> str | None:
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


@F.pandas_udf(T.StringType())
def lang_id_udf(texts: pd.Series) -> pd.Series:
    """Heuristic n-gram language ID (Arrow-vectorized batch)."""
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        if t is None or len(t) < 6:
            out[i] = None
            continue
        s = f" {t.lower()} "
        script = _script_guess(s)
        if script is not None:
            out[i] = script
            continue
        scores = {}
        for lang, grams in _LANG_PROFILES.items():
            scores[lang] = sum(s.count(g) for g in grams)
        best = max(scores, key=lambda k: (scores[k], k))
        out[i] = best if scores[best] > 0 else "unknown"
    return pd.Series(out)
