"""Byte-pair-encoding tokenizer: distributed-corpus training sample +
vectorizable application — the real-tokenizer tier above the whitespace /
BPE-ish-regex token counters in functions/text.py.

Standard practice for web-scale corpora (GPT-2/SentencePiece lineage): the
merge table is TRAINED on a bounded deterministic sample (tokenizer quality
saturates long before the corpus does), then APPLIED distributed. Training
is driver-side pure Python over a word-frequency dict; application ships
the merge ranks in the UDF closure and runs per-batch with a word→pieces
cache — natural-language batches repeat most words, so the greedy merge
loop runs only once per distinct word per batch.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf string hints resolve here
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_END = "</w>"


def _word_freqs_from_texts(texts) -> dict[str, int]:
    freq: dict[str, int] = {}
    for t in texts:
        if not t:
            continue
        for w in t.lower().split():
            freq[w] = freq.get(w, 0) + 1
    return freq


def train_bpe(
    df: DataFrame,
    num_merges: int = 256,
    text_col: str = "text",
    sample_docs: int = 10_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a deterministic corpus sample.

    The sample is the ``sample_docs`` texts with the smallest
    ``xxhash64(text)`` — a content-keyed top-k (TakeOrdered, no full sort,
    no RNG), so retraining on the same corpus always yields the same
    tokenizer regardless of partitioning.

    Classic BPE (Sennrich et al.): words end with ``</w>``; each step
    merges the most frequent adjacent symbol pair, ties broken
    lexicographically for determinism.
    """
    texts = [
        r[0]
        for r in df.select(F.col(text_col))
        .orderBy(F.xxhash64(F.col(text_col)).asc(), F.col(text_col).asc())
        .limit(sample_docs)
        .collect()
    ]
    freq = _word_freqs_from_texts(texts)
    vocab = {tuple(w) + (_END,): c for w, c in freq.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        # highest count wins; ties break to the lexicographically SMALLEST
        # pair so training is order-independent
        top = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == top)
        merges.append(best_pair)
        a, b = best_pair
        merged = a + b
        new_vocab = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merging (the GPT-2 bpe() loop)."""
    sym = list(word) + [_END]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc BPE token statistics: (id, n_words, n_tokens, tokens_per_word
    rounded 4dp). The merge-rank table travels in the UDF closure (a merge
    list is KBs even at 100k vocab — broadcast-by-closure is right); a
    word→pieces cache makes the per-word merge loop amortize to once per
    distinct word per batch."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("n_words", T.LongType()),
                T.StructField("n_tokens", T.LongType()),
            ]
        )
    )
    def stats(texts: pd.Series) -> pd.DataFrame:
        cache: dict[str, int] = {}
        n_words = []
        n_tokens = []
        for t in texts:
            words = (t or "").lower().split()
            total = 0
            for w in words:
                c = cache.get(w)
                if c is None:
                    c = len(_bpe_word(w, ranks))
                    cache[w] = c
                total += c
            n_words.append(len(words))
            n_tokens.append(total)
        return pd.DataFrame({"n_words": n_words, "n_tokens": n_tokens})

    return df.select(F.col(id_col), stats(F.col(text_col)).alias("s")).select(
        id_col,
        F.col("s.n_words").alias("n_words"),
        F.col("s.n_tokens").alias("n_tokens"),
        F.round(
            F.col("s.n_tokens") / F.greatest(F.col("s.n_words"), F.lit(1)), 4
        ).alias("tokens_per_word"),
    )
