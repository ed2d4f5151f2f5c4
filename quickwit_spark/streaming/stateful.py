"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no ingest-time state beyond source offsets (SURVEY §2.12),
but a 10^12-turn training-data pipeline needs two stateful shapes the
built-in streaming aggregates can't express:

- :func:`streaming_dedup` — cross-micro-batch exact dedup: only the FIRST
  occurrence of each content hash is ever emitted, no matter which batch the
  duplicates arrive in. State per hash group is the list of distinct texts
  seen (length 1 except on genuine 64-bit collisions), stored in Spark's
  state store (RocksDB-compatible at scale), so memory is bounded per key
  and survives restarts with the streaming checkpoint.
- :func:`conversation_sessions` — running per-conversation session state
  (turn counts, ts range, error counts) updated every micro-batch; the
  pattern behind "conversation-level quality gates" on live transcript
  streams.

Both are Arrow-batched (pandas groups), keyed, and deterministic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(stream: DataFrame, text_col: str = "text",
                    hash_expr=None) -> DataFrame:
    """Emit each distinct ``text_col`` value exactly once across ALL
    micro-batches. Groups by xxhash64(text); state = distinct texts seen
    (collision-safe: suppression matches the full text, not just the hash).

    Output: (content_hash: long, first_value: string, n_dupes_dropped: long)
    rows are appended only for first-seen hashes; later duplicates bump
    nothing downstream (they die in the stateful operator).
    """

    def dedup_fn(key, pdfs, state: GroupState):
        # State holds the DISTINCT texts seen under this 64-bit hash (almost
        # always exactly one; >1 only on a genuine xxhash64 collision) plus a
        # per-text occurrence count. Suppression compares full text, not just
        # the hash, so colliding-but-distinct documents are each emitted once
        # instead of silently conflated (batch dedup_exact groups on
        # (hash, text) for the same reason).
        texts = [pdf[text_col] for pdf in pdfs if len(pdf)]
        batch = pd.concat(texts, ignore_index=True) if texts else pd.Series([], dtype=object)
        seen, counts = (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
        new_texts, new_counts = [], []
        for text, n in batch.groupby(batch, sort=False).size().items():
            try:
                i = seen.index(text)
                counts[i] += int(n)
            except ValueError:
                seen.append(text)
                counts.append(int(n))
                new_texts.append(text)
                new_counts.append(int(n) - 1)
        state.update((seen, counts))
        if not new_texts:
            return iter(())  # every text already emitted: drop all duplicates
        return iter(
            [pd.DataFrame({"content_hash": [key[0]] * len(new_texts),
                           "first_value": new_texts,
                           "n_dupes_dropped": new_counts})]
        )

    if hash_expr is None:
        hash_expr = F.xxhash64(F.col(text_col))
    keyed = stream.withColumn("__h", hash_expr).groupBy("__h")
    return keyed.applyInPandasWithState(
        dedup_fn,
        outputStructType="content_hash long, first_value string, n_dupes_dropped long",
        stateStructType="seen array<string>, counts array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def conversation_sessions(stream: DataFrame) -> DataFrame:
    """Running per-conv_id session state over a transcripts stream: emits the
    UPDATED session row each micro-batch the conversation appears in.

    Output: (conv_id, n_turns, min_turn_idx, max_turn_idx, n_error_turns).
    """

    def session_fn(key, pdfs, state: GroupState):
        n = lo = hi = err = 0
        lo = None
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mn, mx = int(pdf["turn_idx"].min()), int(pdf["turn_idx"].max())
                lo = mn if lo is None else min(lo, mn)
                hi = max(hi, mx)
                err += int(pdf["text"].str.contains("level=ERROR").sum())
        if state.exists:
            p_n, p_lo, p_hi, p_err = state.get
            n += p_n
            lo = p_lo if lo is None else min(lo, p_lo)
            hi = max(hi, p_hi)
            err += p_err
        state.update((n, int(lo or 0), int(hi), int(err)))
        return iter(
            [pd.DataFrame({
                "conv_id": [key[0]], "n_turns": [n], "min_turn_idx": [int(lo or 0)],
                "max_turn_idx": [int(hi)], "n_error_turns": [int(err)],
            })]
        )

    return stream.groupBy("conv_id").applyInPandasWithState(
        session_fn,
        outputStructType=(
            "conv_id string, n_turns long, min_turn_idx long, "
            "max_turn_idx long, n_error_turns long"
        ),
        stateStructType="n long, lo long, hi long, err long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
