"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no ingest-time state beyond source offsets (SURVEY §2.12),
but a 10^12-turn training-data pipeline needs two stateful shapes the
built-in streaming aggregates can't express:

- :func:`streaming_dedup` — cross-micro-batch exact dedup: only the FIRST
  occurrence of each content hash is ever emitted, no matter which batch the
  duplicates arrive in. State per hash group is a single seen flag, stored
  in Spark's state store (RocksDB-compatible at scale), so memory is bounded
  per key and survives restarts with the streaming checkpoint.
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


def streaming_dedup(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Emit each distinct ``text_col`` value exactly once across ALL
    micro-batches. Groups by xxhash64(text); state = has-emitted flag.

    Output: (content_hash: long, first_value: string, n_dupes_dropped: long)
    rows are appended only for first-seen hashes; later duplicates bump
    nothing downstream (they die in the stateful operator).
    """

    def dedup_fn(key, pdfs, state: GroupState):
        n = 0
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf[text_col].iloc[0]
            n += len(pdf)
        if state.exists:
            (seen_n,) = state.get
            state.update((seen_n + n,))
            return iter(())  # already emitted: drop all duplicates
        state.update((n,))
        return iter(
            [pd.DataFrame({"content_hash": [key[0]], "first_value": [first],
                           "n_dupes_dropped": [n - 1]})]
        )

    keyed = stream.withColumn("__h", F.xxhash64(F.col(text_col))).groupBy("__h")
    return keyed.applyInPandasWithState(
        dedup_fn,
        outputStructType="content_hash long, first_value string, n_dupes_dropped long",
        stateStructType="seen_n long",
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
