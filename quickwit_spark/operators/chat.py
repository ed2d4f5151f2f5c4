"""Conversation → training-example rendering — the transcript-specific
step of an LLM data pipeline: turn rows (conv_id, turn_idx, role, text)
become one rendered training string per conversation (ChatML-style or
plain role-prefixed), plus the character spans of the assistant turns for
loss masking (supervised fine-tuning trains only on assistant tokens; the
span offsets let the tokenizer-side masker find them without re-parsing).

Scale shape: ONE shuffle — groupBy(conv_id) with collect_list of
(turn_idx, role, text) structs, ordered inside the task by array_sort (the
same stable-turn-order contract as the pipeline's Window over
(conv_id, turn_idx), but without a global sort); rendering and the span
fold are pure Catalyst higher-order functions (concat_ws/transform/
aggregate) — no Python, no second pass over the text. Conversations are
the natural bounded unit (turn counts are small), so per-group memory is
bounded regardless of corpus size; hot conversations are single groups by
construction and ride the same AQE skew handling as the pipeline's
conv_id salting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TEMPLATES = {
    # prefix parts around the role, then suffix after the text
    "chatml": ("<|im_start|>", "\n", "<|im_end|>\n"),
    "plain": ("", ": ", "\n"),
}


def render_conversations(
    df: DataFrame,
    template: str = "chatml",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Render each conversation to one training string.

    Output: (conv_id, n_turns, rendered, span_starts, span_ends) where the
    spans are 1-based [start, end) character offsets of each assistant
    turn's TEXT inside ``rendered`` (substr(rendered, start, end-start)
    returns the turn text verbatim) — ready for loss masking.
    """
    if template not in TEMPLATES:
        raise ValueError(f"unknown template {template!r}; have {sorted(TEMPLATES)}")
    pre, mid, suf = TEMPLATES[template]

    def piece(t: Column) -> Column:
        return F.concat(
            F.lit(pre), t[role_col], F.lit(mid),
            F.coalesce(t[text_col], F.lit("")), F.lit(suf),
        )

    def prefix_len(t: Column) -> Column:
        return F.lit(len(pre) + len(mid)) + F.length(t[role_col])

    def text_len(t: Column) -> Column:
        return F.length(F.coalesce(t[text_col], F.lit("")))

    turns_sorted = F.array_sort(
        F.collect_list(F.struct(F.col(turn_col), F.col(role_col), F.col(text_col)))
    )
    grouped = df.groupBy(conv_col).agg(turns_sorted.alias("_turns"))

    rendered = F.concat_ws("", F.transform(F.col("_turns"), piece))
    # one left fold computes every span: acc = (chars consumed so far,
    # starts, ends); assistant turns append (off + prefix, ... + text len)
    zero = F.struct(
        F.lit(0).cast("long").alias("off"),
        F.array().cast("array<long>").alias("starts"),
        F.array().cast("array<long>").alias("ends"),
    )

    def step(acc: Column, t: Column) -> Column:
        start = acc["off"] + prefix_len(t) + 1  # 1-based
        is_asst = t[role_col] == F.lit(assistant_role)
        return F.struct(
            (acc["off"] + prefix_len(t) + text_len(t) + F.lit(len(suf))).alias("off"),
            F.when(is_asst, F.concat(acc["starts"], F.array(start)))
            .otherwise(acc["starts"])
            .alias("starts"),
            F.when(is_asst, F.concat(acc["ends"], F.array(start + text_len(t))))
            .otherwise(acc["ends"])
            .alias("ends"),
        )

    spans = F.aggregate(F.col("_turns"), zero, step)
    return grouped.select(
        F.col(conv_col),
        F.size(F.col("_turns")).cast("long").alias("n_turns"),
        rendered.alias("rendered"),
        spans["starts"].alias("span_starts"),
        spans["ends"].alias("span_ends"),
    )
