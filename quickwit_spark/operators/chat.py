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


def trajectory_stats(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
    roles: tuple[str, ...] = ("user", "assistant", "tool"),
    tool_role: str = "tool",
    error_pred: Column | None = None,
) -> DataFrame:
    """Per-conversation trajectory metrics — the agent-transcript analog of
    per-session web analytics: how long the conversation ran, how the turns
    split across roles, how many distinct tools were invoked, how quickly
    the agent first reached for a tool, and (optionally) how many turns
    satisfied a caller-supplied error predicate.

    Every metric is a plain conditional aggregate, so the whole operator is
    ONE map-side-combined groupBy(conv) — one shuffle whose width is the
    number of conversations, never the number of turns. At 10^12 turns the
    partial-aggregation pass reduces each partition to its local
    conversation set before anything moves; hot conversations are single
    groups and ride AQE skew splitting.

    Output per conversation: n_turns, n_<role> per role, n_distinct_tools,
    duration_sec (last ts − first ts), first_role / last_role (by turn
    order), first_tool_turn (min turn_idx where role==tool_role; null if
    the conversation never used a tool), avg_text_chars, and n_errors when
    ``error_pred`` is given.
    """
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        *[
            F.count_if(F.col(role_col) == r).cast("long").alias(f"n_{r}")
            for r in roles
        ],
        F.count_distinct(F.col(tool_col)).cast("long").alias("n_distinct_tools"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col)))
        .cast("long")
        .alias("duration_sec"),
        F.min_by(role_col, turn_col).alias("first_role"),
        F.max_by(role_col, turn_col).alias("last_role"),
        F.min(F.when(F.col(role_col) == tool_role, F.col(turn_col)))
        .cast("long")
        .alias("first_tool_turn"),
        F.round(F.avg(F.length(F.coalesce(F.col(text_col), F.lit("")))), 6).alias(
            "avg_text_chars"
        ),
    ]
    if error_pred is not None:
        aggs.append(F.count_if(error_pred).cast("long").alias("n_errors"))
    return df.groupBy(conv_col).agg(*aggs)


def funnel_reached(
    df: DataFrame,
    steps: list[tuple[str, Column]],
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Ordered-funnel evaluation per group: a group reaches step k iff rows
    matching steps 1..k occur in strictly increasing ``order_col`` order
    (greedy earliest-match — if ANY ordered subsequence exists, the greedy
    scan finds one, so this is exact reach semantics, not a heuristic).
    The log-analytics staple (signup funnels) applied to agent transcripts:
    "asked → agent invoked a tool → tool succeeded → agent answered".

    Scale shape: every step predicate is evaluated row-side in the scan's
    own codegen stage and packed into one array<boolean>, so only
    (group, order, K booleans) ever shuffles — never the text. One
    groupBy(group) with array_sort inside the task (no global sort), then
    the greedy scan is a single Catalyst ``aggregate`` fold over the
    sorted turn list. Per-group memory is the group's turn count.

    Returns (group_col, steps_reached: long in [0, len(steps)]).
    """
    k = len(steps)
    if k == 0:
        raise ValueError("funnel needs at least one step")
    flags = F.array(*[p.cast("boolean") for _, p in steps])
    packed = df.select(
        F.col(group_col), F.col(order_col).alias("__o"), flags.alias("__f")
    )
    grouped = packed.groupBy(group_col).agg(
        F.array_sort(F.collect_list(F.struct("__o", "__f"))).alias("__evs")
    )
    reached = F.aggregate(
        F.col("__evs"),
        F.lit(0),
        lambda acc, e: F.when(
            (acc < F.lit(k))
            & F.coalesce(F.element_at(e["__f"], (acc + 1).cast("int")), F.lit(False)),
            acc + 1,
        ).otherwise(acc),
    )
    return grouped.select(
        group_col, reached.cast("long").alias("steps_reached")
    )


def funnel_counts(
    df: DataFrame,
    steps: list[tuple[str, Column]],
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Funnel summary: for each step k, how many groups reached step ≥ k.
    Counts are monotonically non-increasing by construction. Groups that
    match no step at all contribute to no row (classic funnel convention).

    Returns (step: long 1..K, step_name, n_groups: long), built from
    :func:`funnel_reached` plus one explode + tiny groupBy — the second
    shuffle is K rows wide.
    """
    names = F.array(*[F.lit(n) for n, _ in steps])
    per_group = funnel_reached(df, steps, group_col, order_col)
    return (
        per_group.filter(F.col("steps_reached") >= 1)
        .select(
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("steps_reached"))
            ).alias("step")
        )
        .groupBy("step")
        .agg(F.count(F.lit(1)).cast("long").alias("n_groups"))
        .select(
            "step",
            F.element_at(names, F.col("step").cast("int")).alias("step_name"),
            "n_groups",
        )
    )


def turn_context(
    df: DataFrame,
    k: int = 4,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
) -> DataFrame:
    """Per-assistant-turn training pairs with a bounded context window —
    the multi-turn SFT prep step that complements
    :func:`render_conversations` (whole-conversation examples): for every
    assistant turn, emit the previous ``k`` turns rendered as
    ``role: text`` lines (the prompt context) and the assistant text as
    the target.

    Scale shape: one window shuffle on (conv); the context is a
    collect_list over a bounded ROWS frame (k preceding .. 1 preceding) —
    per-row state is k turns, never the whole conversation, so a 4000-turn
    hot conversation costs the same per row as a 3-turn one. Rendering is
    concat/array_join in codegen.

    Returns (conv_id, turn_idx, context: string ('' for a
    conversation-opening assistant turn), target: string).
    """
    from pyspark.sql import Window

    piece = F.concat(
        F.col(role_col), F.lit(": "), F.coalesce(F.col(text_col), F.lit(""))
    )
    w = (
        Window.partitionBy(conv_col)
        .orderBy(turn_col)
        .rowsBetween(-k, -1)
    )
    return (
        df.withColumn("__ctx", F.collect_list(piece).over(w))
        .filter(F.col(role_col) == assistant_role)
        .select(
            conv_col,
            turn_col,
            F.array_join(F.col("__ctx"), "\n").alias("context"),
            F.coalesce(F.col(text_col), F.lit("")).alias("target"),
        )
    )


def preference_pairs(
    df: DataFrame,
    group_col: str = "conv_id",
    text_col: str = "text",
    score_col: str = "score",
    order_col: str = "turn_idx",
    min_margin: float = 0.0,
) -> DataFrame:
    """Chosen/rejected preference-pair construction — the RLHF/DPO prep
    step over scored candidate responses: within each group (a prompt /
    conversation), pair the highest-scoring candidate against the
    lowest-scoring one.

    Deterministic tie-breaking: among equal scores the EARLIER candidate
    (smaller ``order_col``) is chosen and the LATER one rejected, so the
    pair is stable across runs, partitionings, and engines. Groups whose
    margin (max-min score, rounded to 6 dp) is below ``min_margin`` are
    dropped — a pair with no signal is noise to a DPO loss. Single-
    candidate groups always drop (margin 0 pairs a row with itself).

    Returns (group, n_candidates, chosen, rejected, margin).

    Scale shape: ONE map-side-combined groupBy — max_by/min_by over a
    (score, order) struct keeps per-group state at two candidates during
    the partial aggregation, so a 10^5-candidate hot prompt shuffles one
    row. No window, no sort, no self-join.
    """
    score = F.col(score_col)
    # max_by: highest score, ties -> max(-order) = earliest candidate.
    # min_by: lowest score, ties -> min(-order) = latest candidate.
    key = F.struct(score.alias("s"), (-F.col(order_col)).alias("o"))
    margin = F.round(F.max(score) - F.min(score), 6)
    out = df.groupBy(F.col(group_col).alias(group_col)).agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.max_by(F.col(text_col), key).alias("chosen"),
        F.min_by(F.col(text_col), key).alias("rejected"),
        margin.alias("margin"),
    )
    floor = max(float(min_margin), 0.0)
    cond = (
        F.col("margin") > 0 if floor == 0.0 else F.col("margin") >= F.lit(floor)
    )
    return out.filter(cond)


def truncate_context(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
) -> DataFrame:
    """Token-budget context truncation: keep the maximal SUFFIX of each
    conversation whose total token count fits ``budget`` — the
    context-window prep step before rendering transcripts into training
    examples (render_conversations / turn_context).

    Rule: a turn survives iff the running token total from the newest turn
    back through it is ≤ budget; the newest turn always survives (a
    single over-budget turn truncates to itself, never to nothing).

    Scale shape: ONE window shuffle on (conv) — the reverse running sum
    and the newest-turn rank share the same (conv, turn desc) sort, so
    Catalyst plans a single Exchange + sort; per-row state is the running
    sum, not the conversation.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(F.col(turn_col).desc())
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        df.withColumn("__rev_cum", F.sum(F.col(tokens_col)).over(wsum))
        .withColumn("__newest", F.row_number().over(w))
        .filter((F.col("__rev_cum") <= budget) | (F.col("__newest") == 1))
        .drop("__rev_cum", "__newest")
    )
    return out
