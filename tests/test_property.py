"""Property-based tests (hypothesis) over the driver-side pure kernels —
the analog of the reference's proptest suites (SURVEY §5.4: proptest deps
in quickwit-indexing / quickwit-search / quickwit-query; e.g. the
SourceCheckpointDelta properties in
quickwit-proto/src/types/../indexing/source checkpoint tests).

All of these are pure Python/numpy — no SparkSession — so hundreds of
examples run in seconds.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from quickwit_spark.functions.datetime import (
    MAX_TIMESTAMP_SECONDS,
    MIN_TIMESTAMP_SECONDS,
    _infer_unit_nanos,
)
from quickwit_spark.pipeline.checkpoint import (
    CheckpointStore,
    EmptyOrNegativeDelta,
    IncompatibleCheckpointDelta,
    format_position,
)
from quickwit_spark.routing.expression import parse_field_name

# ---------------------------------------------------------------------------
# checkpoint positions: the 20-digit encoding is order-preserving
# ---------------------------------------------------------------------------


@given(st.integers(min_value=0, max_value=2**63 - 1),
       st.integers(min_value=0, max_value=2**63 - 1))
def test_format_position_preserves_order(a, b):
    # the whole checkpoint compat algebra compares positions as STRINGS
    # (checkpoint.rs Position encoding); the zero-padded form must order
    # exactly like the integers for every pair
    fa, fb = format_position(a), format_position(b)
    assert (fa < fb) == (a < b)
    assert (fa == fb) == (a == b)


@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_format_position_beginning_sorts_first(a):
    assert format_position(None) == ""
    assert format_position(None) < format_position(a)


# ---------------------------------------------------------------------------
# checkpoint delta algebra: arbitrary delta sequences vs a model
# ---------------------------------------------------------------------------

_PARTITIONS = ("p0", "p1", "p2")


@st.composite
def _delta(draw):
    parts = draw(st.lists(st.sampled_from(_PARTITIONS), min_size=1, max_size=3,
                          unique=True))
    out = {}
    for p in parts:
        frm = draw(st.integers(min_value=0, max_value=50))
        to = draw(st.integers(min_value=0, max_value=60))
        out[p] = (frm, to)
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(_delta(), min_size=1, max_size=8))
def test_checkpoint_delta_sequence_matches_model(tmp_path_factory, deltas):
    """Replay a random delta sequence against the store and an independent
    model of the reference semantics (checkpoint.rs:286-330):

    - (from, to] empty or negative → EmptyOrNegativeDelta, state unchanged;
    - from < current(partition)    → IncompatibleCheckpointDelta (overlap),
      state unchanged — the WHOLE delta is rejected, even the valid parts;
    - otherwise commit; gaps (from > current) are allowed (warn only);
    - current() is always the max committed `to` per partition.
    """
    root = str(tmp_path_factory.mktemp("ckpt_prop"))
    store = CheckpointStore(root)
    model: dict[str, str] = {}
    for delta in deltas:
        empty = any(format_position(t) <= format_position(f)
                    for f, t in delta.values())
        overlap = any(
            format_position(f) < model.get(p, "")
            for p, (f, t) in delta.items()
        )
        if empty and not overlap:
            with pytest.raises(EmptyOrNegativeDelta):
                store.commit("src", delta)
        elif overlap and not empty:
            with pytest.raises(IncompatibleCheckpointDelta):
                store.commit("src", delta)
        elif empty and overlap:
            # both defects present: which one raises depends on partition
            # iteration order — the invariant is rejection + unchanged state
            with pytest.raises((EmptyOrNegativeDelta, IncompatibleCheckpointDelta)):
                store.commit("src", delta)
        else:
            store.commit("src", delta)
            for p, (f, t) in delta.items():
                ft = format_position(t)
                if ft > model.get(p, ""):
                    model[p] = ft
        assert store.current("src") == model


# ---------------------------------------------------------------------------
# timestamp unit inference: the four unit ranges are disjoint and
# round-trip exactly
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=MIN_TIMESTAMP_SECONDS, max_value=MAX_TIMESTAMP_SECONDS),
    st.sampled_from([1, 1_000, 1_000_000, 1_000_000_000]),
)
def test_infer_unit_round_trips_every_unit(secs, mult):
    """date_time_parsing.rs range dispatch: any in-range instant encoded in
    seconds/millis/micros/nanos infers its unit and lands on the same
    nanosecond value (truncated to the encoding's own precision)."""
    encoded = secs * mult
    nanos, ok = _infer_unit_nanos(np.array([encoded], dtype=np.int64))
    assert bool(ok[0])
    assert int(nanos[0]) == secs * mult * (1_000_000_000 // mult)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_infer_unit_rejects_out_of_all_ranges(v):
    in_any = any(
        MIN_TIMESTAMP_SECONDS * m <= v <= MAX_TIMESTAMP_SECONDS * m
        for m in (1, 1_000, 1_000_000, 1_000_000_000)
    )
    _nanos, ok = _infer_unit_nanos(np.array([v], dtype=np.int64))
    assert bool(ok[0]) == in_any


# ---------------------------------------------------------------------------
# routing field-name escapes round-trip
# ---------------------------------------------------------------------------

_component = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=8,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_component, min_size=1, max_size=4))
def test_parse_field_name_escape_round_trip(parts):
    """mod.rs:548-554: join components with '.', escaping literal dots and
    backslashes — parse_field_name must recover the original components for
    ANY printable-ASCII content."""
    rendered = ".".join(
        p.replace("\\", "\\\\").replace(".", "\\.") for p in parts
    )
    assert parse_field_name(rendered) == parts


@given(st.sampled_from(["", ".", "a.", ".a", "a..b"]))
def test_parse_field_name_rejects_empty_components(bad):
    with pytest.raises(ValueError):
        parse_field_name(bad)


# ---------------------------------------------------------------------------
# doc-mapper parse path never crashes, never desyncs, always categorizes
# ---------------------------------------------------------------------------

_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=20),
)
_json_values = st.recursive(
    _json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8), children, max_size=4),
    ),
    max_leaves=10,
)
_raw_doc = st.one_of(
    # well-formed JSON object with arbitrary content
    st.dictionaries(st.text(min_size=1, max_size=8), _json_values, max_size=5).map(
        lambda d: __import__("json").dumps(d)
    ),
    # arbitrary garbage bytes-as-text
    st.text(max_size=40),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_raw_doc, min_size=1, max_size=8))
def test_docmapper_parse_batch_total_function(docs):
    """The ingest parse path is a TOTAL function over arbitrary input
    (doc_processor.rs: a bad document increments a counter, it never
    crashes the pipeline): parse_batch on any mix of valid objects,
    deep nesting, huge ints and non-JSON garbage must return one
    row-aligned frame with every row categorized."""
    import pandas as pd

    from quickwit_spark.operators.docmapper import DocMapper, DocMapping, FieldMapping

    mapper = DocMapper(
        DocMapping(
            field_mappings=[
                FieldMapping("message", "text"),
                FieldMapping("count", "u64"),
                FieldMapping("ts", "datetime"),
            ],
            mode="dynamic",
        )
    )
    out = mapper.parse_batch(pd.Series(docs))
    assert len(out) == len(docs)
    cats = set(out["_error_category"])
    assert cats <= {
        "valid", "json_parse_error", "doc_mapper_error", "transform_error",
    }, cats
    # garbage rows carry an error message; valid rows don't
    for cat, err in zip(out["_error_category"], out["_error"]):
        if cat == "valid":
            assert err is None or err != err  # None/NaN
        else:
            assert err is not None


# ---------------------------------------------------------------------------
# merge policies: the reference's own proptest invariants
# (quickwit-indexing/src/merge_policy/mod.rs:418-443 proptest +
#  stable_log_merge_policy.rs:126-143 check_is_valid)
# ---------------------------------------------------------------------------


@st.composite
def _split(draw, idx):
    from quickwit_spark.pipeline.merge_policy import SplitMeta

    return SplitMeta(
        split_id=f"s{idx}-{draw(st.integers(0, 10**6))}",
        num_docs=draw(st.integers(min_value=1, max_value=9_999)),
        time_range_end=draw(st.one_of(st.none(), st.integers(0, 10_000))),
        create_timestamp=draw(st.integers(0, 100)),
        num_merge_ops=draw(st.integers(0, 3)),
        # None = Mature; a large period = still immature at now=200
        maturation_period_secs=draw(st.sampled_from([None, 10_000.0])),
    )


@st.composite
def _splits(draw):
    n = draw(st.integers(0, 60))
    return [draw(_split(i)) for i in range(n)]


def _op_ids(ops):
    # canonical multiset of operations: each op as a sorted id tuple
    # (frozensets don't totally order under <, which is subset comparison)
    return sorted(tuple(sorted(s.split_id for s in op)) for op in ops)


@settings(max_examples=150, deadline=None)
@given(_splits(), st.integers(0, 2**32 - 1))
def test_merge_policy_proptest_invariants(splits, shuffle_seed):
    import random

    from quickwit_spark.pipeline.merge_policy import (
        ConstWriteAmplificationMergePolicy,
        NoMergePolicy,
        StableLogMergePolicy,
        _cmp_by_reverse_time_end,
    )

    NOW = 200.0
    policies = [
        StableLogMergePolicy(
            merge_factor=4, max_merge_factor=6, min_level_num_docs=100,
            split_num_docs_target=10_000,
        ),
        ConstWriteAmplificationMergePolicy(
            merge_factor=4, max_merge_factor=6, max_merge_ops=4,
            split_num_docs_target=10_000,
        ),
        NoMergePolicy(),
    ]
    for policy in policies:
        pool = list(splits)
        shuffled = list(splits)
        random.Random(shuffle_seed).shuffle(shuffled)

        ops = policy.operations(pool, now_secs=NOW)
        ops_shuffled = policy.operations(shuffled, now_secs=NOW)

        # 1. order independence (mod.rs:426-428)
        assert _op_ids(ops) == _op_ids(ops_shuffled)

        # 2. no split lost (mod.rs:430-435): merged + remaining == original
        merged_ids = {s.split_id for op in ops for s in op}
        remaining_ids = {s.split_id for s in pool}
        assert merged_ids | remaining_ids == {s.split_id for s in splits}
        assert not (merged_ids & remaining_ids)
        assert sum(len(op) for op in ops) + len(pool) == len(splits)

        # 3. mature splits are never merged
        for op in ops:
            for s in op:
                assert not s.is_mature(NOW)

        if isinstance(policy, NoMergePolicy):
            assert ops == []
        for op in ops:
            assert 2 <= len(op) <= policy.max_merge_factor
        if isinstance(policy, StableLogMergePolicy):
            # stable_log check_is_valid: an under-merge_factor op must have
            # reached the docs target, and dropping its youngest member
            # must fall back under it
            import functools

            for op in ops:
                if len(op) < policy.merge_factor:
                    docs = sum(s.num_docs for s in op)
                    youngest = min(
                        op, key=functools.cmp_to_key(_cmp_by_reverse_time_end)
                    )
                    assert docs >= policy.split_num_docs_target
                    assert docs - youngest.num_docs < policy.split_num_docs_target
        if isinstance(policy, ConstWriteAmplificationMergePolicy):
            # const_write_amplification: one op never mixes merge-op counts
            for op in ops:
                assert len({s.num_merge_ops for s in op}) == 1


# ---------------------------------------------------------------------------
# query-string parser: total over garbage (AST or ValueError, never a crash)
# ---------------------------------------------------------------------------

_query_chars = st.text(
    alphabet=st.sampled_from(list("abc:()[]{}*?\"'~^+-&| .\\/<>=_0123456789TOANDORT")),
    max_size=40,
)


@settings(max_examples=500, deadline=None)
@given(_query_chars)
def test_query_parser_total_over_garbage(q):
    """The REST 400 path: any input either parses to an AST or raises
    ValueError — no other exception type ever escapes (the reference's
    query parser returns a structured error for every malformed string)."""
    from quickwit_spark.operators.query import QueryCompiler

    qc = QueryCompiler({"a": "text", "b": "numeric"}, default_fields=("a",))
    try:
        ast = qc.parse(q)
    except ValueError:
        return
    assert ast is not None
