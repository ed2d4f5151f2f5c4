"""Merge policies: StableLog (level-by-doc-count), ConstWriteAmplification
(limit_merge) and NoMerge, re-expressed from the reference's behavioral
contracts:

- quickwit-indexing/src/merge_policy/stable_log_merge_policy.rs:38-57 (level
  construction doc), :99-146 (operations + maturity), :181-297 (sort order,
  build_split_levels, merge_candidate_from_level, merge_candidate_size)
- quickwit-indexing/src/merge_policy/const_write_amplification.rs:44-241
  (greedy per-num_merge_ops-level batching + maturity by max_merge_ops)
- quickwit-config/src/merge_policy_config.rs:24-118,207-250 (config enum
  no_merge / limit_merge / stable_log|default, defaults, validate rule
  max_merge_factor >= merge_factor)

These are driver-side planners over split METADATA only (hundreds of rows at
10^12-doc scale — one lineage row per (commit, sink), never the data plane),
so plain Python is the right altitude; the data-plane rewrite they plan is
executed by Spark in ``janitor.merge_splits``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field


# defaults: merge_policy_config.rs default_merge_factor/default_max_merge_factor/
# default_max_merge_ops/default_min_level_num_docs/default_maturation_period
DEFAULT_MERGE_FACTOR = 10
DEFAULT_MAX_MERGE_FACTOR = 12
DEFAULT_MAX_MERGE_OPS = 4
DEFAULT_MIN_LEVEL_NUM_DOCS = 100_000
DEFAULT_MATURATION_PERIOD_SECS = 48 * 3600
DEFAULT_SPLIT_NUM_DOCS_TARGET = 10_000_000


@dataclass
class SplitMeta:
    """The subset of SplitMetadata the merge policies read
    (metastore/src/metastore/mod.rs SplitMetadata: num_docs, time_range,
    create_timestamp, num_merge_ops, maturity)."""

    split_id: str
    num_docs: int
    time_range_end: int | None = None  # epoch seconds (or any ordered int)
    create_timestamp: int = 0
    num_merge_ops: int = 0
    # maturity as assigned at creation by split_maturity(): None = Mature,
    # else the maturation period in seconds (SplitMaturity::Immature)
    maturation_period_secs: float | None = None
    payload: dict = field(default_factory=dict)

    def is_mature(self, now_secs: float) -> bool:
        if self.maturation_period_secs is None:
            return True
        return self.create_timestamp + self.maturation_period_secs <= now_secs


def _cmp_by_reverse_time_end(left: SplitMeta, right: SplitMeta) -> int:
    """stable_log_merge_policy.rs:165-178 total order: reverse time end
    (missing time_range sorts last, matching Option<i64> None < Some
    reversed), then num_docs, then split_id for determinism."""

    def time_key(s: SplitMeta):
        # None < Some(x) in Rust Option ordering; after .reverse() a
        # missing time end is GREATER than any present one
        return (0, -s.time_range_end) if s.time_range_end is not None else (1, 0)

    lk, rk = time_key(left), time_key(right)
    if lk != rk:
        return -1 if lk < rk else 1
    if left.num_docs != right.num_docs:
        return -1 if left.num_docs < right.num_docs else 1
    if left.split_id != right.split_id:
        return -1 if left.split_id < right.split_id else 1
    return 0


class MergePolicy:
    """operations() drains merge groups out of ``splits`` (the remaining
    list is what stays un-merged), mirroring the reference trait."""

    def split_maturity(self, num_docs: int, num_merge_ops: int) -> float | None:
        raise NotImplementedError

    def operations(self, splits: list[SplitMeta], now_secs: float = 0.0) -> list[list[SplitMeta]]:
        raise NotImplementedError


class NoMergePolicy(MergePolicy):
    """merge_policy_config.rs `no_merge`: every split is immediately mature
    and no merge is ever planned (merge_policy/nop_merge_policy.rs)."""

    def split_maturity(self, num_docs: int, num_merge_ops: int) -> float | None:
        return None  # Mature

    def operations(self, splits, now_secs: float = 0.0):
        return []


class StableLogMergePolicy(MergePolicy):
    """Level-by-doc-count policy (stable_log_merge_policy.rs).

    Splits sorted by reverse time end are grouped into log-scale levels:
    level 0 ends at ``max(3 * first_split_docs, min_level_num_docs)`` docs,
    each next level at ``3 * first_split_docs_of_level``; a level yields at
    most one candidate per call, grown backwards from the level's end until
    max_merge_factor splits or split_num_docs_target docs."""

    def __init__(
        self,
        merge_factor: int = DEFAULT_MERGE_FACTOR,
        max_merge_factor: int = DEFAULT_MAX_MERGE_FACTOR,
        min_level_num_docs: int = DEFAULT_MIN_LEVEL_NUM_DOCS,
        maturation_period_secs: float = DEFAULT_MATURATION_PERIOD_SECS,
        split_num_docs_target: int = DEFAULT_SPLIT_NUM_DOCS_TARGET,
    ):
        if max_merge_factor < merge_factor:
            raise ValueError(
                "merge policy `max_merge_factor` must be superior or equal to `merge_factor`"
            )
        self.merge_factor = merge_factor
        self.max_merge_factor = max_merge_factor
        self.min_level_num_docs = min_level_num_docs
        self.maturation_period_secs = maturation_period_secs
        self.split_num_docs_target = split_num_docs_target

    # stable_log_merge_policy.rs:117-125
    def split_maturity(self, num_docs: int, num_merge_ops: int) -> float | None:
        if num_docs >= self.split_num_docs_target:
            return None  # Mature
        return self.maturation_period_secs

    # stable_log_merge_policy.rs:181-208
    def operations(self, splits: list[SplitMeta], now_secs: float = 0.0) -> list[list[SplitMeta]]:
        if len(splits) < 2:
            return []
        young = [s for s in splits if not s.is_mature(now_secs)]
        mature = [s for s in splits if s.is_mature(now_secs)]
        young.sort(key=functools.cmp_to_key(_cmp_by_reverse_time_end))
        ops: list[list[SplitMeta]] = []
        for level in reversed(self.build_split_levels(young)):
            rng = self._merge_candidate_from_level(young, level)
            if rng is not None:
                lo, hi = rng
                ops.append(young[lo:hi])
                del young[lo:hi]
        splits[:] = young + mature
        return ops

    # stable_log_merge_policy.rs:210-247
    def build_split_levels(self, splits: list[SplitMeta]) -> list[tuple[int, int]]:
        if any(s.num_docs >= self.split_num_docs_target for s in splits):
            raise ValueError(
                "All splits are expected to be smaller than `split_num_docs_target`."
            )
        if not splits:
            return []
        levels: list[tuple[int, int]] = []
        level_start = 0
        level_max_docs = max(splits[0].num_docs * 3, self.min_level_num_docs)
        for ord_, split in enumerate(splits):
            if split.num_docs >= level_max_docs:
                levels.append((level_start, ord_))
                level_start = ord_
                level_max_docs = 3 * split.num_docs
        levels.append((level_start, len(splits)))
        return levels

    # stable_log_merge_policy.rs:249-270
    def _merge_candidate_from_level(
        self, splits: list[SplitMeta], level: tuple[int, int]
    ) -> tuple[int, int] | None:
        level_start, level_end = level
        start = level_end
        for ord_ in range(level_end - 1, level_start - 1, -1):
            if self._candidate_size(splits[start:level_end]) == "one_more_too_big":
                break
            start = ord_
        if self._candidate_size(splits[start:level_end]) == "too_small":
            return None
        return start, level_end

    # stable_log_merge_policy.rs:272-297
    def _candidate_size(self, splits: list[SplitMeta]) -> str:
        if len(splits) <= 1:
            return "too_small"
        if len(splits) >= self.max_merge_factor:
            return "one_more_too_big"
        if sum(s.num_docs for s in splits) >= self.split_num_docs_target:
            return "one_more_too_big"
        if len(splits) < self.merge_factor:
            return "too_small"
        return "valid"


class ConstWriteAmplificationMergePolicy(MergePolicy):
    """`limit_merge` policy (const_write_amplification.rs:44-165): splits are
    grouped by their number of past merge ops; within a group, sorted by
    (create_timestamp, split_id), batches are built greedily up to
    max_merge_factor splits or split_num_docs_target docs; a split that has
    undergone max_merge_ops merges is mature and never merged again."""

    def __init__(
        self,
        merge_factor: int = DEFAULT_MERGE_FACTOR,
        max_merge_factor: int = DEFAULT_MAX_MERGE_FACTOR,
        max_merge_ops: int = DEFAULT_MAX_MERGE_OPS,
        maturation_period_secs: float = DEFAULT_MATURATION_PERIOD_SECS,
        split_num_docs_target: int = DEFAULT_SPLIT_NUM_DOCS_TARGET,
    ):
        if max_merge_factor < merge_factor:
            raise ValueError(
                "merge policy `max_merge_factor` must be superior or equal to `merge_factor`"
            )
        self.merge_factor = merge_factor
        self.max_merge_factor = max_merge_factor
        self.max_merge_ops = max_merge_ops
        self.maturation_period_secs = maturation_period_secs
        self.split_num_docs_target = split_num_docs_target

    # const_write_amplification.rs:231-241
    def split_maturity(self, num_docs: int, num_merge_ops: int) -> float | None:
        if num_merge_ops >= self.max_merge_ops:
            return None
        if num_docs >= self.split_num_docs_target:
            return None
        return self.maturation_period_secs

    # const_write_amplification.rs:144-165
    def operations(self, splits: list[SplitMeta], now_secs: float = 0.0) -> list[list[SplitMeta]]:
        young: dict[int, list[SplitMeta]] = {}
        keep = []
        for s in splits:
            if s.is_mature(now_secs):
                keep.append(s)
            else:
                young.setdefault(s.num_merge_ops, []).append(s)
        ops: list[list[SplitMeta]] = []
        for group in young.values():
            group.sort(key=lambda s: (s.create_timestamp, s.split_id))
            while True:
                op = self._single_op(group)
                if op is None:
                    break
                ops.append(op)
            keep.extend(group)
        splits[:] = keep
        return ops

    # const_write_amplification.rs:94-118
    def _single_op(self, group: list[SplitMeta]) -> list[SplitMeta] | None:
        n_splits = 0
        n_docs = 0
        for s in group[: self.max_merge_factor]:
            n_docs += s.num_docs
            n_splits += 1
            if n_docs >= self.split_num_docs_target:
                break
        if n_docs < self.split_num_docs_target and n_splits < self.merge_factor:
            return None
        if n_splits < 2:
            return None
        op = group[:n_splits]
        del group[:n_splits]
        return op


def merge_policy_from_config(
    cfg: dict | None,
    split_num_docs_target: int = DEFAULT_SPLIT_NUM_DOCS_TARGET,
) -> MergePolicy:
    """Build a policy from the reference's ``indexing_settings.merge_policy``
    config shape (merge_policy_config.rs:207-218 serde enum): ``{"type":
    "no_merge"}`` / ``{"type": "limit_merge", ...}`` / ``{"type":
    "stable_log" | "default", ...}``; absent config → stable_log defaults.
    Raises ValueError on unknown types or max_merge_factor < merge_factor
    (merge_policy_config.rs:236-249 validate)."""
    if not cfg:
        return StableLogMergePolicy(split_num_docs_target=split_num_docs_target)
    ptype = cfg.get("type", "stable_log")
    common = dict(
        merge_factor=int(cfg.get("merge_factor", DEFAULT_MERGE_FACTOR)),
        max_merge_factor=int(cfg.get("max_merge_factor", DEFAULT_MAX_MERGE_FACTOR)),
        maturation_period_secs=parse_human_duration_secs(
            cfg.get("maturation_period", "48 hours")
        ),
        split_num_docs_target=split_num_docs_target,
    )
    if ptype == "no_merge":
        extra = set(cfg) - {"type"}
        if extra:
            raise ValueError(f"no_merge policy takes no parameters, got {sorted(extra)}")
        return NoMergePolicy()
    if ptype == "limit_merge":
        return ConstWriteAmplificationMergePolicy(
            max_merge_ops=int(cfg.get("max_merge_ops", DEFAULT_MAX_MERGE_OPS)),
            **common,
        )
    if ptype in ("stable_log", "default"):
        return StableLogMergePolicy(
            min_level_num_docs=int(
                cfg.get("min_level_num_docs", DEFAULT_MIN_LEVEL_NUM_DOCS)
            ),
            **common,
        )
    raise ValueError(f"unknown merge policy type {ptype!r}")


_DUR_UNITS = {
    "s": 1, "sec": 1, "secs": 1, "second": 1, "seconds": 1,
    "m": 60, "min": 60, "mins": 60, "minute": 60, "minutes": 60,
    "h": 3600, "hour": 3600, "hours": 3600,
    "d": 86400, "day": 86400, "days": 86400,
    "w": 7 * 86400, "week": 7 * 86400, "weeks": 7 * 86400,
}


def parse_human_duration_secs(value) -> float:
    """humantime-style duration subset ("48 hours", "30s", "2 days")
    (merge_policy_config.rs:190-199 parse_human_duration)."""
    if isinstance(value, (int, float)):
        return float(value)
    text = str(value).strip().lower()
    total = 0.0
    matched = False
    import re

    for num, unit in re.findall(r"(\d+(?:\.\d+)?)\s*([a-z]+)", text):
        if unit not in _DUR_UNITS:
            raise ValueError(f"failed to parse human-readable duration {value!r}")
        total += float(num) * _DUR_UNITS[unit]
        matched = True
    if not matched:
        raise ValueError(f"failed to parse human-readable duration {value!r}")
    return total
