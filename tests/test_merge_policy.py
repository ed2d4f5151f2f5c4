"""Merge-policy parity tests replaying the reference's own unit vectors
(stable_log_merge_policy.rs tests:366-570, const_write_amplification.rs
tests:283-400, merge_policy_config.rs validate)."""

import pytest

from quickwit_spark.pipeline.merge_policy import (
    ConstWriteAmplificationMergePolicy,
    NoMergePolicy,
    SplitMeta,
    StableLogMergePolicy,
    merge_policy_from_config,
    parse_human_duration_secs,
)

NOW = 1_700_000_000.0


def create_splits(policy, num_docs_vec, create_timestamp=int(NOW), num_merge_ops=0):
    """merge_policy/mod.rs:351-381 create_splits: identical time ranges so the
    deterministic split_id tiebreak decides order."""
    return [
        SplitMeta(
            split_id=f"split_{i:02d}",
            num_docs=n,
            time_range_end=1630564067,
            create_timestamp=create_timestamp,
            num_merge_ops=num_merge_ops,
            maturation_period_secs=policy.split_maturity(n, num_merge_ops),
        )
        for i, n in enumerate(num_docs_vec)
    ]


# --- StableLog: build_split_levels (stable_log tests:391-444) ---------------


def test_build_split_levels_empty():
    assert StableLogMergePolicy().build_split_levels([]) == []


def test_build_split_levels_simple():
    p = StableLogMergePolicy()
    splits = create_splits(p, [100_000, 100_000, 100_000, 800_000, 900_000])
    assert p.build_split_levels(splits) == [(0, 3), (3, 5)]


def test_build_split_levels_perfect_world():
    p = StableLogMergePolicy()
    splits = create_splits(
        p, [100_000] * 8 + [800_000, 1_600_000]
    )
    assert p.build_split_levels(splits) == [(0, 8), (8, 10)]


def test_build_split_levels_decreasing():
    p = StableLogMergePolicy()
    splits = create_splits(
        p, [100_000] * 8 + [800_000, 100_000, 1_600_000]
    )
    assert p.build_split_levels(splits) == [(0, 8), (8, 11)]


def test_build_split_levels_rejects_mature_sized_split():
    p = StableLogMergePolicy()
    splits = create_splits(p, [11_000_000])
    with pytest.raises(ValueError, match="smaller than"):
        p.build_split_levels(splits)


# --- StableLog: operations (stable_log tests:446-566) -----------------------


def test_stable_log_not_enough_splits():
    p = StableLogMergePolicy()
    splits = create_splits(p, [100] * 7)
    assert p.operations(splits, NOW) == []
    assert len(splits) == 7


def test_stable_log_just_enough_for_a_merge():
    p = StableLogMergePolicy()
    splits = create_splits(p, [100] * 10)
    ops = p.operations(splits, NOW)
    assert splits == []
    assert len(ops) == 1
    assert sorted(s.split_id for s in ops[0]) == [f"split_{i:02d}" for i in range(10)]


def test_stable_log_many_splits_same_level():
    p = StableLogMergePolicy()
    splits = create_splits(p, [100] * 13)
    ops = p.operations(splits, NOW)
    assert [s.split_id for s in splits] == ["split_00"]
    assert len(ops) == 1
    assert sorted(s.split_id for s in ops[0]) == [f"split_{i:02d}" for i in range(1, 13)]


def test_stable_log_splits_below_min_level():
    p = StableLogMergePolicy()
    splits = create_splits(
        p, [100, 1000, 10_000, 10_000, 10_000, 10_000, 10_000, 40_000, 40_000, 40_000]
    )
    ops = p.operations(splits, NOW)
    assert splits == []
    assert len(ops) == 1
    assert sorted(s.split_id for s in ops[0]) == [f"split_{i:02d}" for i in range(10)]


def test_stable_log_splits_above_min_level_no_merge():
    p = StableLogMergePolicy()
    splits = create_splits(p, [100_000] + [1_000_000] * 7)
    ops = p.operations(splits, NOW)
    assert ops == []
    assert len(splits) == 8


def test_stable_log_mature_split_is_ignored():
    p = StableLogMergePolicy()
    splits = create_splits(
        p, [100_000] * 5 + [10_000_000] + [100_000] * 5
    )
    ops = p.operations(splits, NOW)
    assert len(ops) == 1
    assert len(ops[0]) == 10
    assert [s.num_docs for s in splits] == [10_000_000]


def test_stable_log_maturity():
    p = StableLogMergePolicy()
    assert p.split_maturity(9_000_000, 0) == 48 * 3600
    assert p.split_maturity(10_000_001, 0) is None
    # age-based maturity: created 49h ago with a 48h maturation period
    old = SplitMeta("old", 100, maturation_period_secs=48 * 3600,
                    create_timestamp=int(NOW) - 49 * 3600)
    assert old.is_mature(NOW)
    fresh = SplitMeta("fresh", 100, maturation_period_secs=48 * 3600,
                      create_timestamp=int(NOW))
    assert not fresh.is_mature(NOW)


# --- ConstWriteAmplification (const_write_amplification.rs tests) -----------


def cwa_for_test():
    # const_write_amplification.rs for_test(): max_merge_ops=3, mf=3, mmf=5,
    # maturation 1h, target 10M
    return ConstWriteAmplificationMergePolicy(
        merge_factor=3, max_merge_factor=5, max_merge_ops=3,
        maturation_period_secs=3600, split_num_docs_target=10_000_000,
    )


def test_cwa_maturity():
    p = cwa_for_test()
    assert p.split_maturity(9_000_000, 0) == 3600
    assert p.split_maturity(10_000_001, 0) is None
    assert p.split_maturity(9_000_000, 3) is None  # num_merge_ops >= max


def test_cwa_empty_and_single():
    p = cwa_for_test()
    assert p.operations([], NOW) == []
    splits = [SplitMeta("s", 1, create_timestamp=int(NOW), num_merge_ops=4,
                        maturation_period_secs=p.split_maturity(1, 4))]
    assert p.operations(splits, NOW) == []
    assert len(splits) == 1


def test_cwa_simple():
    p = cwa_for_test()
    splits = [
        SplitMeta(f"split-{i}", 1000, create_timestamp=int(NOW), num_merge_ops=1,
                  maturation_period_secs=p.split_maturity(1000, 1))
        for i in range(p.merge_factor)
    ]
    ops = p.operations(splits, NOW)
    assert len(ops) == 1 and len(ops[0]) == p.merge_factor
    assert splits == []


def test_cwa_merge_factor_max():
    p = cwa_for_test()
    n = p.max_merge_factor + p.merge_factor - 1
    splits = [
        SplitMeta(f"split-{i}", 1000, create_timestamp=int(NOW), num_merge_ops=1,
                  maturation_period_secs=p.split_maturity(1000, 1))
        for i in range(n)
    ]
    ops = p.operations(splits, NOW)
    assert len(ops) == 1 and len(ops[0]) == p.max_merge_factor
    assert len(splits) == n - p.max_merge_factor


def test_cwa_older_first_and_shuffle_invariant():
    import random

    p = cwa_for_test()
    splits = [
        SplitMeta(f"split-{i}", 1000, create_timestamp=int(NOW) + i, num_merge_ops=1,
                  maturation_period_secs=p.split_maturity(1000, 1))
        for i in range(p.max_merge_factor)
    ]
    random.Random(7).shuffle(splits)
    ops = p.operations(splits, NOW + 100)
    assert len(ops) == 1
    # oldest first, deterministically ordered by creation time
    assert [s.split_id for s in ops[0]] == [f"split-{i}" for i in range(5)]


def test_cwa_does_not_mix_num_merge_ops_levels():
    p = cwa_for_test()
    splits = []
    for ops_level in (0, 1):
        for i in range(3):
            splits.append(
                SplitMeta(f"s{ops_level}-{i}", 1000, create_timestamp=int(NOW),
                          num_merge_ops=ops_level,
                          maturation_period_secs=p.split_maturity(1000, ops_level))
            )
    ops = p.operations(splits, NOW)
    assert len(ops) == 2
    for op in ops:
        assert len({s.num_merge_ops for s in op}) == 1


# --- config enum (merge_policy_config.rs:207-250) ---------------------------


def test_policy_config_parse():
    assert isinstance(merge_policy_from_config(None), StableLogMergePolicy)
    assert isinstance(merge_policy_from_config({"type": "no_merge"}), NoMergePolicy)
    p = merge_policy_from_config(
        {"type": "limit_merge", "max_merge_ops": 2, "merge_factor": 4})
    assert isinstance(p, ConstWriteAmplificationMergePolicy)
    assert p.max_merge_ops == 2 and p.merge_factor == 4
    p2 = merge_policy_from_config(
        {"type": "default", "min_level_num_docs": 50_000})
    assert isinstance(p2, StableLogMergePolicy)
    assert p2.min_level_num_docs == 50_000
    with pytest.raises(ValueError, match="unknown merge policy"):
        merge_policy_from_config({"type": "bogus"})
    with pytest.raises(ValueError, match="max_merge_factor"):
        merge_policy_from_config({"type": "stable_log", "merge_factor": 20})
    with pytest.raises(ValueError, match="no parameters"):
        merge_policy_from_config({"type": "no_merge", "merge_factor": 3})


def test_duration_parse():
    assert parse_human_duration_secs("48 hours") == 48 * 3600
    assert parse_human_duration_secs("30s") == 30
    assert parse_human_duration_secs("2 days") == 2 * 86400
    assert parse_human_duration_secs("1h 30m") == 5400
    with pytest.raises(ValueError):
        parse_human_duration_secs("eleventy")


# --- plan_merges integration: level isolation ------------------------------


def test_plan_merges_respects_levels():
    """The write-amplification guard the levels exist for: a 9M-doc split
    must NOT be rewritten together with tiny splits (VERDICT r3 item 3)."""
    from quickwit_spark.pipeline.janitor import plan_merges

    rows = [{"commit_id": "big", "num_docs": 9_000_000}]
    rows += [{"commit_id": f"c{i:02d}", "num_docs": 100} for i in range(12)]
    groups = plan_merges(rows)
    assert len(groups) == 1
    assert len(groups[0]) == 12
    assert "big" not in groups[0]


def test_plan_merges_no_merge_policy():
    from quickwit_spark.pipeline.janitor import plan_merges

    rows = [{"commit_id": f"c{i}", "num_docs": 100} for i in range(20)]
    assert plan_merges(rows, policy=NoMergePolicy()) == []


def test_plan_merges_docs_target_cap():
    """A candidate stops growing once it reaches split_num_docs_target:
    ten 4M-doc splits merge in pairs-of-three, never all ten."""
    from quickwit_spark.pipeline.janitor import plan_merges

    rows = [{"commit_id": f"c{i}", "num_docs": 4_000_000} for i in range(9)]
    groups = plan_merges(rows, merge_factor=2, max_merge_factor=12)
    assert groups, "pairs should merge"
    for g in groups:
        # 3 × 4M ≥ 10M target → candidate closes at 3 splits
        assert len(g) <= 3


def test_janitor_cycle_accepts_policy_config(spark, tmp_path_factory):
    """janitor_cycle threads the index config's merge_policy enum through:
    no_merge leaves every commit untouched."""
    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.janitor import (
        build_time_partitioned_index,
        janitor_cycle,
        read_lineage,
    )

    out = str(tmp_path_factory.mktemp("jc_policy") / "idx")
    rows = [(i, f"e{i % 2}", f"2024-01-{1 + i % 9:02d}T00:00:00") for i in range(200)]
    df = (
        spark.createDataFrame(rows, ["event_id", "event_type", "ts_str"])
        .withColumn("ts", F.to_timestamp("ts_str"))
        .drop("ts_str")
    )
    build_time_partitioned_index(spark, df, out, sink_expr=F.col("event_type"),
                                 source_id="ev")
    n_before = read_lineage(spark, out).select("commit_id").distinct().count()
    res = janitor_cycle(spark, out, merge_policy_config={"type": "no_merge"})
    assert res["merge"]["merged"] == []
    assert read_lineage(spark, out).select("commit_id").distinct().count() == n_before
    # stable_log config with small factors DOES merge the 9 tiny day-commits
    res2 = janitor_cycle(
        spark, out,
        merge_policy_config={"type": "stable_log", "merge_factor": 3,
                             "max_merge_factor": 5},
    )
    assert res2["merge"]["merged"]
