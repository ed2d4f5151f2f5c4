"""Mergeable-sketch plane (operators/sketches.py) + the sampling/split and
SLO-burn operators landed alongside it.

Reference contract: the sketch-split lifecycle in
quickwit-metastore/src/metastore/postgres/metastore.rs:46-52 and the
dedicated sketch merge policy (quickwit-config/src/merge_policy_config.rs:136)
require every sketch to be a small table of MERGEABLE partials — these tests
pin exactly that algebra: merge(build(A), build(B)) == build(A ∪ B), plus the
estimators' accuracy and one-sided guarantees.
"""

import math

import pytest
from pyspark.sql import Row, functions as F

from quickwit_spark.operators import corpus as CP
from quickwit_spark.operators import sketches as SK
from quickwit_spark.operators import timeseries as TS


def _ids(spark, n, start=0, parts=4):
    return spark.range(start, start + n, 1, parts).withColumnRenamed("id", "item")


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------


def test_hll_mix_parity_spark_python_duckdb(spark):
    # The register/rho split depends on this hash bit-for-bit: pin the
    # Spark Column expression and the DuckDB restatement to the same
    # reference values so the oracle can reproduce registers exactly.
    import duckdb

    MASK = (1 << 31) - 1

    def py_mix(x):
        h = (x ^ (x >> 31)) & MASK
        for _ in range(3):
            h = (h * 0x45D9F3B) & MASK
            h = h ^ (h >> 16)
        return h

    vals = [0, 1, 42, 2147483646, 10**12, 10**18, 255, 256]
    df = spark.createDataFrame([Row(x=v) for v in vals])
    got = {
        r["x"]: r["h"]
        for r in df.select("x", SK.hll_mix(F.col("x")).alias("h")).collect()
    }
    con = duckdb.connect()
    sql = SK.hll_mix_sql("x")
    for v in vals:
        assert got[v] == py_mix(v), v
        (dk,) = con.execute(f"SELECT {sql} FROM (SELECT ?::BIGINT AS x)", [v]).fetchone()
        assert dk == py_mix(v), v


def test_hll_estimate_accuracy(spark):
    # 10_000 distinct int64 items, p=8 → m=256 registers; HLL's standard
    # error is 1.04/sqrt(m) ≈ 6.5%. Assert within 3 sigma.
    n = 10_000
    df = _ids(spark, n).withColumn("g", F.lit("a"))
    est = SK.hll_estimate(SK.hll_build(df, ["g"], F.col("item")), ["g"]).collect()[0]
    assert abs(est["est_distinct"] - n) / n < 3 * 1.04 / math.sqrt(256)


def test_hll_duplicates_do_not_move_registers(spark):
    # Distinct-ness: unioning the same items 5x yields bit-identical
    # registers (max is idempotent) and therefore the identical estimate.
    df = _ids(spark, 3_000).withColumn("g", F.lit("a"))
    df5 = df
    for _ in range(4):
        df5 = df5.unionByName(df)
    a = sorted(map(tuple, SK.hll_build(df, ["g"], F.col("item")).collect()))
    b = sorted(map(tuple, SK.hll_build(df5, ["g"], F.col("item")).collect()))
    assert a == b


def test_hll_merge_equals_rebuild(spark):
    # The compaction contract: merging two halves' registers == building
    # over the union, register-exact (not just estimate-close).
    a = _ids(spark, 4_000).withColumn("g", F.lit("x"))
    b = _ids(spark, 4_000, start=2_000).withColumn("g", F.lit("x"))  # overlap
    sa = SK.hll_build(a, ["g"], F.col("item"))
    sb = SK.hll_build(b, ["g"], F.col("item"))
    merged = sorted(map(tuple, SK.hll_merge(sa.unionByName(sb), ["g"]).collect()))
    direct = sorted(
        map(tuple, SK.hll_build(a.unionByName(b), ["g"], F.col("item")).collect())
    )
    assert merged == direct


def test_hll_linear_counting_small_range(spark):
    # 40 distinct << m=256 → the small-range (linear counting) branch; its
    # error at this load factor is well under 5%.
    df = _ids(spark, 40).withColumn("g", F.lit("a"))
    est = SK.hll_estimate(SK.hll_build(df, ["g"], F.col("item")), ["g"]).collect()[0]
    assert abs(est["est_distinct"] - 40) / 40 < 0.05


def test_hll_per_key_groups_are_independent(spark):
    # Two key groups with different cardinalities estimate independently.
    df = _ids(spark, 6_000).withColumn(
        "g", F.when(F.col("item") < 1_000, "small").otherwise("big")
    )
    rows = {
        r["g"]: r["est_distinct"]
        for r in SK.hll_estimate(SK.hll_build(df, ["g"], F.col("item")), ["g"]).collect()
    }
    assert abs(rows["small"] - 1_000) / 1_000 < 0.20
    assert abs(rows["big"] - 5_000) / 5_000 < 0.20


# --------------------------------------------------------------------------
# KMV / bottom-k theta
# --------------------------------------------------------------------------


def test_kmv_estimate_accuracy_and_exact_degrade(spark):
    # Above k the (k-1)*SPACE/h_k estimator applies (σ ≈ n/sqrt(k-2));
    # below k the sketch IS the distinct set and the estimate is exact.
    n = 20_000
    df = _ids(spark, n).withColumn("g", F.lit("a"))
    est = SK.kmv_estimate(SK.kmv_build(df, ["g"], F.col("item"), k=256), ["g"], k=256)
    row = est.collect()[0]
    assert abs(row["est_distinct"] - n) / n < 3 / math.sqrt(254)

    small = _ids(spark, 57).withColumn("g", F.lit("a"))
    row = SK.kmv_estimate(
        SK.kmv_build(small, ["g"], F.col("item"), k=256), ["g"], k=256
    ).collect()[0]
    assert row["est_distinct"] == 57.0 and row["n_vals"] == 57


def test_kmv_merge_equals_rebuild(spark):
    a = _ids(spark, 5_000).withColumn("g", F.lit("x"))
    b = _ids(spark, 5_000, start=3_000).withColumn("g", F.lit("x"))
    sa = SK.kmv_build(a, ["g"], F.col("item"), k=128)
    sb = SK.kmv_build(b, ["g"], F.col("item"), k=128)
    merged = sorted(map(tuple, SK.kmv_merge(sa, sb, ["g"], k=128).collect()))
    direct = sorted(
        map(tuple, SK.kmv_build(a.unionByName(b), ["g"], F.col("item"), k=128).collect())
    )
    assert merged == direct


def test_kmv_set_ops_jaccard(spark):
    # |A|=8000, |B|=8000, |A∩B|=4000 → J = 4000/12000 = 1/3. Bottom-k
    # Jaccard is hypergeometric around J; k=512 → σ ≈ sqrt(J(1-J)/k) ≈ 2.1%.
    a = SK.kmv_build(_ids(spark, 8_000), [], F.col("item"), k=512)
    b = SK.kmv_build(_ids(spark, 8_000, start=4_000), [], F.col("item"), k=512)
    row = SK.kmv_set_ops(a, b, k=512).collect()[0]
    assert abs(row["jaccard_est"] - 1 / 3) < 3 * math.sqrt((1 / 3) * (2 / 3) / 512)
    assert abs(row["union_est"] - 12_000) / 12_000 < 0.15
    assert abs(row["intersect_est"] - 4_000) / 4_000 < 0.25


def test_kmv_hash_collision_free_on_range(spark):
    n = 50_000
    df = _ids(spark, n)
    assert df.select(SK.kmv_hash(F.col("item")).alias("h")).distinct().count() == n


# --------------------------------------------------------------------------
# Count-Min
# --------------------------------------------------------------------------


def _zipf_items(spark):
    # item i appears (100 - i) times for i in 0..99 → heavy head, known truth.
    rows = [Row(item=i) for i in range(100) for _ in range(100 - i)]
    return spark.createDataFrame(rows), {i: 100 - i for i in range(100)}


def test_cms_one_sided_and_heavy_hitters(spark):
    df, truth = _zipf_items(spark)
    sk = SK.cms_build(df, F.col("item"), depth=4, width=512)
    cand = spark.createDataFrame([Row(item=i) for i in range(100)])
    got = {
        r["item"]: r["est_count"]
        for r in SK.cms_query(sk, cand, "item", depth=4, width=512).collect()
    }
    # CMS guarantee: est >= true always; with 100 items in 512 columns the
    # min-over-4-rows is exact for nearly everything — allow small overcount.
    for i, true in truth.items():
        assert got[i] >= true
        assert got[i] <= true + 200  # eps*N bound: e/512 * 5050 ≈ 27 per row
    # the head must be exactly ranked by estimates
    top5 = sorted(got, key=lambda i: (-got[i], i))[:5]
    assert top5 == [0, 1, 2, 3, 4]


def test_cms_missing_item_and_merge(spark):
    df, _ = _zipf_items(spark)
    half1 = df.where(F.col("item") % 2 == 0)
    half2 = df.where(F.col("item") % 2 == 1)
    direct = SK.cms_build(df, F.col("item"))
    merged = SK.cms_merge(
        SK.cms_build(half1, F.col("item")), SK.cms_build(half2, F.col("item"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, merged.collect()))
    # an item never inserted can still alias (one-sided), but with this
    # tiny load every absent probe hits a zero column
    cand = spark.createDataFrame([Row(item=10_000_019)])
    est = SK.cms_query(direct, cand, "item").collect()[0]["est_count"]
    assert est >= 0


def test_cms_weighted(spark):
    df = spark.createDataFrame([Row(item=7, w=5), Row(item=7, w=3), Row(item=9, w=2)])
    sk = SK.cms_build(df, F.col("item"), weight=F.col("w"))
    cand = spark.createDataFrame([Row(item=7), Row(item=9)])
    got = {r["item"]: r["est_count"] for r in SK.cms_query(sk, cand, "item").collect()}
    assert got[7] == 8 and got[9] == 2


def test_cms_depth_cap(spark):
    df = spark.createDataFrame([Row(item=1)])
    with pytest.raises(ValueError):
        SK.cms_build(df, F.col("item"), depth=9)


# --------------------------------------------------------------------------
# portable string hash
# --------------------------------------------------------------------------


def test_portable_string_hash_matches_python_and_duckdb(spark):
    import duckdb

    vals = ["", "a", "conv_000001", "conv_000002", "αβγ", "same-prefix-xxxxxxxx-1"]
    df = spark.createDataFrame([Row(s=v) for v in vals])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", SK.portable_string_hash(F.col("s")).alias("h")).collect()
    }

    def py_hash(s):
        acc = 0
        for ch in s:
            acc = (acc * 31 + ord(ch)) % 2147483647
        return acc

    for v in vals:
        assert got[v] == py_hash(v), v

    con = duckdb.connect()
    sql = SK.portable_string_hash_sql("s")
    for v in vals:
        (dk,) = con.execute(f"SELECT {sql} FROM (SELECT ? AS s)", [v]).fetchone()
        assert dk == py_hash(v), v


# --------------------------------------------------------------------------
# weighted sampling (Efraimidis–Spirakis A-ES)
# --------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_partition_independent(spark):
    df1 = spark.range(0, 2_000, 1, 2).withColumn("w", (F.col("id") % 7 + 1).cast("double"))
    df8 = spark.range(0, 2_000, 1, 8).withColumn("w", (F.col("id") % 7 + 1).cast("double"))
    s1 = sorted(r["id"] for r in CP.weighted_sample(df1, "id", "w", 50).collect())
    s8 = sorted(r["id"] for r in CP.weighted_sample(df8, "id", "w", 50).collect())
    assert s1 == s8 and len(s1) == 50


def test_weighted_sample_respects_weights(spark):
    # 500 heavy rows (w=50) vs 4500 light rows (w=1): heavy mass fraction is
    # 25000/29500 ≈ 0.847 — a k=200 sample must be dominated by heavy rows.
    df = spark.range(0, 5_000).withColumn(
        "w", F.when(F.col("id") < 500, 50.0).otherwise(1.0)
    )
    got = CP.weighted_sample(df, "id", "w", 200).collect()
    heavy = sum(1 for r in got if r["id"] < 500)
    assert heavy > 120  # ≈169 expected; binomial 3σ ≈ ±16


def test_weighted_sample_excludes_nonpositive(spark):
    df = spark.range(0, 100).withColumn(
        "w", F.when(F.col("id") < 90, -1.0).otherwise(2.0)
    )
    got = CP.weighted_sample(df, "id", "w", 50).collect()
    assert len(got) == 10 and all(r["id"] >= 90 for r in got)


# --------------------------------------------------------------------------
# group-aware dataset split
# --------------------------------------------------------------------------


def test_dataset_split_group_atomicity_and_fractions(spark):
    # 5000 rows in 500 conv groups: every group lands wholly in one split
    # and fractions land near 80/10/10.
    df = spark.range(0, 5_000).withColumn("conv", F.col("id") % 500)
    out = CP.dataset_split(df, "conv", {"train": 0.8, "val": 0.1, "test": 0.1})
    per_group = out.groupBy("conv").agg(F.countDistinct("split").alias("n")).collect()
    assert all(r["n"] == 1 for r in per_group)
    counts = {r["split"]: r["cnt"] for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert abs(counts["train"] - 4_000) < 300
    assert abs(counts.get("val", 0) - 500) < 200
    assert abs(counts.get("test", 0) - 500) < 200


def test_dataset_split_subset_invariance(spark):
    # The leakage rule: adding/removing rows can never move a group. The
    # assignment computed over a 10% subset equals the full-frame assignment
    # restricted to that subset.
    df = spark.range(0, 3_000).withColumn("conv", F.col("id") % 300)
    full = {
        (r["conv"], r["split"])
        for r in CP.dataset_split(df, "conv", {"train": 0.9, "test": 0.1})
        .select("conv", "split")
        .distinct()
        .collect()
    }
    sub = df.where(F.col("id") % 10 == 3)
    subset = {
        (r["conv"], r["split"])
        for r in CP.dataset_split(sub, "conv", {"train": 0.9, "test": 0.1})
        .select("conv", "split")
        .distinct()
        .collect()
    }
    assert subset <= full


def test_dataset_split_string_groups(spark):
    df = spark.createDataFrame(
        [Row(conv=f"conv_{i:05d}", turn=t) for i in range(200) for t in range(3)]
    )
    out = CP.dataset_split(df, "conv", {"train": 0.5, "test": 0.5})
    per_group = out.groupBy("conv").agg(F.countDistinct("split").alias("n")).collect()
    assert all(r["n"] == 1 for r in per_group)
    counts = {r["split"]: r["cnt"] for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    # full-string hash must spread shared-prefix ids: both splits populated
    assert counts["train"] > 150 and counts["test"] > 150


def test_dataset_split_bad_fractions(spark):
    df = spark.range(5)
    with pytest.raises(ValueError):
        CP.dataset_split(df, "id", {"a": 0.5, "b": 0.2})


# --------------------------------------------------------------------------
# SLO burn rate
# --------------------------------------------------------------------------


def test_slo_burn_rate_multiwindow(spark):
    # One series, 1-minute grain, budget 10%. Minutes 0-9 clean; minutes
    # 10-14 burn at 50% error; minutes 15-19 clean again. With short=5m,
    # long=15m, threshold 1: the alert must be up during the burn (short
    # ratio 0.5 → burn 5; long accumulates past 0.1 → burn > 1), down
    # before it, and reset once the SHORT window clears even while the long
    # window is still elevated — the fast-reset property the rule exists for.
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = []
    for minute in range(20):
        err_rate = 0.5 if 10 <= minute < 15 else 0.0
        for i in range(10):
            rows.append(
                Row(
                    svc="api",
                    ts=t0 + timedelta(minutes=minute, seconds=i),
                    is_err=(i < 10 * err_rate),
                )
            )
    df = spark.createDataFrame(rows)
    out = TS.slo_burn_rate(
        df,
        ["svc"],
        "ts",
        F.col("is_err"),
        budget=0.1,
        short_minutes=5,
        long_minutes=15,
        threshold=1.0,
        grain_minutes=1,
    ).orderBy("bucket")
    got = out.collect()
    assert len(got) == 20
    by_min = {(r["bucket"].minute): r for r in got}
    # clean prefix: no alert
    for m in range(10):
        assert not by_min[m]["alert"], m
    # burn window: both burns over threshold from minute 11 on (minute 10's
    # long window still dilutes below budget? long ratio at m=10 is
    # 10/110 ≈ 0.09 < 0.1 → burn just under 1; by m=11 it crosses)
    assert by_min[12]["alert"] and by_min[14]["alert"]
    # trailing 5m window at m=12 spans m8..m12 (3 burning of 5) → 0.3/0.1 = 3;
    # at m=14 the window is fully inside the burn → 0.5/0.1 = 5.
    assert by_min[12]["short_burn"] == pytest.approx(3.0)
    assert by_min[14]["short_burn"] == pytest.approx(5.0)
    # fast reset: 5 clean minutes later the short window is clean even
    # though the long window still carries the burn
    assert not by_min[19]["alert"]
    assert by_min[19]["long_burn"] > 1.0  # long alone would still page


def test_slo_burn_rate_gap_semantics(spark):
    # RANGE frames are time-based: a 3-bucket gap must NOT stretch the
    # short window over more wall-clock — the bucket after the gap sees
    # only itself in a 2-minute window.
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [Row(svc="s", ts=t0, is_err=True)]
    rows += [Row(svc="s", ts=t0 + timedelta(minutes=5), is_err=False)]
    df = spark.createDataFrame(rows)
    out = TS.slo_burn_rate(
        df, ["svc"], "ts", F.col("is_err"), budget=0.5,
        short_minutes=2, long_minutes=10, grain_minutes=1,
    ).orderBy("bucket").collect()
    assert out[1]["short_ratio"] == 0.0  # gap excluded the old error
    assert out[1]["long_ratio"] == 0.5  # long window still spans both
