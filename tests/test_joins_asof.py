"""As-of / interval range join semantics (operators/joins.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from quickwit_spark.operators.joins import asof_join, range_join_intervals


@pytest.fixture()
def frames(spark):
    facts = spark.createDataFrame(
        [
            Row(fid=1, key="a", ts=5, v=1.0),
            Row(fid=2, key="a", ts=10, v=2.0),   # equal to an update ts
            Row(fid=3, key="a", ts=11, v=3.0),
            Row(fid=4, key="b", ts=3, v=4.0),    # before b's first update
            Row(fid=5, key="b", ts=100, v=5.0),
            Row(fid=6, key="c", ts=7, v=6.0),    # key with no dim rows
        ]
    )
    dim = spark.createDataFrame(
        [
            Row(key="a", ts=1, tier="bronze", region="eu"),
            Row(key="a", ts=10, tier="silver", region="us"),
            Row(key="a", ts=20, tier="gold", region="ap"),
            Row(key="b", ts=50, tier="gold", region="eu"),
        ]
    )
    return facts, dim


def test_asof_backward_inclusive_left(spark, frames):
    facts, dim = frames
    out = asof_join(facts, dim, on="key", ts_fact="ts", ts_dim="ts").orderBy("fid")
    rows = {r.fid: (r.tier, r.region) for r in out.collect()}
    assert rows == {
        1: ("bronze", "eu"),   # latest at-or-before ts=5 is ts=1
        2: ("silver", "us"),   # INCLUSIVE: update at ts=10 applies at ts=10
        3: ("silver", "us"),
        4: (None, None),       # before first update → left null
        5: ("gold", "eu"),
        6: (None, None),       # no dim rows at all
    }
    # all fact columns survive untouched
    assert out.columns == ["fid", "key", "ts", "v"] + ["tier", "region"]


def test_asof_inner_drops_stateless_facts(spark, frames):
    facts, dim = frames
    out = asof_join(facts, dim, on="key", ts_fact="ts", ts_dim="ts", how="inner")
    assert sorted(r.fid for r in out.collect()) == [1, 2, 3, 5]


def test_asof_inner_keeps_null_payload_matches(spark):
    """r6 fix (r5 verdict wart #4): inner mode must key on an explicit
    match marker, not on the first payload column being null — a dim row
    whose payload legitimately holds NULL is still a match."""
    facts = spark.createDataFrame(
        [Row(fid=1, key="a", ts=5), Row(fid=2, key="b", ts=5)]
    )
    dim = spark.createDataFrame(
        [Row(key="a", ts=1, tier=None, region="eu")],
        "key string, ts long, tier string, region string",
    )
    out = asof_join(facts, dim, on="key", ts_fact="ts", ts_dim="ts", how="inner")
    rows = {r.fid: (r.tier, r.region) for r in out.collect()}
    # fid=1 matched a dim row with a NULL first payload → must survive;
    # fid=2 has no dim state → dropped
    assert rows == {1: (None, "eu")}


def test_asof_payload_subset_and_suffix(spark, frames):
    facts, dim = frames
    out = asof_join(
        facts.withColumn("tier", F.lit("x")), dim, on="key",
        ts_fact="ts", ts_dim="ts", payload_cols=["tier"], suffix="_dim",
    )
    r = {x.fid: (x.tier, x.tier_dim) for x in out.collect()}
    assert r[1] == ("x", "bronze")
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            facts.withColumn("tier", F.lit("x")), dim, on="key",
            ts_fact="ts", ts_dim="ts", payload_cols=["tier"],
        )


def test_asof_plan_one_shuffle_no_join(spark, frames):
    facts, dim = frames
    out = asof_join(facts, dim, on="key", ts_fact="ts", ts_dim="ts")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p, "as-of must not plan a join node"
    # union + one hash partitioning on the key for the window
    assert p.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_range_join_point_in_interval(spark):
    facts = spark.createDataFrame(
        [Row(fid=i, key="a", ts=t) for i, t in enumerate([1, 5, 10, 15, 25])]
    )
    intervals = spark.createDataFrame(
        [
            Row(key="a", start_ts=2, end_ts=8, sess="s1"),
            Row(key="a", start_ts=12, end_ts=20, sess="s2"),
        ]
    )
    out = range_join_intervals(
        facts, intervals, on="key", ts_fact="ts"
    ).orderBy("fid")
    got = [r.sess for r in out.collect()]
    # ts=1 before all, 5 in s1, 10 in the gap, 15 in s2, 25 after all
    assert got == [None, "s1", None, "s2", None]


def test_range_join_end_inclusive(spark):
    facts = spark.createDataFrame([Row(fid=1, key="a", ts=8)])
    intervals = spark.createDataFrame(
        [Row(key="a", start_ts=2, end_ts=8, sess="s1")]
    )
    excl = range_join_intervals(facts, intervals, on="key", ts_fact="ts")
    incl = range_join_intervals(
        facts, intervals, on="key", ts_fact="ts", end_inclusive=True
    )
    assert excl.first().sess is None
    assert incl.first().sess == "s1"


def test_asof_matches_naive_join_on_random_frames(spark):
    """Property check vs the obviously-correct (but unscalable)
    range-join + row_number formulation on a pseudo-random fixture."""
    import random

    rnd = random.Random(7)
    facts = spark.createDataFrame(
        [
            Row(fid=i, key=f"k{rnd.randrange(5)}", ts=rnd.randrange(100))
            for i in range(200)
        ]
    )
    dim = spark.createDataFrame(
        [
            Row(key=f"k{k}", ts=t, val=f"{k}:{t}")
            for k in range(4)                   # k4 never gets dim rows
            for t in sorted(rnd.sample(range(100), 6))
        ]
    )
    fast = {
        r.fid: r.val
        for r in asof_join(facts, dim, on="key", ts_fact="ts", ts_dim="ts").collect()
    }
    naive = (
        facts.alias("f")
        .join(
            dim.alias("d"),
            (F.col("f.key") == F.col("d.key")) & (F.col("f.ts") >= F.col("d.ts")),
            "left",
        )
        .groupBy("f.fid")
        .agg(F.max_by("d.val", "d.ts").alias("val"))
    )
    slow = {r.fid: r.val for r in naive.collect()}
    assert fast == slow


def test_sessionize_gap_rule(spark):
    from quickwit_spark.operators.joins import session_stats, sessionize

    ev = spark.createDataFrame(
        [
            Row(eid=1, key="u1", ts=0),
            Row(eid=2, key="u1", ts=100),
            Row(eid=3, key="u1", ts=1901),   # 1801 after prev → NEW (> gap)
            Row(eid=4, key="u1", ts=1950),
            Row(eid=5, key="u2", ts=0),      # keys independent
            Row(eid=6, key="u1", ts=3750),   # exactly gap after 1950 → SAME
        ]
    )
    s = sessionize(ev, on="key", ts_col="ts", gap=1800, order_tiebreak="eid")
    got = {r.eid: r.session_idx for r in s.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0, 6: 1}

    st = session_stats(ev, on="key", ts_col="ts", gap=1800, order_tiebreak="eid")
    rows = {(r.key, r.session_idx): (r.n_events, r.duration) for r in st.collect()}
    assert rows == {
        ("u1", 0): (2, 100),
        ("u1", 1): (3, 1849),
        ("u2", 0): (1, 0),
    }


def test_sessionize_plan_single_shuffle(spark):
    from quickwit_spark.operators.joins import session_stats

    ev = spark.createDataFrame([Row(eid=i, key=f"u{i%3}", ts=i * 7) for i in range(30)])
    out = session_stats(ev, on="key", ts_col="ts", gap=10, order_tiebreak="eid")
    p = out._jdf.queryExecution().executedPlan().toString()
    # the groupBy reuses the window's hashpartitioning(key): ONE exchange
    assert p.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
