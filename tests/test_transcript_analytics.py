"""Agent-transcript analytics (trajectory stats, ordered funnels),
significant_terms, rollup merge algebra, and robust time-series anomalies.
Each also carries a DuckDB-oracled queries() entry; these tests pin the
semantics the oracle can't exercise (ordering subtleties, merge algebra,
planted anomalies, knobs)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from quickwit_spark.operators.chat import (
    funnel_counts,
    funnel_reached,
    trajectory_stats,
)
from quickwit_spark.operators.aggs import significant_terms
from quickwit_spark.operators.rollup import (
    rollup_build,
    rollup_finalize,
    rollup_merge,
    rollup_upsert,
)
from quickwit_spark.operators.timeseries import bucket_metric, robust_anomalies

T0 = dt.datetime(2024, 1, 1)


def _turn(conv, idx, role, text="x", tool=None, sec=0):
    return Row(
        conv_id=conv,
        turn_idx=idx,
        role=role,
        text=text,
        tool=tool,
        ts=T0 + dt.timedelta(seconds=sec),
    )


@pytest.fixture(scope="module")
def turns(spark):
    return spark.createDataFrame(
        [
            _turn("c1", 0, "user", "hello there", sec=0),
            _turn("c1", 1, "assistant", "hi!", sec=5),
            _turn("c1", 2, "tool", "ok", tool="search", sec=9),
            _turn("c1", 3, "tool", "ok", tool="calc", sec=12),
            _turn("c1", 4, "assistant", "done", sec=30),
            _turn("c2", 0, "user", "q", sec=0),
            _turn("c2", 1, "assistant", None, sec=7),
        ]
    )


class TestTrajectoryStats:
    def test_metrics(self, turns):
        out = {
            r["conv_id"]: r
            for r in trajectory_stats(
                turns, error_pred=F.col("text") == "done"
            ).collect()
        }
        c1 = out["c1"]
        assert c1["n_turns"] == 5 and c1["n_user"] == 1
        assert c1["n_assistant"] == 2 and c1["n_tool"] == 2
        assert c1["n_distinct_tools"] == 2
        assert c1["duration_sec"] == 30
        assert c1["first_role"] == "user" and c1["last_role"] == "assistant"
        assert c1["first_tool_turn"] == 2
        assert c1["n_errors"] == 1
        c2 = out["c2"]
        assert c2["first_tool_turn"] is None and c2["n_distinct_tools"] == 0
        # null text counts as 0 chars in the average
        assert c2["avg_text_chars"] == pytest.approx(0.5)

    def test_single_shuffle(self, turns):
        from tests.test_plan_shapes import plan_of

        p = plan_of(trajectory_stats(turns))
        assert p.count("Exchange") <= 2  # distinct-count may add one
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def _steps():
    return [
        ("ask", F.col("role") == "user"),
        ("tool", F.col("role") == "tool"),
        ("answer", F.col("role") == "assistant"),
    ]


class TestFunnel:
    def test_order_matters(self, spark):
        # assistant BEFORE the tool turn must not count as step 3
        df = spark.createDataFrame(
            [
                _turn("a", 0, "user"),
                _turn("a", 1, "assistant"),
                _turn("a", 2, "tool", tool="t"),
            ]
        )
        r = funnel_reached(df, _steps()).collect()[0]
        assert r["steps_reached"] == 2

    def test_greedy_earliest_is_exact(self, spark):
        # user, tool, user, assistant: greedy matches (0,1,3) — reached 3
        df = spark.createDataFrame(
            [
                _turn("a", 0, "user"),
                _turn("a", 1, "tool", tool="t"),
                _turn("a", 2, "user"),
                _turn("a", 3, "assistant"),
            ]
        )
        assert funnel_reached(df, _steps()).collect()[0]["steps_reached"] == 3

    def test_same_turn_cannot_match_two_steps(self, spark):
        # strictly increasing order: one turn satisfies at most one step
        df = spark.createDataFrame([_turn("a", 0, "user", tool="t")])
        steps = [("u1", F.col("role") == "user"), ("u2", F.col("role") == "user")]
        assert funnel_reached(df, steps).collect()[0]["steps_reached"] == 1

    def test_counts_monotone_and_zero_groups_absent(self, turns):
        rows = {r["step"]: r for r in funnel_counts(turns, _steps()).collect()}
        assert [rows[k]["n_groups"] for k in (1, 2, 3)] == [2, 1, 1]
        assert rows[2]["step_name"] == "tool"
        # a group matching nothing contributes nowhere
        df2 = turns.sparkSession.createDataFrame([_turn("z", 0, "system", tool="t")])
        out = funnel_counts(turns.unionByName(df2), _steps()).collect()
        assert {r["step"]: r["n_groups"] for r in out}[1] == 2

    def test_empty_steps_rejected(self, turns):
        with pytest.raises(ValueError):
            funnel_reached(turns, [])


class TestSignificantTerms:
    def test_jlh_hand_computed(self, spark):
        # fg: 2 docs both containing "boom"; bg: 6 docs, "boom" in 2,
        # "base" everywhere (fg%==bg% → excluded), "raretwice" fg-only
        docs = spark.createDataFrame(
            [
                Row(doc_id=0, grp="fg", text="base boom raretwice"),
                Row(doc_id=1, grp="fg", text="base boom raretwice"),
                Row(doc_id=2, grp="bg", text="base other"),
                Row(doc_id=3, grp="bg", text="base other"),
                Row(doc_id=4, grp="bg", text="base filler"),
                Row(doc_id=5, grp="bg", text="base filler"),
            ]
        )
        out = {
            r["term"]: r
            for r in significant_terms(
                docs, "text", F.col("grp") == "fg", size=10, min_doc_count=2
            ).collect()
        }
        assert "base" not in out  # fg% == bg% == 1
        assert set(out) == {"boom", "raretwice"}
        # boom: fg%=1, bg%=2/6 → (1-1/3)*(1/(1/3)) = 2.0
        assert out["boom"]["score"] == pytest.approx(2.0)
        assert out["boom"]["fg_df"] == 2 and out["boom"]["bg_df"] == 2
        # raretwice: identical counts → same score; tie broken by term asc
        assert out["raretwice"]["score"] == pytest.approx(2.0)

    def test_min_doc_count_and_size(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = significant_terms(
            docs, "text", F.col("source") == "src0", size=3, min_doc_count=5
        ).collect()
        assert len(out) == 3
        assert all(r["fg_df"] >= 5 for r in out)
        scores = [r["score"] for r in out]
        assert scores == sorted(scores, reverse=True)

    def test_empty_foreground_raises(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        with pytest.raises(ValueError):
            significant_terms(docs, "text", F.lit(False))


class TestRollup:
    @pytest.fixture(scope="class")
    def events(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/events.parquet")

    def test_merge_equals_direct(self, spark, events):
        hourly = rollup_build(events, ["event_type"], "ts", "value", "hour")
        daily = rollup_finalize(
            rollup_merge(hourly, ["event_type"], "day"), ["event_type"]
        )
        direct = events.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("bucket")
        ).agg(
            F.count("value").cast("long").alias("cnt"),
            F.round(F.sum("value"), 6).alias("sum_v"),
            F.min(F.col("value").cast("double")).alias("min_v"),
            F.max(F.col("value").cast("double")).alias("max_v"),
            F.round(F.round(F.sum("value"), 6) / F.count("value"), 6).alias("avg_v"),
            F.round(F.var_pop("value"), 6).alias("var_v"),
        )
        assert daily.exceptAll(direct.select(*daily.columns)).count() == 0
        assert direct.select(*daily.columns).exceptAll(daily).count() == 0

    def test_key_subset_merge(self, events):
        hourly = rollup_build(events, ["event_type"], "ts", "value", "hour")
        total = rollup_merge(hourly, [], "year").agg(F.sum("cnt")).first()[0]
        assert total == events.filter(F.col("value").isNotNull()).count()

    def test_upsert_incremental_equals_rebuild(self, events):
        a = events.filter(F.col("event_id") % 2 == 0)
        b = events.filter(F.col("event_id") % 2 == 1)
        inc = rollup_upsert(
            rollup_build(a, ["event_type"], "ts", "value", "day"),
            rollup_build(b, ["event_type"], "ts", "value", "day"),
            ["event_type"],
        )
        full = rollup_build(events, ["event_type"], "ts", "value", "day")
        fin = lambda r: rollup_finalize(r, ["event_type"])  # noqa: E731
        assert fin(inc).exceptAll(fin(full)).count() == 0
        assert fin(full).exceptAll(fin(inc)).count() == 0

    def test_bad_grain_rejected(self, events):
        with pytest.raises(ValueError):
            rollup_build(events, ["event_type"], "ts", "value", "fortnight")

    def test_single_shuffle_build(self, events):
        from tests.test_plan_shapes import plan_of

        p = plan_of(rollup_build(events, ["event_type"], "ts", "value", "hour"))
        assert p.count("Exchange") == 1


class TestAnomalies:
    def test_planted_spike_flagged(self, spark):
        rows = [
            Row(series="s", ts=T0 + dt.timedelta(hours=h), v=1.0)
            for h in range(20)
            for _ in range(10 + (h % 3))  # 10-12 per bucket
        ] + [Row(series="s", ts=T0 + dt.timedelta(hours=20), v=1.0)] * 300
        b = bucket_metric(
            spark.createDataFrame(rows), ["series"], "ts", "hour"
        )
        out = robust_anomalies(b, ["series"])
        flagged = [r for r in out.collect() if r["is_anomaly"]]
        assert len(flagged) == 1
        assert flagged[0]["metric"] == 300.0
        assert abs(flagged[0]["score"]) > 3.5

    def test_mad_zero_never_flags(self, spark):
        rows = [
            Row(series="flat", ts=T0 + dt.timedelta(hours=h), v=1.0)
            for h in range(9)
        ] + [Row(series="flat", ts=T0 + dt.timedelta(hours=9), v=1.0)] * 50
        b = bucket_metric(spark.createDataFrame(rows), ["series"], "ts", "hour")
        out = robust_anomalies(b, ["series"]).collect()
        # 9 buckets of 1 + one of 50 → median 1, MAD 0 → no flags, null score
        assert all(not r["is_anomaly"] for r in out)
        spike = [r for r in out if r["metric"] == 50.0][0]
        assert spike["score"] is None and spike["mad"] == 0.0

    def test_threshold_knob(self, spark):
        rows = []
        for h, n in enumerate([10, 11, 10, 12, 10, 11, 10, 12, 10, 25]):
            rows += [Row(series="s", ts=T0 + dt.timedelta(hours=h), v=1.0)] * n
        b = bucket_metric(spark.createDataFrame(rows), ["series"], "ts", "hour")
        loose = robust_anomalies(b, ["series"], threshold=20.0)
        tight = robust_anomalies(b, ["series"], threshold=2.0)
        assert loose.filter("is_anomaly").count() == 0
        assert tight.filter("is_anomaly").count() >= 1

    def test_custom_metric(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        b = bucket_metric(
            ev, ["event_type"], "ts", "day", metric=F.sum("value")
        )
        got = {
            (r["event_type"], r["bucket"]): r["metric"] for r in b.collect()
        }
        direct = ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("bucket")
        ).agg(F.sum("value").alias("m"))
        for r in direct.collect():
            assert got[(r["event_type"], r["bucket"])] == pytest.approx(r["m"])


from quickwit_spark.operators.timeseries import cohort_retention, transition_matrix
from quickwit_spark.operators.scoring import suggest_prefix


class TestCohortRetention:
    def test_hand_built_matrix(self, spark):
        def ev(u, day):
            return Row(user_id=u, ts=T0 + dt.timedelta(days=day))

        # cohort A (day 0): u1 active days 0,7; u2 only day 0
        # cohort B (day 7): u3 active days 7, 21
        df = spark.createDataFrame(
            [ev(1, 0), ev(1, 1), ev(1, 7), ev(2, 0), ev(3, 7), ev(3, 21)]
        )
        out = {
            (r["cohort"], r["period_idx"]): r["n_users"]
            for r in cohort_retention(df, "user_id", "ts", "week").collect()
        }
        ca, cb = T0, T0 + dt.timedelta(days=7)
        assert out == {(ca, 0): 2, (ca, 1): 1, (cb, 0): 1, (cb, 2): 1}

    def test_same_period_events_count_once(self, spark):
        df = spark.createDataFrame(
            [Row(user_id=1, ts=T0 + dt.timedelta(hours=h)) for h in range(48)]
        )
        out = cohort_retention(df, "user_id", "ts", "day").collect()
        assert {(r["period_idx"], r["n_users"]) for r in out} == {(0, 1), (1, 1)}

    def test_bad_grain(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        with pytest.raises(ValueError):
            cohort_retention(ev, "user_id", "ts", "month")

    def test_single_shuffle_over_raw(self, spark, sf_dir):
        from tests.test_plan_shapes import plan_of

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        p = plan_of(cohort_retention(ev, "user_id", "ts", "week"))
        # one exchange for groupBy(user), one for the tiny cell groupBy
        assert p.count("Exchange") == 2


class TestTransitionMatrix:
    def test_pairs_and_probabilities(self, spark):
        df = spark.createDataFrame(
            [
                Row(g="a", o=0, s="x"),
                Row(g="a", o=1, s="y"),
                Row(g="a", o=2, s="x"),
                Row(g="a", o=3, s="y"),
                Row(g="b", o=0, s="y"),   # group boundary: y must not chain
                Row(g="b", o=1, s="x"),
            ]
        )
        out = {
            (r["from_state"], r["to_state"]): (r["n"], r["p"])
            for r in transition_matrix(df, "g", "o", "s").collect()
        }
        assert out[("x", "y")] == (2, 1.0)
        # y at a:3 and b:1 are group-final rows — no successor, so both
        # observed y-transitions go to x
        assert out[("y", "x")] == (2, 1.0)
        # a→b boundary pair (y at a:3 → y at b:0) must be absent
        assert ("y", "y") not in out

    def test_null_states_dropped_chain_through(self, spark):
        df = spark.createDataFrame(
            [
                Row(g="a", o=0, s="x"),
                Row(g="a", o=1, s=None),
                Row(g="a", o=2, s="z"),
            ]
        )
        out = transition_matrix(df, "g", "o", "s").collect()
        assert {(r["from_state"], r["to_state"]) for r in out} == {("x", "z")}

    def test_row_stochastic(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = transition_matrix(ev, "user_id", "event_id", "event_type")
        sums = (
            out.groupBy("from_state").agg(F.sum("p").alias("sp")).collect()
        )
        for r in sums:
            assert r["sp"] == pytest.approx(1.0, abs=1e-4)


class TestSuggestPrefix:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame(
            [
                Row(doc_id=0, text="spark spark spark stream"),
                Row(doc_id=1, text="spark stream split"),
                Row(doc_id=2, text="stream other words"),
            ]
        )

    def test_doc_freq_ranking(self, corpus):
        out = [
            (r["term"], r["freq"])
            for r in suggest_prefix(corpus, "s", k=10).collect()
        ]
        # doc freq: stream 3, spark 2, split 1; ties none
        assert out == [("stream", 3), ("spark", 2), ("split", 1)]

    def test_term_freq_ranking(self, corpus):
        out = [
            (r["term"], r["freq"])
            for r in suggest_prefix(corpus, "sp", k=10, by_doc_freq=False).collect()
        ]
        assert out == [("spark", 4), ("split", 1)]

    def test_k_and_no_match(self, corpus):
        assert len(suggest_prefix(corpus, "s", k=2).collect()) == 2
        assert suggest_prefix(corpus, "zzz").count() == 0


from quickwit_spark.functions.text import log_template_col, log_templates
from quickwit_spark.operators.timeseries import breach_spans
from quickwit_spark.operators.chat import turn_context


class TestLogTemplates:
    def test_masking_order_and_classes(self, spark):
        rows = [
            Row(text="connected to 10.0.0.1 in 35ms id=0x1f3a"),
            Row(text="connected to 10.255.9.200 in 7ms id=0xEE"),
            Row(text="user 550e8400-e29b-41d4-a716-446655440000 logged in"),
            Row(text="user deadbeef-dead-beef-dead-beefdeadbeef logged in"),
            Row(text="retried 3 times after 1.5 seconds"),
        ]
        out = {
            r["template"]: (r["n"], r["example"])
            for r in log_templates(spark.createDataFrame(rows)).collect()
        }
        # IP masked as a unit (not <NUM>.<NUM>...), hex before num, uuid whole
        assert out["connected to <IP> in <NUM>ms id=<HEX>"][0] == 2
        assert out["user <UUID> logged in"][0] == 2
        assert out["retried <NUM> times after <NUM> seconds"][0] == 1
        # example is the lexicographically-first raw line (deterministic)
        assert out["connected to <IP> in <NUM>ms id=<HEX>"][1].endswith("0x1f3a")

    def test_pipeline_transcript_lines_collapse(self, spark):
        # the transcript generator's log-line shape collapses to few templates
        df = spark.createDataFrame(
            [
                Row(text='level=INFO tenant=acme-042 latency_ms=35 msg="served 8 items"'),
                Row(text='level=INFO tenant=acme-731 latency_ms=4999 msg="served 102 items"'),
                Row(text='level=ERROR tenant=acme-001 latency_ms=12 msg="upstream timeout"'),
            ]
        )
        t = {r["template"] for r in log_templates(df).collect()}
        assert 'level=INFO tenant=acme-<NUM> latency_ms=<NUM> msg="served <NUM> items"' in t
        assert len(t) == 2

    def test_column_variant_pure_codegen(self, spark, sf_dir):
        from tests.test_plan_shapes import plan_of

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        p = plan_of(docs.select(log_template_col(F.col("text"))))
        assert "Exchange" not in p and "Python" not in p


class TestBreachSpans:
    def test_islands_and_gaps(self, spark):
        def b(series, day, m):
            return Row(series=series, bucket=T0 + dt.timedelta(days=day), metric=m)

        rows = [
            b("s", 0, 90.0), b("s", 1, 95.0),          # island 1 (days 0-1)
            b("s", 2, 10.0),                             # below threshold
            b("s", 3, 91.0),                             # island 2 (day 3)
            # day 4 missing entirely
            b("s", 5, 92.0), b("s", 6, 99.0),            # island 3 (days 5-6)
            b("t", 0, 91.0),                             # other series
        ]
        out = breach_spans(
            spark.createDataFrame(rows), ["series"], threshold=80.0, grain="day"
        ).collect()
        spans = sorted(
            (r["series"], r["span_start"].day, r["span_end"].day, r["n_buckets"], r["peak"])
            for r in out
        )
        assert spans == [
            ("s", 1, 2, 2, 95.0),
            ("s", 4, 4, 1, 91.0),
            ("s", 6, 7, 2, 99.0),
            ("t", 1, 1, 1, 91.0),
        ]

    def test_threshold_is_strict(self, spark):
        rows = [Row(series="s", bucket=T0, metric=80.0)]
        assert (
            breach_spans(
                spark.createDataFrame(rows), ["series"], threshold=80.0, grain="day"
            ).count()
            == 0
        )

    def test_bad_grain(self, spark):
        rows = [Row(series="s", bucket=T0, metric=80.0)]
        with pytest.raises(ValueError):
            breach_spans(spark.createDataFrame(rows), ["series"], 1.0, grain="week")


class TestTurnContext:
    @pytest.fixture(scope="class")
    def convo(self, spark):
        return spark.createDataFrame(
            [
                Row(conv_id="c", turn_idx=0, role="assistant", text="opening"),
                Row(conv_id="c", turn_idx=1, role="user", text="q1"),
                Row(conv_id="c", turn_idx=2, role="user", text="q2"),
                Row(conv_id="c", turn_idx=3, role="tool", text="t1"),
                Row(conv_id="c", turn_idx=4, role="assistant", text="a1"),
                Row(conv_id="d", turn_idx=0, role="user", text="other conv"),
                Row(conv_id="d", turn_idx=1, role="assistant", text=None),
            ]
        )

    def test_window_bound_and_rendering(self, convo):
        out = {r["turn_idx"]: r for r in turn_context(convo, k=2).filter(
            F.col("conv_id") == "c").collect()}
        # opening assistant turn: empty context
        assert out[0]["context"] == "" and out[0]["target"] == "opening"
        # k=2 keeps only the LAST two turns before turn 4
        assert out[4]["context"] == "user: q2\ntool: t1"
        assert out[4]["target"] == "a1"

    def test_no_cross_conversation_leak_and_null_target(self, convo):
        out = {r["conv_id"]: r for r in turn_context(convo, k=4).filter(
            F.col("turn_idx") <= 1).collect() if r["conv_id"] == "d"}
        assert out["d"]["context"] == "user: other conv"
        assert out["d"]["target"] == ""

    def test_single_window_exchange(self, convo):
        from tests.test_plan_shapes import plan_of

        p = plan_of(turn_context(convo, k=3))
        assert p.count("Exchange") == 1 and "Python" not in p


from quickwit_spark.operators.rollup import hist_build, hist_merge, hist_quantile
from quickwit_spark.operators.timeseries import pipeline_aggs
from quickwit_spark.operators.aggs import percentile_ranks


class TestHistQuantile:
    LO, HI, NB = 0.0, 300.0, 64

    def test_error_bounded_by_bin_width(self, spark, sf_dir):
        from pyspark.sql import Window

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        h = hist_build(ev, ["event_type"], "ts", "value", "hour",
                       self.LO, self.HI, self.NB)
        est = hist_quantile(hist_merge(h, ["event_type"], "day"),
                            ["event_type"], 0.95, self.LO, self.HI, self.NB)
        # exact rank-based (type-1) quantile: value at rank ceil(q*n)
        b = ev.select("event_type", F.date_trunc("day", "ts").alias("bucket"),
                      F.col("value").cast("double").alias("v"))
        w = Window.partitionBy("event_type", "bucket").orderBy("v")
        wn = Window.partitionBy("event_type", "bucket")
        exact = (
            b.withColumn("r", F.row_number().over(w))
            .withColumn("n", F.count("*").over(wn))
            .filter(F.col("r") == F.ceil(F.lit(0.95) * F.col("n")))
            .select("event_type", "bucket", F.col("v").alias("ex"))
        )
        worst = (
            est.join(exact, ["event_type", "bucket"])
            .agg(F.max(F.abs(F.col("q_est") - F.col("ex"))))
            .first()[0]
        )
        assert worst <= (self.HI - self.LO) / self.NB + 1e-9

    def test_merge_is_plain_sum_and_exact(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        hourly = hist_build(ev, ["event_type"], "ts", "value", "hour",
                            self.LO, self.HI, self.NB)
        daily = hist_merge(hourly, ["event_type"], "day")
        direct = hist_build(ev, ["event_type"], "ts", "value", "day",
                            self.LO, self.HI, self.NB)
        assert daily.exceptAll(direct).count() == 0
        assert direct.exceptAll(daily).count() == 0

    def test_outliers_clamp_into_edge_bins(self, spark):
        rows = [Row(k="a", ts=T0, v=-50.0), Row(k="a", ts=T0, v=9999.0),
                Row(k="a", ts=T0, v=5.0)]
        h = hist_build(spark.createDataFrame(rows), ["k"], "ts", "v", "day",
                       0.0, 10.0, 10)
        bins = {r["bin"]: r["cnt"] for r in h.collect()}
        assert bins == {0: 1, 9: 1, 5: 1}

    def test_validation(self, spark):
        df = spark.createDataFrame([Row(k="a", ts=T0, v=1.0)])
        with pytest.raises(ValueError):
            hist_build(df, ["k"], "ts", "v", "day", 5.0, 5.0, 10)
        h = hist_build(df, ["k"], "ts", "v", "day", 0.0, 10.0, 10)
        with pytest.raises(ValueError):
            hist_quantile(h, ["k"], 0.0, 0.0, 10.0, 10)


class TestPipelineAggs:
    def test_hand_built(self, spark):
        rows = [
            Row(s="a", bucket=T0 + dt.timedelta(days=d), metric=m)
            for d, m in enumerate([10.0, 20.0, 10.0, 40.0])
        ]
        out = {
            r["bucket"].day: r
            for r in pipeline_aggs(
                spark.createDataFrame(rows), ["s"], moving_window=2
            ).collect()
        }
        assert out[1]["derivative"] is None
        assert [out[d]["derivative"] for d in (2, 3, 4)] == [10.0, -10.0, 30.0]
        assert [out[d]["cum_sum"] for d in (1, 2, 3, 4)] == [10.0, 30.0, 40.0, 80.0]
        # trailing window incl. current, partial head
        assert [out[d]["moving_avg"] for d in (1, 2, 3, 4)] == [10.0, 15.0, 15.0, 25.0]

    def test_single_exchange_for_whole_family(self, spark, sf_dir):
        from tests.test_plan_shapes import plan_of
        from quickwit_spark.operators.timeseries import bucket_metric

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        b = bucket_metric(ev, ["event_type"], "ts", "day")
        p = plan_of(pipeline_aggs(b, ["event_type"]))
        # bucketing groupBy + ONE shared window exchange
        assert p.count("Exchange") == 2
        assert p.count("Window") == 1


class TestPercentileRanks:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame([Row(v=float(x)) for x in range(1, 11)])
        out = {r["value"]: r["rank_pct"] for r in
               percentile_ranks(df, "v", [1.0, 5.0, 10.0, 0.5]).collect()}
        assert out[1.0] == 10.0 and out[5.0] == 50.0
        assert out[10.0] == 100.0 and out[0.5] == 0.0

    def test_empty_probes_rejected(self, spark):
        df = spark.createDataFrame([Row(v=1.0)])
        with pytest.raises(ValueError):
            percentile_ranks(df, "v", [])
