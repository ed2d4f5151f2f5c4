"""SCD2 dimension history (operators/joins.py scd2_build) and PMI
collocation mining (operators/corpus.py collocations)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row

from quickwit_spark.operators.corpus import collocations
from quickwit_spark.operators.joins import scd2_build, scd2_snapshot_at


class TestScd2:
    @pytest.fixture(scope="class")
    def history(self, spark):
        changes = spark.createDataFrame(
            [
                Row(key="t1", ts=10, tier="free"),
                Row(key="t1", ts=20, tier="pro"),
                Row(key="t1", ts=30, tier="enterprise"),
                Row(key="t2", ts=15, tier="pro"),
            ]
        )
        return scd2_build(changes, key_col="key", ts_col="ts")

    def test_intervals_partition_timeline(self, history):
        rows = sorted(
            (
                (r["key"], r["version"], r["tier"], r["valid_from"], r["valid_to"])
                for r in history.collect()
            )
        )
        assert rows == [
            ("t1", 1, "free", 10, 20),
            ("t1", 2, "pro", 20, 30),
            ("t1", 3, "enterprise", 30, None),
            ("t2", 1, "pro", 15, None),
        ]

    def test_is_current_reproduces_latest_snapshot(self, history):
        cur = {
            r["key"]: r["tier"]
            for r in history.filter("is_current").collect()
        }
        assert cur == {"t1": "enterprise", "t2": "pro"}

    def test_point_in_time_snapshot(self, history):
        # at ts=25: t1 is pro (interval [20,30)), t2 is pro; exclusive end:
        # at exactly ts=20 the NEW version is live
        at25 = {r["key"]: r["tier"] for r in scd2_snapshot_at(history, 25).collect()}
        assert at25 == {"t1": "pro", "t2": "pro"}
        at20 = {r["key"]: r["tier"] for r in scd2_snapshot_at(history, 20).collect()}
        assert at20["t1"] == "pro"
        # before any change: no row for that key
        at5 = {r["key"]: r["tier"] for r in scd2_snapshot_at(history, 5).collect()}
        assert "t1" not in at5

    def test_single_exchange_plan(self, spark):
        # fresh (unexecuted) frame: once AQE finalizes, toString prints the
        # Initial Plan section too and every Exchange appears twice
        changes = spark.createDataFrame(
            [Row(key="t1", ts=10, tier="free"), Row(key="t1", ts=20, tier="pro")]
        )
        plan = (
            scd2_build(changes, key_col="key", ts_col="ts")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1  # lead + row_number share one sort
        assert plan.count("Window") == 1  # fused into one window node


class TestCollocations:
    def test_pmi_exact_on_known_corpus(self, spark):
        # "new york" always together; "the" everywhere -> PMI(new,york)
        # high, PMI(the, cat) ~ 0
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="new york is big"),
                Row(doc_id=2, text="new york at night"),
                Row(doc_id=3, text="the cat sat"),
                Row(doc_id=4, text="the dog ran"),
            ]
        )
        out = {
            (r["w1"], r["w2"]): (r["c12"], r["pmi"])
            for r in collocations(docs, min_count=2, top_k=10).collect()
        }
        assert set(out) == {("new", "york")}
        c12, pmi = out[("new", "york")]
        nu, nb = 14, 10  # 4+4+3+3 tokens, 3+3+2+2 bigrams
        expect = math.log((2 / nb) / ((2 / nu) * (2 / nu)))
        assert c12 == 2 and pmi == pytest.approx(expect, abs=1e-6)

    def test_min_count_floors_noise(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="rare pair only once seen here")]
        )
        assert collocations(docs, min_count=2, top_k=10).count() == 0
        assert collocations(docs, min_count=1, top_k=10).count() == 5

    def test_topk_order_total(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=i, text="a b a b c d") for i in range(3)]
        )
        rows = collocations(docs, min_count=1, top_k=3).collect()
        # deterministic (pmi desc, w1, w2) order
        assert [(r["w1"], r["w2"]) for r in rows] == sorted(
            [(r["w1"], r["w2"]) for r in rows],
            key=lambda p: (-[r for r in rows if (r["w1"], r["w2"]) == p][0]["pmi"], p),
        )


class TestLogThrottle:
    def test_quota_and_determinism(self, spark):
        import datetime as dt
        from quickwit_spark.operators.timeseries import log_throttle

        T0 = dt.datetime(2024, 1, 1)
        rows = [
            Row(
                event_id=i,
                event_type="chatty" if i < 500 else "quiet",
                ts=T0 + dt.timedelta(minutes=i % 50),
            )
            for i in range(520)
        ]
        df = spark.createDataFrame(rows)
        kept = log_throttle(
            df, quota=5, category_cols=["event_type"], grain="hour"
        )
        counts = {
            r["stratum"]: r["n"]
            for r in kept.groupBy("stratum").count().withColumnRenamed("count", "n").collect()
        }
        # chatty capped at 5 per hour-bucket, quiet (20 rows) also capped
        assert all(n <= 5 for n in counts.values())
        chatty = [s for s in counts if s.startswith("chatty|")]
        assert all(counts[s] == 5 for s in chatty)  # full quota used
        # survivor set is partitioning-independent
        a = {r["event_id"] for r in kept.collect()}
        b = {
            r["event_id"]
            for r in log_throttle(
                df.repartition(13), quota=5, category_cols=["event_type"], grain="hour"
            ).collect()
        }
        assert a == b
