"""Trace-plane operators (operators/traces.py): tail-based sampling
(OTel decision model in the reference's two-phase FindTraces shape),
Jaeger GetDependencies service edges, RED span-metrics — plus the RLHF
preference-pair constructor (operators/chat.py preference_pairs). These
pin policy precedence, link/root semantics, tie-breaking, and plan shape;
the DuckDB oracles gate the arithmetic end-to-end."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from quickwit_spark.operators.chat import preference_pairs
from quickwit_spark.operators.corpus import _MIX_M1, sample_mix_cols
from quickwit_spark.operators.traces import (
    red_metrics,
    service_dependencies,
    tail_sample,
    trace_decisions,
)

T0 = dt.datetime(2024, 3, 1)


def _span(trace, span, parent, service, ms, err=False, sec=0):
    return Row(
        trace_id=trace,
        span_id=span,
        parent_span_id=parent,
        service=service,
        duration_ms=float(ms),
        is_error=bool(err),
        ts=T0 + dt.timedelta(seconds=sec),
    )


@pytest.fixture(scope="module")
def spans(spark):
    # trace 1: gateway -> auth -> db, all healthy, fast
    # trace 2: gateway -> search (x2 calls), one error span
    # trace 3: gateway -> search -> db, slow search span (900ms)
    # trace 4: lone root span, healthy, fast
    return spark.createDataFrame(
        [
            _span(1, 10, None, "gateway", 50, sec=0),
            _span(1, 11, 10, "auth", 20, sec=1),
            _span(1, 12, 11, "db", 5, sec=2),
            _span(2, 20, None, "gateway", 80, sec=10),
            _span(2, 21, 20, "search", 60, err=True, sec=11),
            _span(2, 22, 20, "search", 30, sec=12),
            _span(3, 30, None, "gateway", 950, sec=20),
            _span(3, 31, 30, "search", 900, sec=21),
            _span(3, 32, 31, "db", 40, sec=22),
            _span(4, 40, None, "gateway", 10, sec=30),
        ]
    )


class TestTailSampling:
    def test_policy_precedence_and_reasons(self, spans):
        # error beats latency: trace 2 has an error; trace 3 trips latency
        # only; traces 1/4 fall through to the probabilistic hash.
        dec = {
            r["trace_id"]: r["sample_reason"]
            for r in trace_decisions(
                spans, latency_threshold_ms=500.0, sample_rate=0.0
            ).collect()
        }
        assert dec == {2: "error", 3: "latency"}

    def test_error_beats_latency(self, spans):
        # a trace that trips BOTH policies reports 'error' (first match wins)
        dec = {
            r["trace_id"]: r["sample_reason"]
            for r in trace_decisions(
                spans, latency_threshold_ms=50.0, sample_rate=0.0
            ).collect()
        }
        assert dec[2] == "error" and dec[3] == "latency" and dec[1] == "latency"

    def test_fetch_returns_whole_traces(self, spans):
        out = tail_sample(spans, latency_threshold_ms=500.0, sample_rate=0.0)
        rows = out.collect()
        # every span of traces 2 and 3, nothing else, reason attached
        assert sorted(r["span_id"] for r in rows) == [20, 21, 22, 30, 31, 32]
        assert all(
            r["sample_reason"] == ("error" if r["trace_id"] == 2 else "latency")
            for r in rows
        )

    def test_probabilistic_is_deterministic_hash_fraction(self, spans, spark):
        # rate=1.0 keeps everything; the kept set at rate p is exactly the
        # traces whose k3 mix falls under p*M — replays can't disagree.
        all_kept = trace_decisions(spans, sample_rate=1.0)
        assert all_kept.count() == 4
        p = 0.5
        kept = {
            r["trace_id"]
            for r in trace_decisions(spans, sample_rate=p).collect()
            if r["sample_reason"] == "probabilistic"
        }
        ids = spans.select("trace_id").distinct()
        expected = {
            r["trace_id"]
            for r in ids.filter(
                sample_mix_cols("trace_id")[2] < F.lit(p * _MIX_M1)
            ).collect()
        } - {2}  # trace 2 matches the error policy first
        assert kept == expected

    def test_broadcast_hint_plan(self, spans):
        plan = tail_sample(
            spans, latency_threshold_ms=500.0, broadcast_decisions=True
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestServiceDependencies:
    def test_edges_and_counts(self, spans):
        edges = {
            (r["parent_service"], r["child_service"]): r["call_count"]
            for r in service_dependencies(spans).collect()
        }
        assert edges == {
            ("gateway", "auth"): 1,
            ("auth", "db"): 1,
            ("gateway", "search"): 3,  # 2x in trace 2, 1x in trace 3
            ("search", "db"): 1,
        }

    def test_roots_ignored_and_cross_trace_ids_isolated(self, spans, spark):
        # a span in another trace reusing span_id 10 must NOT become a
        # parent of trace 1's auth span (join is on the composite key)
        poisoned = spans.union(
            spark.createDataFrame(
                [_span(9, 10, None, "impostor", 1, sec=99)], schema=spans.schema
            )
        )
        edges = {
            (r["parent_service"], r["child_service"]): r["call_count"]
            for r in service_dependencies(poisoned).collect()
        }
        assert ("impostor", "auth") not in edges
        assert edges[("gateway", "auth")] == 1

    def test_avg_child_duration(self, spans):
        rows = {
            (r["parent_service"], r["child_service"]): r["avg_child_ms"]
            for r in service_dependencies(
                spans, duration_col="duration_ms"
            ).collect()
        }
        assert rows[("gateway", "search")] == pytest.approx(
            (60 + 30 + 900) / 3, abs=1e-6
        )


class TestRedMetrics:
    def test_counts_rates_percentile(self, spans):
        rows = {
            r["service"]: r
            for r in red_metrics(
                spans, grain="day", percentile=0.5, error_col="is_error"
            ).collect()
        }
        g = rows["gateway"]
        assert g["n_calls"] == 4 and g["n_errors"] == 0 and g["error_rate"] == 0.0
        s = rows["search"]
        assert s["n_calls"] == 3 and s["n_errors"] == 1
        assert s["error_rate"] == pytest.approx(1 / 3, abs=1e-6)
        assert s["p_ms"] == 60.0  # exact interpolated median of {30,60,900}
        assert g["max_ms"] == 950.0

    def test_single_exchange_plan(self, spans):
        plan = red_metrics(spans)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1  # one hash shuffle, partials map-side


class TestPreferencePairs:
    def _cands(self, spark, rows):
        return spark.createDataFrame(
            [Row(conv_id=c, turn_idx=i, text=t, score=float(s)) for c, i, t, s in rows]
        )

    def test_pairs_margin_and_drop(self, spark):
        df = self._cands(
            spark,
            [
                ("a", 1, "bad", 0.1),
                ("a", 2, "best", 0.9),
                ("a", 3, "mid", 0.5),
                ("b", 1, "only", 0.7),  # single candidate -> dropped
                ("c", 1, "same1", 0.4),
                ("c", 2, "same2", 0.4),  # zero margin -> dropped
            ],
        )
        out = {r["conv_id"]: r for r in preference_pairs(df).collect()}
        assert set(out) == {"a"}
        a = out["a"]
        assert (a["chosen"], a["rejected"]) == ("best", "bad")
        assert a["n_candidates"] == 3 and a["margin"] == pytest.approx(0.8)

    def test_tie_breaking_deterministic(self, spark):
        # two candidates tie at the top: the EARLIER one is chosen; two tie
        # at the bottom: the LATER one is rejected.
        df = self._cands(
            spark,
            [
                ("a", 1, "hi-early", 0.9),
                ("a", 2, "hi-late", 0.9),
                ("a", 3, "lo-early", 0.1),
                ("a", 4, "lo-late", 0.1),
            ],
        )
        row = preference_pairs(df).collect()[0]
        assert (row["chosen"], row["rejected"]) == ("hi-early", "lo-late")

    def test_min_margin_threshold(self, spark):
        df = self._cands(spark, [("a", 1, "x", 0.50), ("a", 2, "y", 0.55)])
        assert preference_pairs(df, min_margin=0.1).count() == 0
        assert preference_pairs(df, min_margin=0.05).count() == 1

    def test_single_aggregate_plan(self, spark):
        df = self._cands(spark, [("a", 1, "x", 0.5), ("a", 2, "y", 0.6)])
        plan = preference_pairs(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1  # one groupBy, no window/self-join
