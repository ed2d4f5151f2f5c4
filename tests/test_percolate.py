"""Percolate / reverse search (operators/percolate.py): equivalence with
the forward search path per stored query, multi-match fan-out, and the
zero-shuffle single-projection plan."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from quickwit_spark.operators.percolate import percolate
from quickwit_spark.operators.query import QueryCompiler

FIELDS = {"event_type": "raw", "value": "numeric", "user_id": "numeric"}


@pytest.fixture(scope="module")
def batch(spark):
    return spark.createDataFrame(
        [
            Row(event_id=1, event_type="error", value=450.0, user_id=1),
            Row(event_id=2, event_type="click", value=10.0, user_id=2),
            Row(event_id=3, event_type="error", value=10.0, user_id=3),
            Row(event_id=4, event_type="view", value=480.0, user_id=4),
            Row(event_id=5, event_type="view", value=70.0, user_id=5),
        ]
    )


STORED = {
    "q_err": "event_type:error",
    "q_hot": "value:[400 TO 500]",
    "q_err_and_hot": "event_type:error AND value:[400 TO 500]",
}


class TestPercolate:
    def test_matches_forward_search(self, batch):
        qc = QueryCompiler(FIELDS)
        out = percolate(batch, STORED, qc, id_cols=["event_id"])
        got = {(r["event_id"], r["query_id"]) for r in out.collect()}
        expected = set()
        for qid, q in STORED.items():
            for r in qc.where(batch, q).collect():
                expected.add((r["event_id"], qid))
        assert got == expected

    def test_fanout_and_no_match(self, batch):
        qc = QueryCompiler(FIELDS)
        out = percolate(batch, STORED, qc, id_cols=["event_id"]).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["event_id"], set()).add(r["query_id"])
        assert by_doc[1] == {"q_err", "q_hot", "q_err_and_hot"}  # triple match
        assert by_doc[4] == {"q_hot"}
        assert 5 not in by_doc and 2 not in by_doc  # silent documents absent

    def test_zero_shuffle_plan(self, batch):
        qc = QueryCompiler(FIELDS)
        plan = (
            percolate(batch, STORED, qc, id_cols=["event_id"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan and "Join" not in plan

    def test_compiler_schema_restored(self, batch):
        qc = QueryCompiler(FIELDS)
        percolate(batch, STORED, qc)
        assert qc.schema is None
