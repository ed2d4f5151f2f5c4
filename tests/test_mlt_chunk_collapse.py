"""more_like_this (ES MLT semantics), sliding-window chunking, and field
collapse (ES collapse semantics). Each operator is also DuckDB-oracled via
its queries() entry; these tests pin the behavioral contracts the oracle
can't express cleanly (parameter knobs, edge shapes, determinism)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from quickwit_spark.operators.corpus import chunk_sliding
from quickwit_spark.operators.scoring import (
    batch_bm25_search,
    bm25_topk,
    more_like_this,
)
from quickwit_spark.operators.sorts import field_collapse


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="spark shuffle partition join broadcast spark shuffle"),
            Row(doc_id=1, text="spark shuffle partition join broadcast spark merge"),
            Row(doc_id=2, text="cats and dogs play in the garden all day"),
            Row(doc_id=3, text="spark partition pruning scan filter pushdown"),
            Row(doc_id=4, text="dogs play garden cats sunshine flowers and dogs"),
            Row(doc_id=5, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=6, text="garden cats dogs play in a garden with dogs"),
        ]
    )


class TestMoreLikeThis:
    def test_near_copy_ranks_first_and_seed_excluded(self, docs):
        out = more_like_this(docs, [0], min_doc_freq=2, k=5).collect()
        assert all(r["doc_id"] != 0 for r in out)
        assert out[0]["query_id"] == 0
        by_rank = sorted(out, key=lambda r: r["rank"])
        assert by_rank[0]["doc_id"] == 1  # near copy of the seed
        assert [r["rank"] for r in by_rank] == list(range(1, len(out) + 1))

    def test_multi_seed_one_job(self, docs):
        out = more_like_this(docs, [0, 2], min_doc_freq=2, k=3)
        rows = {r["query_id"]: [] for r in out.collect()}
        for r in out.collect():
            rows[r["query_id"]].append(r["doc_id"])
        assert set(rows) == {0, 2}
        assert rows[0][0] == 1
        # doc 2's neighbours are the cats/dogs/garden docs
        assert set(rows[2]) <= {4, 6, 5}
        assert rows[2][0] in (4, 6)

    def test_scores_match_manual_bm25_of_selected_terms(self, docs):
        """The MLT result must equal batch BM25 over the terms MLT selects —
        recompute the selection by hand and compare score-for-score."""
        rows = docs.collect()
        n = len(rows)
        toks = {r["doc_id"]: r["text"].lower().split() for r in rows}
        seed = toks[0]
        tf = {t: seed.count(t) for t in set(seed)}
        df = {t: sum(1 for d in toks.values() if t in d) for t in tf}
        idf = {t: math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in tf}
        cand = [t for t in tf if df[t] >= 2]
        cand.sort(key=lambda t: (-tf[t] * idf[t], t))
        query = " ".join(sorted(cand[:25]))

        expected = {
            (r["doc_id"]): r["_score"]
            for r in batch_bm25_search(
                docs,
                docs.sparkSession.createDataFrame([Row(query_id=0, query=query)]),
                k=8,
            ).collect()
            if r["doc_id"] != 0
        }
        got = {
            r["doc_id"]: r["_score"]
            for r in more_like_this(docs, [0], min_doc_freq=2, k=7).collect()
        }
        assert got == {d: s for d, s in expected.items() if d in got}
        assert set(got) == set(expected)

    def test_min_term_freq_knob(self, docs):
        # min_term_freq=2 keeps only terms appearing twice in the seed
        # ("spark", "shuffle") — only docs containing those can match
        out = {
            r["doc_id"]
            for r in more_like_this(
                docs, [0], min_term_freq=2, min_doc_freq=1, k=6
            ).collect()
        }
        assert 1 in out and out <= {1, 3}
        # min_term_freq above every seed tf → no query terms, no matches
        assert (
            more_like_this(docs, [0], min_term_freq=5, min_doc_freq=1, k=6).count()
            == 0
        )

    def test_max_doc_freq_drops_stopwordish_terms(self, docs):
        full = more_like_this(docs, [2], min_doc_freq=1, k=6).collect()
        capped = more_like_this(
            docs, [2], min_doc_freq=1, max_doc_freq=2, k=6
        ).collect()
        # "dogs"/"garden"/"cats" appear in 3 docs; capping at 2 removes them
        # from the query so fewer docs match
        assert len(capped) <= len(full)


class TestChunkSliding:
    def test_windows_and_tail(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=0, text="a b c d e f g h i j"), Row(doc_id=1, text="x y")]
        )
        out = {
            (r["doc_id"], r["chunk_idx"]): r
            for r in chunk_sliding(df, chunk_tokens=4, overlap=1).collect()
        }
        spans = [
            (out[(0, i)]["token_start"], out[(0, i)]["token_end"]) for i in range(3)
        ]
        assert spans == [(0, 4), (3, 7), (6, 10)]
        assert out[(0, 1)]["chunk_text"] == "d e f g"
        # short doc → exactly one whole-doc chunk
        assert len([k for k in out if k[0] == 1]) == 1
        assert out[(1, 0)]["chunk_text"] == "x y"
        assert out[(1, 0)]["n_tokens"] == 2

    def test_every_token_covered_and_overlap_exact(self, spark):
        for n in (1, 4, 5, 7, 12, 13):
            text = " ".join(f"t{i}" for i in range(n))
            df = spark.createDataFrame([Row(doc_id=0, text=text)])
            rows = sorted(
                chunk_sliding(df, chunk_tokens=5, overlap=2).collect(),
                key=lambda r: r["chunk_idx"],
            )
            covered = set()
            for r in rows:
                covered |= set(range(r["token_start"], r["token_end"]))
                assert r["token_end"] - r["token_start"] == r["n_tokens"]
                assert r["chunk_text"].split() == [
                    f"t{i}" for i in range(r["token_start"], r["token_end"])
                ]
            assert covered == set(range(n))
            for a, b in zip(rows, rows[1:]):
                assert b["token_start"] == a["token_start"] + 3  # stride
            # no fully-redundant tail window
            if len(rows) > 1:
                assert rows[-1]["token_end"] > rows[-2]["token_end"]

    def test_whitespace_runs_collapse(self, spark):
        df = spark.createDataFrame([Row(doc_id=0, text="  a   b \t c  ")])
        r = chunk_sliding(df, chunk_tokens=8, overlap=0).collect()
        assert len(r) == 1 and r[0]["chunk_text"] == "a b c"

    def test_overlap_validation(self, spark):
        df = spark.createDataFrame([Row(doc_id=0, text="a b")])
        with pytest.raises(ValueError):
            chunk_sliding(df, chunk_tokens=4, overlap=4)


class TestFieldCollapse:
    @pytest.fixture(scope="class")
    def ev(self, spark):
        return spark.createDataFrame(
            [
                Row(user_id=1, event_id=10, value=5.0),
                Row(user_id=1, event_id=11, value=9.0),
                Row(user_id=1, event_id=15, value=8.5),
                Row(user_id=2, event_id=12, value=7.0),
                Row(user_id=None, event_id=13, value=8.0),
                Row(user_id=2, event_id=14, value=1.0),
            ]
        )

    def test_one_per_group_topk_groups(self, ev):
        out = field_collapse(
            ev, "user_id", [("value", True)], k=2, inner_hits=1, tiebreak="event_id"
        ).collect()
        # groups ranked by best value: user1 (9.0), null (8.0), user2 (7.0)
        assert {(r["user_id"], r["event_id"]) for r in out} == {(1, 11), (None, 13)}

    def test_inner_hits(self, ev):
        out = field_collapse(
            ev, "user_id", [("value", True)], k=3, inner_hits=2, tiebreak="event_id"
        ).collect()
        per = {}
        for r in out:
            per.setdefault(r["user_id"], []).append((r["group_rank"], r["event_id"]))
        assert sorted(per[1]) == [(1, 11), (2, 15)]  # best two, 5.0 dropped
        assert sorted(per[2]) == [(1, 12), (2, 14)]
        assert sorted(per[None]) == [(1, 13)]

    def test_collapse_on_sf_events(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = field_collapse(
            ev, "user_id", [("value", True)], k=5, inner_hits=1, tiebreak="event_id"
        )
        rows = out.collect()
        assert len(rows) == 5
        assert len({r["user_id"] for r in rows}) == 5
        # each representative is its user's max value
        best = {
            r["user_id"]: r["value"]
            for r in ev.groupBy("user_id").agg(F.max("value").alias("value")).collect()
        }
        for r in rows:
            assert r["value"] == best[r["user_id"]]
