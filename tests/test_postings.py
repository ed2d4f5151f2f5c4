"""Materialized inverted index (operators/postings.py): build → pruned
term lookup → index-served BM25. Pins the two guarantees the oracle can't
see from SQL alone: (1) a term lookup opens ONLY the query terms' bucket
partitions (file pruning), and (2) index-served BM25 equals the
corpus-scan scorer row-for-row."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from quickwit_spark.operators import postings as PX
from quickwit_spark.operators.scoring import bm25_topk

DOCS = [
    (1, "spark merge query fast"),
    (2, "merge merge merge slow"),
    (3, "query planner index scan"),
    (4, "spark spark shuffle"),
    (5, "totally unrelated words here"),
]


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in DOCS]
    )
    path = str(tmp_path_factory.mktemp("postings") / "idx")
    PX.build_term_index(docs, path, n_buckets=8)
    return path


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])


class TestTermLookup:
    def test_postings_content(self, spark, index_path):
        rows = {
            (r["term"], r["doc_id"]): (r["tf"], r["dl"])
            for r in PX.term_lookup(spark, index_path, ["merge"]).collect()
        }
        assert rows == {("merge", 1): (1, 4), ("merge", 2): (3, 4)}

    def test_partition_pruning(self, spark, index_path):
        # the lookup must READ only the term's bucket directory: assert on
        # the files execution actually touched (input_file_name), plus the
        # scan's PartitionFilters — inputFiles() lists the whole table
        # pre-pruning, so it can't prove this
        hits = PX.term_lookup(spark, index_path, ["merge"])
        read_files = [
            r[0]
            for r in hits.select(F.input_file_name()).distinct().collect()
        ]
        n_buckets = PX.read_stats(spark, index_path)["n_buckets"]
        b = PX._term_buckets(spark, ["merge"], n_buckets)[0]
        assert read_files and all(f"bucket={b}/" in f for f in read_files)
        plan = hits._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "bucket" in plan

    def test_term_query_modes(self, spark, index_path):
        any_ids = {
            r["doc_id"]
            for r in PX.term_query(spark, index_path, ["spark", "merge"]).collect()
        }
        assert any_ids == {1, 2, 4}
        all_ids = {
            r["doc_id"]
            for r in PX.term_query(
                spark, index_path, ["spark", "merge"], mode="all"
            ).collect()
        }
        assert all_ids == {1}

    def test_missing_term_empty(self, spark, index_path):
        assert PX.term_lookup(spark, index_path, ["absent"]).count() == 0


class TestIndexBm25:
    def test_equals_corpus_scan_scorer(self, spark, index_path, docs_df):
        served = PX.index_bm25_topk(spark, index_path, ["spark", "merge"], k=10)
        scanned = bm25_topk(
            docs_df, "spark merge", "text", k=10, id_col="doc_id"
        ).select("doc_id", "_score")
        assert [tuple(r) for r in served.collect()] == [
            tuple(r) for r in scanned.collect()
        ]

    def test_multi_term_tf_saturation(self, spark, index_path):
        rows = PX.index_bm25_topk(spark, index_path, ["merge"], k=3).collect()
        # doc 2 (tf=3) outranks doc 1 (tf=1); doc without the term absent
        assert [r["doc_id"] for r in rows] == [2, 1]

    def test_stats_sidecar(self, spark, index_path):
        st = PX.read_stats(spark, index_path)
        assert st["n_docs"] == 5.0
        assert st["avgdl"] == pytest.approx(sum(len(t.split()) for _, t in DOCS) / 5)


class TestIndexLifecycle:
    @pytest.fixture()
    def paths(self, spark, tmp_path):
        docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in DOCS])
        full = str(tmp_path / "full")
        incr = str(tmp_path / "incr")
        PX.build_term_index(docs, full, n_buckets=8)
        PX.build_term_index(docs.filter("doc_id <= 2"), incr, n_buckets=8)
        PX.append_to_term_index(docs.filter("doc_id > 2"), incr)
        return full, incr

    def _postings(self, spark, path, terms):
        return sorted(
            tuple(r) for r in PX.term_lookup(spark, path, terms).collect()
        )

    def test_append_equals_full_build(self, spark, paths):
        full, incr = paths
        terms = ["spark", "merge", "query"]
        assert self._postings(spark, incr, terms) == self._postings(
            spark, full, terms
        )
        sf, si = PX.read_stats(spark, full), PX.read_stats(spark, incr)
        assert (sf["n_docs"], sf["sum_dl"]) == (si["n_docs"], si["sum_dl"])
        # BM25 served from the incrementally-built index is identical too
        a = [tuple(r) for r in PX.index_bm25_topk(spark, full, ["spark", "merge"], k=5).collect()]
        b = [tuple(r) for r in PX.index_bm25_topk(spark, incr, ["spark", "merge"], k=5).collect()]
        assert a == b

    def test_delete_masks_immediately(self, spark, paths):
        _, incr = paths
        PX.delete_from_term_index(spark, incr, [2])
        rows = self._postings(spark, incr, ["merge"])
        assert [r[1] for r in rows] == [1]  # doc 2 gone from every lookup
        # deleted docs still count in stats until compaction (tantivy rule)
        assert PX.read_stats(spark, incr)["n_docs"] == 5.0

    def test_remote_uri_rejected(self, spark):
        """ADVICE r5: tombstones are detected with os.path — a remote URI
        would silently skip the delete mask, so the lifecycle entry points
        must reject non-local paths up front."""
        with pytest.raises(ValueError, match="local"):
            PX.delete_from_term_index(spark, "s3a://bucket/idx", [1])
        with pytest.raises(ValueError, match="local"):
            PX.build_term_index(
                spark.createDataFrame([Row(doc_id=1, text="a b")]),
                "hdfs://nn/idx",
            )

    def test_compact_swap_crash_matrix(self, spark, paths, monkeypatch):
        """r6 crash-safety (r5 verdict wart #3): abort the compaction swap
        at EVERY os.rename/os.replace step; a subsequent lookup must see
        the pre- OR post-compaction index (tombstone-masked rows are
        identical in both), never a missing/mixed one, and the repair on
        open must converge to the compacted state once the marker exists."""
        import os as _os

        _, incr = paths
        PX.delete_from_term_index(spark, incr, [2, 5])
        expected = self._postings(spark, incr, ["merge", "spark"])

        class Abort(RuntimeError):
            pass

        real_rename, real_replace = _os.rename, _os.replace
        for step in range(1, 8):
            calls = {"n": 0}

            def hop(real, *a):
                calls["n"] += 1
                if calls["n"] >= step:
                    raise Abort(f"injected at fs-op {step}")
                return real(*a)

            monkeypatch.setattr(_os, "rename", lambda *a: hop(real_rename, *a))
            monkeypatch.setattr(_os, "replace", lambda *a: hop(real_replace, *a))
            try:
                PX.compact_term_index(spark, incr)
                aborted = False
            except Abort:
                aborted = True
            monkeypatch.setattr(_os, "rename", real_rename)
            monkeypatch.setattr(_os, "replace", real_replace)
            # every crash point serves the same masked postings (repair on
            # open rolls a committed swap forward, leaves the rest alone)
            assert self._postings(spark, incr, ["merge", "spark"]) == expected
            assert PX.read_stats(spark, incr)["n_docs"] in (3.0, 5.0)
            if not aborted:
                break
        # converged: marker gone, tombstones reclaimed, stats recounted
        assert not _os.path.exists(incr + "_SWAP")
        PX.compact_term_index(spark, incr)
        assert PX._tombstones(spark, incr) is None
        assert PX.read_stats(spark, incr)["n_docs"] == 3.0
        assert self._postings(spark, incr, ["merge", "spark"]) == expected

    def test_compact_reclaims_and_recounts(self, spark, paths):
        _, incr = paths
        PX.delete_from_term_index(spark, incr, [2, 5])
        PX.compact_term_index(spark, incr)
        # tombstones cleared, postings rewritten without the deleted docs
        assert PX._tombstones(spark, incr) is None
        all_ids = {
            r["doc_id"]
            for r in spark.read.parquet(incr).select("doc_id").distinct().collect()
        }
        assert all_ids == {1, 3, 4}
        st = PX.read_stats(spark, incr)
        assert st["n_docs"] == 3.0
        assert st["sum_dl"] == float(
            sum(len(t.split()) for i, t in DOCS if i in (1, 3, 4))
        )


class TestIndexPhrase:
    @pytest.fixture(scope="class")
    def ppath(self, spark, tmp_path_factory):
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="the slow fast lane"),
                Row(doc_id=2, text="slow fast slow fast"),
                Row(doc_id=3, text="fast slow"),  # reversed: no match
                Row(doc_id=4, text="slow and fast"),  # gap: no match
                Row(doc_id=5, text="slow fast"),
            ]
        )
        path = str(tmp_path_factory.mktemp("phrase") / "idx")
        PX.build_term_index(docs, path, n_buckets=8)
        return path

    def test_adjacency_and_freq(self, spark, ppath):
        got = {
            r["doc_id"]: r["phrase_freq"]
            for r in PX.index_phrase_match(spark, ppath, ["slow", "fast"]).collect()
        }
        assert got == {1: 1, 2: 2, 5: 1}

    def test_order_matters(self, spark, ppath):
        got = {
            r["doc_id"]: r["phrase_freq"]
            for r in PX.index_phrase_match(spark, ppath, ["fast", "slow"]).collect()
        }
        assert got == {2: 1, 3: 1}

    def test_trigram_and_repeated_term(self, spark, ppath):
        got = {
            r["doc_id"]: r["phrase_freq"]
            for r in PX.index_phrase_match(
                spark, ppath, ["slow", "fast", "slow"]
            ).collect()
        }
        assert got == {2: 1}

    def test_delete_masks_phrase(self, spark, ppath):
        PX.delete_from_term_index(spark, ppath, [2])
        got = {
            r["doc_id"]
            for r in PX.index_phrase_match(spark, ppath, ["slow", "fast"]).collect()
        }
        assert got == {1, 5}
