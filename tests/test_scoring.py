"""BM25 `_score` scoring (operators/scoring.py): formula vectors computed
by an independent in-test reference implementation, the three query shapes
(term / match-or / phrase), and the es_search `sort: _score` integration."""

import math

import pytest
from pyspark.sql import functions as F

from quickwit_spark.api import es_search
from quickwit_spark.operators.scoring import (
    CorpusStats,
    bm25_topk,
    corpus_stats,
    idf,
)

DOCS = [
    (1, "spark merges the shuffle files"),
    (2, "spark spark spark everywhere in spark land"),
    (3, "a very long document about merges and files and tables and rows and columns and parquet and arrow and pandas and numpy"),
    (4, "merge policy"),
    (5, "unrelated text entirely"),
    (6, "the spark merge policy merges splits"),
]


def ref_bm25(corpus, query_terms, phrase=None, k1=1.2, b=0.75):
    """Independent reference scorer (plain python over split tokens)."""
    toks = {i: t.lower().split() for i, t in corpus}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for i, t in toks.items():
        dl = len(t)
        score = 0.0
        for q in dict.fromkeys(query_terms or []):
            dfq = sum(1 for tt in toks.values() if q in tt)
            freq = t.count(q)
            w = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
            score += w * freq * (k1 + 1) / (freq + k1 * (1 - b + b * dl / avgdl))
        if phrase:
            occ = sum(
                1 for s in range(len(t) - len(phrase) + 1)
                if t[s:s + len(phrase)] == phrase
            )
            w = sum(
                math.log(1 + (n - sum(1 for tt in toks.values() if q in tt) + 0.5)
                         / (sum(1 for tt in toks.values() if q in tt) + 0.5))
                for q in phrase
            )
            score += w * occ * (k1 + 1) / (occ + k1 * (1 - b + b * dl / avgdl))
        out[i] = round(score, 6)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"]).cache()


def test_bm25_term_matches_reference_values(corpus):
    got = {r["doc_id"]: r["_score"]
           for r in bm25_topk(corpus, "spark", "text", k=10, id_col="doc_id").collect()}
    exp = {i: s for i, s in ref_bm25(DOCS, ["spark"]).items() if s > 0}
    assert got == pytest.approx(exp)
    # tf saturation + length norm: doc 2 (freq 4, short) far above doc 1
    assert got[2] > got[1]


def test_bm25_match_or_and_shapes(corpus):
    got_or = [r["doc_id"] for r in
              bm25_topk(corpus, "spark merge", "text", k=10, id_col="doc_id").collect()]
    exp = ref_bm25(DOCS, ["spark", "merge"])
    exp_order = [i for i, s in sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
                 if s > 0 and any(q in dict(DOCS)[i].lower().split()
                                  for q in ("spark", "merge"))]
    assert got_or == exp_order
    # AND: only docs containing both terms
    got_and = {r["doc_id"] for r in
               bm25_topk(corpus, "spark merge", "text", k=10,
                         id_col="doc_id", mode="and").collect()}
    assert got_and == {6}


def test_bm25_phrase_shape(corpus):
    got = {r["doc_id"]: r["_score"] for r in
           bm25_topk(corpus, "merge policy", "text", k=10,
                     id_col="doc_id", phrase=True).collect()}
    exp = {i: s for i, s in
           ref_bm25(DOCS, [], phrase=["merge", "policy"]).items() if s > 0}
    assert got == pytest.approx(exp)
    assert set(got) == {4, 6}  # only exact consecutive occurrences


def test_bm25_idf_never_negative():
    # BM25+ idf: a term in every doc still gets a small positive weight
    assert idf(10, 10) > 0
    assert idf(10, 1) > idf(10, 5)


def test_bm25_precomputed_stats_skip_jobs(corpus):
    stats = corpus_stats(corpus, "text", ["spark"])
    assert stats.num_docs == 6 and stats.doc_freq["spark"] == 3
    # cached-stats path returns the same scores
    a = bm25_topk(corpus, "spark", "text", k=3, id_col="doc_id").collect()
    b = bm25_topk(corpus, "spark", "text", k=3, id_col="doc_id", stats=stats).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bm25_scoring_stays_in_codegen(corpus):
    stats = corpus_stats(corpus, "text", ["spark"])
    out = bm25_topk(corpus, "spark", "text", k=3, id_col="doc_id", stats=stats)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python in the scoring scan
    assert "TakeOrderedAndProject" in plan  # top-k, no global sort


def test_es_search_score_sort(corpus):
    res = es_search(
        corpus,
        {"query": {"match": {"text": "spark merge"}},
         "sort": ["_score"], "size": 3},
        field_types={"text": "text"},
    )
    hits = res["hits"]["hits"]
    scores = [h["_score"] for h in hits]
    assert scores == sorted(scores, reverse=True)
    assert res["hits"]["max_score"] == scores[0]
    exp = ref_bm25(DOCS, ["spark", "merge"])
    assert hits[0]["_score"] == pytest.approx(
        max(s for i, s in exp.items()))
    # explicit asc order is honored too
    res_asc = es_search(
        corpus,
        {"query": {"match": {"text": "spark merge"}},
         "sort": [{"_score": "asc"}], "size": 10},
        field_types={"text": "text"},
    )
    asc = [h["_score"] for h in res_asc["hits"]["hits"]]
    assert asc == sorted(asc)


def test_es_search_score_sort_rejects_filter_shapes(corpus):
    with pytest.raises(ValueError, match="_score"):
        es_search(
            corpus,
            {"query": {"range": {"doc_id": {"gte": 2}}}, "sort": ["_score"]},
            field_types={"doc_id": "numeric", "text": "text"},
        )


def test_phrase_shorter_docs_do_not_crash(corpus, spark):
    # review finding: a doc shorter than the phrase must contribute zero
    # phrase starts, not an element_at(tokens, 0) crash
    rows = [(10, "hi"), (11, "merge policy wins"), (12, "")]
    df = corpus.unionByName(spark.createDataFrame(rows, ["doc_id", "text"]))
    got = {r["doc_id"] for r in
           bm25_topk(df, "merge policy", "text", k=10,
                     id_col="doc_id", phrase=True).collect()}
    assert got == {4, 6, 11}


def test_query_tokenization_matches_document_analysis(corpus):
    # "spark-sql" must analyze to two terms like the document side would
    got = {r["doc_id"] for r in
           bm25_topk(corpus, "spark-merges", "text", k=10, id_col="doc_id").collect()}
    exp = {i for i, s in ref_bm25(DOCS, ["spark", "merges"]).items() if s > 0}
    assert got == exp


def test_es_search_score_with_extra_filters_and_true_max(corpus):
    # extra_filters must not break _score (they are constant-score ANDs)
    res = es_search(
        corpus,
        {"query": {"match": {"text": "spark"}},
         "extra_filters": ["doc_id:<6"],
         "sort": ["_score"], "size": 1},
        field_types={"text": "text", "doc_id": "numeric"},
    )
    assert res["hits"]["total"]["value"] == 2  # docs 1, 2 (doc 6 filtered out)
    # max_score is over ALL matching hits even though size=1 returned the
    # best one — paginate to page 2 and the reported max must not change
    res2 = es_search(
        corpus,
        {"query": {"match": {"text": "spark"}},
         "sort": ["_score"], "from": 1, "size": 2},
        field_types={"text": "text"},
    )
    assert res2["hits"]["max_score"] >= res2["hits"]["hits"][0]["_score"]
    assert res2["hits"]["max_score"] == res["hits"]["max_score"]


def test_es_search_accepts_precomputed_stats(corpus):
    from quickwit_spark.operators.scoring import corpus_stats

    stats = corpus_stats(corpus, "text", ["spark"])
    a = es_search(corpus, {"query": {"match": {"text": "spark"}},
                           "sort": ["_score"], "size": 3},
                  field_types={"text": "text"})
    b = es_search(corpus, {"query": {"match": {"text": "spark"}},
                           "sort": ["_score"], "size": 3},
                  field_types={"text": "text"}, bm25_stats=stats)
    assert [h["_score"] for h in a["hits"]["hits"]] == \
        [h["_score"] for h in b["hits"]["hits"]]


def test_multi_index_score_sort(corpus, spark):
    """Cross-index `_score`: each index scores with its OWN stats (ES
    per-shard behavior), the root merges by score."""
    from quickwit_spark.api import es_multi_search

    other = spark.createDataFrame(
        [(100, "spark spark spark spark spark concentrate"),
         (101, "nothing relevant at all")],
        ["doc_id", "text"],
    )
    tables = {"idx-a": corpus, "idx-b": other}
    res = es_multi_search(
        tables, "idx-*",
        {"query": {"match": {"text": "spark"}}, "sort": ["_score"], "size": 4},
        field_types={"idx-a": {"text": "text"}, "idx-b": {"text": "text"}},
    )
    hits = res["hits"]["hits"]
    scores = [h["_score"] for h in hits]
    assert scores == sorted(scores, reverse=True)
    assert {h["_index"] for h in hits} == {"idx-a", "idx-b"}
    assert res["hits"]["total"]["value"] == 4  # 3 in idx-a + 1 in idx-b


def test_es_explain_bm25_breakdown(corpus):
    from quickwit_spark.api import es_explain

    res = es_explain(
        corpus, {"query": {"match": {"text": "spark merges"}}}, 1,
        field_types={"text": "text"},
    )
    assert res["matched"] is True
    exp = res["explanation"]
    # total equals the sum of the per-term weights, and matches the
    # independent reference scorer
    assert exp["value"] == pytest.approx(
        sum(d["value"] for d in exp["details"]), abs=2e-6)
    assert exp["value"] == pytest.approx(ref_bm25(DOCS, ["spark", "merges"])[1])
    idf_node = exp["details"][0]["details"][0]
    assert "idf" in idf_node["description"] and idf_node["value"] > 0
    # non-matching doc
    res5 = es_explain(corpus, {"query": {"match": {"text": "spark"}}}, 5,
                      field_types={"text": "text"})
    assert res5["matched"] is False and res5["explanation"]["value"] == 0.0
    # filter-shape query explains as constant score
    resf = es_explain(corpus, {"query": {"range": {"doc_id": {"gte": 4}}}}, 4,
                      field_types={"doc_id": "numeric", "text": "text"})
    assert resf["matched"] is True
    assert resf["explanation"]["description"].startswith("ConstantScore")


def test_search_after_with_score_cursor(corpus):
    page1 = es_search(
        corpus,
        {"query": {"match": {"text": "spark"}},
         "sort": [{"_score": "desc"}, {"doc_id": "asc"}], "size": 2},
        field_types={"text": "text"},
    )
    assert len(page1["hits"]["hits"]) == 2
    cursor = page1["hits"]["hits"][-1]["sort"]
    page2 = es_search(
        corpus,
        {"query": {"match": {"text": "spark"}},
         "sort": [{"_score": "desc"}, {"doc_id": "asc"}], "size": 2,
         "search_after": cursor},
        field_types={"text": "text"},
    )
    ids1 = [h["_source"]["doc_id"] for h in page1["hits"]["hits"]]
    ids2 = [h["_source"]["doc_id"] for h in page2["hits"]["hits"]]
    assert not set(ids1) & set(ids2)
    assert len(ids1 + ids2) == 3  # all three spark docs, no dup, no gap


def test_batch_bm25_equals_per_query_scorer(corpus, spark):
    """The inverted-index join path must reproduce bm25_topk exactly —
    same scores, same ranking, same tiebreak — for every query at once."""
    from pyspark.sql import Row

    from quickwit_spark.operators.scoring import batch_bm25_search, bm25_topk

    queries = ["spark merge", "fast spark", "merge split window"]
    qdf = spark.createDataFrame(
        [Row(query_id=i, query=q) for i, q in enumerate(queries)]
    )
    batch = batch_bm25_search(corpus, qdf, field="text", id_col="doc_id", k=10)
    got = {(r.query_id, r.rank): (r.doc_id, r._score) for r in batch.collect()}
    for qid, q in enumerate(queries):
        solo = bm25_topk(corpus, q, field="text", k=10, id_col="doc_id")
        rows = solo.select("doc_id", "_score").collect()
        assert rows, q
        for rank, r in enumerate(rows, start=1):
            assert got[(qid, rank)] == (r.doc_id, r._score), (q, rank)
        assert len([x for x in got if x[0] == qid]) == len(rows)


def test_batch_bm25_max_df_cap(corpus, spark):
    from pyspark.sql import Row

    from quickwit_spark.operators.scoring import batch_bm25_search

    qdf = spark.createDataFrame([Row(query_id=0, query="spark merge")])
    assert batch_bm25_search(corpus, qdf, k=5, max_df=0).count() == 0
    a = [tuple(r) for r in batch_bm25_search(corpus, qdf, k=5).collect()]
    b = [tuple(r) for r in batch_bm25_search(corpus, qdf, k=5, max_df=10**9).collect()]
    assert a == b and a


def test_batch_bm25_plan_no_corpus_wide_shuffle(corpus, spark):
    from pyspark.sql import Row

    from quickwit_spark.operators.scoring import batch_bm25_search

    qdf = spark.createDataFrame([Row(query_id=0, query="spark merge")])
    out = batch_bm25_search(corpus, qdf, k=5)
    p = out._jdf.queryExecution().executedPlan().toString()
    # the corpus-side token stream is filtered by a broadcast join in its
    # own stage; nothing sort-merges and nothing goes cartesian
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p
    assert p.count("BroadcastHashJoin") >= 2


def test_rrf_formula_matches_reference(spark):
    """RRF = Σ 1/(k + rank): independent dict-based reference."""
    from pyspark.sql import Row

    from quickwit_spark.operators.scoring import rrf_fuse

    lex = [(10, 1), (20, 2), (30, 3)]
    vec = [(20, 1), (40, 2), (10, 3), (50, 4)]
    a = spark.createDataFrame([Row(doc_id=d, rank=r) for d, r in lex])
    b = spark.createDataFrame([Row(doc_id=d, rank=r) for d, r in vec])
    got = [(r["doc_id"], r["rrf_score"]) for r in rrf_fuse([a, b], k=60).collect()]

    ref = {}
    for lst in (lex, vec):
        for d, r in lst:
            ref[d] = ref.get(d, 0.0) + 1.0 / (60 + r)
    want = sorted(
        ((d, round(s, 6)) for d, s in ref.items()), key=lambda t: (-t[1], t[0])
    )
    assert got == want
    # both-list doc 20 and 10 outrank any single-list doc
    assert [d for d, _ in got[:2]] == [20, 10]


def test_rrf_topk_and_tiebreak(spark):
    from pyspark.sql import Row

    from quickwit_spark.operators.scoring import rrf_fuse

    # two docs with identical contributions → tie broken by ascending id
    a = spark.createDataFrame([Row(doc_id=7, rank=1), Row(doc_id=3, rank=1)])
    got = rrf_fuse([a], k=60, topk=2).collect()
    assert [r["doc_id"] for r in got] == [3, 7]
    assert got[0]["rrf_score"] == got[1]["rrf_score"]
    assert len(rrf_fuse([a], topk=1).collect()) == 1


def test_rrf_requires_input(spark):
    from quickwit_spark.operators.scoring import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])
