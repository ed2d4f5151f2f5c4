"""BM25 relevance scoring + `_score` sort (opt-in).

The reference scores hits with tantivy's BM25 (quickwit-search collector
`SortByValue::Score` path; `tantivy_query_ast.rs` builds scoring queries
unless `ScoringDisabled`). SURVEY §2.6 declared relevance out of scope for
v1; this module closes that gap with the standard published BM25 the
reference's engine implements (Robertson/Sparck-Jones as used by
Lucene/tantivy, public formula):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf(t,d) = freq · (k1 + 1) / (freq + k1 · (1 − b + b · |d| / avgdl))
    score   = Σ_t idf(t) · tf(t,d)        k1 = 1.2, b = 0.75

Known divergence, documented: tantivy quantizes |d| through a one-byte
fieldnorm code before the norm division (a storage optimization); we use
the exact token count, so absolute scores differ slightly from tantivy's
at large |d| while the formula — and in practice the ranking — is the
same. Exact |d| is strictly *more* accurate and is DuckDB-expressible, so
the whole scorer is value-checked by the oracle gate.

Scale shape: two metadata-sized stats jobs (corpus N/avgdl aggregate; df
per query term via a pushed-down `isin` filter over distinct tokens —
result is #query-terms rows) feeding literal constants into ONE scoring
scan: per-doc freq/|d| are pure Column ops inside codegen, top-k is
TakeOrdered. No UDF, no shuffle beyond the two tiny aggs. A real
deployment caches (N, avgdl, df) per index epoch the way the reference
reads them from split metadata — pass ``stats`` to skip both jobs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.functions.tokenizers import tokenize_default

K1 = 1.2
B = 0.75


@dataclass(frozen=True)
class CorpusStats:
    """The per-(index, field) statistics BM25 needs; the analog of what
    tantivy reads from its inverted index + fieldnorm readers."""

    num_docs: int
    avg_dl: float
    doc_freq: dict[str, int]  # term → number of docs containing it


def _tokens(field_col: Column) -> Column:
    return tokenize_default(field_col)


def corpus_stats(
    df: DataFrame, field: str, terms: list[str]
) -> CorpusStats:
    """Gather (N, avgdl, df[t]) for the query's terms.

    ONE driver-sized aggregation job: N, average doc length and each query
    term's document frequency (sum of array_contains) come out of a single
    corpus scan — partial aggregation map-side, a one-row result."""
    uniq = list(dict.fromkeys(terms))
    toks = df.select(_tokens(F.col(field)).alias("_t"))
    aggs = [F.count(F.lit(1)).alias("n"), F.avg(F.size("_t")).alias("avgdl")] + [
        F.sum(F.array_contains("_t", t).cast("int")).alias(f"_df{i}")
        for i, t in enumerate(uniq)
    ]
    row = toks.agg(*aggs).first()
    n, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
    dfreq = {t: int(row[f"_df{i}"] or 0) for i, t in enumerate(uniq)}
    return CorpusStats(num_docs=n, avg_dl=avgdl, doc_freq=dfreq)


def idf(num_docs: int, doc_freq: int) -> float:
    """ln(1 + (N - df + 0.5)/(df + 0.5)) — the Lucene/tantivy BM25+ idf
    (never negative, unlike classic Robertson idf)."""
    return math.log(1.0 + (num_docs - doc_freq + 0.5) / (doc_freq + 0.5))


def _tf_norm(freq: Column, dl: Column, avg_dl: float, k1: float, b: float) -> Column:
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avg_dl or 1.0))
    return freq * F.lit(k1 + 1.0) / (freq + norm)


def term_freq_col(tokens: Column, term: str) -> Column:
    return F.size(F.filter(tokens, lambda x: x == F.lit(term))).cast("double")


def phrase_freq_col(tokens: Column, phrase: list[str]) -> Column:
    """Exact phrase occurrence count (slop 0): positions i where every
    phrase term matches consecutively — pure Column ops, codegen-side."""
    plen = len(phrase)
    if plen == 0:
        return F.lit(0.0)
    if plen == 1:
        return term_freq_col(tokens, phrase[0])
    # a document shorter than the phrase has zero start positions; the
    # naive sequence(1, size-plen+1) would DESCEND to [1, 0] there and
    # element_at(tokens, 0) always errors in Spark
    n_starts = F.size(tokens) - plen + 1
    starts = F.when(
        n_starts >= 1, F.sequence(F.lit(1), n_starts)
    ).otherwise(F.array().cast("array<int>"))

    def match_at(i):
        cond = F.lit(True)
        for j, t in enumerate(phrase):
            cond = cond & (F.element_at(tokens, i + F.lit(j)) == F.lit(t))
        return cond

    return F.size(F.filter(starts, match_at)).cast("double")


def bm25_score_col(
    tokens: Column,
    query_terms: list[str],
    stats: CorpusStats,
    phrases: list[list[str]] | None = None,
    k1: float = K1,
    b: float = B,
) -> Column:
    """Σ over query terms (and optional phrases) of idf·tf — one Column
    expression, evaluated in whole-stage codegen.

    A phrase contributes tantivy-style: phrase frequency through the tf
    saturation with the SUM of its member idfs (Lucene PhraseQuery)."""
    dl = F.size(tokens).cast("double")
    score = F.lit(0.0)
    for t in dict.fromkeys(query_terms):  # dedupe, keep order
        w = idf(stats.num_docs, stats.doc_freq.get(t, 0))
        score = score + F.lit(w) * _tf_norm(term_freq_col(tokens, t), dl, stats.avg_dl, k1, b)
    for ph in phrases or []:
        w = sum(idf(stats.num_docs, stats.doc_freq.get(t, 0)) for t in ph)
        score = score + F.lit(w) * _tf_norm(phrase_freq_col(tokens, ph), dl, stats.avg_dl, k1, b)
    return score


def bm25_topk(
    df: DataFrame,
    query: str,
    field: str,
    k: int = 10,
    id_col: str | None = None,
    mode: str = "or",
    phrase: bool = False,
    stats: CorpusStats | None = None,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k by BM25 `_score` over one text field — the `sort: _score`
    search path. ``mode="or"`` matches any query term (scores sum over the
    matching ones — absent terms contribute freq 0); ``mode="and"``
    requires every term; ``phrase=True`` requires the exact phrase and
    scores by phrase frequency. Ties break by ``id_col`` ascending (the
    reference's stable doc-order tiebreak). Returns the input columns plus
    ``_score`` (rounded to 6 dp for cross-engine comparability).
    """
    import re as _re

    # the same analysis as the document side (tokenize_default splits on
    # non-letter/digit and lowercases): "spark-sql" must score as two terms
    qterms = [t for t in _re.findall(r"[^\W_]+", query.lower()) if len(t) <= 255]
    if stats is None:
        stats = corpus_stats(df, field, qterms)
    # materialize the token array ONCE: the gate + per-term freqs + |d|
    # would otherwise each re-evaluate the tokenizer split (2·terms+1
    # copies in the expression tree — measured ~3× slower at sf0.1)
    with_t = df.withColumn("__toks", _tokens(F.col(field)))
    tokens = F.col("__toks")
    if phrase:
        freq_gate = phrase_freq_col(tokens, qterms) > 0
        score = bm25_score_col(
            tokens, [], stats, phrases=[qterms], k1=k1, b=b)
    else:
        gates = [term_freq_col(tokens, t) > 0 for t in qterms]
        freq_gate = gates[0] if gates else F.lit(False)
        for g in gates[1:]:
            freq_gate = (freq_gate & g) if mode == "and" else (freq_gate | g)
        score = bm25_score_col(tokens, qterms, stats, k1=k1, b=b)
    # the match gate is expressed as a NULL mask on _score rather than a
    # Filter: a filter would be pushed below any upstream repartition into
    # the (often single-task) scan stage and re-tokenize the whole corpus
    # serially. Non-matching docs keep a NULL score, sort after every real
    # match (desc ⇒ NULLS LAST), and are dropped after the top-k — same
    # rows as filter-then-top-k, but gate + score + |d| evaluate in ONE
    # parallel projection over one tokenization.
    scored = (
        with_t.withColumn("_score", F.when(freq_gate, F.round(score, 6)))
        .drop("__toks")
    )
    order = [F.col("_score").desc()]
    if id_col is not None:
        order.append(F.col(id_col).asc())
    return scored.orderBy(*order).limit(k).filter(F.col("_score").isNotNull())


def batch_bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    field: str = "text",
    id_col: str = "doc_id",
    query_id: str = "query_id",
    query_field: str = "query",
    k: int = 10,
    k1: float = K1,
    b: float = B,
    max_df: int | None = None,
) -> DataFrame:
    """Score MANY queries against the corpus in one job — the batch
    retrieval path. ``bm25_topk`` compiles each query into a Column
    expression (right for interactive single queries); at 10^6 queries
    that is 10^6 corpus scans. This re-expresses the inverted index the
    reference stores on disk (tantivy postings) as a DataFrame join:

        corpus tokens ⋈broadcast query-term set → tf → score → top-k

    Same formula as :func:`bm25_score_col` (OR semantics over deduped
    query terms), identical scores.

    Scale shape: the corpus never shuffles whole — tokens that match no
    query term die in the SAME stage that explodes them (broadcast hash
    join against the distinct query-term set), so the first shuffle
    carries only matching (doc, term) tokens for tf counting; df(t) is a
    tiny aggregate over those; the only other shuffles are
    groupBy(qid, doc) on candidate pairs and the per-query top-k window.
    Stopword-like query terms blow up the candidate set (df(t) rows
    each) — ``max_df`` drops terms matching more than that many docs, the
    same df-cap as ngram-jaccard's prefix filter (dedup.py:289); their
    idf ≈ 0 so the ranking is unchanged while join volume stays bounded.

    Returns (query_id, doc_id, _score, rank) — top-``k`` per query,
    ranked by score desc then doc asc (the reference's stable tiebreak).
    """
    from pyspark.sql import Window

    # one corpus tokenization: stats + token stream share it
    toks = docs.select(
        F.col(id_col).alias("__doc"), _tokens(F.col(field)).alias("__t")
    )
    row = toks.agg(
        F.count(F.lit(1)).alias("n"), F.avg(F.size("__t")).alias("avgdl")
    ).first()
    n_docs, avg_dl = int(row["n"]), float(row["avgdl"] or 1.0)

    q_terms = queries.select(
        F.col(query_id).alias("__qid"),
        F.explode(F.array_distinct(_tokens(F.col(query_field)))).alias("__term"),
    )
    term_set = q_terms.select("__term").distinct()

    # explode + broadcast-filter in ONE stage: non-query tokens never
    # reach a shuffle. tf counts only the survivors.
    hits = toks.select(
        "__doc",
        F.size("__t").cast("double").alias("__dl"),
        F.explode("__t").alias("__term"),
    ).join(F.broadcast(term_set), "__term")
    tf = hits.groupBy("__term", "__doc", "__dl").agg(
        F.count(F.lit(1)).cast("double").alias("__tf")
    )

    # df(t) = docs containing t; tf is unique per (term, doc) already
    df_t = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    if max_df is not None:
        df_t = df_t.filter(F.col("__df") <= max_df)
    idf_c = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )

    scored = (
        tf.join(F.broadcast(df_t), "__term")
        .join(F.broadcast(q_terms), "__term")  # fan out to the queries
        .withColumn(
            "__s", idf_c * _tf_norm(F.col("__tf"), F.col("__dl"), avg_dl, k1, b)
        )
        .groupBy("__qid", "__doc")
        .agg(F.round(F.sum("__s"), 6).alias("_score"))
    )
    w = Window.partitionBy("__qid").orderBy(
        F.col("_score").desc(), F.col("__doc").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__doc").alias(id_col),
            "_score",
            "rank",
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009, public):
    ``fused(d) = Σ_r 1/(k + rank_r(d))`` over the input ranked lists —
    the standard way hybrid search engines merge a lexical (BM25) list
    with a vector (ANN) list without score calibration. Elasticsearch's
    ``rrf`` retriever implements the same formula; this is the engine's
    hybrid-retrieval merge step.

    Each input DataFrame carries (id, rank) with rank starting at 1; ids
    absent from a list simply contribute nothing for it. Union → one
    groupBy over Σ|lists| rows (top-k-sized inputs, so the shuffle is a
    few thousand rows regardless of corpus size) → order by fused score
    desc, id asc. ``topk`` limits the output via TakeOrdered."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(id_col).alias("__id"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias(
                "__contrib"
            ),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("__id").agg(F.round(F.sum("__contrib"), 6).alias("rrf_score"))
    out = fused.select(F.col("__id").alias(id_col), "rrf_score").orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return out.limit(topk) if topk is not None else out


def more_like_this(
    docs: DataFrame,
    seed_ids: list[int],
    field: str = "text",
    id_col: str = "doc_id",
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 2,
    max_doc_freq: int | None = None,
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Elasticsearch ``more_like_this`` semantics (public query DSL): for
    each seed document, select its most characteristic terms by tf·idf —
    subject to the classic MLT knobs ``max_query_terms`` /
    ``min_term_freq`` / ``min_doc_freq`` / ``max_doc_freq`` — then score
    the whole corpus against that disjunction with BM25 and return the
    top-``k`` neighbours (the seed itself excluded, as ES does for
    like-by-id). The reference exposes the ES query DSL surface
    (quickwit-query's ES-compat layer); MLT is the retrieval-flavoured
    near-duplicate finder of that family, and doubles as a training-data
    "find me more documents like these" curation primitive.

    Term selection idf and scoring idf are the same BM25 idf
    (``ln(1 + (N − df + 0.5)/(df + 0.5))``), so a term's selection rank
    agrees with its scoring influence. Ties break by term ascending —
    deterministic.

    Scale shape: two corpus scans total regardless of seed count. Scan 1
    computes df(t) for the seed-term candidate set only — corpus tokens
    die in the same stage that explodes them via a broadcast hash join
    against the (tiny) distinct seed-term set, so the shuffle carries
    (term, doc) survivors, one row per distinct pair. Scan 2 is
    :func:`batch_bm25_search` (inverted-index-as-join, broadcast term
    set, df-capped). Seed-side work is seed-sized. Top-k re-ranks after
    seed exclusion via the same per-query window.

    Returns (query_id, doc_id, _score, rank): ``query_id`` is the seed
    doc id, ranks 1..k by score desc then doc asc.
    """
    from pyspark.sql import Window

    seeds = docs.filter(F.col(id_col).isin([int(s) for s in seed_ids]))
    seed_tf = (
        seeds.select(
            F.col(id_col).alias("__qid"),
            F.explode(_tokens(F.col(field))).alias("__term"),
        )
        .groupBy("__qid", "__term")
        .agg(F.count(F.lit(1)).cast("double").alias("__stf"))
        .filter(F.col("__stf") >= float(min_term_freq))
    )
    term_set = seed_tf.select("__term").distinct()

    # corpus stats: N plus df(t) for candidate terms only (one scan; the
    # explode feeds the broadcast join directly, non-candidates never
    # reach the distinct's shuffle)
    n_docs = int(docs.count())
    df_t = (
        docs.select(
            F.col(id_col).alias("__doc"),
            F.explode(F.array_distinct(_tokens(F.col(field)))).alias("__term"),
        )
        .join(F.broadcast(term_set), "__term")
        .groupBy("__term")
        .agg(F.count(F.lit(1)).cast("double").alias("__df"))
        .filter(F.col("__df") >= float(min_doc_freq))
    )
    if max_doc_freq is not None:
        df_t = df_t.filter(F.col("__df") <= float(max_doc_freq))

    idf_c = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    w_sel = Window.partitionBy("__qid").orderBy(
        F.col("__sel").desc(), F.col("__term").asc()
    )
    selected = (
        seed_tf.join(F.broadcast(df_t), "__term")
        .withColumn("__sel", F.col("__stf") * idf_c)
        .withColumn("__r", F.row_number().over(w_sel))
        .filter(F.col("__r") <= max_query_terms)
    )
    queries = selected.groupBy("__qid").agg(
        F.array_join(F.array_sort(F.collect_list("__term")), " ").alias("__q")
    )

    hits = batch_bm25_search(
        docs,
        queries,
        field=field,
        id_col=id_col,
        query_id="__qid",
        query_field="__q",
        k=k + 1,  # room for the seed itself before exclusion
        k1=k1,
        b=b,
    ).filter(F.col("__qid") != F.col(id_col))
    w_out = Window.partitionBy("__qid").orderBy(
        F.col("_score").desc(), F.col(id_col).asc()
    )
    return (
        hits.withColumn("rank", F.row_number().over(w_out))
        .filter(F.col("rank") <= k)
        .select(F.col("__qid").alias("query_id"), id_col, "_score", "rank")
    )


def suggest_prefix(
    docs: DataFrame,
    prefix: str,
    field: str = "text",
    k: int = 5,
    by_doc_freq: bool = True,
) -> DataFrame:
    """Prefix completion suggester (the ES completion/term-suggester shape,
    frequency-weighted): top-``k`` corpus terms starting with ``prefix``,
    ranked by document frequency (default) or total term frequency, ties
    by term ascending. The query-box autocomplete surface over the same
    tokenization as the search operators.

    Scale shape: one scan; tokens explode and the non-matching ones are
    filtered INSIDE the token array before the explode (F.filter on the
    array), so the shuffle carries only prefix-matching terms — for a
    selective prefix that is a sliver of the corpus. Map-side-combined
    groupBy(term) + TakeOrdered.

    Returns (term, freq: long).
    """
    toks = _tokens(F.col(field))
    if by_doc_freq:
        toks = F.array_distinct(toks)
    matching = F.filter(toks, lambda t: t.startswith(prefix))
    return (
        docs.select(F.explode(matching).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(k)
    )
