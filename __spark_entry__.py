"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2
(plus the training-data-pipeline extras); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible one. Non-SQL-expressible ops (SipHash
routing, MinHash/SimHash, language-ID, fingerprints, the transcripts
pipeline itself) are rows-only entries; their correctness is asserted by
golden pytest vectors in tests/.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from quickwit_spark.operators import aggs as A
from quickwit_spark.operators import corpus as CP
from quickwit_spark.operators import dedup as D
from quickwit_spark.operators import similarity as S
from quickwit_spark.operators.query import QueryCompiler
from quickwit_spark.functions import text as TX

_EVENTS_FIELDS = {"event_type": "raw", "user_id": "numeric", "value": "numeric", "ts": "datetime"}
_DOCS_FIELDS = {"text": "text", "lang": "raw", "source": "raw", "n_chars": "numeric"}

_QC_EVENTS = QueryCompiler(_EVENTS_FIELDS)
_QC_DOCS = QueryCompiler(_DOCS_FIELDS, default_fields=("text",))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _fan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread an unsplittable scan across the cluster before CPU-heavy
    per-row work (guide §2.5: input skew from one-row-group files). The
    driver's parquet fixtures are single-row-group, so every scan stage is
    ONE task; tokenization/explode fused into it would run serially on a
    32-core box. Round-robin repartition to defaultParallelism (scale-
    adaptive — derived from the master, never a constant) costs one tiny
    exchange of the raw rows and parallelizes everything downstream."""
    return df.repartition(spark.sparkContext.defaultParallelism)


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the parse→route→aggregate shape over sf0.001 events —
    date-histogram buckets per event_type with count/cardinality/avg
    (Quickwit's per-sink date_histogram + terms + cardinality in one pass).
    """
    events = _t(spark, "/root/testdata/sf0.001", "events")
    return (
        events.groupBy(
            F.col("event_type").alias("sink"),
            (F.floor(F.unix_millis(F.col("ts").cast("timestamp")) / 86_400_000) * 86_400_000).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.countDistinct("user_id").alias("user_cardinality"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("sink", "key")
    )


# --------------------------------------------------------------------------
# queries + oracles
# --------------------------------------------------------------------------


def _q_agg_date_histogram(spark, sf_dir):
    return A.date_histogram(_t(spark, sf_dir, "events"), "ts", "1d", min_doc_count=1).select(
        "key", "key_as_string", "doc_count"
    )


def _q_agg_date_histogram_gapfill(spark, sf_dir):
    return A.date_histogram(
        _t(spark, sf_dir, "events"), "ts", "3d", offset="-1d", min_doc_count=0
    ).select("key", "key_as_string", "doc_count")


def _q_agg_histogram_value(spark, sf_dir):
    return A.histogram(_t(spark, sf_dir, "events"), "value", 25.0, min_doc_count=1).select(
        F.round("key", 6).alias("key"), "doc_count"
    )


def _q_agg_terms_event_type(spark, sf_dir):
    return A.terms(_t(spark, sf_dir, "events"), "event_type", size=100).select("key", "doc_count")


def _q_agg_terms_topk(spark, sf_dir):
    return A.terms(_t(spark, sf_dir, "events"), "event_type", size=3).select("key", "doc_count")


def _q_agg_multi_terms(spark, sf_dir):
    return A.multi_terms(_t(spark, sf_dir, "events"), ["event_type", "user_id"], size=20).select(
        "event_type", "user_id", "doc_count", "key_as_string"
    )


def _q_agg_cardinality_exact(spark, sf_dir):
    return A.cardinality(_t(spark, sf_dir, "events"), "user_id", exact=True)


def _q_agg_stats_value(spark, sf_dir):
    s = A.stats(_t(spark, sf_dir, "events"), "value")
    return s.select(
        "count",
        F.round("min", 6).alias("min"),
        F.round("max", 6).alias("max"),
        F.round("sum", 4).alias("sum"),
        F.round("avg", 6).alias("avg"),
    )


def _q_agg_extended_stats_value(spark, sf_dir):
    s = A.extended_stats(_t(spark, sf_dir, "events"), "value")
    return s.select(
        "count",
        F.round("variance", 4).alias("variance"),
        F.round("std_deviation", 6).alias("std_deviation"),
    )


def _q_agg_percentiles_value(spark, sf_dir):
    p = A.percentiles(_t(spark, sf_dir, "events"), "value", percents=(25.0, 50.0, 75.0, 95.0))
    return p.select(
        F.round("p25", 6).alias("p25"),
        F.round("p50", 6).alias("p50"),
        F.round("p75", 6).alias("p75"),
        F.round("p95", 6).alias("p95"),
    )


def _q_agg_range_value(spark, sf_dir):
    return A.range_agg(
        _t(spark, sf_dir, "events"),
        "value",
        [{"to": 10}, {"from": 10, "to": 50}, {"from": 50}],
    ).select("range_key", "doc_count")


def _q_agg_composite_after(spark, sf_dir):
    return A.composite(
        _t(spark, sf_dir, "events"), ["event_type", "user_id"], size=50,
        after={"event_type": "click", "user_id": 10},
    ).select("event_type", "user_id", "doc_count")


def _q_agg_composite_datehist(spark, sf_dir):
    # composite with a date_histogram source paginated by after_key
    # (aggregations.rs:500-570): (day-bucket, event_type) tuples
    return A.composite(
        _t(spark, sf_dir, "events"),
        [
            {"day": {"date_histogram": {"field": "ts", "fixed_interval": "1d"}}},
            {"etype": {"terms": {"field": "event_type"}}},
        ],
        size=40,
        after={"day": 1704240000000, "etype": "error"},
    ).select("day", "etype", "doc_count")


def _q_agg_terms_order_by_avg(spark, sf_dir):
    # terms ordered by a sub-aggregation value (aggregation.md:504-566)
    return A.terms(
        _t(spark, sf_dir, "events"), "event_type", size=3,
        metrics={"avg_value": ("avg", "value")}, order=("avg_value", "desc"),
    ).select("key", "doc_count", F.round("avg_value", 6).alias("avg_value"))


def _q_agg_top_hits(spark, sf_dir):
    # top-2 per event_type WITHOUT the row_number window: a window
    # partitioned by 5 event types degenerates to 5 sort tasks over the
    # whole table (guide §2.5 — single giant keys). Two map-side-combinable
    # argmax passes compute the same rows: rank-1 = max(struct(value,
    # -event_id)) per type (value desc, id asc tiebreak — exactly the
    # window's order), rank-2 = the same max after excluding each type's
    # rank-1 row via a 5-row broadcast. Groups with one row emit only
    # rank-1, matching rn <= 2.
    events = _t(spark, sf_dir, "events").select("event_type", "event_id", "value")
    key = F.struct(F.col("value").alias("v"), (-F.col("event_id")).alias("nid"))
    r1 = (
        events.groupBy("event_type")
        .agg(F.max(key).alias("k"))
        .select(
            "event_type",
            (-F.col("k.nid")).alias("event_id"),
            F.col("k.v").alias("value"),
        )
    )
    rest = events.join(
        F.broadcast(r1.select("event_type", F.col("event_id").alias("_e1"))),
        "event_type",
    ).filter(F.col("event_id") != F.col("_e1"))
    r2 = (
        rest.groupBy("event_type")
        .agg(F.max(key).alias("k"))
        .select(
            "event_type",
            (-F.col("k.nid")).alias("event_id"),
            F.col("k.v").alias("value"),
        )
    )
    return r1.unionByName(r2).select(
        "event_type", "event_id", F.round("value", 6).alias("value")
    )


def _q_agg_find_trace_ids(spark, sf_dir):
    out = A.find_trace_ids(_t(spark, sf_dir, "events"), "user_id", "ts", k=5)
    return out.select(
        F.col("trace_id"), F.unix_millis(F.col("max_ts").cast("timestamp")).alias("max_ts_ms")
    )


def _q_term(spark, sf_dir):
    return _QC_EVENTS.where(_t(spark, sf_dir, "events"), "event_type:error").select("event_id")


def _q_termset(spark, sf_dir):
    return _QC_EVENTS.where(_t(spark, sf_dir, "events"), "event_type:IN [click view]").select(
        "event_id"
    )


def _q_range_numeric(spark, sf_dir):
    return _QC_EVENTS.where(_t(spark, sf_dir, "events"), "value:[10 TO 20}").select("event_id")


def _q_range_ts(spark, sf_dir):
    return _QC_EVENTS.where(
        _t(spark, sf_dir, "events"),
        "ts:[2024-01-03T00:00:00Z TO 2024-01-06T12:00:00Z}",
    ).select("event_id")


def _q_bool(spark, sf_dir):
    return _QC_EVENTS.where(
        _t(spark, sf_dir, "events"),
        "(event_type:error OR event_type:click) AND value:>=5 -user_id:7",
    ).select("event_id")


def _q_exists(spark, sf_dir):
    df = _t(spark, sf_dir, "events").withColumn(
        "maybe", F.nullif(F.col("event_type"), F.lit("error"))
    )
    return _QC_EVENTS.where(df, "maybe:*").select("event_id")


def _q_wildcard(spark, sf_dir):
    return _QC_EVENTS.where(_t(spark, sf_dir, "events"), "event_type:c*").select("event_id")


def _q_regex(spark, sf_dir):
    return _QC_DOCS.where(_t(spark, sf_dir, "documents"), "text:/.*spark.*/").select("doc_id")


def _q_fulltext_and(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    from quickwit_spark.operators.query import FullText

    pred = _QC_DOCS.compile(FullText("text", "spark query", "and"))
    return docs.filter(pred).select("doc_id")


def _q_phrase(spark, sf_dir):
    return _QC_DOCS.where(_t(spark, sf_dir, "documents"), 'text:"slow fast"').select("doc_id")


def _q_phrase_prefix(spark, sf_dir):
    return _QC_DOCS.where(_t(spark, sf_dir, "documents"), 'text:"table val"*').select("doc_id")


def _q_json_extract(spark, sf_dir):
    events = _fan(spark, _t(spark, sf_dir, "events"))
    return (
        events.withColumn("k_val", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("k_val")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


_QC_IP = QueryCompiler({"client_ip": "ip", "event_type": "raw"})


def _with_ip(spark, sf_dir):
    """events + derived client_ip in the docmapper's normalized storage form
    (v4-mapped ::ffff:a.b.c.d; monotone in user_id for oracle parity)."""
    ev = _t(spark, sf_dir, "events")
    return ev.withColumn(
        "client_ip",
        F.concat(
            F.lit("::ffff:10.0."),
            F.floor(F.col("user_id") / 256).cast("long").cast("string"),
            F.lit("."),
            F.pmod(F.col("user_id"), F.lit(256)).cast("string"),
        ),
    )


def _q_ip_term(spark, sf_dir):
    return _QC_IP.where(_with_ip(spark, sf_dir), "client_ip:10.0.0.42").select("event_id")


def _q_ip_range(spark, sf_dir):
    # u128-ordered range: lexicographic order on the stored string would be
    # wrong (e.g. "….120" < "….20"), the sortable-hex compile path is exact
    return _QC_IP.where(
        _with_ip(spark, sf_dir), "client_ip:[10.0.0.20 TO 10.0.0.120]"
    ).select("event_id")


def _q_sort_topk(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(10)
        .select("event_id", F.round("value", 6).alias("value"))
    )


def _q_search_after(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    # cursor = 10th row of sort_topk: strictly-after in (value desc, id asc)
    cur = (
        events.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(10)
        .collect()[-1]
    )
    after = (F.col("value") < cur["value"]) | (
        (F.col("value") == cur["value"]) & (F.col("event_id") > cur["event_id"])
    )
    return (
        events.filter(after)
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(10)
        .select("event_id", F.round("value", 6).alias("value"))
    )


def _q_from_size(spark, sf_dir):
    # TakeOrderedAndProject keeps frm+size rows; the slicing window runs over
    # those 20 rows, never a single-partition sort of the relation
    from quickwit_spark.operators.sorts import paginate

    events = _t(spark, sf_dir, "events")
    return paginate(events, [("value", True), ("event_id", False)], frm=10, size=10).select(
        "event_id", F.round("value", 6).alias("value")
    )


def _q_count_only(spark, sf_dir):
    return _t(spark, sf_dir, "events").agg(F.count(F.lit(1)).alias("cnt"))


def _q_join_broadcast_enrich(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def _q_join_semi_two_phase(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    err_users = events.filter(F.col("event_type") == "error").select("user_id").distinct()
    return events.join(err_users, "user_id", "left_semi").select("event_id")


def _q_join_union_multi_index(spark, sf_dir):
    events = _t(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "click")
    b = events.filter(F.col("value") >= 90)
    return a.unionByName(b).groupBy("event_type").agg(F.count(F.lit(1)).alias("doc_count"))


def _q_dedup_exact(spark, sf_dir):
    return D.dedup_exact(_t(spark, sf_dir, "documents"))


def _q_dedup_minhash_lsh(spark, sf_dir):
    # LSH candidates + EXACT-Jaccard verify (the production precision step)
    # at threshold 0.9: banding recall for ≥0.9 pairs is 1-(1-0.9⁴)¹⁶ ≈
    # 1-3e-8 and deterministically 1 on this fixture (checked), so the
    # output equals the all-pairs exact-Jaccard oracle — fully
    # DuckDB-expressible, estimator noise eliminated by the verify.
    return D.minhash_dedup_pairs(
        _fan(spark, _t(spark, sf_dir, "documents")), threshold=0.9, num_perm=64,
        num_bands=16, verify="exact",
    ).select("a", "b", "jaccard")


def _q_dedup_ngram_jaccard(spark, sf_dir):
    return D.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5).select(
        "a", "b", "jaccard"
    )


def _q_dedup_simhash(spark, sf_dir):
    # planted duplicates + hamming-0 bucketing + exact multiset verify:
    # SimHash is a pure function of the sorted token multiset, so multiset-
    # equal pairs ALWAYS share the hash (recall 1 through the pigeonhole
    # chunks) and verify_exact removes hash collisions between different
    # texts — output ≡ multiset-equal pairs, DuckDB-expressible with no
    # dependence on hash luck. (Near-dup hamming ≤ 3 stays pytest-covered.)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return D.simhash_near_dup_pairs(
        _fan(spark, docs.unionByName(planted)), max_hamming=0, verify_exact=True
    ).select("a", "b", "hamming")


def _q_dedup_embedding_cosine(spark, sf_dir):
    # the synthetic embeddings are near-orthogonal; 0.4 marks the "suspiciously
    # similar" tail so the check exercises real matches. 0.4 is far too loose
    # for LSH pruning, so the EXACT tiled block-matmul join is the right shape:
    # the O(n²) grid is split into even block tiles (no unbucketed self-join).
    return S.embedding_exact_pairs_blocked(
        _fan(spark, _t(spark, sf_dir, "embeddings")), threshold=0.4, num_blocks=8
    ).select("a", "b")


def _q_dedup_embedding_lsh(spark, sf_dir):
    # LSH near-dup in its REAL regime (cosine >= 0.95): the fixture's vectors
    # are near-orthogonal, so plant exact duplicates (vec_id+100000 for every
    # 7th vector) on both the Spark and oracle side. Identical vectors share
    # every hyperplane sign, so bucketed recall is exactly 1 here while the
    # candidate set stays ~n²/2^bits per table — the 100 TB path.
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return S.embedding_near_dup_pairs(
        _fan(spark, emb.unionByName(planted)), threshold=0.95, bits=10, tables=4,
        dim=64,  # fixture embeddings are 64-d; skips the operator's
        # driver-side first() dimension probe (2 jobs per call)
    ).select("a", "b")


def _q_dedup_clusters(spark, sf_dir):
    # pairs → connected components → canonical (min-id) cluster labels: the
    # keep-one selection step of a dedup pipeline. Oracle = recursive CTE.
    pairs = S.embedding_exact_pairs_blocked(
        _fan(spark, _t(spark, sf_dir, "embeddings")), threshold=0.4, num_blocks=8
    )
    return D.near_dup_clusters(pairs).select("member", "cluster")


def _q_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    return S.cosine_topk(emb, list(q), k=10).select("vec_id", F.round("cosine", 4).alias("cosine"))


def _q_ann_ivf(spark, sf_dir):
    # IVF cell assignment end-to-end; probing ALL cells makes it exact, so the
    # brute-force oracle applies (partial-probe recall is pytest-covered)
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    rng = np.random.default_rng(3)
    centroids = rng.standard_normal((4, len(q))) * 0.1
    return S.ivf_topk(emb, list(q), centroids, k=10, n_probe=4).select(
        "vec_id", F.round("cosine", 4).alias("cosine")
    )


def _q_ann_lsh(spark, sf_dir):
    # probing ALL buckets (multiprobe radius = bits) makes hyperplane LSH
    # exact, so the brute-force oracle applies — mirrors ann_ivf's probe-all
    # trick; partial-probe recall stays pytest-covered
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    return S.lsh_topk(emb, list(q), k=10, bits=6, multiprobe_hamming=6).select(
        "vec_id", F.round("cosine", 4).alias("cosine")
    )


def _q_text_token_count(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))


def _q_text_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_toks = F.size(F.split("text", " "))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^\w\s]"), 0))
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
    )


# seeded known-language fixture: doc_id picks one of 19 sentences whose true
# language the classifier is verified to identify (pytest parity + this
# oracle); the DuckDB side emits the EXPECTED label, so equality holds iff
# lang_id_udf classifies every fixture sentence correctly at every doc_id.
_LANGID_FIXTURE = [
    ("en", "The quick brown fox jumps over the lazy dog and the cat"),
    ("fr", "Le chat est sur la table et le chien dort dans la maison"),
    ("de", "Der Hund und die Katze spielen in dem schönen Garten"),
    ("es", "El perro y el gato juegan en la casa de la abuela"),
    ("it", "Il gatto dorme sulla sedia che si trova nella cucina"),
    ("pt", "O cachorro e o gato brincam na casa da minha avó"),
    ("nl", "De hond en de kat spelen in het huis van mijn oma"),
    ("sv", "Hunden och katten leker i huset och de är mycket glada"),
    ("ru", "Собака и кошка играют в доме моей бабушки сегодня"),
    ("ja", "犬と猫は家で遊んでいます、とても楽しいです"),
    ("zh", "狗和猫在我奶奶的房子里玩耍,它们非常开心"),
    ("ko", "개와 고양이가 할머니 집에서 놀고 있어요"),
    ("ar", "الكلب والقطة يلعبان في منزل جدتي اليوم"),
    ("he", "הכלב והחתול משחקים בבית של סבתא שלי"),
    ("el", "Ο σκύλος και η γάτα παίζουν στο σπίτι της γιαγιάς μου"),
    ("th", "สุนัขและแมวกำลังเล่นอยู่ที่บ้านของยายวันนี้"),
    ("hi", "कुत्ता और बिल्ली आज दादी के घर में खेल रहे हैं"),
    ("tr", "Köpek ve kedi bugün büyükannemin evinde oynuyor bir"),
    ("id", "Anjing dan kucing sedang bermain di rumah nenek yang besar"),
]


def _q_text_langid(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    k = len(_LANGID_FIXTURE)
    text = F.element_at(
        F.array(*[F.lit(s) for _, s in _LANGID_FIXTURE]),
        (F.col("doc_id") % k + 1).cast("int"),
    )
    return docs.select("doc_id", TX.lang_id_udf(text).alias("lang_guess"))


def _q_dedup_incremental(spark, sf_dir):
    """Incremental MinHash dedup (dedup.minhash_dedup_incremental): the
    even-id half of documents is the already-deduped corpus (persisted
    signatures only — its text is never touched), the odd-id half arrives
    as the new batch. Returns the new batch's survivors plus pair counts;
    rows-only gate (MinHash permutations aren't SQL-expressible; batch-
    equivalence and the zero-corpus-shuffle plan are pytest-pinned in
    tests/test_dedup_incremental.py)."""
    from quickwit_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_signatures,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    index = minhash_signatures(corpus, num_perm=64)
    res = minhash_dedup_incremental(
        batch, index, threshold=0.5, shingle_size=3, num_perm=64, num_bands=16
    )
    kept = res.new_kept.select(F.col("doc_id"))
    n_pairs = res.pairs.select(F.count(F.lit(1)).alias("n_pairs"))
    return kept.crossJoin(n_pairs).orderBy("doc_id")


def _q_semantic_dedup_incremental(spark, sf_dir):
    """Incremental EMBEDDING dedup (similarity.embedding_dedup_incremental):
    even-id embeddings are the persisted survivor index, odd-id the new
    batch; exact-cosine probe = broadcast batch + one index scan. Rows-only
    (LSH tables + BLAS probe aren't SQL-expressible; batch-equivalence is
    pytest-pinned in tests/test_embedding_incremental.py)."""
    from quickwit_spark.operators.similarity import embedding_dedup_incremental

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    index = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    res = embedding_dedup_incremental(batch, index, threshold=0.9)
    kept = res.new_kept.select("vec_id")
    n_pairs = res.pairs.select(F.count(F.lit(1)).alias("n_pairs"))
    return kept.crossJoin(n_pairs).orderBy("vec_id")


def _q_text_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint_col(F.col("text")).alias("fingerprint"))


def _q_join_asof(spark, sf_dir):
    """Backward as-of join (latest-state temporal enrich): every event
    picks up the tier from a slowly-changing per-user dimension (3 epochs
    at deterministic offsets) active at-or-before its timestamp; events
    before a user's first epoch keep a null tier (left semantics). One
    shuffle + one window, no join node (operators/joins.py). Oracle:
    DuckDB's native ASOF LEFT JOIN."""
    from quickwit_spark.operators.joins import asof_join

    events = _t(spark, sf_dir, "events")
    # parquet ts is TIMESTAMP_NTZ (no direct → long cast); session tz is
    # pinned UTC so the ltz hop is value-preserving
    facts = events.select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("ts_e"),
    )
    dim = (
        events.select("user_id").distinct()
        .select(
            "user_id",
            F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
        )
        .select(
            "user_id",
            (
                F.lit(1704067200)
                + F.col("k") * F.lit(9 * 86400)
                + (F.col("user_id") % 24) * F.lit(3600)
            ).alias("eff_ts"),
            F.element_at(
                F.array(F.lit("bronze"), F.lit("silver"), F.lit("gold")),
                (F.col("k") + 1).cast("int"),
            ).alias("tier"),
        )
    )
    return asof_join(
        facts, dim, on="user_id", ts_fact="ts_e", ts_dim="eff_ts",
        payload_cols=["tier"],
    )


_BATCH_BM25_QUERIES = ["join hash", "merge vector scan", "filter row batch"]


def _q_batch_bm25(spark, sf_dir):
    """Batch BM25 retrieval (operators/scoring.py batch_bm25_search): all
    queries scored in ONE job via the inverted-index join — corpus tokens
    broadcast-filtered by the query-term set, tf/df over survivors only,
    top-10 per query. Equality with the per-query bm25_topk scorer is
    pytest-asserted; the oracle restates the full join formulation in
    DuckDB."""
    from pyspark.sql import Row

    from quickwit_spark.operators.scoring import batch_bm25_search

    docs = _t(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(
        [Row(query_id=i, query=q) for i, q in enumerate(_BATCH_BM25_QUERIES)]
    )
    out = batch_bm25_search(docs, qdf, field="text", id_col="doc_id", k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical top-20 fused with exact-cosine vector
    top-20 by reciprocal-rank fusion (operators/scoring.py rrf_fuse) — the
    Elasticsearch ``rrf`` retriever shape, merging two uncalibrated score
    scales via ranks alone. documents.doc_id and embeddings.vec_id share
    the same 0..n-1 id space by construction, so both rankers address one
    corpus. Each input list is k-sized, so the fusion union+groupBy moves
    O(k) rows regardless of corpus size; the two retrievals themselves are
    the already-gated scan shapes (codegen BM25 filter+TakeOrdered, codegen
    cosine+TakeOrdered)."""
    from quickwit_spark.operators.scoring import bm25_topk, rrf_fuse

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, "spark merge", "text", k=20, id_col="doc_id").select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("_score").desc(), F.col("doc_id").asc()))
        .alias("rank"),
    )
    qv = emb.filter(F.col("vec_id") == 5).first()["embedding"]
    vec = S.cosine_topk(emb, list(qv), k=20).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(W.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()))
        .alias("rank"),
    )
    return rrf_fuse([lex, vec], id_col="doc_id", k=60, topk=20)


def _q_ann_ivf_pq(spark, sf_dir):
    """IVF-PQ / IVFADC (similarity.py ivf_pq_build + ivf_pq_topk) end to
    end: coarse centroids = embeddings 0..3, PQ codebooks = embeddings
    10..13 sliced into 4 × 16-dim subspaces (both deterministic and
    DuckDB-restatable — the same derivation trick as ann_pq/kmeans_step),
    query = embedding 5, residual encoding, n_probe=2 of 4 cells — a
    genuinely PARTIAL probe (unlike ann_ivf's probe-all), so the oracle
    restates cell assignment, residual PQ codes, the probed-cell filter
    and the ADC sum itself rather than falling back to brute force."""
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings")
    rows = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.filter(
            F.col("vec_id").isin(0, 1, 2, 3, 5, 10, 11, 12, 13)
        ).collect()
    }
    centroids = np.stack([rows[i] for i in range(4)])
    base = np.stack([rows[i] for i in (10, 11, 12, 13)])
    m, dsub = 4, 16
    codebooks = np.stack([base[:, j * dsub : (j + 1) * dsub] for j in range(m)])
    index = S.ivf_pq_build(emb, centroids, codebooks)
    return S.ivf_pq_topk(
        index, [float(x) for x in rows[5]], centroids, codebooks, k=15, n_probe=2
    )


def _q_sessionize(spark, sf_dir):
    """Gap-based batch sessionization (6h gap) + per-session aggregates —
    the batch analog of streaming conversation_sessions, one shuffle, two
    stacked windows + groupBy (operators/joins.py). Oracle: identical
    lag/running-sum window SQL in DuckDB."""
    from quickwit_spark.operators.joins import session_stats

    events = _t(spark, sf_dir, "events")
    f = events.select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("ts_e"),
    )
    return session_stats(
        f, on="user_id", ts_col="ts_e", gap=21600, order_tiebreak="event_id"
    )


def _q_vrl_transform(spark, sf_dir):
    """The r5 VRL expression layer end-to-end (vrl_processing.rs:50-96
    behavior): synthesize an apache_common access-log line from events
    columns (set_expr), grok it back with the preset library (typed
    groups), apply a where-guarded mutation (the VRL conditional), a
    default (`.tag ?? 'cold'`), and parse_timestamp round-trip to epoch.
    All steps stay in whole-stage codegen; the oracle restates the
    semantics (what grok must extract from that line) directly over the
    source columns."""
    from quickwit_spark.operators.transforms import apply_transforms

    events = _t(spark, sf_dir, "events")
    steps = [
        {"op": "set_expr", "field": "line", "expr": (
            "concat('10.0.', cast(user_id % 256 as string), '.1 - frank "
            "[10/Oct/2024:13:55:36 +0000] \"GET /', event_type, "
            "' HTTP/1.1\" ', cast(200 + (event_id % 5) as string), ' ', "
            "cast(cast(floor(value * 100) as bigint) as string))"
        )},
        {"op": "grok", "field": "line", "preset": "apache_common",
         "groups": {"status": "long"}},
        # VRL: if .status >= 203 { .path = upcase(.path) }
        {"op": "uppercase", "field": "path", "where": "status >= 203"},
        # VRL: .tag = .tag ?? "cold"
        {"op": "set_expr", "field": "tag",
         "expr": "case when event_id % 3 = 0 then 'hot' end"},
        {"op": "default", "field": "tag", "value": "cold"},
        # VRL: .parsed = parse_timestamp!(.ts_str, format: ...)
        {"op": "set_expr", "field": "ts_str",
         "expr": "date_format(ts, 'yyyy-MM-dd HH:mm:ss')"},
        {"op": "parse_timestamp", "field": "ts_str", "to": "parsed",
         "format": "yyyy-MM-dd HH:mm:ss"},
        {"op": "set_expr", "field": "parsed_epoch",
         "expr": "unix_timestamp(parsed)"},
    ]
    out = apply_transforms(events, steps)
    return out.select(
        "event_id", "client_ip", "method", "path", "status",
        F.col("bytes").alias("bytes_out"), "tag", "parsed_epoch",
    )


_VRL_PROGRAM = """
# the textual VRL a reference user ships in source-config `transform:`
.etype = upcase(string!(.event_type))
.k = to_int!(parse_json!(.props)["k"])
if .value >= 100.0 { .tier = "high" }
else if .value >= 10.0 { .tier = "mid" }
else { .tier = "low" }
.user_tag = "u" + string!(.user_id)
.day = format_timestamp(.ts, "%Y-%m-%d")
.flag = contains(.event_type, "err") || .value < 0.0
del(.props)
"""


def _q_vrl_program(spark, sf_dir):
    """The VRL SOURCE compiler (operators/vrl.py) end-to-end: the program
    text a reference user puts in their source config — locals, fallible
    `!` calls, if/else-if chains, `??`-style string ops, parse_json map
    reads, strptime formats, del() — compiled into ONE Catalyst projection
    (vrl_processing.rs:50-96 + docs/configuration/source-config.md
    semantics; plan shape pinned in tests/test_vrl.py)."""
    from quickwit_spark.operators.vrl import apply_vrl

    events = _t(spark, sf_dir, "events")
    out = apply_vrl(events, _VRL_PROGRAM)
    return out.filter(F.col("event_id") < 5000).select(
        "event_id", "etype", "k", "tier", "user_tag", "day", "flag"
    )


def _q_text_tfidf(spark, sf_dir):
    """Per-doc top-5 TF-IDF keywords (corpus.tfidf_keywords): smoothed-idf
    ranking with deterministic term tie-break; one tokenize shuffle, df
    derived from the deduplicated (doc,term) frame (text read once)."""
    from quickwit_spark.operators.corpus import tfidf_keywords

    docs = _t(spark, sf_dir, "documents")
    out = tfidf_keywords(docs, text_col="text", id_col="doc_id", k=5)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _q_text_quality_classifier(spark, sf_dir):
    """fastText-style hashed-BoW quality scoring (operators/classifier.py):
    pure-codegen inference — tokenize, portable polynomial hash, broadcast
    1024-row weight table, one map-side-combined groupBy(doc_id). The
    weight table here is the arithmetic formula_weights() so the DuckDB
    oracle regenerates it from bucket ids (training itself is driver-side
    and pytest-pinned in tests/test_classifier.py)."""
    from quickwit_spark.operators.classifier import (
        TextClassifier, formula_weights, score_text_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    model = TextClassifier(formula_weights(1024), bias=-0.05, buckets=1024)
    out = score_text_classifier(docs, model, text_col="text", id_col="doc_id")
    return out.withColumn("n_tokens", F.col("n_tokens").cast("long"))


def _quality_hash_sql(tok: str, buckets: int) -> str:
    """The classifier's portable token hash restated as DuckDB SQL (same
    unrolled polynomial as classifier.hash_token_col)."""
    pows = [pow(31, i, buckets) for i in range(12)]
    terms = " + ".join(
        f"(CASE WHEN length({tok}) >= {i + 1} THEN "
        f"(ascii(substr({tok},{i + 1},1)) % 256) * {p} ELSE 0 END)"
        for i, p in enumerate(pows)
    )
    return f"(({terms} + 7919 * (length({tok}) % 64)) % {buckets})"


def _quality_classifier_oracle() -> str:
    buckets, bias = 1024, -0.05
    return f"""
        WITH tok AS (
          SELECT doc_id, t AS tok
          FROM (SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
                FROM documents)
          WHERE t <> ''
        ), hashed AS (
          SELECT doc_id, {_quality_hash_sql('tok', buckets)} AS bucket FROM tok
        ), persum AS (
          SELECT doc_id, count(*)::BIGINT AS n_tokens,
                 sum((((bucket * 1103515245 + 12345) % 2001) - 1000) / 1000.0) AS wsum
          FROM hashed GROUP BY doc_id
        ), alldocs AS (
          SELECT d.doc_id,
                 coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
                 coalesce(p.wsum, 0.0) AS wsum
          FROM documents d LEFT JOIN persum p USING (doc_id)
        ), z AS (
          SELECT doc_id, n_tokens,
                 {bias} + (CASE WHEN n_tokens > 0 THEN wsum / n_tokens ELSE 0.0 END) AS z
          FROM alldocs
        )
        SELECT doc_id, n_tokens,
               round(1.0 / (1.0 + exp(-z)), 6) AS score,
               (CASE WHEN round(1.0 / (1.0 + exp(-z)), 6) >= 0.5
                     THEN 1 ELSE 0 END)::INTEGER AS pred
        FROM z
    """


def _q_chat_render(spark, sf_dir):
    """Conversation → training-example rendering (operators/chat.py):
    deterministic synthetic transcript derived from documents (conv_id =
    doc_id % 97, role cycles user/assistant/tool), ChatML template, plus
    1-based assistant-text spans for loss masking. One shuffle
    (groupBy(conv) + array_sort), rendering/span fold in pure Catalyst
    higher-order functions."""
    from quickwit_spark.operators.chat import render_conversations

    docs = _t(spark, sf_dir, "documents")
    turns = docs.select(
        (F.col("doc_id") % 97).alias("conv_id"),
        (F.col("doc_id") / 97).cast("long").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            ((F.col("doc_id") / 97).cast("long") % 3 + 1).cast("int"),
        ).alias("role"),
        F.substring(F.col("text"), 1, 80).alias("text"),
    )
    return render_conversations(turns)


def _q_dedup_paragraphs(spark, sf_dir):
    """C4-style paragraph dedup over deterministic synthetic paragraphs
    (doc_id arithmetic forces cross-document repeats: 5 paras per doc drawn
    from a 199-key space, so every key recurs ~12× at sf0.01)."""
    docs = _t(spark, sf_dir, "documents")
    paras = F.transform(
        F.sequence(F.lit(0), F.lit(4)),
        lambda j: F.concat(
            F.lit("para"), ((F.col("doc_id") * 31 + j * 7) % 199).cast("string")
        ),
    )
    return D.dedup_paragraphs(docs.select("doc_id", paras.alias("paras")))


def _q_decontaminate(spark, sf_dir):
    """Train/test decontamination: every 50th doc acts as the benchmark set;
    flag corpus docs sharing any word 5-gram with it (the 13-gram rule at a
    gram size that exists in the ~30-word synthetic docs)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    return D.decontaminate(docs, bench, n=5)


def _q_dedup_substrings(spark, sf_dir):
    """Exact substring-level duplication (Lee et al. token-window form):
    per-doc duplicated 8-token-window counts; first global occurrence of a
    span is not a duplicate. The synthetic ~30-word vocabulary repeats real
    8-grams across docs (~5% of windows at sf0.01), so the stats are
    non-trivial without planting."""
    docs = _fan(spark, _t(spark, sf_dir, "documents"))
    return D.dedup_substrings(docs, window=8)


def _q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style cluster-then-prune over embeddings: codebook = the 8
    lowest-vec_id embeddings, planted exact duplicates (vec_id+100000 for
    every 7th vector) are the rows that must be dropped (kept=false)."""
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    cents = np.stack(
        [r["embedding"] for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()]
    )
    return S.semantic_dedup(_fan(spark, emb.unionByName(planted)), cents, threshold=0.95)


def _q_bigram_lm(spark, sf_dir):
    """Perplexity filtering: per-doc cross-entropy under an add-α bigram LM
    trained on the corpus itself (the CCNet/KenLM quality tier)."""
    docs = _fan(spark, _t(spark, sf_dir, "documents"))
    return CP.bigram_lm_scores(docs)


def _q_score_bm25(spark, sf_dir):
    # BM25 _score top-k (operators/scoring.py): the documents fixture is
    # pure-ASCII whitespace-separated words, so tokenize_default ==
    # whitespace split and DuckDB can restate the full scoring formula
    from quickwit_spark.operators.scoring import bm25_topk

    docs = _fan(spark, _t(spark, sf_dir, "documents"))
    return bm25_topk(docs, "spark merge", "text", k=20, id_col="doc_id").select(
        "doc_id", "_score"
    )


def _q_epoch_shuffle(spark, sf_dir):
    from quickwit_spark.operators.corpus import epoch_shuffle

    out = epoch_shuffle(_t(spark, sf_dir, "documents"), seed=7, num_shards=8)
    return out.select("doc_id", "shard", F.col("pos").cast("long").alias("pos"))


def _q_text_normalize(spark, sf_dir):
    # documents text is already clean — inject deterministic mess first so
    # the normalizer has real work, mirrored exactly in the oracle
    from quickwit_spark.functions.text import normalize_text_col

    docs = _t(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("  "), F.col("text"),
        F.lit("\u200b\u00a0end\tof\x07doc  "),
    )
    return docs.select("doc_id", normalize_text_col(messy).alias("clean"))


def _q_text_gopher(spark, sf_dir):
    from quickwit_spark.functions.text import gopher_features, gopher_keep_col

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", *gopher_features(F.col("text")),
        gopher_keep_col(F.col("text")).alias("keep"),
    )


def _q_kmeans_step(spark, sf_dir):
    """One distributed Lloyd iteration (the codebook trainer behind
    ivf_topk / semantic_dedup / pq_encode) with centroids = the 4 lowest-id
    embedding rows — deterministic and DuckDB-restatable. Output is the
    exploded per-cluster mean (cluster, idx, value, n); the full fit loop
    (empty-cluster repair, convergence, cosine metric, partitioning
    independence) is pytest-verified in tests/test_kmeans.py."""
    import numpy as np

    from quickwit_spark.operators.similarity import kmeans_step

    emb = _t(spark, sf_dir, "embeddings")
    rows = sorted(
        emb.filter(F.col("vec_id") < 4).collect(), key=lambda r: r["vec_id"]
    )
    C = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    out = kmeans_step(emb, C, round_decimals=6)
    return out.select(
        F.col("cluster").cast("long").alias("cluster"),
        F.col("idx").cast("long").alias("idx"),
        "value",
        "n",
    )


def _q_snippet(spark, sf_dir):
    """snippet_fields (fetch_docs.rs:150-341 + tantivy's snippet module) in
    its SQL-expressible regime: excerpts under the 150-byte fragment window
    collapse to ONE fragment spanning [0, last-token-end), with every
    analyzed query-term occurrence <b>-wrapped and html-escaped. The
    multi-fragment selection / byte-window / df-scoring semantics are pytest
    golden-verified (tests/test_snippets.py); here the distributed operator
    (one no-shuffle doc-freq aggregate + one Arrow-batched kernel) must agree
    with DuckDB's independent string-algebra restatement."""
    from quickwit_spark.operators.snippets import with_snippet_column

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 140).alias("excerpt")
    )
    out = with_snippet_column(docs, "excerpt", "excerpt:customer")
    return out.filter(F.col("snippet") != "").select("doc_id", "snippet")


def _q_ann_pq(spark, sf_dir):
    # PQ/ADC over pre-encoded codes (the codegen query path): codebooks are
    # the first 4 embedding rows sliced into 4 subspaces (deterministic and
    # DuckDB-restatable — same derivation trick as semantic_dedup's
    # centroids); query = embedding of vec_id 5
    import numpy as np

    from quickwit_spark.operators.similarity import pq_encode, pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    rows = {r["vec_id"]: r["embedding"] for r in emb.filter(F.col("vec_id") <= 5).collect()}
    base = np.stack([np.asarray(rows[i], dtype=np.float64) for i in range(4)])
    m, dsub = 4, 16
    codebooks = np.stack(
        [base[:, j * dsub:(j + 1) * dsub] for j in range(m)]
    )  # (m, ksub=4, dsub)
    q = [float(x) for x in rows[5]]
    encoded = pq_encode(emb, codebooks)
    return pq_topk(encoded, q, codebooks, k=15, codes_col="codes")


def _q_ann_sq8(spark, sf_dir):
    """Scalar-quantized (SQ8) ANN: per-dim 8-bit codes (min/scale trained
    in one posexplode agg pass), ADC scoring in pure codegen — the
    no-codebook middle rung between exact float and PQ. Query = embedding
    of vec_id 5, top-15 by approximate L2."""
    from quickwit_spark.operators.similarity import sq8_encode, sq8_params, sq8_topk

    emb = _t(spark, sf_dir, "embeddings")
    mins, scales = sq8_params(emb)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 5).first()["embedding"]]
    return sq8_topk(sq8_encode(emb, mins, scales), q, mins, scales, k=15)


def _ann_sq8_oracle(dim: int = 64) -> str:
    return f"""
        WITH v AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ), stats AS (
          SELECT i, min(e[i]) AS mn, (max(e[i]) - min(e[i])) / 255.0 AS sc
          FROM v, (SELECT unnest(generate_series(1, {dim})) AS i)
          GROUP BY i
        ), p AS (
          SELECT list(mn ORDER BY i) AS mns, list(sc ORDER BY i) AS scs
          FROM stats
        ), q AS (
          SELECT CAST(embedding AS DOUBLE[]) AS qe
          FROM embeddings WHERE vec_id = 5
        )
        SELECT vec_id,
               round(list_sum(list_transform(generate_series(1, {dim}), i ->
                 (qe[i] - (CASE WHEN scs[i] = 0 THEN mns[i]
                   ELSE mns[i]
                        + LEAST(255, GREATEST(0,
                            round((e[i] - mns[i]) / scs[i]))) * scs[i]
                   END)) ** 2)), 6) AS dist
        FROM v, p, q
        ORDER BY dist ASC, vec_id ASC
        LIMIT 15
    """


def _q_mixture_plan(spark, sf_dir):
    """Temperature-based source mixing over a deliberately skewed source
    tiering (60/30/10 by doc_id) so τ=0.7 visibly upweights the small
    source; realization is the deterministic LCG keep rule."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "src_tier",
        F.when(F.col("doc_id") % 10 < 6, F.lit("web"))
        .when(F.col("doc_id") % 10 < 9, F.lit("books"))
        .otherwise(F.lit("code")),
    )
    return CP.mixture_plan(
        docs, temperature=0.7, budget_frac=0.5, source_col="src_tier"
    )


def _q_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing: deterministic LCG shard + order,
    running token offsets, 256-token context windows."""
    docs = _t(spark, sf_dir, "documents")
    return CP.pack_sequences(docs, context_len=256, num_shards=4)


def _q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): raw corpus = documents,
    target domain = the English subset; exact-feature mode (num_buckets=None)
    so the result has no hash function in its data path — the hashed-bucket
    scale mode is pytest-covered (equal on a collision-free fixture)."""
    docs = _fan(spark, _t(spark, sf_dir, "documents"))
    return CP.dsir_weights(
        docs, num_buckets=None, target_filter=F.col("lang") == "en"
    ).select(
        "doc_id",
        "n_features",
        F.round("log_weight", 6).alias("log_weight"),
    )


def _q_stratified_sample(spark, sf_dir):
    """Exact-quota stratified sample: 10 docs per source, deterministic
    LCG-mix rank (reproducible across engines/partitionings)."""
    docs = _t(spark, sf_dir, "documents")
    return CP.stratified_sample(docs, quota=10, strata_col="source").select(
        "doc_id", "stratum", F.col("sample_rank").cast("long").alias("sample_rank")
    )


def _q_text_c4(spark, sf_dir):
    """C4 cleaning rules (Raffel et al. 2020 §2.2): line-level keep
    (terminal punctuation, ≥5 words, no 'javascript'), cleaned text,
    surviving-sentence count, page-level keep (≥3 sentences, no
    'lorem ipsum', no curly brace).

    The raw fixture is single unpunctuated lines (everything drops), so
    the entry deterministically enriches it — even ids become three
    sentences, odd ids split into multiple lines at ' the ' — making
    every output column (kept lines, clean text, sentence count, keep)
    vary; the oracle applies the identical rewrite."""
    docs = _t(spark, sf_dir, "documents")
    rich = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.col("text"), F.lit(". "), F.col("text"), F.lit("! "),
            F.col("text"), F.lit("?"),
        ),
    ).otherwise(F.regexp_replace(F.col("text"), " the ", "\nthe "))
    out = docs.select("doc_id", rich.alias("text")).select(
        "doc_id", *TX.c4_features(F.col("text"))
    )
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_kept_lines").cast("long").alias("n_kept_lines"),
        "clean_text",
        F.col("n_sentences").cast("long").alias("n_sentences"),
        (
            (F.col("n_sentences") >= 3)
            & ~F.col("has_lorem_ipsum")
            & ~F.col("has_curly_brace")
        ).alias("keep"),
    )


def _q_pack_nocross(spark, sf_dir):
    """Boundary-respecting best-fit-decreasing packing (rows-only: the
    per-shard greedy is sequential, not SQL-expressible; invariants are
    pytest-enforced — capacity, contiguous offsets, determinism)."""
    docs = _t(spark, sf_dir, "documents")
    return CP.pack_sequences_nocross(docs, context_len=256, num_shards=4)


def _q_corpus_stats(spark, sf_dir):
    """One-row corpus summary: doc/token counts, exact length quartiles,
    whitespace vocab size, type-token ratio."""
    docs = _t(spark, sf_dir, "documents")
    return CP.corpus_stats(docs)


def _q_curation_funnel(spark, sf_dir):
    """The composed cleanup funnel: exact-dedup → C4 → Gopher applied
    cumulatively, whole funnel from ONE flags pass + one aggregation.

    The synthetic documents are single unpunctuated lines, which C4
    rightly drops wholesale — so the entry derives a richer corpus
    DETERMINISTICALLY (restated identically in the oracle): planted
    exact duplicates (doc_id%7, +100000 — the simhash entry's trick) and,
    for even ids, a three-sentence rewrite `t. t! t?` so every funnel
    stage has a non-trivial count."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    aug = docs.unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    rich = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.col("text"), F.lit(". "), F.col("text"), F.lit("! "),
            F.col("text"), F.lit("?"),
        ),
    ).otherwise(F.col("text"))
    return CP.curation_funnel(_fan(spark, aug.select("doc_id", rich.alias("text"))))


def _q_dsir_weights_hashed(spark, sf_dir):
    """DSIR in the hashed-bucket SCALE mode (65536 xxhash64 buckets —
    bounded histograms regardless of corpus size). Rows-only: the bucket
    hash has no DuckDB equivalent; the estimator itself is oracle-gated by
    the exact-feature entry and pytest proves hashed == exact on a
    collision-free fixture."""
    docs = _fan(spark, _t(spark, sf_dir, "documents"))
    return CP.dsir_weights(
        docs, num_buckets=65536, target_filter=F.col("lang") == "en"
    ).select(
        "doc_id", "n_features", F.round("log_weight", 6).alias("log_weight")
    )


def _q_text_repetition(spark, sf_dir):
    """Gopher-style repetition filters: dup-word / top-word / top-bigram
    fractions — pure Column ops (single narrow map, no shuffle)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", *TX.repetition_features(F.col("text")))


def _pii_injected_text():
    """Deterministic PII injection keyed on doc_id (the base corpus has no
    emails/phones, so the regex tier needs planted matches to verify)."""
    email = F.concat(
        F.lit("user"), F.col("doc_id").cast("string"), F.lit("@example.com")
    )
    phone = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit(" call 555-123-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), F.lit(" contact "), email, phone)


def _q_text_pii(spark, sf_dir):
    """PII regex tier: count emails/phones and measure the redacted text."""
    docs = _t(spark, sf_dir, "documents")
    injected = _pii_injected_text()
    return docs.select(
        "doc_id",
        *TX.pii_features(injected),
        F.length(TX.pii_scrub_col(injected)).alias("scrubbed_len"),
    )


def _q_text_url_domains(spark, sf_dir):
    """Source-domain frequency over extracted http(s) URLs (deterministic
    injected URLs keyed on doc_id; base corpus is URL-free)."""
    docs = _t(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.lit(" see https://site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
        F.lit(" and http://mirror"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit(".example.org"),
    )
    return (
        docs.select(F.explode(TX.url_domains_col(injected)).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("domain")
    )


def _q_knn_join(spark, sf_dir):
    """Batch exact k-NN join: every 50th vector queries the whole corpus for
    its top-5 cosine neighbors (broadcast query matrix + one corpus scan)."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    return S.knn_join(emb, qs, k=5, round_decimals=4).orderBy(
        "qid", F.col("cosine").desc(), "vec_id"
    )


# -- multimodal plumbing ------------------------------------------------------


def _media_frame(spark, sf_dir):
    """Deterministic media table derived from documents: payload = utf-8
    bytes of the text, kind rotates by doc_id."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("doc")
        .alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _q_multimodal_text_extract(spark, sf_dir):
    # REAL kernel (printable-run extraction): on pure-ASCII payloads the
    # round trip is exact, so this multimodal path is fully oracle-checked
    from quickwit_spark.operators.multimodal import extract_text

    media = _media_frame(spark, sf_dir).filter(F.col("kind") == "doc")
    return extract_text(media).select("media_id", "extracted_text", "n_bytes")


def _q_multimodal_image_features(spark, sf_dir):
    # REAL decode path: synthetic 16×16 constant-color BMPs (channel values
    # derived from doc_id) run the actual pure-numpy BMP parser + resize +
    # feature kernel; a constant image makes every 8×8 feature equal
    # (r+g+b)/765, so DuckDB can state the expected array exactly. Features
    # round to 3dp: float32 kernel error (~1e-7) can never flip a 3dp digit
    # because k/765 sits ≥3e-6 from any 0.0005 rounding boundary.
    from quickwit_spark.operators.multimodal import encode_bmp, image_features

    @F.pandas_udf("binary")
    def bmp_payload(ids):
        import numpy as np_

        def mk(i):
            img = np_.zeros((16, 16, 3), dtype=np_.uint8)
            img[:, :, 0] = i % 256
            img[:, :, 1] = (i * 7) % 256
            img[:, :, 2] = (i * 13) % 256
            return encode_bmp(img)

        return ids.map(mk)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    media = docs.select(F.col("doc_id").alias("media_id"),
                        bmp_payload(F.col("doc_id")).alias("payload"))
    feats = image_features(media, target=(8, 8))
    # Flattened to one row per feature value: the driver's canonicalizer
    # sorts result frames with pandas and cannot sort list-valued columns,
    # so posexplode the feat array into (feat_idx, feat_value) rows.
    return feats.select(
        "media_id",
        F.posexplode(
            F.transform("feat", lambda x: F.round(x.cast("double"), 3))
        ).alias("feat_idx", "feat_value"),
        "out_width", "out_height",
    )


# -- janitor: delete-by-query / retention over a day-partitioned index -------


def _janitor_index(spark, sf_dir):
    """Fresh day-partitioned index of the events table (split per day)."""
    import tempfile

    from quickwit_spark.pipeline.janitor import build_time_partitioned_index

    out = tempfile.mkdtemp(prefix="qs_janitor_")
    build_time_partitioned_index(
        spark, _t(spark, sf_dir, "events"), out,
        sink_expr=F.col("event_type"), ts_col="ts", source_id="events",
    )
    return out


def _q_janitor_delete(spark, sf_dir):
    from quickwit_spark.pipeline.janitor import delete_by_query, read_index

    out = _janitor_index(spark, sf_dir)
    delete_by_query(
        spark, out, "event_type:error AND value:>=50", _QC_EVENTS, source_id="events"
    )
    return (
        read_index(spark, out)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


def _q_janitor_retention(spark, sf_dir):
    from quickwit_spark.pipeline.janitor import apply_retention, read_index

    out = _janitor_index(spark, sf_dir)
    apply_retention(spark, out, "2024-01-15 00:00:00")
    return (
        read_index(spark, out)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


# -- transcripts pipeline (rows-only: input is the deterministic generated
#    table, not a DuckDB view) ------------------------------------------------

_PIPE_CACHE = "/tmp/quickwit_spark_transcripts_20k"


def _pipe_dag(spark):
    from quickwit_spark.pipeline.runner import PipelineConfig, build_dag
    from quickwit_spark.pipeline.transcripts import materialize

    materialize(20_000, _PIPE_CACHE, seed=42)
    t = spark.read.parquet(os.path.join(_PIPE_CACHE, "transcripts.parquet"))
    d = spark.read.parquet(os.path.join(_PIPE_CACHE, "tenants.parquet"))
    return build_dag(t, d, PipelineConfig())


def _q_pipeline_route_counts(spark, sf_dir):
    routed = _pipe_dag(spark)
    return (
        routed.filter(F.col("_error_category") == "valid")
        .groupBy("sink")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.countDistinct("partition_bucket").alias("n_partitions"),
        )
    )


def _q_pipeline_outcomes(spark, sf_dir):
    routed = _pipe_dag(spark)
    return routed.groupBy(F.col("_error_category").alias("outcome")).agg(
        F.count(F.lit(1)).alias("num_docs")
    )


def _q_pipeline_datehist(spark, sf_dir):
    routed = _pipe_dag(spark).filter(F.col("_error_category") == "valid")
    return A.date_histogram(routed, "ts", "30d", min_doc_count=1).select(
        "key", "key_as_string", "doc_count"
    )


def _q_pipeline_enrich_terms(spark, sf_dir):
    routed = _pipe_dag(spark).filter(F.col("_error_category") == "valid")
    return A.multi_terms(routed, ["sink", "tier"], size=50).select(
        "sink", "tier", "doc_count", "key_as_string"
    )


def _q_more_like_this(spark, sf_dir):
    """ES more_like_this (operators/scoring.py more_like_this): seed doc 7's
    characteristic terms selected by tf·idf (top 10, corpus df ≥ 2), then
    the whole corpus BM25-scored against that disjunction via the
    inverted-index join — top-10 neighbours, seed excluded, rank re-paged.
    The oracle restates term selection AND scoring end-to-end in DuckDB."""
    from quickwit_spark.operators.scoring import more_like_this

    docs = _t(spark, sf_dir, "documents")
    out = more_like_this(docs, [7], max_query_terms=10, min_doc_freq=2, k=10)
    return out.withColumn("rank", F.col("rank").cast("long"))


def _q_chunk_sliding(spark, sf_dir):
    """Sliding-window chunking (operators/corpus.py chunk_sliding): 32-token
    windows, 8-token overlap (stride 24), tail remainder kept, token spans
    preserved. Pure codegen, zero shuffles (plan-asserted in
    test_plan_shapes). First 400 docs keep the gate comparison bounded."""
    from quickwit_spark.operators.corpus import chunk_sliding

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    return chunk_sliding(docs, chunk_tokens=32, overlap=8)


def _q_field_collapse(spark, sf_dir):
    """ES field collapse (operators/sorts.py field_collapse): one window
    ranks events within each user (value desc, event_id tiebreak), top-2
    inner hits per user, page = the 20 users with the best rank-1 row.
    The per-domain/per-user quota shape of both search and curation."""
    from quickwit_spark.operators.sorts import field_collapse

    ev = _t(spark, sf_dir, "events")
    out = field_collapse(
        ev, "user_id", [("value", True)], k=20, inner_hits=2, tiebreak="event_id"
    )
    return out.select(
        "user_id", "event_id", "value", F.col("group_rank").cast("long").alias("group_rank")
    )


def _transcript_turns(spark, sf_dir):
    """Deterministic transcript frame in the input_hint shape (conv_id,
    turn_idx, role, text, tool, ts) derived from events — the oracle can
    restate the derivation exactly, so transcript analytics gate end-to-end."""
    ev = _t(spark, sf_dir, "events")
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (F.col("event_id") % 3 + 1).cast("int"),
    )
    return ev.select(
        F.col("user_id").alias("conv_id"),
        F.col("event_id").alias("turn_idx"),
        role.alias("role"),
        F.col("props").alias("text"),
        F.when(role == "tool", F.concat(F.lit("tool-"), (F.col("event_id") % 4))).alias(
            "tool"
        ),
        F.col("ts"),
    )


def _q_trajectory_stats(spark, sf_dir):
    """Per-conversation trajectory metrics (operators/chat.py
    trajectory_stats): role mix, distinct tools, duration, first/last role,
    turns-to-first-tool, avg text length, error-turn count — ONE
    map-side-combined groupBy(conv), the per-session analytics of an agent
    transcript corpus. Oracle restates every conditional aggregate."""
    from quickwit_spark.operators.chat import trajectory_stats

    turns = _transcript_turns(spark, sf_dir)
    return trajectory_stats(turns, error_pred=F.col("text").contains("9"))


def _q_funnel_counts(spark, sf_dir):
    """Ordered funnel (operators/chat.py funnel_counts): view → click →
    purchase per user in event_id order, greedy earliest-match (exact reach
    semantics). Predicates evaluate row-side pre-shuffle; only booleans
    move. Oracle = the nested min-after-previous-step formulation."""
    from quickwit_spark.operators.chat import funnel_counts

    ev = _t(spark, sf_dir, "events")
    steps = [
        ("view", F.col("event_type") == "view"),
        ("click", F.col("event_type") == "click"),
        ("purchase", F.col("event_type") == "purchase"),
    ]
    return funnel_counts(ev, steps, group_col="user_id", order_col="event_id")


def _q_significant_terms(spark, sf_dir):
    """ES significant_terms with the JLH heuristic (operators/aggs.py):
    what terms are unusually frequent in src0's documents vs the whole
    corpus. One scan, document frequencies via array_distinct before the
    explode, TakeOrdered top-10."""
    from quickwit_spark.operators.aggs import significant_terms

    docs = _t(spark, sf_dir, "documents")
    return significant_terms(
        docs, "text", F.col("source") == "src0", size=10, min_doc_count=5
    )


def _q_rollup_daily(spark, sf_dir):
    """Materialized-rollup plane (operators/rollup.py): build hourly
    mergeable partials (cnt/sum/sumsq/min/max) from events in ONE raw pass,
    re-merge to daily grain, finalize avg/var from the moments. The oracle
    aggregates the raw table directly at day grain — so the gate itself
    proves merge-of-partials == direct aggregation (the invariant that
    makes a 10^12-row dashboard read rollup rows, not raw)."""
    from quickwit_spark.operators.rollup import (
        rollup_build,
        rollup_finalize,
        rollup_merge,
    )

    ev = _t(spark, sf_dir, "events")
    hourly = rollup_build(ev, ["event_type"], "ts", "value", "hour")
    return rollup_finalize(rollup_merge(hourly, ["event_type"], "day"), ["event_type"])


def _q_ts_anomalies(spark, sf_dir):
    """Robust time-series anomaly flags (operators/timeseries.py): daily
    event counts per event_type, modified z-score (Iglewicz–Hoaglin,
    0.6745·(x−med)/MAD) with exact interpolated percentiles. Only the
    bucketing pass touches raw rows. Oracle restates median/MAD via
    quantile_cont."""
    from quickwit_spark.operators.timeseries import bucket_metric, robust_anomalies

    ev = _t(spark, sf_dir, "events")
    b = bucket_metric(ev, ["event_type"], "ts", "day")
    return robust_anomalies(b, ["event_type"], threshold=2.0)


def _q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention (operators/timeseries.py cohort_retention):
    users bucketed by first-seen week, distinct-active counts per offset
    week. ONE shuffle over raw events (groupBy(user) computes cohort AND
    the distinct period set in the same aggregate); the self-join-free
    formulation."""
    from quickwit_spark.operators.timeseries import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts", "week")


def _q_tool_transitions(spark, sf_dir):
    """Tool→tool transition matrix over the derived transcript frame
    (operators/timeseries.py transition_matrix): the Markov structure of
    agent trajectories — which tool follows which, row-normalized. Null
    (non-tool) turns drop before the window so tools chain across
    intervening turns; one window shuffle, pair-cardinality output."""
    from quickwit_spark.operators.timeseries import transition_matrix

    turns = _transcript_turns(spark, sf_dir)
    return transition_matrix(turns, "conv_id", "turn_idx", "tool")


def _q_suggest_prefix(spark, sf_dir):
    """Prefix completion suggester (operators/scoring.py suggest_prefix):
    top-10 document-frequency completions of 's' — non-matching tokens die
    inside the token array BEFORE the explode, so only matching terms
    shuffle. TakeOrdered paging."""
    from quickwit_spark.operators.scoring import suggest_prefix

    docs = _t(spark, sf_dir, "documents")
    return suggest_prefix(docs, "s", k=10)


def _q_log_templates(spark, sf_dir):
    """Log-template mining (functions/text.py log_templates): synthesize
    log lines from events, mask variable classes (UUID/hex/IP/number) in
    pure codegen, one map-side-combined groupBy — catalog-sized shuffle
    regardless of corpus size (the Drain/Spell first step)."""
    from quickwit_spark.functions.text import log_templates

    ev = _t(spark, sf_dir, "events")
    lines = ev.select(
        F.concat(
            F.lit("user "),
            F.col("user_id"),
            F.lit(" did "),
            F.col("event_type"),
            F.lit(" from 10.0."),
            (F.col("event_id") % 250),
            F.lit(".7 value="),
            F.col("value"),
        ).alias("text")
    )
    return log_templates(lines)


def _q_breach_spans(spark, sf_dir):
    """Threshold-breach spans (operators/timeseries.py breach_spans):
    daily event counts per type collapsed into maximal consecutive
    above-threshold runs (gaps-and-islands on the bucket frame — raw
    volume independent)."""
    from quickwit_spark.operators.timeseries import bucket_metric, breach_spans

    ev = _t(spark, sf_dir, "events")
    b = bucket_metric(ev, ["event_type"], "ts", "day")
    return breach_spans(b, ["event_type"], threshold=70.0, grain="day")


def _q_turn_context(spark, sf_dir):
    """Bounded-context SFT pairs (operators/chat.py turn_context): for
    every assistant turn of the derived transcript frame, the previous 3
    turns rendered as context + the assistant text as target. One window
    shuffle; per-row state is k turns even in 4000-turn conversations."""
    from quickwit_spark.operators.chat import turn_context

    turns = _transcript_turns(spark, sf_dir)
    return turn_context(turns, k=3)


def _q_hist_p95(spark, sf_dir):
    """Mergeable-histogram quantile plane (operators/rollup.py hist_*):
    hourly 64-bin sketches of events.value merged to day grain, p95 by
    cumulative-count interpolation — the HDR-style path that answers p99
    dashboards from |keys|×buckets×bins sketch rows at 10^12 scale.
    Error ≤ one bin width vs the rank-based quantile (pytest); the oracle
    restates binning, window cumsum, and interpolation exactly."""
    from quickwit_spark.operators.rollup import (
        hist_build,
        hist_merge,
        hist_quantile,
    )

    ev = _t(spark, sf_dir, "events")
    h = hist_build(ev, ["event_type"], "ts", "value", "hour", 0.0, 300.0, 64)
    return hist_quantile(
        hist_merge(h, ["event_type"], "day"), ["event_type"], 0.95, 0.0, 300.0, 64
    )


def _q_pipeline_aggs(spark, sf_dir):
    """ES pipeline aggregations (operators/timeseries.py pipeline_aggs):
    derivative / cumulative_sum / trailing moving_avg over the daily
    count date_histogram — the whole sibling-bucket family in ONE shared
    window exchange of the bucket frame."""
    from quickwit_spark.operators.timeseries import bucket_metric, pipeline_aggs

    ev = _t(spark, sf_dir, "events")
    b = bucket_metric(ev, ["event_type"], "ts", "day")
    return pipeline_aggs(b, ["event_type"], moving_window=3)


def _q_percentile_ranks(spark, sf_dir):
    """ES percentile_ranks (operators/aggs.py), exact conditional-count
    form — one map-side-combined pass, every probe a count_if in the same
    aggregate."""
    from quickwit_spark.operators.aggs import percentile_ranks

    ev = _t(spark, sf_dir, "events")
    return percentile_ranks(ev, "value", [10.0, 100.0, 260.0])


def _q_sketch_hll(spark, sf_dir):
    """HyperLogLog distinct-user estimate per event_type
    (operators/sketches.py): ONE map-side-combined pass builds <= 256
    registers per key, the estimate is Column arithmetic over register
    rows. The sketch-split plane of the reference metastore
    (postgres/metastore.rs StageSketchSplits lifecycle) — a 10^12-row
    cardinality dashboard reads |keys| x 256 rows. Oracle restates the
    xorshift-multiply hash, the rho chain AND the bias-corrected estimator
    bit-for-bit (registers are integer-exact across engines)."""
    from quickwit_spark.operators.sketches import hll_build, hll_estimate

    ev = _t(spark, sf_dir, "events")
    return hll_estimate(hll_build(ev, ["event_type"], F.col("user_id")), ["event_type"])


def _q_sketch_kmv(spark, sf_dir):
    """KMV / bottom-k theta sketch per event_type over event_id
    (operators/sketches.py): the distinct shuffle is the only data-sized
    exchange; output is k=64 rows per key and the (k-1)*SPACE/h_k
    estimator degrades to exact below k. Oracle restates the 62-bit
    Lehmer-pair hash and the estimator."""
    from quickwit_spark.operators.sketches import kmv_build, kmv_estimate

    ev = _t(spark, sf_dir, "events")
    return kmv_estimate(kmv_build(ev, ["event_type"], F.col("event_id"), k=64), ["event_type"], k=64)


def _q_sketch_cms(spark, sf_dir):
    """Count-Min frequency sketch (operators/sketches.py): 4x512 counter
    matrix built in ONE pass (posexplode of the 4 row hashes, map-side
    combined), point estimates = min over rows with the one-sided
    overcount guarantee. Heavy-hitter user counts without a per-user
    groupBy at raw scale. Oracle restates the counter build (zipped
    unnest) and the min-over-rows probe."""
    from quickwit_spark.operators.sketches import cms_build, cms_query

    ev = _t(spark, sf_dir, "events")
    sk = cms_build(ev, F.col("user_id"), depth=4, width=512)
    cand = ev.select("user_id").distinct()
    return cms_query(sk, cand, "user_id", depth=4, width=512)


def _q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (operators/corpus.py weighted_sample, Efraimidis-Spirakis A-ES):
    rank by ln(u)/w with u drawn from the id's Lehmer mix — inclusion
    probability proportional to n_chars, TakeOrdered top-k (no full
    sort), bit-reproducible across runs/partitionings. Oracle restates
    the draw and the ranking."""
    docs = _t(spark, sf_dir, "documents")
    return CP.weighted_sample(docs, "doc_id", "n_chars", 50).select(
        "doc_id", "n_chars", "sample_key"
    )


def _q_dataset_split(spark, sf_dir):
    """Group-aware train/val/test assignment (operators/corpus.py
    dataset_split): every event of a user lands in the SAME split (the
    anti-leakage rule for transcript corpora — a conversation straddling
    train and eval contaminates the eval set); assignment is a pure hash
    of the group id, so adding rows can never move a group. Output is the
    per-split audit (row + distinct-group counts). Oracle restates the
    mix and the integer thresholds."""
    ev = _t(spark, sf_dir, "events")
    out = CP.dataset_split(ev, "user_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return out.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
    )


def _q_slo_burn(spark, sf_dir):
    """Multi-window multi-burn-rate SLO alerting (operators/timeseries.py
    slo_burn_rate, the SRE-workbook rule): trailing 1h/6h error-budget
    burn per service over hourly buckets, alert iff BOTH windows burn
    above threshold. Raw rows are touched once (map-side-combined bucket
    groupBy); the RANGE-frame windows run on the bucket frame, sized by
    the time span not the data volume. Oracle restates the buckets and
    both trailing windows."""
    from quickwit_spark.operators.timeseries import slo_burn_rate

    ev = _t(spark, sf_dir, "events").withColumn(
        "svc", (F.col("user_id") % 3).cast("string")
    )
    out = slo_burn_rate(
        ev,
        ["svc"],
        "ts",
        F.col("event_type") == "error",
        budget=0.1,
        short_minutes=60,
        long_minutes=360,
        threshold=2.0,
        grain_minutes=60,
    )
    return out.select(
        "svc",
        F.unix_timestamp("bucket").alias("bucket_epoch"),
        "n",
        "n_err",
        "short_ratio",
        "long_ratio",
        "short_burn",
        "long_burn",
        "alert",
    )


def _span_frame(spark, sf_dir):
    """Deterministic span frame (trace_id, span_id, parent_span_id, service,
    duration_ms, is_error, ts) derived from events — parent links come from
    the previous span of the same trace under the total (ts, event_id)
    order, so the oracle restates the derivation with one lag window."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy(F.col("event_id") % 997).orderBy("ts", "event_id")
    return ev.select(
        (F.col("event_id") % 997).alias("trace_id"),
        F.col("event_id").alias("span_id"),
        F.lag("event_id").over(w).alias("parent_span_id"),
        F.col("event_type").alias("service"),
        F.col("value").alias("duration_ms"),
        (F.col("event_id") % 211 == 0).alias("is_error"),
        F.col("ts"),
    )


def _q_service_deps(spark, sf_dir):
    """Service dependency graph (operators/traces.py service_dependencies,
    the Jaeger GetDependencies model over quickwit-jaeger's span schema):
    child spans join their parent within the trace on the composite
    (trace, span-id) key — one co-partitioned shuffle per side — then
    collapse to service-level call edges with call counts and mean child
    latency; the edge groupBy is catalog-sized and map-side combined."""
    from quickwit_spark.operators.traces import service_dependencies

    return service_dependencies(_span_frame(spark, sf_dir), duration_col="duration_ms")


def _q_tail_sampling(spark, sf_dir):
    """Tail-based trace sampling (operators/traces.py tail_sample — the
    OTel tail-sampler decision model in the reference's two-phase
    FindTraces shape, quickwit-jaeger/src/lib.rs:98-130): per-trace
    decision aggregate (any-error > max-latency>=485ms > deterministic
    5% hash fraction, first policy wins), then every span of each kept
    trace is fetched via a join on the kept-id table. Oracle restates the
    decision aggregate, the Lehmer hash fraction, and the fetch join."""
    from quickwit_spark.operators.traces import tail_sample

    out = tail_sample(
        _span_frame(spark, sf_dir),
        latency_threshold_ms=485.0,
        sample_rate=0.05,
    )
    return out.select("trace_id", "span_id", "service", "sample_reason")


def _q_red_metrics(spark, sf_dir):
    """RED span-metrics rollup (operators/traces.py red_metrics): per
    (service, day) call rate, error count/rate, mean/max/p95 duration in
    ONE map-side-combined groupBy — the span-metrics-connector shape on
    the same aggregation plane as the reference's date_histogram + terms
    pipeline. Exact interpolated p95 restated via quantile_cont."""
    from quickwit_spark.operators.traces import red_metrics

    out = red_metrics(
        _span_frame(spark, sf_dir),
        grain="day",
        percentile=0.95,
    )
    return out.select(
        "service",
        F.unix_timestamp("bucket").alias("bucket_epoch"),
        "n_calls",
        "n_errors",
        "error_rate",
        "avg_ms",
        "max_ms",
        "p_ms",
    )


def _q_preference_pairs(spark, sf_dir):
    """Chosen/rejected preference-pair construction (operators/chat.py
    preference_pairs — the RLHF/DPO prep step): per conversation, the
    highest-scoring assistant candidate paired against the lowest, with
    deterministic (score, earlier-wins) tie-breaking and a positive-margin
    filter. ONE map-side-combined groupBy via max_by/min_by over a
    (score, -order) struct — per-group partial state is two candidates, so
    a 10^5-candidate hot prompt shuffles one row. Oracle restates the
    selection with arg ordering windows."""
    from quickwit_spark.operators.chat import preference_pairs

    cands = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 3 == 1)
        .select(
            F.col("user_id").alias("conv_id"),
            F.col("event_id").alias("turn_idx"),
            F.col("props").alias("text"),
            F.col("value").alias("score"),
        )
    )
    return preference_pairs(
        cands, group_col="conv_id", text_col="text", score_col="score",
        order_col="turn_idx",
    )


def _term_index_path(spark, sf_dir):
    """Build-once materialized term index over documents (operators/
    postings.py): postings partitioned by murmur3 term bucket + BM25 stats
    sidecar, rebuilt only when the cache dir is absent."""
    from quickwit_spark.operators import postings as PX

    path = PX.cached_index_path(sf_dir)
    fresh = os.path.exists(path + "_stats")
    if fresh:
        try:  # a cache from an older build without the positions column —
            # footer-only pyarrow read (~ms); the spark.read schema probe
            # paid a listing + footer job on EVERY gate/bench call
            import glob

            import pyarrow.parquet as pq

            part = sorted(glob.glob(os.path.join(path, "bucket=*", "*.parquet")))
            fresh = bool(part) and "positions" in pq.read_schema(part[0]).names
        except Exception:
            fresh = False
    if not fresh:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path + "_stats", ignore_errors=True)
        PX.build_term_index(_t(spark, sf_dir, "documents"), path, n_buckets=16)
    return path


def _q_index_term_lookup(spark, sf_dir):
    """Term lookup served from the materialized inverted index
    (operators/postings.py term_lookup — the reference's term-dictionary
    read, `qw/quickwit-search/src/leaf.rs` postings contract): only the
    query terms' hash buckets are opened (PartitionFilters), the corpus is
    never re-scanned. Oracle recomputes (term, tf, dl) from raw text — so
    gate-green proves the INDEX content equals a fresh tokenization."""
    from quickwit_spark.operators import postings as PX

    path = _term_index_path(spark, sf_dir)
    return PX.term_lookup(spark, path, ["spark", "merge"]).select(
        "term", "doc_id", "tf", "dl"
    )


def _q_index_bm25(spark, sf_dir):
    """BM25 top-20 served ENTIRELY from the index (operators/postings.py
    index_bm25_topk): df from pruned postings, N/avgdl from the stats
    sidecar. The oracle restates the CORPUS-SCAN formula (same as
    q_score_bm25) — gate-green therefore proves index-served search equals
    scan-served search, the reference's split-serving guarantee."""
    from quickwit_spark.operators import postings as PX

    path = _term_index_path(spark, sf_dir)
    return PX.index_bm25_topk(spark, path, ["spark", "merge"], k=20)


def _q_zorder_key(spark, sf_dir):
    """Z-order (Morton) clustering key (operators/layout.py — the Iceberg
    zorder table-maintenance strategy, generalizing the reference's
    tag/time split pruning to any dimension pair): value quantized to
    [0,255] over [0,500) × user_id mod 256, bits interleaved in pure
    codegen shift/mask arithmetic. Oracle restates the quantization and
    all 16 bit placements."""
    from quickwit_spark.operators.layout import quantize, zorder_key

    ev = _t(spark, sf_dir, "events")
    cx = quantize(F.col("value"), 0.0, 500.0, 8)
    cy = (F.col("user_id") % 256).cast("long")
    return ev.select(
        "event_id",
        cx.alias("cell_x"),
        cy.alias("cell_y"),
        zorder_key([cx, cy], bits=8).alias("zkey"),
    )


def _q_context_truncate(spark, sf_dir):
    """Token-budget context truncation (operators/chat.py
    truncate_context): keep the maximal suffix of each conversation whose
    running token total from the newest turn fits the budget (newest turn
    always survives). ONE window shuffle — reverse cumsum and newest-rank
    share the (conv, turn desc) sort. Oracle restates both windows."""
    from quickwit_spark.operators.chat import truncate_context

    turns = _transcript_turns(spark, sf_dir).withColumn(
        "n_tokens", F.length("text").cast("long")
    )
    out = truncate_context(turns, budget=100)
    return out.select("conv_id", "turn_idx", "role", "n_tokens")


def _q_percolate(spark, sf_dir):
    """Percolate / reverse search (operators/percolate.py — the ES
    percolator surface): a catalog of stored mini-DSL alert queries
    matched against the batch in ONE projection (array of
    matched-query-id slots, zero shuffles/joins; only (doc, query_id)
    pairs leave via explode). Oracle restates every stored predicate as
    SQL UNION ALL."""
    from quickwit_spark.operators.percolate import percolate

    stored = {
        "alert_errors": "event_type:error",
        "alert_hot_value": "value:[400 TO 500]",
        "alert_signup_low": "event_type:signup AND value:[0 TO 50}",
    }
    return percolate(
        _t(spark, sf_dir, "events"), stored, _QC_EVENTS, id_cols=["event_id"]
    )


def _q_scd2_history(spark, sf_dir):
    """Type-2 slowly-changing-dimension history (operators/joins.py
    scd2_build): a changelog becomes versioned records with exclusive
    [valid_from, valid_to) intervals — the maintenance step for the
    dimension tables asof_join / broadcast enrich consume. ONE window
    shuffle; lead + row_number share the (key, ts) sort. Changelog here:
    per (user_id mod 40) tier changes ordered by event_id (a unique
    monotonic version stamp, so the order is total)."""
    from quickwit_spark.operators.joins import scd2_build

    changes = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 40).alias("key"),
        F.col("event_id").alias("ts"),
        F.col("event_type").alias("tier"),
    )
    out = scd2_build(changes, key_col="key", ts_col="ts")
    return out.select(
        "key", F.col("version").cast("long").alias("version"), "tier",
        F.col("valid_from").alias("valid_from"), "valid_to", "is_current",
    )


def _q_collocations(spark, sf_dir):
    """PMI collocation mining (operators/corpus.py collocations): top-50
    bigrams by pointwise mutual information with a min-count floor —
    exact integer counts in two map-side-combined aggregations off one
    tokenize pass, conditional-broadcast unigram attachment, TakeOrdered
    finish. Oracle restates counts, totals, and the ln ratio."""
    from quickwit_spark.operators.corpus import collocations

    return collocations(
        _t(spark, sf_dir, "documents"), min_count=5, top_k=50
    )


def _q_index_incremental(spark, sf_dir):
    """Index lifecycle end-to-end (operators/postings.py — the reference's
    split lifecycle at the index level): build over the even half of
    documents, APPEND the odd half (immutable prior files, mergeable
    stats), tombstone-DELETE doc_id % 7 == 0 (delete-task rule: queries
    never see deleted docs), then serve a term lookup. The oracle
    recomputes from raw text minus the deleted ids — green proves the
    incrementally-built, delete-masked index equals a fresh tokenization
    of the surviving corpus."""
    from quickwit_spark.operators import postings as PX

    docs = _t(spark, sf_dir, "documents")
    path = PX.cached_index_path(sf_dir, tag="term_index_incr")
    if not os.path.exists(path + "_stats"):
        PX.build_term_index(docs.filter(F.col("doc_id") % 2 == 0), path, n_buckets=16)
        PX.append_to_term_index(docs.filter(F.col("doc_id") % 2 == 1), path)
        dead = [
            r["doc_id"]
            for r in docs.filter(F.col("doc_id") % 7 == 0).select("doc_id").collect()
        ]
        PX.delete_from_term_index(spark, path, dead)
    return PX.term_lookup(spark, path, ["spark"]).select("term", "doc_id", "tf", "dl")


def _q_log_throttle(spark, sf_dir):
    """Deterministic log throttling (operators/timeseries.py log_throttle
    = stratified_sample with stratum = category × time bucket): at most
    20 events per (event_type, day), survivors chosen by the shared
    Lehmer-pair rank — reproducible across runs/partitionings/engines,
    viral cells bounded by the census pre-filter. Oracle ranks the full
    stratum (the guard is lossless)."""
    from quickwit_spark.operators.timeseries import log_throttle

    out = log_throttle(
        _t(spark, sf_dir, "events"),
        quota=20,
        category_cols=["event_type"],
        ts_col="ts",
        id_col="event_id",
        grain="day",
    )
    return out.select(
        "event_id", "stratum", F.col("sample_rank").cast("long").alias("sample_rank")
    )


def _q_index_phrase(spark, sf_dir):
    """Phrase query served from the index positions (operators/postings.py
    index_phrase_match - the tantivy positions contract): only the phrase
    terms' postings are read (bucket-pruned), ONE groupBy(doc_id) pivots
    term->positions, the start intersection is a codegen filter; the raw
    corpus is never touched. Oracle recomputes adjacent-pair starts from
    raw text - green proves stored positions equal a fresh tokenization."""
    from quickwit_spark.operators import postings as PX

    path = _term_index_path(spark, sf_dir)
    return PX.index_phrase_match(spark, path, ["slow", "fast"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver's correctness gate checks only the FIRST 50
    # entries, so the window is curated for maximum distinct semantics:
    # reference surface AND the training-data flagship ops come first,
    # rows-only entries sit at the tail, and every oracle entry past the
    # window is STILL machine-checked on every commit by
    # tests/test_oracle_all.py (full-registry DuckDB sweep at sf0.001) plus
    # golden/pytest coverage of the same semantics.
    #
    # Round-4 rotation (VERDICT r3 item 7): promoted INTO the window the
    # semantically distinct agg_date_histogram_gapfill (extended_bounds gap
    # fill), q_ip_range (ip-as-u128 ordering), dedup_paragraphs (C4
    # paragraph rule) and q_score_bm25 (the new BM25 _score sort, full
    # formula restated in DuckDB); displaced to the CI-checked overflow the
    # near-duplicate coverage agg_terms_topk (terms cap ⊂
    # agg_terms_event_type + sort_topk), q_termset (≈ q_term ∪),
    # janitor_retention_count (same janitor count shape as the in-window
    # janitor_delete_count) and agg_histogram_value (fixed-interval binning
    # ⊂ agg_date_histogram's calendar binning).
    #
    # Round-5 rotation (VERDICT r4 item 5): promoted kmeans_step
    # (iterative Lloyd assignment+update), ann_pq (product-quantization
    # ADC — compressed-domain search, no other window entry touches it),
    # text_c4 (line-level cleaning rules), curation_funnel (composed
    # multi-stage survival counts) and dsir_weights (importance-resampling
    # log-ratio estimator); displaced the near-duplicates q_ip_term (⊂
    # q_ip_range's u128 ordering), agg_extended_stats_value (moment family
    # ⊂ agg_percentiles + CI'd stats), agg_date_histogram_gapfill (gap fill
    # ⊂ in-window agg_date_histogram + CI), ann_topk (brute cosine top-k ≈
    # in-window knn_join's per-query exact scan) and text_repetition
    # (duplicate-line/ngram ratios ⊂ text_quality + text_c4 coverage).
    return {
        # aggregations (SURVEY §2.7)
        "agg_date_histogram": _q_agg_date_histogram,
        "agg_terms_event_type": _q_agg_terms_event_type,
        "agg_multi_terms": _q_agg_multi_terms,
        "agg_cardinality_exact": _q_agg_cardinality_exact,
        "agg_percentiles_value": _q_agg_percentiles_value,
        "agg_composite_after": _q_agg_composite_after,
        "agg_top_hits": _q_agg_top_hits,
        "agg_find_trace_ids": _q_agg_find_trace_ids,
        # query operators (SURVEY §2.6)
        "q_term": _q_term,
        "q_range_numeric": _q_range_numeric,
        "q_bool": _q_bool,
        "q_exists": _q_exists,
        # r5 rotation: vrl_program/text_tfidf promoted into the driver's
        # 50-entry window; q_wildcard (near-dupe of q_regex) and
        # dedup_ngram_jaccard (near-dupe of dedup_minhash_lsh) moved to the
        # tail — still oracle-gated in CI via test_oracle_all
        "vrl_program": _q_vrl_program,
        "q_regex": _q_regex,
        "q_fulltext_and": _q_fulltext_and,
        "q_phrase": _q_phrase,
        "q_json_extract": _q_json_extract,
        "q_ip_range": _q_ip_range,
        "q_score_bm25": _q_score_bm25,
        # sorts / pagination (SURVEY §2.8)
        "sort_topk": _q_sort_topk,
        "search_after": _q_search_after,
        # joins & set ops (SURVEY §2.9)
        "join_broadcast_enrich": _q_join_broadcast_enrich,
        "join_semi_two_phase": _q_join_semi_two_phase,
        "join_union_multi_index": _q_join_union_multi_index,
        # janitor (SURVEY §2.5: delete-by-query, retention)
        "janitor_delete_count": _q_janitor_delete,
        # training-data extras (all oracle-backed)
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash_lsh": _q_dedup_minhash_lsh,
        "text_tfidf": _q_text_tfidf,
        "text_quality_classifier": _q_text_quality_classifier,
        "chat_render": _q_chat_render,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_substrings": _q_dedup_substrings,
        "dedup_paragraphs": _q_dedup_paragraphs,
        "semantic_dedup": _q_semantic_dedup,
        "bigram_lm": _q_bigram_lm,
        "mixture_plan": _q_mixture_plan,
        "pack_sequences": _q_pack_sequences,
        "ann_ivf": _q_ann_ivf,
        "text_langid": _q_text_langid,
        "text_c4": _q_text_c4,
        "curation_funnel": _q_curation_funnel,
        "dsir_weights": _q_dsir_weights,
        "knn_join": _q_knn_join,
        "multimodal_text_extract": _q_multimodal_text_extract,
        "multimodal_image_features": _q_multimodal_image_features,
        # r5 session-4 rotation: five never-gated semantics promoted —
        # rollup_daily (the oracle aggregates RAW directly, so the driver
        # gate itself proves merge-of-partials == direct), funnel_counts
        # (ordered-reach), agg_significant_terms (JLH), trajectory_stats
        # (per-conversation transcript analytics), cohort_retention.
        # Displaced near-duplicates (agg_range_value ~ composite/datehist
        # bucketing, dedup_simhash ~ minhash banding, dedup_embedding_lsh ~
        # semantic_dedup, ann_pq ~ ann_sq8/ivf_pq family, kmeans_step
        # underlies ann_ivf) remain CI-oracled via test_oracle_all.
        "rollup_daily": _q_rollup_daily,
        "funnel_counts": _q_funnel_counts,
        "agg_significant_terms": _q_significant_terms,
        "trajectory_stats": _q_trajectory_stats,
        "cohort_retention": _q_cohort_retention,
        # oracle-backed overflow (see note above; gapfill/range_ts/pii/url
        # semantics are each also covered by in-window entries or pytest).
        # r5 session-3 rotation: text_quality (heuristic score — superseded
        # in-window by the trained text_quality_classifier) and
        # dedup_embedding_cosine (exact-pairs audit path — the scale path
        # dedup_embedding_lsh and semantic_dedup stay in-window) moved here
        # to readmit the two multimodal entries.
        "text_quality": _q_text_quality,
        "dedup_embedding_cosine": _q_dedup_embedding_cosine,
        "agg_extended_stats_value": _q_agg_extended_stats_value,
        "agg_date_histogram_gapfill": _q_agg_date_histogram_gapfill,
        "q_ip_term": _q_ip_term,
        "ann_topk": _q_ann_topk,
        "text_repetition": _q_text_repetition,
        "agg_histogram_value": _q_agg_histogram_value,
        "agg_terms_topk": _q_agg_terms_topk,
        "q_termset": _q_termset,
        "janitor_retention_count": _q_janitor_retention,
        "agg_composite_datehist": _q_agg_composite_datehist,
        "agg_terms_order_by_avg": _q_agg_terms_order_by_avg,
        "ann_lsh": _q_ann_lsh,
        "q_phrase_prefix": _q_phrase_prefix,
        "decontaminate": _q_decontaminate,
        "text_pii": _q_text_pii,
        "text_url_domains": _q_text_url_domains,
        "q_range_ts": _q_range_ts,
        "text_token_count": _q_text_token_count,
        "epoch_shuffle": _q_epoch_shuffle,
        "text_normalize": _q_text_normalize,
        "text_gopher": _q_text_gopher,
        "q_snippet": _q_snippet,
        "agg_stats_value": _q_agg_stats_value,
        "from_size": _q_from_size,
        "count_only": _q_count_only,
        "stratified_sample": _q_stratified_sample,
        "corpus_stats": _q_corpus_stats,
        "vrl_transform": _q_vrl_transform,
        "q_wildcard": _q_wildcard,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "join_asof": _q_join_asof,
        "sessionize": _q_sessionize,
        "batch_bm25": _q_batch_bm25,
        "hybrid_rrf": _q_hybrid_rrf,
        "ann_ivf_pq": _q_ann_ivf_pq,
        "ann_sq8": _q_ann_sq8,
        "q_more_like_this": _q_more_like_this,
        "chunk_sliding": _q_chunk_sliding,
        "field_collapse": _q_field_collapse,
        "ts_anomalies": _q_ts_anomalies,
        "tool_transitions": _q_tool_transitions,
        "suggest_prefix": _q_suggest_prefix,
        "log_templates": _q_log_templates,
        "breach_spans": _q_breach_spans,
        "turn_context": _q_turn_context,
        "hist_p95_daily": _q_hist_p95,
        "agg_pipeline_family": _q_pipeline_aggs,
        "agg_percentile_ranks": _q_percentile_ranks,
        "agg_range_value": _q_agg_range_value,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_embedding_lsh": _q_dedup_embedding_lsh,
        "ann_pq": _q_ann_pq,
        "kmeans_step": _q_kmeans_step,
        # r5 session-5: the mergeable-sketch plane (HLL / KMV / CMS — the
        # reference's sketch-split lifecycle re-expressed as partial
        # tables), weighted sampling, group-aware dataset split, SLO burn
        # alerting — each fully DuckDB-oracled including the hash/estimator
        # arithmetic.
        "sketch_hll_distinct": _q_sketch_hll,
        "sketch_kmv_distinct": _q_sketch_kmv,
        "sketch_cms_counts": _q_sketch_cms,
        "weighted_sample": _q_weighted_sample,
        "dataset_split_counts": _q_dataset_split,
        "slo_burn_rate": _q_slo_burn,
        # r5 session-5 (cont.): the trace decision/rollup plane between
        # ingest and the Jaeger query surface, and RLHF preference-pair
        # prep over scored transcripts — each fully DuckDB-oracled.
        "service_deps": _q_service_deps,
        "trace_tail_sampling": _q_tail_sampling,
        "red_metrics": _q_red_metrics,
        "preference_pairs": _q_preference_pairs,
        # r5 session-5 (cont.): the materialized inverted index — build
        # once, serve term lookups + BM25 from postings with partition
        # pruning; oracles recompute from raw text, so green == the index
        # equals a fresh tokenization and index-served == scan-served.
        "index_term_lookup": _q_index_term_lookup,
        "index_bm25": _q_index_bm25,
        "zorder_key": _q_zorder_key,
        "context_truncate": _q_context_truncate,
        "percolate_match": _q_percolate,
        "scd2_history": _q_scd2_history,
        "text_collocations": _q_collocations,
        "index_incremental_lookup": _q_index_incremental,
        "log_throttle": _q_log_throttle,
        "index_phrase": _q_index_phrase,
        # rows-only tail (non-SQL-expressible)
        "dedup_incremental": _q_dedup_incremental,
        "semantic_dedup_incremental": _q_semantic_dedup_incremental,
        "text_fingerprint": _q_text_fingerprint,
        "dsir_weights_hashed": _q_dsir_weights_hashed,
        "pack_nocross": _q_pack_nocross,
        # transcripts pipeline (SURVEY §2.1-2.4; rows-only)
        "pipeline_route_counts": _q_pipeline_route_counts,
        "pipeline_outcomes": _q_pipeline_outcomes,
        "pipeline_datehist": _q_pipeline_datehist,
        "pipeline_enrich_terms": _q_pipeline_enrich_terms,
    }


_DH_KEY = "CAST(floor(epoch_ms(ts) / 86400000) * 86400000 AS BIGINT)"


def _ivfpq_oracle() -> str:
    """DuckDB restatement of the full IVFADC path for ann_ivf_pq: cell =
    argmin ||e − c||² (first-min tiebreak, mirroring the kernel's argmin),
    residual PQ codes per 16-dim subspace against codebooks = embeddings
    10..13, probe = the 2 cells nearest the query, ADC = Σ_j ||(q −
    c_cell)_j − codebook_j[code_j]||². Codebook row k's subspace-j slice
    sits at global indices 16j+1..16j+16 of embedding 10+k, so `i` indexes
    document, centroid and codebook lists alike. The repetitive per-
    subspace argmin/ADC fragments are generated here rather than written
    out four times (same structure as the hand-written ann_pq oracle)."""

    def d2(a, b, lo, hi):
        return (
            f"list_sum(list_transform(generate_series({lo}, {hi}), "
            f"i -> ({a}[i] - {b}[i]) ** 2))"
        )

    codes = []
    adc_terms = []
    for j in range(4):
        lo, hi = 16 * j + 1, 16 * j + 16
        dist_list = (
            f"list_transform(bl, b -> list_sum(list_transform("
            f"generate_series({lo}, {hi}), i -> ((e[i] - cl[cell1][i]) - b[i]) ** 2)))"
        )
        codes.append(f"list_indexof({dist_list}, list_min({dist_list})) AS code{j + 1}")
        adc_terms.append(
            f"list_sum(list_transform(generate_series({lo}, {hi}), "
            f"i -> ((qe[i] - cl[cell1][i]) - bl[code{j + 1}][i]) ** 2))"
        )
    cell_dist = "list_transform(cl, c -> " + d2("e", "c", 1, 64) + ")"
    codes_sql = ",\n                 ".join(codes)
    adc_sql = " + ".join(adc_terms)
    return f"""
        WITH cent AS (
          SELECT list(c ORDER BY cid) AS cl FROM (
            SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
            FROM embeddings WHERE vec_id < 4)
        ), cb AS (
          SELECT list(b ORDER BY bid) AS bl FROM (
            SELECT vec_id AS bid, CAST(embedding AS DOUBLE[]) AS b
            FROM embeddings WHERE vec_id BETWEEN 10 AND 13)
        ), q AS (
          SELECT CAST(embedding AS DOUBLE[]) AS qe
          FROM embeddings WHERE vec_id = 5
        ), probed AS (
          SELECT cid FROM (
            SELECT cid, row_number() OVER (ORDER BY d, cid) AS rn FROM (
              SELECT c.cid, {d2("q.qe", "c.c", 1, 64)} AS d
              FROM (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
                    FROM embeddings WHERE vec_id < 4) c, q))
          WHERE rn <= 2
        ), asg AS (
          SELECT v.vec_id, v.e, cent.cl, cb.bl, q.qe,
                 list_indexof({cell_dist}, list_min({cell_dist})) AS cell1
          FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings) v, cent, cb, q
        ), coded AS (
          SELECT vec_id, e, cl, bl, qe, cell1,
                 {codes_sql}
          FROM asg
          WHERE cell1 - 1 IN (SELECT cid FROM probed)
        )
        SELECT vec_id,
               round({adc_sql}, 6) AS adc
        FROM coded
        ORDER BY adc ASC, vec_id ASC
        LIMIT 15
    """


def oracle_sql() -> dict[str, str]:
    from quickwit_spark.operators import sketches as _SK

    # HLL: registers from the xorshift-multiply mix (computed once in a
    # subquery so the rho chain references a single column), then the
    # bias-corrected estimator via sketches.hll_estimate_sql.
    _hll_regs = f"""
        SELECT event_type, reg, max(rho) AS rho FROM (
          SELECT event_type, h % 256 AS reg, {_SK.rho_sql("(h // 256)", 23)} AS rho
          FROM (SELECT event_type, {_SK.hll_mix_sql("user_id")} AS h FROM events)
        ) GROUP BY event_type, reg
    """
    _kmv_space = repr(float(_SK.KMV_SPACE))
    _cms_b = ", ".join(_SK.cms_col_sql("user_id", j, 512) for j in range(4))
    # dataset_split cuts accumulate fractions exactly as the operator does
    # (0.8 + 0.1 in binary floating point, NOT the decimal 0.9).
    _cum = 0.8
    _cut1 = int(_cum * 2147483647)
    _cum += 0.1
    _cut2 = int(_cum * 2147483647)
    _k3_user = (
        "((2147483629 * ((user_id % 2147483647 + 1) * 48271 % 2147483647)"
        " + (user_id % 2147483629 + 1) * 16807 % 2147483629)"
        " % 2147483647 + 1) * 48271 % 2147483647"
    )
    _k3_doc = (
        "((2147483629 * ((doc_id % 2147483647 + 1) * 48271 % 2147483647)"
        " + (doc_id % 2147483629 + 1) * 16807 % 2147483629)"
        " % 2147483647 + 1) * 48271 % 2147483647"
    )
    _k3_trace = (
        "((2147483629 * ((trace_id % 2147483647 + 1) * 48271 % 2147483647)"
        " + (trace_id % 2147483629 + 1) * 16807 % 2147483629)"
        " % 2147483647 + 1) * 48271 % 2147483647"
    )
    # Morton interleave, bit-for-bit as operators/layout.py zorder_key
    # places them: bit j of dim i lands at key bit j*2 + i
    _zorder_sql = " + ".join(
        f"(((cell_{d} >> {j}) & 1) << {j * 2 + i})"
        for j in range(8)
        for i, d in enumerate(("x", "y"))
    )
    return {
        "sketch_hll_distinct": _SK.hll_estimate_sql(_hll_regs, ["event_type"]),
        "sketch_kmv_distinct": f"""
            WITH h AS (
              SELECT DISTINCT event_type, {_SK.mix_hash_sql("event_id")} AS kmv_h
              FROM events
            ), r AS (
              SELECT event_type, kmv_h,
                     row_number() OVER (PARTITION BY event_type ORDER BY kmv_h) AS rk
              FROM h
            )
            SELECT event_type, count(*)::BIGINT AS n_vals, max(kmv_h) AS h_k,
                   round(CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                         ELSE 63.0 * {_kmv_space} / max(kmv_h)::DOUBLE END,
                         4) AS est_distinct
            FROM r WHERE rk <= 64 GROUP BY event_type
        """,
        "sketch_cms_counts": f"""
            WITH counters AS (
              SELECT d, col, count(*)::BIGINT AS cnt FROM (
                SELECT unnest([0, 1, 2, 3]) AS d, unnest([{_cms_b}]) AS col
                FROM events
              ) GROUP BY d, col
            ), cand AS (SELECT DISTINCT user_id FROM events),
            probes AS (
              SELECT user_id, unnest([0, 1, 2, 3]) AS d, unnest([{_cms_b}]) AS col
              FROM cand
            )
            SELECT p.user_id, min(coalesce(c.cnt, 0))::BIGINT AS est_count
            FROM probes p LEFT JOIN counters c USING (d, col)
            GROUP BY p.user_id
        """,
        "weighted_sample": f"""
            SELECT doc_id, n_chars, round(skey, 6) AS sample_key FROM (
              SELECT doc_id, n_chars,
                     ln(({_k3_doc} + 1)::DOUBLE / 2147483647.0)
                       / n_chars::DOUBLE AS skey
              FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
            ) ORDER BY skey DESC, doc_id ASC LIMIT 50
        """,
        "dataset_split_counts": f"""
            SELECT split, count(*)::BIGINT AS n_rows,
                   count(DISTINCT user_id)::BIGINT AS n_users FROM (
              SELECT user_id,
                     CASE WHEN {_k3_user} < {_cut1} THEN 'train'
                          WHEN {_k3_user} < {_cut2} THEN 'val'
                          ELSE 'test' END AS split
              FROM events
            ) GROUP BY split
        """,
        "slo_burn_rate": """
            WITH b AS (
              SELECT svc, epoch, count(*)::BIGINT AS n, sum(is_err)::BIGINT AS n_err
              FROM (
                SELECT CAST(user_id % 3 AS VARCHAR) AS svc,
                       CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS epoch,
                       CAST(event_type = 'error' AS BIGINT) AS is_err
                FROM events
              ) GROUP BY svc, epoch
            ), w AS (
              SELECT svc, epoch, n, n_err,
                     sum(n_err) OVER ws / sum(n) OVER ws AS sr,
                     sum(n_err) OVER wl / sum(n) OVER wl AS lr
              FROM b
              WINDOW ws AS (PARTITION BY svc ORDER BY epoch
                            RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW),
                     wl AS (PARTITION BY svc ORDER BY epoch
                            RANGE BETWEEN 21599 PRECEDING AND CURRENT ROW)
            )
            SELECT svc, epoch AS bucket_epoch, n, n_err,
                   round(sr, 6) AS short_ratio, round(lr, 6) AS long_ratio,
                   round(sr / 0.1, 6) AS short_burn, round(lr / 0.1, 6) AS long_burn,
                   (sr / 0.1 > 2.0 AND lr / 0.1 > 2.0) AS alert
            FROM w
        """,
        # span frame shared by the trace-plane oracles (same derivation as
        # _span_frame; the lag window is omitted where parent links are
        # unused — identical rows either way).
        "service_deps": f"""
            WITH spans AS (
              SELECT CAST(event_id % 997 AS BIGINT) AS trace_id,
                     event_id AS span_id,
                     lag(event_id) OVER (PARTITION BY event_id % 997
                                         ORDER BY ts, event_id) AS parent_span_id,
                     event_type AS service, value AS duration_ms
              FROM events
            )
            SELECT p.service AS parent_service, c.service AS child_service,
                   count(*)::BIGINT AS call_count,
                   round(avg(c.duration_ms), 6) AS avg_child_ms
            FROM spans c JOIN spans p
              ON c.trace_id = p.trace_id AND c.parent_span_id = p.span_id
            GROUP BY 1, 2
        """,
        "trace_tail_sampling": f"""
            WITH spans AS (
              SELECT CAST(event_id % 997 AS BIGINT) AS trace_id,
                     event_id AS span_id, event_type AS service,
                     value AS duration_ms, (event_id % 211 = 0) AS is_error
              FROM events
            ), d AS (
              SELECT trace_id,
                     max(CAST(is_error AS INT)) AS any_err,
                     max(duration_ms) AS max_ms
              FROM spans GROUP BY trace_id
            ), kept AS (
              SELECT trace_id,
                     CASE WHEN any_err = 1 THEN 'error'
                          WHEN max_ms >= 485.0 THEN 'latency'
                          WHEN ({_k3_trace})::DOUBLE < 0.05 * 2147483647
                               THEN 'probabilistic' END AS sample_reason
              FROM d
            )
            SELECT s.trace_id, s.span_id, s.service, k.sample_reason
            FROM spans s JOIN kept k USING (trace_id)
            WHERE k.sample_reason IS NOT NULL
        """,
        "red_metrics": """
            SELECT event_type AS service,
                   CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS bucket_epoch,
                   count(*)::BIGINT AS n_calls,
                   sum(CAST(event_id % 211 = 0 AS BIGINT))::BIGINT AS n_errors,
                   round(avg(CAST(event_id % 211 = 0 AS INT)), 6) AS error_rate,
                   round(avg(value), 6) AS avg_ms,
                   max(value) AS max_ms,
                   round(quantile_cont(value, 0.95), 6) AS p_ms
            FROM events GROUP BY 1, 2
        """,
        "preference_pairs": """
            WITH c AS (
              SELECT user_id AS conv_id, event_id AS turn_idx,
                     props AS text, value AS score
              FROM events WHERE event_id % 3 = 1
            ), r AS (
              SELECT conv_id, text, score,
                     row_number() OVER (PARTITION BY conv_id
                       ORDER BY score DESC, turn_idx ASC) AS rn_hi,
                     row_number() OVER (PARTITION BY conv_id
                       ORDER BY score ASC, turn_idx DESC) AS rn_lo
              FROM c
            )
            SELECT conv_id, count(*)::BIGINT AS n_candidates,
                   max(CASE WHEN rn_hi = 1 THEN text END) AS chosen,
                   max(CASE WHEN rn_lo = 1 THEN text END) AS rejected,
                   round(max(score) - min(score), 6) AS margin
            FROM r GROUP BY conv_id
            HAVING round(max(score) - min(score), 6) > 0
        """,
        "index_term_lookup": r"""
            WITH d AS (
              SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents
            )
            SELECT 'spark' AS term, doc_id,
                   len(list_filter(t, x -> x = 'spark'))::BIGINT AS tf,
                   len(t)::BIGINT AS dl
            FROM d WHERE list_contains(t, 'spark')
            UNION ALL
            SELECT 'merge', doc_id,
                   len(list_filter(t, x -> x = 'merge'))::BIGINT,
                   len(t)::BIGINT
            FROM d WHERE list_contains(t, 'merge')
        """,
        # identical corpus-scan restatement as q_score_bm25 — the Spark
        # side serves from the materialized index, so green means
        # index-served == scan-served across engines.
        "index_bm25": r"""
            WITH d AS (
              SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents
            ), s AS (
              SELECT count(*)::DOUBLE AS n, avg(len(t))::DOUBLE AS avgdl FROM d
            ), dfs AS (
              SELECT
                sum(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END)::DOUBLE AS df1,
                sum(CASE WHEN list_contains(t, 'merge') THEN 1 ELSE 0 END)::DOUBLE AS df2
              FROM d
            ), sc AS (
              SELECT doc_id,
                     len(list_filter(t, x -> x = 'spark'))::DOUBLE AS f1,
                     len(list_filter(t, x -> x = 'merge'))::DOUBLE AS f2,
                     len(t)::DOUBLE AS dl
              FROM d
            )
            SELECT doc_id,
                   round(
                     ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
                       * (f1 * 2.2) / (f1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                     + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
                       * (f2 * 2.2) / (f2 + 1.2 * (0.25 + 0.75 * dl / avgdl)),
                   6) AS _score
            FROM sc, s, dfs
            WHERE f1 > 0 OR f2 > 0
            ORDER BY _score DESC, doc_id ASC
            LIMIT 20
        """,
        "zorder_key": f"""
            WITH q AS (
              SELECT event_id,
                     least(greatest(CAST(floor((value - 0.0) / 500.0 * 256.0)
                                         AS BIGINT), 0), 255) AS cell_x,
                     CAST(user_id % 256 AS BIGINT) AS cell_y
              FROM events
            )
            SELECT event_id, cell_x, cell_y, ({_zorder_sql}) AS zkey FROM q
        """,
        "index_phrase": r"""
            WITH d AS (
              SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents
            ), f AS (
              SELECT doc_id,
                     len(list_filter(generate_series(1, len(t) - 1),
                                     i -> t[i] = 'slow' AND t[i+1] = 'fast'))
                       ::BIGINT AS phrase_freq
              FROM d WHERE len(t) >= 2
            )
            SELECT doc_id, phrase_freq FROM f WHERE phrase_freq > 0
        """,
        "log_throttle": """
            SELECT event_id, stratum, sample_rank FROM (
              SELECT event_id,
                     event_type || '|' ||
                       CAST(CAST(epoch(date_trunc('day', ts)) AS BIGINT)
                            AS VARCHAR) AS stratum,
                     row_number() OVER (
                       PARTITION BY event_type, date_trunc('day', ts)
                       ORDER BY
                         ((2147483629 *
                            ((event_id % 2147483647 + 1) * 48271 % 2147483647)
                           + (event_id % 2147483629 + 1) * 16807 % 2147483629)
                          % 2147483647 + 1) * 48271 % 2147483647,
                         (event_id % 2147483647 + 1) * 48271 % 2147483647,
                         (event_id % 2147483629 + 1) * 16807 % 2147483629,
                         event_id
                     ) AS sample_rank
              FROM events
            ) WHERE sample_rank <= 20
        """,
        "index_incremental_lookup": r"""
            WITH d AS (
              SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents WHERE doc_id % 7 != 0
            )
            SELECT 'spark' AS term, doc_id,
                   len(list_filter(t, x -> x = 'spark'))::BIGINT AS tf,
                   len(t)::BIGINT AS dl
            FROM d WHERE list_contains(t, 'spark')
        """,
        "scd2_history": """
            WITH ch AS (
              SELECT user_id % 40 AS key, event_id AS ts, event_type AS tier
              FROM events
            )
            SELECT key,
                   row_number() OVER w AS version,
                   tier,
                   ts AS valid_from,
                   lead(ts) OVER w AS valid_to,
                   lead(ts) OVER w IS NULL AS is_current
            FROM ch WINDOW w AS (PARTITION BY key ORDER BY ts)
        """,
        "text_collocations": r"""
            WITH d AS (
              SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents
            ), tot AS (
              SELECT sum(len(t))::DOUBLE AS nu,
                     sum(greatest(len(t) - 1, 0))::DOUBLE AS nb
              FROM d
            ), uni AS (
              SELECT w, count(*) AS c
              FROM (SELECT unnest(t) AS w FROM d) GROUP BY w
            ), bg AS (
              SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                            i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS s
              FROM d WHERE len(t) >= 2
            ), bi AS (
              SELECT s.w1 AS w1, s.w2 AS w2, count(*)::BIGINT AS c12
              FROM bg GROUP BY 1, 2 HAVING count(*) >= 5
            )
            SELECT w1, w2, c12,
                   round(ln((c12::DOUBLE / nb)
                            / ((u1.c::DOUBLE / nu) * (u2.c::DOUBLE / nu))), 6)
                     AS pmi
            FROM bi
            JOIN uni u1 ON u1.w = bi.w1
            JOIN uni u2 ON u2.w = bi.w2, tot
            ORDER BY pmi DESC, w1 ASC, w2 ASC
            LIMIT 50
        """,
        "percolate_match": """
            SELECT event_id, 'alert_errors' AS query_id
            FROM events WHERE event_type = 'error'
            UNION ALL
            SELECT event_id, 'alert_hot_value'
            FROM events WHERE value >= 400 AND value <= 500
            UNION ALL
            SELECT event_id, 'alert_signup_low'
            FROM events WHERE event_type = 'signup' AND value >= 0 AND value < 50
        """,
        "context_truncate": """
            WITH t AS (
              SELECT user_id AS conv_id, event_id AS turn_idx,
                     (['user','assistant','tool'])[CAST(event_id % 3 + 1 AS INT)] AS role,
                     props AS text
              FROM events
            ), w AS (
              SELECT conv_id, turn_idx, role, length(text)::BIGINT AS n_tokens,
                     sum(length(text)) OVER (PARTITION BY conv_id
                       ORDER BY turn_idx DESC ROWS UNBOUNDED PRECEDING) AS rev_cum,
                     row_number() OVER (PARTITION BY conv_id
                       ORDER BY turn_idx DESC) AS rn
              FROM t
            )
            SELECT conv_id, turn_idx, role, n_tokens
            FROM w WHERE rev_cum <= 100 OR rn = 1
        """,
        "agg_date_histogram": f"""
            SELECT key, strftime(to_timestamp(key / 1000), '%Y-%m-%dT%H:%M:%SZ') AS key_as_string,
                   doc_count
            FROM (SELECT {_DH_KEY} AS key, count(*) AS doc_count FROM events GROUP BY 1)
        """,
        "agg_date_histogram_gapfill": """
            WITH b AS (
              SELECT CAST(floor((epoch_ms(ts) + 86400000) / 259200000) * 259200000 - 86400000 AS BIGINT) AS key,
                     count(*) AS doc_count
              FROM events GROUP BY 1
            ), d AS (
              SELECT unnest(range((SELECT min(key) FROM b), (SELECT max(key) FROM b) + 1,
                     259200000)) AS key
            )
            SELECT d.key,
                   strftime(to_timestamp(d.key / 1000), '%Y-%m-%dT%H:%M:%SZ') AS key_as_string,
                   coalesce(b.doc_count, 0) AS doc_count
            FROM d LEFT JOIN b USING (key)
        """,
        "agg_histogram_value": """
            SELECT round(floor(value / 25.0) * 25.0, 6) AS key, count(*) AS doc_count
            FROM events WHERE value IS NOT NULL GROUP BY 1
        """,
        "agg_terms_event_type": """
            SELECT event_type AS key, count(*) AS doc_count FROM events GROUP BY 1
        """,
        "agg_terms_topk": """
            SELECT event_type AS key, count(*) AS doc_count FROM events GROUP BY 1
            ORDER BY doc_count DESC, key ASC LIMIT 3
        """,
        "agg_multi_terms": """
            SELECT event_type, user_id, count(*) AS doc_count,
                   event_type || '|' || CAST(user_id AS VARCHAR) AS key_as_string
            FROM events GROUP BY 1, 2
            ORDER BY doc_count DESC, key_as_string ASC LIMIT 20
        """,
        "agg_cardinality_exact": "SELECT count(DISTINCT user_id) AS value FROM events",
        "agg_stats_value": """
            SELECT count(value) AS count, round(min(value), 6) AS min,
                   round(max(value), 6) AS max, round(sum(value), 4) AS sum,
                   round(avg(value), 6) AS avg
            FROM events
        """,
        "agg_extended_stats_value": """
            SELECT count(value) AS count, round(var_pop(value), 4) AS variance,
                   round(stddev_pop(value), 6) AS std_deviation
            FROM events
        """,
        "agg_percentiles_value": """
            SELECT round(quantile_cont(value, 0.25), 6) AS p25,
                   round(quantile_cont(value, 0.50), 6) AS p50,
                   round(quantile_cont(value, 0.75), 6) AS p75,
                   round(quantile_cont(value, 0.95), 6) AS p95
            FROM events
        """,
        "agg_range_value": """
            WITH names(range_key) AS (VALUES ('*-10'), ('10-50'), ('50-*')),
            b AS (
              SELECT CASE WHEN value < 10 THEN '*-10'
                          WHEN value >= 10 AND value < 50 THEN '10-50'
                          ELSE '50-*' END AS range_key, count(*) AS doc_count
              FROM events WHERE value IS NOT NULL GROUP BY 1
            )
            SELECT names.range_key, coalesce(b.doc_count, 0) AS doc_count
            FROM names LEFT JOIN b USING (range_key)
        """,
        "agg_composite_after": """
            SELECT event_type, user_id, count(*) AS doc_count FROM events
            GROUP BY 1, 2
            HAVING event_type > 'click' OR (event_type = 'click' AND user_id > 10)
            ORDER BY event_type ASC, user_id ASC LIMIT 50
        """,
        "agg_composite_datehist": f"""
            SELECT {_DH_KEY} AS day, event_type AS etype, count(*) AS doc_count
            FROM events
            GROUP BY 1, 2
            HAVING day > 1704240000000 OR (day = 1704240000000 AND etype > 'error')
            ORDER BY day ASC, etype ASC LIMIT 40
        """,
        "agg_terms_order_by_avg": """
            SELECT event_type AS key, count(*) AS doc_count,
                   round(avg(value), 6) AS avg_value
            FROM events GROUP BY 1
            ORDER BY avg(value) DESC, key ASC LIMIT 3
        """,
        "agg_top_hits": """
            SELECT event_type, event_id, round(value, 6) AS value FROM (
              SELECT event_type, event_id, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id ASC) AS rn
              FROM events
            ) WHERE rn <= 2
        """,
        "agg_find_trace_ids": """
            SELECT user_id AS trace_id, epoch_ms(max(ts)) AS max_ts_ms
            FROM events GROUP BY 1
            ORDER BY max(ts) DESC, user_id ASC LIMIT 5
        """,
        "q_term": "SELECT event_id FROM events WHERE event_type = 'error'",
        "q_termset": "SELECT event_id FROM events WHERE event_type IN ('click', 'view')",
        "q_range_numeric": "SELECT event_id FROM events WHERE value >= 10 AND value < 20",
        "q_range_ts": """
            SELECT event_id FROM events
            WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts < TIMESTAMP '2024-01-06 12:00:00'
        """,
        "q_bool": """
            SELECT event_id FROM events
            WHERE (event_type = 'error' OR event_type = 'click')
              AND value >= 5 AND NOT coalesce(user_id = 7, FALSE)
        """,
        "q_exists": "SELECT event_id FROM events WHERE nullif(event_type, 'error') IS NOT NULL",
        "q_wildcard": "SELECT event_id FROM events WHERE regexp_matches(event_type, '^c.*$')",
        "q_regex": "SELECT doc_id FROM documents WHERE regexp_matches(text, '.*spark.*')",
        "q_fulltext_and": r"""
            SELECT doc_id FROM documents
            WHERE list_contains(string_split(lower(text), ' '), 'spark')
              AND list_contains(string_split(lower(text), ' '), 'query')
        """,
        "q_phrase": r"""
            SELECT doc_id FROM documents
            WHERE regexp_matches(lower(text), '(^|[^\w])slow[^\w]+fast($|[^\w])')
        """,
        "q_phrase_prefix": r"""
            SELECT doc_id FROM documents
            WHERE regexp_matches(lower(text), '(^|[^\w])table[^\w]+val\w*')
        """,
        "q_json_extract": """
            SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k_val, count(*) AS doc_count
            FROM events GROUP BY 1
        """,
        "q_ip_term": "SELECT event_id FROM events WHERE user_id = 42",
        "q_ip_range": "SELECT event_id FROM events WHERE user_id BETWEEN 20 AND 120",
        "sort_topk": """
            SELECT event_id, round(value, 6) AS value FROM events
            ORDER BY value DESC, event_id ASC LIMIT 10
        """,
        "search_after": """
            WITH top10 AS (
              SELECT event_id, value FROM events ORDER BY value DESC, event_id ASC LIMIT 10
            ), cur AS (
              SELECT event_id, value FROM top10 ORDER BY value ASC, event_id DESC LIMIT 1
            )
            SELECT e.event_id, round(e.value, 6) AS value FROM events e, cur
            WHERE e.value < cur.value OR (e.value = cur.value AND e.event_id > cur.event_id)
            ORDER BY e.value DESC, e.event_id ASC LIMIT 10
        """,
        "from_size": """
            SELECT event_id, round(value, 6) AS value FROM (
              SELECT event_id, value,
                     row_number() OVER (ORDER BY value DESC, event_id ASC) AS rn
              FROM events
            ) WHERE rn > 10 AND rn <= 20
        """,
        "count_only": "SELECT count(*) AS cnt FROM events",
        "join_broadcast_enrich": """
            SELECT c_nationkey, count(*) AS order_count,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        "join_semi_two_phase": """
            SELECT event_id FROM events
            WHERE user_id IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        """,
        "join_union_multi_index": """
            SELECT event_type, count(*) AS doc_count FROM (
              SELECT * FROM events WHERE event_type = 'click'
              UNION ALL
              SELECT * FROM events WHERE value >= 90
            ) GROUP BY 1
        """,
        "dedup_exact": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
        "dedup_ngram_jaccard": """
            WITH sh AS (
              SELECT doc_id,
                     list_distinct([array_to_string(words[i:i+2], ' ')
                                    for i in range(1, greatest(len(words) - 2, 1) + 1)]) AS s
              FROM (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents)
            )
            SELECT l.doc_id AS a, r.doc_id AS b,
                   round(len(list_intersect(l.s, r.s))::DOUBLE /
                         (len(l.s) + len(r.s) - len(list_intersect(l.s, r.s))), 6) AS jaccard
            FROM sh l JOIN sh r ON l.doc_id < r.doc_id
            WHERE round(len(list_intersect(l.s, r.s))::DOUBLE /
                        (len(l.s) + len(r.s) - len(list_intersect(l.s, r.s))), 6) >= 0.5
        """,
        "dedup_embedding_cosine": """
            SELECT l.vec_id AS a, r.vec_id AS b
            FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
            WHERE round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
                                               CAST(r.embedding AS DOUBLE[])), 6) >= 0.4
        """,
        "dedup_minhash_lsh": """
            WITH sh AS (
              SELECT doc_id,
                     list_distinct([array_to_string(words[i:i+2], ' ')
                                    for i in range(1, greatest(len(words) - 2, 1) + 1)]) AS s
              FROM (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents)
            )
            SELECT l.doc_id AS a, r.doc_id AS b,
                   round(len(list_intersect(l.s, r.s))::DOUBLE /
                         (len(l.s) + len(r.s) - len(list_intersect(l.s, r.s))), 6) AS jaccard
            FROM sh l JOIN sh r ON l.doc_id < r.doc_id
            WHERE round(len(list_intersect(l.s, r.s))::DOUBLE /
                        (len(l.s) + len(r.s) - len(list_intersect(l.s, r.s))), 6) >= 0.9
        """,
        "dedup_simhash": r"""
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
            ), norm AS (
              SELECT doc_id,
                     list_sort(regexp_split_to_array(lower(text), '\s+')) AS t
              FROM aug
            )
            SELECT l.doc_id AS a, r.doc_id AS b, CAST(0 AS INTEGER) AS hamming
            FROM norm l JOIN norm r ON l.doc_id < r.doc_id AND l.t = r.t
        """,
        "dedup_embedding_lsh": """
            WITH aug AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings
              WHERE vec_id % 7 = 0
            )
            SELECT l.vec_id AS a, r.vec_id AS b
            FROM aug l JOIN aug r ON l.vec_id < r.vec_id
            WHERE round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
                                               CAST(r.embedding AS DOUBLE[])), 6) >= 0.95
        """,
        "dedup_clusters": """
            WITH RECURSIVE p AS (
              SELECT l.vec_id AS a, r.vec_id AS b
              FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
              WHERE round(list_cosine_similarity(CAST(l.embedding AS DOUBLE[]),
                                                 CAST(r.embedding AS DOUBLE[])), 6) >= 0.4
            ), e AS (
              SELECT a AS x, b AS y FROM p UNION SELECT b, a FROM p
            ), reach(x, y) AS (
              SELECT x, y FROM e
              UNION
              SELECT reach.x, e.y FROM reach JOIN e ON reach.y = e.x
            )
            SELECT x AS member, least(x, min(y)) AS cluster
            FROM reach GROUP BY x
        """,
        "ann_topk": """
            SELECT r.vec_id,
                   round(list_cosine_similarity(CAST(r.embedding AS DOUBLE[]), q.emb), 4) AS cosine
            FROM embeddings r,
                 (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE vec_id = 0) q
            ORDER BY list_cosine_similarity(CAST(r.embedding AS DOUBLE[]), q.emb) DESC,
                     r.vec_id ASC
            LIMIT 10
        """,
        "janitor_delete_count": """
            SELECT event_type, count(*) AS doc_count FROM events
            WHERE NOT (event_type = 'error' AND value >= 50)
            GROUP BY 1
        """,
        "janitor_retention_count": """
            SELECT event_type, count(*) AS doc_count FROM events
            WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
            GROUP BY 1
        """,
        "ann_ivf": """
            SELECT r.vec_id,
                   round(list_cosine_similarity(CAST(r.embedding AS DOUBLE[]), q.emb), 4) AS cosine
            FROM embeddings r,
                 (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE vec_id = 0) q
            ORDER BY list_cosine_similarity(CAST(r.embedding AS DOUBLE[]), q.emb) DESC,
                     r.vec_id ASC
            LIMIT 10
        """,
        "ann_lsh": """
            SELECT r.vec_id,
                   round(list_cosine_similarity(CAST(r.embedding AS DOUBLE[]), q.emb), 4) AS cosine
            FROM embeddings r,
                 (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings WHERE vec_id = 0) q
            ORDER BY list_cosine_similarity(CAST(r.embedding AS DOUBLE[]), q.emb) DESC,
                     r.vec_id ASC
            LIMIT 10
        """,
        "text_langid": f"""
            SELECT doc_id,
                   ([{", ".join("'" + lang + "'" for lang, _ in _LANGID_FIXTURE)}])
                   [CAST(doc_id % {len(_LANGID_FIXTURE)} AS INT) + 1] AS lang_guess
            FROM documents
        """,
        "text_token_count": """
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
        """,
        "text_quality": r"""
            SELECT doc_id, length(text) AS n_chars,
                   len(string_split(text, ' ')) AS n_tokens,
                   round(len(regexp_extract_all(text, '[^\w\s]')) * 1.0
                         / greatest(length(text), 1), 6) AS punct_ratio
            FROM documents
        """,
        "multimodal_image_features": """
            SELECT doc_id AS media_id,
                   CAST(unnest(range(64)) AS INTEGER) AS feat_idx,
                   round(((doc_id % 256) + (doc_id * 7 % 256)
                          + (doc_id * 13 % 256)) / 765.0, 3) AS feat_value,
                   CAST(8 AS INTEGER) AS out_width,
                   CAST(8 AS INTEGER) AS out_height
            FROM documents WHERE doc_id % 3 = 0
        """,
        "multimodal_text_extract": """
            SELECT doc_id AS media_id, text AS extracted_text,
                   CAST(length(text) AS INTEGER) AS n_bytes
            FROM documents WHERE doc_id % 3 = 2
        """,
        "dedup_paragraphs": """
            WITH raw AS (
              SELECT doc_id, unnest(generate_series(0, 4)) AS pos FROM documents
            ), p AS (
              SELECT doc_id, pos,
                     'para' || CAST((doc_id * 31 + pos * 7) % 199 AS VARCHAR) AS para
              FROM raw
            ), r AS (
              SELECT doc_id, pos, para,
                     row_number() OVER (PARTITION BY para
                         ORDER BY doc_id, pos) AS rn
              FROM p
            )
            SELECT doc_id,
                   count(*) AS n_paras,
                   CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_kept,
                   coalesce(string_agg(CASE WHEN rn = 1 THEN para END,
                                       chr(10) ORDER BY pos), '') AS kept_text
            FROM r GROUP BY doc_id
        """,
        "dedup_substrings": r"""
            WITH d AS (
              SELECT doc_id, str_split_regex(trim(text), '\s+') AS t FROM documents
            ), w AS (
              SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 7),
                             i -> struct_pack(pos := i - 1,
                                              win := array_to_string(t[i:i+7], ' ')))) AS s
              FROM d WHERE len(t) >= 8
            ), x AS (
              SELECT doc_id, s.pos AS pos, s.win AS win FROM w
            ), r AS (
              SELECT doc_id,
                     row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
              FROM x
            )
            SELECT doc_id, count(*) AS n_windows,
                   CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_windows,
                   round(CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                         / count(*), 6) AS dup_frac
            FROM r GROUP BY doc_id
        """,
        "semantic_dedup": """
            WITH allv AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 7 = 0
            ), c AS (
              SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
              FROM embeddings WHERE vec_id < 8
            ), a AS (
              SELECT e.vec_id,
                     (SELECT CAST(cid AS INTEGER) FROM c
                      ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                      ce) DESC, cid ASC
                      LIMIT 1) AS cluster,
                     CAST(e.embedding AS DOUBLE[]) AS emb
              FROM allv e
            )
            SELECT a.vec_id, a.cluster,
                   NOT EXISTS (
                     SELECT 1 FROM a b
                     WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
                       AND round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.95
                   ) AS kept
            FROM a
        """,
        "q_score_bm25": r"""
            WITH d AS (
              SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents
            ), s AS (
              SELECT count(*)::DOUBLE AS n, avg(len(t))::DOUBLE AS avgdl FROM d
            ), dfs AS (
              SELECT
                sum(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END)::DOUBLE AS df1,
                sum(CASE WHEN list_contains(t, 'merge') THEN 1 ELSE 0 END)::DOUBLE AS df2
              FROM d
            ), sc AS (
              SELECT doc_id,
                     len(list_filter(t, x -> x = 'spark'))::DOUBLE AS f1,
                     len(list_filter(t, x -> x = 'merge'))::DOUBLE AS f2,
                     len(t)::DOUBLE AS dl
              FROM d
            )
            SELECT doc_id,
                   round(
                     ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
                       * (f1 * 2.2) / (f1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                     + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
                       * (f2 * 2.2) / (f2 + 1.2 * (0.25 + 0.75 * dl / avgdl)),
                   6) AS _score
            FROM sc, s, dfs
            WHERE f1 > 0 OR f2 > 0
            ORDER BY _score DESC, doc_id ASC
            LIMIT 20
        """,
        "epoch_shuffle": """
            WITH b AS (
              SELECT doc_id,
                     CAST((((doc_id + 7) % 2147483648) * 2654435761)
                          % 4294967296 AS BIGINT) AS key
              FROM documents
            )
            SELECT doc_id,
                   CAST(key % 8 AS INTEGER) AS shard,
                   row_number() OVER (PARTITION BY key % 8
                                      ORDER BY key, doc_id) - 1 AS pos
            FROM b
        """,
        # one Lloyd iteration, centroids = 4 lowest-id embeddings; the
        # row_number tie-break (dist, cid) mirrors the kernel's first-argmin
        "kmeans_step": r"""
            WITH c AS (
              SELECT vec_id AS cid, embedding AS cemb
              FROM embeddings WHERE vec_id < 4
            ), d AS (
              SELECT e.vec_id, c.cid,
                     list_distance(e.embedding::DOUBLE[], c.cemb::DOUBLE[]) AS dist
              FROM embeddings e CROSS JOIN c
            ), a AS (
              SELECT vec_id, cid AS cluster
              FROM (SELECT vec_id, cid,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY dist, cid) AS rn
                    FROM d)
              WHERE rn = 1
            ), j AS (
              SELECT a.cluster, e.embedding
              FROM a JOIN embeddings e USING (vec_id)
            )
            SELECT cluster, i - 1 AS idx,
                   CAST(round(avg(embedding[i]::DOUBLE), 6) AS DOUBLE) AS value,
                   COUNT(*) AS n
            FROM j CROSS JOIN generate_series(1, 64) AS t(i)
            GROUP BY cluster, i
        """,
        # single-fragment regime (excerpt < 150 bytes): fragment = excerpt
        # cut at the last token's end; every `customer` token <b>-wrapped;
        # the 5-entity escape chain is identity on this [a-z ] corpus but
        # restated anyway so the contract is complete
        "q_snippet": r"""
            WITH frag AS (
              SELECT doc_id,
                     regexp_replace(substr(text, 1, 140),
                                    '[^0-9A-Za-z]+$', '') AS fragment
              FROM documents
            ), esc AS (
              SELECT doc_id,
                     replace(replace(replace(replace(replace(fragment,
                       '&', '&amp;'), '<', '&lt;'), '>', '&gt;'),
                       '"', '&quot;'), chr(39), '&#x27;') AS e
              FROM frag
            )
            SELECT doc_id,
                   regexp_replace(e, '\b(customer)\b', '<b>\1</b>', 'g') AS snippet
            FROM esc
            WHERE regexp_matches(e, '\bcustomer\b')
        """,
        "text_normalize": r"""
            WITH m AS (
              SELECT doc_id,
                     '  ' || text || chr(8203) || chr(160) || 'end' || chr(9)
                     || 'of' || chr(7) || 'doc  ' AS t
              FROM documents
            )
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(regexp_replace(
                        regexp_replace(regexp_replace(t,
                          '[\x{200b}\x{200c}\x{200d}\x{feff}\x{ad}]', '', 'g'),
                          '[\x{a0}\x{2000}-\x{200a}\x{3000}]', ' ', 'g'),
                          '[\x00-\x08\x0b-\x1f\x7f]', '', 'g'),
                          '[ \t]+', ' ', 'g'),
                          ' ?\n ?', chr(10), 'g')) AS clean
            FROM m
        """,
        "text_gopher": r"""
            WITH w AS (
              SELECT doc_id, text,
                     list_filter(str_split_regex(trim(text), '\s+'),
                                 x -> len(x) > 0) AS words,
                     list_filter(str_split_regex(text, '\n'),
                                 l -> len(trim(l)) > 0) AS lines,
                     str_split_regex(lower(trim(text)), '\W+') AS lw
              FROM documents
            ), f AS (
              SELECT doc_id,
                len(words) AS n_words,
                round(coalesce(list_sum(list_transform(words,
                          x -> len(x)::DOUBLE)), 0)
                      / greatest(len(words), 1), 6) AS mean_word_len,
                round(((len(text) - len(regexp_replace(text, '#', '', 'g')))
                       + (len(str_split_regex(text, '\.\.\.')) - 1))
                      / greatest(len(words), 1)::DOUBLE, 6) AS symbol_word_ratio,
                round(len(list_filter(lines,
                          l -> regexp_matches(trim(l), '^([\-\*•])')))
                      / greatest(len(lines), 1)::DOUBLE, 6) AS bullet_line_frac,
                round(len(list_filter(lines,
                          l -> regexp_matches(trim(l), '\.\.\.$')))
                      / greatest(len(lines), 1)::DOUBLE, 6) AS ellipsis_line_frac,
                len(list_filter(lw, x -> list_contains(
                    ['the','be','to','of','and','that','have','with'], x)))
                  AS stopword_hits
              FROM w
            )
            SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
                   bullet_line_frac, ellipsis_line_frac, stopword_hits,
                   (n_words BETWEEN 50 AND 100000)
                   AND (mean_word_len BETWEEN 3.0 AND 10.0)
                   AND (symbol_word_ratio <= 0.1)
                   AND (bullet_line_frac <= 0.9)
                   AND (ellipsis_line_frac <= 0.3)
                   AND (stopword_hits >= 2) AS keep
            FROM f
        """,
        "ann_ivf_pq": _ivfpq_oracle(),
        # RRF = Σ 1/(60 + rank) over the two k-sized rank lists; the BM25
        # CTE chain is the q_score_bm25 oracle verbatim, the vector side is
        # the ann_topk brute-cosine oracle with query = embedding 5 and
        # cosine rounded to 6 BEFORE ranking (mirroring cosine_topk)
        "hybrid_rrf": r"""
            WITH d AS (
              SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents
            ), s AS (
              SELECT count(*)::DOUBLE AS n, avg(len(t))::DOUBLE AS avgdl FROM d
            ), dfs AS (
              SELECT
                sum(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END)::DOUBLE AS df1,
                sum(CASE WHEN list_contains(t, 'merge') THEN 1 ELSE 0 END)::DOUBLE AS df2
              FROM d
            ), sc AS (
              SELECT doc_id,
                     len(list_filter(t, x -> x = 'spark'))::DOUBLE AS f1,
                     len(list_filter(t, x -> x = 'merge'))::DOUBLE AS f2,
                     len(t)::DOUBLE AS dl
              FROM d
            ), lex20 AS (
              SELECT doc_id,
                     round(
                       ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
                         * (f1 * 2.2) / (f1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
                       + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
                         * (f2 * 2.2) / (f2 + 1.2 * (0.25 + 0.75 * dl / avgdl)),
                     6) AS _score
              FROM sc, s, dfs
              WHERE f1 > 0 OR f2 > 0
              ORDER BY _score DESC, doc_id ASC
              LIMIT 20
            ), lex AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY _score DESC, doc_id ASC) AS rank
              FROM lex20
            ), vec20 AS (
              SELECT r.vec_id AS doc_id,
                     round(list_cosine_similarity(
                       CAST(r.embedding AS DOUBLE[]), q.emb), 6) AS cos
              FROM embeddings r,
                   (SELECT CAST(embedding AS DOUBLE[]) AS emb
                    FROM embeddings WHERE vec_id = 5) q
              ORDER BY cos DESC, r.vec_id ASC
              LIMIT 20
            ), vec AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS rank
              FROM vec20
            ), u AS (
              SELECT doc_id, 1.0 / (60 + rank) AS c FROM lex
              UNION ALL
              SELECT doc_id, 1.0 / (60 + rank) AS c FROM vec
            )
            SELECT doc_id, round(sum(c), 6) AS rrf_score
            FROM u GROUP BY doc_id
            ORDER BY rrf_score DESC, doc_id ASC
            LIMIT 20
        """,
        "ann_pq": r"""
            WITH cb AS (
              SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings WHERE vec_id < 4
            ), cbl AS (
              SELECT list(e ORDER BY cid) AS cs FROM cb
            ), q AS (
              SELECT CAST(embedding AS DOUBLE[]) AS qe
              FROM embeddings WHERE vec_id = 5
            ), v AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            ), coded AS (
              SELECT v.vec_id, cbl.cs, q.qe,
                list_indexof(
                  list_transform(cs, c -> list_sum(list_transform(
                    generate_series(1, 16), i -> (e[i] - c[i]) ** 2))),
                  list_min(
                  list_transform(cs, c -> list_sum(list_transform(
                    generate_series(1, 16), i -> (e[i] - c[i]) ** 2))))
                ) AS code1,
                list_indexof(
                  list_transform(cs, c -> list_sum(list_transform(
                    generate_series(17, 32), i -> (e[i] - c[i]) ** 2))),
                  list_min(
                  list_transform(cs, c -> list_sum(list_transform(
                    generate_series(17, 32), i -> (e[i] - c[i]) ** 2))))
                ) AS code2,
                list_indexof(
                  list_transform(cs, c -> list_sum(list_transform(
                    generate_series(33, 48), i -> (e[i] - c[i]) ** 2))),
                  list_min(
                  list_transform(cs, c -> list_sum(list_transform(
                    generate_series(33, 48), i -> (e[i] - c[i]) ** 2))))
                ) AS code3,
                list_indexof(
                  list_transform(cs, c -> list_sum(list_transform(
                    generate_series(49, 64), i -> (e[i] - c[i]) ** 2))),
                  list_min(
                  list_transform(cs, c -> list_sum(list_transform(
                    generate_series(49, 64), i -> (e[i] - c[i]) ** 2))))
                ) AS code4
              FROM v, cbl, q
            )
            SELECT vec_id, round(
                list_sum(list_transform(generate_series(1, 16),
                    i -> (qe[i] - cs[code1][i]) ** 2))
              +                 list_sum(list_transform(generate_series(17, 32),
                    i -> (qe[i] - cs[code2][i]) ** 2))
              +                 list_sum(list_transform(generate_series(33, 48),
                    i -> (qe[i] - cs[code3][i]) ** 2))
              +                 list_sum(list_transform(generate_series(49, 64),
                    i -> (qe[i] - cs[code4][i]) ** 2)),
              6) AS adc
            FROM coded
            ORDER BY adc ASC, vec_id ASC
            LIMIT 15
        """,
        "pack_sequences": r"""
            WITH k AS (
              SELECT doc_id, text,
                     (doc_id % 2147483647 + 1) * 48271 % 2147483647 AS k1,
                     (doc_id % 2147483629 + 1) * 16807 % 2147483629 AS k2
              FROM documents
            ), b AS (
              SELECT doc_id,
                     (((2147483629 * k1 + k2) % 2147483647 + 1) * 48271
                       % 2147483647) % 4 AS shard,
                     ((2147483629 * k1 + k2) % 2147483647 + 1) * 48271
                       % 2147483647 AS _mix,
                     len(str_split_regex(trim(text), '\s+')) AS n_tokens
              FROM k
            ), c AS (
              SELECT doc_id, shard, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY shard ORDER BY _mix, doc_id
                                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM b
            )
            SELECT doc_id, shard, n_tokens,
                   CAST(cum - n_tokens AS BIGINT) AS offset,
                   CAST(floor((cum - n_tokens) / 256.0) AS BIGINT) AS chunk_start,
                   CAST(floor((cum - 1) / 256.0) AS BIGINT) AS chunk_end
            FROM c
        """,
        "bigram_lm": r"""
            WITH d AS (
              SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents
            ), bg AS (
              SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
                             i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS s
              FROM d WHERE len(t) >= 2
            ), b AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM bg),
            uni AS (
              SELECT w1, count(*) AS c1
              FROM (SELECT doc_id, unnest(t) AS w1 FROM d) GROUP BY w1
            ), v AS (SELECT count(*)::DOUBLE AS vocab FROM uni),
            bi AS (SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2),
            model AS (
              SELECT bi.w1, bi.w2,
                     ln((c12 + 0.1) / (c1 + 0.1 * (SELECT vocab FROM v))) AS logp
              FROM bi JOIN uni ON bi.w1 = uni.w1
            )
            SELECT b.doc_id, count(*) AS n_bigrams,
                   round(-avg(logp), 6) AS cross_entropy,
                   round(exp(-avg(logp)), 6) AS perplexity
            FROM b JOIN model ON b.w1 = model.w1 AND b.w2 = model.w2
            GROUP BY b.doc_id
        """,
        "mixture_plan": """
            WITH docs2 AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 < 6 THEN 'web'
                          WHEN doc_id % 10 < 9 THEN 'books'
                          ELSE 'code' END AS src_tier
              FROM documents
            ),
            counts AS (SELECT src_tier, count(*) AS n_docs FROM docs2 GROUP BY src_tier),
            tot AS (SELECT sum(n_docs)::DOUBLE AS total FROM counts),
            ws AS (SELECT sum(pow(n_docs::DOUBLE, 0.7)) AS wsum FROM counts),
            plan AS (
              SELECT src_tier, n_docs,
                     n_docs / (SELECT total FROM tot) AS nat_share,
                     pow(n_docs::DOUBLE, 0.7) / (SELECT wsum FROM ws) AS target_share,
                     least(1.0, (pow(n_docs::DOUBLE, 0.7) / (SELECT wsum FROM ws))
                                * (0.5 * (SELECT total FROM tot)) / n_docs) AS rate
              FROM counts
            ),
            kept AS (
              SELECT d.src_tier, count(*) AS n_kept
              FROM docs2 d JOIN plan p ON d.src_tier = p.src_tier
              WHERE ((2147483629 *
                        ((d.doc_id % 2147483647 + 1) * 48271 % 2147483647)
                      + (d.doc_id % 2147483629 + 1) * 16807 % 2147483629)
                     % 2147483647 + 1) * 48271 % 2147483647
                    < p.rate * 2147483647
              GROUP BY d.src_tier
            )
            SELECT p.src_tier, p.n_docs, round(nat_share, 6) AS nat_share,
                   round(target_share, 6) AS target_share, round(rate, 6) AS rate,
                   coalesce(n_kept, 0) AS n_kept
            FROM plan p LEFT JOIN kept ON p.src_tier = kept.src_tier
        """,
        "decontaminate": r"""
            WITH d AS (
              SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents
            ), g AS (
              SELECT doc_id,
                     unnest(list_transform(
                         generate_series(1, greatest(len(t) - 4, 1)),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4])
                     )) AS gram
              FROM d
            ), bg AS (
              SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0
            )
            SELECT g.doc_id, count(DISTINCT g.gram) AS n_contaminated
            FROM g JOIN bg USING (gram)
            GROUP BY g.doc_id
        """,
        "text_repetition": r"""
            WITH t AS (
              SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS l
              FROM documents
            ), g AS (
              SELECT doc_id, l,
                     list_transform(generate_series(1, len(l) - 1),
                         i -> l[i] || ' ' || l[i + 1]) AS bg
              FROM t
            )
            SELECT doc_id,
                   round(1.0 - len(list_distinct(l)) * 1.0
                         / greatest(len(l), 1), 6) AS dup_word_frac,
                   round(list_max(map_values(list_aggregate(l, 'histogram')))
                         * 1.0 / greatest(len(l), 1), 6) AS top_word_frac,
                   round(CASE WHEN len(l) >= 2 THEN
                         list_max(map_values(list_aggregate(bg, 'histogram')))
                         * 1.0 / (len(l) - 1) ELSE 0.0 END, 6) AS top_bigram_frac
            FROM g
        """,
        "text_pii": r"""
            WITH t AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com'
                          || CASE WHEN doc_id % 3 = 0
                             THEN ' call 555-123-'
                                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                             ELSE '' END AS s
              FROM documents
            )
            SELECT doc_id,
                   len(regexp_extract_all(s,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
                   len(regexp_extract_all(s,
                       '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
                   length(regexp_replace(regexp_replace(s,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_len
            FROM t
        """,
        "text_url_domains": r"""
            WITH t AS (
              SELECT doc_id,
                     text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
                          || '.example.com/p/' || CAST(doc_id AS VARCHAR)
                          || ' and http://mirror' || CAST(doc_id % 3 AS VARCHAR)
                          || '.example.org' AS s
              FROM documents
            ), d AS (
              SELECT unnest(regexp_extract_all(s,
                         'https?://([A-Za-z0-9.-]+)', 1)) AS domain
              FROM t
            )
            SELECT domain, count(*) AS n_docs FROM d GROUP BY domain
        """,
        "knn_join": """
            WITH s AS (
              SELECT q.vec_id AS qid, r.vec_id AS vec_id,
                     round(list_cosine_similarity(
                         CAST(r.embedding AS DOUBLE[]),
                         CAST(q.embedding AS DOUBLE[])), 4) AS cosine
              FROM embeddings r, embeddings q
              WHERE q.vec_id % 50 = 0
            ), rk AS (
              SELECT qid, vec_id, cosine,
                     row_number() OVER (PARTITION BY qid
                         ORDER BY cosine DESC, vec_id ASC) AS rn
              FROM s
            )
            SELECT qid, vec_id, cosine FROM rk WHERE rn <= 5
        """,
        # DSIR (exact-feature mode): unigram+bigram histograms for target
        # (lang='en') and raw corpora, add-1 log-ratio over the union
        # feature space, per-doc feature-count-weighted sum
        "dsir_weights": r"""
            WITH toks AS (
              SELECT doc_id, lang,
                     regexp_split_to_array(trim(lower(text)), '\s+') AS t
              FROM documents
            ), feats AS (
              SELECT doc_id, lang,
                     unnest(t || [t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS f
              FROM toks
            ), t_hist AS (
              SELECT f, count(*) AS t_n FROM feats WHERE lang = 'en' GROUP BY f
            ), r_hist AS (
              SELECT f, count(*) AS r_n FROM feats GROUP BY f
            ), tab AS (
              SELECT coalesce(t_hist.f, r_hist.f) AS f,
                     coalesce(t_n, 0) AS t_n, coalesce(r_n, 0) AS r_n
              FROM t_hist FULL OUTER JOIN r_hist ON t_hist.f = r_hist.f
            ), tot AS (
              SELECT sum(t_n) AS T, sum(r_n) AS R, count(*) AS V FROM tab
            ), lam AS (
              SELECT f,
                     ln((t_n + 1.0) / (T + V)) - ln((r_n + 1.0) / (R + V)) AS lam
              FROM tab, tot
            )
            SELECT d.doc_id, count(*) AS n_features,
                   round(sum(lam), 6) AS log_weight
            FROM feats d JOIN lam ON d.f = lam.f
            GROUP BY d.doc_id
        """,
        # C4 cleaning rules: trimmed non-blank lines, line keep = terminal
        # punct + >=5 words + no 'javascript', page keep = >=3 surviving
        # sentences and no lorem-ipsum / curly-brace poison
        "text_c4": r"""
            WITH rich AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0
                          THEN text || '. ' || text || '! ' || text || '?'
                          ELSE regexp_replace(text, ' the ',
                                              chr(10) || 'the ', 'g')
                          END AS text
              FROM documents
            ), l AS (
              SELECT doc_id, text,
                     [trim(x) for x in string_split(text, chr(10))
                      if trim(x) <> ''] AS lines
              FROM rich
            ), k AS (
              SELECT doc_id, text, lines,
                     [x for x in lines
                      if regexp_matches(x, '[.!?"”]$')
                         and len([w for w in regexp_split_to_array(x, '\s+')
                                  if len(w) > 0]) >= 5
                         and not regexp_matches(lower(x), '\bjavascript\b')
                     ] AS kept
              FROM l
            ), c AS (
              SELECT doc_id, text, len(lines) AS n_lines,
                     len(kept) AS n_kept_lines,
                     -- array_to_string([]) is NULL in DuckDB; Spark
                     -- array_join([]) is ''
                     coalesce(array_to_string(kept, chr(10)), '') AS clean_text
              FROM k
            )
            SELECT doc_id, n_lines, n_kept_lines, clean_text,
                   len([s for s in regexp_split_to_array(clean_text, '[.!?]')
                        if trim(s) <> '']) AS n_sentences,
                   (len([s for s in regexp_split_to_array(clean_text, '[.!?]')
                         if trim(s) <> '']) >= 3
                    AND lower(text) NOT LIKE '%lorem ipsum%'
                    AND text NOT LIKE '%{%') AS keep
            FROM c
        """,
        # corpus summary: whitespace tokens (trim+lower+split, empties
        # dropped), exact linear-interpolation quartiles (quantile_cont ==
        # Spark `percentile`), distinct whitespace vocab
        "vrl_transform": """
            SELECT event_id,
                   '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.1' AS client_ip,
                   'GET' AS method,
                   CASE WHEN 200 + (event_id % 5) >= 203
                        THEN upper('/' || event_type)
                        ELSE '/' || event_type END AS path,
                   CAST(200 + (event_id % 5) AS BIGINT) AS status,
                   CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) AS bytes_out,
                   CASE WHEN event_id % 3 = 0 THEN 'hot' ELSE 'cold' END AS tag,
                   CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS parsed_epoch
            FROM events
        """,
        "vrl_program": """
            SELECT event_id,
                   upper(event_type) AS etype,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                   CASE WHEN value >= 100.0 THEN 'high'
                        WHEN value >= 10.0 THEN 'mid'
                        ELSE 'low' END AS tier,
                   'u' || CAST(user_id AS VARCHAR) AS user_tag,
                   strftime(ts, '%Y-%m-%d') AS day,
                   (event_type LIKE '%err%') OR (value < 0.0) AS flag
            FROM events
            WHERE event_id < 5000
        """,
        "text_tfidf": r"""
            WITH d AS (
              SELECT doc_id,
                     list_filter(str_split_regex(lower(trim(text)), '\s+'),
                                 w -> len(w) > 0) AS t
              FROM documents
            ), n AS (SELECT count(*)::DOUBLE AS n FROM d),
            tf AS (
              SELECT doc_id, term, count(*)::BIGINT AS tf
              FROM (SELECT doc_id, unnest(t) AS term FROM d)
              GROUP BY 1, 2
            ), dfr AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
            sc AS (
              SELECT doc_id, term, tf, df,
                     round(tf * (ln((n.n + 1) / (df + 1)) + 1), 6) AS tfidf
              FROM tf JOIN dfr USING (term) CROSS JOIN n
            ), r AS (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
              FROM sc
            )
            SELECT doc_id, rank, term, tf, df, tfidf FROM r WHERE rank <= 5
        """,
        "text_quality_classifier": _quality_classifier_oracle(),
        "ann_sq8": _ann_sq8_oracle(),
        "q_more_like_this": r"""
            WITH d AS (
              SELECT doc_id,
                     list_filter(str_split_regex(lower(trim(text)), '\s+'),
                                 w -> len(w) > 0) AS t
              FROM documents
            ), s AS (
              SELECT count(*)::DOUBLE AS n, avg(len(t))::DOUBLE AS avgdl FROM d
            ), seedtf AS (
              SELECT term, count(*)::DOUBLE AS stf
              FROM (SELECT unnest(t) AS term FROM d WHERE doc_id = 7)
              GROUP BY 1
            ), alltf AS (
              SELECT term, doc_id, dl, count(*)::DOUBLE AS tf FROM (
                SELECT doc_id, len(t)::DOUBLE AS dl, unnest(t) AS term FROM d
              ) JOIN (SELECT term FROM seedtf) USING (term)
              GROUP BY 1, 2, 3
            ), dft AS (
              SELECT term, count(*)::DOUBLE AS df FROM alltf GROUP BY 1
            ), sel AS (
              SELECT term, row_number() OVER (
                ORDER BY stf * ln(1 + (n - df + 0.5) / (df + 0.5)) DESC,
                         term ASC) AS r
              FROM seedtf JOIN dft USING (term), s
              WHERE df >= 2
            ), qt AS (SELECT term FROM sel WHERE r <= 10),
            sc AS (
              SELECT doc_id,
                     round(sum(
                       ln(1 + (n - df + 0.5) / (df + 0.5))
                       * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
                     ), 6) AS _score
              FROM alltf JOIN dft USING (term) JOIN qt USING (term), s
              WHERE doc_id != 7
              GROUP BY 1
            )
            SELECT CAST(7 AS BIGINT) AS query_id, doc_id, _score, rank FROM (
              SELECT *, row_number() OVER (
                ORDER BY _score DESC, doc_id ASC) AS rank
              FROM sc
            ) WHERE rank <= 10
        """,
        "chunk_sliding": r"""
            WITH d AS (
              SELECT doc_id,
                     list_filter(str_split_regex(trim(text), '\s+'),
                                 w -> len(w) > 0) AS t
              FROM documents WHERE doc_id < 400
            ), b AS (
              SELECT doc_id, t, len(t) AS n,
                     greatest(1, CAST(ceil((len(t) - 8) / 24.0) AS BIGINT)) AS m
              FROM d
            )
            SELECT doc_id,
                   i AS chunk_idx,
                   i * 24 AS token_start,
                   CAST(least(i * 24 + 32, n) AS BIGINT) AS token_end,
                   CAST(least(i * 24 + 32, n) - i * 24 AS BIGINT) AS n_tokens,
                   array_to_string(
                     t[i * 24 + 1 : CAST(least(i * 24 + 32, n) AS BIGINT)],
                     ' ') AS chunk_text
            FROM b, unnest(generate_series(0, m - 1)) AS u(i)
        """,
        "field_collapse": """
            WITH ranked AS (
              SELECT user_id, event_id, value,
                     row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY value DESC NULLS LAST,
                                event_id ASC NULLS LAST) AS group_rank
              FROM events
            ), page AS (
              SELECT user_id FROM ranked WHERE group_rank = 1
              ORDER BY value DESC NULLS LAST, user_id ASC NULLS LAST
              LIMIT 20
            )
            SELECT r.user_id, r.event_id, r.value,
                   CAST(r.group_rank AS BIGINT) AS group_rank
            FROM ranked r JOIN page USING (user_id)
            WHERE group_rank <= 2
        """,
        "trajectory_stats": r"""
            WITH t AS (
              SELECT user_id AS conv_id, event_id AS turn_idx,
                     (['user','assistant','tool'])[CAST(event_id % 3 + 1 AS INT)] AS role,
                     props AS text,
                     CASE WHEN event_id % 3 = 2
                          THEN 'tool-' || CAST(event_id % 4 AS VARCHAR) END AS tool,
                     ts
              FROM events
            )
            SELECT conv_id,
                   count(*)::BIGINT AS n_turns,
                   count(*) FILTER (role = 'user')::BIGINT AS n_user,
                   count(*) FILTER (role = 'assistant')::BIGINT AS n_assistant,
                   count(*) FILTER (role = 'tool')::BIGINT AS n_tool,
                   count(DISTINCT tool)::BIGINT AS n_distinct_tools,
                   (floor(epoch(max(ts))) - floor(epoch(min(ts))))::BIGINT
                     AS duration_sec,
                   arg_min(role, turn_idx) AS first_role,
                   arg_max(role, turn_idx) AS last_role,
                   min(CASE WHEN role = 'tool' THEN turn_idx END)::BIGINT
                     AS first_tool_turn,
                   round(avg(len(coalesce(text, ''))), 6) AS avg_text_chars,
                   count(*) FILTER (text LIKE '%9%')::BIGINT AS n_errors
            FROM t GROUP BY 1
        """,
        "funnel_counts": """
            WITH e AS (
              SELECT user_id AS g, event_id AS o, event_type FROM events
            ), s1 AS (
              SELECT g, min(o) AS m FROM e WHERE event_type = 'view' GROUP BY 1
            ), s2 AS (
              SELECT e.g, min(e.o) AS m FROM e JOIN s1 USING (g)
              WHERE event_type = 'click' AND e.o > s1.m GROUP BY 1
            ), s3 AS (
              SELECT e.g, min(e.o) AS m FROM e JOIN s2 USING (g)
              WHERE event_type = 'purchase' AND e.o > s2.m GROUP BY 1
            )
            SELECT * FROM (
              SELECT 1::BIGINT AS step, 'view' AS step_name,
                     count(*)::BIGINT AS n_groups FROM s1
              UNION ALL SELECT 2, 'click', count(*) FROM s2
              UNION ALL SELECT 3, 'purchase', count(*) FROM s3
            ) WHERE n_groups > 0
        """,
        "agg_significant_terms": r"""
            WITH d AS (
              SELECT doc_id, source,
                     list_distinct(list_filter(
                       str_split_regex(lower(text), '[^a-z0-9]+'),
                       w -> len(w) > 0)) AS t
              FROM documents
            ), s AS (
              SELECT count(*)::DOUBLE AS n_bg,
                     count(*) FILTER (source = 'src0')::DOUBLE AS n_fg
              FROM d
            ), f AS (
              SELECT term,
                     count(*) FILTER (source = 'src0')::BIGINT AS fg_df,
                     count(*)::BIGINT AS bg_df
              FROM (SELECT doc_id, source, unnest(t) AS term FROM d)
              GROUP BY 1
            )
            SELECT term, fg_df, bg_df,
                   round((fg_df / n_fg - bg_df / n_bg)
                         * ((fg_df / n_fg) / (bg_df / n_bg)), 6) AS score
            FROM f, s
            WHERE fg_df >= 5 AND fg_df / n_fg > bg_df / n_bg
            ORDER BY score DESC, term ASC LIMIT 10
        """,
        "rollup_daily": """
            SELECT event_type,
                   date_trunc('day', ts)::TIMESTAMP AS bucket,
                   count(value)::BIGINT AS cnt,
                   round(sum(value), 6) AS sum_v,
                   min(value::DOUBLE) AS min_v,
                   max(value::DOUBLE) AS max_v,
                   round(round(sum(value), 6) / count(value), 6) AS avg_v,
                   round(var_pop(value), 6) AS var_v
            FROM events GROUP BY 1, 2
        """,
        "ts_anomalies": """
            WITH b AS (
              SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS bucket,
                     count(*)::DOUBLE AS metric
              FROM events GROUP BY 1, 2
            ), m AS (
              SELECT event_type, quantile_cont(metric, 0.5) AS med
              FROM b GROUP BY 1
            ), a AS (
              SELECT b.event_type,
                     quantile_cont(abs(metric - med), 0.5) AS mad
              FROM b JOIN m USING (event_type) GROUP BY 1
            )
            SELECT b.event_type, bucket, metric,
                   round(med, 6) AS med, round(mad, 6) AS mad,
                   CASE WHEN mad > 0
                        THEN round(0.6745 * (metric - med) / mad, 6) END AS score,
                   coalesce(CASE WHEN mad > 0
                        THEN abs(round(0.6745 * (metric - med) / mad, 6)) > 2.0
                   END, FALSE) AS is_anomaly
            FROM b JOIN m USING (event_type) JOIN a USING (event_type)
        """,
        "cohort_retention": """
            WITH p AS (
              SELECT user_id, date_trunc('week', ts)::TIMESTAMP AS per
              FROM events
            ), u AS (
              SELECT user_id, min(per) AS cohort FROM p GROUP BY 1
            ), d AS (
              SELECT DISTINCT p.user_id, cohort, per
              FROM p JOIN u USING (user_id)
            )
            SELECT cohort,
                   CAST(date_diff('day', cohort::DATE, per::DATE) // 7
                        AS BIGINT) AS period_idx,
                   count(*)::BIGINT AS n_users
            FROM d GROUP BY 1, 2
        """,
        "tool_transitions": """
            WITH t AS (
              SELECT user_id AS conv_id, event_id AS turn_idx,
                     'tool-' || CAST(event_id % 4 AS VARCHAR) AS tool
              FROM events WHERE event_id % 3 = 2
            ), pairs AS (
              SELECT tool AS from_state,
                     lead(tool) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx) AS to_state
              FROM t
            ), n AS (
              SELECT from_state, to_state, count(*)::BIGINT AS n
              FROM pairs WHERE to_state IS NOT NULL GROUP BY 1, 2
            ), tot AS (
              SELECT from_state, sum(n) AS tt FROM n GROUP BY 1
            )
            SELECT from_state, to_state, n, round(n / tt, 6) AS p
            FROM n JOIN tot USING (from_state)
        """,
        "suggest_prefix": r"""
            SELECT term, count(*)::BIGINT AS freq
            FROM (
              SELECT doc_id, unnest(list_distinct(list_filter(
                       str_split_regex(lower(text), '[^a-z0-9]+'),
                       w -> len(w) > 0))) AS term
              FROM documents
            )
            WHERE term LIKE 's%'
            GROUP BY 1
            ORDER BY freq DESC, term ASC
            LIMIT 10
        """,
        "log_templates": r"""
            WITH lines AS (
              SELECT 'user ' || CAST(user_id AS VARCHAR) || ' did '
                     || event_type || ' from 10.0.'
                     || CAST(event_id % 250 AS VARCHAR) || '.7 value='
                     || CAST(value AS VARCHAR) AS text
              FROM events
            ), t AS (
              SELECT text,
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(text,
                             '\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\b',
                             '<UUID>', 'g'),
                           '\b0x[0-9a-fA-F]+\b', '<HEX>', 'g'),
                         '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g'),
                       '\d+(\.\d+)?', '<NUM>', 'g') AS template
              FROM lines
            )
            SELECT template, count(*)::BIGINT AS n, min(text) AS example
            FROM t GROUP BY 1
        """,
        "breach_spans": """
            WITH b AS (
              SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS bucket,
                     count(*)::DOUBLE AS metric
              FROM events GROUP BY 1, 2
            ), flagged AS (
              SELECT *,
                     CAST(floor(epoch(bucket) / 86400) AS BIGINT)
                     - row_number() OVER (
                         PARTITION BY event_type ORDER BY bucket) AS island
              FROM b WHERE metric > 70.0
            )
            SELECT event_type,
                   min(bucket) AS span_start,
                   max(bucket) AS span_end,
                   count(*)::BIGINT AS n_buckets,
                   max(metric) AS peak
            FROM flagged GROUP BY event_type, island
        """,
        "turn_context": """
            WITH t AS (
              SELECT user_id AS conv_id, event_id AS turn_idx,
                     (['user','assistant','tool'])[CAST(event_id % 3 + 1 AS INT)] AS role,
                     props AS text
              FROM events
            ), ctx AS (
              SELECT conv_id, turn_idx, role, text,
                     string_agg(role || ': ' || coalesce(text, ''), chr(10))
                       OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
                       AS context
              FROM t
            )
            SELECT conv_id, turn_idx,
                   coalesce(context, '') AS context,
                   coalesce(text, '') AS target
            FROM ctx WHERE role = 'assistant'
        """,
        "hist_p95_daily": """
            WITH h AS (
              SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS bucket,
                     CAST(least(greatest(floor(value / 300.0 * 64), 0), 63)
                          AS BIGINT) AS bin,
                     count(*)::BIGINT AS cnt
              FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
            ), c AS (
              SELECT *,
                     sum(cnt) OVER (PARTITION BY event_type, bucket
                                    ORDER BY bin) AS cum,
                     sum(cnt) OVER (PARTITION BY event_type, bucket) AS n
              FROM h
            ), f AS (
              SELECT event_type, bucket, n, bin, cnt, cum,
                     row_number() OVER (PARTITION BY event_type, bucket
                                        ORDER BY bin) AS rnk
              FROM c WHERE cum >= ceil(0.95 * n)
            )
            SELECT event_type, bucket, n::BIGINT AS n,
                   round((bin + (ceil(0.95 * n) - (cum - cnt)) / cnt)
                         * (300.0 / 64), 6) AS q_est
            FROM f WHERE rnk = 1
        """,
        "agg_pipeline_family": """
            WITH b AS (
              SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS bucket,
                     count(*)::DOUBLE AS metric
              FROM events GROUP BY 1, 2
            )
            SELECT event_type, bucket, metric,
                   round(metric - lag(metric) OVER w, 6) AS derivative,
                   round(sum(metric) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW), 6) AS cum_sum,
                   round(avg(metric) OVER (w ROWS BETWEEN 2 PRECEDING
                                           AND CURRENT ROW), 6) AS moving_avg
            FROM b
            WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
        """,
        "agg_percentile_ranks": """
            WITH s AS (
              SELECT count(value)::DOUBLE AS n,
                     count(*) FILTER (value <= 10.0)::DOUBLE AS le0,
                     count(*) FILTER (value <= 100.0)::DOUBLE AS le1,
                     count(*) FILTER (value <= 260.0)::DOUBLE AS le2
              FROM events
            )
            SELECT 10.0 AS value, round(100.0 * le0 / n, 6) AS rank_pct FROM s
            UNION ALL
            SELECT 100.0, round(100.0 * le1 / n, 6) FROM s
            UNION ALL
            SELECT 260.0, round(100.0 * le2 / n, 6) FROM s
        """,
        "chat_render": r"""
            WITH t AS (
              SELECT doc_id % 97 AS conv_id,
                     doc_id // 97 AS turn_idx,
                     CASE ((doc_id // 97) % 3)
                       WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                       ELSE 'tool' END AS role,
                     substr(text, 1, 80) AS txt
              FROM documents
            ), p AS (
              SELECT conv_id, turn_idx, role,
                     '<|im_start|>' || role || chr(10) || coalesce(txt, '')
                       || '<|im_end|>' || chr(10) AS piece,
                     13 + length(role) AS plen,
                     length(coalesce(txt, '')) AS tlen
              FROM t
            ), c AS (
              SELECT *,
                     coalesce(sum(length(piece)) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS cumbefore
              FROM p
            )
            SELECT conv_id, count(*)::BIGINT AS n_turns,
                   string_agg(piece, '' ORDER BY turn_idx) AS rendered,
                   coalesce(list(cumbefore + plen + 1 ORDER BY turn_idx)
                            FILTER (WHERE role = 'assistant'),
                            CAST([] AS BIGINT[])) AS span_starts,
                   coalesce(list(cumbefore + plen + 1 + tlen ORDER BY turn_idx)
                            FILTER (WHERE role = 'assistant'),
                            CAST([] AS BIGINT[])) AS span_ends
            FROM c GROUP BY conv_id
        """,
        "batch_bm25": r"""
            WITH q(query_id, query) AS (
              VALUES (CAST(0 AS BIGINT), 'join hash'),
                     (CAST(1 AS BIGINT), 'merge vector scan'),
                     (CAST(2 AS BIGINT), 'filter row batch')
            ), qt AS (
              SELECT query_id,
                     unnest(list_distinct(
                       str_split_regex(lower(trim(query)), '\s+'))) AS term
              FROM q
            ), d AS (
              SELECT doc_id, str_split_regex(lower(trim(text)), '\s+') AS t
              FROM documents
            ), s AS (
              SELECT count(*)::DOUBLE AS n, avg(len(t))::DOUBLE AS avgdl FROM d
            ), tok AS (
              SELECT doc_id, len(t)::DOUBLE AS dl, unnest(t) AS term FROM d
            ), tf AS (
              SELECT term, doc_id, dl, count(*)::DOUBLE AS tf
              FROM tok JOIN (SELECT DISTINCT term FROM qt) USING (term)
              GROUP BY 1, 2, 3
            ), dft AS (
              SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1
            ), sc AS (
              SELECT qt.query_id, tf.doc_id,
                     round(sum(
                       ln(1 + (n - df + 0.5) / (df + 0.5))
                       * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
                     ), 6) AS _score
              FROM tf JOIN dft USING (term) JOIN qt USING (term), s
              GROUP BY 1, 2
            )
            SELECT query_id, doc_id, _score, rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY _score DESC, doc_id ASC) AS rank
              FROM sc
            ) WHERE rank <= 10
        """,
        "sessionize": """
            WITH f AS (
              SELECT event_id, user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS ts_e
              FROM events
            ), marked AS (
              SELECT user_id, event_id, ts_e,
                     CASE WHEN lag(ts_e) OVER w IS NULL
                               OR ts_e - lag(ts_e) OVER w > 21600
                          THEN 1 ELSE 0 END AS is_new
              FROM f
              WINDOW w AS (PARTITION BY user_id ORDER BY ts_e, event_id)
            ), sess AS (
              SELECT user_id, ts_e,
                     CAST(sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts_e, event_id
                       ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
              FROM marked
            )
            SELECT user_id, session_idx,
                   count(*) AS n_events,
                   min(ts_e) AS session_start,
                   max(ts_e) AS session_end,
                   max(ts_e) - min(ts_e) AS duration
            FROM sess GROUP BY 1, 2
        """,
        "join_asof": """
            WITH facts AS (
              SELECT event_id, user_id,
                     CAST(floor(epoch(ts)) AS BIGINT) AS ts_e
              FROM events
            ), users AS (SELECT DISTINCT user_id FROM events),
            dim AS (
              SELECT user_id,
                     1704067200 + k * 777600 + (user_id % 24) * 3600 AS eff_ts,
                     CASE k WHEN 0 THEN 'bronze' WHEN 1 THEN 'silver'
                            ELSE 'gold' END AS tier
              FROM users CROSS JOIN (SELECT unnest([0, 1, 2]) AS k) ks
            )
            SELECT f.event_id, f.user_id, f.ts_e, d.tier
            FROM facts f ASOF LEFT JOIN dim d
              ON f.user_id = d.user_id AND f.ts_e >= d.eff_ts
        """,
        "corpus_stats": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(str_split_regex(trim(lower(text)), '\s+'),
                                 x -> len(x) > 0) AS w
              FROM documents
            ), per AS (
              SELECT doc_id, len(w) AS n_tokens FROM t
            ), v AS (
              SELECT count(DISTINCT x) AS vocab_size
              FROM (SELECT unnest(w) AS x FROM t) WHERE len(x) > 0
            )
            SELECT count(*) AS n_docs,
                   -- DuckDB sum() yields HUGEINT; pin to BIGINT so the
                   -- driver's pandas canonicalizer sees int64, not float64
                   -- (the pack_sequences r3 lesson)
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   round(avg(n_tokens), 6) AS mean_tokens,
                   min(n_tokens) AS min_tokens,
                   round(quantile_cont(n_tokens, 0.25), 6) AS p25_tokens,
                   round(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
                   round(quantile_cont(n_tokens, 0.75), 6) AS p75_tokens,
                   max(n_tokens) AS max_tokens,
                   (SELECT vocab_size FROM v) AS vocab_size,
                   round((SELECT vocab_size FROM v) / sum(n_tokens)::DOUBLE, 6)
                     AS type_token_ratio
            FROM per
        """,
        # curation funnel: per-doc flags (first occurrence per exact text,
        # C4 page keep, Gopher keep on rounded features) → cumulative
        # conditional counts, restating the text_c4 / text_gopher oracle
        # fragments as row-level booleans
        "curation_funnel": r"""
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0
            ), rich AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0
                          THEN text || '. ' || text || '! ' || text || '?'
                          ELSE text END AS text
              FROM aug
            ), l AS (
              SELECT doc_id, text,
                     (doc_id = min(doc_id) OVER (PARTITION BY text)) AS first,
                     [trim(x) for x in string_split(text, chr(10))
                      if trim(x) <> ''] AS lines,
                     list_filter(str_split_regex(trim(text), '\s+'),
                                 x -> len(x) > 0) AS words,
                     str_split_regex(lower(trim(text)), '\W+') AS lw
              FROM rich
            ), c AS (
              SELECT doc_id, text, first, lines, words, lw,
                     coalesce(array_to_string(
                       [x for x in lines
                        if regexp_matches(x, '[.!?"”]$')
                           and len([w for w in regexp_split_to_array(x, '\s+')
                                    if len(w) > 0]) >= 5
                           and not regexp_matches(lower(x), '\bjavascript\b')
                       ], chr(10)), '') AS clean_text
              FROM l
            ), g AS (
              SELECT doc_id, first,
                     (len([s for s in regexp_split_to_array(clean_text, '[.!?]')
                           if trim(s) <> '']) >= 3
                      AND lower(text) NOT LIKE '%lorem ipsum%'
                      AND text NOT LIKE '%{%') AS c4,
                     (len(words) BETWEEN 50 AND 100000)
                     AND (round(coalesce(list_sum(list_transform(words,
                              x -> len(x)::DOUBLE)), 0)
                          / greatest(len(words), 1), 6) BETWEEN 3.0 AND 10.0)
                     AND (round(((len(text) - len(regexp_replace(text, '#', '', 'g')))
                           + (len(str_split_regex(text, '\.\.\.')) - 1))
                          / greatest(len(words), 1)::DOUBLE, 6) <= 0.1)
                     AND (round(len(list_filter(lines,
                              x -> regexp_matches(x, '^([\-\*•])')))
                          / greatest(len(lines), 1)::DOUBLE, 6) <= 0.9)
                     AND (round(len(list_filter(lines,
                              x -> regexp_matches(x, '\.\.\.$')))
                          / greatest(len(lines), 1)::DOUBLE, 6) <= 0.3)
                     AND (len(list_filter(lw, x -> list_contains(
                          ['the','be','to','of','and','that','have','with'], x)))
                          >= 2) AS gopher
              FROM c
            )
            SELECT 0 AS stage_idx, 'input' AS stage, count(*) AS n_docs FROM g
            UNION ALL
            SELECT 1, 'after_exact_dedup', count(*) FILTER (first) FROM g
            UNION ALL
            SELECT 2, 'after_c4', count(*) FILTER (first AND c4) FROM g
            UNION ALL
            SELECT 3, 'curated', count(*) FILTER (first AND c4 AND gopher) FROM g
        """,
        # exact-quota stratified sample: same Lehmer-pair mix as
        # mixture_plan's realization rule (sample_mix_cols), rank within
        # source, keep rank <= 10. The oracle ranks the FULL stratum —
        # equal to the guarded Spark path because the viral-stratum
        # pre-filter is lossless (and not even triggered at oracle scale).
        "stratified_sample": """
            SELECT doc_id, stratum, sample_rank FROM (
              SELECT doc_id, source AS stratum,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY
                         ((2147483629 *
                            ((doc_id % 2147483647 + 1) * 48271 % 2147483647)
                           + (doc_id % 2147483629 + 1) * 16807 % 2147483629)
                          % 2147483647 + 1) * 48271 % 2147483647,
                         (doc_id % 2147483647 + 1) * 48271 % 2147483647,
                         (doc_id % 2147483629 + 1) * 16807 % 2147483629,
                         doc_id
                     ) AS sample_rank
              FROM documents
            ) WHERE sample_rank <= 10
        """,
        # rows-only (non-SQL-expressible): text_fingerprint (xxhash64 has no
        # DuckDB equivalent), pipeline_* (input is
        # the generated transcripts table, not a registered view)
    }
