"""Physical-plan regression tests: the shapes that matter at 100 TB must not
silently regress (PLANS.md holds the human-readable audit)."""

import os

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def test_query_filters_push_to_parquet_scan(spark, events):
    from quickwit_spark.operators.query import QueryCompiler

    qc = QueryCompiler({"event_type": "raw", "value": "numeric"})
    p = plan_of(qc.where(events, "event_type:error AND value:>=5").select("event_id"))
    assert "PushedFilters: [" in p
    assert "EqualTo(event_type,error)" in p
    assert "GreaterThanOrEqual(value,5.0)" in p
    # column pruning: a 1-column projection reads only what it needs
    assert "ReadSchema: struct<event_id:bigint" in p


def test_exact_embedding_pairs_has_no_join_node(spark, sf_dir):
    from quickwit_spark.operators.similarity import embedding_exact_pairs_blocked

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    p = plan_of(embedding_exact_pairs_blocked(emb, 0.4, num_blocks=8))
    assert "FlatMapGroupsInPandas" in p  # one BLAS matmul per tile
    assert "Join" not in p  # the O(n²) grid is NOT a self-join
    assert p.count("Exchange") == 1  # exactly one shuffle (on the tile key)


def test_lsh_near_dup_plan_is_bucketed(spark, sf_dir):
    from quickwit_spark.operators.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    p = plan_of(embedding_near_dup_pairs(emb, 0.95, bits=10, tables=4))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # r6: the vectorized bucketizer runs once inside the eager checkpoint
    # (no ArrowEvalPython left in the serving plan) and the exact-cosine
    # verify is fused into the ONE bucket equi-join — no candidate distinct
    # followed by re-fetch joins
    assert p.count("Join") == 1
    assert "zip_with" in p  # exact-cosine verify inline in the bucket join


def test_topk_uses_take_ordered(spark, events):
    from quickwit_spark.operators.sorts import paginate, top_k

    p = plan_of(top_k(events, [("value", True)], 10))
    assert "TakeOrderedAndProject" in p
    # from/size slices over the TakeOrdered result, not a global window sort
    p2 = plan_of(paginate(events, [("value", True)], 10, 10))
    assert "TakeOrderedAndProject" in p2


def test_nested_agg_is_one_groupby_per_level(spark, events):
    """date_histogram > terms compiles to exactly two aggregate jobs: the
    interpreter must never re-filter per bucket."""
    from quickwit_spark.operators import aggs as A

    sc = spark.sparkContext
    sc.setJobGroup("nested-agg-probe", "count jobs", True)
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup("nested-agg-probe"))
    A.run_es_aggs(
        events,
        {
            "hist": {
                "date_histogram": {"field": "ts", "fixed_interval": "7d"},
                "aggs": {"kinds": {"terms": {"field": "event_type"}}},
            }
        },
    )
    after = len(tracker.getJobIdsForGroup("nested-agg-probe"))
    sc.setJobGroup("default", "", False)
    # 2 aggregate levels × ≤3 jobs each under AQE — the invariant is that the
    # count is CONSTANT in the number of buckets (the old per-bucket recursion
    # fired one query per parent bucket: 30+ jobs on a month of data)
    assert after - before <= 6


def test_terms_with_other_is_single_job_no_global_window(spark, events):
    """terms_with_other runs ONE Spark job (mapInPandas partial top-k +
    driver merge) and its plan has no global-window exchange-to-one."""
    from quickwit_spark.operators.aggs import terms_with_other

    sc = spark.sparkContext
    sc.setJobGroup("two-probe", "count jobs", True)
    tracker = sc.statusTracker()
    before = len(tracker.getJobIdsForGroup("two-probe"))
    buckets, other, err = terms_with_other(events, "event_type", size=2)
    after = len(tracker.getJobIdsForGroup("two-probe"))
    sc.setJobGroup("default", "", False)
    rows = buckets.collect()
    total = events.filter(events.event_type.isNotNull()).count()
    assert other == total - sum(r["doc_count"] for r in rows) and err == 0
    # 1 action (+ tiny createDataFrame collect) — ≤3 under AQE; the old
    # version ran 3 full scans of the input
    assert after - before <= 3


def test_bigram_lm_model_join_is_broadcast(spark, sf_dir):
    """The LM model (small aggregate) must broadcast to the scoring pass —
    a sort-merge join on the exploded corpus would shuffle the whole
    bigram stream twice."""
    from quickwit_spark.operators.corpus import bigram_lm_scores

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    p = plan_of(bigram_lm_scores(docs))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_dedup_substrings_single_window_shuffle(spark, sf_dir):
    """r6 shape: first-occurrence ranking is a map-side-combinable
    min(struct(id,pos)) aggregation on the span key — no Sort, no Window
    (row_number) pass, no cartesian; per-doc totals join back on the doc
    id only (two doc-sized aggregates)."""
    from quickwit_spark.operators.dedup import dedup_substrings

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    p = plan_of(dedup_substrings(docs, window=8))
    assert "Window" not in p  # the old row_number rank pass is gone
    assert "CartesianProduct" not in p
    assert p.count("Join") == 1  # only the doc-keyed totals join
    # span rows cross the wire once (min-struct agg), doc totals twice
    assert p.count("Exchange") <= 4


def test_semantic_dedup_no_join(spark, sf_dir):
    """Codebook assignment is a vectorized UDF (no join); pruning is one
    grouped-map over cluster cells — the whole plan has a single shuffle."""
    import numpy as np

    from quickwit_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )
    cents = np.stack([r["embedding"] for r in emb.limit(4).collect()])
    out = semantic_dedup(emb, cents, threshold=0.95)
    p = plan_of(out)
    assert "Join" not in p
    # the assigned frame (codebook matmul) is localCheckpointed once by the
    # cluster-size census, so the output plan reads the checkpoint back
    # (ExistingRDD) instead of re-running the ArrowEvalPython UDF — the
    # matmul appears exactly once across census + prune
    assert "ExistingRDD" in p
    assert "ArrowEvalPython" not in p  # assignment NOT recomputed
    assert "FlatMapGroupsInPandas" in p  # per-cluster prune
    assert p.count("Exchange") == 1


def test_wildcard_regex_prefix_guard_pushes_to_scan(spark, events):
    """Zonemap-style pruning for pattern queries on raw fields: the literal
    prefix of a wildcard/regex becomes a StringStartsWith conjunct in
    PushedFilters (parquet min/max prunable); results must equal the
    unguarded regex."""
    from quickwit_spark.operators.query import QueryCompiler

    qc = QueryCompiler({"event_type": "raw"})
    wc = qc.where(events, "event_type:err*")
    p = plan_of(wc.select("event_id"))
    assert "StringStartsWith(event_type,err)" in p

    rx = qc.where(events, "event_type:/err.*/")
    p2 = plan_of(rx.select("event_id"))
    assert "StringStartsWith(event_type,err)" in p2

    # guard must not change results
    base = events.filter(F.col("event_type").rlike("^(?:err.*)$")).count()
    assert rx.count() == base
    assert wc.count() == base

    # no guard when none can be sound
    from quickwit_spark.operators.query import (
        _regex_literal_prefix,
        _wildcard_literal_prefix,
    )

    assert _regex_literal_prefix("abc|xyz") == ""
    assert _regex_literal_prefix("[ae]rr") == ""
    assert _regex_literal_prefix("er+or") == "e"
    assert _regex_literal_prefix(r"a\.b.*") == "a.b"
    assert _wildcard_literal_prefix("e?r*") == "e"
    assert _wildcard_literal_prefix(r"a\*b*") == "a*b"


def test_dsir_hashed_plan_is_broadcast_and_jvm_only(spark, sf_dir):
    from quickwit_spark.operators.corpus import dsir_weights

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    p = plan_of(
        dsir_weights(docs, num_buckets=4096, target_filter=F.col("lang") == "en")
    )
    # the log-ratio table (≤B rows) broadcasts onto the exploded features
    assert "BroadcastHashJoin" in p
    # target_filter mode: ONE histogram pass with conditional counts — no
    # full-outer join of two per-corpus histograms
    assert "FullOuter" not in p
    # unigram+bigram featurization is split/slice/zip_with — no Python
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # per-doc sum is a hash aggregate with a map-side partial
    assert "HashAggregate" in p


def test_vrl_transform_is_single_codegen_stage(spark, events):
    """The whole VRL step DSL (set_expr + grok + where-guard + default +
    parse_timestamp) compiles to ONE narrow whole-stage-codegen projection:
    no shuffle, no Python eval, filters/columns still prunable. At 100 TB
    the transform layer adds zero extra stages to the scan."""
    from quickwit_spark.operators.transforms import apply_transforms

    steps = [
        {"op": "set_expr", "field": "line", "expr": (
            "concat('10.0.', cast(user_id % 256 as string), '.1 - frank "
            "[10/Oct/2024:13:55:36 +0000] \"GET /', event_type, "
            "' HTTP/1.1\" ', cast(200 + (event_id % 5) as string), ' 17')"
        )},
        {"op": "grok", "field": "line", "preset": "apache_common",
         "groups": {"status": "long"}},
        {"op": "uppercase", "field": "path", "where": "status >= 203"},
        {"op": "default", "field": "tool", "value": "none"},
        {"op": "set_expr", "field": "ts_str",
         "expr": "date_format(ts, 'yyyy-MM-dd HH:mm:ss')"},
        {"op": "parse_timestamp", "field": "ts_str", "to": "parsed",
         "format": "yyyy-MM-dd HH:mm:ss"},
    ]
    out = apply_transforms(events, steps).select(
        "event_id", "client_ip", "path", "status", "parsed"
    )
    p = plan_of(out)
    assert "Exchange" not in p, "VRL layer must not shuffle"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, (
        "VRL layer must stay JVM-side"
    )
    # codegen marker is `*(n)` in the simple plan string
    assert "*(1) Project" in p or "WholeStageCodegen" in p
    # one stage total: the whole layer fused into stage 1
    assert "*(2)" not in p
    # and it executes: grok round-trips the synthesized line
    row = out.orderBy("event_id").first()
    assert row.client_ip.startswith("10.0.") and row.path.startswith("/")


def test_chunk_sliding_zero_shuffle(spark, sf_dir):
    """Sliding-window chunking must be pure codegen in the scan's own stage:
    tokenize → size → posexplode(sequence) → slice/array_join with ZERO
    shuffles and zero Python. At 100 TB chunking adds no stage boundary —
    output volume (the constant overlap factor) is the only cost."""
    from quickwit_spark.operators.corpus import chunk_sliding

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    p = plan_of(chunk_sliding(docs, chunk_tokens=32, overlap=8))
    assert "Exchange" not in p, "chunking must not shuffle"
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Generate" in p  # the posexplode


def test_more_like_this_joins_are_broadcast(spark, sf_dir):
    """MLT's two corpus scans must both kill non-candidate tokens via a
    BROADCAST join against the (tiny) seed-term set before any shuffle —
    the corpus-sized explode output must never hash-partition on term."""
    from quickwit_spark.operators.scoring import more_like_this

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    p = plan_of(more_like_this(docs, [7], max_query_terms=10, k=10))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p, "corpus tokens must not sort-merge join"


def test_field_collapse_single_window_exchange(spark, sf_dir):
    """Field collapse = one hash-partitioned window on the collapse key;
    the page of top-k groups broadcasts back as a semi-join. No global
    sort of the full hit list."""
    from quickwit_spark.operators.sorts import field_collapse

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    p = plan_of(
        field_collapse(ev, "user_id", [("value", True)], k=20, inner_hits=2,
                       tiebreak="event_id")
    )
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    # the full corpus is exchanged exactly once (window partitioning); the
    # tiny page side may add its own small exchanges but no sort-merge join
    assert "SortMergeJoin" not in p
