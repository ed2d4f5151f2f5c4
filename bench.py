"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Also times the transcripts pipeline end-to-end (parse→enrich→route→aggregate
over a cached deterministic 2M-turn table) and reports its turns/sec —
the BASELINE.md headline metric. Scaling (N vs 4N cores) is measured by
scripts/scaling_bench.py which writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
PIPE_TURNS = int(os.environ.get("QS_BENCH_TURNS", 8_000_000))
PIPE_CACHE = f"/tmp/quickwit_spark_bench_transcripts_{PIPE_TURNS}"

HEADLINE = [
    "agg_date_histogram",
    "agg_terms_event_type",
    "agg_multi_terms",
    "agg_cardinality_exact",
    "agg_percentiles_value",
    "agg_top_hits",
    "q_bool",
    "q_phrase",
    "q_json_extract",
    "sort_topk",
    "join_broadcast_enrich",
    "join_semi_two_phase",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_clusters",
    "dedup_substrings",
    "semantic_dedup",
    "bigram_lm",
    "ann_topk",
    "ann_pq",
    "q_score_bm25",
    "text_quality",
    "text_langid",
    "multimodal_text_extract",
    "text_fingerprint",
    "dsir_weights_hashed",
    "curation_funnel",
]


def _force(df) -> int:
    """Trigger full execution without driver-side materialization cost."""
    return df._jdf.queryExecution().executedPlan().executeCollect().length


def main() -> None:
    from quickwit_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name="quickwit_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )

    qs = entry_mod.queries()
    timings: dict[str, float] = {}

    # warm the JVM codegen and the Python UDF workers (imports + Arrow serde
    # are per-worker one-time costs; steady-state throughput is the metric)
    from quickwit_spark.pipeline.stages import routing_hash_col

    spark.range(1_000_000).withColumn(
        "x", routing_hash_col("tenant_id", ["id"])
    ).agg(F.max("x")).collect()

    # this sandbox has bursty multi-minute external-interference windows
    # (host-level contention, invisible in steal%). Two defenses:
    #   1. a fixed CALIBRATION PROBE (tiny JVM-only job with a known
    #      steady-state cost) timed after every sample — a hot probe means
    #      the window was contaminated, so agreement between two slow
    #      samples must NOT end the loop;
    #   2. adaptive re-measure: keep sampling (≤6) until the best sample
    #      was taken in a clean window and a second lands within 1.4× of it.
    def probe() -> float:
        t0 = time.time()
        spark.range(50_000_000).agg(F.sum("id")).collect()
        return time.time() - t0

    probe_best = min(probe() for _ in range(3))
    # interference windows run for MINUTES; six back-to-back samples can all
    # land inside one. When the probe says the window is hot and the query is
    # expensive enough to matter, wait it out — bounded by a global budget so
    # total runtime stays predictable.
    hot_sleep_budget = 120.0

    for name in HEADLINE:
        fn = qs[name]
        samples: list[float] = []
        clean_flags: list[bool] = []
        slept = False
        i = 0
        while i < (8 if slept else 6):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.count()
            samples.append(time.time() - t0)
            p = probe()
            probe_best = min(probe_best, p)
            hot = p > probe_best * 1.5
            clean_flags.append(not hot)
            if i >= 1:
                lo = sorted(range(len(samples)), key=samples.__getitem__)[:2]
                agree = samples[lo[1]] <= samples[lo[0]] * 1.4
                if agree and clean_flags[lo[0]]:
                    break
            if hot and min(samples) > 0.8 and hot_sleep_budget >= 20.0:
                time.sleep(20.0)
                hot_sleep_budget -= 20.0
                slept = True
            i += 1
        timings[name] = round(min(samples), 3)

    # transcripts pipeline end-to-end (no sink write: DAG + per-sink aggregate)
    from quickwit_spark.pipeline.runner import PipelineConfig, build_dag
    from quickwit_spark.pipeline.transcripts import materialize

    materialize(PIPE_TURNS, PIPE_CACHE, seed=42, num_files=CPUS)
    t = spark.read.parquet(os.path.join(PIPE_CACHE, "transcripts.parquet"))
    d = spark.read.parquet(os.path.join(PIPE_CACHE, "tenants.parquet"))
    n_turns = t.count()

    def pipeline_pass() -> float:
        t0 = time.time()
        routed = build_dag(t, d, PipelineConfig())
        agg = (
            routed.filter(F.col("_error_category") == "valid")
            .groupBy(
                "sink", F.window(F.col("ts").cast("timestamp"), "1 day").start.alias("bucket")
            )
            .agg(
                F.count(F.lit(1)).alias("doc_count"),
                F.approx_count_distinct("tenant_id").alias("tenant_card"),
                F.avg("latency_ms").alias("avg_latency"),
            )
        )
        _force(agg)
        return time.time() - t0

    pipeline_pass()  # warm pass (page cache, codegen, python workers)
    # this host has bursty multi-second interference windows (external load
    # with ~0 local steal%); min over 6 fresh-plan passes rides them out,
    # with the same bounded hot-window wait as the query loop
    pipe_samples: list[float] = []
    slept = False
    i = 0
    while i < (8 if slept else 6):
        pipe_samples.append(pipeline_pass())
        p = probe()
        probe_best = min(probe_best, p)
        if (
            p > probe_best * 1.5
            and min(pipe_samples) > 0.8
            and hot_sleep_budget >= 20.0
        ):
            time.sleep(20.0)
            hot_sleep_budget -= 20.0
            slept = True
        i += 1
    pipe_sec = min(pipe_samples)
    timings["pipeline_e2e"] = round(pipe_sec, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query suite + 8M-turn parse-enrich-route-aggregate pipeline",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "pipeline_turns_per_sec": round(n_turns / pipe_sec, 1),
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
