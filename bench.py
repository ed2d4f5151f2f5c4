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


R3_COMMIT = "ff042cc"  # round-3 bench commit (recorded pipeline_e2e 1.53 s)
R3_RECORDED_PIPE_SEC = 1.53

_AB_SCRIPT = r"""
import json, os, sys, time
worktree, cache, cpus = sys.argv[1], sys.argv[2], int(sys.argv[3])
sys.path.insert(0, worktree)
from quickwit_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app_name="r3_ab", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
from quickwit_spark.pipeline.runner import PipelineConfig, build_dag
t = spark.read.parquet(os.path.join(cache, "transcripts.parquet"))
d = spark.read.parquet(os.path.join(cache, "tenants.parquet"))
def one():
    t0 = time.time()
    routed = build_dag(t, d, PipelineConfig())
    agg = (routed.filter(F.col("_error_category") == "valid")
        .groupBy("sink", F.window(F.col("ts").cast("timestamp"),
                                  "1 day").start.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("doc_count"),
             F.approx_count_distinct("tenant_id").alias("tenant_card"),
             F.avg("latency_ms").alias("avg_latency")))
    agg._jdf.queryExecution().executedPlan().executeCollect().length
    return time.time() - t0
one()  # warm
samples = [one() for _ in range(5)]
print(json.dumps({"samples": [round(s, 3) for s in samples],
                  "min": round(min(samples), 3)}))
"""


def _r3_pipeline_ab(head_pipe_sec: float) -> dict | None:
    """Same-artifact interference control (VERDICT r4 item 1): when the
    HEAD pipeline measures >25% over the r3-recorded 1.53 s, time the
    UNTOUCHED r3-commit pipeline code (git worktree of R3_COMMIT) in a
    fresh subprocess on the same cached input, same harness, same minute.
    r3 code measuring ≈ HEAD under contemporary load proves the paper
    regression is host environment, not a code change."""
    import subprocess
    import tempfile

    if os.environ.get("QS_BENCH_NO_AB"):
        return None
    repo = os.path.dirname(os.path.abspath(__file__))
    wt = "/tmp/qs_r3_ab_worktree"
    try:
        if not os.path.isdir(os.path.join(wt, "quickwit_spark")):
            subprocess.run(
                ["git", "worktree", "add", "--detach", "-f", wt, R3_COMMIT],
                cwd=repo, check=True, capture_output=True, timeout=60,
            )
        with tempfile.NamedTemporaryFile(
            "w", suffix=".py", delete=False
        ) as fh:
            fh.write(_AB_SCRIPT)
            script = fh.name
        out = subprocess.run(
            [sys.executable, script, wt, PIPE_CACHE, str(CPUS)],
            capture_output=True, text=True, timeout=900, cwd=wt,
        )
        line = out.stdout.strip().splitlines()[-1]
        r3 = json.loads(line)
        return {
            "r3_commit": R3_COMMIT,
            "r3_recorded_sec": R3_RECORDED_PIPE_SEC,
            "r3_code_now_sec": r3["min"],
            "r3_code_now_samples": r3["samples"],
            "head_now_sec": round(head_pipe_sec, 3),
            "head_vs_r3_code_now": round(head_pipe_sec / r3["min"], 3),
        }
    except Exception as e:  # never fail the bench artifact over the control
        return {"error": f"{type(e).__name__}: {e}"}


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

    # per-query raw evidence embedded in the output JSON: every sample, the
    # calibration-probe time taken right after it (the steal metric — a hot
    # probe means that sample's window was contaminated by external load),
    # and whether the reported min came from a clean window.
    detail: dict[str, dict] = {}

    for name in HEADLINE:
        fn = qs[name]
        samples: list[float] = []
        probes: list[float] = []
        clean_flags: list[bool] = []
        slept = False
        i = 0
        while i < (8 if slept else 6):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.count()
            samples.append(time.time() - t0)
            p = probe()
            probes.append(p)
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
        best = min(range(len(samples)), key=samples.__getitem__)
        timings[name] = round(samples[best], 3)
        detail[name] = {
            "samples": [round(s, 3) for s in samples],
            "probes": [round(p, 3) for p in probes],
            "min_sample_clean_window": clean_flags[best],
        }

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
    pipe_probes: list[float] = []
    slept = False
    i = 0
    while i < (8 if slept else 6):
        pipe_samples.append(pipeline_pass())
        p = probe()
        pipe_probes.append(p)
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
    detail["pipeline_e2e"] = {
        "samples": [round(s, 3) for s in pipe_samples],
        "probes": [round(p, 3) for p in pipe_probes],
        "min_sample_clean_window": pipe_probes[
            min(range(len(pipe_samples)), key=pipe_samples.__getitem__)
        ]
        <= probe_best * 1.5,
    }

    r3_ab = (
        _r3_pipeline_ab(pipe_sec)
        if pipe_sec > R3_RECORDED_PIPE_SEC * 1.25
        else None
    )

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
                # steal/contention evidence: `probe_best_sec` is the fastest
                # observed time of a fixed JVM-only calibration job; each
                # query's `probes` entry is that job's time right after each
                # sample. probe >> probe_best ⇒ the host was externally
                # loaded during that sample window, so compare mins, and
                # trust `min_sample_clean_window`.
                "probe_best_sec": round(probe_best, 3),
                "detail": detail,
                # present only when the pipeline measured >25% over the
                # r3-recorded number: the r3 commit's own code timed in the
                # same run (see _r3_pipeline_ab)
                **({"r3_ab": r3_ab} if r3_ab else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
