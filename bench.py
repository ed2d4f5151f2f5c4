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
    # r5 session-5: index-served BM25 (first sample pays the one-time index
    # build; min-of-N is the serve time — contrast with q_score_bm25's scan)
    # and the zero-shuffle stored-query percolator.
    "index_bm25",
    "percolate_match",
]


def _force(df) -> int:
    """Trigger full execution without driver-side materialization cost."""
    return df._jdf.queryExecution().executedPlan().executeCollect().length


R3_COMMIT = "ff042cc"  # round-3 bench commit (recorded pipeline_e2e 1.53 s)
R3_RECORDED_PIPE_SEC = 1.53

_AB_SCRIPT = r"""
import json, os, sys, time
worktree, cache, cpus, n = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
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
samples = [one() for _ in range(n)]
print(json.dumps({"samples": [round(s, 3) for s in samples],
                  "min": round(min(samples), 3)}))
"""


def _r3_pipeline_ab(head_pipe_sec: float, probe, probe_best) -> dict | None:
    """Same-artifact interference control (VERDICT r4 item 1): when the
    HEAD pipeline measures >25% over the r3-recorded 1.53 s, run a
    SYMMETRIC paired A/B — alternating fresh subprocesses of the untouched
    r3-commit code (git worktree of R3_COMMIT) and of HEAD, same script,
    same cached input, same warmup discipline (one warm pass + n timed
    passes in a cold JVM), each pair gated on a clean calibration probe so
    both sides share the same host window. Symmetry matters: the resident
    bench JVM is JIT/page-cache warm, a fresh one is not, and an
    interference burst amplifies cold-JVM passes ~10x — comparing
    fresh-vs-fresh removes that confound. HEAD ≤ r3-code within pairs
    proves any paper regression vs the recorded r3 number is host
    environment, not a code change."""
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

        def cold_run(tree: str) -> dict:
            out = subprocess.run(
                [sys.executable, script, tree, PIPE_CACHE, str(CPUS), "2"],
                capture_output=True, text=True, timeout=900, cwd=tree,
            )
            return json.loads(out.stdout.strip().splitlines()[-1])

        pairs = []
        gate_budget = 240.0
        for i in range(3):
            # wait for a clean window (bounded) so the pair isn't measured
            # inside an interference burst
            while gate_budget >= 20.0 and probe() > probe_best * 1.5:
                time.sleep(20.0)
                gate_budget -= 20.0
            # alternate order within the pair so drift inside a pair can't
            # systematically favor one side
            first, second = (wt, repo) if i % 2 == 0 else (repo, wt)
            a, b = cold_run(first), cold_run(second)
            r3_res, head_res = (a, b) if first == wt else (b, a)
            pairs.append(
                {"r3": r3_res["min"], "head": head_res["min"],
                 "order": "r3_first" if first == wt else "head_first",
                 "probe_after": round(probe(), 3)}
            )
        r3_min = min(p["r3"] for p in pairs)
        head_min = min(p["head"] for p in pairs)
        return {
            "r3_commit": R3_COMMIT,
            "r3_recorded_sec": R3_RECORDED_PIPE_SEC,
            "design": "symmetric cold-JVM pairs (fresh subprocess each side)",
            "pairs": pairs,
            "r3_code_now_sec": r3_min,
            "head_cold_sec": head_min,
            "head_resident_sec": round(head_pipe_sec, 3),
            "head_vs_r3_code_now": round(head_min / r3_min, 3),
            "paired_ratio_best": round(
                min(p["head"] / p["r3"] for p in pairs), 3
            ),
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
    # the probe must be WORKLOAD-REPRESENTATIVE: a pure narrow scan stays
    # fast through bursts that starve shuffle-heavy multi-thread stages 8x
    # (observed: probes 0.1s "clean" while identical dedup samples ran
    # 1.4s→11s). range → hash-aggregate → exchange → final aggregate
    # exercises codegen, all cores, and a real shuffle write+read.
    def probe() -> float:
        t0 = time.time()
        (
            spark.range(20_000_000)
            .groupBy((F.col("id") % 4096).alias("k"))
            .count()
            .agg(F.sum("count"))
            .collect()
        )
        return time.time() - t0

    probe_best = min(probe() for _ in range(3))
    # interference windows run for MINUTES; six back-to-back samples can all
    # land inside one. When the probe says the window is hot and the query is
    # expensive enough to matter, wait it out — bounded by a global budget so
    # total runtime stays predictable.
    hot_sleep_budget = float(os.environ.get("QS_BENCH_HOT_SLEEP", "180"))

    # optional startup gate (QS_BENCH_WAIT_QUIET_SEC): don't begin a
    # multi-minute bench inside an interference burst — poll the probe until
    # it's clean or the budget runs out. Default off (driver behavior
    # unchanged).
    wait_quiet = float(os.environ.get("QS_BENCH_WAIT_QUIET_SEC", "0"))
    while wait_quiet >= 30.0 and probe() > probe_best * 1.5:
        time.sleep(30.0)
        wait_quiet -= 30.0

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
        # PRE-gate each pass: an 8M-turn pass inside a burst wastes 30-80 s
        # and contributes nothing — cheaper to spend the sleep budget first
        if hot_sleep_budget >= 20.0 and probe() > probe_best * 1.5:
            time.sleep(20.0)
            hot_sleep_budget -= 20.0
            slept = True
            continue
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
        _r3_pipeline_ab(pipe_sec, probe, probe_best)
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
