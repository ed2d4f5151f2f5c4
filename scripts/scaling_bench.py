"""Scaling-efficiency bench (north rule): run the identical
parse→enrich→route→aggregate pipeline on the same input at two parallelism
levels — local[8] (N) and local[32] (4N), the sandbox stand-in for N vs 4N
executors — and report throughput at both plus scaling efficiency
``(T_4N / T_N) / 4``. Writes BENCH/BASELINE.md.

Each level runs in its own subprocess (fresh JVM — no cross-contamination of
codegen caches or shuffle files).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_TURNS = int(os.environ.get("QS_SCALE_TURNS", 4_000_000))
CACHE = f"/tmp/quickwit_spark_scale_transcripts_{N_TURNS}"

_WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "__REPO__")
from quickwit_spark.session import get_spark
from quickwit_spark.pipeline.runner import PipelineConfig, build_dag
from quickwit_spark.pipeline.stages import routing_hash_col
from pyspark.sql import functions as F

cpus = int(sys.argv[1])
cache = sys.argv[2]
spark = get_spark(app_name=f"scale_{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
t = spark.read.parquet(os.path.join(cache, "transcripts.parquet"))
d = spark.read.parquet(os.path.join(cache, "tenants.parquet"))
n = t.count()

def force(df):
    return df._jdf.queryExecution().executedPlan().executeCollect().length

def one_pass():
    t0 = time.time()
    routed = build_dag(t, d, PipelineConfig())
    agg = (routed.filter(F.col("_error_category") == "valid")
        .groupBy("sink", F.window(F.col("ts").cast("timestamp"), "1 day").start.alias("b"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.approx_count_distinct("tenant_id").alias("c"),
             F.avg("latency_ms").alias("a")))
    force(agg)
    return time.time() - t0

# warm: codegen + python workers + page cache
spark.range(1_000_000).withColumn("x", routing_hash_col("tenant_id", ["id"])).agg(F.max("x")).collect()
one_pass()
secs = min(one_pass(), one_pass())
print(json.dumps({"cpus": cpus, "turns": n, "sec": secs, "turns_per_sec": n / secs}))
"""


def run_level(cpus: int) -> dict:
    code = _WORKER.replace("__REPO__", REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), CACHE],
        capture_output=True, text=True, timeout=1800,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sys.path.insert(0, REPO)
    from quickwit_spark.pipeline.transcripts import materialize

    materialize(N_TURNS, CACHE, seed=42, num_files=32)
    n_res = run_level(8)
    n4_res = run_level(32)
    eff = (n4_res["turns_per_sec"] / n_res["turns_per_sec"]) / 4.0
    result = {
        "turns": n_res["turns"],
        "N_cpus": 8,
        "N_turns_per_sec": round(n_res["turns_per_sec"], 1),
        "N_sec": round(n_res["sec"], 3),
        "4N_cpus": 32,
        "4N_turns_per_sec": round(n4_res["turns_per_sec"], 1),
        "4N_sec": round(n4_res["sec"], 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    md = f"""# BENCH/BASELINE — measured pipeline throughput & scaling

Pipeline: parse → broadcast-enrich → SipHash-route → per-sink
date-bucket/cardinality/avg aggregate, end-to-end over the deterministic
{result['turns']:,}-turn transcripts table (seed 42). Steady-state timing
(best of 2 after a warm pass) in a fresh JVM per parallelism level.
`local[8]` vs `local[32]` stands in for N vs 4N executors (sandbox has no
real cluster; see BASELINE.md).

| parallelism | wall sec | turns/sec |
|---|---|---|
| N = local[8] | {result['N_sec']} | {result['N_turns_per_sec']:,} |
| 4N = local[32] | {result['4N_sec']} | {result['4N_turns_per_sec']:,} |

**Scaling efficiency (T_4N / T_N) / 4 = {result['scaling_efficiency']}**
(north-rule acceptance: ≥ 0.8).

Reference anchor (BASELINE.md): Quickwit single-pipeline ingest target is
100 MB/s. At ~85 bytes/turn, 4N throughput ≈
{result['4N_turns_per_sec'] * 85 / 1e6:.0f} MB/s of raw text parsed, routed,
and aggregated.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
