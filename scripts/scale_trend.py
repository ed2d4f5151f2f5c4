"""Scale-trend evidence for the heavy dedup family (VERDICT r4 item 6).

Runs dedup_minhash_lsh, dedup_substrings and semantic_dedup at sf0.1 and at
a synthetic 10x "sf1", recording wall time, shuffle-write bytes and plan
shape into BENCH/SCALE.md. The 100 TB claims for these operators are argued
from plan shape (bounded buckets, one banded shuffle, tiled block pairs);
this script turns that into a measured growth trend: ~linear wall time and
shuffle volume in input size, with the same physical plan at both scales.

The synthetic sf1 is 10 deterministic replicas of sf0.1:
- documents: doc_id += k*10_000_000 and a replica token ``repK`` is
  interleaved after every 4th word. Every >=4-token shingle and every
  8-token window then contains a replica token, so cross-replica Jaccard
  ~ 0 and cross-replica window-dups = 0 — the sf1 corpus behaves like 10
  independent sf0.1 corpora and the TRUE output grows 10x, which is the
  regime the linearity claim is about (10 exact copies would instead grow
  the pair set quadratically by construction, measuring the data, not the
  operator).
- embeddings: vec_id += k*1_000_000 and the vector is np.roll'ed by k
  (norm- and within-replica-geometry-preserving; cross-replica cosines
  drop to noise).

Run SOLO (timings) : python scripts/scale_trend.py
"""

import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = "/tmp/qs_scale_sf1"
QUERIES = ("dedup_minhash_lsh", "dedup_substrings", "semantic_dedup")
PASSES = 2


def build_sf1() -> None:
    """10 deterministic replicas of sf0.1 documents+embeddings (idempotent)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SF1, exist_ok=True)
    dpath = os.path.join(SF1, "documents.parquet")
    if not os.path.exists(dpath):
        t = pq.read_table(os.path.join(SF01, "documents.parquet"))
        reps = []
        for k in range(10):
            ids = pa.array(
                [v + k * 10_000_000 for v in t["doc_id"].to_pylist()], pa.int64()
            )
            texts = []
            for s in t["text"].to_pylist():
                w = s.split(" ")
                out = []
                for i, tok in enumerate(w):
                    out.append(tok)
                    if i % 4 == 3:
                        out.append(f"rep{k}")
                texts.append(" ".join(out))
            reps.append(
                pa.table(
                    {
                        "doc_id": ids,
                        "text": pa.array(texts, pa.string()),
                        "lang": t["lang"].combine_chunks(),
                        "source": t["source"].combine_chunks(),
                        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
                    }
                )
            )
        pq.write_table(pa.concat_tables(reps), dpath)

    epath = os.path.join(SF1, "embeddings.parquet")
    if not os.path.exists(epath):
        t = pq.read_table(os.path.join(SF01, "embeddings.parquet"))
        vecs = np.array(t["embedding"].to_pylist(), dtype=np.float32)
        ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
        reps = []
        for k in range(10):
            reps.append(
                pa.table(
                    {
                        "vec_id": pa.array(ids + k * 1_000_000, pa.int64()),
                        "embedding": pa.array(
                            np.roll(vecs, k, axis=1).tolist(),
                            pa.list_(pa.float32()),
                        ),
                        "label": t["label"].combine_chunks(),
                    }
                )
            )
        pq.write_table(pa.concat_tables(reps), epath)


def _executor_shuffle_bytes(spark) -> int:
    """Cumulative shuffle-write bytes from the local REST API."""
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    base = f"http://localhost:{port}/api/v1/applications"
    apps = json.loads(urllib.request.urlopen(base, timeout=10).read())
    app_id = apps[0]["id"]
    stages = json.loads(
        urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=10).read()
    )
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _plan_shape(df) -> str:
    """Executed-plan node sequence with ids/sizes/exprs stripped — the
    scale-invariant shape of the physical plan. Only the AQE FINAL plan is
    compared (the Initial Plan section restates the pre-adaptive plan and
    would double every node); a remaining difference is therefore either
    real operator drift or AQE join-strategy adaptation (broadcast ↔
    shuffled-hash as the build side crosses the threshold) — the drift
    section below the table shows which."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    lines = []
    for ln in plan.splitlines():
        # the leading char class must also eat the `*(n)` whole-stage-codegen
        # prefix (digits included) or every codegen-fused operator — joins
        # included — silently drops out of the shape
        m = re.match(r"^[\s:+*\-()\d]*([A-Za-z]+)", ln)
        if not m:
            continue
        node = m.group(1)
        if node in ("Arguments", "Input", "Output", "Results", "Condition",
                    "Functions", "Keys", "Aggregate",
                    # AQE runtime wrappers: whether a shuffle read got
                    # coalesced at runtime is a data-size artifact, not a
                    # plan-shape difference
                    "AQEShuffleRead", "ShuffleQueryStage", "ResultQueryStage",
                    "TableCacheQueryStage", "BroadcastQueryStage"):
            continue
        lines.append(node)
    return "\n".join(lines)


def main() -> None:
    build_sf1()
    from quickwit_spark.session import get_spark
    import __spark_entry__ as entry_mod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="scale_trend", master=f"local[{cpus}]", shuffle_partitions=cpus,
        # the session default disables the UI; this script needs the REST
        # API for per-stage shuffle-write bytes
        extra_conf={"spark.ui.enabled": "true"},
    )
    qs = entry_mod.queries()

    results: dict[str, dict] = {}
    plans: dict[str, dict] = {}
    for name in QUERIES:
        fn = qs[name]
        results[name] = {}
        plans[name] = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            best, rows, shuf = None, None, None
            for _ in range(PASSES):
                s0 = _executor_shuffle_bytes(spark)
                t0 = time.time()
                df = fn(spark, sf_dir)
                rows = len(df._jdf.queryExecution().executedPlan().executeCollect())
                dt = time.time() - t0
                s1 = _executor_shuffle_bytes(spark)
                if best is None or dt < best:
                    best, shuf = dt, s1 - s0
                plans[name][label] = _plan_shape(df)
            results[name][label] = {
                "sec": round(best, 3), "rows": rows, "shuffle_mb": round(shuf / 1e6, 2),
            }
            print(f"{name} @{label}: {best:.2f}s rows={rows} shuffle={shuf/1e6:.1f}MB", flush=True)

    lines = [
        "# BENCH/SCALE — heavy-dedup growth trend (sf0.1 → 10x synthetic sf1)",
        "",
        "Generated by scripts/scale_trend.py (run solo). sf1 = 10 deterministic",
        "replicas of sf0.1 with per-replica token interleaving / vector rolls, so",
        "duplicate structure (and the true output) grows 10x — see the script",
        "docstring for why exact replicas would measure the data, not the operator.",
        f"Passes per cell: min of {PASSES}; shuffle bytes from the Spark REST API.",
        "",
        "| query | sf0.1 sec | sf1 sec | time ratio | sf0.1 shuffle MB | sf1 shuffle MB | shuffle ratio | sf0.1 rows | sf1 rows | plan shape |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name in QUERIES:
        a, b = results[name]["sf0.1"], results[name]["sf1"]
        same = "identical" if plans[name]["sf0.1"] == plans[name]["sf1"] else "DIFFERS"
        lines.append(
            f"| {name} | {a['sec']} | {b['sec']} | {b['sec']/a['sec']:.1f}x "
            f"| {a['shuffle_mb']} | {b['shuffle_mb']} | "
            f"{(b['shuffle_mb']/a['shuffle_mb']):.1f}x "
            f"| {a['rows']} | {b['rows']} | {same} |"
        )
    lines += [
        "",
        "Input grows 10.0x. Linear-in-input means time and shuffle ratios land",
        "near ~10x (sub-10x = fixed overheads amortizing; the danger sign would",
        "be >>10x, the quadratic-blowup signature these designs bucket away).",
        "Note for dedup_minhash_lsh: its absolute shuffle is KB-scale at these",
        "SFs (banded signature tuples only — the corpus never shuffles), so its",
        "shuffle ratio is dominated by fixed per-shuffle framing; wall time and",
        "row count are the meaningful columns.",
        "Note for dedup_substrings: the replica-token interleave adds 1 token",
        "per 4 words, so sf1 carries ~12.5x the TOKEN volume of sf0.1 — its",
        "ratios should be read against 12.5x, not 10x (W-token window counts",
        "are linear in tokens, the operator's documented cost shape).",
        "Plan shapes are the AQE FINAL plan after stripping runtime wrappers",
        "(AQEShuffleRead etc.) — runtime partition coalescing is a data-size",
        "artifact, not an operator-plan difference. A residual DIFFERS is",
        "either real operator drift or AQE adapting a join strategy",
        "(broadcast ↔ shuffled-hash as the build side crosses the threshold",
        "with scale — working-as-intended adaptivity); the drift section",
        "shows which nodes changed.",
    ]
    for name in QUERIES:
        if plans[name]["sf0.1"] != plans[name]["sf1"]:
            lines += ["", f"## {name} plan drift", "", "sf0.1:", "```",
                      plans[name]["sf0.1"], "```", "sf1:", "```",
                      plans[name]["sf1"], "```"]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BENCH", "SCALE.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
