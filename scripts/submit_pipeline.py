"""spark-submit entrypoint for the transcripts pipeline (north-rule shape:
``spark-submit --py-files quickwit_spark.zip scripts/submit_pipeline.py``).

On a cluster the session comes from the submitter (master/executors set by
spark-submit); locally it falls back to local[*]. The job is the same
checkpointed chunked runner the tests drive — resumable, exactly-once.

Usage:
    spark-submit --py-files <(zip of quickwit_spark) scripts/submit_pipeline.py \
        --input /path/in --output /path/out --chunks 4 [--json-metrics PATH]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir with transcripts.parquet + tenants.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--chunks", type=int, default=1)
    ap.add_argument("--partition-expr", default="tenant_id")
    ap.add_argument("--max-num-partitions", type=int, default=200)
    ap.add_argument("--json-metrics", default=None, help="write run metrics JSON here")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("quickwit_spark_pipeline")
    # spark-submit provides master/executors; standalone runs fall back
    if "--master" not in " ".join(sys.argv) and not SparkSession.getActiveSession():
        builder = builder.config("spark.sql.session.timeZone", "UTC")
    spark = builder.getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from quickwit_spark.pipeline.runner import PipelineConfig, run_pipeline

    cfg = PipelineConfig(
        partition_expr=args.partition_expr,
        max_num_partitions=args.max_num_partitions,
    )
    results = run_pipeline(spark, args.input, args.output, cfg, num_chunks=args.chunks)
    total = sum(m["num_valid"] for m in results)
    out = {
        "chunks_committed": [m["commit_id"] for m in results],
        "num_valid": total,
        "turns_per_sec": round(
            sum(m["num_valid"] for m in results)
            / max(sum(m["elapsed_sec"] for m in results), 1e-9),
            1,
        ),
    }
    print(json.dumps(out))
    if args.json_metrics:
        with open(args.json_metrics, "w") as fh:
            json.dump(out, fh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
