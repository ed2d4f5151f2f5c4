"""Per-query measurement harness for the optimization round (guide §1).

NOT the driver contract — bench.py stays frozen. This tool:
  * times any subset of declared queries with the same ``df.count()``
    methodology the frozen bench uses (comparable numbers), or with a
    noop sink (``--noop``) to force every column (guide §1.4);
  * captures ``explain("formatted")`` to plans/r06/<name>_<tag>.txt;
  * labels jobs via setJobDescription (guide §1.5).

Usage:
    python bench_extra.py [--samples N] [--noop] [--explain TAG] q1 q2 ...
    python bench_extra.py --all            # every headline query once
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    samples_n = 3
    noop = False
    explain_tag = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--samples":
            samples_n = int(args[i + 1]); i += 2
        elif a == "--noop":
            noop = True; i += 1
        elif a == "--explain":
            explain_tag = args[i + 1]; i += 2
        elif a == "--all":
            names = ["ALL"]; i += 1
        else:
            names.append(a); i += 1

    from quickwit_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name="bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    qs = entry_mod.queries()
    if names == ["ALL"]:
        import bench as bench_mod
        names = list(bench_mod.HEADLINE)

    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        ts = []
        for s in range(samples_n):
            spark.sparkContext.setJobDescription(f"{name}#{s}")
            t0 = time.time()
            df = fn(spark, SF_DIR)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            ts.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = ts
        if explain_tag:
            os.makedirs("plans/r06", exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(f"plans/r06/{name}_{explain_tag}.txt", "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
        print(json.dumps({name: ts, "min": min(ts)}), flush=True)
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS,
                      "mins": {k: min(v) for k, v in out.items()}}))


if __name__ == "__main__":
    main()
