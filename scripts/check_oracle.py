"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 next to its oracle_sql() in DuckDB; compare row count,
schema width, and an order-insensitive value multiset (columns sorted by
name, floats rounded)."""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main(only: list[str] | None = None, sf_dir: str | None = None):
    """Runs every queries() entry against its oracle; returns the failure
    list (empty = green) so tests/test_oracle_all.py can gate on it.

    Full-registry sweeps (no ``only`` filter) also write
    ``CORRECTNESS_full.json`` at the repo root — the same per-entry
    rows/schema/hash schema as the driver's 50-entry gate, so the round
    artifact itself shows the whole registry, not 50/50 plus a claim."""
    from quickwit_spark.session import get_spark

    import __spark_entry__ as entry_mod

    sf_dir = sf_dir or SF_DIR
    spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            results[name] = {"error": f"spark: {e}"}
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols} ({time.time()-t0:.1f}s)")
            results[name] = {"rows_only": True, "rows": len(srows)}
            if len(srows) == 0 and not name.startswith("q_"):
                print(f"  WARNING: zero rows")
            continue
        try:
            cur = con.sql(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            failures.append((name, f"ORACLE ERROR: {e}"))
            results[name] = {"error": f"oracle: {e}"}
            print(f"[FAIL] {name}: oracle error: {e}")
            continue
        ok = True
        results[name] = {
            "rows_match": len(srows) == len(orows),
            "schema_match": sorted(scols) == sorted(ocols),
            "hash_match": False,
        }
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"schema: spark={sorted(scols)} oracle={sorted(ocols)}"))
            ok = False
        elif len(srows) != len(orows):
            failures.append((name, f"rowcount: spark={len(srows)} oracle={len(orows)}"))
            ok = False
        else:
            s, o = rowset(srows, scols), rowset(orows, ocols)
            if s != o:
                diff = [(a, b) for a, b in zip(s, o) if a != b][:3]
                failures.append((name, f"values differ, first diffs: {diff}"))
                ok = False
            else:
                # driver-hash hazard guard: equal VALUES whose python types
                # differ in numeric class (int vs float — e.g. a DuckDB
                # HUGEINT sum surfacing as float64) stringify differently in
                # the external gate's canonicalizer. Width differences
                # (int32 vs int64) are fine; int-vs-float is not.
                def _kind(v):
                    if isinstance(v, bool) or v is None:
                        return None
                    if isinstance(v, int):
                        return "i"
                    if isinstance(v, float):
                        return "f"
                    return None
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                o_order = sorted(range(len(ocols)), key=lambda i: ocols[i])
                for ci, (si, oi) in enumerate(zip(order, o_order)):
                    sk = next((k for r in srows if (k := _kind(r[si])) is not None), None)
                    okk = next((k for r in orows if (k := _kind(r[oi])) is not None), None)
                    if sk and okk and sk != okk:
                        failures.append((
                            name,
                            f"numeric-class mismatch col {sorted(scols)[ci]}: "
                            f"spark={sk} oracle={okk} (CAST the oracle column)"))
                        ok = False
        results[name]["hash_match"] = ok and results[name]["rows_match"]
        status = "ok" if ok else "FAIL"
        print(f"[{status}] {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
    if not only:
        sidecar = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_full.json",
        )
        import json

        with open(sidecar, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "entries": len(results), "results": results},
                f,
                indent=1,
            )
        print(f"wrote {sidecar} ({len(results)} entries)")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for name, msg in failures:
            print(f"  {name}: {msg}")
    else:
        print("all queries match their oracles")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1:] or None) else 0)
