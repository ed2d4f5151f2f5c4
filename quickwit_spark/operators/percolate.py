"""Percolate / reverse search — match a batch of incoming documents
against a catalog of STORED queries (the ES percolator surface; the
alerting/routing primitive a log pipeline runs on every ingest batch:
"which saved alerts does this event trigger?").

Behavioral contract: each stored query is the same mini-DSL the forward
search path compiles (operators/query.py QueryCompiler — the reference's
query AST, `qw/quickwit-query/src/query_ast/mod.rs`); a document matches
a stored query iff the forward search with that query would return it.
That equivalence is the test: percolate(batch)[qid] == where(batch, q)
row-for-row, and the driver-gate oracle restates every stored predicate
as SQL UNION ALL.

Scale shape: ALL stored predicates compile into ONE Catalyst projection —
an array of (matched ? query_id : null) — so a batch is scanned once with
zero shuffles and zero joins regardless of how many queries are stored;
only (id, matched query_id) pairs leave the stage via posexplode. Catalog
growth is codegen-side (Spark auto-splits oversized generated methods);
at 10^5+ stored queries, shard the catalog into a few projections over
the same cached batch rather than per-query scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickwit_spark.operators.query import QueryCompiler


def percolate(
    df: DataFrame,
    stored: dict[str, str],
    compiler: QueryCompiler,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """(id_cols..., query_id) for every (document, stored query) match.

    ``stored``: query_id → mini-DSL string. Documents matching nothing
    produce no rows; a document matching k queries produces k rows —
    exactly the fan-out the router consumes.
    """
    ids = id_cols or [df.columns[0]]
    prev = compiler.schema
    compiler.schema = df.schema
    try:
        slots = [
            F.when(compiler.compile(compiler.parse(q)), F.lit(qid))
            for qid, q in sorted(stored.items())
        ]
    finally:
        compiler.schema = prev
    matched = F.array_compact(F.array(*slots))
    # explode() already emits zero rows for an empty array — a size()>0
    # pre-filter would evaluate every stored predicate a second time (and
    # push that copy into the scan stage, serializing single-file inputs)
    return df.select(*ids, F.explode(matched).alias("query_id"))
