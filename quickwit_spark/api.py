"""ES-compatible `_search` request execution (SURVEY §3.2 lifecycle).

One entry point mirroring `POST /api/v1/{index}/search` / ES `_search`
(quickwit-serve rest handlers + quickwit-search/src/root.rs:1224-1290 —
behavior only): a single request body combining

- ``query``  — ES DSL subset → Catalyst predicate (operators/query.py),
- ``aggs``   — ES aggregations → single-pass groupBys (operators/aggs.py),
- ``sort`` / ``from`` / ``size`` / ``search_after`` — top-k & pagination
  (operators/sorts.py; ≤2 sort fields like the reference),
- ``track_total_hits`` — count fast path.

The response reproduces the ES shape: ``hits.total``, ``hits.hits`` with
``_source`` + ``sort`` cursors, and ``aggregations``. Everything stays one
declarative plan per section: filter → (TakeOrdered top-k) + (groupBys);
``size: 0`` requests never touch the hit path at all (the reference's
count-only/agg-only rewrite, leaf.rs:914-1000).
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame

from quickwit_spark.operators.aggs import run_es_aggs
from quickwit_spark.operators.query import QueryCompiler, es_dsl_to_ast
from quickwit_spark.operators.sorts import paginate, search_after, top_k


def _parse_sort(sort_spec) -> list[tuple[str, bool]]:
    """ES sort forms → [(field, descending)]. Accepts "field",
    {"field": "desc"}, {"field": {"order": "desc"}}."""
    out: list[tuple[str, bool]] = []
    for s in sort_spec or []:
        if isinstance(s, str):
            out.append((s, False))
        else:
            (field, spec), = s.items()
            order = spec.get("order", "asc") if isinstance(spec, dict) else spec
            out.append((field, str(order).lower() == "desc"))
    if len(out) > 2:
        raise ValueError("at most 2 sort fields (collector.rs:42-53)")
    return out


def es_search(
    df: DataFrame,
    body: dict[str, Any],
    field_types: dict[str, str] | None = None,
    default_fields: tuple[str, ...] = (),
) -> dict[str, Any]:
    """Execute one ES `_search` body over ``df``; returns the response dict."""
    t0 = time.time()
    compiler = QueryCompiler(field_types, default_fields=default_fields)

    filtered = df
    if body.get("query"):
        pred = compiler.compile(es_dsl_to_ast(body["query"]))
        filtered = df.filter(pred)

    size = body.get("size", 10)
    frm = body.get("from", 0)
    sort_fields = _parse_sort(body.get("sort"))

    total = None
    if body.get("track_total_hits", True):
        total = filtered.count()

    hits: list[dict[str, Any]] = []
    if size > 0:
        if sort_fields:
            if body.get("search_after") is not None:
                cursor = dict(zip([f for f, _ in sort_fields], body["search_after"]))
                page = search_after(filtered, sort_fields, cursor, size)
            elif frm > 0:
                page = paginate(filtered, sort_fields, frm, size)
            else:
                page = top_k(filtered, sort_fields, size)
        else:
            page = filtered.limit(frm + size)
        rows = page.collect()
        if not sort_fields and frm > 0:
            rows = rows[frm:]
        for r in rows:
            h: dict[str, Any] = {"_source": r.asDict(recursive=True)}
            if sort_fields:
                h["sort"] = [r[f] for f, _ in sort_fields]
            hits.append(h)

    out: dict[str, Any] = {
        "took": int((time.time() - t0) * 1000),
        "hits": {
            "total": {"value": int(total) if total is not None else None, "relation": "eq"},
            "hits": hits,
        },
    }
    aggs = body.get("aggs") or body.get("aggregations")
    if aggs:
        out["aggregations"] = run_es_aggs(filtered, aggs)
    return out
