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

import json as _json
import time
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quickwit_spark.operators.aggs import run_es_aggs
from quickwit_spark.operators.query import QueryCompiler, es_dsl_to_ast
from quickwit_spark.operators.sorts import paginate, search_after, top_k


def _parse_sort(sort_spec) -> list[tuple[str, bool]]:
    """ES sort forms → [(field, descending)]. Accepts "field",
    {"field": "desc"}, {"field": {"order": "desc"}}, and the top-level
    mapping form ``sort: {field: {order: desc}, ...}`` (multi-indices/0001
    vectors use it)."""
    out: list[tuple[str, bool]] = []
    if isinstance(sort_spec, dict):
        sort_spec = [{f: spec} for f, spec in sort_spec.items()]
    for s in sort_spec or []:
        if isinstance(s, str):
            # bare `_score` defaults DESCENDING (ES semantics); every other
            # bare field defaults ascending
            out.append((s, s == "_score"))
        else:
            (field, spec), = s.items()
            order = spec.get("order", "asc") if isinstance(spec, dict) else spec
            out.append((field, str(order).lower() == "desc"))
    if len(out) > 2:
        raise ValueError("at most 2 sort fields (collector.rs:42-53)")
    return out


def _as_patterns(v) -> list[str]:
    if v is None:
        return []
    if isinstance(v, str):
        return [p for p in v.split(",") if p]
    return list(v)


def _included(path: str, includes: list[str]):
    if not includes:
        return True
    for p in includes:
        if p == path or path.startswith(p + "."):
            return True
        if p.startswith(path + "."):
            return "partial"  # an ancestor of an included leaf
    return False


def _excluded(path: str, excludes: list[str]) -> bool:
    return any(p == path or path.startswith(p + ".") for p in excludes)


def filter_source(doc: dict, includes: list[str], excludes: list[str], prefix: str = "") -> dict:
    """ES `_source_includes`/`_source_excludes` semantics over a nested doc
    (0022-source.yaml vectors): dotted paths select subtrees; excludes apply
    after includes."""
    out: dict[str, Any] = {}
    for k, v in doc.items():
        path = f"{prefix}{k}"
        if _excluded(path, excludes):
            continue
        inc = _included(path, includes)
        if inc is True:
            out[k] = (
                filter_source(v, [], excludes, path + ".") if isinstance(v, dict) else v
            )
        elif inc == "partial" and isinstance(v, dict):
            sub = filter_source(v, includes, excludes, path + ".")
            if sub:
                out[k] = sub
    return out


def _resolvable(df: DataFrame, field: str) -> bool:
    try:
        df.select(field)
        return True
    except Exception:
        return False


def _prune_unmapped_multi_match(df: DataFrame, query) -> Any:
    """ES silently ignores unmapped fields in multi_match
    (0014-multi-match-query.yaml: an inexistent field in the list doesn't
    change the result); prune them against the actual schema. Recurses
    through bool composition."""
    if not isinstance(query, dict):
        return query
    out = {}
    for kind, body in query.items():
        if kind == "multi_match" and isinstance(body, dict):
            fields = body.get("fields", [])
            if isinstance(fields, str):
                fields = [fields]
            kept = [f for f in fields if _resolvable(df, f)]
            out[kind] = {**body, "fields": kept or fields}
        elif kind == "bool" and isinstance(body, dict):
            out[kind] = {
                k: (
                    [_prune_unmapped_multi_match(df, q) for q in v]
                    if isinstance(v, list)
                    else _prune_unmapped_multi_match(df, v)
                    if isinstance(v, dict)
                    else v
                )
                for k, v in body.items()
            }
        else:
            out[kind] = body
    return out


def _coerce_cursor(df: DataFrame, field: str, value):
    """search_after cursor values coerce to the SORT FIELD's type
    (0018-search_after.yaml: string "5688" against a numeric field, epoch
    millis against a datetime field — Quickwit converts, ES rejects)."""
    from pyspark.sql import types as T

    dtype = df.select(field).schema.fields[0].dataType
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        from quickwit_spark.functions.datetime import parse_query_datetime

        return parse_query_datetime(value)
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)) and isinstance(value, str):
        try:
            return int(value)
        except ValueError:
            return float(value)
    if isinstance(dtype, (T.DoubleType, T.FloatType)) and isinstance(value, str):
        return float(value)
    return value


def _filter_for_body(df: DataFrame, body: dict[str, Any], compiler) -> DataFrame:
    """Apply the request's query (`q` param wins over the body query,
    0002-query_string.yaml) plus every `extra_filters` conjunct (0023)."""
    filtered = df
    if body.get("q"):
        filtered = df.filter(compiler.compile(compiler.parse(str(body["q"]))))
    elif body.get("query"):
        query = _prune_unmapped_multi_match(df, body["query"])
        filtered = df.filter(
            compiler.compile(es_dsl_to_ast(query, compiler.default_fields))
        )
    extra = body.get("extra_filters")
    if extra:
        parts = extra.split(",") if isinstance(extra, str) else list(extra)
        for q in parts:
            filtered = filtered.filter(compiler.compile(compiler.parse(q)))
    return filtered


def _bm25_spec(ast) -> tuple[str, list[str], list[list[str]], str]:
    """Query AST → (field, terms, phrases, gate_mode) for BM25 scoring.
    Supported shapes (the scoring-relevant subset): Term, TermSet, FullText
    (or/and), Phrase slop-0, and a Bool wrapping ONE of those. Anything
    else raises — `_score` sorting on filter-only shapes (ranges, exists,
    wildcards) is meaningless and the reference treats them as
    constant-score filters too."""
    import re as _re3

    from quickwit_spark.operators.query import (
        Bool,
        FullText,
        Phrase,
        Term,
        TermSet,
    )

    def toks(text: str) -> list[str]:
        # driver-side analog of tokenize_default: split on non-letter/digit,
        # lowercase, drop >255
        return [t for t in _re3.findall(r"[^\W_]+", str(text).lower()) if len(t) <= 255]

    if isinstance(ast, Bool):
        clauses = [*ast.must, *ast.should, *ast.filter]
        if len(clauses) == 1 and not ast.must_not:
            return _bm25_spec(clauses[0])
        raise ValueError(
            "_score sort supports a single term/match/phrase clause"
        )
    if isinstance(ast, Term):
        return ast.field, toks(ast.value) if ast.analyzed else [ast.value], [], "or"
    if isinstance(ast, TermSet):
        return ast.field, [t for v in ast.values for t in toks(v)], [], "or"
    if isinstance(ast, FullText):
        return ast.field, toks(ast.text), [], ast.operator
    if isinstance(ast, Phrase):
        if ast.slop:
            raise ValueError("_score sort supports slop-0 phrases only")
        return ast.field, [], [toks(ast.text)], "and"
    raise ValueError(
        f"_score sort not supported for query shape {type(ast).__name__}"
    )


def es_search(
    df: DataFrame,
    body: dict[str, Any],
    field_types: dict[str, str] | None = None,
    default_fields: tuple[str, ...] = (),
    compiler: "QueryCompiler | None" = None,
    bm25_stats=None,
) -> dict[str, Any]:
    """Execute one ES `_search` body over ``df``; returns the response dict.

    ``compiler`` overrides the default-constructed QueryCompiler (callers
    with dynamic-mode mappings pass ``QueryCompiler.from_doc_mapping``).
    ``bm25_stats`` (a scoring.CorpusStats) skips the per-request corpus
    statistics jobs for `_score` sorts — the per-index-epoch cache a real
    deployment maintains."""
    t0 = time.time()
    if compiler is None:
        compiler = QueryCompiler(field_types, default_fields=default_fields)
    compiler.schema = df.schema  # object-leaf `exists` semantics
    filtered = _filter_for_body(df, body, compiler)

    size = body.get("size", 10)
    frm = body.get("from", 0)
    sort_fields = _parse_sort(body.get("sort"))

    score_sorted = any(f == "_score" for f, _ in sort_fields)
    if score_sorted:
        # opt-in BM25 `_score` sort (operators/scoring.py): corpus stats
        # come from the UNFILTERED index frame (ES computes idf/avgdl per
        # shard, not per query result) and feed one codegen score column.
        # Scoring derives from the q/query clause ONLY — extra_filters are
        # constant-score filters and must not reach _bm25_spec
        from quickwit_spark.functions.tokenizers import tokenize_default
        from quickwit_spark.operators.scoring import bm25_score_col, corpus_stats

        if body.get("q"):
            ast = compiler.parse(str(body["q"]))
        elif body.get("query"):
            ast = es_dsl_to_ast(body["query"], compiler.default_fields)
        else:
            raise ValueError("_score sort requires a query")
        sfield, terms, phrases, _mode = _bm25_spec(ast)
        all_terms = list(terms) + [t for ph in phrases for t in ph]
        stats = bm25_stats or corpus_stats(df, sfield, all_terms)
        filtered = filtered.withColumn(
            "_score",
            F.round(
                bm25_score_col(
                    tokenize_default(F.col(sfield)), terms, stats, phrases=phrases
                ),
                6,
            ),
        )

    total = None
    max_score = None
    if score_sorted:
        # one aggregate serves both the total and ES's max_score, which is
        # defined over ALL matching hits, not the returned page
        agg_row = filtered.agg(
            F.count(F.lit(1)).alias("n"), F.max("_score").alias("m")
        ).first()
        if body.get("track_total_hits", True):
            total = agg_row["n"]
        max_score = agg_row["m"]
    elif body.get("track_total_hits", True):
        total = filtered.count()

    hits: list[dict[str, Any]] = []
    if size > 0:
        if sort_fields:
            # dynamic-capture sort fields (mode=dynamic) have no native
            # column: materialize via JSON extraction cast to the numeric
            # fast value (non-numeric → NULL → missing-last), mirroring
            # es_multi_search's per-index sort materialization
            dyn_sorts = [
                (i, f)
                for i, (f, _) in enumerate(sort_fields)
                if not _resolvable(filtered, f)
                and getattr(compiler, "dynamic_col", None)
                and compiler.dynamic_col in filtered.columns
            ]
            if dyn_sorts:
                for i, f in dyn_sorts:
                    filtered = filtered.withColumn(
                        f"__dsort_{i}", compiler._dynamic_value(f).cast("double")
                    )
                sort_fields = [
                    (f"__dsort_{i}" if any(j == i for j, _ in dyn_sorts) else f, d)
                    for i, (f, d) in enumerate(sort_fields)
                ]
            if body.get("search_after") is not None:
                cursor = {
                    f: _coerce_cursor(filtered, f, v)
                    for (f, _), v in zip(sort_fields, body["search_after"])
                }
                page = search_after(filtered, sort_fields, cursor, size)
            elif frm > 0:
                page = paginate(filtered, sort_fields, frm, size)
            else:
                page = top_k(filtered, sort_fields, size)
        else:
            page = filtered.limit(frm + size)
        # nested sort fields (actor.id) aren't Row-addressable by dotted
        # name: project them as hidden columns for the cursor values
        for i, (f, _) in enumerate(sort_fields):
            page = page.withColumn(f"__sort_{i}", F.col(f))
        rows = page.collect()
        if not sort_fields and frm > 0:
            rows = rows[frm:]
        src_spec = body.get("_source", True)
        includes = _as_patterns(body.get("_source_includes"))
        excludes = _as_patterns(body.get("_source_excludes"))
        if isinstance(src_spec, dict):
            includes += _as_patterns(src_spec.get("includes"))
            excludes += _as_patterns(src_spec.get("excludes"))
        elif isinstance(src_spec, list):
            includes += src_spec
        has_stored_source = "_source" in filtered.columns
        for r in rows:
            src = r.asDict(recursive=True)
            hit_score = src.pop("_score", None)
            for i in range(len(sort_fields)):
                src.pop(f"__sort_{i}", None)
                src.pop(f"__dsort_{i}", None)
            if has_stored_source and isinstance(src.get("_source"), str):
                # docmapper output: `_source` holds the ORIGINAL doc — ES
                # returns exactly that, which also keeps metadata columns
                # (`_doc_length`, `_dynamic`, outcome) out of hits
                # (aggregations/0002-doc-len.yaml second vector)
                src = _json.loads(src["_source"])
            else:
                # no stored original: reconstruct dynamic captures back into
                # the doc (the reference returns dynamically-mapped fields in
                # _source like any other stored field —
                # default_search_fields/0001 hit shapes), then drop metadata
                dyn = src.pop("_dynamic", None)
                if isinstance(dyn, str) and dyn not in ("", "{}", "null"):
                    try:
                        src.update(_json.loads(dyn))
                    except ValueError:
                        pass
                for meta in ("_doc_length", "_error", "_error_category"):
                    src.pop(meta, None)
            if src_spec is False:
                src = {}
            elif includes or excludes:
                src = filter_source(src, includes, excludes)
            h: dict[str, Any] = {"_source": src}
            if hit_score is not None:
                h["_score"] = hit_score
            if sort_fields:
                h["sort"] = [r[f"__sort_{i}"] for i in range(len(sort_fields))]
            hits.append(h)

    out: dict[str, Any] = {
        "took": int((time.time() - t0) * 1000),
        "hits": {
            "total": {"value": int(total) if total is not None else None, "relation": "eq"},
            "hits": hits,
        },
    }
    if max_score is not None:
        out["hits"]["max_score"] = max_score
    aggs = body.get("aggs") or body.get("aggregations")
    if aggs:
        # dynamic-capture fields (mode=dynamic indexes) have no native
        # column: materialize them via the compiler's JSON extraction so
        # aggs on `actor.login`-style dynamic paths work like the reference
        # (dynamic fast fields are aggregatable)
        fields: list[str] = []
        _collect_agg_fields(aggs, fields)
        dyn_fields = [
            f for f in fields
            if not _resolvable(filtered, f)
            and getattr(compiler, "dynamic_col", None)
            and compiler.dynamic_col in filtered.columns
        ]
        if dyn_fields:
            safe = {f: f"__aggf_{i}" for i, f in enumerate(dyn_fields)}
            agg_df = filtered
            for f, s in safe.items():
                agg_df = agg_df.withColumn(s, compiler._dynamic_value(f))
            out["aggregations"] = run_es_aggs(agg_df, _rewrite_agg_fields(aggs, safe))
        else:
            out["aggregations"] = run_es_aggs(filtered, aggs)
    return out


def es_msearch(
    tables: dict[str, DataFrame],
    requests: list[tuple[str, dict[str, Any]]],
    field_types: dict[str, dict[str, str]] | None = None,
    compilers: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """ES `_msearch`: a batch of (index, body) pairs → ``{"responses": [...]}``
    in request order (0025-msearch.yaml shape). Unknown indexes produce an
    error entry instead of failing the whole batch, like ES. A header index
    expression with commas/wildcards routes through the multi-index search
    path (same selector grammar as ``{target}/_search``)."""
    responses = []
    for index, body in requests:
        if any(c in index for c in ",*?"):
            try:
                responses.append(
                    es_multi_search(
                        tables, index, body,
                        field_types=field_types, compilers=compilers,
                    )
                )
            except IndexNotFoundError as e:
                responses.append(
                    {"error": {"type": "index_not_found_exception", "index": str(e.args[0])}}
                )
            continue
        df = tables.get(index)
        if df is None:
            responses.append(
                {"error": {"type": "index_not_found_exception", "index": index}}
            )
            continue
        responses.append(
            es_search(
                df, body,
                field_types=(field_types or {}).get(index),
                compiler=(compilers or {}).get(index),
            )
        )
    return {"responses": responses}


_ES_TYPE_BY_KIND = {
    "text": ("text",),
    "raw": ("keyword",),
    "datetime": ("date",),
    "ip": ("ip",),
    "bool": ("boolean",),
}


def field_caps(
    df: DataFrame,
    field_types: dict[str, str] | None = None,
    index: str = "index",
    fields: str | list[str] | None = None,
) -> dict[str, Any]:
    """ES `_field_caps` response over a DataFrame schema
    (es_field_capabilities/0001 shape): every leaf field (nested structs as
    dotted paths) reports its capability entry; declared query kinds override
    the Spark-type mapping (text fields report both `text` and `keyword`,
    like the reference's dynamic text). ``fields`` is the `?fields=` selector
    — comma-separated names or `*` wildcards restrict the response (0001
    third vector)."""
    from pyspark.sql import types as T

    if isinstance(fields, str):
        fields_sel = [p for p in fields.split(",") if p]
    else:
        fields_sel = list(fields) if fields else None

    kinds = field_types or {}

    def spark_es_type(dt) -> str:
        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            return "long"
        if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
            return "double"
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            return "date"
        if isinstance(dt, T.BinaryType):
            return "binary"
        return "keyword"

    fields_out: dict[str, Any] = {}

    def cap(t: str) -> dict:
        return {
            "type": t, "metadata_field": False,
            "searchable": True, "aggregatable": True,
        }

    def walk(struct, prefix=""):
        for f in struct.fields:
            path = f"{prefix}{f.name}"
            dt = f.dataType
            if isinstance(dt, T.StructType):
                walk(dt, prefix=f"{path}.")
                continue
            if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
                walk(dt.elementType, prefix=f"{path}.")
                continue
            if isinstance(dt, T.ArrayType):
                dt = dt.elementType
            kind = kinds.get(path)
            if kind == "text":
                names = ("text", "keyword")
            elif kind in _ES_TYPE_BY_KIND:
                names = _ES_TYPE_BY_KIND[kind]
            else:
                names = (spark_es_type(dt),)
            fields_out[path] = {n: cap(n) for n in names}

    walk(df.schema)
    if fields_sel:
        import fnmatch

        out_fields = {
            p: caps_
            for p, caps_ in fields_out.items()
            if any(fnmatch.fnmatch(p, pat) for pat in fields_sel)
        }
    else:
        out_fields = fields_out
    return {"indices": [index], "fields": out_fields}


def es_explain(
    df: DataFrame,
    body: dict[str, Any],
    doc_id,
    id_col: str = "doc_id",
    field_types: dict[str, str] | None = None,
    compiler: "QueryCompiler | None" = None,
) -> dict[str, Any]:
    """``GET /{index}/_explain/{id}`` analog: whether ``doc_id`` matches the
    query and, for BM25-scorable shapes, the full score breakdown in ES's
    explanation-tree form (per-term idf and tf nodes with their inputs).
    Filter-only shapes explain as matched/not-matched with value 1/0
    (constant score), like the reference's filter context."""
    from quickwit_spark.functions.tokenizers import tokenize_default
    from quickwit_spark.operators.scoring import (
        bm25_score_col,
        corpus_stats,
        idf as _idf,
    )

    if compiler is None:
        compiler = QueryCompiler(field_types)
    compiler.schema = df.schema
    query = body.get("query") or {}
    ast = es_dsl_to_ast(query, compiler.default_fields)
    pred = compiler.compile(ast)
    row = df.filter(F.col(id_col) == F.lit(doc_id)).limit(1)
    matched_rows = row.filter(F.coalesce(pred, F.lit(False))).count()
    matched = matched_rows > 0
    try:
        sfield, terms, phrases, _mode = _bm25_spec(ast)
    except ValueError:
        return {
            "_id": doc_id,
            "matched": matched,
            "explanation": {
                "value": 1.0 if matched else 0.0,
                "description": "ConstantScore(filter context)",
                "details": [],
            },
        }
    if not matched:
        return {"_id": doc_id, "matched": False,
                "explanation": {"value": 0.0, "description": "no matching term",
                                "details": []}}

    all_terms = list(terms) + [t for ph in phrases for t in ph]
    stats = corpus_stats(df, sfield, all_terms)
    toks = tokenize_default(F.col(sfield))
    # one row fetch computes the total and every per-term freq + |d|
    from quickwit_spark.operators.scoring import phrase_freq_col, term_freq_col

    sels = [
        F.round(bm25_score_col(toks, terms, stats, phrases=phrases), 6).alias("_total"),
        F.size(toks).cast("double").alias("_dl"),
    ]
    for i, t in enumerate(dict.fromkeys(terms)):
        sels.append(term_freq_col(toks, t).alias(f"_f{i}"))
    for j, ph in enumerate(phrases or []):
        sels.append(phrase_freq_col(toks, ph).alias(f"_p{j}"))
    vals = row.select(*sels).first()

    k1, b = 1.2, 0.75
    details = []
    for i, t in enumerate(dict.fromkeys(terms)):
        w = _idf(stats.num_docs, stats.doc_freq.get(t, 0))
        freq, dl = vals[f"_f{i}"], vals["_dl"]
        tf = freq * (k1 + 1) / (freq + k1 * (1 - b + b * dl / (stats.avg_dl or 1.0)))
        details.append({
            "value": round(w * tf, 6),
            "description": f"weight({sfield}:{t})",
            "details": [
                {"value": round(w, 6),
                 "description": f"idf, computed as ln(1 + (N - n + 0.5) / (n + 0.5)) "
                                f"with n = {stats.doc_freq.get(t, 0)}, N = {stats.num_docs}",
                 "details": []},
                {"value": round(tf, 6),
                 "description": f"tf, computed as freq * (k1 + 1) / (freq + k1 * "
                                f"(1 - b + b * dl / avgdl)) with freq = {freq}, "
                                f"k1 = {k1}, b = {b}, dl = {dl}, "
                                f"avgdl = {round(stats.avg_dl, 4)}",
                 "details": []},
            ],
        })
    for j, ph in enumerate(phrases or []):
        w = sum(_idf(stats.num_docs, stats.doc_freq.get(t, 0)) for t in ph)
        freq, dl = vals[f"_p{j}"], vals["_dl"]
        tf = freq * (k1 + 1) / (freq + k1 * (1 - b + b * dl / (stats.avg_dl or 1.0)))
        details.append({
            "value": round(w * tf, 6),
            "description": "weight(phrase \"" + " ".join(ph) + "\")",
            "details": [],
        })
    return {
        "_id": doc_id,
        "matched": True,
        "explanation": {
            "value": vals["_total"],
            "description": "sum of:",
            "details": details,
        },
    }


def es_scroll(
    df: DataFrame,
    body: dict[str, Any],
    scroll_state: list | None = None,
    field_types: dict[str, str] | None = None,
) -> tuple[dict[str, Any], list | None]:
    """Scroll protocol as a pure function: returns ``(response,
    next_scroll_state)``; pass the state back to get the next page, until it
    comes back None. The state is just the last hit's sort values (iterated
    search_after — the single-engine analog of the reference's server-side
    scroll context, scroll_context.rs; nothing lives on the cluster).

    ``body`` must carry a deterministic ``sort`` (add a unique tiebreaker).
    """
    page_body = dict(body)
    if scroll_state is not None:
        page_body["search_after"] = scroll_state
    res = es_search(df, page_body, field_types=field_types)
    hits = res["hits"]["hits"]
    next_state = hits[-1]["sort"] if hits else None
    return res, next_state


# ---------------------------------------------------------------------------
# multi-index `_search`: {target}/_search with wildcard/exclusion selectors
# (es_compatibility/multi-indices vectors; reference resolves selectors via
# the metastore's ListIndexes pattern matching and merges leaf responses at
# the root, search/root.rs merge_search_responses behavior)
# ---------------------------------------------------------------------------


def resolve_search_targets(
    tables: dict[str, Any], target: str, ignore_unavailable: bool = False
) -> list[str]:
    """ES index-selector resolution for ``{target}/_search``: comma-separated
    selectors (URL-encoded commas accepted), ``*`` wildcards, and leading
    ``-`` exclusion patterns applied to the already-selected set. A wildcard
    matching nothing is valid (0 indexes); a LITERAL name that is missing
    raises :class:`IndexNotFoundError` (404) unless ``ignore_unavailable``
    (multi-indices/0004 + 0012-scroll-api semantics)."""
    import fnmatch
    from urllib.parse import unquote

    selected: list[str] = []
    for p in (s for s in unquote(str(target)).split(",") if s):
        if p.startswith("-") and len(p) > 1:
            pat = p[1:]
            selected = [n for n in selected if not fnmatch.fnmatch(n, pat)]
        elif "*" in p or "?" in p:
            selected.extend(
                n for n in sorted(tables) if fnmatch.fnmatch(n, p) and n not in selected
            )
        elif p in tables:
            if p not in selected:
                selected.append(p)
        elif not ignore_unavailable:
            raise IndexNotFoundError(p)
    return selected


def _field_value_col(df: DataFrame, compiler, field: str):
    """Best-effort typed value column for a dotted field: the native column
    when the schema resolves it, else dynamic-capture JSON extraction
    (mode=dynamic indexes), else NULL (field absent on this index — its rows
    sort missing-last / fall out of field aggs, like unmapped fields in the
    reference)."""
    try:
        df.select(F.col(field))
        return F.col(field)
    except Exception:
        pass
    if getattr(compiler, "dynamic_col", None) and compiler.dynamic_col in df.columns:
        return compiler._dynamic_value(field)
    return F.lit(None).cast("string")


def _merge_sorted_hits(hits: list, sort_fields: list, limit: int) -> list:
    import functools

    if not sort_fields:
        return hits[:limit]

    def cmp(a, b):
        for i, (_, desc) in enumerate(sort_fields):
            va, vb = a["sort"][i], b["sort"][i]
            if va == vb:
                continue
            if va is None:  # missing-last in BOTH directions (sorts.py)
                return 1
            if vb is None:
                return -1
            lt = va < vb
            if desc:
                return 1 if lt else -1
            return -1 if lt else 1
        return 0

    return sorted(hits, key=functools.cmp_to_key(cmp))[:limit]


def _collect_agg_fields(spec, acc: list) -> None:
    if isinstance(spec, dict):
        for k, v in spec.items():
            if k == "field" and isinstance(v, str):
                if v not in acc:
                    acc.append(v)
            else:
                _collect_agg_fields(v, acc)
    elif isinstance(spec, list):
        for v in spec:
            _collect_agg_fields(v, acc)


def _rewrite_agg_fields(spec, mapping: dict):
    if isinstance(spec, dict):
        return {
            k: (mapping.get(v, v) if k == "field" and isinstance(v, str) else _rewrite_agg_fields(v, mapping))
            for k, v in spec.items()
        }
    if isinstance(spec, list):
        return [_rewrite_agg_fields(v, mapping) for v in spec]
    return spec


def es_multi_search(
    tables: dict[str, DataFrame],
    target: str,
    body: dict[str, Any],
    field_types: dict[str, dict[str, str]] | None = None,
    compilers: dict[str, Any] | None = None,
    ignore_unavailable: bool = False,
) -> dict[str, Any]:
    """ES ``{target}/_search`` across the registered ``tables``: resolve the
    selector expression, run the gather phase per index (each index's scan
    keeps its own pushdown/pruning — the leaf-search analog), merge hits
    under the request sort at the root, sum totals, and run field-referencing
    aggs over the union of per-index value frames.

    Per-index ``compilers`` (``QueryCompiler.from_doc_mapping``) override the
    default field_types-built compilers — required for mode=dynamic indexes.
    Hits carry ``_index``. Zero resolved indexes is a valid empty response
    with NO aggregations key (multi-indices/0003)."""
    names = resolve_search_targets(tables, target, ignore_unavailable)
    body = dict(body)
    if body.get("ignore_unavailable") is not None:
        body.pop("ignore_unavailable")
    size = body.get("size", 10)
    frm = body.get("from", 0)
    sort_fields = _parse_sort(body.get("sort"))

    def compiler_for(name):
        if compilers and name in compilers:
            return compilers[name]
        return QueryCompiler((field_types or {}).get(name))

    all_hits: list[dict[str, Any]] = []
    total = 0
    for name in names:
        df = tables[name]
        comp = compiler_for(name)
        gather = dict(body)
        gather.pop("aggs", None)
        gather.pop("aggregations", None)
        gather["size"] = frm + size
        gather["from"] = 0
        if sort_fields:
            # materialize each sort field as a hidden typed column so every
            # index — including dynamic-capture ones where the dotted path
            # has no native column — sorts under the same key (dynamic
            # values sort by their numeric fast value; non-numeric → NULL,
            # missing-last)
            prepared = df
            rewritten = []
            for i, (f, desc) in enumerate(sort_fields):
                if f == "_score":
                    # BM25 is computed per index inside es_search with that
                    # index's own stats — ES's per-shard idf/avgdl behavior
                    # (no dfs_query_then_fetch); the merge then compares the
                    # per-index scores via the shared sort cursor
                    rewritten.append({"_score": {"order": "desc" if desc else "asc"}})
                    continue
                c = _field_value_col(df, comp, f)
                try:
                    df.select(F.col(f))
                except Exception:
                    c = c.cast("double")
                prepared = prepared.withColumn(f"__msort_{i}", c)
                rewritten.append({f"__msort_{i}": {"order": "desc" if desc else "asc"}})
            gather["sort"] = rewritten
            df = prepared
        res = es_search(df, gather, compiler=comp)
        total += res["hits"]["total"]["value"] or 0
        for h in res["hits"]["hits"]:
            h["_index"] = name
            if isinstance(h.get("_source"), dict):
                for i in range(len(sort_fields)):
                    h["_source"].pop(f"__msort_{i}", None)
            all_hits.append(h)

    merged = _merge_sorted_hits(all_hits, sort_fields, frm + size)[frm : frm + size]
    out: dict[str, Any] = {
        "hits": {"total": {"value": int(total), "relation": "eq"}, "hits": merged}
    }

    aggs = body.get("aggs") or body.get("aggregations")
    if aggs and names:
        fields: list[str] = []
        _collect_agg_fields(aggs, fields)
        safe = {f: f"__aggf_{i}" for i, f in enumerate(fields)}
        union = None
        for name in names:
            comp = compiler_for(name)
            part = _filter_for_body(tables[name], body, comp).select(
                *[_field_value_col(tables[name], comp, f).alias(s) for f, s in safe.items()]
            )
            union = part if union is None else union.unionByName(part)
        out["aggregations"] = run_es_aggs(union, _rewrite_agg_fields(aggs, safe))
    return out


def es_multi_scroll(
    tables: dict[str, DataFrame],
    target: str,
    body: dict[str, Any],
    scroll_state: list | None = None,
    field_types: dict[str, dict[str, str]] | None = None,
    compilers: dict[str, Any] | None = None,
) -> tuple[dict[str, Any], list | None]:
    """Multi-index scroll: same stateless iterated-search_after protocol as
    :func:`es_scroll`, but the cursor advances over the MERGED stream
    (multi-indices/0002: page size 1 walks hits across both indexes in
    global sort order)."""
    page_body = dict(body)
    if scroll_state is not None:
        page_body["search_after"] = scroll_state
    res = es_multi_search(
        tables, target, page_body, field_types=field_types, compilers=compilers
    )
    hits = res["hits"]["hits"]
    next_state = hits[-1]["sort"] if hits else None
    return res, next_state


# ---------------------------------------------------------------------------
# _search over a janitor-managed index: automatic time-bounds split pruning
# ---------------------------------------------------------------------------


def _required_query_ast(body: dict[str, Any], compiler: QueryCompiler):
    """One Bool(must=...) over everything the request REQUIRES: the
    `q`/`query` clause plus every `extra_filters` conjunct (they are ANDed
    onto the query, so each may tighten pruning)."""
    from quickwit_spark.operators.query import Bool

    asts = []
    if body.get("q"):
        asts.append(compiler.parse(str(body["q"])))
    elif body.get("query"):
        asts.append(es_dsl_to_ast(body["query"], compiler.default_fields))
    extra = body.get("extra_filters")
    if extra:
        parts = extra.split(",") if isinstance(extra, str) else list(extra)
        asts.extend(compiler.parse(q) for q in parts)
    return Bool(must=asts)


def _query_time_bounds(body: dict[str, Any], compiler: QueryCompiler, ts_field: str):
    from quickwit_spark.operators.query import extract_time_bounds

    return extract_time_bounds(_required_query_ast(body, compiler), ts_field)


def search_index(
    spark,
    out_dir: str,
    body: dict[str, Any],
    field_types: dict[str, str] | None = None,
    default_fields: tuple[str, ...] = (),
    ts_field: str = "ts",
    cache: "SearchCache | None" = None,
) -> dict[str, Any]:
    """ES `_search` over a janitor-managed index with AUTOMATIC query →
    time-bounds split pruning (quickwit-search/src/root.rs:1230-1245: the
    root extracts ts bounds from the query AST and asks the metastore for
    list_relevant_splits — here: extract_time_bounds → prune_splits_by_time
    → read only surviving commit dirs).

    Metadata-plane only before the read: at 10^12 turns a one-day query over
    a year of day-aligned splits opens ~1/365 of the files, without the
    caller passing any bounds.

    Pass a ``SearchCache`` to get the reference's leaf/result-cache behavior
    (quickwit-search/src/leaf_cache.rs semantics): a repeated body over an
    unchanged index returns the cached response; any publish/merge/delete/
    retention changes the index epoch and forces recompute."""

    def _run() -> dict[str, Any]:
        df, _ = pruned_index_df(
            spark, out_dir, body, field_types, default_fields, ts_field
        )
        return es_search(df, body, field_types, default_fields)

    if cache is not None:
        return cache.get_or_compute(out_dir, body, _run, scope="search_index")
    return _run()


def pruned_index_df(
    spark,
    out_dir: str,
    body: dict[str, Any],
    field_types: dict[str, str] | None = None,
    default_fields: tuple[str, ...] = (),
    ts_field: str = "ts",
):
    """(pruned DataFrame, surviving commit ids) for a `_search` body — the
    split-pruning half of :func:`search_index`, separable for tests and for
    callers that run their own plans over the pruned read.

    Both metadata pruning axes run, exactly as the reference root search
    does before touching any split (root.rs list_relevant_splits): query →
    ts bounds AND query → TagFilter (tag_pruning.rs), evaluated together in
    ONE lineage scan (:func:`prune_splits`)."""
    from quickwit_spark.operators.query import (
        extract_tag_filter,
        extract_time_bounds,
    )
    from quickwit_spark.pipeline.janitor import (
        exclude_marked_splits,
        prune_splits,
        read_index_commits,
    )

    compiler = QueryCompiler(field_types, default_fields=default_fields)
    ast = _required_query_ast(body, compiler)
    lo, hi, _lo_inc, hi_inc = extract_time_bounds(ast, ts_field)
    commits = prune_splits(
        spark, out_dir, lo, hi, end_inclusive=hi_inc,
        tag_filter=extract_tag_filter(ast),
    )
    df = exclude_marked_splits(read_index_commits(spark, out_dir, commits), out_dir)
    return df, commits


# ---------------------------------------------------------------------------
# Quickwit-native search: POST/GET /api/v1/{index}/search
# ---------------------------------------------------------------------------


def _native_sort_to_es(sort_by) -> list:
    """The native sort mini-DSL (rest_handler.rs:93-119 `From<String> for
    SortBy`): comma-separated fields where a BARE name and a ``+`` prefix
    both mean DESCENDING and ``-`` means ASCENDING — the reference's actual
    (inverted-looking) semantics, replicated verbatim."""
    if not sort_by:
        return []
    parts = sort_by if isinstance(sort_by, (list, tuple)) else str(sort_by).split(",")
    out = []
    for raw in parts:
        raw = str(raw)
        if not raw:
            continue
        if raw.startswith("+"):
            field, order = raw[1:].strip(), "desc"
        elif raw.startswith("-"):
            field, order = raw[1:].strip(), "asc"
        else:
            field, order = raw.strip(), "desc"
        out.append({field: {"order": order}})
    return out


def _ts_seconds_col(df: DataFrame, ts_field: str):
    """Epoch-seconds view of the timestamp column for the native
    start_timestamp/end_timestamp bounds (both are "expressed in seconds",
    SearchRequestQueryString docs); timestamp columns cast to fractional
    seconds, numeric columns are taken as already-epoch-seconds."""
    from pyspark.sql import types as T

    dt = df.schema[ts_field].dataType if ts_field in df.columns else None
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        # parquet timestamps load as TIMESTAMP_NTZ here (session tz pinned
        # UTC), so the naive value IS the UTC instant; NTZ has no direct
        # numeric cast — go through TIMESTAMP first
        return F.col(ts_field).cast("timestamp").cast("double")
    return F.col(ts_field)


def quickwit_search(
    df: DataFrame,
    request: dict[str, Any],
    field_types: dict[str, str] | None = None,
    default_fields: tuple[str, ...] = (),
    ts_field: str = "ts",
    compiler: "QueryCompiler | None" = None,
    bm25_stats=None,
) -> dict[str, Any]:
    """Quickwit-native `POST /api/v1/{index}/search`
    (rest_handler.rs:153-243 SearchRequestQueryString →
    search_request_from_api_request): ``query`` is a query-LANGUAGE string,
    plus ``search_field``, ``snippet_fields``, ``start_timestamp`` /
    ``end_timestamp`` (epoch seconds, start inclusive / end exclusive),
    ``max_hits`` (default 20), ``start_offset``, ``sort_by`` (mini-DSL:
    bare/``+`` = desc, ``-`` = asc), ``aggs``, ``count_all``.

    Response is SearchResponseRest (search_response_rest.rs:44-62):
    ``num_hits``, ``hits`` (the stored docs), ``snippets`` (parallel to
    hits, only when snippet_fields requested), ``elapsed_time_micros``,
    ``errors``, ``aggregations``.

    Snippets follow the reference's fetch phase exactly: term scores are
    1/(1+doc_freq) over the index frame (one no-shuffle aggregate), and
    HTML generation runs only on the returned page — never on the corpus.
    When no sort is given the reference returns hits in reverse split/doc
    order, which for time-ordered splits is newest-first: here that
    surfaces as an explicit ``ts DESC`` default when the frame has the
    timestamp column."""
    t0 = time.time()
    query = str(request.get("query", "*"))
    search_field = request.get("search_field")
    if search_field:
        fields = (
            [f.strip() for f in search_field.split(",")]
            if isinstance(search_field, str)
            else list(search_field)
        )
        default_fields = tuple(fields)
    if compiler is None:
        compiler = QueryCompiler(field_types, default_fields=default_fields)
    else:
        compiler.default_fields = tuple(default_fields) or compiler.default_fields

    snippet_fields = request.get("snippet_fields") or []
    if isinstance(snippet_fields, str):
        snippet_fields = [f.strip() for f in snippet_fields.split(",") if f.strip()]
    if snippet_fields:
        from quickwit_spark.operators.snippets import validate_snippet_fields

        validate_snippet_fields(snippet_fields, field_types)

    bounded = df
    start_ts = request.get("start_timestamp")
    end_ts = request.get("end_timestamp")
    if start_ts is not None:
        bounded = bounded.filter(_ts_seconds_col(df, ts_field) >= float(start_ts))
    if end_ts is not None:
        bounded = bounded.filter(_ts_seconds_col(df, ts_field) < float(end_ts))

    sort = _native_sort_to_es(request.get("sort_by") or request.get("sort_by_field"))
    if not sort and ts_field in df.columns:
        sort = [{ts_field: {"order": "desc"}}]
    body: dict[str, Any] = {
        "q": query,
        "size": int(request.get("max_hits", 20)),
        "from": int(request.get("start_offset", 0)),
        "track_total_hits": bool(request.get("count_all", True)),
    }
    if sort:
        body["sort"] = sort
    if request.get("aggs"):
        body["aggs"] = request["aggs"]
    es = es_search(
        bounded,
        body,
        field_types,
        tuple(default_fields),
        compiler=compiler,
        bm25_stats=bm25_stats,
    )

    hits = [h["_source"] for h in es["hits"]["hits"]]
    total = es["hits"]["total"]["value"]
    out: dict[str, Any] = {
        "num_hits": int(total) if total is not None else len(hits),
        "hits": hits,
        "elapsed_time_micros": int((time.time() - t0) * 1e6),
        "errors": [],
    }
    if "aggregations" in es:
        out["aggregations"] = es["aggregations"]
    if snippet_fields:
        from quickwit_spark.operators.snippets import (
            query_terms_for_field,
            snippets_for_value,
            term_scores,
        )

        ast = compiler.parse(query)
        scores = {
            f: term_scores(df, f, query_terms_for_field(ast, f))
            for f in snippet_fields
        }
        out["snippets"] = [
            {f: snippets_for_value(hit.get(f), scores[f]) for f in snippet_fields}
            for hit in hits
        ]
    return out


def _native_prune(
    spark,
    out_dir: str,
    request: dict[str, Any],
    compiler: "QueryCompiler",
    ts_field: str,
):
    """(pruned DataFrame, surviving commit ids, parsed AST) for a native
    request: the request's explicit ``start_timestamp``/``end_timestamp``
    intersected against whatever bounds the query AST itself implies (the
    reference root does both: root.rs list_relevant_splits receives the
    request bounds AND the AST-extracted ones), plus tag pruning."""
    import datetime as _dt

    from quickwit_spark.operators.query import (
        extract_tag_filter,
        extract_time_bounds,
    )
    from quickwit_spark.pipeline.janitor import (
        exclude_marked_splits,
        prune_splits,
        read_index_commits,
    )

    ast = compiler.parse(str(request.get("query", "*")))
    lo, hi, _lo_inc, hi_inc = extract_time_bounds(ast, ts_field)
    if request.get("start_timestamp") is not None:
        req_lo = _dt.datetime.utcfromtimestamp(float(request["start_timestamp"]))
        lo = req_lo if lo is None else max(lo, req_lo)
    if request.get("end_timestamp") is not None:
        req_hi = _dt.datetime.utcfromtimestamp(float(request["end_timestamp"]))
        if hi is None or req_hi < hi:
            hi, hi_inc = req_hi, False
    commits = prune_splits(
        spark, out_dir, lo, hi, end_inclusive=hi_inc,
        tag_filter=extract_tag_filter(ast),
    )
    df = exclude_marked_splits(read_index_commits(spark, out_dir, commits), out_dir)
    return df, commits, ast


def quickwit_search_index(
    spark,
    out_dir: str,
    request: dict[str, Any],
    field_types: dict[str, str] | None = None,
    default_fields: tuple[str, ...] = (),
    ts_field: str = "ts",
) -> dict[str, Any]:
    """Native search over a janitor-managed index with the SAME metadata
    pruning as :func:`search_index` (see :func:`_native_prune`)."""
    compiler = QueryCompiler(field_types, default_fields=default_fields)
    df, _commits, _ast = _native_prune(spark, out_dir, request, compiler, ts_field)
    return quickwit_search(df, request, field_types, default_fields, ts_field)


def quickwit_search_plan(
    spark,
    out_dir: str,
    request: dict[str, Any],
    field_types: dict[str, str] | None = None,
    default_fields: tuple[str, ...] = (),
    ts_field: str = "ts",
    index_id: str = "index",
) -> dict[str, Any]:
    """`GET/POST /api/v1/{index}/search-plan` (root.rs:1376-1480
    search_plan): metadata about how the request WOULD execute, without
    touching any data. Response keys mirror SearchPlanResponseRest
    (search_response_rest.rs:118-131):

    - ``quickwit_ast``   — the resolved query AST (ours, as a typed dict);
    - ``tantivy_ast``    — the compiled physical predicate; the Catalyst
      Column expression is this engine's analog of the tantivy query debug
      string;
    - ``searched_splits``— ``index/commit`` ids surviving BOTH metadata
      pruning axes (time bounds ∩ tags) — the list_relevant_splits analog;
    - ``storage_requests`` — per-split I/O the reference predicts from its
      warmup info, re-expressed for a parquet engine: ``footer`` = 1
      parquet footer per split (same meaning), ``sstable`` = number of
      distinct (field, term) lookups + term-range + exists probes the
      query needs, ``position`` = number of terms needing positions
      (phrase / phrase-prefix terms), ``fieldnorm`` = 0 (no `_score` in
      the request) or the scored field count (BM25 length norms).

    Everything here is metadata-plane: the one Spark action is the
    lineage scan inside prune_splits."""
    import re

    compiler = QueryCompiler(field_types, default_fields=default_fields)
    df, commits, ast = _native_prune(spark, out_dir, request, compiler, ts_field)
    compiler.schema = df.schema

    from quickwit_spark.operators.query import (
        Bool,
        Exists,
        FullText,
        Phrase,
        PhrasePrefix,
        Range,
        Regex,
        Term,
        TermSet,
        Wildcard,
        ast_to_dict,
    )

    terms = 0
    ranges = 0
    positions = 0
    scored_fields: set[str] = set()

    def _n_toks(text: str) -> int:
        return len(re.findall(r"[^\W_]+", str(text)))

    def walk(node) -> None:
        nonlocal terms, ranges, positions
        if isinstance(node, Bool):
            for clause in (*node.must, *node.should, *node.filter, *node.must_not):
                walk(clause)
        elif isinstance(node, Term):
            terms += 1
        elif isinstance(node, TermSet):
            terms += len(node.values)
        elif isinstance(node, FullText):
            terms += _n_toks(node.text)
        elif isinstance(node, (Phrase, PhrasePrefix)):
            n = _n_toks(node.text)
            terms += n
            positions += n
        elif isinstance(node, (Range, Wildcard, Regex)):
            ranges += 1  # term-range / automaton walk over the dictionary
        elif isinstance(node, Exists):
            ranges += 1  # presence = full term-dict probe for the field

    walk(ast)
    sort_by = str(request.get("sort_by") or request.get("sort_by_field") or "")
    if "_score" in sort_by:
        for f, kind in (field_types or {}).items():
            if kind == "text":
                scored_fields.add(f)

    return {
        "quickwit_ast": ast_to_dict(ast),
        "tantivy_ast": str(compiler.compile(ast)),
        "searched_splits": [f"{index_id}/{c}" for c in commits],
        "storage_requests": {
            "footer": 1,
            "fastfield": 1 if (request.get("aggs") or sort_by.strip("+-")) else 0,
            "sstable": terms + ranges,
            "position": positions,
            "fieldnorm": len(scored_fields),
        },
    }


# ---------------------------------------------------------------------------
# ES admin surface: _stats and _cat/indices over janitor-managed indexes
# ---------------------------------------------------------------------------


def _index_metadata(spark, out_dir: str) -> dict[str, int]:
    """docs / splits / uncompressed bytes from the lineage metadata plane and
    on-disk store bytes from the sink files — never a data scan."""
    import glob as _glob
    import os as _os

    from quickwit_spark.pipeline.janitor import read_lineage

    meta = {"docs": 0, "segments": 0, "uncompressed": 0, "store": 0}
    if _glob.glob(_os.path.join(out_dir, "_lineage", "commit_id=*")):
        lin = read_lineage(spark, out_dir)
        aggs = [F.count(F.lit(1)).alias("segments"), F.sum("num_docs").alias("docs")]
        if "uncompressed_size_bytes" in lin.columns:
            aggs.append(F.sum("uncompressed_size_bytes").alias("uncompressed"))
        row = lin.agg(*aggs).collect()[0].asDict()
        meta["segments"] = int(row["segments"] or 0)
        meta["docs"] = int(row["docs"] or 0)
        meta["uncompressed"] = int(row.get("uncompressed") or 0)
    for root, _dirs, files in _os.walk(_os.path.join(out_dir, "sinks")):
        meta["store"] += sum(_os.path.getsize(_os.path.join(root, f)) for f in files)
    return meta


def _human_size(n: int) -> str:
    """ES human-readable byte size (222.8kb style)."""
    for unit, scale in (("gb", 1 << 30), ("mb", 1 << 20), ("kb", 1 << 10)):
        if n >= scale:
            return f"{n / scale:.1f}{unit}"
    return f"{n}b"


def index_stats(
    spark, indexes: dict[str, str], selector: str = "_all"
) -> dict[str, Any]:
    """ES `_stats` over janitor-managed indexes (es_compatibility/0020 shape:
    `GET {index}/_stats`, `GET _stats`): per-index and _all docs.count,
    store.size_in_bytes, segments.count — all from lineage + file sizes,
    metadata-plane only. ``selector`` is an index name or wildcard pattern;
    ``_all`` matches everything."""
    import fnmatch

    chosen = {
        name: d
        for name, d in indexes.items()
        if selector in ("_all", "") or fnmatch.fnmatch(name, selector)
    }
    out: dict[str, Any] = {"indices": {}}
    tot = {"docs": 0, "segments": 0, "store": 0}
    for name in sorted(chosen):
        m = _index_metadata(spark, chosen[name])
        out["indices"][name] = {
            "primaries": {
                "docs": {"count": m["docs"]},
                "store": {"size_in_bytes": m["store"]},
            },
            "total": {
                "segments": {"count": m["segments"]},
                "docs": {"count": m["docs"]},
            },
        }
        tot["docs"] += m["docs"]
        tot["segments"] += m["segments"]
        tot["store"] += m["store"]
    out["_all"] = {
        "primaries": {
            "docs": {"count": tot["docs"]},
            "store": {"size_in_bytes": tot["store"]},
        },
        "total": {
            "segments": {"count": tot["segments"]},
            "docs": {"count": tot["docs"]},
        },
    }
    return out


def list_splits(
    spark,
    out_dir: str,
    params: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """GET /api/v1/indexes/{index}/splits — the reference's split-listing
    resource (quickwit-serve index_api/split_resource.rs:38-67; filter
    semantics from the metastore's split_query_predicate,
    file_backed_index/mod.rs:1229-1276). ``params`` carries the query
    params: offset, limit, split_states (list OR the REST comma-separated
    string form), start_timestamp, end_timestamp, end_create_timestamp.

    Returns the reference's ListSplitsResponse shape
    ``{"offset": o, "size": len(splits), "splits": [...]}``
    (split_resource.rs:70-77,132-136 — ``size`` is the PAGE size)."""
    from quickwit_spark.pipeline.janitor import list_splits as _list

    params = dict(params or {})
    allowed = {
        "offset", "limit", "split_states", "start_timestamp",
        "end_timestamp", "end_create_timestamp",
    }
    unknown = set(params) - allowed
    if unknown:
        raise ValueError(f"unknown split list parameter(s): {sorted(unknown)}")
    states = params.get("split_states")
    if isinstance(states, str):
        states = [s.strip() for s in states.split(",") if s.strip()]

    def _int(name):
        v = params.get(name)
        if v is None:
            return None
        try:
            return int(v)
        except (TypeError, ValueError):
            raise ValueError(f"`{name}` must be an integer, got {v!r}") from None

    full = _list(
        spark,
        out_dir,
        split_states=states,
        start_timestamp=_int("start_timestamp"),
        end_timestamp=_int("end_timestamp"),
        end_create_timestamp=_int("end_create_timestamp"),
    )
    offset, limit = _int("offset") or 0, _int("limit")
    page = full[offset:]
    if limit is not None:
        page = page[:limit]
    return {"offset": offset, "size": len(page), "splits": page}


def mark_splits_for_deletion(
    spark,
    out_dir: str,
    body: dict[str, Any],
) -> dict[str, Any]:
    """PUT /indexes/{index}/splits/mark-for-deletion — body is the
    reference's SplitsForDeletion ``{"split_ids": [...]}``
    (index_api/rest_handler.rs mark_splits_for_deletion_handler). Unknown
    split ids are skipped, not an error, matching the metastore call with
    ``return_error_on_splits_not_found=false`` (file_backed/mod.rs:712-732).
    Marked splits drop out of every search/prune path immediately."""
    from quickwit_spark.pipeline.janitor import (
        mark_splits_for_deletion as _mark,
    )

    ids = body.get("split_ids")
    if not isinstance(ids, list) or not all(isinstance(s, str) for s in ids):
        raise ValueError("`split_ids` must be a list of strings")
    return _mark(spark, out_dir, ids)


def _stats_percentile(sorted_vals, percent: int) -> float:
    """Linear-interpolation percentile over pre-sorted values —
    quickwit-cli/src/stats.rs:36-53 exactly (f32 arithmetic)."""
    import numpy as np

    f32 = np.float32
    if len(sorted_vals) == 1:
        return float(f32(sorted_vals[0]))
    if percent == 100:
        return float(f32(sorted_vals[-1]))
    length = f32(len(sorted_vals) - 1)
    rank = f32(percent) / f32(100.0) * length
    lrank = np.floor(rank)
    d = rank - lrank
    n = int(lrank)
    lo, hi = f32(sorted_vals[n]), f32(sorted_vals[n + 1])
    return float(lo + (hi - lo) * d)


def _descriptive_stats(values: list[int]) -> dict[str, Any] | None:
    """DescriptiveStats::maybe_new (quickwit-cli/src/index.rs:916-938):
    mean/std over f32 (stats.rs:15-32), min/max, and the fixed quantile set
    q1/q25/q50/q75/q99 with linear interpolation."""
    import numpy as np

    if not values:
        return None
    v = sorted(values)
    f32 = np.float32
    n = f32(len(v))
    mean = f32(sum(v)) / n
    variance = f32(sum(float((mean - f32(x)) * (mean - f32(x))) for x in v)) / n
    return {
        "summary_stats": {
            "mean_val": float(mean),
            "std_val": float(np.sqrt(variance)),
            "min_val": int(v[0]),
            "max_val": int(v[-1]),
        },
        "quantiles": {
            f"q{p}": _stats_percentile(v, p) for p in (1, 25, 50, 75, 99)
        },
    }


def describe_index(
    spark,
    out_dir: str,
    index_id: str,
    index_uri: str | None = None,
    ts_field: str | None = "ts",
) -> dict[str, Any]:
    """`quickwit index describe` — IndexStats::from_metadata
    (quickwit-cli/src/index.rs:601-780): totals over PUBLISHED splits only,
    the index-level timestamp range, and per-split descriptive stats
    (doc counts and on-disk split sizes; the reference's
    ``footer_offsets.end`` ≈ physical split bytes, here the split leaf
    directory's file bytes). Metadata-plane: one lineage scan + a
    filesystem walk of split leaves — never a data scan."""
    import os as _os

    from quickwit_spark.pipeline.janitor import list_splits as _list

    published = _list(spark, out_dir, split_states=["Published"])

    def _leaf_bytes(split_id: str) -> int:
        bits = split_id.split("/")
        leaf = _os.path.join(out_dir, "sinks", f"commit={bits[0]}", f"sink={bits[1]}")
        if len(bits) > 2:
            leaf = _os.path.join(leaf, f"partition_bucket={bits[2]}")
        total = 0
        for root, _dirs, files in _os.walk(leaf):
            total += sum(_os.path.getsize(_os.path.join(root, f)) for f in files)
        return total

    num_docs = sorted(s["split_metadata"]["num_docs"] for s in published)
    split_bytes = sorted(
        _leaf_bytes(s["split_metadata"]["split_id"]) for s in published
    )
    ranges = [
        s["split_metadata"]["time_range"]
        for s in published
        if s["split_metadata"]["time_range"] is not None
    ]
    ts_range = None
    if ts_field is not None and ranges:
        ts_range = (min(r["start"] for r in ranges), max(r["end"] for r in ranges))
    return {
        "index_id": index_id,
        "index_uri": index_uri if index_uri is not None else out_dir,
        "num_published_splits": len(published),
        "size_published_splits": sum(split_bytes),
        "num_published_docs": sum(num_docs),
        "size_published_docs_uncompressed": sum(
            s["split_metadata"]["uncompressed_docs_size_in_bytes"] for s in published
        ),
        "timestamp_field_name": ts_field,
        "timestamp_range": ts_range,
        "num_docs_descriptive": _descriptive_stats(num_docs),
        "num_bytes_descriptive": _descriptive_stats(split_bytes),
    }


def describe_index_rest(
    spark,
    out_dir: str,
    index_id: str,
    index_uri: str | None = None,
    ts_field: str | None = "ts",
) -> dict[str, Any]:
    """``GET /api/v1/indexes/{index_id}/describe`` — the REST IndexStats
    shape (index_api/index_resource.rs:91-108: flat min/max timestamps, no
    descriptive-stats tables), a projection of the CLI
    :func:`describe_index`."""
    full = describe_index(spark, out_dir, index_id, index_uri, ts_field)
    ts = full["timestamp_range"]
    return {
        "index_id": full["index_id"],
        "index_uri": full["index_uri"],
        "num_published_splits": full["num_published_splits"],
        "size_published_splits": full["size_published_splits"],
        "num_published_docs": full["num_published_docs"],
        "size_published_docs_uncompressed": full["size_published_docs_uncompressed"],
        "timestamp_field_name": full["timestamp_field_name"],
        "min_timestamp": ts[0] if ts else None,
        "max_timestamp": ts[1] if ts else None,
    }


def cat_indices(
    spark,
    indexes: dict[str, str],
    selector: str = "*",
    fmt: str = "json",
    h: list[str] | str | None = None,
    health: str | None = None,
    **params: Any,
) -> list[dict[str, Any]]:
    """ES `_cat/indices` over janitor-managed indexes (es_compatibility/0021
    shape). Quickwit-parity contract: only ``format=json`` is supported and
    unsupported parameters (``v``, ``b``, ...) are hard 400-style errors;
    ``h`` selects columns; ``health`` filters rows (every janitor index is
    green — a red filter matches nothing)."""
    import fnmatch

    if fmt != "json":
        raise ValueError("_cat/indices supports only format=json")
    if params:
        raise ValueError(f"unsupported _cat/indices parameter(s): {sorted(params)}")
    if health not in (None, "green", "yellow", "red"):
        raise ValueError(f"invalid health value: {health}")
    rows = []
    for name in sorted(indexes):
        if selector not in ("*", "_all", "") and not fnmatch.fnmatch(name, selector):
            continue
        if health in ("yellow", "red"):
            continue  # local janitor indexes are always green
        m = _index_metadata(spark, indexes[name])
        row = {
            "index": name,
            "docs.count": str(m["docs"]),
            "docs.deleted": "0",
            "health": "green",
            "status": "open",
            "pri": "1",
            "rep": "1",
            "store.size": _human_size(m["store"]),
            "pri.store.size": _human_size(m["store"]),
            "dataset.size": _human_size(m["uncompressed"]),
        }
        if h:
            cols = h.split(",") if isinstance(h, str) else list(h)
            row = {c: row[c] for c in cols if c in row}
        rows.append(row)
    return rows


class IndexNotFoundError(KeyError):
    """Missing index target — the ES surface maps this to a 404
    (``index_not_found_exception``)."""


def resolve_index(indexes: dict[str, str], patterns: str | list[str]) -> dict[str, Any]:
    """ES `GET _resolve/index/{patterns}` (0026-resolve.yaml shape;
    rest_handler.rs es_compat_resolve_index): comma-separated name/wildcard
    patterns resolve against the registered indexes, entries sorted by name
    with ``attributes: ["open"]``; aliases and data streams are always empty
    (Quickwit has neither)."""
    import fnmatch

    pats = patterns.split(",") if isinstance(patterns, str) else list(patterns)
    names = sorted(
        name for name in indexes if any(fnmatch.fnmatch(name, p) for p in pats)
    )
    return {
        "indices": [{"name": n, "attributes": ["open"]} for n in names],
        "aliases": [],
        "data_streams": [],
    }


def health_livez() -> bool:
    """``GET /health/livez`` (health_check_api/handler.rs:44): the process
    answers, so it is live — constant true."""
    return True


def health_readyz(indexes: dict[str, str] | None = None) -> bool:
    """``GET /health/readyz``: ready when the metadata plane is reachable
    — here, when every registered index directory exists (the single-node
    analog of the reference's cluster-readiness check)."""
    import os as _os

    return all(_os.path.isdir(d) for d in (indexes or {}).values())


def node_version(engine_version: str = "0.1.0") -> dict[str, Any]:
    """``GET /api/v1/version`` (node_info_handler.rs:39-59): build +
    runtime info. Build fields carry this engine's identity; the
    compat version string mirrors the reference's ES-compat constant
    (es_info's 7.17 line)."""
    import sys as _sys

    return {
        "build": {
            "version": engine_version,
            "commit_date": "",
            "build_target": f"pyspark-{_sys.platform}",
        },
        "runtime": {
            "num_cpus": __import__("os").cpu_count() or 1,
            "python_version": _sys.version.split()[0],
        },
    }


def nodes_info(
    node_id: str = "node-1", publish_address: str = "127.0.0.1:7280"
) -> dict[str, Any]:
    """ES ``GET _elastic/_nodes/http`` (es rest_handler.rs:111-126
    es_compat_nodes_info): the single-node roles + http publish address
    document ES clients use for sniffing."""
    return {
        "nodes": {
            node_id: {
                "roles": ["data", "ingest"],
                "http": {"publish_address": publish_address},
            }
        }
    }


def search_shards(index_id: str, node_id: str = "node-1") -> dict[str, Any]:
    """ES ``GET _elastic/{index}/_search_shards`` (es rest_handler.rs:
    140-149): one primary shard 0 on this node — the constant shape
    clients use for routing, shard topology being meaningless here."""
    return {
        "shards": [
            [{"index": index_id, "shard": 0, "primary": True, "node": node_id}]
        ]
    }


def cluster_health(indexes: dict[str, str] | None = None) -> dict[str, Any]:
    """ES `GET _cluster/health` (0027-cluster-health.yaml: a 200 with a
    health body). Janitor-managed local indexes have no replication tiers,
    so the cluster is green by construction."""
    n = len(indexes or {})
    return {
        "cluster_name": "quickwit_spark",
        "status": "green",
        "timed_out": False,
        "number_of_nodes": 1,
        "number_of_data_nodes": 1,
        "active_primary_shards": n,
        "active_shards": n,
        "relocating_shards": 0,
        "initializing_shards": 0,
        "unassigned_shards": 0,
        "active_shards_percent_as_number": 100.0,
    }


def es_info() -> dict[str, Any]:
    """ES `GET /` cluster info (es_compatibility_info/0001-info.yaml:
    non-empty cluster_name and version.build_date;
    rest_handler.rs:73-93 es_compat_cluster_info shape)."""
    from quickwit_spark import __version__ as _v

    return {
        "name": "quickwit-spark-node",
        "cluster_name": "quickwit_spark",
        "cluster_uuid": "quickwit_spark",
        "tagline": "You Know, for Search",
        "version": {
            "distribution": "quickwit-spark",
            "number": "7.17.0",
            "build_hash": _v,
            "build_date": "2026-08-16T00:00:00Z",
            "build_snapshot": False,
            "lucene_version": "8.11.1",
            "minimum_wire_compatibility_version": "6.8.0",
            "minimum_index_compatibility_version": "6.0.0-beta1",
        },
    }


def delete_indexes(
    indexes: dict[str, str],
    targets: str | list[str],
    ignore_unavailable: bool = False,
    dry_run: bool = False,
) -> dict[str, Any]:
    """ES `DELETE /{targets}` over janitor-managed indexes
    (0024-delete_indices.yaml; index.rs:277-330 delete_indexes semantics):
    comma-separated EXACT names only — wildcard patterns and ``_all`` are
    rejected; a missing target raises :class:`IndexNotFoundError` (the 404)
    unless ``ignore_unavailable``; the present subset is still deleted in
    that case, matching the reference's resolve-then-delete order. Removes
    the index directory (sinks + lineage + checkpoints) and the registry
    entry."""
    import shutil

    names = targets.split(",") if isinstance(targets, str) else list(targets)
    for name in names:
        if "*" in name:
            raise ValueError(f"index_id pattern {name} contains *")
        if name == "_all":
            raise ValueError("index_id pattern _all not supported")
    present = [n for n in names if n in indexes]
    missing = [n for n in names if n not in indexes]
    if missing and not ignore_unavailable:
        raise IndexNotFoundError(missing[0])
    if not dry_run:
        for name in present:
            shutil.rmtree(indexes[name], ignore_errors=True)
            del indexes[name]
    return {"acknowledged": True}


# ---------------------------------------------------------------------------
# ES `_bulk` ingest surface (bulk_v2.rs semantics; es_compatibility/bulk/*)
# ---------------------------------------------------------------------------

import os as _os
import re as _re

_INDEX_ID_RE = _re.compile(r"^[a-zA-Z][a-zA-Z0-9\-_\.]{2,254}$")


class BulkIndexRegistry:
    """Metastore analog for the `_bulk` surface: ``index_id → DocMapping``
    plus index templates (``index_id_patterns → DocMapping``) that
    auto-create a matching index on first ingest
    (index_template/mod.rs + bulk _setup: test-index-pattern-* template)."""

    def __init__(self, indexes=None, templates=()):
        self.indexes = dict(indexes or {})
        self.templates = [(list(p), m) for p, m in templates]
        self.auto_created: list[str] = []

    def resolve(self, index_id: str):
        import fnmatch

        if index_id in self.indexes:
            return self.indexes[index_id]
        for patterns, mapping in self.templates:
            if any(fnmatch.fnmatch(index_id, p) for p in patterns):
                self.indexes[index_id] = mapping
                self.auto_created.append(index_id)
                return mapping
        return None


def _bulk_err(status: int, etype: str, reason: str) -> dict[str, Any]:
    return {"status": status, "error": {"type": etype, "reason": reason}}


def es_bulk(
    spark,
    registry: BulkIndexRegistry,
    payload: str | list,
    default_index: str | None = None,
) -> tuple[dict[str, Any], dict[str, DataFrame]]:
    """ES ``POST /_bulk`` (and ``/{index}/_bulk`` via ``default_index``):
    returns ``(response, {index_id: parsed valid DataFrame})``.

    Semantics follow the reference bulk_v2.rs:
    - only ``index`` / ``create`` actions; anything else (or unparsable
      JSON) → whole-request 400 ``Malformed action/metadata line [N]``
    - an action with no doc line → 400 ``Validation Failed: 1: no requests
      added;``; no resolvable index → 400 ``Validation Failed: 1: index is
      missing;`` (the ``{index}/_bulk`` path segment is a DEFAULT, not a
      constraint — per-action ``_index`` wins)
    - invalid index ids (``^[a-zA-Z][a-zA-Z0-9-_.]{2,254}$``) → per-item 400
    - unknown index with no matching template → per-item 404
      ``no such index [id]``; a template match auto-creates the index
    - docs run through each index's DocMapper as ONE Arrow batch job per
      index (mapInPandas — the ingest path, not a driver loop); per-doc
      parse failures → per-item 400 ``document_parsing_exception`` carrying
      the mapper's error (field name included), successes → 201

    The returned frames are this request's VALID rows per index, ready for
    the caller's sink write (runner.publish)."""
    from quickwit_spark.operators.docmapper import DocMapper

    # -- split into (action, doc) pairs ------------------------------------
    if isinstance(payload, str):
        raw_lines = [ln for ln in payload.splitlines() if ln.strip()]
        lines: list[Any] = []
        for ln in raw_lines:
            try:
                lines.append(_json.loads(ln))
            except Exception:
                lines.append(ValueError(ln))
    else:
        lines = list(payload)

    actions: list[dict[str, Any]] = []  # {index_id, es_doc_id, doc | item}
    i = 0
    while i < len(lines):
        line = lines[i]
        if isinstance(line, ValueError) or not isinstance(line, dict) or len(line) != 1 or next(iter(line)) not in ("index", "create"):
            return (
                _bulk_err(
                    400, "illegal_argument_exception",
                    f"Malformed action/metadata line [{i + 1}]",
                ),
                {},
            )
        meta = line[next(iter(line))] or {}
        if i + 1 >= len(lines):
            return (
                _bulk_err(
                    400, "action_request_validation_exception",
                    "Validation Failed: 1: no requests added;",
                ),
                {},
            )
        doc = lines[i + 1]
        i += 2
        index_id = meta.get("_index") or default_index
        if not index_id:
            return (
                _bulk_err(
                    400, "action_request_validation_exception",
                    "Validation Failed: 1: index is missing;",
                ),
                {},
            )
        actions.append(
            {
                "index_id": index_id,
                "es_doc_id": meta.get("_id"),
                "doc": doc if isinstance(doc, str) else _json.dumps(doc),
            }
        )

    items: list[dict[str, Any] | None] = [None] * len(actions)
    errors = False
    by_index: dict[str, list[int]] = {}
    for pos, act in enumerate(actions):
        iid = act["index_id"]
        if not _INDEX_ID_RE.match(iid):
            items[pos] = {
                "index": {
                    "_index": iid, "status": 400,
                    "error": {
                        "index": iid, "type": "illegal_argument_exception",
                        "reason": f"invalid index id [{iid}]",
                    },
                    **({"_id": act["es_doc_id"]} if act["es_doc_id"] else {}),
                }
            }
            errors = True
            continue
        if registry.resolve(iid) is None:
            items[pos] = {
                "index": {
                    "_index": iid, "status": 404,
                    "error": {
                        "index": iid, "type": "index_not_found_exception",
                        "reason": f"no such index [{iid}]",
                    },
                    **({"_id": act["es_doc_id"]} if act["es_doc_id"] else {}),
                }
            }
            errors = True
            continue
        by_index.setdefault(iid, []).append(pos)

    # -- one Arrow parse job per target index ------------------------------
    frames: dict[str, DataFrame] = {}
    for iid, positions in by_index.items():
        mapper = DocMapper(registry.indexes[iid])
        df = spark.createDataFrame(
            [(p, actions[p]["doc"]) for p in positions], "pos long, value string"
        )
        parsed = _apply_docmapper_with_pos(mapper, df)
        outcome_rows = parsed.select("_pos", "_error", "_error_category").collect()
        bad_pos = set()
        for r in outcome_rows:
            pos = r._pos
            if r._error_category and r._error_category != "valid":
                bad_pos.add(pos)
                items[pos] = {
                    "index": {
                        "_index": iid, "status": 400,
                        "error": {
                            "type": "document_parsing_exception",
                            "reason": str(r._error),
                        },
                        **(
                            {"_id": actions[pos]["es_doc_id"]}
                            if actions[pos]["es_doc_id"]
                            else {}
                        ),
                    }
                }
                errors = True
            else:
                items[pos] = {
                    "index": {
                        "_index": iid, "status": 201,
                        **(
                            {"_id": actions[pos]["es_doc_id"]}
                            if actions[pos]["es_doc_id"]
                            else {}
                        ),
                    }
                }
        frames[iid] = parsed.filter(F.col("_error_category") == "valid").drop("_pos")
    return {"errors": errors, "items": [it for it in items if it is not None]}, frames


_PROM_STATUS_MAP = {
    "doc_mapper_error": "schema_error",
    "json_parse_error": "parse_error",
    "transform_error": "transform_error",
    "valid": "valid",
}


def prometheus_metrics(
    spark,
    out_dir: str,
    index_id: str,
    source_id: str = "",
) -> str:
    """``GET /metrics`` — Prometheus text exposition of the reference's
    indexing metric family (quickwit-indexing/src/metrics.rs:27-101),
    rebuilt from the index's metadata plane (per-commit outcome reports +
    split lineage — never a data scan):

    - ``quickwit_indexing_processed_docs_total{index,source,
      docs_processed_status}`` with the reference's status vocabulary
      (valid / schema_error / parse_error / transform_error);
    - ``quickwit_indexing_published_splits_total`` /
      ``..._split_docs_total`` / ``..._split_bytes_total`` /
      ``..._split_uncompressed_bytes_total``
      ``{index,source,merge_ops}`` — the same label set on all four so
      ratios describe the same split population
      (metrics.rs record_published_split).
    """
    import glob as _glob
    import json as _j
    import os as _os

    from quickwit_spark.pipeline.janitor import list_splits as _list

    esc = lambda s: str(s).replace("\\", "\\\\").replace('"', '\\"')
    lines: list[str] = []

    # ---- processed docs by status ----------------------------------------
    status_counts: dict[str, int] = {}
    for path in sorted(_glob.glob(_os.path.join(out_dir, "_commit_*.json"))):
        with open(path) as fh:
            rep = _j.load(fh)
        for cat, n in (rep.get("outcome_counts") or {}).items():
            status = _PROM_STATUS_MAP.get(cat, cat)
            status_counts[status] = status_counts.get(status, 0) + int(n)
    lines.append(
        "# HELP quickwit_indexing_processed_docs_total Number of processed "
        "docs by index, source and processed status in [valid, schema_error, "
        "parse_error, transform_error]"
    )
    lines.append("# TYPE quickwit_indexing_processed_docs_total counter")
    for status in sorted(status_counts):
        lines.append(
            f'quickwit_indexing_processed_docs_total{{index="{esc(index_id)}",'
            f'source="{esc(source_id)}",docs_processed_status="{esc(status)}"}} '
            f"{status_counts[status]}"
        )

    # ---- published splits (same labels on all four — metrics.rs:80-101) --
    splits = _list(spark, out_dir, split_states=["Published"])
    by_labels: dict[tuple, dict[str, int]] = {}
    for s in splits:
        md = s["split_metadata"]
        key = (md["source_id"] or source_id, md["num_merge_ops"])
        agg = by_labels.setdefault(
            key, {"splits": 0, "docs": 0, "bytes": 0, "uncompressed": 0}
        )
        agg["splits"] += 1
        agg["docs"] += md["num_docs"]
        agg["uncompressed"] += md["uncompressed_docs_size_in_bytes"]
        bits = md["split_id"].split("/")
        leaf = _os.path.join(out_dir, "sinks", f"commit={bits[0]}", f"sink={bits[1]}")
        if len(bits) > 2:
            leaf = _os.path.join(leaf, f"partition_bucket={bits[2]}")
        for root, _dirs, files in _os.walk(leaf):
            agg["bytes"] += sum(
                _os.path.getsize(_os.path.join(root, f)) for f in files
            )
    series = (
        ("published_splits_total", "splits",
         "Number of successfully published splits."),
        ("published_split_docs_total", "docs",
         "Documents in successfully published splits."),
        ("published_split_bytes_total", "bytes",
         "Compressed bytes in successfully published splits."),
        ("published_split_uncompressed_bytes_total", "uncompressed",
         "Uncompressed document bytes in successfully published splits."),
    )
    for name, field, help_ in series:
        lines.append(f"# HELP quickwit_indexing_{name} {help_}")
        lines.append(f"# TYPE quickwit_indexing_{name} counter")
        for (src, ops) in sorted(by_labels):
            lines.append(
                f'quickwit_indexing_{name}{{index="{esc(index_id)}",'
                f'source="{esc(src)}",merge_ops="{ops}"}} '
                f"{by_labels[(src, ops)][field]}"
            )
    return "\n".join(lines) + "\n"


def _otlp_ingest(spark, body, fmt: str, kind: str):
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType,
    )

    from quickwit_spark.sources import files as _files

    if fmt not in ("json", "protobuf"):
        raise ValueError(f"unsupported OTLP content format [{fmt}]")
    if fmt == "json":
        payload = body.decode() if isinstance(body, (bytes, bytearray)) else str(body)
        req = spark.createDataFrame(
            [(payload,)], StructType([StructField("value", StringType())])
        )
        parse = getattr(_files, f"parse_otlp_{kind}_json")
    else:
        if not isinstance(body, (bytes, bytearray)):
            raise ValueError("protobuf OTLP body must be bytes")
        req = spark.createDataFrame(
            [(bytes(body),)], StructType([StructField("value", BinaryType())])
        )
        parse = getattr(_files, f"parse_otlp_{kind}_protobuf")
    return parse(req)


def otlp_ingest_logs(spark, body, fmt: str = "json") -> tuple[dict[str, Any], DataFrame]:
    """``POST /api/v1/otlp/v1/logs`` (otlp_api/rest_handler.rs:66-128):
    one Export request body (JSON or protobuf wire bytes — decoded by the
    same pure-Python proto3 reader as the file source) → LogRecord rows.
    Returns (ExportLogsServiceResponse, parsed DataFrame): the response is
    the reference's ``partialSuccess`` shape with the rejected count (0
    here — malformed bodies raise, matching the handler's 400)."""
    df = _otlp_ingest(spark, body, fmt, "logs")
    return {"partialSuccess": {"rejectedLogRecords": 0}}, df


def otlp_ingest_traces(
    spark, body, fmt: str = "json"
) -> tuple[dict[str, Any], DataFrame]:
    """``POST /api/v1/otlp/v1/traces`` — span rows + the
    ExportTraceServiceResponse ``partialSuccess`` shape."""
    df = _otlp_ingest(spark, body, fmt, "traces")
    return {"partialSuccess": {"rejectedSpans": 0}}, df


_COMMIT_TYPES = ("auto", "wait_for", "force")


def ingest(
    spark,
    registry: "BulkIndexRegistry",
    index_id: str,
    body: str,
    commit: str = "auto",
    detailed_response: bool = False,
) -> tuple[dict[str, Any], DataFrame | None]:
    """Native ``POST /api/v1/{index}/ingest`` (SURVEY §3.1; reference
    ingest_api/rest_handler.rs:145-240 ingest/ingest_v2 +
    response.rs:32-100 RestIngestResponse):

    - the body is raw NDJSON — one doc per line, blank lines skipped
      (rest_handler.rs:277-285 ``lines``), no ES action lines;
    - ``commit`` ∈ auto | wait_for | force (IngestOptions commit alias; an
      unknown value is the serde 400) — in this synchronous engine all
      three have completed by return time;
    - empty batch → ``{"num_docs_for_processing": 0}`` and no frame;
    - invalid index id → ValueError "invalid index ID" (the early 400 at
      :217-221); unknown index → IndexNotFoundError;
    - docs run the index's DocMapper as ONE Arrow batch; the response
      carries num_docs_for_processing / num_ingested_docs /
      num_rejected_docs, plus per-doc ``parse_failures``
      ({message, document, reason ∈ invalid_json|invalid_schema}) when
      ``detailed_response`` is set — v2's detailed mode.

    Returns ``(response, valid DataFrame | None)``; the frame is ready for
    the caller's sink write, same contract as :func:`es_bulk`."""
    from quickwit_spark.operators.docmapper import DocMapper

    if commit not in _COMMIT_TYPES:
        raise ValueError(
            f"unknown commit type [{commit}] (expected one of {_COMMIT_TYPES})"
        )
    doc_lines = [ln for ln in str(body).split("\n") if ln.strip()]
    if not doc_lines:
        return {"num_docs_for_processing": 0}, None
    if not _INDEX_ID_RE.match(index_id or ""):
        raise ValueError("invalid index ID")
    if registry.resolve(index_id) is None:
        raise IndexNotFoundError(f"index [{index_id}] not found")

    mapper = DocMapper(registry.indexes[index_id])
    df = spark.createDataFrame(
        list(enumerate(doc_lines)), "pos long, value string"
    )
    parsed = _apply_docmapper_with_pos(mapper, df)
    outcome_rows = parsed.select("_pos", "_error", "_error_category").collect()
    rejected = [
        r for r in outcome_rows if r._error_category and r._error_category != "valid"
    ]
    resp: dict[str, Any] = {
        "num_docs_for_processing": len(doc_lines),
        "num_ingested_docs": len(doc_lines) - len(rejected),
        "num_rejected_docs": len(rejected),
    }
    if detailed_response:
        resp["parse_failures"] = [
            {
                "message": str(r._error),
                "document": doc_lines[r._pos],
                "reason": (
                    "invalid_json"
                    if r._error_category == "json_parse_error"
                    else "invalid_schema"
                ),
            }
            for r in sorted(rejected, key=lambda r: r._pos)
        ]
    valid = parsed.filter(F.col("_error_category") == "valid").drop("_pos")
    return resp, valid


def _apply_docmapper_with_pos(mapper, df: DataFrame) -> DataFrame:
    """DocMapper.apply variant that carries a ``pos`` column through the
    Arrow batch (parse_batch is row-aligned) so per-item bulk statuses can
    be matched back without assuming partition order."""
    from pyspark.sql import types as T
    from quickwit_spark.operators.docmapper import _arrow_safe

    schema = T.StructType(
        list(mapper.schema.fields) + [T.StructField("_pos", T.LongType())]
    )

    def run(batches):
        for pdf in batches:
            out = mapper.parse_batch(pdf["value"])
            out = _arrow_safe(out, mapper.schema)
            out["_pos"] = pdf["pos"].values
            yield out

    return df.mapInPandas(run, schema=schema)


def create_index(
    indexes: dict[str, Any], config: dict[str, Any]
) -> dict[str, Any]:
    """``POST /api/v1/indexes`` analog (index create bodies as in the
    reference's rest-api-tests _setup files): validates the index id against
    the reference identifier rule, parses ``doc_mapping`` via
    :meth:`DocMapping.from_config`, validates tag-field types, and registers
    the mapping. Raises ``ValueError`` on invalid ids/configs and on
    duplicate ids (the reference's 400s)."""
    from quickwit_spark.operators.docmapper import (
        DocMapping,
        validate_default_search_fields,
        validate_tag_fields,
    )

    index_id = config.get("index_id")
    if not index_id or not _INDEX_ID_RE.match(index_id):
        raise ValueError(f"invalid index id [{index_id}]")
    if index_id in indexes:
        raise ValueError(f"index [{index_id}] already exists")
    mapping = DocMapping.from_config(config.get("doc_mapping", {}))
    validate_tag_fields(mapping)
    search_settings = config.get("search_settings") or {}
    dsf = tuple(search_settings.get("default_search_fields") or ())
    validate_default_search_fields(mapping, dsf)
    mapping.default_search_fields = dsf
    mapping.retention_policy = _validate_index_settings(config, mapping)
    mapping.sources = {}
    mapping.source_checkpoints = {}
    indexes[index_id] = mapping
    return {
        "index_id": index_id,
        "index_uri": config.get("index_uri", f"ram:///{index_id}"),
        "doc_mapping_fields": [f.name for f in mapping.field_mappings],
    }


_RETENTION_SCHEDULES = ("hourly", "daily", "weekly", "monthly")


def _validate_index_settings(config: dict[str, Any], mapping) -> dict | None:
    """The settings-level checks of validate_index_config
    (index_config/mod.rs:644-667): merge policy config must parse + satisfy
    max_merge_factor >= merge_factor; a retention policy requires a parseable
    period, a valid schedule, and a declared timestamp field. Returns the
    normalized retention policy (or None)."""
    from quickwit_spark.pipeline.merge_policy import (
        merge_policy_from_config,
        parse_human_duration_secs,
    )

    indexing = config.get("indexing_settings") or {}
    merge_policy_from_config(indexing.get("merge_policy"))  # raises ValueError

    retention = config.get("retention")
    if retention is None:
        return None
    period = retention.get("period")
    if not period:
        raise ValueError("retention policy requires a `period`")
    parse_human_duration_secs(period)  # raises ValueError on garbage
    schedule = retention.get("schedule", "hourly")
    if schedule not in _RETENTION_SCHEDULES and not _re.match(
        r"^@?(\S+\s+){4,6}\S*$|^@(hourly|daily|weekly|monthly|yearly)$",
        str(schedule).strip(),
    ):
        raise ValueError(
            f"failed to parse retention evaluation schedule `{schedule}`"
        )
    if mapping.timestamp_field is None:
        raise ValueError(
            "retention policy requires a timestamp field, but doc mapping "
            "does not declare one"
        )
    return {"period": period, "schedule": schedule}


def update_index(indexes: dict[str, Any], config: dict[str, Any]) -> dict[str, Any]:
    """``PUT /api/v1/indexes/{index_id}`` analog
    (quickwit-index-management/src/index.rs:177-195 update_index →
    index_metadata/mod.rs:102-137 update_index_config): re-validates the full
    index config, applies the doc-mapping update-compat rules of
    prepare_doc_mapping_update (index_config/mod.rs:669-724), and swaps the
    registered mapping in place. The compat rejections (each a ValueError —
    the reference's 400):

    - the timestamp field must remain the same;
    - custom tokenizers may only be ADDED (new set must be a superset);
    - search_settings.default_search_fields must resolve against the NEW
      mapping; retention still requires a timestamp field.

    An update whose doc mapping is semantically identical keeps the current
    doc_mapping_uid (``mutation_occurred`` reports whether anything —
    mapping, search settings or retention — actually changed); a real
    mapping change bumps the uid, the signal downstream consumers use to
    know old splits predate the mapping."""
    import dataclasses as _dc

    from quickwit_spark.operators.docmapper import (
        DocMapping,
        validate_default_search_fields,
        validate_tag_fields,
    )

    index_id = config.get("index_id")
    if index_id not in indexes:
        raise IndexNotFoundError(f"index [{index_id}] not found")
    current = indexes[index_id]
    new_mapping = DocMapping.from_config(config.get("doc_mapping", {}))
    validate_tag_fields(new_mapping)
    search_settings = config.get("search_settings") or {}
    dsf = tuple(search_settings.get("default_search_fields") or ())
    validate_default_search_fields(new_mapping, dsf)
    retention = _validate_index_settings(config, new_mapping)

    # uid-insensitive no-op check (index_config/mod.rs:686-696): compare the
    # parsed mappings with per-index runtime state normalized away
    def _cmp(m):
        return _dc.replace(m, default_search_fields=(), doc_mapping_uid=0)

    mapping_changed = _cmp(new_mapping) != _cmp(current)
    if mapping_changed:
        if new_mapping.timestamp_field != current.timestamp_field:
            raise ValueError(
                "updating timestamp field is not allowed, current timestamp "
                f"field `{current.timestamp_field or 'none'}`, new timestamp "
                f"field `{new_mapping.timestamp_field or 'none'}`"
            )
        if not set(current.tokenizers) <= set(new_mapping.tokenizers):
            raise ValueError(
                "updating tokenizers is allowed only if adding new tokenizers"
            )

    mutation_occurred = (
        mapping_changed
        or dsf != current.default_search_fields
        or retention != getattr(current, "retention_policy", None)
    )
    new_mapping.doc_mapping_uid = current.doc_mapping_uid + (1 if mapping_changed else 0)
    new_mapping.default_search_fields = dsf
    new_mapping.retention_policy = retention
    # sources + their checkpoints survive a config update untouched
    new_mapping.sources = getattr(current, "sources", {})
    new_mapping.source_checkpoints = getattr(current, "source_checkpoints", {})
    indexes[index_id] = new_mapping
    return {
        "index_id": index_id,
        "mutation_occurred": mutation_occurred,
        "doc_mapping_uid": new_mapping.doc_mapping_uid,
        "doc_mapping_fields": [f.name for f in new_mapping.field_mappings],
    }


def clear_index(
    spark, indexes: dict[str, Any], index_id: str, out_dir: str | None = None
) -> dict[str, Any]:
    """``PUT /api/v1/indexes/{index_id}/clear`` analog
    (quickwit-index-management/src/index.rs:459-510): delete every split's
    data (mark → GC with zero grace), wipe the metadata planes, and reset
    every source checkpoint — the index itself stays registered with its
    config intact."""
    import shutil as _shutil

    if index_id not in indexes:
        raise IndexNotFoundError(f"index [{index_id}] not found")
    mapping = indexes[index_id]
    splits_deleted = 0
    if out_dir is not None:
        import glob as _glob

        for sub in ("sinks", "_lineage", "_checkpoints", "_deletes",
                    "_merges", ".staging", ".trash"):
            p = _os.path.join(out_dir, sub)
            if sub == "sinks":
                splits_deleted = len(_glob.glob(_os.path.join(p, "commit=*")))
            _shutil.rmtree(p, ignore_errors=True)
    # ResetSourceCheckpointRequest per source (index.rs:500-508)
    for source_id in getattr(mapping, "source_checkpoints", {}):
        mapping.source_checkpoints[source_id] = {}
    return {"index_id": index_id, "splits_deleted": splits_deleted,
            "sources_reset": sorted(getattr(mapping, "source_checkpoints", {}))}


# ---------------------------------------------------------------------------
# source CRUD: POST/PUT/DELETE /api/v1/indexes/{index}/sources
# ---------------------------------------------------------------------------


# source_config/mod.rs:40-50
RESERVED_SOURCE_IDS = ("_ingest-cli-source", "_ingest-api-source", "_ingest-source")

_KNOWN_SOURCE_TYPES = ("file", "kafka", "vec", "void", "stdin")


def _validate_source_config(source_config: dict[str, Any]) -> None:
    """Source-config validation (source_config/mod.rs SourceConfig::validate
    + check_source_connectivity in index.rs:552-560): identifier rule,
    known source type, per-type required params, reachable file path."""
    source_id = source_config.get("source_id")
    if source_id in RESERVED_SOURCE_IDS:
        raise ValueError(f"source id [{source_id}] is reserved")
    if not source_id or not _INDEX_ID_RE.match(source_id):
        raise ValueError(f"invalid source id [{source_id}]")
    stype = source_config.get("source_type")
    if stype not in _KNOWN_SOURCE_TYPES:
        raise ValueError(f"unknown source type [{stype}]")
    params = source_config.get("source_params") or source_config.get("params") or {}
    if stype == "file":
        filepath = params.get("filepath")
        if not filepath:
            raise ValueError("file source requires `filepath`")
        if not _os.path.exists(filepath):
            # check_source_connectivity: an unreachable file is a config
            # error at create/update time, not an indexing-time surprise
            raise ValueError(f"file source `{filepath}` not found")
    elif stype == "kafka":
        if not params.get("topic"):
            raise ValueError("kafka source requires `topic`")


def create_source(
    indexes: dict[str, Any], index_id: str, source_config: dict[str, Any]
) -> dict[str, Any]:
    """``POST .../sources`` analog (index_metadata/mod.rs:139-153 add_source:
    duplicate id → AlreadyExists; a fresh checkpoint is registered)."""
    if index_id not in indexes:
        raise IndexNotFoundError(f"index [{index_id}] not found")
    mapping = indexes[index_id]
    _validate_source_config(source_config)
    sources = getattr(mapping, "sources", None)
    if sources is None:
        sources = mapping.sources = {}
        mapping.source_checkpoints = {}
    source_id = source_config["source_id"]
    if source_id in sources:
        raise ValueError(f"source [{source_id}] already exists in index [{index_id}]")
    sources[source_id] = dict(source_config)
    sources[source_id].setdefault("enabled", True)
    mapping.source_checkpoints[source_id] = {}
    return dict(sources[source_id])


def update_source(
    indexes: dict[str, Any], index_id: str, source_config: dict[str, Any]
) -> dict[str, Any]:
    """``PUT .../sources/{source_id}`` analog
    (quickwit-index-management/src/index.rs:552-583 update_source →
    index_metadata/mod.rs:155-171: re-validates config + connectivity;
    updating a source that doesn't exist is NotFound; the checkpoint is
    PRESERVED — an update must not replay the source)."""
    if index_id not in indexes:
        raise IndexNotFoundError(f"index [{index_id}] not found")
    mapping = indexes[index_id]
    _validate_source_config(source_config)
    sources = getattr(mapping, "sources", {})
    source_id = source_config["source_id"]
    if source_id not in sources:
        raise IndexNotFoundError(
            f"source [{source_id}] not found in index [{index_id}]"
        )
    previous = sources[source_id]
    updated = dict(source_config)
    updated.setdefault("enabled", previous.get("enabled", True))
    mutation_occurred = updated != previous
    sources[source_id] = updated
    return {"source": dict(updated), "mutation_occurred": mutation_occurred}


def toggle_source(
    indexes: dict[str, Any], index_id: str, source_id: str, enable: bool
) -> bool:
    """``PUT .../sources/{source_id}/toggle`` analog
    (index_metadata/mod.rs:173-184)."""
    if index_id not in indexes:
        raise IndexNotFoundError(f"index [{index_id}] not found")
    sources = getattr(indexes[index_id], "sources", {})
    if source_id not in sources:
        raise IndexNotFoundError(
            f"source [{source_id}] not found in index [{index_id}]"
        )
    mutation_occurred = sources[source_id].get("enabled", True) != enable
    sources[source_id]["enabled"] = enable
    return mutation_occurred


def delete_source(indexes: dict[str, Any], index_id: str, source_id: str) -> None:
    """``DELETE .../sources/{source_id}`` analog (index_metadata/mod.rs:
    186-195 delete_source: NotFound if absent; the source checkpoint is
    removed with it, so re-adding the id starts from scratch)."""
    if index_id not in indexes:
        raise IndexNotFoundError(f"index [{index_id}] not found")
    mapping = indexes[index_id]
    sources = getattr(mapping, "sources", {})
    if source_id not in sources:
        raise IndexNotFoundError(
            f"source [{source_id}] not found in index [{index_id}]"
        )
    del sources[source_id]
    getattr(mapping, "source_checkpoints", {}).pop(source_id, None)


_INDEX_PATTERN_RE = None


def _validate_index_id_pattern(pattern: str, allow_negative: bool = True) -> None:
    """validate_index_id_pattern (quickwit-config/src/lib.rs:158-196):
    glob identifier charset, no `**`, and a no-wildcard pattern must be a
    full valid index id (≥3 chars)."""
    import re as _re

    global _INDEX_PATTERN_RE
    if _INDEX_PATTERN_RE is None:
        _INDEX_PATTERN_RE = (
            _re.compile(r"^-?[a-zA-Z\*][a-zA-Z0-9-_\.\*]{0,254}$"),
            _re.compile(r"^[a-zA-Z\*][a-zA-Z0-9-_\.\*]{0,254}$"),
        )
    rx = _INDEX_PATTERN_RE[0] if allow_negative else _INDEX_PATTERN_RE[1]
    if not rx.match(pattern):
        raise ValueError(f"index ID pattern `{pattern}` is invalid")
    if "**" in pattern:
        raise ValueError(
            f"index ID pattern `{pattern}` is invalid: no consecutive `*`"
        )
    if "*" not in pattern and len(pattern.lstrip("-")) < 3:
        raise ValueError(f"index ID pattern `{pattern}` is invalid: too short")


def _validate_index_template(config: dict[str, Any]) -> dict[str, Any]:
    """IndexTemplate::validate (quickwit-config/src/index_template/mod.rs:
    84-101): template id identifier rule, non-empty valid patterns, and the
    same doc-mapping / search-settings / retention validation as
    create_index. Returns the normalized template dict."""
    from quickwit_spark.operators.docmapper import (
        DocMapping,
        validate_default_search_fields,
        validate_tag_fields,
    )

    template_id = config.get("template_id")
    if not template_id or not _INDEX_ID_RE.match(template_id):
        raise ValueError(f"invalid template id [{template_id}]")
    patterns = config.get("index_id_patterns") or []
    if not patterns:
        raise ValueError("`index_id_patterns` must not be empty")
    for p in patterns:
        _validate_index_id_pattern(p)
    mapping = DocMapping.from_config(config.get("doc_mapping", {}))
    validate_tag_fields(mapping)
    dsf = tuple((config.get("search_settings") or {}).get("default_search_fields") or ())
    validate_default_search_fields(mapping, dsf)
    _validate_index_settings(config, mapping)
    out = dict(config)
    out.setdefault("priority", 0)
    return out


def create_index_template(
    templates: dict[str, Any],
    config: dict[str, Any],
    overwrite: bool = False,
) -> dict[str, Any]:
    """``POST /api/v1/templates`` (template_api/rest_handler.rs:59-106):
    validate + register; a duplicate id without ``overwrite`` is an
    AlreadyExists error."""
    tpl = _validate_index_template(config)
    tid = tpl["template_id"]
    if tid in templates and not overwrite:
        raise ValueError(f"index template `{tid}` already exists")
    templates[tid] = tpl
    return dict(tpl)


def get_index_template(templates: dict[str, Any], template_id: str) -> dict[str, Any]:
    """``GET /api/v1/templates/{id}`` — NotFound if absent."""
    if template_id not in templates:
        raise IndexNotFoundError(f"index template `{template_id}` not found")
    return dict(templates[template_id])


def update_index_template(
    templates: dict[str, Any], config: dict[str, Any]
) -> dict[str, Any]:
    """``PUT /api/v1/templates/{id}`` — validate + upsert (the reference
    update path re-creates with ``overwrite: true``)."""
    return create_index_template(templates, config, overwrite=True)


def delete_index_template(templates: dict[str, Any], template_id: str) -> None:
    """``DELETE /api/v1/templates/{id}`` — NotFound if absent."""
    if template_id not in templates:
        raise IndexNotFoundError(f"index template `{template_id}` not found")
    del templates[template_id]


def list_index_templates(templates: dict[str, Any]) -> list[dict[str, Any]]:
    """``GET /api/v1/templates`` — all templates, sorted by id."""
    return [dict(templates[t]) for t in sorted(templates)]


def find_matching_template(
    templates: dict[str, Any], index_id: str
) -> dict[str, Any] | None:
    """The auto-create lookup (metastore find_index_template_matches):
    among templates whose positive patterns glob-match ``index_id`` (and
    no negative pattern excludes it), the highest ``priority`` wins; ties
    break on template id for determinism."""
    import fnmatch

    best = None
    for tid in sorted(templates):
        tpl = templates[tid]
        pats = tpl.get("index_id_patterns", [])
        pos = [p for p in pats if not p.startswith("-")]
        neg = [p[1:] for p in pats if p.startswith("-")]
        if not any(fnmatch.fnmatch(index_id, p) for p in pos):
            continue
        if any(fnmatch.fnmatch(index_id, p) for p in neg):
            continue
        if best is None or tpl.get("priority", 0) > best.get("priority", 0):
            best = tpl
    return dict(best) if best else None


def apply_template(
    indexes: dict[str, Any], templates: dict[str, Any], index_id: str
) -> dict[str, Any] | None:
    """Auto-create ``index_id`` from the best-matching template
    (IndexTemplate::apply_template, index_template/mod.rs:57-82): the
    template's doc_mapping / settings become the new index's config.
    Returns the create_index result, or None when no template matches."""
    tpl = find_matching_template(templates, index_id)
    if tpl is None:
        return None
    cfg = {
        "index_id": index_id,
        "doc_mapping": tpl.get("doc_mapping", {}),
        "search_settings": tpl.get("search_settings") or {},
        "indexing_settings": tpl.get("indexing_settings") or {},
    }
    if tpl.get("retention"):
        cfg["retention"] = tpl["retention"]
    if tpl.get("index_root_uri"):
        cfg["index_uri"] = f"{tpl['index_root_uri'].rstrip('/')}/{index_id}"
    return create_index(indexes, cfg)


def reset_source_checkpoint(
    indexes: dict[str, Any], index_id: str, source_id: str
) -> None:
    """``PUT .../sources/{source_id}/reset-checkpoint`` analog
    (index_api/source_resource.rs:238 → metastore ResetSourceCheckpoint):
    wipes the source's committed positions so the next pipeline run replays
    from the beginning. The source config itself is untouched."""
    if index_id not in indexes:
        raise IndexNotFoundError(f"index [{index_id}] not found")
    mapping = indexes[index_id]
    sources = getattr(mapping, "sources", {})
    if source_id not in sources:
        raise IndexNotFoundError(
            f"source [{source_id}] not found in index [{index_id}]"
        )
    mapping.source_checkpoints[source_id] = {}


def _index_metadata_dict(index_id: str, mapping) -> dict[str, Any]:
    """IndexMetadata serde shape (quickwit-metastore index_metadata
    serialization: version / index_config / sources / checkpoint /
    create_timestamp), rebuilt from the registered mapping."""
    fields = []
    for f in getattr(mapping, "field_mappings", []):
        ftype = f.type
        if getattr(f, "multi", False):
            ftype = f"array<{ftype}>"
        fields.append({"name": f.name, "type": ftype})
    cfg = {
        "index_id": index_id,
        "doc_mapping": {
            "mode": mapping.mode,
            "field_mappings": fields,
            "timestamp_field": mapping.timestamp_field,
            "tag_fields": sorted(mapping.tag_fields),
            "store_source": mapping.store_source,
            "partition_key": mapping.partition_key,
            "max_num_partitions": mapping.max_num_partitions,
            "doc_mapping_uid": getattr(mapping, "doc_mapping_uid", 1),
        },
        "search_settings": {
            "default_search_fields": list(mapping.default_search_fields)
        },
    }
    retention = getattr(mapping, "retention_policy", None)
    if retention:
        cfg["retention"] = dict(retention)
    return {
        "version": "0.9",
        "index_config": cfg,
        "sources": [dict(s) for _sid, s in sorted(getattr(mapping, "sources", {}).items())],
        "checkpoint": {
            sid: dict(cp)
            for sid, cp in sorted(getattr(mapping, "source_checkpoints", {}).items())
        },
    }


def get_index_metadata(indexes: dict[str, Any], index_id: str) -> dict[str, Any]:
    """``GET /api/v1/indexes/{index_id}`` analog
    (index_api/index_resource.rs:42-65 get_index_metadata): the full
    IndexMetadata document; unknown index → NotFound."""
    if index_id not in indexes:
        raise IndexNotFoundError(f"index [{index_id}] not found")
    return _index_metadata_dict(index_id, indexes[index_id])


def list_indexes_metadata(
    indexes: dict[str, Any], index_id_patterns: str | list[str] | None = None
) -> list[dict[str, Any]]:
    """``GET /api/v1/indexes?index_id_patterns=...`` analog
    (index_resource.rs:69-90 ListIndexesQueryParams): comma-separated or
    list patterns with ``*`` wildcards; no patterns → every index. Results
    sort by index id (stable for pagination-free listings)."""
    import fnmatch

    if index_id_patterns is None:
        pats = ["*"]
    elif isinstance(index_id_patterns, str):
        pats = [p.strip() for p in index_id_patterns.split(",") if p.strip()]
    else:
        pats = list(index_id_patterns)
    for p in pats:
        if not p or p.startswith("-"):
            raise ValueError(f"invalid index id pattern [{p}]")
    chosen = sorted(
        name for name in indexes if any(fnmatch.fnmatch(name, p) for p in pats)
    )
    return [_index_metadata_dict(n, indexes[n]) for n in chosen]


def parse_query(
    query: str, search_fields: list[str] | None = None
) -> dict[str, Any]:
    """``POST /api/v1/parse-query`` analog (index_api/rest_handler.rs:
    176-207 parse_query_request): parse a user query string into the tagged
    QueryAst JSON, with an optional ``search_field`` default-fields
    override; parse errors surface as ValueError (the reference's error
    response)."""
    from quickwit_spark.operators.query import ast_to_dict

    compiler = QueryCompiler(None, default_fields=tuple(search_fields or ()))
    return ast_to_dict(compiler.parse(query))


def es_count(
    df: DataFrame,
    body: dict[str, Any] | None = None,
    field_types: dict[str, str] | None = None,
    default_fields: tuple[str, ...] = (),
) -> dict[str, Any]:
    """ES ``GET/POST {index}/_count`` (elasticsearch_api/rest_handler.rs:
    657-672 es_compat_index_count): run the query with hit fetching
    suppressed and exact total tracking forced, return ``{"count": N}``."""
    page = dict(body or {})
    page["size"] = 0
    page["track_total_hits"] = True
    res = es_search(df, page, field_types=field_types, default_fields=default_fields)
    return {"count": res["hits"]["total"]["value"]}


def clear_scroll() -> dict[str, Any]:
    """ES ``DELETE _elastic/_search/scroll`` — the scroll protocol here is
    client-carried state (see :func:`es_scroll`), so there is nothing to
    free server-side; the reference returns the same constant
    (rest_handler.rs:453-457 es_compat_delete_scroll)."""
    return {"succeeded": True, "num_freed": 0}


def analyze_text(
    spark, text: str, tokenizer: str = "default", **tok_kwargs
) -> list[dict[str, Any]]:
    """``POST /api/v1/analyze`` analog (index_api/rest_handler.rs
    analyze_request → doc_mapper analyze_text): tokenize ``text`` with a
    named tokenizer and return tantivy-Token-shaped dicts
    (text/position/offset_from/offset_to/position_length).

    Runs the SAME Column tokenizer used at indexing time over a one-row
    frame — the debug endpoint can never diverge from the ingest path.
    Offsets are reconstructed by a sequential case-insensitive scan of the
    original text (exact for the sequential tokenizers; best-effort for
    overlapping ngram output)."""
    from quickwit_spark.functions.tokenizers import TOKENIZERS

    if tokenizer not in TOKENIZERS:
        raise ValueError(
            f"unknown tokenizer {tokenizer!r}; available: {sorted(TOKENIZERS)}"
        )
    fn = TOKENIZERS[tokenizer]
    df = spark.createDataFrame([(text,)], "t string")
    col = fn(F.col("t"), **tok_kwargs) if tok_kwargs else fn(F.col("t"))
    tokens = df.select(col.alias("tokens")).first().tokens or []

    out = []
    hay = text.casefold()
    cursor = 0
    for pos, tok in enumerate(tokens):
        needle = str(tok).casefold()
        at = hay.find(needle, cursor)
        if at < 0:  # overlapping tokenizers (ngram) rewind
            at = hay.find(needle)
        start = at if at >= 0 else 0
        end = start + len(tok)
        if at >= 0:
            cursor = max(cursor, start + 1)
        out.append(
            {
                "text": str(tok),
                "position": pos,
                "offset_from": start,
                "offset_to": end,
                "position_length": 1,
            }
        )
    return out


# ---------------------------------------------------------------------------
# list_terms: GET /api/v1/{index}/terms (quickwit-native term listing)
# ---------------------------------------------------------------------------


def list_terms(
    spark,
    df: DataFrame,
    field: str,
    field_types: dict[str, str] | None = None,
    start_key: str | None = None,
    end_key: str | None = None,
    max_hits: int | None = None,
    indexed_fields: set[str] | None = None,
) -> list[Any]:
    """Sorted distinct terms of ``field`` — the root_list_terms analog
    (quickwit-search/src/list_terms.rs: leaves stream their term
    dictionaries over ``[start_key, end_key)`` capped at max_hits, the root
    sort-merges and truncates; much simpler than search since no docs are
    fetched).

    Term semantics follow the index, not the raw value: tokenized text
    fields list post-tokenization TOKENS (the term dictionary IS the token
    space); raw/numeric/datetime fields list stored values. Errors mirror
    the reference: unknown field and non-indexed field are invalid-query
    errors (list_terms.rs:74-85).

    Spark shape: partial-aggregated distinct, range filter pushed into the
    scan, TakeOrdered for the cap — no global sort of the term space.
    """
    ftypes = field_types or {}
    if field not in ftypes and field not in df.columns:
        raise ValueError(
            f"failed to list terms in `{field}`, field doesn't exist"
        )
    if indexed_fields is not None and field not in indexed_fields:
        raise ValueError("trying to list terms on field which isn't indexed")
    kind = ftypes.get(field, "raw")
    if kind == "text":
        from quickwit_spark.functions.tokenizers import tokenize_default

        terms = df.select(
            F.explode(tokenize_default(F.col(field))).alias("term")
        )
    else:
        terms = df.select(F.col(field).alias("term"))
    terms = terms.filter(F.col("term").isNotNull())

    def _range_key(key, label):
        # the reference's term dictionary is byte-ordered; here range keys
        # compare in the column's NATIVE type order (documented divergence
        # for numeric/datetime fields: -5 < 10 here, but "10" < "-5" in
        # byte order). An unconvertible key is an invalid-query error, not
        # a silent null filter returning an empty listing.
        import datetime as _dt

        dt = terms.schema["term"].dataType.simpleString()
        if dt == "string":
            return F.lit(key)
        try:
            if dt in ("bigint", "int", "smallint", "tinyint"):
                return F.lit(int(key))
            if dt in ("double", "float"):
                return F.lit(float(key))
            if dt.startswith("timestamp") or dt == "date":
                return F.lit(_dt.datetime.fromisoformat(str(key)))
        except (TypeError, ValueError) as err:
            raise ValueError(
                f"invalid `{label}` {key!r} for field `{field}` of type {dt}"
            ) from err
        raise ValueError(
            f"range keys are not supported on field `{field}` of type {dt}"
        )

    if start_key is not None:
        terms = terms.filter(F.col("term") >= _range_key(start_key, "start_key"))
    if end_key is not None:
        terms = terms.filter(F.col("term") < _range_key(end_key, "end_key"))
    distinct = terms.distinct().orderBy(F.col("term").asc())
    if max_hits is not None:
        distinct = distinct.limit(int(max_hits))
    return [r["term"] for r in distinct.collect()]


def list_terms_index(
    spark,
    out_dir: str,
    field: str,
    field_types: dict[str, str] | None = None,
    start_timestamp=None,
    end_timestamp=None,
    **kwargs,
) -> list[Any]:
    """:func:`list_terms` over a janitor-managed index with the reference's
    metastore-side time pruning (list_terms.rs:97-105: splits outside
    [start_timestamp, end_timestamp) are never opened, so their terms do
    not appear — term listing is split-granular by design)."""
    from quickwit_spark.pipeline.janitor import prune_splits, read_index_commits

    commits = prune_splits(spark, out_dir, start_timestamp, end_timestamp)
    return list_terms(
        spark, read_index_commits(spark, out_dir, commits), field,
        field_types, **kwargs,
    )


# ---------------------------------------------------------------------------
# delete-task API: POST/GET /api/v1/{index}/delete-tasks
# ---------------------------------------------------------------------------


def _ast_fields(ast) -> set[str]:
    """Every concrete field name a compiled query AST touches."""
    from quickwit_spark.operators.query import Bool

    out: set[str] = set()
    if isinstance(ast, Bool):
        for clause in (*ast.must, *ast.should, *ast.must_not, *ast.filter):
            out |= _ast_fields(clause)
    elif hasattr(ast, "field"):
        out.add(ast.field)
    return out


def create_delete_task(
    spark,
    out_dir: str,
    request: dict[str, Any],
    field_types: dict[str, str] | None = None,
    default_fields: tuple[str, ...] = (),
    ts_field: str = "ts",
) -> dict[str, Any]:
    """``POST /{index}/delete-tasks`` analog (delete_task_api/handler.rs:
    DeleteQueryRequest is deny_unknown_fields; the query parses against the
    doc mapping with optional ``search_field`` overriding the defaults;
    start/end_timestamp bound the delete to ``ts >= start AND ts < end``).

    The reference QUEUES the task for its janitor; here the janitor runs
    availableNow-style, so the task is applied before returning — same
    contract a caller observes after the reference's janitor cycle.
    Returns the DeleteTask shape (create_timestamp, opstamp, delete_query).
    """
    import time as _time

    from quickwit_spark.pipeline.janitor import delete_by_query

    allowed = {"query", "search_field", "start_timestamp", "end_timestamp"}
    unknown = set(request) - allowed
    if unknown:
        raise ValueError(f"unknown field `{sorted(unknown)[0]}` in delete query request")
    query = request.get("query")
    if query is None or not str(query).strip():
        # `query` is a REQUIRED field of the deny_unknown_fields request —
        # an absent/empty query must 400, never silently delete everything
        # (an explicit "*" remains a legitimate delete-all)
        raise ValueError("invalid delete query request: `query` is required")
    query = str(query)
    search_field = request.get("search_field")
    if isinstance(search_field, str):
        raise ValueError(
            "invalid delete query request: `search_field` must be an array"
        )
    fields = tuple(search_field or default_fields)
    compiler = QueryCompiler(field_types, default_fields=fields)
    try:
        ast = compiler.parse(query)
    except ValueError as err:
        raise ValueError(f"invalid delete query: {err}") from err
    if field_types is not None and compiler.dynamic_col is None:
        # semantic validation against the mapping (the reference parses the
        # query against the doc mapper at task-creation time): unknown
        # fields are a request error, not a later executor crash
        for fld in _ast_fields(ast):
            if fld not in field_types:
                raise ValueError(
                    f"invalid delete query: unknown field `{fld}`"
                )
    start = request.get("start_timestamp")
    end = request.get("end_timestamp")
    # DeleteQueryRequest types these i64 (delete_task_api handler) — a
    # non-integer must 400 here, not be interpolated into the query string
    # where stray query syntax would change the delete's semantics
    for label, val in (("start_timestamp", start), ("end_timestamp", end)):
        if val is not None and (isinstance(val, bool) or not isinstance(val, int)):
            raise ValueError(
                f"invalid delete query request: `{label}` must be an integer"
            )
    effective = f"({query})" if query.strip() not in ("", "*") else "*"
    if start is not None or end is not None:
        import datetime as _dt

        def _rfc3339(epoch_secs):
            return _dt.datetime.fromtimestamp(
                epoch_secs, tz=_dt.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")

        lo = _rfc3339(start) if start is not None else "*"
        hi = _rfc3339(end) if end is not None else "*"
        bound = f"{ts_field}:[{lo} TO {hi}}}"
        effective = bound if effective == "*" else f"{effective} AND {bound}"
    result = delete_by_query(spark, out_dir, effective, compiler)
    task = {
        "create_timestamp": int(_time.time()),
        "opstamp": result["opstamp"],
        "delete_query": {
            "query": query,
            "start_timestamp": start,
            "end_timestamp": end,
        },
    }
    # enrich the janitor's write-ahead record so GET /delete-tasks can return
    # the full task shape later
    import os as _os

    path = _os.path.join(out_dir, "_deletes", f"{result['opstamp']}.json")
    with open(path) as fh:
        record = _json.load(fh)
    record["task"] = task
    with open(path, "w") as fh:
        _json.dump(record, fh)
    return task


def list_delete_tasks(out_dir: str) -> list[dict[str, Any]]:
    """``GET /{index}/delete-tasks`` analog: every delete task ever created
    on the index, oldest-first by opstamp (metastore list_delete_tasks)."""
    import glob as _glob
    import os as _os

    tasks = []
    for p in sorted(
        _glob.glob(_os.path.join(out_dir, "_deletes", "*.json")),
        key=lambda p: int(_os.path.basename(p).split(".")[0]),
    ):
        with open(p) as fh:
            record = _json.load(fh)
        tasks.append(
            record.get("task")
            or {"opstamp": record["opstamp"],
                "delete_query": {"query": record.get("query", "")}}
        )
    return tasks


# ---------------------------------------------------------------------------
# SQL over indexes (datafusion_api analog — Spark SQL IS the engine here)
# ---------------------------------------------------------------------------


def register_sql_views(spark, indexes: dict[str, str]) -> list[str]:
    """Register each janitor-managed index as a temp view so arbitrary
    ``spark.sql`` runs against it — the analog of the fork's DataFusion SQL
    endpoint (quickwit-serve/src/datafusion_api: mounts a SQL session over
    the parquet engine). Partition pruning on ``commit``/``sink`` and
    parquet filter pushdown apply to any SQL the user writes. Index ids
    validate against the index-id rule, then map to LEGAL Spark view
    identifiers (`-`/`.` are valid in Quickwit ids but not in temp view
    names): non-identifier characters become `_`. Returns the actual view
    names in input order; a sanitization collision is an error."""
    import re as _re2

    from quickwit_spark.pipeline.janitor import read_index

    names = []
    for name, out_dir in indexes.items():
        if not _INDEX_ID_RE.match(name):
            raise ValueError(f"invalid index id [{name}]")
        view = _re2.sub(r"[^0-9A-Za-z_]", "_", name)
        if view in names:
            raise ValueError(
                f"index id [{name}] collides with another registered view "
                f"after identifier sanitization ([{view}])"
            )
        read_index(spark, out_dir).createOrReplaceTempView(view)
        names.append(view)
    return names
