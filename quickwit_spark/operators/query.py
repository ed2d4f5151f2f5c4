"""Query AST + query-string parser → Catalyst Column predicates.

Mirrors Quickwit's query surface (quickwit-query/src/query_ast/mod.rs:59-77
and docs/reference/query-language.md — studied for behavior): Bool, Term,
TermSet, FieldPresence (exists), FullText (match), Phrase (slop),
PhrasePrefix, Range ([a TO b} bounds, half-open *), Wildcard, Regex,
MatchAll, MatchNone. Grammar: AND / OR / NOT / ``-`` / parentheses /
implicit AND; AND binds tighter than OR (query-language.md:230-236).

Every node compiles to a boolean Column over typed columns — the filters the
reference answers with an inverted index are answered by Catalyst predicates
(pushed to the parquet scan where possible: equality/range/isNotNull push
down; tokenized matches stay as JVM regex/array ops in codegen).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dfield
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quickwit_spark.functions.tokenizers import tokenize_default

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class MatchAll:
    pass


@dataclass
class MatchNone:
    pass


@dataclass
class Term:
    field: str
    value: str
    # query-string terms are ANALYZED (run through the field's normalizer →
    # lowercased for text); ES DSL `term` is NOT (term_query.rs: the value
    # must match the post-tokenization form exactly, so `PushEvent` misses
    # lowercased tokens unless case_insensitive is set)
    analyzed: bool = True
    case_insensitive: bool = False


@dataclass
class TermSet:
    field: str
    values: tuple[str, ...]
    analyzed: bool = True
    case_insensitive: bool = False


@dataclass
class Exists:
    field: str


@dataclass
class FullText:
    field: str
    text: str
    operator: str = "or"  # or|and
    # ES zero_terms_query: a query that tokenizes to nothing matches NONE by
    # default (0003-match.yaml: `match: ","` → 0 hits), or ALL when "all"
    zero_terms_query: str = "none"


@dataclass
class Phrase:
    field: str
    text: str
    slop: int = 0


@dataclass
class PhrasePrefix:
    field: str
    text: str


@dataclass
class Wildcard:
    field: str
    pattern: str
    analyzed: bool = True  # DSL wildcard/prefix are case-sensitive by default
    case_insensitive: bool = False


@dataclass
class Regex:
    field: str
    pattern: str
    # regex is NEVER analyzed (regex_query.rs) — only the explicit ES
    # case_insensitive flag relaxes case
    case_insensitive: bool = False


@dataclass
class Range:
    field: str
    lower: Any = None
    upper: Any = None
    lower_inclusive: bool = True
    upper_inclusive: bool = True


@dataclass
class Bool:
    must: list = dfield(default_factory=list)
    should: list = dfield(default_factory=list)
    must_not: list = dfield(default_factory=list)
    filter: list = dfield(default_factory=list)
    # ES/tantivy default: should is REQUIRED only when no must/filter clause
    # exists (bool_query.rs builds minimum_should_match=0 otherwise).
    # Accepts ints, negative ints (= n_should + msm) and "NN%" strings with
    # the reference's clamping (0009-bool_query.yaml vectors): a pure-should
    # bool never drops below 1; an impossible msm (> n_should) matches none.
    minimum_should_match: int | str | None = None


QueryAst = Any


# ---------------------------------------------------------------------------
# Field typing for compilation
# ---------------------------------------------------------------------------


@dataclass
class FieldInfo:
    """How a field compiles: ``kind`` ∈ text (tokenized), raw (exact string),
    numeric, datetime, bool, ip (IPv6-normalized, u128-ordered ranges),
    concat_raw / concat_default (concatenate virtual fields — array<string>
    of gathered source values, matched with the CONCAT field's own tokenizer
    per field_mapping_entry.rs:662+)."""

    kind: str = "raw"


def _literal(info: FieldInfo, v: str):
    if info.kind == "numeric":
        try:
            return int(v)
        except ValueError:
            return float(v)
    if info.kind == "bool":
        return v.lower() == "true"
    return v


# ---------------------------------------------------------------------------
# Compiler
# ---------------------------------------------------------------------------


_DOCMAPPER_KIND = {
    "text": "text",
    "u64": "numeric",
    "i64": "numeric",
    "f64": "numeric",
    "bool": "bool",
    "ip": "ip",
    "datetime": "datetime",
    # bytes/json/object/concatenate compare as raw strings
}


class QueryCompiler:
    def __init__(
        self,
        field_types: dict[str, str] | None = None,
        default_fields: tuple[str, ...] = (),
        dynamic_col: str | None = None,
    ):
        """``dynamic_col``: name of the docmapper's dynamic-capture JSON
        column (``_dynamic``). When set, UNDECLARED fields compile against it
        via JSON extraction — Quickwit's mode=dynamic makes every captured
        field queryable (doc_mapper dynamic tokenizer semantics: values
        tokenize with `default`)."""
        self.field_types = {k: FieldInfo(v) for k, v in (field_types or {}).items()}
        self.default_fields = default_fields
        self.dynamic_col = dynamic_col
        # optional DataFrame schema (set by where()/es_search): lets Exists
        # on an object field test leaf presence instead of struct nullness
        self.schema = None

    def _dynamic_value(self, field: str) -> Column:
        return F.get_json_object(F.col(self.dynamic_col), "$." + field)

    def _declared_json_parent(self, field: str) -> tuple[str, str] | None:
        """(parent, subpath) when ``field`` is a dotted path under a declared
        json-kind field (``json_fast.field_c``), else None."""
        parts = field.split(".")
        for i in range(len(parts) - 1, 0, -1):
            head = ".".join(parts[:i])
            info = self.field_types.get(head)
            if info is not None and info.kind == "json":
                return head, ".".join(parts[i:])
        return None

    def _exists_pred(self, field: str) -> Column:
        """``exists`` semantics: for object/json fields, a doc matches only
        if SOME leaf under the field is present (the reference stores
        per-leaf field-presence hashes, doc_mapper_impl.rs:554-560 — an
        empty object ``{}`` counts as missing). json-kind fields (JSON-string
        columns) and their dotted sub-paths use the leaf test on the JSON
        text (qw_search_api/0003 vectors: ``json_fast:*``,
        ``json_fast.field_c:*``). Object fields need the frame schema to
        enumerate leaves (set by where()/es_search); without it, falls back
        to struct nullness."""
        from pyspark.sql import types as T

        info = self.field_types.get(field)
        if info is not None and info.kind == "json":
            return _json_leaf_exists(F.col(field))
        jp = self._declared_json_parent(field)
        if jp is not None:
            parent, sub = jp
            return _json_leaf_exists(F.get_json_object(F.col(parent), "$." + sub))
        if self.schema is None:
            return F.col(field).isNotNull()
        dt = _resolve_field_type(self.schema, field)
        if dt is None:
            # unmapped field: ES answers 0 hits, not an error (0011 vector)
            return F.lit(False)
        if not isinstance(dt, T.StructType):
            return F.col(field).isNotNull()
        preds = [F.col(leaf).isNotNull() for leaf in _leaf_paths(dt, field)]
        if not preds:
            return F.lit(False)
        # balanced OR tree: wide real-world schemas (gharchive payload has
        # hundreds of leaves) overflow the column-conversion stack if chained
        # linearly
        while len(preds) > 1:
            preds = [
                preds[i] | preds[i + 1] if i + 1 < len(preds) else preds[i]
                for i in range(0, len(preds), 2)
            ]
        return preds[0]

    @classmethod
    def from_doc_mapping(
        cls, mapping, default_fields: tuple[str, ...] | None = None
    ) -> "QueryCompiler":
        """Build the compiler from a docmapper ``DocMapping`` — the same type
        table drives ingest coercion AND query compilation (doc_mapper is the
        single source of field truth in the reference too). Text fields with
        a raw tokenizer compile as exact strings; concatenate fields pick
        concat_raw/concat_default from their OWN tokenizer; json fields get
        leaf-value matching; mode=dynamic wires `_dynamic` extraction for
        undeclared fields."""
        types: dict[str, str] = {}

        def walk(fms, prefix=""):
            for fm in fms:
                name = f"{prefix}{fm.name}"
                tok = getattr(fm, "tokenizer", "default") or "default"
                if fm.type == "object":
                    walk(fm.fields, prefix=f"{name}.")
                elif fm.type == "concatenate":
                    types[name] = "concat_raw" if tok.startswith("raw") else "concat_default"
                elif fm.type == "text" and tok.startswith("raw"):
                    types[name] = "raw"
                elif fm.type == "json":
                    types[name] = "json"
                else:
                    types[name] = _DOCMAPPER_KIND.get(fm.type, "raw")

        walk(mapping.field_mappings)
        dyn = "_dynamic" if getattr(mapping, "mode", "dynamic") == "dynamic" else None
        if default_fields is None:
            # the index's own search_settings.default_search_fields apply
            # unless the caller overrides (create_index stores them on the
            # mapping) — without this, a configured index still rejected
            # bare terms
            default_fields = tuple(getattr(mapping, "default_search_fields", ()) or ())
        return cls(types, default_fields=default_fields, dynamic_col=dyn)

    def info(self, field: str) -> FieldInfo:
        default = "dynamic" if self.dynamic_col is not None else "raw"
        return self.field_types.get(field, FieldInfo(default))

    def compile(self, ast: QueryAst) -> Column:
        if isinstance(ast, MatchAll):
            return F.lit(True)
        if isinstance(ast, MatchNone):
            return F.lit(False)
        if isinstance(ast, Term):
            info = self.info(ast.field)
            jp = self._declared_json_parent(ast.field)
            if ast.field not in self.field_types and jp is not None:
                # dotted path under a DECLARED json field (mapping wins over
                # dynamic capture): match the extracted leaf like a dynamic
                # value (default_search_fields/0001: `inner_json.somefieldinjson`)
                parent, sub = jp
                dv = F.get_json_object(F.col(parent), "$." + sub)
                v = ast.value.lower() if (ast.analyzed or ast.case_insensitive) else ast.value
                return F.array_contains(tokenize_default(dv), v) | (
                    dv == F.lit(ast.value)
                )
            if info.kind == "dynamic":
                # dynamic fields tokenize with the default tokenizer; numbers
                # and bools stored as JSON come back as their literal text,
                # matched as a single exact token (like concat fields)
                v = ast.value.lower() if (ast.analyzed or ast.case_insensitive) else ast.value
                dv = self._dynamic_value(ast.field)
                return F.array_contains(tokenize_default(dv), v) | (
                    dv == F.lit(ast.value)
                )
            c = F.col(ast.field)
            if info.kind == "text":
                # default-tokenizer tokens are lowercased, so an analyzed or
                # case-insensitive lookup lowers the value; a raw DSL term
                # must match the post-tokenization form exactly
                v = ast.value.lower() if (ast.analyzed or ast.case_insensitive) else ast.value
                return F.array_contains(tokenize_default(c), v)
            if info.kind == "datetime":
                from quickwit_spark.functions.datetime import parse_query_datetime

                return c == F.lit(parse_query_datetime(ast.value))
            if info.kind == "ip":
                from quickwit_spark.functions.ip import ip_normalize

                return c == F.lit(ip_normalize(ast.value))
            if info.kind == "json":
                # json-string column (json field / `_dynamic`): match LEAF
                # values — keys are stripped before tokenizing so a term only
                # hits values (default_search_fields vectors: bare `allo`
                # finds {"somefieldinjson": "allo"})
                v = ast.value.lower() if (ast.analyzed or ast.case_insensitive) else ast.value
                leaves = F.regexp_replace(c, r'"[^"]*"\s*:', " ")
                return F.array_contains(tokenize_default(leaves), v)
            if info.kind == "concat_raw":
                # each gathered value is ONE raw token
                return F.array_contains(c, ast.value)
            if info.kind == "concat_default":
                # string values tokenize with the concat field's default
                # tokenizer; gathered numbers/bools are single exact tokens
                # (concat_default:1.5 must hit the float doc even though the
                # text tokenizer would split on '.')
                v = ast.value.lower() if (ast.analyzed or ast.case_insensitive) else ast.value
                return F.exists(
                    c,
                    lambda item: F.array_contains(tokenize_default(item), v)
                    | (item == F.lit(ast.value)),
                )
            if info.kind == "raw" and ast.case_insensitive:
                return F.lower(c) == F.lit(str(ast.value).lower())
            return c == F.lit(_literal(info, ast.value))
        if isinstance(ast, TermSet):
            info = self.info(ast.field)
            c = F.col(ast.field)
            if info.kind == "text":
                toks = tokenize_default(c)
                vals = [
                    v.lower() if (ast.analyzed or ast.case_insensitive) else v
                    for v in ast.values
                ]
                return F.arrays_overlap(toks, F.array(*[F.lit(v) for v in vals]))
            if info.kind == "ip":
                from quickwit_spark.functions.ip import ip_normalize

                return c.isin([ip_normalize(v) for v in ast.values])
            return c.isin([_literal(info, v) for v in ast.values])
        if isinstance(ast, Exists):
            # a dotted path under a DECLARED json field resolves against that
            # field even in dynamic mode (mapping wins over dynamic capture)
            if self._declared_json_parent(ast.field) is not None:
                return self._exists_pred(ast.field)
            if (
                ast.field not in self.field_types
                and self.info(ast.field).kind == "dynamic"
            ):
                return self._dynamic_value(ast.field).isNotNull()
            return self._exists_pred(ast.field)
        if isinstance(ast, FullText):
            toks = [t for t in re.split(r"[^\w]+", ast.text.lower()) if t]
            if not toks:
                return F.lit(ast.zero_terms_query == "all")
            col_toks = tokenize_default(F.col(ast.field))
            preds = [F.array_contains(col_toks, t) for t in toks]
            out = preds[0]
            for p in preds[1:]:
                out = (out & p) if ast.operator == "and" else (out | p)
            return out
        if isinstance(ast, Phrase):
            info = self.info(ast.field)
            if info.kind == "raw":
                # a raw-tokenized field has ONE token = the whole value, so a
                # phrase can only match the exact string
                # (qw_search_api/0004_exact_string.yaml)
                return F.col(ast.field) == F.lit(ast.text)
            toks = [re.escape(t) for t in re.split(r"[^\w]+", ast.text.lower()) if t]
            if not toks:
                return F.lit(True)
            sep = r"[^\w]+" if ast.slop == 0 else r"[^\w]+(\w+[^\w]+){0,%d}" % ast.slop
            pattern = r"(^|[^\w])" + sep.join(toks) + r"($|[^\w])"
            return F.lower(F.col(ast.field)).rlike(pattern)
        if isinstance(ast, PhrasePrefix):
            info = self.info(ast.field)
            if info.kind == "raw":
                return F.col(ast.field).startswith(ast.text)
            toks = [re.escape(t) for t in re.split(r"[^\w]+", ast.text.lower()) if t]
            if not toks:
                return F.lit(True)
            pattern = r"(^|[^\w])" + r"[^\w]+".join(toks) + r"\w*"
            return F.lower(F.col(ast.field)).rlike(pattern)
        if isinstance(ast, Wildcard):
            info = self.info(ast.field)
            lowered = ast.analyzed or ast.case_insensitive
            if info.kind == "text":
                # wildcard runs over tokenized terms (wildcard_query.rs:60-98):
                # the pattern must match a WHOLE token. Query-string wildcards
                # are normalized like the field (lowercased); DSL wildcards
                # are case-sensitive unless case_insensitive is set.
                pat = _wildcard_to_regex(ast.pattern.lower() if lowered else ast.pattern)
                return F.exists(
                    tokenize_default(F.col(ast.field)), lambda t: t.rlike(pat)
                )
            c = F.col(ast.field)
            if ast.case_insensitive:
                return F.lower(c).rlike(_wildcard_to_regex(ast.pattern.lower()))
            pred = c.rlike(_wildcard_to_regex(ast.pattern))
            prefix = _wildcard_literal_prefix(ast.pattern)
            if prefix:
                # zonemap-style pruning (the reference's parquet-engine regex
                # zonemap, automaton.rs behavior): the pattern's literal
                # prefix becomes a StringStartsWith conjunct that Catalyst
                # pushes to parquet row-group min/max stats — the regex
                # itself never pushes down
                pred = c.startswith(prefix) & pred
            return pred
        if isinstance(ast, Regex):
            info = self.info(ast.field)
            flags = "(?i)" if ast.case_insensitive else ""
            if info.kind == "text":
                # tantivy RegexQuery matches full terms in the field's token
                # stream (regex_query.rs) — anchor per token, not per raw
                # value; the pattern itself is never analyzed
                pat = flags + "^(?:" + ast.pattern + ")$"
                return F.exists(
                    tokenize_default(F.col(ast.field)), lambda t: t.rlike(pat)
                )
            # tantivy regexes are implicitly anchored (`(re)` ≡ `^(re)$`)
            pred = F.col(ast.field).rlike(flags + "^(?:" + ast.pattern + ")$")
            if not ast.case_insensitive:
                prefix = _regex_literal_prefix(ast.pattern)
                if prefix:
                    # zonemap prefix guard (see Wildcard above)
                    pred = F.col(ast.field).startswith(prefix) & pred
            return pred
        if isinstance(ast, Range):
            info = self.info(ast.field)
            if info.kind == "ip":
                # ips are stored in docmapper's normalized string form; order
                # them by the 32-hex-digit expanded u128 form (u128 compare,
                # mapping_tree.rs stores IpV6 values numerically)
                from quickwit_spark.functions.ip import ip_sortable_col, ip_sortable_literal

                c = ip_sortable_col(F.col(ast.field))
                conds = []
                if ast.lower is not None:
                    lo = F.lit(ip_sortable_literal(ast.lower))
                    conds.append(c >= lo if ast.lower_inclusive else c > lo)
                if ast.upper is not None:
                    hi = F.lit(ip_sortable_literal(ast.upper))
                    conds.append(c <= hi if ast.upper_inclusive else c < hi)
                if not conds:
                    return F.col(ast.field).isNotNull()
                out = conds[0]
                for p in conds[1:]:
                    out = out & p
                return out
            if info.kind == "dynamic":
                # numeric range over the extracted dynamic value (JSON
                # numbers come back as text; cast both sides to double)
                c = self._dynamic_value(ast.field).cast("double")

                def _num(v):
                    return F.lit(float(v))

                conds = []
                if ast.lower is not None:
                    lo = _num(ast.lower)
                    conds.append(c >= lo if ast.lower_inclusive else c > lo)
                if ast.upper is not None:
                    hi = _num(ast.upper)
                    conds.append(c <= hi if ast.upper_inclusive else c < hi)
                if not conds:
                    return self._dynamic_value(ast.field).isNotNull()
                out = conds[0]
                for p in conds[1:]:
                    out = out & p
                return out
            c = F.col(ast.field)
            conds = []
            if ast.lower is not None:
                lo = _range_lit(info, ast.lower)
                conds.append(c >= lo if ast.lower_inclusive else c > lo)
            if ast.upper is not None:
                hi = _range_lit(info, ast.upper)
                conds.append(c <= hi if ast.upper_inclusive else c < hi)
            if not conds:
                return c.isNotNull()
            out = conds[0]
            for p in conds[1:]:
                out = out & p
            return out
        if isinstance(ast, Bool):
            out = F.lit(True)
            for q in ast.must + ast.filter:
                out = out & self.compile(q)
            n_should = len(ast.should)
            has_anchor = bool(ast.must or ast.filter)
            raw_msm = ast.minimum_should_match
            if raw_msm is None:
                # ES semantics: should clauses are optional once a must/filter
                # clause is present (minimum_should_match defaults to 0), and
                # required (=1) when the bool is pure-should.
                msm = 0 if has_anchor else 1
            else:
                if isinstance(raw_msm, str) and raw_msm.strip().endswith("%"):
                    msm = int(n_should * float(raw_msm.strip()[:-1]) / 100.0)
                else:
                    msm = int(raw_msm)
                if msm < 0:  # -N means "all but N"
                    msm = n_should + msm
                # a pure-should bool still has to match SOMETHING
                msm = max(msm, 0 if has_anchor else 1)
            if ast.should and msm >= 1:
                if msm > n_should:
                    return F.lit(False)  # impossible requirement matches none
                if msm == 1:
                    s = F.lit(False)
                    for q in ast.should:
                        s = s | self.compile(q)
                    out = out & s
                else:
                    n = F.lit(0)
                    for q in ast.should:
                        n = n + _null_as_false(self.compile(q)).cast("int")
                    out = out & (n >= F.lit(msm))
            for q in ast.must_not:
                out = out & ~_null_as_false(self.compile(q))
            return out
        raise TypeError(f"unknown query AST node {ast!r}")

    def parse(self, query: str) -> QueryAst:
        return parse_query(query, default_fields=self.default_fields)

    def where(self, df: DataFrame, query: str) -> DataFrame:
        # no null-coalescing wrapper here: Spark's filter already drops
        # NULL-valued predicates, and wrapping in coalesce(pred, false)
        # blocks parquet filter pushdown (negation inside Bool.must_not is
        # handled null-safely in compile())
        prev = self.schema
        self.schema = df.schema  # enables object-leaf `exists` semantics
        try:
            return df.filter(self.compile(self.parse(query)))
        finally:
            self.schema = prev


def _json_leaf_exists(c: Column) -> Column:
    """True when a JSON text fragment contains ≥1 primitive leaf — empty
    objects/arrays (at any depth) count as MISSING, matching the reference's
    per-leaf field-presence hashes (doc_mapper_impl.rs:554-560). Pure string
    algebra, JVM-side: strip ``"key":`` pairs, collapse remaining string
    literals to a marker, drop ``null`` + structural characters; any residue
    is a leaf value."""
    no_keys = F.regexp_replace(c, r'"([^"\\]|\\.)*"\s*:', "")
    marked = F.regexp_replace(no_keys, r'"([^"\\]|\\.)*"', "S")
    residue = F.regexp_replace(marked, r"null|[{}\[\],\s]", "")
    return c.isNotNull() & (residue != F.lit(""))


def _null_as_false(c: Column) -> Column:
    return F.coalesce(c, F.lit(False))


def _resolve_field_type(schema, field: str):
    """Walk a dotted field name through nested StructTypes; None if any part
    is missing (caller falls back to schema-agnostic compilation)."""
    from pyspark.sql import types as T

    dt = schema
    for part in field.split("."):
        if not isinstance(dt, T.StructType):
            return None
        match = next((f for f in dt.fields if f.name == part), None)
        if match is None:
            return None
        dt = match.dataType
    return dt


def _leaf_paths(dt, prefix: str) -> list[str]:
    """Dotted paths of every non-struct leaf under a StructType (arrays and
    atomics are leaves — their own nullness is the presence signal)."""
    from pyspark.sql import types as T

    out: list[str] = []
    for f in dt.fields:
        path = f"{prefix}.{f.name}"
        if isinstance(f.dataType, T.StructType):
            out.extend(_leaf_paths(f.dataType, path))
        else:
            out.append(path)
    return out


def _range_lit(info: FieldInfo, v: str):
    if info.kind == "datetime":
        from quickwit_spark.functions.datetime import parse_query_datetime

        # lenient query-bound coercion (json_literal.rs list: rfc3339,
        # rfc2822, unit-inferred epoch, %Y-%m-%d, %Y/%m/%d, ...) — a plain
        # timestamp literal in the plan, so pushdown still applies
        return F.lit(parse_query_datetime(v))
    return F.lit(_literal(info, v))


def _wildcard_literal_prefix(pattern: str) -> str:
    """Literal prefix of a wildcard pattern (chars before the first
    unescaped * or ?), for the zonemap-style StartsWith pruning guard."""
    out: list[str] = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch in "*?":
            break
        if ch == "\\":
            if i + 1 >= len(pattern):
                break  # trailing escape dropped, like _wildcard_to_regex
            out.append(pattern[i + 1])
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _regex_literal_prefix(pattern: str) -> str:
    """Longest prefix every match of the (implicitly anchored) regex must
    start with — conservative: empty on anything uncertain. Mirrors the
    intent of the reference parquet-engine's regex zonemap (automaton-walk
    over byte ranges); here the prefix feeds a StartsWith conjunct that
    parquet min/max stats can prune on."""
    # a top-level alternation makes any prefix unsound ("abc|xyz")
    depth = 0
    in_class = False
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "|" and depth == 0:
            return ""
        i += 1

    out: list[str] = []
    meta = set(".^$*+?()[]{}|")
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        nxt = pattern[i + 1] if i + 1 < len(pattern) else ""
        if ch == "\\":
            if nxt and not nxt.isalnum():
                # escaped literal metachar — unless quantified
                after = pattern[i + 2] if i + 2 < len(pattern) else ""
                if after and after in "*+?{":
                    break
                out.append(nxt)
                i += 2
                continue
            break  # \d, \w, \b... character classes end the literal run
        if ch in meta:
            break
        if nxt and nxt in "*+?{":
            break  # a quantified char is not guaranteed
        out.append(ch)
        i += 1
    return "".join(out)


def _wildcard_to_regex(pattern: str) -> str:
    """Reference escape semantics (wildcard_query.rs:44-71): ``\\x`` is the
    literal x (so ``\\*`` matches a star), a trailing lone backslash is
    dropped. MUST stay in lockstep with :func:`_wildcard_literal_prefix` —
    the StartsWith pruning guard is derived from the same grammar."""
    out = ["^"]
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch == "\\":
            if i + 1 >= len(pattern):
                break  # escaping at the end: as if the escape wasn't present
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        else:
            out.append(re.escape(ch))
        i += 1
    out.append("$")
    return "".join(out)


# ---------------------------------------------------------------------------
# Query-string parser (docs/reference/query-language.md)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
      (?P<scope>[\w.\\/@$-]+:(?=\()) |
      (?P<lparen>\() |
      (?P<rparen>\)) |
      (?P<and>AND\b) |
      (?P<or>OR\b) |
      (?P<not>NOT\b) |
      (?P<minus>-(?=\S)) |
      (?P<clause>
          (?:(?P<field>[\w.\\/@$-]+):)?
          (?P<value>
              IN\s*\[[^\]]*\] |
              "(?:[^"\\]|\\.)*"(?:~\d+|\*)? |
              /(?:[^/\\]|\\.)*/ |
              [\[{][^\]}]*\s+TO\s+[^\]}]*[\]}] |
              (?:>=|<=|>|<)[^\s()]+ |
              [^\s()]+
          )
      )
    )
    """,
    re.VERBOSE,
)


def _tokenize_query(q: str) -> list[tuple[str, Any]]:
    tokens = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip() == "":
                break
            raise ValueError(f"cannot tokenize query at {q[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "clause":
            tokens.append(("clause", (m.group("field"), m.group("value"))))
        elif kind == "scope":
            # field-scoped group `field:(...)` (tantivy's query grammar —
            # the group's bare terms resolve against `field` instead of the
            # default search fields)
            tokens.append(("scope", m.group("scope")[:-1]))
        else:
            tokens.append((kind, m.group(0).strip()))
    return tokens


class _QParser:
    def __init__(self, tokens: list, default_fields: tuple[str, ...]):
        self.toks = tokens
        self.i = 0
        self.default_fields = default_fields

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    # OR level (lowest precedence)
    def parse_or(self) -> QueryAst:
        left = self.parse_and()
        shoulds = [left]
        while self.peek()[0] == "or":
            self.next()
            shoulds.append(self.parse_and())
        if len(shoulds) == 1:
            return left
        return Bool(should=shoulds)

    # AND level (binds tighter; implicit AND for adjacent clauses)
    def parse_and(self) -> QueryAst:
        musts = []
        must_nots = []

        def take_unary():
            kind, _ = self.peek()
            if kind in ("not", "minus"):
                self.next()
                must_nots.append(self.parse_unary())
            else:
                musts.append(self.parse_unary())

        take_unary()
        while True:
            kind, _ = self.peek()
            if kind == "and":
                self.next()
                take_unary()
            elif kind in ("clause", "lparen", "not", "minus"):
                take_unary()  # implicit AND
            else:
                break
        if len(musts) == 1 and not must_nots:
            return musts[0]
        return Bool(must=musts, must_not=must_nots)

    def parse_unary(self) -> QueryAst:
        kind, val = self.next()
        if kind == "lparen":
            inner = self.parse_or()
            k, _ = self.next()
            if k != "rparen":
                raise ValueError("expected ')'")
            return inner
        if kind == "scope":
            # `field:(...)`: bare terms inside the group resolve against the
            # scoping field (nested scopes: innermost wins)
            k, _ = self.next()
            if k != "lparen":
                raise ValueError("expected '(' after field scope")
            saved = self.default_fields
            self.default_fields = (val.replace("\\.", "."),)
            try:
                inner = self.parse_or()
            finally:
                self.default_fields = saved
            k, _ = self.next()
            if k != "rparen":
                raise ValueError("expected ')'")
            return inner
        if kind == "clause":
            return self.make_clause(*val)
        raise ValueError(f"unexpected token {kind}")

    def make_clause(self, field: str | None, value: str) -> QueryAst:
        if field is None:
            if value == "*":
                return MatchAll()
            if value.endswith(":"):
                raise ValueError(f"field `{value[:-1]}` has an empty or unparsable value")
            if not self.default_fields:
                raise ValueError(f"bare term {value!r} requires default_search_fields")
            shoulds = [self.make_clause(f, value) for f in self.default_fields]
            return shoulds[0] if len(shoulds) == 1 else Bool(should=shoulds)
        field = field.replace("\\.", ".")
        if value == "*":
            return Exists(field)
        if value.startswith("IN"):
            if "[" not in value or "]" not in value:
                raise ValueError(f"invalid IN set syntax: {value!r}")
            inner = value[value.index("[") + 1 : value.rindex("]")]
            return TermSet(field, tuple(v for v in inner.split() if v))
        if value.startswith('"'):
            m = re.match(r'^"((?:[^"\\]|\\.)*)"(~(\d+)|\*)?$', value)
            if m is None:
                # unterminated / malformed phrase — the reference parser's
                # structured 400, never a crash
                raise ValueError(f"invalid phrase syntax: {value!r}")
            text = m.group(1).replace('\\"', '"')
            if m.group(2) == "*":
                return PhrasePrefix(field, text)
            slop = int(m.group(3)) if m.group(3) else 0
            return Phrase(field, text, slop)
        if value.startswith("/") and value.endswith("/"):
            return Regex(field, value[1:-1])
        if value[0] in "[{" and value[-1] in "]}":
            inner = value[1:-1]
            lo_s, hi_s = re.split(r"\s+TO\s+", inner)
            lo_s, hi_s = lo_s.strip(), hi_s.strip()
            return Range(
                field,
                lower=None if lo_s == "*" else lo_s,
                upper=None if hi_s == "*" else hi_s,
                lower_inclusive=value[0] == "[",
                upper_inclusive=value[-1] == "]",
            )
        m = re.match(r"^(>=|<=|>|<)(.+)$", value)
        if m:
            op, v = m.groups()
            if op == ">=":
                return Range(field, lower=v)
            if op == ">":
                return Range(field, lower=v, lower_inclusive=False)
            if op == "<=":
                return Range(field, upper=v)
            return Range(field, upper=v, upper_inclusive=False)
        if "*" in value or "?" in value:
            return Wildcard(field, value)
        return Term(field, value)


def ast_to_dict(ast: QueryAst) -> dict:
    """Serialize a query AST to the tagged-dict form the search-plan
    endpoint returns (the reference serializes its QueryAst enum with a
    `type` tag — quickwit-query query_ast/mod.rs serde repr)."""
    import dataclasses

    def conv(node):
        if dataclasses.is_dataclass(node) and not isinstance(node, type):
            out = {"type": type(node).__name__.lower()}
            for f in dataclasses.fields(node):
                out[f.name] = conv(getattr(node, f.name))
            return out
        if isinstance(node, (list, tuple)):
            return [conv(x) for x in node]
        return node

    return conv(ast)


def parse_query(query: str, default_fields: tuple[str, ...] = ()) -> QueryAst:
    query = query.strip()
    if not query or query == "*":
        return MatchAll()
    toks = _tokenize_query(query)
    p = _QParser(toks, default_fields)
    ast = p.parse_or()
    if p.i != len(p.toks):
        raise ValueError(f"trailing tokens in query: {p.toks[p.i:]}")
    return ast


# ---------------------------------------------------------------------------
# ES DSL subset → AST (elastic_query_dsl/mod.rs:78-95)
# ---------------------------------------------------------------------------


def es_dsl_to_ast(dsl: dict, default_fields: tuple[str, ...] = ()) -> QueryAst:
    """ES DSL dict → QueryAst. ``default_fields`` is the index's
    search_settings.default_search_fields — a ``query_string`` without its
    own ``fields``/``default_field`` falls back to them, matching the
    reference (search_settings_tests.rs: updating default_search_fields
    changes which fields a bare query_string hits)."""
    (kind, body), = dsl.items()
    if kind == "match_all":
        return MatchAll()
    if kind == "match_none":
        return MatchNone()
    if kind == "term":
        (f, spec), = body.items()
        v = spec["value"] if isinstance(spec, dict) else spec
        ci = bool(spec.get("case_insensitive", False)) if isinstance(spec, dict) else False
        # DSL terms are NOT analyzed: they must match the post-tokenization
        # form (0006-term_query.yaml: `PushEvent` → 0 hits, `pushevent` → 60)
        return Term(f, str(v), analyzed=False, case_insensitive=ci)
    if kind == "terms":
        (f, vals), = body.items()
        return TermSet(f, tuple(str(v) for v in vals), analyzed=False)
    if kind == "match":
        (f, spec), = body.items()
        if isinstance(spec, dict):
            return FullText(
                f,
                str(spec["query"]),
                spec.get("operator", "or").lower(),
                zero_terms_query=str(spec.get("zero_terms_query", "none")).lower(),
            )
        return FullText(f, str(spec))
    if kind == "multi_match":
        q = str(body["query"])
        fields = body.get("fields", [])
        if isinstance(fields, str):  # ES accepts a bare string
            fields = [fields]
        if not fields:
            raise ValueError("multi_match requires a non-empty fields list")
        mtype = body.get("type", "best_fields")
        if mtype == "phrase":
            slop = int(body.get("slop", 0))
            shoulds: list = [Phrase(f, q, slop) for f in fields]
        elif mtype == "phrase_prefix":
            shoulds = [PhrasePrefix(f, q) for f in fields]
        else:  # best_fields / most_fields / cross_fields → per-field match
            op = body.get("operator", "or").lower()
            shoulds = [FullText(f, q, op) for f in fields]
        return shoulds[0] if len(shoulds) == 1 else Bool(should=shoulds)
    if kind == "match_bool_prefix":
        (f, spec), = body.items()
        q = str(spec["query"] if isinstance(spec, dict) else spec)
        toks = [t for t in re.split(r"[^\w]+", q.lower()) if t]
        if not toks:
            return MatchAll()
        musts: list = [Term(f, t) for t in toks[:-1]]
        musts.append(PhrasePrefix(f, toks[-1]))
        return musts[0] if len(musts) == 1 else Bool(must=musts)
    if kind == "match_phrase":
        (f, spec), = body.items()
        q = spec["query"] if isinstance(spec, dict) else spec
        slop = spec.get("slop", 0) if isinstance(spec, dict) else 0
        return Phrase(f, str(q), slop)
    if kind == "match_phrase_prefix":
        (f, spec), = body.items()
        q = spec["query"] if isinstance(spec, dict) else spec
        return PhrasePrefix(f, str(q))
    if kind == "exists":
        return Exists(body["field"])
    if kind == "range":
        (f, spec), = body.items()
        r = Range(f)
        if "gte" in spec:
            r.lower, r.lower_inclusive = str(spec["gte"]), True
        if "gt" in spec:
            r.lower, r.lower_inclusive = str(spec["gt"]), False
        if "lte" in spec:
            r.upper, r.upper_inclusive = str(spec["lte"]), True
        if "lt" in spec:
            r.upper, r.upper_inclusive = str(spec["lt"]), False
        return r
    if kind == "regexp":
        (f, spec), = body.items()
        v = spec["value"] if isinstance(spec, dict) else spec
        ci = bool(spec.get("case_insensitive", False)) if isinstance(spec, dict) else False
        return Regex(f, v, case_insensitive=ci)
    if kind == "wildcard":
        (f, spec), = body.items()
        v = spec["value"] if isinstance(spec, dict) else spec
        ci = bool(spec.get("case_insensitive", False)) if isinstance(spec, dict) else False
        return Wildcard(f, v, analyzed=False, case_insensitive=ci)
    if kind == "prefix":
        (f, spec), = body.items()
        v = spec["value"] if isinstance(spec, dict) else spec
        ci = bool(spec.get("case_insensitive", False)) if isinstance(spec, dict) else False
        return Wildcard(f, f"{v}*", analyzed=False, case_insensitive=ci)
    if kind == "bool":
        def as_list(x):
            return x if isinstance(x, list) else [x] if x else []

        return Bool(
            must=[es_dsl_to_ast(q, default_fields) for q in as_list(body.get("must"))],
            should=[es_dsl_to_ast(q, default_fields) for q in as_list(body.get("should"))],
            must_not=[es_dsl_to_ast(q, default_fields) for q in as_list(body.get("must_not"))],
            filter=[es_dsl_to_ast(q, default_fields) for q in as_list(body.get("filter"))],
            minimum_should_match=body.get("minimum_should_match"),
        )
    if kind == "query_string":
        # `default_field` (singular) is ES shorthand for fields=[one]
        # (0016-misc-query.yaml)
        flds = body.get("fields") or (
            [body["default_field"]] if body.get("default_field") else default_fields
        )
        return parse_query(body["query"], tuple(flds))
    raise ValueError(f"unsupported ES DSL query kind `{kind}`")


# ---------------------------------------------------------------------------
# query AST → timestamp bounds (split-pruning extraction)
# ---------------------------------------------------------------------------


def extract_time_bounds(ast: QueryAst, ts_field: str):
    """Timestamp bounds a query IMPLIES for ``ts_field`` — the reference's
    AST → split-pruning extraction (quickwit-search/src/root.rs:1230-1245
    behavior: extract_start_end_timestamp_from_ast).

    Returns ``(lower, upper, lower_inclusive, upper_inclusive)`` with naive-
    UTC datetimes, or Nones where unbounded. Conservative by construction:
    only clauses that MUST hold narrow the bounds — ``Bool.must``/``filter``
    conjuncts intersect (tightest wins); ``should``/``must_not`` and any
    unparsable bound contribute nothing, so pruning with the result can only
    over-include splits, never drop a match.
    """
    from quickwit_spark.functions.datetime import parse_query_datetime

    def coerce(v):
        if v is None:
            return None
        try:
            return parse_query_datetime(str(v))
        except (ValueError, TypeError):
            return None

    def walk(node):
        if isinstance(node, Range) and node.field == ts_field:
            lo, hi = coerce(node.lower), coerce(node.upper)
            return (lo, hi,
                    node.lower_inclusive if lo is not None else True,
                    node.upper_inclusive if hi is not None else True)
        if isinstance(node, Term) and node.field == ts_field:
            v = coerce(node.value)
            return (v, v, True, True)
        if isinstance(node, Bool):
            lo = hi = None
            lo_inc = hi_inc = True
            for clause in list(node.must) + list(node.filter):
                clo, chi, cli, chi_inc = walk(clause)
                if clo is not None and (lo is None or clo > lo
                                        or (clo == lo and not cli)):
                    lo, lo_inc = clo, cli
                if chi is not None and (hi is None or chi < hi
                                        or (chi == hi and not chi_inc)):
                    hi, hi_inc = chi, chi_inc
            return (lo, hi, lo_inc, hi_inc)
        return (None, None, True, True)

    return walk(ast)


# ---------------------------------------------------------------------------
# Tag-filter extraction for split pruning
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TagFilter:
    """Predicate over a split's tag set (tag_pruning.rs:165 TagFilterAst —
    behavior studied, not code): ``op`` ∈ {"and", "or", "tag"}. For a leaf,
    ``tag`` is either ``{field}!`` (meaning: the split records ``field`` in
    its tag_fields) or ``{field}:{value}``; ``is_present=False`` tests
    absence. If the predicate evaluates false over a split's tags, NO doc in
    that split can match the query."""

    op: str
    children: tuple = ()
    tag: str = ""
    is_present: bool = True

    def __str__(self) -> str:
        # mirrors the reference's Display (tag_pruning.rs:175-212) so golden
        # strings compare verbatim
        if self.op == "tag":
            return ("" if self.is_present else "¬") + self.tag
        if not self.children:
            return ""
        if len(self.children) == 1:
            return str(self.children[0])
        sep = " ∨ " if self.op == "or" else " ∧ "
        body = sep.join(str(c) for c in self.children)
        return f"({body})" if self.op == "or" else body


_UNINFORMATIVE = ("uninformative",)


def _tag_walk(node) -> tuple:
    """Query AST → unsimplified tag AST (tag_pruning.rs:41-118 semantics).
    Nodes: ("and"|"or", [children]) | ("tag", is_present, field, value) |
    _UNINFORMATIVE. FullText/Phrase/PhrasePrefix/Wildcard keep the
    reference's bug-compatible untokenized value; Range/Regex/Exists are
    uninformative."""
    if isinstance(node, Bool):
        clause: list[tuple[str, tuple]] = []
        for occur, children in (
            ("must", node.must),
            ("must", node.filter),
            ("should", node.should),
            ("must_not", node.must_not),
        ):
            for child in children:
                clause.append((occur, _tag_walk(child)))
        # collect_tag_filters_for_clause (tag_pruning.rs:310-339): with any
        # MUST present, shoulds are dropped and must_nots negated into the
        # AND; otherwise everything is OR-ed (must_nots negated).
        if not clause:
            return _UNINFORMATIVE
        if any(occ == "must" for occ, _ in clause):
            return (
                "and",
                [
                    _tag_negate(ast) if occ == "must_not" else ast
                    for occ, ast in clause
                    if occ != "should"
                ],
            )
        return ("or", [_tag_negate(a) if occ == "must_not" else a for occ, a in clause])
    if isinstance(node, Term):
        return ("tag", True, node.field, node.value)
    if isinstance(node, TermSet):
        return ("or", [("tag", True, node.field, v) for v in node.values])
    if isinstance(node, FullText):
        return ("tag", True, node.field, node.text)
    if isinstance(node, Phrase):
        return ("tag", True, node.field, node.text)
    if isinstance(node, PhrasePrefix):
        return ("tag", True, node.field, node.text)
    if isinstance(node, Wildcard):
        return ("tag", True, node.field, node.pattern)
    # MatchAll/MatchNone/Range/Regex/Exists: true-or-false regardless of tags
    return _UNINFORMATIVE


def _tag_negate(ast: tuple) -> tuple:
    """De Morgan push-down (tag_pruning.rs:349-368)."""
    if ast is _UNINFORMATIVE:
        return _UNINFORMATIVE
    op = ast[0]
    if op == "and":
        return ("or", [_tag_negate(c) for c in ast[1]])
    if op == "or":
        return ("and", [_tag_negate(c) for c in ast[1]])
    return ("tag", not ast[1], ast[2], ast[3])


def _tag_simplify(ast: tuple):
    """Drop uninformative leaves; None means True (tag_pruning.rs:234-276).
    Negative tags can never prune (a split's tag set is not exhaustive for
    absent docs), so they simplify to True."""
    if ast is _UNINFORMATIVE:
        return None
    op = ast[0]
    if op == "and":
        kept = [s for s in (_tag_simplify(c) for c in ast[1]) if s is not None]
        if not kept:
            return None
        return kept[0] if len(kept) == 1 else ("and", kept)
    if op == "or":
        kept = []
        for c in ast[1]:
            s = _tag_simplify(c)
            if s is None:  # True short-circuits the whole OR
                return None
            kept.append(s)
        if not kept:
            return None
        return kept[0] if len(kept) == 1 else ("or", kept)
    _, is_present, f, v = ast
    return ("term", f, v) if is_present else None


def _tag_expand(ast: tuple) -> TagFilter:
    """Term(field, value) → (¬field! ∨ field:value) (tag_pruning.rs:288-308):
    a split that does NOT list ``field`` as a tag field is never prunable on
    it."""
    op = ast[0]
    if op in ("and", "or"):
        return TagFilter(op, tuple(_tag_expand(c) for c in ast[1]))
    _, f, v = ast
    return TagFilter(
        "or",
        (
            TagFilter("tag", tag=f"{f}!", is_present=False),
            TagFilter("tag", tag=f"{f}:{v}"),
        ),
    )


def extract_tag_filter(ast: QueryAst) -> TagFilter | None:
    """Query AST → tag-set predicate for split pruning, or None when the
    query implies no tag constraint (tag_pruning.rs:35 —
    extract_tags_from_query). Conservative by construction: should/must_not
    and untaggable node kinds contribute True, so evaluating the result over
    a split's tags can only over-include splits, never drop a match."""
    simplified = _tag_simplify(_tag_walk(ast))
    return None if simplified is None else _tag_expand(simplified)
