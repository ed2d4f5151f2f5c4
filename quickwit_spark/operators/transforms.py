"""VRL-equivalent per-doc transforms (SURVEY §2.2).

Quickwit runs an optional VRL program per document
(quickwit-indexing/src/actors/vrl_processing.rs:50-96 — behavior only):
rename/drop/parse/derive fields, with failures counted as
``transform_error``. The Spark-first re-expression is a declarative spec
compiled to Column expressions (JVM, codegen) — grok-style extraction with
named groups is the only part that needs a regex engine, and Spark's
``regexp_extract`` covers it; a vectorized pandas fallback exists for
patterns Java regex can't express.

Spec language (a list of steps, applied in order):

    {"op": "rename", "from": "a", "to": "b"}
    {"op": "drop",   "field": "a"}
    {"op": "set",    "field": "a", "value": <literal>}
    {"op": "grok",   "field": "text", "pattern": "...(?<name>...)...",
                     "groups": {"name": "long"}}          # named groups
    {"op": "parse_kv", "field": "text", "to": "attrs"}    # k=v pairs → map
    {"op": "lowercase"/"uppercase"/"trim", "field": "a"}
    {"op": "mask", "field": "a", "pattern": "...", "replacement": "***"}
    {"op": "set_expr", "field": "a", "expr": "<sql scalar expr>"}  # derive
    {"op": "default", "field": "a", "value": <literal>}            # .a ?? v
    {"op": "parse_timestamp", "field": "ts", "format": "yyyy-MM-dd"}
    {"op": "grok", "field": "text", "preset": "apache_common"}     # library
    # every value op takes an optional "where": "<sql bool>" guard (VRL if)

Failures (grok with no match on a required step) set ``_transform_error``;
the caller routes those rows to quarantine with category
``transform_error`` (doc_processor.rs:311-404 counters).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the classic grok aliases, expanded to plain regex (public patterns)
GROK_PATTERNS = {
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "GREEDYDATA": r".*",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|CRIT(?:ICAL)?|FATAL)",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
    "USER": r"[a-zA-Z0-9._-]+",
    "SYSLOGTIMESTAMP": r"\w{3} +\d{1,2} \d{2}:\d{2}:\d{2}",
}

# composite presets (classic grok library shapes, public patterns) — usable
# as {"op": "grok", "preset": "apache_common"} without writing the regex
GROK_PRESETS = {
    # 1.2.3.4 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 2326
    "apache_common": (
        '%{IP:client_ip} %{NOTSPACE:ident} %{NOTSPACE:auth} '
        r'\[(?<http_ts>%{HTTPDATE})\] "(?<method>\w+) %{NOTSPACE:path} '
        r'HTTP/%{NUMBER:http_version}" %{INT:status} %{NOTSPACE:bytes}'
    ),
    # Dec 10 06:55:46 host app[123]: message text
    "syslog_line": (
        "(?<syslog_ts>%{SYSLOGTIMESTAMP}) %{NOTSPACE:host} "
        r"(?<program>[\w./-]+)(?:\[%{INT:pid}\])?: %{GREEDYDATA:message}"
    ),
}

_GROK_ALIAS_RE = re.compile(r"%\{(\w+):(\w+)\}|%\{(\w+)\}")


def expand_grok(pattern: str) -> str:
    """Expand ``%{ALIAS:name}`` / ``%{ALIAS}`` into named-group regex."""

    def sub(m: re.Match) -> str:
        if m.group(1):
            return f"(?<{m.group(2)}>{GROK_PATTERNS[m.group(1)]})"
        return f"(?:{GROK_PATTERNS[m.group(3)]})"

    return _GROK_ALIAS_RE.sub(sub, pattern)


def _guarded(df: DataFrame, step: dict, field: str, new_col):
    """Assign ``new_col`` to ``field``, honoring an optional ``where`` guard
    (VRL `if cond { .field = ... }`): rows failing the condition keep their
    old value (or null if the column is new)."""
    if "where" in step:
        old = F.col(field) if field in df.columns else F.lit(None)
        new_col = F.when(F.expr(step["where"]), new_col).otherwise(old)
    return df.withColumn(field, new_col)


def apply_transforms(df: DataFrame, steps: list[dict]) -> DataFrame:
    """Compile + apply the transform spec. Adds ``_transform_error`` when a
    required grok step fails to match.

    Every value-producing op accepts an optional ``"where": "<sql bool
    expr>"`` guard — the VRL conditional (`if cond { ... }`) re-expressed
    declaratively; unguarded rows keep their previous value."""
    err = F.lit(None).cast("string")
    for step in steps:
        op = step["op"]
        if op == "rename":
            df = df.withColumnRenamed(step["from"], step["to"])
        elif op == "drop":
            df = df.drop(step["field"])
        elif op == "set":
            df = _guarded(df, step, step["field"], F.lit(step["value"]))
        elif op == "set_expr":
            # VRL derived fields (`.x = .a + .b`, string templates,
            # conditionals) — any Spark SQL scalar expression, staying in
            # codegen; the declarative analog of an arbitrary VRL assignment
            df = _guarded(df, step, step["field"], F.expr(step["expr"]))
        elif op == "default":
            # VRL `.x = .x ?? value`
            base = (
                F.col(step["field"]) if step["field"] in df.columns
                else F.lit(None)
            )
            df = df.withColumn(step["field"], F.coalesce(base, F.lit(step["value"])))
        elif op == "parse_timestamp":
            # VRL parse_timestamp!(.f, format: "...") — Spark datetime
            # pattern; no format = Spark's permissive cast
            src = F.col(step["field"]).cast("string")
            parsed = (
                F.to_timestamp(src, step["format"]) if step.get("format")
                else F.to_timestamp(src)
            )
            df = _guarded(df, step, step.get("to", step["field"]), parsed)
        elif op == "lowercase":
            df = _guarded(df, step, step["field"], F.lower(F.col(step["field"])))
        elif op == "uppercase":
            df = _guarded(df, step, step["field"], F.upper(F.col(step["field"])))
        elif op == "trim":
            df = _guarded(df, step, step["field"], F.trim(F.col(step["field"])))
        elif op == "mask":
            df = _guarded(
                df, step, step["field"],
                F.regexp_replace(
                    F.col(step["field"]), step["pattern"], step.get("replacement", "***")
                ),
            )
        elif op == "parse_kv":
            df = df.withColumn(
                step.get("to", "attrs"),
                F.expr(
                    f"map_filter(str_to_map({step['field']}, ' ', '='), "
                    f"(k, v) -> k != '' AND v IS NOT NULL)"
                ),
            )
        elif op == "grok":
            pattern = expand_grok(
                GROK_PRESETS[step["preset"]] if "preset" in step else step["pattern"]
            )
            names = re.findall(r"\(\?<(\w+)>", pattern)
            # extraction is positional (group i == i-th name), so strip the
            # name markers — Java regex rejects '_' in group names, which
            # grok field names use freely
            pattern = re.sub(r"\(\?<\w+>", "(", pattern)
            src = F.col(step["field"])
            types = step.get("groups", {})
            for i, name in enumerate(names, start=1):
                extracted = F.regexp_extract(src, pattern, i)
                col = F.when(extracted == "", None).otherwise(extracted)
                if types.get(name):
                    col = col.cast(types[name])
                df = df.withColumn(name, col)
            if step.get("required", True) and names:
                this_err = F.when(
                    ~F.coalesce(src.rlike(pattern), F.lit(False)),
                    F.lit(f"grok pattern did not match on field `{step['field']}`"),
                )
                err = F.coalesce(err, this_err)
        elif op == "parse_json":
            # VRL parse_json!(.field) — without a declared schema the result
            # is a string map of the TOP-LEVEL entries (nested values stay
            # JSON text); typed access belongs to the doc mapper
            df = df.withColumn(
                step.get("to", step["field"]),
                F.from_json(F.col(step["field"]), "map<string,string>"),
            )
        elif op == "to_int":
            df = df.withColumn(step["field"], F.col(step["field"]).cast("long"))
        elif op == "to_float":
            df = df.withColumn(step["field"], F.col(step["field"]).cast("double"))
        elif op == "to_string":
            df = df.withColumn(step["field"], F.col(step["field"]).cast("string"))
        elif op == "split":
            df = df.withColumn(
                step.get("to", step["field"]),
                F.split(F.col(step["field"]), step.get("separator", r"\s+")),
            )
        elif op == "concat":
            df = df.withColumn(
                step["to"],
                F.concat_ws(step.get("separator", ""), *[F.col(f) for f in step["fields"]]),
            )
        elif op == "replace":
            df = _guarded(
                df, step, step["field"],
                F.regexp_replace(F.col(step["field"]), step["pattern"], step["replacement"]),
            )
        elif op == "hash":
            # VRL sha2/md5 — stable pseudonymization for PII columns
            algo = step.get("algo", "sha256")
            c = F.col(step["field"]).cast("string")
            hashed = F.sha2(c, 256) if algo == "sha256" else F.md5(c)
            df = df.withColumn(step.get("to", step["field"]), hashed)
        else:
            raise ValueError(f"unknown transform op `{op}`")
    return df.withColumn("_transform_error", err)
