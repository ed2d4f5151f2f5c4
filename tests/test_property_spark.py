"""Seeded-random consistency properties that need a SparkSession — the
Spark-side analog of the reference's proptest suites, batched so each
property is ONE Spark job over hundreds of generated cases:

- chinese_compatible tokenizer ≡ default tokenizer on printable ASCII
  (quickwit-query/src/tokenizers/chinese_compatible.rs:254-277
  test_proptest_ascii_default_chinese_equal);
- random nested bool query strings evaluate exactly like an independent
  driver-side evaluator over the same rows
  (tantivy_query_ast.rs:936+ ast_strategy simplification property —
  re-expressed as compile-vs-model equivalence).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def test_chinese_compatible_equals_default_on_ascii(spark):
    rng = random.Random(20260817)
    printable = [chr(c) for c in range(0x20, 0x7F)]
    texts = [
        "".join(rng.choice(printable) for _ in range(rng.randrange(0, 64)))
        for _ in range(400)
    ]
    from quickwit_spark.functions.tokenizers import (
        tokenize_chinese_compatible,
        tokenize_default,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "t"])
    rows = df.select(
        "i",
        tokenize_default(F.col("t")).alias("d"),
        tokenize_chinese_compatible(F.col("t")).alias("c"),
    ).collect()
    assert len(rows) == 400
    for r in rows:
        assert r["d"] == r["c"], f"case {r['i']}: {texts[r['i']]!r}"


# --- random bool queries vs an independent evaluator -----------------------

_FIELDS = ["event_type", "level"]
_VALUES = {"event_type": ["error", "click", "signup"], "level": ["info", "warn"]}


def _gen_ast(rng, depth=0):
    if depth >= 3 or rng.random() < 0.4:
        f = rng.choice(_FIELDS)
        return ("term", f, rng.choice(_VALUES[f]))
    op = rng.choice(["and", "or", "not"])
    if op == "not":
        return ("not", _gen_ast(rng, depth + 1))
    return (op, _gen_ast(rng, depth + 1), _gen_ast(rng, depth + 1))


def _render(ast) -> str:
    kind = ast[0]
    if kind == "term":
        return f"{ast[1]}:{ast[2]}"
    if kind == "not":
        return f"NOT ({_render(ast[1])})"
    return f"({_render(ast[1])}) {ast[0].upper()} ({_render(ast[2])})"


def _eval(ast, row: dict) -> bool:
    kind = ast[0]
    if kind == "term":
        return row[ast[1]] == ast[2]
    if kind == "not":
        return not _eval(ast[1], row)
    a, b = _eval(ast[1], row), _eval(ast[2], row)
    return (a and b) if kind == "and" else (a or b)


def test_random_bool_queries_match_independent_evaluator(spark):
    from quickwit_spark.operators.query import QueryCompiler

    rng = random.Random(42)
    rows = [
        {"i": i, "event_type": rng.choice(_VALUES["event_type"]),
         "level": rng.choice(_VALUES["level"])}
        for i in range(64)
    ]
    df = spark.createDataFrame(
        [(r["i"], r["event_type"], r["level"]) for r in rows],
        ["i", "event_type", "level"],
    )
    qc = QueryCompiler({"event_type": "raw", "level": "raw"})
    asts = [_gen_ast(rng) for _ in range(150)]
    cols = [
        qc.compile(qc.parse(_render(a))).alias(f"q{n}")
        for n, a in enumerate(asts)
    ]
    got = df.select("i", *cols).collect()
    by_i = {r["i"]: r for r in got}
    for n, a in enumerate(asts):
        for r in rows:
            want = _eval(a, r)
            assert bool(by_i[r["i"]][f"q{n}"]) == want, (
                f"query {n} {_render(a)!r} row {r}"
            )
