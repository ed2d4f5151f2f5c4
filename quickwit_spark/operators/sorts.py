"""Sorts, top-k, and pagination (SURVEY §2.8).

Quickwit semantics (quickwit-search/src/collector.rs:42-53, root.rs:1224-1227
— behavior only): ≤2 sort components with stable tie-break, top-k via
per-segment heaps (Spark: TakeOrderedAndProject — chosen automatically for
orderBy+limit), search_after cursors on sort values, from/size offset
pagination, and scroll as an iterated search_after (no server-side context
needed in a single engine).
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _order_cols(sort_fields: list[tuple[str, bool]]):
    # ES/Quickwit put documents MISSING the sort field last in BOTH
    # directions (missing defaults to _last; rest-api-tests/scenarii/
    # sort_orders vector 4 shows desc+missing-last) — Spark's asc default is
    # nulls-first, so force nulls_last explicitly.
    return [
        F.col(name).desc_nulls_last() if descending else F.col(name).asc_nulls_last()
        for name, descending in sort_fields
    ]


def _cursor_lit(v):
    """search_after cursor literal with the reference's numeric-coercion
    edge semantics (search_after/0001-search_after_edge_case.yaml): an
    integer cursor beyond i64 range compares EXACTLY (decimal literal, so
    `after: 18_000_000_000_000_000_000 asc` matches nothing and desc matches
    everything); float cursors compare as f64 (inheriting f64 precision near
    i64::MAX, same as the reference)."""
    if isinstance(v, int) and not (-(1 << 63) <= v < (1 << 63)):
        from decimal import Decimal

        return F.lit(Decimal(v))
    return F.lit(v)


def top_k(df: DataFrame, sort_fields: list[tuple[str, bool]], k: int) -> DataFrame:
    """orderBy + limit → TakeOrderedAndProject (per-partition heaps, no
    global sort). ``sort_fields``: [(col, descending)], first = primary."""
    return df.orderBy(*_order_cols(sort_fields)).limit(k)


def _after_predicate(sort_fields: list[tuple[str, bool]], cursor: dict[str, Any]):
    """Lexicographic strictly-after predicate over the sort tuple."""
    pred = F.lit(False)
    eq = F.lit(True)
    for name, descending in sort_fields:
        c = F.col(name)
        v = _cursor_lit(cursor[name])
        step = (c < v) if descending else (c > v)
        pred = pred | (eq & step)
        eq = eq & (c == v)
    return pred


def search_after(
    df: DataFrame,
    sort_fields: list[tuple[str, bool]],
    cursor: dict[str, Any],
    size: int,
) -> DataFrame:
    """Cursor pagination: rows strictly after ``cursor`` in sort order.
    The predicate is plain comparisons → pushdown-eligible."""
    return (
        df.filter(_after_predicate(sort_fields, cursor))
        .orderBy(*_order_cols(sort_fields))
        .limit(size)
    )


def paginate(df: DataFrame, sort_fields: list[tuple[str, bool]], frm: int, size: int) -> DataFrame:
    """from/size offset pagination.

    TakeOrderedAndProject keeps only the top ``frm+size`` rows (per-partition
    heaps + driver merge); the row_number window that slices off the first
    ``frm`` then runs over those ≤ frm+size rows — NOT a single-partition
    sort of the whole relation. Deep offsets should still prefer
    :func:`search_after` (same guidance as the reference)."""
    from pyspark.sql import Window

    top = df.orderBy(*_order_cols(sort_fields)).limit(frm + size)
    w = Window.orderBy(*_order_cols(sort_fields))
    return (
        top.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > frm)
        .drop("__rn")
    )


def scroll(
    df: DataFrame,
    sort_fields: list[tuple[str, bool]],
    page_size: int = 1000,
    max_pages: int | None = None,
) -> Iterator[list]:
    """Scroll = iterated search_after: yields pages of Rows until exhausted.
    Stateless on the cluster (the cursor is the last row's sort values) —
    the single-engine analog of the reference's scroll context cache."""
    cursor: dict[str, Any] | None = None
    pages = 0
    while True:
        page_df = (
            top_k(df, sort_fields, page_size)
            if cursor is None
            else search_after(df, sort_fields, cursor, page_size)
        )
        rows = page_df.collect()
        if not rows:
            return
        yield rows
        pages += 1
        if max_pages is not None and pages >= max_pages:
            return
        last = rows[-1]
        cursor = {name: last[name] for name, _ in sort_fields}


def field_collapse(
    df: DataFrame,
    collapse_field: str,
    sort_fields: list[tuple[str, bool]],
    k: int = 10,
    inner_hits: int = 1,
    tiebreak: str | None = None,
) -> DataFrame:
    """Elasticsearch ``collapse`` semantics (public search API): fold the
    hit list so each distinct value of ``collapse_field`` contributes at
    most ``inner_hits`` rows (its best by the sort order), then page the
    collapsed list by the same order, top-``k`` groups. The classic "one
    result per user / domain / conversation" search feature; in a
    training-data pipeline the identical shape caps per-source document
    counts (per-domain quotas).

    ``tiebreak`` (default: the collapse field itself) makes the intra-group
    order total so results are deterministic.

    Scale shape: one hash-partitioned window over ``collapse_field``
    ranks rows within each group (per-group state is the group's row
    count, no global sort); the collapsed representatives then flow to a
    TakeOrderedAndProject for the final page. NULL collapse keys form one
    group (ES: documents missing the field collapse together under null).

    Output: sort columns + ``collapse_field`` + (group_rank 1..inner_hits)
    for the top-``k`` groups ordered by their best row.
    """
    from pyspark.sql import Window

    order = _order_cols(sort_fields + [(tiebreak or collapse_field, False)])
    w = Window.partitionBy(collapse_field).orderBy(*order)
    ranked = df.withColumn("group_rank", F.row_number().over(w)).filter(
        F.col("group_rank") <= inner_hits
    )
    # page by each group's BEST row: rank groups by their rank-1 sort tuple
    best = ranked.filter(F.col("group_rank") == 1).select(
        F.col(collapse_field).alias("__key"),
        *[F.col(n).alias(f"__s{i}") for i, (n, _) in enumerate(sort_fields)],
    )
    page = (
        best.orderBy(
            *_order_cols(
                [(f"__s{i}", d) for i, (_, d) in enumerate(sort_fields)]
                + [("__key", False)]
            )
        )
        .limit(k)
        .select("__key")
    )
    return ranked.join(
        F.broadcast(page),
        ranked[collapse_field].eqNullSafe(page["__key"]),
        "semi",
    )
