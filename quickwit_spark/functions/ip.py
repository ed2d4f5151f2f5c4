"""IP-typed field helpers.

Quickwit stores ip fields as IPv6 values compared numerically (u128)
(quickwit-doc-mapper/src/mapping_tree.rs:240-248 — behavior only); the
docmapper here normalizes to the same display form (IPv4 → ``::ffff:a.b.c.d``,
IPv6 → compressed lowercase). Range queries need NUMERIC order, so the query
compiler compares on the 32-hex-digit expanded u128 form:

- :func:`ip_normalize` — query literal → docmapper storage form (equality).
- :func:`ip_sortable_literal` — query literal → 32-hex u128 string (Python).
- :func:`ip_sortable_col` — stored column → 32-hex u128 string, pure Column
  ops (codegen; no Python in the filter path).
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column
from pyspark.sql import functions as F


def ip_normalize(value: str) -> str:
    """Same normalization as the docmapper's ingest path
    (operators/docmapper.py `ip` coercion)."""
    addr = ipaddress.ip_address(value.strip())
    if isinstance(addr, ipaddress.IPv4Address):
        return f"::ffff:{addr}"
    return str(addr)


def ip_sortable_literal(value: str) -> str:
    """Query-side bound → zero-padded 32-hex u128 (IPv4 as v4-mapped IPv6)."""
    addr = ipaddress.ip_address(value.strip())
    if isinstance(addr, ipaddress.IPv4Address):
        n = (0xFFFF << 32) | int(addr)
    else:
        n = int(addr)
    return f"{n:032x}"


def ip_sortable_col(c: Column) -> Column:
    """Stored normalized ip string → 32-hex u128 string, in codegen.

    Handles the two forms the docmapper emits: ``::ffff:a.b.c.d`` (v4-mapped)
    and compressed lowercase IPv6 (``::``-elision per RFC 5952).
    """
    is_v4 = c.rlike(r"^::ffff:[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")
    quad = F.split(F.substring_index(c, ":", -1), r"\.")
    v4 = F.concat(
        F.lit("00000000000000000000ffff"),
        *[
            F.lpad(F.lower(F.hex(F.get(quad, i).cast("int"))), 2, "0")
            for i in range(4)
        ],
    )

    halves = F.split(c, "::", 2)
    left = F.filter(F.split(F.coalesce(F.get(halves, 0), F.lit("")), ":"), lambda p: p != F.lit(""))
    right = F.filter(F.split(F.coalesce(F.get(halves, 1), F.lit("")), ":"), lambda p: p != F.lit(""))
    zeros = F.greatest(F.lit(8) - F.size(left) - F.size(right), F.lit(0))
    pad = lambda arr: F.transform(arr, lambda g: F.lpad(F.lower(g), 4, "0"))  # noqa: E731
    v6 = F.array_join(
        F.concat(pad(left), F.array_repeat(F.lit("0000"), zeros), pad(right)), ""
    )
    # explicit null guard: the coalesce("") in the v6 branch would otherwise
    # turn NULL into the all-zeros key (= ::)
    return F.when(c.isNull(), F.lit(None).cast("string")).when(is_v4, v4).otherwise(v6)
