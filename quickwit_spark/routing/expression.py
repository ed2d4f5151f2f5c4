"""Quickwit routing-expression DSL: parser, hasher, Spark integration.

Semantics replicated from quickwit-doc-mapper/src/routing_expression/mod.rs
(studied for behavior only):

Grammar (mod.rs:401-411)::

    RoutingExpr  := RoutingSubExpr [ , RoutingExpr ]
    RoutingSubExpr := Identifier [ ( Arguments ) ]
    Identifier   := { a-z A-Z 0-9 _ . \\ / @ $ - }+
    Argument     := ( RoutingExpr ) | RoutingSubExpr | Number

Field paths split on unescaped ``.`` (``\\.`` escapes a literal dot).
Only function: ``hash_mod(expr, N)``.

Hashing (mod.rs:112-160, 38-108): SipHash-2-4 with zero key over the byte
stream ``tree_bytes(expr) ++ eval_bytes(expr, doc)`` — the reference salts a
hasher with the expression tree then continues it per doc, which is exactly
stream concatenation. Byte encodings:

- ExprType tag: 1 byte (``#[repr(u8)]``): Field=0, Composite=1, Modulo=2.
- tree_bytes: Field → tag ++ u64le(#components) ++ components joined by b'.';
  Composite → tag ++ children; Modulo → tag ++ inner ++ u64le(N).
- eval_bytes: Field → tag ++ (0x01 ++ value_bytes | 0x00 if missing);
  Composite → tag ++ children; Modulo → tag ++
  u64le(siphash24(eval_bytes(inner)) % N)   (fresh unsalted hasher).
- value_bytes (type-tagged, injective): null→0x00; bool→0x01+b;
  number→0x02 + u64le (u64/i64 two's complement, floats to_bits, -0.0→+0.0);
  string→0x03 + u64le(len) + utf8; array→0x04 + u64le(len) + items;
  object→0x05 + u64le(len) + (u64le(len(k)) + k + value_bytes(v))*.

Empty expression ⇒ partition hash 0 (mod.rs:155-159).

Change-detection vectors asserted in tests/test_routing.py:
``tenant_id`` × ``{"tenant_id": "happy-tenant", "app": "happy"}`` →
13914409176935416182; missing field → 12482849403534986143 (mod.rs:684-697).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Any, Iterator

import numpy as np
import pandas as pd

from quickwit_spark.routing.siphash import siphash24, siphash24_batch, siphash24_words

_TAG_FIELD = b"\x00"
_TAG_COMPOSITE = b"\x01"
_TAG_MODULO = b"\x02"

_PRESENT = b"\x01"
_MISSING = b"\x00"


def _u64le(v: int) -> bytes:
    return struct.pack("<Q", v & 0xFFFFFFFFFFFFFFFF)


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Field:
    path: tuple[str, ...]

    def __str__(self) -> str:
        return ".".join(p.replace(".", r"\.") for p in self.path)


@dataclass(frozen=True)
class Composite:
    children: tuple["Expr", ...]

    def __str__(self) -> str:
        return ",".join(str(c) for c in self.children)


@dataclass(frozen=True)
class Modulo:
    inner: "Expr"
    modulo: int

    def __str__(self) -> str:
        return f"hash_mod(({self.inner}), {self.modulo})"


Expr = Field | Composite | Modulo


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_IDENT_CHARS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-./@$\\")


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def error(self, msg: str):
        raise ValueError(f"error parsing routing expression at {self.pos}: {msg}")

    def ws(self):
        while self.pos < len(self.text) and self.text[self.pos].isspace():
            self.pos += 1

    def peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def ident(self) -> str:
        start = self.pos
        while self.pos < len(self.text) and self.text[self.pos] in _IDENT_CHARS:
            self.pos += 1
        if self.pos == start:
            self.error("expected identifier")
        return self.text[start : self.pos]

    def number(self) -> int | None:
        start = self.pos
        while self.pos < len(self.text) and self.text[self.pos].isdigit():
            self.pos += 1
        if self.pos == start:
            return None
        return int(self.text[start : self.pos])

    def routing_expr(self) -> list[Expr]:
        exprs = [self.sub_expr()]
        while True:
            save = self.pos
            self.ws()
            if self.peek() == ",":
                self.pos += 1
                self.ws()
                exprs.append(self.sub_expr())
            else:
                self.pos = save
                return exprs

    def sub_expr(self) -> Expr:
        name = self.ident()
        save = self.pos
        self.ws()
        if self.peek() == "(":
            self.pos += 1
            self.ws()
            args = self.arguments()
            self.ws()
            if self.peek() != ")":
                self.error("expected ')'")
            self.pos += 1
            if name != "hash_mod":
                self.error(f"unknown function `{name}`")
            if len(args) != 2:
                self.error("hash_mod expects 2 arguments")
            inner, modulo = args
            if not isinstance(inner, list) or not isinstance(modulo, int):
                self.error("hash_mod expects (expression, number)")
            return _wrap(inner, lambda e: Modulo(e, modulo))
        self.pos = save
        return Field(tuple(parse_field_name(name)))

    def arguments(self) -> list[Any]:
        args = [self.argument()]
        while True:
            save = self.pos
            self.ws()
            if self.peek() == ",":
                self.pos += 1
                self.ws()
                args.append(self.argument())
            else:
                self.pos = save
                return args

    def argument(self) -> Any:
        num = self.number()
        if num is not None:
            return num
        if self.peek() == "(":
            self.pos += 1
            self.ws()
            exprs = self.routing_expr()
            self.ws()
            if self.peek() != ")":
                self.error("expected ')'")
            self.pos += 1
            return exprs
        return [self.sub_expr()]


def _wrap(exprs: list[Expr], ctor) -> Expr:
    if len(exprs) == 0:
        inner: Expr = Composite(())
    elif len(exprs) == 1:
        inner = exprs[0]
    else:
        inner = Composite(tuple(exprs))
    return ctor(inner)


def parse_field_name(name: str) -> list[str]:
    """Split a dotted field path, honouring ``\\.`` escapes (mod.rs:548-554)."""
    parts: list[str] = []
    cur: list[str] = []
    i = 0
    while i < len(name):
        c = name[i]
        if c == "\\" and i + 1 < len(name):
            cur.append(name[i + 1])
            i += 2
        elif c == ".":
            if not cur:
                raise ValueError(f"empty path component in field name {name!r}")
            parts.append("".join(cur))
            cur = []
            i += 1
        else:
            cur.append(c)
            i += 1
    if not cur:
        raise ValueError(f"empty path component in field name {name!r}")
    parts.append("".join(cur))
    return parts


def parse_expr(expr_dsl: str) -> Expr | None:
    """Parse the DSL; ``None`` for the empty expression (→ partition 0)."""
    expr_dsl = expr_dsl.strip()
    if not expr_dsl:
        return None
    p = _Parser(expr_dsl)
    exprs = p.routing_expr()
    p.ws()
    if p.pos != len(p.text):
        p.error(f"trailing input {p.text[p.pos:]!r}")
    if len(exprs) == 1:
        return exprs[0]
    return Composite(tuple(exprs))


# ---------------------------------------------------------------------------
# Byte encodings
# ---------------------------------------------------------------------------


def tree_bytes(expr: Expr) -> bytes:
    """Hash-salt bytes of the expression tree (mod.rs:232-259)."""
    if isinstance(expr, Field):
        return _TAG_FIELD + _u64le(len(expr.path)) + b".".join(p.encode() for p in expr.path)
    if isinstance(expr, Composite):
        return _TAG_COMPOSITE + b"".join(tree_bytes(c) for c in expr.children)
    return _TAG_MODULO + tree_bytes(expr.inner) + _u64le(expr.modulo)


def value_bytes(val: Any) -> bytes:
    """Injective type-tagged encoding of a JSON value (mod.rs:38-73)."""
    if val is None:
        return b"\x00"
    if isinstance(val, bool):
        return b"\x01" + (b"\x01" if val else b"\x00")
    if isinstance(val, int):
        return b"\x02" + _u64le(val)
    if isinstance(val, float):
        if val == 0.0:
            val = 0.0  # normalize -0.0 (serde_json Number hash does this)
        return b"\x02" + struct.pack("<d", val)
    if isinstance(val, str):
        enc = val.encode()
        return b"\x03" + _u64le(len(enc)) + enc
    if isinstance(val, (list, tuple)):
        return b"\x04" + _u64le(len(val)) + b"".join(value_bytes(v) for v in val)
    if isinstance(val, dict):
        out = [b"\x05", _u64le(len(val))]
        for k, v in val.items():
            ke = k.encode()
            out.append(_u64le(len(ke)))
            out.append(ke)
            out.append(value_bytes(v))
        return b"".join(out)
    raise TypeError(f"unsupported routing value type: {type(val)}")


def _find_value(doc: dict, path: tuple[str, ...]) -> tuple[bool, Any]:
    cur: Any = doc
    for key in path:
        if not isinstance(cur, dict) or key not in cur:
            return False, None
        cur = cur[key]
    return True, cur


def eval_bytes(expr: Expr, doc: dict) -> bytes:
    """Per-doc eval byte stream (mod.rs:193-211)."""
    if isinstance(expr, Field):
        present, val = _find_value(doc, expr.path)
        if present:
            return _TAG_FIELD + _PRESENT + value_bytes(val)
        return _TAG_FIELD + _MISSING
    if isinstance(expr, Composite):
        return _TAG_COMPOSITE + b"".join(eval_bytes(c, doc) for c in expr.children)
    sub = siphash24(eval_bytes(expr.inner, doc))
    return _TAG_MODULO + _u64le(sub % expr.modulo)


def _hash_single_string_field(salt: bytes, s: pd.Series) -> np.ndarray:
    """Vectorized hash for ``Field(path)`` over a string column: the message
    layout is ``salt ++ 0x00 ++ (0x01 0x03 u64le(len) payload | 0x00)``.
    All packing is numpy (np.char.encode + scatter) — no per-row Python.
    """
    n = len(s)
    vals = s.to_numpy(dtype=object)
    null_mask = np.fromiter((v is None or v != v for v in vals), dtype=bool, count=n)
    as_u = np.where(null_mask, "", vals).astype("U")
    enc = np.char.encode(as_u, "utf-8")  # fixed-width S dtype, \0-padded
    lens = np.char.str_len(enc).astype(np.int64)  # true byte lengths

    p = len(salt)
    head = p + 1  # salt + field tag
    present_total = head + 2 + 8 + lens  # + present tag + value tag + u64 len
    msg_len = np.where(null_mask, head + 1, present_total)
    n_words = msg_len // 8 + 1
    max_words = int(n_words.max())

    buf = np.zeros((n, max_words * 8), dtype=np.uint8)
    salt_arr = np.frombuffer(salt + b"\x00", dtype=np.uint8)  # + field tag 0x00
    buf[:, : head] = salt_arr
    # missing tag 0x00 already zero; present rows get 0x01 0x03 + len + payload
    pres = ~null_mask
    if pres.any():
        pres_idx = np.nonzero(pres)[0]
        buf[pres, head] = 1
        buf[pres, head + 1] = 3
        for b_i in range(8):  # u64le length at [head+2, head+10)
            buf[pres, head + 2 + b_i] = ((lens[pres] >> (8 * b_i)) & 0xFF).astype(np.uint8)
        # payload scatter; S-dtype rows are \0-padded to `width`, and those
        # padding zeros land past each message's end where zeros are required
        flat = np.frombuffer(enc[pres].tobytes(), dtype=np.uint8).reshape(len(pres_idx), -1)
        width = flat.shape[1]
        if width:
            buf[pres_idx[:, None], np.arange(head + 10, head + 10 + width)[None, :]] = flat
    words = buf.view("<u8").reshape(n, max_words).astype(np.uint64, copy=False)
    last = n_words - 1
    words[np.arange(n), last] |= (msg_len.astype(np.uint64) & np.uint64(0xFF)) << np.uint64(56)
    return siphash24_words(words, n_words)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


class RoutingExpr:
    """Compiled routing expression; evaluates docs to u64 partition hashes."""

    def __init__(self, expr_dsl: str):
        self.dsl = expr_dsl
        self.expr = parse_expr(expr_dsl)
        self._salt = tree_bytes(self.expr) if self.expr is not None else b""

    @property
    def is_empty(self) -> bool:
        return self.expr is None

    def field_names(self) -> list[str]:
        def walk(e: Expr) -> Iterator[str]:
            if isinstance(e, Field):
                yield ".".join(e.path)
            elif isinstance(e, Composite):
                for c in e.children:
                    yield from walk(c)
            else:
                yield from walk(e.inner)

        return [] if self.expr is None else list(walk(self.expr))

    def eval_hash(self, doc: dict) -> int:
        """Partition hash of one JSON-like doc (dict)."""
        if self.expr is None:
            return 0
        return siphash24(self._salt + eval_bytes(self.expr, doc))

    # -- batch paths -------------------------------------------------------

    def eval_hash_batch(self, docs: list[dict]) -> np.ndarray:
        """Vectorized hash of a batch of dicts → uint64 ndarray."""
        if self.expr is None:
            return np.zeros(len(docs), dtype=np.uint64)
        salt = self._salt
        msgs = [salt + eval_bytes(self.expr, d) for d in docs]
        return siphash24_batch(msgs)

    def eval_hash_columns(self, cols: dict[str, pd.Series]) -> np.ndarray:
        """Vectorized hash over columnar input (pandas Series per top-level
        field). Missing keys / nulls hash as absent fields — matches the
        reference's missing-field tag. This is the pandas-UDF hot path: byte
        packing per row, all SipRounds vectorized in numpy.
        """
        n = len(next(iter(cols.values()))) if cols else 0
        if self.expr is None:
            return np.zeros(n, dtype=np.uint64)

        # fast path: single string field — fully vectorized byte packing
        if isinstance(self.expr, Field):
            name = ".".join(self.expr.path)
            s = cols.get(name)
            if s is None and len(self.expr.path) == 1:
                s = cols.get(self.expr.path[0])
            if s is not None and (s.dtype == object or str(s.dtype) in ("string", "str")):
                try:
                    return _hash_single_string_field(self._salt, s)
                except (TypeError, ValueError):
                    pass  # mixed types — fall through to the generic path

        # pre-render per-field byte fragments
        frag_cache: dict[tuple[str, ...], list[bytes]] = {}

        def field_frags(path: tuple[str, ...]) -> list[bytes]:
            if path in frag_cache:
                return frag_cache[path]
            name = ".".join(path)
            s = cols.get(name)
            if s is None and len(path) == 1:
                s = cols.get(path[0])
            if s is None:
                frags = [_TAG_FIELD + _MISSING] * n
            else:
                vals = s.to_numpy(dtype=object)
                frags = [
                    _TAG_FIELD + _MISSING
                    if v is None or (isinstance(v, float) and np.isnan(v))
                    else _TAG_FIELD + _PRESENT + value_bytes(v)
                    for v in vals
                ]
            frag_cache[path] = frags
            return frags

        def expr_frags(e: Expr) -> list[bytes]:
            if isinstance(e, Field):
                return field_frags(e.path)
            if isinstance(e, Composite):
                parts = [expr_frags(c) for c in e.children]
                return [_TAG_COMPOSITE + b"".join(p[i] for p in parts) for i in range(n)]
            inner = expr_frags(e.inner)
            sub = siphash24_batch(inner) % np.uint64(e.modulo)
            return [_TAG_MODULO + _u64le(int(h)) for h in sub]

        frags = expr_frags(self.expr)
        salt = self._salt
        return siphash24_batch([salt + f for f in frags])
