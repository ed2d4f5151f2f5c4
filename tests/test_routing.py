"""Routing expression + SipHash parity tests.

Golden vectors from the reference's change-detection tests
(quickwit-doc-mapper/src/routing_expression/mod.rs:684-711) and SipHash-2-4
test vectors from the SipHash paper (Aumasson & Bernstein, appendix A).
"""

import numpy as np
import pytest

from quickwit_spark.routing import RoutingExpr, siphash24, siphash24_batch
from quickwit_spark.routing.expression import (
    Composite,
    Field,
    Modulo,
    parse_expr,
    parse_field_name,
)

# SipHash-2-4 official test vector: key = 000102...0f, msg = 00 01 02 ... (len 0..63)
_SIP_KEY_K0 = 0x0706050403020100
_SIP_KEY_K1 = 0x0F0E0D0C0B0A0908
# first 8 expected outputs from the reference C implementation (vectors.h)
_SIP_EXPECTED = [
    0x726FDB47DD0E0E31,
    0x74F839C593DC67FD,
    0x0D6C8009D9A94F5A,
    0x85676696D7FB7E2D,
    0xCF2794E0277187B7,
    0x18765564CD99A68D,
    0xCBC9466E58FEE3CE,
    0xAB0200F58B01D137,
]


def test_siphash24_paper_vectors():
    msg = bytes(range(64))
    for i, expected in enumerate(_SIP_EXPECTED):
        assert siphash24(msg[:i], _SIP_KEY_K0, _SIP_KEY_K1) == expected


def test_siphash24_batch_matches_scalar():
    rng = np.random.default_rng(42)
    msgs = [bytes(rng.integers(0, 256, size=int(n), dtype=np.uint8)) for n in rng.integers(0, 100, 200)]
    batch = siphash24_batch(msgs)
    for m, h in zip(msgs, batch):
        assert siphash24(m) == int(h)


def test_empty_expr_hashes_to_0():
    expr = RoutingExpr("")
    assert expr.eval_hash({}) == 0
    assert list(expr.eval_hash_batch([{}, {"a": 1}])) == [0, 0]


def test_change_detection_vector():
    # mod.rs:684-690
    expr = RoutingExpr("tenant_id")
    doc = {"tenant_id": "happy-tenant", "app": "happy"}
    assert expr.eval_hash(doc) == 13914409176935416182


def test_missing_value_vector():
    # mod.rs:693-697
    expr = RoutingExpr("tenant_id")
    assert expr.eval_hash({}) == 12482849403534986143


def test_hash_mod_10_distinct_classes():
    # mod.rs:700-711
    expr = RoutingExpr("hash_mod(tenant_id, 10)")
    seen = {expr.eval_hash({"tenant_id": f"happy{i}"}) for i in range(1000)}
    assert len(seen) == 10


def test_expr_and_value_both_matter():
    # mod.rs:670-680
    e1, e2 = RoutingExpr("tenant_id"), RoutingExpr("app")
    doc = {"tenant_id": "happy", "app": "happy"}
    assert e1.eval_hash(doc) != e2.eval_hash(doc)
    assert e1.eval_hash(doc) != e1.eval_hash({"tenant_id": "happy2"})


def test_parse_field_paths():
    assert parse_field_name("abc") == ["abc"]
    assert parse_field_name("abc.def") == ["abc", "def"]
    assert parse_field_name("abc\\.def.hij") == ["abc.def", "hij"]
    assert parse_field_name("abCD01-_/@$") == ["abCD01-_/@$"]


def test_parse_expr_shapes():
    assert parse_expr("tenant_id") == Field(("tenant_id",))
    assert parse_expr("app.id") == Field(("app", "id"))
    assert parse_expr("tenant_id,app_id") == Composite(
        (Field(("tenant_id",)), Field(("app_id",)))
    )
    assert parse_expr("hash_mod(tenant_id, 4)") == Modulo(Field(("tenant_id",)), 4)
    assert parse_expr("hash_mod((tenant_id,hash_mod(app_id, 3)), 8),cluster_id") == Composite(
        (
            Modulo(
                Composite((Field(("tenant_id",)), Modulo(Field(("app_id",)), 3))),
                8,
            ),
            Field(("cluster_id",)),
        )
    )


def test_nested_field_lookup():
    expr = RoutingExpr("app.id")
    h1 = expr.eval_hash({"app": {"id": "123"}})
    h2 = expr.eval_hash({"app": {"id": "124"}})
    h_missing = expr.eval_hash({"app": "not-an-object"})
    assert h1 != h2
    assert h_missing == expr.eval_hash({})  # both hash the missing tag


def test_unknown_function_rejected():
    with pytest.raises(ValueError):
        parse_expr("frobnicate(tenant_id, 3)")


def test_columnar_batch_matches_scalar():
    import pandas as pd

    expr = RoutingExpr("hash_mod((tenant_id,hash_mod(app, 3)), 8),cluster")
    docs = [
        {"tenant_id": f"t{i % 7}", "app": f"a{i % 3}", "cluster": f"c{i % 2}"}
        for i in range(50)
    ]
    docs.append({})  # all missing
    cols = {
        "tenant_id": pd.Series([d.get("tenant_id") for d in docs]),
        "app": pd.Series([d.get("app") for d in docs]),
        "cluster": pd.Series([d.get("cluster") for d in docs]),
    }
    col_hashes = expr.eval_hash_columns(cols)
    for d, h in zip(docs, col_hashes):
        assert expr.eval_hash(d) == int(h)
