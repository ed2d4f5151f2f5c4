"""Doc-mapper coercion/mode matrix (FIXTURES.md F5, from
quickwit-doc-mapper mapping_tree.rs + doc_mapper_impl.rs tests)."""

import json

import pandas as pd
import pytest

from quickwit_spark.operators.docmapper import (
    DOC_MAPPER_ERROR,
    JSON_PARSE_ERROR,
    VALID,
    DocMapper,
    DocMapping,
    FieldMapping,
)


def mapper(mode="dynamic", **kw):
    return DocMapper(
        DocMapping(
            field_mappings=[
                FieldMapping("name", "text"),
                FieldMapping("response", "u64"),
                FieldMapping("score", "f64"),
                FieldMapping("flag", "bool"),
                FieldMapping("host", "ip"),
                FieldMapping("date", "datetime", input_formats=("rfc3339", "unix_timestamp")),
                FieldMapping("tags", "text", multi=True),
                FieldMapping("payload", "bytes"),
                FieldMapping("attrs", "json"),
                FieldMapping("raw", "u64", coerce=False),
            ],
            mode=mode,
            **kw,
        )
    )


def parse_one(m, doc):
    pdf = m.parse_batch(pd.Series([doc if isinstance(doc, str) else json.dumps(doc)]))
    return pdf.iloc[0]


def test_u64_string_coerced():
    row = parse_one(mapper(), {"response": "20"})
    assert row["_error_category"] == VALID and row["response"] == 20


def test_u64_bad_string_error():
    row = parse_one(mapper(), {"response": "foo"})
    assert row["_error_category"] == DOC_MAPPER_ERROR
    assert 'failed to coerce JSON string `"foo"` to u64' in row["_error"]


def test_coerce_false_rejects_string():
    row = parse_one(mapper(), {"raw": "20"})
    assert row["_error_category"] == DOC_MAPPER_ERROR
    assert "expected JSON number, got string" in row["_error"]


def test_null_silently_ignored():
    row = parse_one(mapper(), {"response": None, "name": "a"})
    assert row["_error_category"] == VALID and row["name"] == "a"
    assert row["response"] is None or pd.isna(row["response"])


def test_single_valued_rejects_array():
    row = parse_one(mapper(), {"response": [1, 2]})
    assert row["_error_category"] == DOC_MAPPER_ERROR
    assert "not multivalued" in row["_error"]


def test_multi_valued_skips_inner_nulls():
    row = parse_one(mapper(), {"tags": ["a", None, "b"]})
    assert row["_error_category"] == VALID and row["tags"] == ["a", "b"]


def test_bool_never_coerced():
    row = parse_one(mapper(), {"flag": "true"})
    assert row["_error_category"] == DOC_MAPPER_ERROR


def test_ip_normalized_to_ipv6():
    row = parse_one(mapper(), {"host": "127.0.0.1"})
    assert row["_error_category"] == VALID and row["host"] == "::ffff:127.0.0.1"
    row = parse_one(mapper(), {"host": "2001:db8::1"})
    assert row["host"] == "2001:db8::1"


def test_bytes_base64():
    row = parse_one(mapper(), {"payload": "aGVsbG8="})
    assert row["_error_category"] == VALID and bytes(row["payload"]) == b"hello"


def test_json_field_keeps_object():
    row = parse_one(mapper(), {"attrs": {"a": 1}})
    assert row["_error_category"] == VALID and json.loads(row["attrs"]) == {"a": 1}


def test_mode_dynamic_captures_unmapped():
    row = parse_one(mapper("dynamic"), {"name": "x", "extra": {"a": 1}})
    assert row["_error_category"] == VALID
    assert json.loads(row["_dynamic"]) == {"extra": {"a": 1}}


def test_mode_lenient_drops_unmapped():
    row = parse_one(mapper("lenient"), {"name": "x", "extra": 1})
    assert row["_error_category"] == VALID
    assert "_dynamic" not in row.index


def test_mode_strict_errors_unmapped():
    row = parse_one(mapper("strict"), {"name": "x", "extra": 1})
    assert row["_error_category"] == DOC_MAPPER_ERROR
    assert "strict" in row["_error"]


def test_json_parse_error():
    row = parse_one(mapper(), "{not json")
    assert row["_error_category"] == JSON_PARSE_ERROR


def test_timestamp_required():
    m = mapper(timestamp_field="date")
    row = parse_one(m, {"name": "x"})
    assert row["_error_category"] == DOC_MAPPER_ERROR and "required" in row["_error"]
    row = parse_one(m, {"date": "2015-01-01T12:10:30Z"})
    assert row["_error_category"] == VALID
    assert row["date"] == pd.Timestamp("2015-01-01 12:10:30")


def test_partition_id_from_routing_expr():
    m = DocMapper(
        DocMapping(field_mappings=[FieldMapping("tenant_id", "text")], partition_key="tenant_id")
    )
    row = parse_one(m, {"tenant_id": "happy-tenant"})
    # 13914409176935416182 as i64 two's complement
    assert row["partition_id"] == 13914409176935416182 - (1 << 64)


def test_float_decimal_rejected_for_int_field():
    row = parse_one(mapper(), {"response": 1.5})
    assert row["_error_category"] == DOC_MAPPER_ERROR


def test_doc_roundtrip_text_equality():
    m = mapper()
    doc = {"name": "héllo wörld ☃", "attrs": {"k": "v"}, "extra": "kept"}
    row = m.parse_doc(doc)
    back = m.doc_to_json(row)
    assert back["name"] == doc["name"]
    assert back["extra"] == "kept"
    assert json.loads(json.dumps(back["attrs"])) == doc["attrs"] if isinstance(back["attrs"], dict) else True


def test_spark_apply_and_outcomes(spark):
    from quickwit_spark.operators.docmapper import outcome_counts, split_quarantine

    m = mapper(timestamp_field="date")
    docs = [
        '{"name":"a","date":"2015-01-01T12:10:30Z","response":100}',
        '{"name":"b","date":1420114230,"response":"20"}',
        '{"name":"c"}',  # missing ts
        "{broken",  # json error
    ]
    df = spark.createDataFrame([(d,) for d in docs], ["value"])
    out = m.apply(df)
    valid, bad = split_quarantine(out)
    assert valid.count() == 2
    assert bad.count() == 2
    counts = {r["outcome"]: r["num_docs"] for r in outcome_counts(out).collect()}
    assert counts[VALID] == 2 and counts[DOC_MAPPER_ERROR] == 1 and counts[JSON_PARSE_ERROR] == 1
    rows = {r["name"]: r for r in valid.collect()}
    assert rows["b"]["response"] == 20


def test_expand_dots_dynamic_keys():
    import json as _json

    from quickwit_spark.operators.docmapper import DocMapper, DocMapping, FieldMapping

    doc = {"k8s.pod.name": "web-1", "k8s.pod.ip": "1.2.3.4", "plain": 5}
    m = DocMapper(DocMapping(field_mappings=[], mode="dynamic", expand_dots=True))
    row = m.parse_doc(doc)
    dyn = _json.loads(row["_dynamic"])
    assert dyn == {"k8s": {"pod": {"name": "web-1", "ip": "1.2.3.4"}}, "plain": 5}
    # default: flat keys preserved
    m2 = DocMapper(DocMapping(field_mappings=[], mode="dynamic"))
    dyn2 = _json.loads(m2.parse_doc(doc)["_dynamic"])
    assert "k8s.pod.name" in dyn2


def test_tag_fields_allowed_types_golden():
    """tag_fields/0001_allowed_types.yaml: tags allowed only on raw-text /
    u64 / i64; tokenized text, f64, bool, json, ip, bytes, datetime and
    undeclared (dynamic) fields are rejected at mapper build time."""
    import pytest as _pytest

    from quickwit_spark.operators.docmapper import DocMapper, DocMapping, FieldMapping

    ok = DocMapping(
        field_mappings=[
            FieldMapping("text1", "text", tokenizer="raw"),
            FieldMapping("number1", "u64"),
            FieldMapping("number2", "i64"),
        ],
        tag_fields=("text1", "number1", "number2"),
    )
    DocMapper(ok)  # no raise

    def rejected(fm, tag=None):
        bad = DocMapping(field_mappings=[fm], tag_fields=(tag or fm.name,))
        with _pytest.raises(ValueError):
            DocMapper(bad)

    rejected(FieldMapping("text1", "text", tokenizer="default"))
    rejected(FieldMapping("number3", "f64"))
    rejected(FieldMapping("boolean", "bool"))
    rejected(FieldMapping("json1", "json"))
    rejected(FieldMapping("ip1", "ip"))
    rejected(FieldMapping("bytes1", "bytes"))
    rejected(FieldMapping("date1", "datetime"))
    # dynamic (undeclared) tag field
    with _pytest.raises(ValueError):
        DocMapper(DocMapping(field_mappings=[], tag_fields=("dynamic1",)))
    # dot hygiene (validate_tag name rules)
    with _pytest.raises(ValueError):
        DocMapper(
            DocMapping(field_mappings=[FieldMapping("a", "u64")], tag_fields=(".a",))
        )


def test_doc_mapping_from_config_reference_shape():
    """DocMapping.from_config parses the reference's index-create
    `doc_mapping` JSON (concat_fields/_setup.quickwit.yaml + multi-indices
    setup shapes) — field types incl. array<T>, object nesting, concatenate
    sources, dynamic_mapping.expand_dots."""
    from quickwit_spark.operators.docmapper import DocMapping

    cfg = {
        "mode": "dynamic",
        "timestamp_field": "created_at",
        "store_source": True,
        "tag_fields": ["tenant"],
        "field_mappings": [
            {"name": "created_at", "type": "datetime", "fast": True},
            {"name": "text1", "type": "text", "tokenizer": "default"},
            {"name": "vals", "type": "array<u64>"},
            {
                "name": "actor",
                "type": "object",
                "field_mappings": [
                    {"name": "id", "type": "u64"},
                    {"name": "login", "type": "text"},
                ],
            },
            {
                "name": "concat_raw",
                "type": "concatenate",
                "concatenate_fields": ["text1"],
                "tokenizer": "raw",
                "include_dynamic_fields": True,
            },
        ],
        "dynamic_mapping": {"tokenizer": "default", "expand_dots": True},
    }
    m = DocMapping.from_config(cfg)
    assert m.mode == "dynamic" and m.timestamp_field == "created_at"
    assert m.store_source is True and m.tag_fields == ("tenant",)
    assert m.expand_dots is True
    by_name = {f.name: f for f in m.field_mappings}
    assert by_name["vals"].type == "u64" and by_name["vals"].multi is True
    assert [f.name for f in by_name["actor"].fields] == ["id", "login"]
    assert by_name["concat_raw"].source_fields == ("text1",)
    assert by_name["concat_raw"].tokenizer == "raw"
    assert by_name["text1"].tokenizer == "default"
