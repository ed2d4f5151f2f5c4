"""Index-template API (template_api/rest_handler.rs CRUD +
IndexTemplate::validate, quickwit-config/src/index_template/mod.rs:35-101;
pattern rule lib.rs:158-196; auto-create via apply_template)."""

import pytest

from quickwit_spark import api

TPL = {
    "template_id": "logs-template",
    "index_id_patterns": ["logs-*", "-logs-tmp*"],
    "priority": 10,
    "doc_mapping": {
        "field_mappings": [
            {"name": "ts", "type": "datetime", "fast": True},
            {"name": "message", "type": "text"},
        ],
        "timestamp_field": "ts",
        "mode": "dynamic",
    },
    "search_settings": {"default_search_fields": ["message"]},
    "retention": {"period": "7 days", "schedule": "daily"},
}


def test_template_crud_roundtrip():
    store = {}
    created = api.create_index_template(store, TPL)
    assert created["template_id"] == "logs-template"
    assert api.get_index_template(store, "logs-template")["priority"] == 10
    # duplicate without overwrite → AlreadyExists
    with pytest.raises(ValueError, match="already exists"):
        api.create_index_template(store, TPL)
    # update = validated upsert
    api.update_index_template(store, dict(TPL, priority=99))
    assert api.get_index_template(store, "logs-template")["priority"] == 99
    assert [t["template_id"] for t in api.list_index_templates(store)] == [
        "logs-template"
    ]
    api.delete_index_template(store, "logs-template")
    with pytest.raises(api.IndexNotFoundError):
        api.get_index_template(store, "logs-template")
    with pytest.raises(api.IndexNotFoundError):
        api.delete_index_template(store, "logs-template")


def test_template_validation():
    store = {}
    with pytest.raises(ValueError, match="index_id_patterns"):
        api.create_index_template(store, dict(TPL, index_id_patterns=[]))
    with pytest.raises(ValueError, match="invalid"):
        api.create_index_template(store, dict(TPL, index_id_patterns=["a**b"]))
    with pytest.raises(ValueError, match="invalid"):
        api.create_index_template(store, dict(TPL, index_id_patterns=["ab"]))
    with pytest.raises(ValueError, match="invalid template id"):
        api.create_index_template(store, dict(TPL, template_id="0bad"))
    # retention requires the timestamp field (same rule as create_index)
    bad = dict(TPL, doc_mapping={
        "field_mappings": [{"name": "message", "type": "text"}],
        "mode": "dynamic",
    }, search_settings={})
    with pytest.raises(ValueError, match="timestamp"):
        api.create_index_template(store, bad)


def test_matching_priority_and_negatives():
    store = {}
    api.create_index_template(store, dict(
        TPL, template_id="low", index_id_patterns=["logs-*"], priority=1,
    ))
    api.create_index_template(store, dict(
        TPL, template_id="high", index_id_patterns=["logs-prod-*"], priority=5,
    ))
    api.create_index_template(store, dict(
        TPL, template_id="guard",
        index_id_patterns=["logs-*", "-logs-prod-*"], priority=9,
    ))
    # guard excludes prod ids, so the prod template wins there
    assert api.find_matching_template(store, "logs-prod-a")["template_id"] == "high"
    # guard wins elsewhere on priority
    assert api.find_matching_template(store, "logs-dev-a")["template_id"] == "guard"
    assert api.find_matching_template(store, "metrics-a") is None


def test_apply_template_auto_creates_index():
    store, indexes = {}, {}
    api.create_index_template(store, TPL)
    res = api.apply_template(indexes, store, "logs-app")
    assert res["index_id"] == "logs-app"
    assert "logs-app" in indexes
    mapping = indexes["logs-app"]
    assert mapping.timestamp_field == "ts"
    assert mapping.default_search_fields == ("message",)
    assert mapping.retention_policy is not None
    # negative pattern blocks auto-create
    assert api.apply_template(indexes, store, "logs-tmp-x") is None
