"""Quickwit-native search + search-plan over a janitor-managed index
(rest_handler.rs SearchRequestQueryString / root.rs:1376-1480 search_plan)."""

import datetime
import glob
import os

import pytest
from pyspark.sql import functions as F

from quickwit_spark.api import (
    quickwit_search,
    quickwit_search_index,
    quickwit_search_plan,
)
from quickwit_spark.pipeline.janitor import build_time_partitioned_index, read_index

FIELDS = {"event_type": "raw", "props": "text", "user_id": "numeric",
          "value": "numeric", "ts": "datetime"}


@pytest.fixture(scope="module")
def native_index(spark, tiny_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("native_idx"))
    events = spark.read.parquet(os.path.join(tiny_dir, "events.parquet"))
    build_time_partitioned_index(
        spark, events, out, sink_expr=F.col("event_type"), ts_col="ts",
        source_id="events",
    )
    return out


def _epoch(s: str) -> int:
    return int(datetime.datetime.fromisoformat(s).replace(
        tzinfo=datetime.timezone.utc).timestamp())


def test_native_index_search_prunes_and_matches_full_scan(spark, native_index):
    req = {
        "query": "event_type:error",
        "start_timestamp": _epoch("2024-01-02T00:00:00"),
        "end_timestamp": _epoch("2024-01-03T00:00:00"),
        "max_hits": 5,
        "sort_by": "-value",
    }
    got = quickwit_search_index(spark, native_index, req, FIELDS)
    want = quickwit_search(read_index(spark, native_index), req, FIELDS)
    got.pop("elapsed_time_micros"), want.pop("elapsed_time_micros")
    assert got == want
    assert got["num_hits"] > 0
    # bounds honored: every hit inside [start, end)
    for h in got["hits"]:
        assert "2024-01-02" in str(h["ts"])


def test_search_plan_splits_reflect_pruning(spark, native_index):
    all_commits = sorted(
        os.path.basename(p).split("=", 1)[1]
        for p in glob.glob(os.path.join(native_index, "sinks", "commit=*"))
    )
    assert len(all_commits) > 1
    plan = quickwit_search_plan(
        spark, native_index,
        {"query": "ts:[2024-01-02T00:00:00Z TO 2024-01-03T00:00:00Z} AND value:>=10"},
        FIELDS, index_id="events-idx",
    )
    assert plan["searched_splits"] == ["events-idx/d2024-01-02"]
    # unbounded query → every split listed
    plan_all = quickwit_search_plan(spark, native_index, {"query": "*"}, FIELDS)
    assert sorted(s.split("/", 1)[1] for s in plan_all["searched_splits"]) == all_commits


def test_search_plan_storage_requests_and_asts(spark, native_index):
    plan = quickwit_search_plan(
        spark, native_index,
        {"query": 'props:"slow query" AND event_type:error AND value:[10 TO 20]',
         "aggs": {"t": {"terms": {"field": "event_type"}}}},
        FIELDS,
    )
    sr = plan["storage_requests"]
    # 2 phrase terms + 1 term lookups; 1 range probe; positions for the phrase
    assert sr == {"footer": 1, "fastfield": 1, "sstable": 4, "position": 2,
                  "fieldnorm": 0}
    ast = plan["quickwit_ast"]
    assert ast["type"] == "bool" and len(ast["must"]) == 3
    kinds = {c["type"] for c in ast["must"]}
    assert kinds == {"phrase", "term", "range"}
    # the compiled Catalyst predicate is the tantivy-ast analog
    assert isinstance(plan["tantivy_ast"], str) and "event_type" in plan["tantivy_ast"]


def test_search_plan_score_sort_counts_fieldnorms(spark, native_index):
    plan = quickwit_search_plan(
        spark, native_index,
        {"query": "props:slow", "sort_by": "_score"},
        FIELDS,
    )
    assert plan["storage_requests"]["fieldnorm"] == 1  # one text field
    assert plan["storage_requests"]["sstable"] == 1
    assert plan["storage_requests"]["position"] == 0
