"""Search result cache: epoch-keyed invalidation (leaf_cache.rs /
root-result-cache behavior re-expressed over the managed index layout)."""

import os

import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators.cache import SearchCache, index_signature, request_key
from quickwit_spark.operators.query import QueryCompiler
from quickwit_spark.pipeline.janitor import (
    build_time_partitioned_index,
    delete_by_query,
    merge_splits,
)

EVENTS_FIELDS = {"event_type": "raw", "user_id": "numeric", "value": "numeric", "ts": "datetime"}


@pytest.fixture()
def idx(spark, tiny_dir, tmp_path_factory):
    out = os.path.join(str(tmp_path_factory.mktemp("cache_idx")), "idx")
    events = spark.read.parquet(os.path.join(tiny_dir, "events.parquet"))
    build_time_partitioned_index(
        spark, events, out, sink_expr=F.col("event_type"), ts_col="ts", source_id="events"
    )
    return out


def _search(spark, idx_dir, body):
    from quickwit_spark.api import es_search
    from quickwit_spark.pipeline.janitor import read_index

    return es_search(read_index(spark, idx_dir), body, field_types=EVENTS_FIELDS)


def test_cache_hit_and_epoch_invalidation(spark, idx):
    cache = SearchCache()
    body = {"query": {"term": {"event_type": {"value": "error"}}}, "size": 5}
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return _search(spark, idx, body)

    r1 = cache.get_or_compute(idx, body, compute)
    r2 = cache.get_or_compute(idx, body, compute)
    assert calls["n"] == 1, "second identical request must be a cache hit"
    assert r1["hits"]["total"]["value"] == r2["hits"]["total"]["value"]
    assert cache.stats()["hits"] == 1

    # ANY metadata mutation changes the epoch → recompute, never stale
    qc = QueryCompiler(EVENTS_FIELDS)
    stats = delete_by_query(spark, idx, "event_type:error", qc, source_id="events")
    assert stats["rows_deleted"] > 0
    r3 = cache.get_or_compute(idx, body, compute)
    assert calls["n"] == 2
    assert r3["hits"]["total"]["value"] == 0  # post-delete truth, not stale

    # a merge is data-identity but metadata-visible: epoch changes too
    # (split ids turn over in the reference; correctness is unchanged)
    before = index_signature(idx)
    merged = merge_splits(spark, idx, merge_factor=2, source_id="events")
    if merged["merged"]:
        assert index_signature(idx) != before
        body2 = {"query": {"range": {"value": {"gte": 0}}}, "size": 3}
        a = cache.get_or_compute(idx, body2, lambda: _search(spark, idx, body2))
        b = cache.get_or_compute(idx, body2, lambda: _search(spark, idx, body2))
        assert a["hits"]["total"]["value"] == b["hits"]["total"]["value"]


def test_cache_isolation_and_lru(spark, idx):
    cache = SearchCache(capacity=2)
    epoch = index_signature(idx)
    cache.put(epoch, request_key({"q": 1}), {"hits": {"total": {"value": 7}}})
    got = cache.get(epoch, request_key({"q": 1}))
    got["hits"]["total"]["value"] = 999  # caller mutation must not poison
    again = cache.get(epoch, request_key({"q": 1}))
    assert again["hits"]["total"]["value"] == 7

    # capacity eviction is LRU
    cache.put(epoch, request_key({"q": 2}), {"r": 2})
    cache.get(epoch, request_key({"q": 1}))  # touch q1 → q2 becomes LRU
    cache.put(epoch, request_key({"q": 3}), {"r": 3})
    assert cache.get(epoch, request_key({"q": 2})) is None
    assert cache.get(epoch, request_key({"q": 1})) is not None

    # evict_epoch drops superseded epochs only
    cache.put("other-epoch", request_key({"q": 9}), {"r": 9})
    dropped = cache.evict_epoch(keep_epoch=epoch)
    assert dropped == 1
    assert cache.get("other-epoch", request_key({"q": 9})) is None


def test_request_key_canonical():
    # key order must not matter; values must
    assert request_key({"a": 1, "b": 2}) == request_key({"b": 2, "a": 1})
    assert request_key({"a": 1}) != request_key({"a": 2})
    assert request_key({"a": 1}, scope="i1") != request_key({"a": 1}, scope="i2")


def test_search_index_cache_param(spark, idx):
    """search_index(cache=...) is the first-class entry: hit on repeat,
    recompute after a metadata mutation."""
    from quickwit_spark.api import search_index

    cache = SearchCache()
    body = {"query": {"term": {"event_type": {"value": "error"}}}, "size": 5}
    r1 = search_index(spark, idx, body, field_types=EVENTS_FIELDS, cache=cache)
    r2 = search_index(spark, idx, body, field_types=EVENTS_FIELDS, cache=cache)
    assert cache.stats() == {"entries": 1, "capacity": 256, "hits": 1, "misses": 1}
    assert r1["hits"]["total"]["value"] == r2["hits"]["total"]["value"] > 0

    qc = QueryCompiler(EVENTS_FIELDS)
    delete_by_query(spark, idx, "event_type:error", qc, source_id="events")
    r3 = search_index(spark, idx, body, field_types=EVENTS_FIELDS, cache=cache)
    assert cache.stats()["misses"] == 2
    assert r3["hits"]["total"]["value"] == 0
