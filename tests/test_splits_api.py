"""Split-management surface: list_splits (ListSplitsQueryParams filters),
mark_splits_for_deletion, deferred physical deletion, and `index describe`
stats.

Reference behavior: quickwit-serve/src/index_api/split_resource.rs:38-136
(REST params + ListSplitsResponse), quickwit-metastore
file_backed_index/mod.rs:1229-1276 (split_query_predicate) and :338-378
(mark semantics), quickwit-cli/src/index.rs:601-780 + stats.rs
(IndexStats / DescriptiveStats).
"""

import glob
import os
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from quickwit_spark import api
from quickwit_spark.pipeline.janitor import (
    build_time_partitioned_index,
    delete_marked_splits,
    janitor_cycle,
    list_splits,
    load_split_states,
    mark_splits_for_deletion,
    read_index,
    read_lineage,
)

EVENTS_FIELDS = {
    "event_type": "raw", "user_id": "numeric", "value": "numeric", "ts": "datetime",
}


@pytest.fixture(scope="module")
def base_index(spark, tiny_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("splits_base"))
    events = spark.read.parquet(os.path.join(tiny_dir, "events.parquet"))
    build_time_partitioned_index(
        spark, events, out, sink_expr=F.col("event_type"), ts_col="ts",
        source_id="events",
    )
    return out


@pytest.fixture()
def index_dir(base_index, tmp_path_factory):
    out = os.path.join(str(tmp_path_factory.mktemp("splits_idx")), "idx")
    shutil.copytree(base_index, out)
    return out


def _events_count(tiny_dir):
    p = os.path.join(tiny_dir, "events.parquet")
    return duckdb.sql(f"SELECT count(*) FROM '{p}'").fetchone()[0]


def test_list_splits_inventory(spark, tiny_dir, index_dir):
    splits = list_splits(spark, index_dir)
    lin = read_lineage(spark, index_dir)
    assert len(splits) == lin.count()
    assert sum(s["split_metadata"]["num_docs"] for s in splits) == _events_count(tiny_dir)
    assert all(s["split_state"] == "Published" for s in splits)
    # split ids are commit/sink, stable-sorted
    ids = [s["split_metadata"]["split_id"] for s in splits]
    assert ids == sorted(ids)
    assert all(len(i.split("/")) == 2 for i in ids)
    # every split of this index carries a time range and a create timestamp
    for s in splits:
        md = s["split_metadata"]
        assert md["time_range"] is not None
        assert md["time_range"]["start"] <= md["time_range"]["end"]
        assert md["create_timestamp"] > 0
        assert s["update_timestamp"] == md["create_timestamp"]
        assert md["source_id"] == "events"
        assert md["delete_opstamp"] == 0

    # REST wrapper shape (ListSplitsResponse: offset/size/splits)
    resp = api.list_splits(spark, index_dir, {"offset": 1, "limit": 2})
    assert resp["offset"] == 1 and resp["size"] == len(resp["splits"]) == 2
    assert resp["splits"] == splits[1:3]


def test_list_splits_filters(spark, index_dir):
    splits = list_splits(spark, index_dir)
    # --- time-range overlap: [start, end) vs inclusive split range ---------
    tr = splits[0]["split_metadata"]["time_range"]
    all_min = min(s["split_metadata"]["time_range"]["start"] for s in splits)
    all_max = max(s["split_metadata"]["time_range"]["end"] for s in splits)
    # window strictly before every split → nothing
    assert list_splits(spark, index_dir, end_timestamp=all_min) == []
    # window strictly after every split → nothing
    assert list_splits(spark, index_dir, start_timestamp=all_max + 1) == []
    # a window covering exactly one split's range finds at least that split,
    # and every hit overlaps the window
    hits = list_splits(
        spark, index_dir, start_timestamp=tr["start"], end_timestamp=tr["end"] + 1
    )
    assert splits[0] in hits
    for s in hits:
        r = s["split_metadata"]["time_range"]
        assert r["end"] >= tr["start"] and r["start"] < tr["end"] + 1
    # boundary: end_timestamp == split start is EXCLUSIVE (start < end fails)
    only_first_start = [
        s for s in splits if s["split_metadata"]["time_range"]["start"] < tr["start"]
    ]
    assert list_splits(spark, index_dir, end_timestamp=tr["start"]) == only_first_start

    # --- create-timestamp upper bound --------------------------------------
    assert list_splits(spark, index_dir, end_create_timestamp=1) == []
    cts = splits[0]["split_metadata"]["create_timestamp"]
    assert list_splits(spark, index_dir, end_create_timestamp=cts + 10**6) == splits

    # --- states -------------------------------------------------------------
    assert list_splits(spark, index_dir, split_states=["MarkedForDeletion"]) == []
    with pytest.raises(ValueError, match="unknown split state"):
        list_splits(spark, index_dir, split_states=["Publishedd"])

    # --- pagination over stable order ---------------------------------------
    paged = []
    for off in range(0, len(splits), 2):
        paged += list_splits(spark, index_dir, offset=off, limit=2)
    assert paged == splits

    # --- REST wrapper: comma list + unknown param ---------------------------
    resp = api.list_splits(spark, index_dir, {"split_states": "Published,Staged"})
    assert resp["splits"] == splits
    with pytest.raises(ValueError, match="unknown split list parameter"):
        api.list_splits(spark, index_dir, {"states": "Published"})
    with pytest.raises(ValueError, match="must be an integer"):
        api.list_splits(spark, index_dir, {"limit": "ten"})


def test_mark_splits_for_deletion_and_search_exclusion(spark, index_dir):
    splits = list_splits(spark, index_dir)
    victim = splits[0]["split_metadata"]
    res = api.mark_splits_for_deletion(
        spark, index_dir, {"split_ids": [victim["split_id"], "no/such-split"]}
    )
    assert res["mutation_occurred"] is True
    assert res["split_not_found_ids"] == ["no/such-split"]
    # re-mark is a silent no-op (mod.rs:363-366)
    res2 = api.mark_splits_for_deletion(
        spark, index_dir, {"split_ids": [victim["split_id"]]}
    )
    assert res2["mutation_occurred"] is False

    pub = list_splits(spark, index_dir, split_states=["Published"])
    assert victim["split_id"] not in {s["split_metadata"]["split_id"] for s in pub}
    marked = list_splits(spark, index_dir, split_states=["MarkedForDeletion"])
    assert [s["split_metadata"]["split_id"] for s in marked] == [victim["split_id"]]
    assert marked[0]["update_timestamp"] >= victim["create_timestamp"]

    # search no longer sees the marked split's rows — neither through ES
    # search_index nor the raw pruned read
    body = {"query": {"match_all": {}}, "size": 0}
    total = api.search_index(spark, index_dir, body, EVENTS_FIELDS)
    expect = sum(s["split_metadata"]["num_docs"] for s in pub)
    assert total["hits"]["total"]["value"] == expect

    # a time-bounded query that would ONLY hit the marked split finds nothing
    tr = victim["time_range"]
    lone = [
        s for s in splits
        if s["split_metadata"]["time_range"]["start"] <= tr["end"]
        and s["split_metadata"]["time_range"]["end"] >= tr["start"]
    ]
    if lone == [splits[0]]:  # marked split's window overlaps no other split
        import datetime as dt

        lo = dt.datetime.utcfromtimestamp(tr["start"]).strftime("%Y-%m-%dT%H:%M:%SZ")
        hi = dt.datetime.utcfromtimestamp(tr["end"] + 1).strftime("%Y-%m-%dT%H:%M:%SZ")
        bounded = {
            "query": {"range": {"ts": {"gte": lo, "lt": hi}}}, "size": 0,
        }
        got = api.search_index(spark, index_dir, bounded, EVENTS_FIELDS)
        assert got["hits"]["total"]["value"] == 0

    # validation
    with pytest.raises(ValueError, match="split_ids"):
        api.mark_splits_for_deletion(spark, index_dir, {"split_ids": "oops"})


def test_delete_marked_splits_partial_commit(spark, tiny_dir, index_dir):
    splits = list_splits(spark, index_dir)
    # pick a commit with >1 sink so the delete is split-granular
    by_commit = {}
    for s in splits:
        by_commit.setdefault(s["split_metadata"]["split_id"].split("/")[0], []).append(s)
    commit, members = next((c, m) for c, m in sorted(by_commit.items()) if len(m) > 1)
    victim = members[0]["split_metadata"]
    mark_splits_for_deletion(spark, index_dir, [victim["split_id"]])

    # not due yet under a grace period
    out = delete_marked_splits(spark, index_dir, grace_seconds=3600)
    assert out == {"deleted_splits": [], "removed_commits": []}
    leaf = os.path.join(
        index_dir, "sinks", f"commit={commit}", f"sink={victim['split_id'].split('/')[1]}"
    )
    assert os.path.isdir(leaf)

    out = delete_marked_splits(spark, index_dir, grace_seconds=0)
    assert out["deleted_splits"] == [victim["split_id"]]
    assert out["removed_commits"] == []  # siblings keep the commit alive
    assert not os.path.isdir(leaf)
    # sibling splits untouched and still listed
    after = list_splits(spark, index_dir)
    ids = {s["split_metadata"]["split_id"] for s in after}
    assert victim["split_id"] not in ids
    for m in members[1:]:
        assert m["split_metadata"]["split_id"] in ids
    # data plane agrees exactly
    assert read_index(spark, index_dir).count() == (
        _events_count(tiny_dir) - victim["num_docs"]
    )
    # overlay cleaned; second run is a no-op
    assert load_split_states(index_dir) == {}
    assert delete_marked_splits(spark, index_dir, grace_seconds=0) == {
        "deleted_splits": [], "removed_commits": [],
    }


def test_delete_marked_splits_whole_commit(spark, tiny_dir, index_dir):
    splits = list_splits(spark, index_dir)
    by_commit = {}
    for s in splits:
        by_commit.setdefault(s["split_metadata"]["split_id"].split("/")[0], []).append(s)
    commit, members = sorted(by_commit.items())[0]
    n_docs = sum(m["split_metadata"]["num_docs"] for m in members)
    mark_splits_for_deletion(
        spark, index_dir, [m["split_metadata"]["split_id"] for m in members]
    )
    out = delete_marked_splits(spark, index_dir, grace_seconds=0)
    assert out["removed_commits"] == [commit]
    assert not os.path.isdir(os.path.join(index_dir, "sinks", f"commit={commit}"))
    assert not os.path.isdir(os.path.join(index_dir, "_lineage", f"commit_id={commit}"))
    assert read_index(spark, index_dir).count() == _events_count(tiny_dir) - n_docs


def test_janitor_cycle_deletes_marked_and_merge_skips_them(spark, tiny_dir, index_dir):
    splits = list_splits(spark, index_dir)
    victim = splits[0]["split_metadata"]
    mark_splits_for_deletion(spark, index_dir, [victim["split_id"]])
    summary = janitor_cycle(spark, index_dir, gc_grace_seconds=0.0)
    assert summary["marked_split_deletion"]["deleted_splits"] == [victim["split_id"]]
    # the deleted rows never resurface — not even through the merge rewrite
    assert read_index(spark, index_dir).count() == (
        _events_count(tiny_dir) - victim["num_docs"]
    )
    assert list_splits(spark, index_dir, split_states=["MarkedForDeletion"]) == []


def test_describe_index(spark, tiny_dir, index_dir):
    desc = api.describe_index(spark, index_dir, "events-index")
    splits = list_splits(spark, index_dir, split_states=["Published"])
    assert desc["index_id"] == "events-index"
    assert desc["num_published_splits"] == len(splits)
    assert desc["num_published_docs"] == _events_count(tiny_dir)
    # physical split bytes: sum over the split LEAF dirs (commit-level
    # _SUCCESS markers are not part of any split, like the reference's
    # per-split footer_offsets)
    total = 0
    for leaf in glob.glob(os.path.join(index_dir, "sinks", "commit=*", "sink=*")):
        for root, _dirs, files in os.walk(leaf):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    assert desc["size_published_splits"] == total
    lo = min(s["split_metadata"]["time_range"]["start"] for s in splits)
    hi = max(s["split_metadata"]["time_range"]["end"] for s in splits)
    assert desc["timestamp_range"] == (lo, hi)
    assert desc["timestamp_field_name"] == "ts"

    # descriptive stats vs an independent float64 reimplementation of
    # stats.rs mean/std/percentile (f32 engine value within tolerance)
    docs = sorted(s["split_metadata"]["num_docs"] for s in splits)
    dd = desc["num_docs_descriptive"]
    mean = sum(docs) / len(docs)
    var = sum((mean - x) ** 2 for x in docs) / len(docs)
    assert dd["summary_stats"]["mean_val"] == pytest.approx(mean, rel=1e-5)
    assert dd["summary_stats"]["std_val"] == pytest.approx(var ** 0.5, rel=1e-4, abs=1e-4)
    assert dd["summary_stats"]["min_val"] == docs[0]
    assert dd["summary_stats"]["max_val"] == docs[-1]

    def pct(vals, p):
        if len(vals) == 1:
            return vals[0]
        rank = p / 100 * (len(vals) - 1)
        n = int(rank)
        d = rank - n
        if n + 1 >= len(vals):
            return float(vals[n])
        return vals[n] + (vals[n + 1] - vals[n]) * d

    for p in (1, 25, 50, 75, 99):
        assert dd["quantiles"][f"q{p}"] == pytest.approx(pct(docs, p), rel=1e-5)

    # marked splits drop out of describe
    victim = splits[0]["split_metadata"]
    mark_splits_for_deletion(spark, index_dir, [victim["split_id"]])
    desc2 = api.describe_index(spark, index_dir, "events-index")
    assert desc2["num_published_splits"] == len(splits) - 1
    assert desc2["num_published_docs"] == _events_count(tiny_dir) - victim["num_docs"]


def test_prometheus_metrics_exposition(spark, tiny_dir, index_dir):
    import json

    # fabricate two per-commit outcome reports (runner's _commit_*.json)
    with open(os.path.join(index_dir, "_commit_a.json"), "w") as fh:
        json.dump({"outcome_counts": {"valid": 90, "doc_mapper_error": 7}}, fh)
    with open(os.path.join(index_dir, "_commit_b.json"), "w") as fh:
        json.dump({"outcome_counts": {"valid": 10, "json_parse_error": 3}}, fh)

    text = api.prometheus_metrics(spark, index_dir, "events-index", "events")
    metrics = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, val = line.rsplit(" ", 1)
        metrics[name] = float(val)

    pfx = 'quickwit_indexing_processed_docs_total{index="events-index",source="events"'
    assert metrics[pfx + ',docs_processed_status="valid"}'] == 100
    assert metrics[pfx + ',docs_processed_status="schema_error"}'] == 7
    assert metrics[pfx + ',docs_processed_status="parse_error"}'] == 3

    splits = list_splits(spark, index_dir, split_states=["Published"])
    lbl = '{index="events-index",source="events",merge_ops="0"}'
    assert metrics["quickwit_indexing_published_splits_total" + lbl] == len(splits)
    assert metrics["quickwit_indexing_published_split_docs_total" + lbl] == sum(
        s["split_metadata"]["num_docs"] for s in splits
    )
    assert metrics["quickwit_indexing_published_split_bytes_total" + lbl] > 0
    # HELP/TYPE headers precede every series (text exposition format)
    for name in ("processed_docs_total", "published_splits_total"):
        assert f"# HELP quickwit_indexing_{name} " in text
        assert f"# TYPE quickwit_indexing_{name} counter" in text

    # marked splits drop out of the published counters
    victim = splits[0]["split_metadata"]
    mark_splits_for_deletion(spark, index_dir, [victim["split_id"]])
    text2 = api.prometheus_metrics(spark, index_dir, "events-index", "events")
    line = next(
        l for l in text2.splitlines()
        if l.startswith("quickwit_indexing_published_splits_total")
    )
    assert float(line.rsplit(" ", 1)[1]) == len(splits) - 1


def test_describe_index_rest_projection(spark, index_dir):
    full = api.describe_index(spark, index_dir, "events-index")
    rest = api.describe_index_rest(spark, index_dir, "events-index")
    assert set(rest) == {
        "index_id", "index_uri", "num_published_splits",
        "size_published_splits", "num_published_docs",
        "size_published_docs_uncompressed", "timestamp_field_name",
        "min_timestamp", "max_timestamp",
    }
    assert rest["num_published_docs"] == full["num_published_docs"]
    assert (rest["min_timestamp"], rest["max_timestamp"]) == full["timestamp_range"]
