"""ES-compatibility golden vectors over the reference's gharchive dataset
(rest-api-tests/scenarii/es_compatibility/*.yaml — expected hit counts only;
the dataset file is read from the read-only reference checkout and the whole
module skips when it is absent, so the repo stays standalone).

Covered: query_string (0002), match incl. zero_terms (0003), term
case-sensitivity vs tokenization (0006), range (0007), exists (0011),
match_phrase + slop (0013), terms (0015), wildcard + case_insensitive
(0029), prefix (0030), regexp anchoring + case_insensitive (0031).

`exists` on object fields uses leaf presence (doc_mapper field-presence
behavior): a doc whose `payload` is `{}` counts as missing — vector 0011's
99-count case is covered.
"""

import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from quickwit_spark.api import es_search

BULK = (
    "/root/reference/quickwit/rest-api-tests/scenarii/es_compatibility/"
    "gharchive-bulk.json.gz"
)

pytestmark = pytest.mark.skipif(not os.path.exists(BULK), reason="reference dataset absent")

FIELDS = {
    "type": "text",
    "id": "text",
    "actor.login": "text",
    "actor.id": "numeric",
    "repo.name": "raw",
    "payload.size": "numeric",
    "commits_msg": "text",
    "created_at": "datetime",
}


@pytest.fixture(scope="module")
def gh(spark):
    lines = gzip.open(BULK, "rt").read().splitlines()
    docs = [l for l in lines if l.strip() and not l.startswith('{"index"')]
    df = spark.read.json(spark.sparkContext.parallelize(docs, 4))
    # payload.commits is an array<struct>; flatten messages into one text
    # column for the phrase/match vectors (the compiler takes string columns)
    df = df.withColumn(
        "commits_msg", F.array_join(F.col("payload.commits.message"), "\n")
    )
    return df.cache()


def _total(gh, query, **kw):
    return es_search(gh, {"query": query, "size": 0, **kw}, field_types=FIELDS)[
        "hits"
    ]["total"]["value"]


def test_0002_query_string(gh):
    assert _total(gh, {"query_string": {"query": "type:PushEvent"}}) == 60
    res = es_search(
        gh,
        {"query": {"query_string": {"query": "type:PushEvent"}}, "size": 3},
        field_types=FIELDS,
    )
    assert res["hits"]["total"]["value"] == 60
    assert len(res["hits"]["hits"]) == 3


def test_0003_match(gh):
    assert _total(gh, {"match": {"type": {"query": "PushEvent"}}}) == 60
    assert _total(gh, {"match": {"type": "PushEvent"}}) == 60
    assert _total(gh, {"match": {"type": ","}}) == 0  # zero-terms → none
    assert _total(gh, {"match": {"type": {"query": ", ", "zero_terms_query": "all"}}}) == 100
    assert _total(gh, {"match": {"commits_msg": {"query": "intial commit"}}}) == 6
    assert _total(gh, {"match": {"commits_msg": {"query": "intial commit", "operator": "AND"}}}) == 1


def test_0006_term_case_sensitivity(gh):
    # DSL terms match the POST-TOKENIZATION form: PushEvent was lowercased
    assert _total(gh, {"term": {"type": {"value": "PushEvent"}}}) == 0
    assert _total(gh, {"term": {"type": {"value": "PushEvent", "case_insensitive": True}}}) == 60
    assert _total(gh, {"term": {"type": {"value": "pushevent"}}}) == 60
    assert _total(gh, {"term": {"type": "pushevent"}}) == 60
    # numbers and numbers-as-strings both work on numeric + text-typed ids
    assert _total(gh, {"term": {"actor.id": "1762355"}}) == 1
    assert _total(gh, {"term": {"actor.id": {"value": 1762355}}}) == 1
    for v in ("2549961272", 2549961272):
        assert _total(gh, {"term": {"id": {"value": v}}}) == 1
        assert _total(gh, {"term": {"id": v}}) == 1


def test_0007_ranges(gh):
    assert _total(gh, {"range": {"actor.id": {"gte": 10791466}}}) == 2
    assert _total(gh, {"range": {"actor.id": {"gt": 10791466}}}) == 1
    assert _total(gh, {"range": {"actor.id": {"lt": 10791466}}}) == 98
    assert _total(gh, {"range": {"actor.id": {"lte": 10791466}}}) == 99
    assert _total(gh, {"range": {"actor.id": {"gt": 467872}}}) == 84
    assert _total(gh, {"range": {"actor.id": {"gte": 467872}}}) == 85


def test_0011_exists(gh):
    assert _total(gh, {"exists": {"field": "type"}}) == 100
    assert _total(gh, {"exists": {"field": "payload.size"}}) == 60
    # empty object counts as MISSING (one doc has "payload": {}) — leaf
    # presence, not struct nullness (doc_mapper_impl.rs:554-560 behavior)
    assert _total(gh, {"exists": {"field": "payload"}}) == 99
    assert _total(gh, {"exists": {"field": "thisfielddoesnotexists"}}) == 0


def test_0013_match_phrase_slop(gh):
    assert _total(gh, {"match_phrase": {"commits_msg": "sign decoration"}}) == 1
    assert _total(gh, {"match_phrase": {"commits_msg": {"query": "sign decoration"}}}) == 1
    assert _total(gh, {"match_phrase": {"commits_msg": "zone explosion"}}) == 0
    assert _total(gh, {"match_phrase": {"commits_msg": {"query": "zone explosion", "slop": 1}}}) == 1


def test_0015_terms(gh):
    assert _total(gh, {"terms": {"type": ["PushEvent", "CommitCommentEvent"]}}) == 0
    assert _total(gh, {"terms": {"type": ["pushevent", "commitcommentevent"]}}) == 61


def test_0029_wildcard(gh):
    assert _total(gh, {"wildcard": {"actor.login": {"value": "jad?nk"}}}) == 2
    assert _total(gh, {"wildcard": {"actor.login": {"value": "j*nk"}}}) == 2
    assert _total(gh, {"wildcard": {"actor.login": "jad?nk"}}) == 2
    assert _total(gh, {"wildcard": {"repo.name": {"value": "RUS*", "case_insensitive": True}}}) == 1
    assert _total(gh, {"wildcard": {"repo.name": {"value": "RUS*", "case_insensitive": False}}}) == 0


def test_0030_prefix(gh):
    assert _total(gh, {"prefix": {"actor.login": {"value": "jado"}}}) == 2
    assert _total(gh, {"prefix": {"actor.login": {"value": "j"}}}) == 10
    assert _total(gh, {"prefix": {"actor.login": "jado"}}) == 2
    assert _total(gh, {"prefix": {"repo.name": {"value": "RUST", "case_insensitive": True}}}) == 1


def test_0031_regexp(gh):
    assert _total(gh, {"regexp": {"type": {"value": ".*event"}}}) == 100
    # regexes are implicitly anchored: `event` alone matches nothing
    assert _total(gh, {"regexp": {"type": {"value": "event"}}}) == 0
    assert _total(gh, {"regexp": {"repo.name": {"value": "RUST.*", "case_insensitive": True}}}) == 1
    assert _total(gh, {"regexp": {"type": {"value": "RUST.*", "case_insensitive": False}}}) == 0
    # regex through the query string
    assert _total(gh, {"query_string": {"query": "type:/pushevent/"}}) == 60


def test_0009_bool_minimum_should_match(gh):
    Q = lambda s: {"query_string": {"query": s}}  # noqa: E731
    shoulds = [
        Q("type:PushEvent"), Q("actor.login:jadonk"),
        Q("actor.login:teozfrank"), Q("type:IssueCommentEvent"),
    ]
    assert _total(gh, {"bool": {"filter": [{"match_all": {}}]}}) == 100
    assert _total(gh, {"bool": {}}) == 100
    assert _total(gh, {"bool": {"must_not": [{"match_none": {}}]}}) == 100
    assert _total(gh, {"bool": {"must_not": [Q("type:PushEvent AND actor.login:jadonk")]}}) == 98
    assert _total(gh, {"bool": {"should": [{"match_none": {}}]}}) == 0
    assert _total(gh, {"bool": {"must": [{"match_all": {}}], "should": [{"match_none": {}}]}}) == 100
    assert _total(gh, {"bool": {"must": None, "should": None, "must_not": None, "filter": None}}) == 100
    for msm, want in [(1, 69), (2, 3), (3, 0), ("50%", 3), (-2, 3), (-3, 69), (-10, 69), (0, 69)]:
        assert _total(gh, {"bool": {"should": shoulds, "minimum_should_match": msm}}) == want, msm
    # with a must anchor the floor drops to 0 and the count is over shoulds
    assert _total(gh, {"bool": {"must": [Q("type:PushEvent")], "should": shoulds[1:], "minimum_should_match": 1}}) == 2
    assert _total(gh, {"bool": {"must": [Q("type:PushEvent")], "should": [Q("actor.login:jadonk")], "minimum_should_match": 2}}) == 0
    assert _total(gh, {"bool": {"must": [Q("type:PushEvent")], "should": shoulds[1:], "minimum_should_match": -10}}) == 60


def test_0017_match_bool_prefix(gh):
    body = F.col  # noqa: F841 (keep import used)
    gh2 = gh.withColumn("pr_body", F.col("payload.pull_request.body"))
    fields = {**FIELDS, "pr_body": "text"}

    def total(query):
        return es_search(gh2, {"query": query, "size": 0}, field_types=fields)["hits"]["total"]["value"]

    assert total({"match_bool_prefix": {"pr_body": {"query": "file not ch"}}}) == 1
    assert total({"match_bool_prefix": {"pr_body": {"query": "file not chzn", "operator": "AND"}}}) == 0
    assert total({"match_bool_prefix": {"pr_body": {"query": "file not ch", "operator": "AND"}}}) == 1
    assert total({"match_bool_prefix": {"pr_body": "file not ch"}}) == 1
    assert _total(gh, {"match_phrase_prefix": {"commits_msg": {"query": "fix"}}}) == 7


def test_0014_multi_match(gh):
    assert _total(gh, {"multi_match": {"query": "sign decoration", "fields": ["commits_msg"]}}) == 1
    assert _total(gh, {"multi_match": {"query": "sign decoration", "fields": "commits_msg"}}) == 1
    assert _total(gh, {"multi_match": {"type": "phrase", "query": "sign decoration", "fields": ["commits_msg"]}}) == 1
    assert _total(gh, {"multi_match": {"type": "phrase", "query": "zone explosion", "fields": ["commits_msg"]}}) == 0
    assert _total(gh, {"multi_match": {"type": "phrase", "query": "zone explosion", "slop": 1, "fields": ["commits_msg"]}}) == 1
    assert _total(gh, {"multi_match": {"type": "most_fields", "query": "the pomle missingtoken", "fields": ["commits_msg", "actor.login"]}}) == 4
    assert _total(gh, {"multi_match": {"type": "phrase", "query": "zone of expl", "fields": ["commits_msg"]}}) == 0
    assert _total(gh, {"multi_match": {"type": "phrase_prefix", "query": "zone of expl", "fields": ["commits_msg"]}}) == 1
    with pytest.raises(ValueError):
        _total(gh, {"multi_match": {"query": "sign decoration", "fields": []}})


def test_0016_misc_query(gh):
    """0016-misc-query.yaml: multi_match phrase/phrase_prefix over several
    (incl. struct-path) fields with lenient, query_string with
    default_field/fields, exists on a plain bool field, terms over commit
    messages. (The reference's array field payload.commits.message is the
    flattened commits_msg column here, like the rest of this suite; the
    exists=59 vector is skipped — it encodes tantivy's >255-char fast-value
    truncation, a storage-layer artifact.)"""
    gh2 = gh.withColumn("pl_desc", F.col("payload.description")).withColumn(
        "cm_body", F.col("payload.comment.body")
    )
    fields = {**FIELDS, "pl_desc": "text", "cm_body": "text", "public": "bool"}

    def total(query):
        return es_search(gh2, {"query": query, "size": 0}, field_types=fields)[
            "hits"
        ]["total"]["value"]

    mm = ["commits_msg", "pl_desc", "cm_body"]
    assert total({"multi_match": {"fields": mm, "lenient": True, "query": "to be", "type": "phrase"}}) == 2
    assert total({"multi_match": {"fields": mm[:2], "lenient": True, "query": "to b", "type": "phrase"}}) == 0
    assert total({"multi_match": {"fields": mm, "lenient": True, "query": "to be", "type": "phrase_prefix"}}) == 2
    assert total({"multi_match": {"fields": mm, "lenient": True, "query": "to b", "type": "phrase_prefix"}}) == 3
    assert total({"query_string": {"default_field": "commits_msg", "lenient": True, "query": "to AND the"}}) == 3
    assert total({"query_string": {"fields": ["commits_msg"], "lenient": True, "query": "to AND the"}}) == 3
    assert total({"exists": {"field": "public"}}) == 100
    assert total({"match_all": {}}) == 100
    assert total({"terms": {"commits_msg": ["fix", "bug", "problem", "closes"]}}) == 3


def test_0005_0019_query_string_and_count(gh):
    assert _total(gh, {"query_string": {"query": "type:PushEvent AND actor.login:jadonk"}}) == 2
    assert _total(gh, {"query_string": {"query": "PushEvent", "fields": ["type"]}}) == 60
    assert _total(gh, {"query_string": {"query": "actor.id:1315639"}}) == 1
    with pytest.raises(ValueError):
        _total(gh, {"query_string": {"query": "type:PushEvent OR"}})
    # _count endpoint ≡ size:0 track_total_hits
    res = es_search(gh, {"query": {"query_string": {"query": "type:PushEvent"}}, "size": 0}, field_types=FIELDS)
    assert res["hits"]["total"]["value"] == 60
    assert es_search(gh, {"size": 0}, field_types=FIELDS)["hits"]["total"]["value"] == 100


def test_0010_match_phrase_prefix(gh):
    gh2 = gh.withColumn("pr_body", F.col("payload.pull_request.body"))
    fields = {**FIELDS, "pr_body": "text"}

    def total(query):
        return es_search(gh2, {"query": query, "size": 0}, field_types=fields)[
            "hits"
        ]["total"]["value"]

    assert total({"match_phrase_prefix": {"pr_body": {"query": "p"}}}) == 2
    assert total({"match_phrase_prefix": {"pr_body": {"query": "to p"}}}) == 1
    assert total({"match_phrase_prefix": {"pr_body": {"query": "be to p"}}}) == 1
    assert total({"match_phrase_prefix": {"commits_msg": {"query": "automated comm"}}}) == 1


def test_0022_source_filtering(gh):
    # _source_excludes
    res = es_search(
        gh, {"query": {"match_all": {}}, "size": 1, "_source_excludes": ["actor"]},
        field_types=FIELDS,
    )
    assert res["hits"]["total"]["value"] == 100
    assert "actor" not in res["hits"]["hits"][0]["_source"]
    # _source_includes
    res = es_search(
        gh, {"query": {"match_all": {}}, "size": 1, "_source_includes": ["actor"]},
        field_types=FIELDS,
    )
    src = res["hits"]["hits"][0]["_source"]
    assert list(src) == ["actor"]
    # includes + excludes: excludes win for the overlapping subtree
    res = es_search(
        gh,
        {"query": {"match_all": {}}, "size": 1,
         "_source_includes": "actor,id", "_source_excludes": ["actor"]},
        field_types=FIELDS,
    )
    assert list(res["hits"]["hits"][0]["_source"]) == ["id"]
    # dotted include path selects a subtree leaf
    res = es_search(
        gh, {"query": {"match_all": {}}, "size": 1, "_source_includes": ["actor.id"]},
        field_types=FIELDS,
    )
    src = res["hits"]["hits"][0]["_source"]
    assert list(src) == ["actor"] and list(src["actor"]) == ["id"]
    # _source: false drops everything
    res = es_search(
        gh, {"query": {"match_all": {}}, "size": 1, "_source": False},
        field_types=FIELDS,
    )
    assert res["hits"]["hits"][0]["_source"] == {}


def test_0018_search_after_coercion(gh):
    gh2 = gh.withColumn("created_ts", F.to_timestamp("created_at"))
    fields = {**FIELDS, "created_ts": "datetime"}

    def first_sort(body):
        res = es_search(gh2, body, field_types=fields)
        return res["hits"]["hits"][0]["sort"][0] if res["hits"]["hits"] else None, res

    v, res = first_sort({"size": 1, "sort": [{"actor.id": "desc"}]})
    assert res["hits"]["total"]["value"] == 100 and v == 10791502
    v, _ = first_sort({"size": 1, "sort": [{"actor.id": "desc"}], "search_after": [10791502]})
    assert v == 10791466
    v, _ = first_sort({"size": 1, "sort": [{"actor.id": "asc"}], "search_after": [5688]})
    assert v == 9018
    # string cursor coerces to the numeric sort field's type
    v, _ = first_sort({"size": 1, "sort": [{"actor.id": "asc"}], "search_after": ["5688"]})
    assert v == 9018
    # epoch-millis cursor coerces against a datetime sort field
    res = es_search(
        gh2,
        {"size": 100, "sort": [{"created_ts": "asc"}], "search_after": [1422748815000]},
        field_types=fields,
    )
    assert len(res["hits"]["hits"]) == 4


def test_0012_scroll_over_sorted_pages(gh):
    """scroll ≡ iterated search_after: pages are disjoint, ordered, complete."""
    from quickwit_spark.operators.sorts import scroll

    pages = list(
        scroll(
            gh.select("id", F.col("actor.id").alias("aid")), [("id", False)], page_size=30
        )
    )
    seen = [r["id"] for page in pages for r in page]
    assert len(seen) == 100 and len(set(seen)) == 100
    assert seen == sorted(seen)
    assert [len(p) for p in pages] == [30, 30, 30, 10]


def test_0014_multi_match_ignores_unmapped_fields(gh):
    # ES silently ignores unmapped fields in the list (no lenient needed)
    assert _total(
        gh,
        {"multi_match": {"query": "sign decoration",
                          "fields": ["inexistent_field", "commits_msg"]}},
    ) == 1


def test_0023_extra_filters(gh):
    assert es_search(
        gh, {"query": {"match_all": {}}, "size": 0, "extra_filters": "type:PushEvent"},
        field_types=FIELDS,
    )["hits"]["total"]["value"] == 60
    assert es_search(
        gh,
        {"query": {"match_all": {}}, "size": 0,
         "extra_filters": "type:PushEvent,actor.login:jadonk"},
        field_types=FIELDS,
    )["hits"]["total"]["value"] == 2
    assert es_search(
        gh,
        {"query": {"query_string": {"query": "type:PushEvent"}}, "size": 0,
         "extra_filters": "actor.login:jadonk"},
        field_types=FIELDS,
    )["hits"]["total"]["value"] == 2


def test_0008_sort_spec_variants(gh):
    def first_actor_id(sort_spec):
        res = es_search(gh, {"size": 1, "sort": sort_spec}, field_types=FIELDS)
        assert res["hits"]["total"]["value"] == 100
        return res["hits"]["hits"][0]["_source"]["actor"]["id"]

    assert first_actor_id([{"actor.id": {"order": "desc"}}]) == 10791502
    assert first_actor_id([{"actor.id": {"order": "asc"}}]) == 5688
    assert first_actor_id(["actor.id"]) == 5688      # bare string → asc
    assert first_actor_id([{"actor.id": {}}]) == 5688  # empty spec → asc
    assert first_actor_id({"actor.id": {}}) == 5688    # dict body form


def test_0002_q_param_overrides_body_query(gh):
    res = es_search(
        gh,
        {"q": "type:PushEvent", "size": 3,
         "query": {"term": {"type": {"value": "whatever"}}}},
        field_types=FIELDS,
    )
    assert res["hits"]["total"]["value"] == 60
    assert len(res["hits"]["hits"]) == 3


def test_0004_term_aggregations(gh):
    """0004-term_aggregations.yaml: terms agg size=5 over the type fast field
    (the setup declares fast: normalizer: lowercase, so bucket keys are the
    lowercased values — modeled with an explicit lowercase column here).
    Checks exact buckets, sum_other_doc_count and the error bound."""
    prepared = gh.withColumn("type_fast", F.lower(F.col("type")))
    res = es_search(
        prepared,
        {
            "size": 0,
            "query": {"match_all": {}},
            "aggs": {"mytypeagg": {"terms": {"field": "type_fast", "size": 5}}},
        },
        field_types=FIELDS,
    )
    assert res["hits"]["total"]["value"] == 100
    assert res["hits"]["hits"] == []
    agg = res["aggregations"]["mytypeagg"]
    assert [(b["key"], b["doc_count"]) for b in agg["buckets"]] == [
        ("pushevent", 60),
        ("createevent", 12),
        ("issuecommentevent", 8),
        ("watchevent", 6),
        ("pullrequestevent", 5),
    ]
    assert agg["sum_other_doc_count"] == 9
    assert agg["doc_count_error_upper_bound"] == 0
