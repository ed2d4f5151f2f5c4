"""ES-compatibility golden vectors over the reference's gharchive dataset
(rest-api-tests/scenarii/es_compatibility/*.yaml — expected hit counts only;
the dataset file is read from the read-only reference checkout and the whole
module skips when it is absent, so the repo stays standalone).

Covered: query_string (0002), match incl. zero_terms (0003), term
case-sensitivity vs tokenization (0006), range (0007), exists (0011),
match_phrase + slop (0013), terms (0015), wildcard + case_insensitive
(0029), prefix (0030), regexp anchoring + case_insensitive (0031).

Out of scope here (documented): `exists: payload` counts an empty object as
missing (99) — Spark's JSON reader materializes `{}` as a non-null struct,
and the compiler is schema-agnostic; sub-field presence would need the doc
mapper's field-presence pass.
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
