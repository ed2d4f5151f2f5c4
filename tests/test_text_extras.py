"""Training-data text extras: repetition filters, PII scrubbing, URL/domain
extraction, and the batch k-NN join. These extend the engine beyond the
reference surface (quickwit has no corpus-cleaning tier); semantics modeled
on the standard web-corpus filtering rules (Gopher-style repetition ratios).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickwit_spark.functions import text as TX
from quickwit_spark.operators import similarity as S


def _rep(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    rows = df.select("id", *TX.repetition_features(F.col("text"))).orderBy("id").collect()
    return [(r.dup_word_frac, r.top_word_frac, r.top_bigram_frac) for r in rows]


class TestRepetitionFeatures:
    def test_all_distinct_words(self, spark):
        (dup, top, bg), = _rep(spark, ["alpha beta gamma delta"])
        assert dup == 0.0
        assert top == 0.25
        assert bg == pytest.approx(1 / 3, abs=1e-6)  # all bigrams distinct

    def test_all_same_word(self, spark):
        (dup, top, bg), = _rep(spark, ["spam spam spam spam"])
        assert dup == 0.75
        assert top == 1.0
        assert bg == 1.0

    def test_repeated_bigram(self, spark):
        # "a b a b a" -> bigrams: [a b, b a, a b, b a] -> top bigram 2/4
        (dup, top, bg), = _rep(spark, ["a b a b a"])
        assert top == pytest.approx(3 / 5, abs=1e-6)
        assert bg == pytest.approx(0.5, abs=1e-6)

    def test_single_word_has_zero_bigram_frac(self, spark):
        (dup, top, bg), = _rep(spark, ["lonely"])
        assert (dup, top, bg) == (0.0, 1.0, 0.0)

    def test_case_folded(self, spark):
        (dup, _, _), = _rep(spark, ["Spam SPAM spam"])
        assert dup == pytest.approx(2 / 3, abs=1e-6)


class TestPii:
    def test_counts_and_scrub(self, spark):
        df = spark.createDataFrame(
            [
                (0, "write to alice.smith+x@corp.example.org today"),
                (1, "call +1-555-123-4567 or 555-987-6543 now"),
                (2, "no pii here at all"),
            ],
            "id long, text string",
        )
        rows = (
            df.select(
                "id",
                *TX.pii_features(F.col("text")),
                TX.pii_scrub_col(F.col("text")).alias("scrubbed"),
            )
            .orderBy("id")
            .collect()
        )
        assert [(r.n_emails, r.n_phones) for r in rows] == [(1, 0), (0, 2), (0, 0)]
        assert rows[0].scrubbed == "write to <EMAIL> today"
        # "+1-555-123-4567": the \+?\d{3}-\d{3}-\d{4} window matches the
        # trailing 555-123-4567 run
        assert "<PHONE>" in rows[1].scrubbed
        assert rows[2].scrubbed == "no pii here at all"

    def test_scrub_is_idempotent(self, spark):
        df = spark.createDataFrame([(0, "mail a@b.co now")], "id long, text string")
        once = df.select(TX.pii_scrub_col(F.col("text")).alias("s"))
        twice = once.select(TX.pii_scrub_col(F.col("s")).alias("s"))
        assert twice.first().s == "mail <EMAIL> now"


class TestUrlDomains:
    def test_extracts_domains_only(self, spark):
        df = spark.createDataFrame(
            [(0, "see https://a.example.com/x/y?z=1 and http://b.org plus ftp://skip.me")],
            "id long, text string",
        )
        doms = df.select(TX.url_domains_col(F.col("text")).alias("d")).first().d
        assert doms == ["a.example.com", "b.org"]

    def test_no_urls_gives_empty_array(self, spark):
        df = spark.createDataFrame([(0, "plain text")], "id long, text string")
        assert df.select(TX.url_domains_col(F.col("text")).alias("d")).first().d == []


class TestKnnJoin:
    def _emb(self, spark, n=60, dim=8, seed=7):
        rng = np.random.default_rng(seed)
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        return spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(n)],
            "vec_id long, embedding array<float>",
        )

    def test_matches_per_query_brute_force(self, spark):
        emb = self._emb(spark)
        queries = emb.filter(F.col("vec_id") % 20 == 0)  # 3 queries
        got = {
            (r.qid, r.vec_id): r.cosine
            for r in S.knn_join(emb, queries, k=4).collect()
        }
        for qid in (0, 20, 40):
            qvec = emb.filter(F.col("vec_id") == qid).first().embedding
            expect = S.cosine_topk(emb, list(qvec), k=4).collect()
            for e in expect:
                assert (qid, e.vec_id) in got
                assert got[(qid, e.vec_id)] == pytest.approx(e.cosine, abs=1e-5)

    def test_k_rows_per_query_and_self_hit(self, spark):
        emb = self._emb(spark)
        queries = emb.filter(F.col("vec_id") % 20 == 0)
        rows = S.knn_join(emb, queries, k=5).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.qid, []).append(r)
        assert set(by_q) == {0, 20, 40}
        for qid, rs in by_q.items():
            assert len(rs) == 5
            # the query vector itself is in the corpus: cosine 1.0 self-hit
            assert any(r.vec_id == qid and r.cosine == 1.0 for r in rs)

    def test_plan_has_no_join_of_corpus(self, spark):
        emb = self._emb(spark)
        queries = emb.filter(F.col("vec_id") % 20 == 0)
        plan = S.knn_join(emb, queries, k=3)._jdf.queryExecution().executedPlan().toString()
        # the corpus is scanned once through mapInPandas; the only shuffle is
        # the tiny candidate merge — never a join of corpus against queries
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" not in plan


class TestDedupParagraphs:
    def test_first_occurrence_survives(self, spark):
        from quickwit_spark.operators.dedup import dedup_paragraphs

        df = spark.createDataFrame(
            [
                (0, ["alpha", "beta", "gamma"]),
                (1, ["beta", "delta"]),       # beta repeats -> dropped here
                (2, ["alpha", "alpha"]),      # both copies repeat doc 0's alpha
            ],
            "doc_id long, paras array<string>",
        )
        rows = {r.doc_id: r for r in dedup_paragraphs(df).collect()}
        assert (rows[0].n_paras, rows[0].n_kept) == (3, 3)
        assert rows[0].kept_text == "alpha\nbeta\ngamma"
        assert (rows[1].n_paras, rows[1].n_kept) == (2, 1)
        assert rows[1].kept_text == "delta"
        assert (rows[2].n_paras, rows[2].n_kept) == (2, 0)
        assert rows[2].kept_text == ""

    def test_within_doc_repeat_keeps_earliest_position(self, spark):
        from quickwit_spark.operators.dedup import dedup_paragraphs

        df = spark.createDataFrame(
            [(7, ["x", "y", "x"])], "doc_id long, paras array<string>"
        )
        r = dedup_paragraphs(df).first()
        assert (r.n_paras, r.n_kept, r.kept_text) == (3, 2, "x\ny")


class TestPngCodec:
    """Pure-Python PNG decode (stdlib zlib + all five scanline filters)."""

    def _filtered_png(self, img, filters):
        """Hand-encode `img` (HxWx3 uint8) using a chosen filter per row —
        exercises the decoder's filter reconstruction beyond the filter-0
        path encode_png emits."""
        import struct
        import zlib

        h, w, _ = img.shape
        nch = 3
        raw = bytearray()
        prev = np.zeros(w * nch, dtype=np.int32)
        for y in range(h):
            line = img[y].reshape(-1).astype(np.int32)
            f = filters[y % len(filters)]
            raw.append(f)
            for i in range(w * nch):
                a = int(line[i - nch]) if i >= nch else 0
                b = int(prev[i])
                c = int(prev[i - nch]) if i >= nch else 0
                if f == 0:
                    v = line[i]
                elif f == 1:
                    v = line[i] - a
                elif f == 2:
                    v = line[i] - b
                elif f == 3:
                    v = line[i] - ((a + b) >> 1)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[i] - pred
                raw.append(v & 0xFF)
            prev = line

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
        )

    def test_round_trip_filter0(self):
        from quickwit_spark.operators.multimodal import _decode_png, encode_png

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
        assert np.array_equal(_decode_png(encode_png(img)), img)

    def test_all_five_filters_reconstruct(self):
        from quickwit_spark.operators.multimodal import _decode_png

        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
        png = self._filtered_png(img, filters=[0, 1, 2, 3, 4])
        assert np.array_equal(_decode_png(png), img)

    def test_decode_image_batch_takes_png(self, spark):
        import pandas as pd
        from quickwit_spark.operators.multimodal import decode_image_batch, encode_png

        img = np.full((4, 4, 3), 99, dtype=np.uint8)
        out = decode_image_batch(pd.Series([encode_png(img)]))
        assert np.array_equal(out[0], img)


class TestDecontaminate:
    def test_flags_ngram_overlap(self, spark):
        from quickwit_spark.operators.dedup import decontaminate

        docs = spark.createDataFrame(
            [
                (0, "the quick brown fox jumps over the lazy dog"),
                (1, "a totally different sentence with no overlap here at all"),
                (2, "we saw the quick brown fox jumps again yesterday evening"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "quick brown fox jumps over cliffs")], "doc_id long, text string"
        )
        rows = {r.doc_id: r.n_contaminated for r in decontaminate(docs, bench, n=5).collect()}
        # doc 0 contains 'quick brown fox jumps over' (1 benchmark 5-gram);
        # doc 2 shares only 4-gram runs; doc 1 shares nothing
        assert rows == {0: 1}

    def test_benchmark_side_is_broadcast(self, spark):
        from quickwit_spark.operators.dedup import decontaminate

        docs = spark.createDataFrame(
            [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4} w{i+5}") for i in range(30)],
            "doc_id long, text string",
        )
        bench = docs.filter(F.col("doc_id") < 2)
        plan = decontaminate(docs, bench, n=5)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


def test_bigram_lm_hand_computed(spark):
    """add-α bigram LM on a 2-doc corpus, hand-checkable: corpus "a b a b" /
    "a b" → V=2, c(a)=3, c(b)=3, c(a,b)=3, c(b,a)=1."""
    import math

    from quickwit_spark.operators.corpus import bigram_lm_scores

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in bigram_lm_scores(docs, alpha=0.1).collect()}
    p_ab = (3 + 0.1) / (3 + 0.2)
    p_ba = (1 + 0.1) / (3 + 0.2)
    h0 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert rows[0]["n_bigrams"] == 3
    assert abs(rows[0]["cross_entropy"] - round(h0, 6)) < 1e-9
    assert abs(rows[0]["perplexity"] - round(math.exp(h0), 6)) < 1e-9
    assert rows[1]["n_bigrams"] == 1
    assert abs(rows[1]["cross_entropy"] - round(-math.log(p_ab), 6)) < 1e-9


def test_mixture_plan_temperature_upweights_small_sources(spark):
    """τ<1 flattens the mixture: the small source's target share exceeds its
    natural share, the big one's shrinks; rates cap at 1; realization is
    deterministic (same counts on re-run)."""
    from quickwit_spark.operators.corpus import mixture_plan

    docs = spark.createDataFrame(
        [(i, "web" if i < 900 else "code") for i in range(1000)],
        "doc_id long, source string",
    )
    plan = {r["source"]: r for r in mixture_plan(docs, temperature=0.5,
                                                 budget_frac=0.5).collect()}
    assert plan["code"]["target_share"] > plan["code"]["nat_share"]
    assert plan["web"]["target_share"] < plan["web"]["nat_share"]
    assert plan["code"]["rate"] <= 1.0 and plan["web"]["rate"] <= 1.0
    # kept counts are near rate*n (LCG equidistribution) and reproducible
    again = {r["source"]: r for r in mixture_plan(docs, temperature=0.5,
                                                  budget_frac=0.5).collect()}
    for s in plan:
        assert plan[s]["n_kept"] == again[s]["n_kept"]
        assert abs(plan[s]["n_kept"] - plan[s]["rate"] * plan[s]["n_docs"]) \
            <= 0.1 * plan[s]["n_docs"] + 3


def test_bpe_train_hand_computed(spark):
    """Sennrich-style toy corpus: merges are hand-derivable. Corpus
    "low low low lower lowest": pair counts make (l,o)→lo, (lo,w)→low the
    first two merges; "low</w>" becomes a single token after 3 merges."""
    from quickwit_spark.functions.bpe import _bpe_word, train_bpe

    docs = spark.createDataFrame(
        [(0, "low low low"), (1, "lower lowest")], "doc_id long, text string"
    )
    merges = train_bpe(docs, num_merges=3)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    assert merges[2] == ("low", "</w>")
    ranks = {p: i for i, p in enumerate(merges)}
    assert _bpe_word("low", ranks) == ["low</w>"]
    assert _bpe_word("lower", ranks) == ["low", "e", "r", "</w>"]
    assert _bpe_word("unseen", ranks) == list("unseen") + ["</w>"]


def test_bpe_stats_deterministic_and_compressive(spark, sf_dir):
    """Training twice on the same corpus gives identical merges (content-
    keyed sample); more merges never increase the token count; stats join
    up with whitespace word counts."""
    import os

    from quickwit_spark.functions.bpe import bpe_stats, train_bpe

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(200)
    m1 = train_bpe(docs, num_merges=64)
    m2 = train_bpe(docs.repartition(7), num_merges=64)
    assert m1 == m2  # partitioning-independent

    s64 = bpe_stats(docs, m1).toPandas().set_index("doc_id")
    s8 = bpe_stats(docs, m1[:8]).toPandas().set_index("doc_id")
    assert (s64.n_tokens <= s8.n_tokens).all()
    assert (s64.n_tokens >= s64.n_words).all()  # ≥1 token per word
    assert (s64.tokens_per_word >= 1.0).all()


def test_bigram_lm_unseen_backoff(spark):
    """External-frame scoring: bigrams absent from the training corpus take
    the backoff floor log(α/(c1+αV)); a fully-unseen doc gets the log(1/V)
    floor instead of NULL."""
    import math

    from quickwit_spark.operators.corpus import bigram_lm_scores

    train = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    target = spark.createDataFrame(
        [(10, "a b"), (11, "a q"), (12, "z z")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in
            bigram_lm_scores(train, alpha=0.1, score_df=target).collect()}
    V = 2  # vocab of the training corpus: a, b
    p_ab = (2 + 0.1) / (2 + 0.1 * V)      # c(a,b)=2, c(a)=2
    floor_a = 0.1 / (2 + 0.1 * V)         # unseen bigram, seen history a
    floor_z = 0.1 / (0 + 0.1 * V)         # unseen history z → 1/V
    assert abs(rows[10]["cross_entropy"] - round(-math.log(p_ab), 6)) < 1e-9
    assert abs(rows[11]["cross_entropy"] - round(-math.log(floor_a), 6)) < 1e-9
    assert abs(rows[12]["cross_entropy"] - round(-math.log(floor_z), 6)) < 1e-9

def test_pack_sequences_contract(spark):
    """Chunks tile each shard contiguously: offsets are a permutation-free
    running sum per shard, chunk ranges cover exactly [offset,
    offset+n_tokens), and a repartitioned input packs identically."""
    from quickwit_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (3 + i % 7))) for i in range(60)],
        "doc_id long, text string",
    )
    a = pack_sequences(docs, context_len=10, num_shards=3).toPandas()
    b = pack_sequences(docs.repartition(5), context_len=10, num_shards=3).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)  # partitioning-independent
    for _, shard_df in a.groupby("shard"):
        total = shard_df.n_tokens.sum()
        assert shard_df.offset.min() == 0
        assert (shard_df.offset + shard_df.n_tokens).max() == total
        # offsets are disjoint and contiguous: sorted offsets + lengths chain
        srt = shard_df.sort_values("offset")
        assert (srt.offset.values[1:] ==
                (srt.offset + srt.n_tokens).values[:-1]).all()
        assert (a.chunk_start == a.offset // 10).all()
        assert (a.chunk_end == (a.offset + a.n_tokens - 1) // 10).all()


def test_normalize_text(spark):
    from quickwit_spark.functions.text import normalize_text_col

    rows = [
        (1, "  hello​world  here  "),
        (2, "tabs\t\tand\x07control\x00chars"),
        (3, "line one  \n  line two\n\nline three"),
        (4, "﻿BOM­soft"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {r["id"]: r["c"] for r in
           df.select("id", normalize_text_col(F.col("t")).alias("c")).collect()}
    assert got[1] == "helloworld here"
    assert got[2] == "tabs andcontrolchars"
    assert got[3] == "line one\nline two\n\nline three"
    assert got[4] == "BOMsoft"


def test_gopher_rules(spark):
    from quickwit_spark.functions.text import gopher_features, gopher_keep_col

    good = ("the quick brown fox jumps over lazy dogs and runs to be with "
            "all of that good energy which we have kept alive here today "
            "while many other words continue filling this long document "
            "nicely until the word count exceeds fifty words in total okay "
            "adding a few more simple words pushes the count safely past")
    bullets = "\n".join(f"- item {i}" for i in range(20))
    symbols = "# " * 60 + "the of and to be that have with more words here"
    rows = [(1, good), (2, "too short"), (3, bullets), (4, symbols)]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = {r["id"]: r for r in df.select(
        "id", *gopher_features(F.col("t")),
        gopher_keep_col(F.col("t")).alias("keep")).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False          # word count < 50
    assert out[3]["bullet_line_frac"] == 1.0
    assert out[3]["keep"] is False          # bullets + too short
    assert out[4]["symbol_word_ratio"] > 0.1
    assert out[4]["keep"] is False


def test_epoch_shuffle_deterministic_and_balanced(spark):
    from quickwit_spark.operators.corpus import epoch_shuffle

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = epoch_shuffle(df, seed=3, num_shards=8).collect()
    # same seed, different partitioning → identical order
    b = epoch_shuffle(df.repartition(13), seed=3, num_shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # different seed → different order
    c = epoch_shuffle(df, seed=4, num_shards=8).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))
    # positions are dense 0..n-1 per shard, shards roughly balanced
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in a:
        by_shard[r["shard"]].append(r["pos"])
    assert len(by_shard) == 8
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
        assert 150 < len(ps) < 350  # ~250 each


class TestC4Rules:
    """C4 cleaning (Raffel et al. 2020 §2.2): line keep = terminal punct +
    >=5 words + no 'javascript'; page keep = >=3 surviving sentences, no
    'lorem ipsum', no curly brace."""

    def _run(self, spark, text):
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        row = df.select(
            *TX.c4_features(F.col("text")),
            TX.c4_keep_col(F.col("text")).alias("keep"),
        ).collect()[0]
        return row

    def test_line_rules(self, spark):
        text = "\n".join([
            "This is a perfectly fine sentence with many words.",   # kept
            "Too short.",                                            # <5 words
            "This line has plenty of words but no terminal punct",   # no punct
            "Please enable JavaScript to view the comments today.",  # js
            "Another good long sentence should also survive here!",  # kept
        ])
        row = self._run(spark, text)
        assert row["n_lines"] == 5
        assert row["n_kept_lines"] == 2
        assert row["clean_text"].count("\n") == 1
        assert "JavaScript" not in row["clean_text"]

    def test_page_rules(self, spark):
        good = ("One good long sentence right here today. " * 3).strip()
        assert self._run(spark, good)["keep"] is True
        # two sentences only -> dropped
        two = "A first long sentence with enough words. A second long sentence with enough words."
        assert self._run(spark, two)["keep"] is False
        lorem = good + "\nThe Lorem Ipsum generator made this text anyway."
        assert self._run(spark, lorem)["keep"] is False
        curly = good.replace("today.", "to{day.")
        assert self._run(spark, curly)["keep"] is False

    def test_sentence_count_over_clean_text_only(self, spark):
        # sentences in DROPPED lines must not count toward the page rule
        text = "Bad! Bad! Bad!\nOnly one good long sentence survives this filter."
        row = self._run(spark, text)
        assert row["n_kept_lines"] == 1
        assert row["n_sentences"] == 1
        assert row["keep"] is False


def test_es_nodes_and_search_shards_constants():
    from quickwit_spark import api

    info = api.nodes_info("n1", "10.0.0.1:7280")
    assert info["nodes"]["n1"]["roles"] == ["data", "ingest"]
    assert info["nodes"]["n1"]["http"]["publish_address"] == "10.0.0.1:7280"
    s = api.search_shards("logs", "n1")
    assert s == {"shards": [[{"index": "logs", "shard": 0, "primary": True, "node": "n1"}]]}


def test_tfidf_keywords_hand_computed(spark):
    """3-doc fixture with a shared term and a unique term: unique terms
    outrank corpus-wide ones; ties break by term ascending; min_df prunes."""
    import math

    from pyspark.sql import Row

    from quickwit_spark.operators.corpus import tfidf_keywords

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="apple apple banana common"),
            Row(doc_id=1, text="banana cherry common"),
            Row(doc_id=2, text="common common common"),
        ]
    )
    out = tfidf_keywords(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)

    def idf(df_):
        return math.log((3 + 1) / (df_ + 1)) + 1

    # doc 0: apple tf=2 df=1 beats banana tf=1 df=2 and common tf=1 df=3
    top0 = by_doc[0][0]
    assert top0["term"] == "apple" and top0["tf"] == 2 and top0["df"] == 1
    assert top0["tfidf"] == round(2 * idf(1), 6)
    assert by_doc[0][1]["term"] == "banana"
    # doc 1: cherry (unique) outranks banana (df=2) outranks common (df=3)
    assert [r["term"] for r in by_doc[1]] == ["cherry", "banana"]
    # doc 2: only one distinct term survives — k is a cap, not a quota
    assert [r["term"] for r in by_doc[2]] == ["common"]
    # deterministic tie-break: equal-score terms order ascending
    tie = spark.createDataFrame([Row(doc_id=9, text="zz aa")])
    got = [r["term"] for r in tfidf_keywords(tie, k=2).collect()]
    assert got == ["aa", "zz"]
    # min_df: terms appearing in fewer docs than the floor drop out
    pruned = tfidf_keywords(docs, k=3, min_df=2).collect()
    assert all(r["df"] >= 2 for r in pruned)
    assert {r["term"] for r in pruned} == {"banana", "common"}
