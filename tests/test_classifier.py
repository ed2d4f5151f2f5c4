"""Hashed bag-of-words text classifier (operators/classifier.py) — the
fastText-style quality filter. Verifies: the portable hash agrees between
its Column and Python forms, the driver-side trainer is deterministic and
separates a planted good/bad corpus, and the distributed (codegen)
inference path reproduces the trainer's own numpy arithmetic exactly."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators import classifier as C


GOOD_WORDS = [
    "the", "quick", "analysis", "shows", "careful", "reasoning", "about",
    "measured", "results", "and", "clear", "structure", "with", "sources",
]
BAD_WORDS = [
    "zzxq", "fffff", "klmzz", "qqqqq", "xoxoxo", "blargh", "wxyzz",
    "nnnnn", "plorp", "zzyzx", "grrrr", "mmmmm",
]


def _planted_corpus(n=200, words_per_doc=12):
    rows = []
    for i in range(n):
        label = i % 2  # even ids bad, odd ids good
        vocab = GOOD_WORDS if label else BAD_WORDS
        toks = [vocab[(i * 7 + j * 3) % len(vocab)] for j in range(words_per_doc)]
        rows.append((i, " ".join(toks), label))
    return rows


class TestPortableHash:
    def test_column_matches_python(self, spark):
        toks = [
            "the", "a", "", "hello", "x" * 20, "abc123", "0", "reasoning",
            "exactly12chr", "thirteenchars",
        ]
        df = spark.createDataFrame([(t,) for t in toks], "tok string")
        got = {
            r["tok"]: r["h"]
            for r in df.select(
                "tok", C.hash_token_col(F.col("tok"), 4096).alias("h")
            ).collect()
        }
        for t in toks:
            assert got[t] == C.hash_token_py(t, 4096), t

    def test_prefix_independence_beyond_12(self, spark):
        # chars beyond HASH_PREFIX only matter through the length term
        a = C.hash_token_py("abcdefghijkl" + "xxx", 1024)
        b = C.hash_token_py("abcdefghijkl" + "yyy", 1024)
        assert a == b


class TestTrainer:
    def test_deterministic_and_separates(self, spark):
        rows = _planted_corpus()
        df = spark.createDataFrame(rows, "doc_id long, text string, label int")
        m1 = C.train_text_classifier(df, "label", buckets=512, epochs=150)
        m2 = C.train_text_classifier(df, "label", buckets=512, epochs=150)
        assert np.array_equal(m1.weights, m2.weights) and m1.bias == m2.bias

        scored = C.score_text_classifier(df, m1).orderBy("doc_id").collect()
        acc = sum(int(r["pred"] == (r["doc_id"] % 2)) for r in scored) / len(scored)
        assert acc >= 0.99

    def test_spark_inference_matches_numpy(self, spark):
        rows = _planted_corpus(n=60)
        df = spark.createDataFrame(rows, "doc_id long, text string, label int")
        model = C.train_text_classifier(df, "label", buckets=256, epochs=60)
        texts = [t for (_, t, _) in rows]
        ref = C.score_text_classifier_py(texts, model)
        got = {
            r["doc_id"]: r["score"]
            for r in C.score_text_classifier(df, model).collect()
        }
        for i in range(len(rows)):
            assert got[i] == pytest.approx(ref[i], abs=1e-6)


class TestScorerEdges:
    def test_zero_token_doc_scores_bias(self, spark):
        model = C.TextClassifier(np.zeros(64), bias=0.4, buckets=64)
        df = spark.createDataFrame(
            [(1, "hello world"), (2, "!!! ???"), (3, None)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in C.score_text_classifier(df, model).collect()}
        sig = 1.0 / (1.0 + np.exp(-0.4))
        # all-zero weights: every doc scores sigmoid(bias); empty/null docs too
        for i in (1, 2, 3):
            assert out[i]["score"] == pytest.approx(sig, abs=1e-6)
        assert out[2]["n_tokens"] == 0 and out[1]["n_tokens"] == 2

    def test_formula_weights_regenerable(self, spark):
        w = C.formula_weights(16, scale=2.0)
        for b in range(16):
            assert w[b] == pytest.approx(
                2.0 * (((b * 1103515245 + 12345) % 2001) - 1000) / 1000.0
            )

    def test_plan_is_codegen_broadcast(self, spark):
        model = C.TextClassifier(C.formula_weights(128), bias=0.0, buckets=128)
        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = (
            C.score_text_classifier(df, model)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
