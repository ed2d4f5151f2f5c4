"""Scalar-quantization (SQ8) ANN (operators/similarity.py): per-dim 8-bit
codes (Faiss ScalarQuantizer QT_8bit layout), pure-codegen encode and ADC
scoring. Verifies reconstruction bounds, numpy parity of the encoder,
top-k fidelity on planted neighbors, zero-range-dim safety, and that the
whole path stays JVM-side."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators import similarity as S


def _mk(spark, X):
    return spark.createDataFrame(
        [(i, [float(v) for v in x]) for i, x in enumerate(X)],
        "vec_id long, embedding array<double>",
    )


def _np_encode(X, mins, scales):
    with np.errstate(divide="ignore", invalid="ignore"):
        c = np.round((X - mins) / scales)
    c = np.where(scales == 0.0, 0.0, c)
    return np.clip(c, 0, 255).astype(int)


class TestSQ8:
    def test_params_and_encode_match_numpy(self, spark):
        rng = np.random.default_rng(3)
        X = rng.normal(size=(40, 8))
        df = _mk(spark, X)
        mins, scales = S.sq8_params(df)
        assert mins == pytest.approx(X.min(axis=0))
        assert scales == pytest.approx((X.max(axis=0) - X.min(axis=0)) / 255.0)
        got = {
            r["vec_id"]: r["codes"]
            for r in S.sq8_encode(df, mins, scales).collect()
        }
        ref = _np_encode(X, mins, scales)
        for i in range(len(X)):
            assert got[i] == list(ref[i])

    def test_reconstruction_error_bounded(self, spark):
        rng = np.random.default_rng(7)
        X = rng.uniform(-2, 5, size=(60, 16))
        df = _mk(spark, X)
        mins, scales = S.sq8_params(df)
        codes = _np_encode(X, mins, scales)
        recon = mins + codes * scales
        # rounding error is at most half a quantization step per dim
        assert np.abs(recon - X).max() <= (scales.max() / 2) + 1e-12

    def test_topk_finds_planted_neighbors(self, spark):
        rng = np.random.default_rng(11)
        X = rng.normal(size=(200, 32))
        q = rng.normal(size=32)
        X[17] = q + 0.01 * rng.normal(size=32)  # planted near-exact hits
        X[42] = q + 0.02 * rng.normal(size=32)
        df = _mk(spark, X)
        mins, scales = S.sq8_params(df)
        enc = S.sq8_encode(df, mins, scales)
        top = S.sq8_topk(enc, [float(v) for v in q], mins, scales, k=5).collect()
        ids = [r["vec_id"] for r in top]
        assert ids[0] == 17 and 42 in ids[:2]
        dists = [r["dist"] for r in top]
        assert dists == sorted(dists)

    def test_zero_range_dim_is_safe(self, spark):
        X = np.array([[1.0, 5.0], [1.0, -3.0], [1.0, 0.0]])  # dim 0 constant
        df = _mk(spark, X)
        mins, scales = S.sq8_params(df)
        assert scales[0] == 0.0
        rows = S.sq8_encode(df, mins, scales).orderBy("vec_id").collect()
        assert [r["codes"][0] for r in rows] == [0, 0, 0]
        top = S.sq8_topk(
            S.sq8_encode(df, mins, scales), [1.0, 5.0], mins, scales, k=3
        ).collect()
        assert top[0]["vec_id"] == 0 and all(np.isfinite(r["dist"]) for r in top)

    def test_pure_codegen_plan(self, spark):
        rng = np.random.default_rng(5)
        X = rng.normal(size=(20, 8))
        df = _mk(spark, X)
        mins, scales = S.sq8_params(df)
        plan = (
            S.sq8_topk(S.sq8_encode(df, mins, scales), [0.0] * 8, mins, scales, k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
