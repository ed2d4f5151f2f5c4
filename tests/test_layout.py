"""Z-order layout (operators/layout.py) and token-budget context
truncation (operators/chat.py truncate_context). The layout test measures
the thing the operator exists for: under a 2-D slice predicate, fewer
file bounding boxes intersect the query box than with single-column
clustering — file-level pruning a planner can actually use."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row, functions as F

from quickwit_spark.operators.chat import truncate_context
from quickwit_spark.operators.layout import (
    cluster_by_zorder,
    file_bounding_boxes,
    quantize,
    zorder_key,
)


class TestZorderKey:
    def test_known_interleave_vector(self, spark):
        # x=5 (101b), y=3 (011b) -> morton 011011b = 27
        row = (
            spark.range(1)
            .select(
                zorder_key([F.lit(5), F.lit(3)], bits=8).alias("z"),
                zorder_key([F.lit(0), F.lit(0)], bits=8).alias("z0"),
                zorder_key([F.lit(255), F.lit(255)], bits=8).alias("zmax"),
            )
            .collect()[0]
        )
        assert row["z"] == 27
        assert row["z0"] == 0
        assert row["zmax"] == (1 << 16) - 1

    def test_quantize_clamps(self, spark):
        rows = (
            spark.createDataFrame([(v,) for v in [-5.0, 0.0, 250.0, 499.9, 777.0]], "v double")
            .select(quantize(F.col("v"), 0.0, 500.0, 8).alias("c"))
            .collect()
        )
        assert [r["c"] for r in rows] == [0, 0, 128, 255, 255]

    def test_locality_beats_single_column_sort(self, spark, tmp_path):
        # 64x64 uniform grid; cluster into 16 files by (a) z-order and
        # (b) x alone; count files whose (x, y) bounding box intersects a
        # quarter-square query box. Z-order must touch strictly fewer.
        grid = spark.range(64 * 64).select(
            (F.col("id") % 64).cast("long").alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
        zpath, xpath = str(tmp_path / "z"), str(tmp_path / "x")
        cluster_by_zorder(grid, [F.col("x"), F.col("y")], 16, bits=6).write.parquet(zpath)
        grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xpath)

        def touched(path):
            files = glob.glob(os.path.join(path, "*.parquet"))
            boxes = file_bounding_boxes(files, ["x", "y"])
            hit = 0
            for b in boxes:
                (xlo, xhi), (ylo, yhi) = b["x"], b["y"]
                if xlo <= 15 and xhi >= 0 and ylo <= 15 and yhi >= 0:
                    hit += 1
            return hit, len(files)

        z_hit, z_total = touched(zpath)
        x_hit, x_total = touched(xpath)
        # x-sort: every file spans all of y, so every x-overlapping file is
        # touched; z-order confines the query corner to a few curve runs
        assert z_total == 16 and x_total == 16
        assert z_hit < x_hit
        assert z_hit <= 4


class TestTruncateContext:
    def _turns(self, spark, toks):
        return spark.createDataFrame(
            [
                Row(conv_id="c", turn_idx=i, n_tokens=t)
                for i, t in enumerate(toks)
            ]
        )

    def test_keeps_maximal_suffix(self, spark):
        # tokens oldest->newest: reverse cum from newest: 5,15,45,65
        df = self._turns(spark, [20, 30, 10, 5])
        kept = sorted(
            r["turn_idx"] for r in truncate_context(df, budget=45).collect()
        )
        assert kept == [1, 2, 3]  # 30+10+5=45 fits; adding 20 would not

    def test_newest_turn_always_survives(self, spark):
        df = self._turns(spark, [10, 999])
        kept = [r["turn_idx"] for r in truncate_context(df, budget=100).collect()]
        assert kept == [1]

    def test_under_budget_keeps_all(self, spark):
        df = self._turns(spark, [1, 2, 3])
        assert truncate_context(df, budget=100).count() == 3

    def test_single_exchange_plan(self, spark):
        df = self._turns(spark, [1, 2, 3])
        plan = (
            truncate_context(df, budget=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1  # both windows share one sort
