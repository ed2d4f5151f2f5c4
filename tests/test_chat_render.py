"""Conversation rendering (operators/chat.py): templates, stable turn
ordering without a global sort, and the loss-mask span fold — every
assistant span must extract its turn text verbatim from the rendered
string."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quickwit_spark.operators.chat import render_conversations


TURNS = [
    # conv 1 deliberately out of order
    (1, 2, "assistant", "It rains."),
    (1, 0, "user", "Hello?"),
    (1, 1, "assistant", "Hi there!"),
    (1, 3, "tool", "weather(city=x)"),
    (2, 0, "user", "Only a question."),
]


def _df(spark, rows=TURNS):
    return spark.createDataFrame(
        rows, "conv_id long, turn_idx long, role string, text string"
    )


class TestChatML:
    def test_rendered_layout_and_order(self, spark):
        out = {
            r["conv_id"]: r
            for r in render_conversations(_df(spark)).collect()
        }
        assert out[1]["rendered"] == (
            "<|im_start|>user\nHello?<|im_end|>\n"
            "<|im_start|>assistant\nHi there!<|im_end|>\n"
            "<|im_start|>assistant\nIt rains.<|im_end|>\n"
            "<|im_start|>tool\nweather(city=x)<|im_end|>\n"
        )
        assert out[1]["n_turns"] == 4 and out[2]["n_turns"] == 1
        assert out[2]["span_starts"] == []

    def test_spans_extract_assistant_text_verbatim(self, spark):
        for r in render_conversations(_df(spark)).collect():
            rendered = r["rendered"]
            texts = [
                rendered[s - 1 : e - 1]
                for s, e in zip(r["span_starts"], r["span_ends"])
            ]
            expected = [
                t for (c, _, role, t) in sorted(TURNS)
                if c == r["conv_id"] and role == "assistant"
            ]
            assert texts == expected

    def test_plain_template_and_null_text(self, spark):
        rows = [(9, 0, "user", "q"), (9, 1, "assistant", None)]
        out = render_conversations(_df(spark, rows), template="plain").collect()[0]
        assert out["rendered"] == "user: q\nassistant: \n"
        # null text renders empty: the span is zero-width
        assert list(out["span_starts"]) == [len("user: q\nassistant: ") + 1]
        assert out["span_ends"][0] == out["span_starts"][0]

    def test_unknown_template_rejected(self, spark):
        with pytest.raises(ValueError, match="unknown template"):
            render_conversations(_df(spark), template="nope")

    def test_single_shuffle_no_python(self, spark):
        plan = (
            render_conversations(_df(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
