"""Checkpoint delta-compatibility vectors (FIXTURES.md F6, from
quickwit-metastore/src/checkpoint.rs:286-330)."""

import pytest

from quickwit_spark.pipeline.checkpoint import (
    CheckpointStore,
    EmptyOrNegativeDelta,
    IncompatibleCheckpointDelta,
    format_position,
)


def test_position_formatting():
    assert format_position(42) == "00000000000000000042"
    assert format_position(None) == ""
    assert format_position("abc") == "abc"


def test_contiguous_delta_applies(tmp_path):
    store = CheckpointStore(str(tmp_path))
    store.commit("src", {"p0": (None, 10)})
    store.commit("src", {"p0": (10, 20)})
    assert store.current("src")["p0"] == format_position(20)


def test_gap_applies_with_warning(tmp_path, caplog):
    store = CheckpointStore(str(tmp_path))
    store.commit("src", {"p0": (None, 10)})
    import logging

    # pyspark's structured-logging dictConfig may disable loggers created
    # before the SparkSession existed; re-enable ours for capture
    chk_logger = logging.getLogger("quickwit_spark.pipeline.checkpoint")
    chk_logger.disabled = False
    chk_logger.propagate = True
    with caplog.at_level(logging.WARNING):
        store.commit("src", {"p0": (15, 20)})
    assert any("gap" in r.message for r in caplog.records)
    assert store.current("src")["p0"] == format_position(20)


def test_overlap_rejected_checkpoint_unchanged(tmp_path):
    store = CheckpointStore(str(tmp_path))
    store.commit("src", {"p0": (None, 10)})
    with pytest.raises(IncompatibleCheckpointDelta):
        store.commit("src", {"p0": (5, 20)})
    assert store.current("src")["p0"] == format_position(10)


def test_empty_delta_rejected(tmp_path):
    store = CheckpointStore(str(tmp_path))
    with pytest.raises(EmptyOrNegativeDelta):
        store.commit("src", {"p0": (10, 10)})
    with pytest.raises(EmptyOrNegativeDelta):
        store.commit("src", {"p0": (10, 5)})


def test_already_committed_replay(tmp_path):
    store = CheckpointStore(str(tmp_path))
    store.commit("src", {"p0": (None, 10), "p1": (None, 5)})
    assert store.already_committed("src", {"p0": (None, 10)})
    assert store.already_committed("src", {"p0": (None, 10), "p1": (None, 5)})
    assert not store.already_committed("src", {"p0": (10, 20)})
    assert not store.already_committed("src", {"p2": (None, 1)})


def test_sources_independent(tmp_path):
    store = CheckpointStore(str(tmp_path))
    store.commit("a", {"p0": (None, 10)})
    assert store.current("b") == {}
    store.commit("b", {"p0": (None, 3)})
    assert store.current("a")["p0"] == format_position(10)
