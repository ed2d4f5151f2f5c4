"""End-to-end pipeline tests: parse → enrich → route → sinks → aggregates,
oracle-checked against pandas/duckdb, plus the kill-and-resume contract.

Correctness contracts from BASELINE.json: per-sink aggregate counts equal to
oracle, routed-row-set equality, per-turn text equality under stable
(conv_id, turn_idx) ordering.
"""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from quickwit_spark.pipeline.runner import PipelineConfig, read_sinks, run_pipeline
from quickwit_spark.pipeline.stages import enrich_stage, parse_stage, route_stage
from quickwit_spark.pipeline.transcripts import gen_transcripts, materialize
from quickwit_spark.routing import RoutingExpr

N_TURNS = 5000


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("transcripts")
    return materialize(N_TURNS, str(d), seed=42)


@pytest.fixture(scope="module")
def tdf(spark, data_dir):
    return spark.read.parquet(os.path.join(data_dir, "transcripts.parquet")).cache()


@pytest.fixture(scope="module")
def tenants_df(spark, data_dir):
    return spark.read.parquet(os.path.join(data_dir, "tenants.parquet"))


def test_generator_deterministic():
    t1 = gen_transcripts(1000, seed=42)
    t2 = gen_transcripts(1000, seed=42)
    assert t1.equals(t2)
    assert t1.column_names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_generator_skew_and_span():
    t = gen_transcripts(20000, seed=42).to_pandas()
    sizes = t.groupby("conv_id").size().sort_values(ascending=False)
    assert sizes.iloc[:max(1, len(sizes) // 50)].sum() / len(t) > 0.10  # hot convs
    span_days = (t.ts.max() - t.ts.min()).days
    assert span_days >= 90


def test_parse_stage_extracts_fields(tdf):
    parsed = parse_stage(tdf).cache()
    pdf = parsed.toPandas()
    valid = pdf[pdf._error_category == "valid"]
    bad = pdf[pdf._error_category != "valid"]
    # ~5% malformed
    assert 0.01 < len(bad) / len(pdf) < 0.12
    assert valid.level.isin(["INFO", "WARN", "ERROR", "DEBUG"]).all()
    assert valid.tenant_id.str.match(r"acme-\d{3}").all()
    assert (valid.latency_ms > 0).all()
    assert valid.msg.notna().all()
    # oracle: recompute with pandas regex
    import re

    sample = valid.sample(200, random_state=0)
    for _, r in sample.iterrows():
        m = re.search(r"level=(\w+)", r.text)
        assert m and m.group(1) == r.level
        m = re.search(r'msg="([^"]*)"', r.text)
        assert m and m.group(1) == r.msg


def test_parse_malformed_quarantined(tdf):
    parsed = parse_stage(tdf)
    bad = parsed.filter(F.col("_error_category") == "doc_mapper_error")
    assert bad.filter(F.col("_error").isNull()).count() == 0
    # malformed rows are exactly those without level=
    expected = tdf.filter(~F.col("text").rlike("level=")).count()
    assert bad.count() == expected


def test_enrich_is_broadcast_join(tdf, tenants_df):
    enriched = enrich_stage(parse_stage(tdf), tenants_df)
    plan = enriched._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # every valid row has a tier
    assert (
        enriched.filter((F.col("_error_category") == "valid") & F.col("tier").isNull()).count()
        == 0
    )


def test_route_partition_parity_with_reference_hash(tdf, tenants_df):
    routed = route_stage(enrich_stage(parse_stage(tdf), tenants_df), "tenant_id")
    rows = routed.select("tenant_id", "partition_id").limit(300).collect()
    expr = RoutingExpr("tenant_id")
    for r in rows:
        doc = {} if r["tenant_id"] is None else {"tenant_id": r["tenant_id"]}
        expected = expr.eval_hash(doc)
        got = r["partition_id"] & 0xFFFFFFFFFFFFFFFF
        assert got == expected


def test_route_sink_keys(tdf, tenants_df):
    routed = route_stage(enrich_stage(parse_stage(tdf), tenants_df), "tenant_id")
    sinks = {r["sink"] for r in routed.select("sink").distinct().collect()}
    assert {"user", "assistant", "system"} <= sinks
    assert any(s.startswith("tool_") for s in sinks)


@pytest.fixture(scope="module")
def pipeline_out(spark, data_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pipeline_out"))
    metrics = run_pipeline(spark, data_dir, out, PipelineConfig(), num_chunks=2)
    return out, metrics


def test_pipeline_end_to_end_counts(spark, data_dir, pipeline_out):
    out, metrics = pipeline_out
    assert len(metrics) == 2
    sinks = read_sinks(spark, out)
    con = duckdb.connect()
    tpath = os.path.join(data_dir, "transcripts.parquet")
    # oracle: valid rows = rows whose text has level= and tenant= and latency digits
    oracle_valid = con.sql(
        f"""
        SELECT count(*) FROM '{tpath}/*.parquet'
        WHERE regexp_matches(text, 'level=\\w+') AND regexp_matches(text, 'tenant=[\\w-]+')
        """
    ).fetchone()[0]
    assert sinks.count() == oracle_valid
    total = sum(m["num_valid"] for m in metrics)
    assert total == oracle_valid


def test_pipeline_routed_row_set_equality(spark, data_dir, pipeline_out):
    """Routed-row-set equality vs a duckdb oracle computing sink assignment."""
    out, _ = pipeline_out
    sinks = read_sinks(spark, out)
    got = {
        (r["conv_id"], r["turn_idx"], r["sink"])
        for r in sinks.select("conv_id", "turn_idx", "sink").collect()
    }
    con = duckdb.connect()
    tpath = os.path.join(data_dir, "transcripts.parquet")
    oracle = con.sql(
        f"""
        SELECT conv_id, turn_idx,
               CASE WHEN role='tool' THEN 'tool_' || coalesce(tool, 'nil') ELSE role END AS sink
        FROM '{tpath}/*.parquet'
        WHERE regexp_matches(text, 'level=\\w+') AND regexp_matches(text, 'tenant=[\\w-]+')
        """
    ).fetchall()
    assert got == set(oracle)


def test_pipeline_per_turn_text_equality(spark, data_dir, pipeline_out):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering."""
    out, _ = pipeline_out
    sinks = read_sinks(spark, out).select("conv_id", "turn_idx", "text")
    orig = spark.read.parquet(os.path.join(data_dir, "transcripts.parquet")).select(
        "conv_id", "turn_idx", "text"
    )
    joined = sinks.alias("s").join(orig.alias("o"), ["conv_id", "turn_idx"])
    mismatches = joined.filter(F.col("s.text") != F.col("o.text")).count()
    assert mismatches == 0
    # ordering stability: reading back sorted matches the original sequence
    got = [
        (r["conv_id"], r["turn_idx"])
        for r in sinks.orderBy("conv_id", "turn_idx").limit(500).collect()
    ]
    assert got == sorted(got)


def test_pipeline_aggregates_match_oracle(spark, data_dir, pipeline_out):
    out, _ = pipeline_out
    metrics = spark.read.parquet(os.path.join(out, "_metrics"))
    got = {
        (r["bucket"], r["sink"]): r["doc_count"]
        for r in metrics.groupBy(
            F.date_format("bucket_start", "yyyy-MM-dd").alias("bucket"), "sink"
        )
        .agg(F.sum("doc_count").alias("doc_count"))
        .collect()
    }
    con = duckdb.connect()
    tpath = os.path.join(data_dir, "transcripts.parquet")
    oracle = con.sql(
        f"""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket,
               CASE WHEN role='tool' THEN 'tool_' || coalesce(tool,'nil') ELSE role END AS sink,
               count(*) AS n
        FROM '{tpath}/*.parquet'
        WHERE regexp_matches(text, 'level=\\w+') AND regexp_matches(text, 'tenant=[\\w-]+')
        GROUP BY 1, 2
        """
    ).fetchall()
    oracle_map = {(b, s): n for b, s, n in oracle}
    assert got == oracle_map


def test_pipeline_lineage_written(spark, pipeline_out):
    out, _ = pipeline_out
    lineage = spark.read.parquet(os.path.join(out, "_lineage"))
    row = lineage.first()
    assert row["num_docs"] > 0 and row["time_range_start"] is not None
    assert set(lineage.select("commit_id").distinct().toPandas()["commit_id"]) == {
        "chunk0000", "chunk0001",
    }


def test_pipeline_resume_no_duplicates(spark, data_dir, tmp_path_factory):
    """Kill-and-resume: partial run then full run ⇒ identical output set."""
    out = str(tmp_path_factory.mktemp("resume_out"))
    # first run processes only chunk 0 (simulate a kill after chunk 0)
    m1 = run_pipeline(spark, data_dir, out, PipelineConfig(), num_chunks=2)
    # drop the chunk-1 data + checkpoint to simulate dying mid-run
    import glob
    import shutil

    for p in glob.glob(os.path.join(out, "sinks", "commit=chunk0001")):
        shutil.rmtree(p)
    for p in glob.glob(os.path.join(out, "_checkpoints", "chunk0001.json")):
        os.remove(p)

    # resume: chunk 0 must be skipped (already committed), chunk 1 re-runs
    m2 = run_pipeline(spark, data_dir, out, PipelineConfig(), num_chunks=2)
    assert [m["commit_id"] for m in m2] == ["chunk0001"]

    sinks = read_sinks(spark, out)
    assert sinks.count() == sinks.dropDuplicates(["conv_id", "turn_idx"]).count()
    con = duckdb.connect()
    tpath = os.path.join(data_dir, "transcripts.parquet")
    oracle_valid = con.sql(
        f"SELECT count(*) FROM '{tpath}/*.parquet' WHERE regexp_matches(text, 'level=\\w+')"
    ).fetchone()[0]
    assert sinks.count() == oracle_valid


def test_partition_bucket_is_unsigned_u64_mod(spark):
    """hash_mod caps on the u64 value: for hashes >= 2^63 the signed pmod is
    off by (2^64 % N) when N isn't a power of two (ADVICE r1)."""
    from quickwit_spark.pipeline.stages import route_stage
    from quickwit_spark.routing import RoutingExpr

    expr = RoutingExpr("tenant_id")
    # find tenants hashing into the top half of u64 space (negative as i64)
    import numpy as np
    import pandas as pd

    names = [f"tenant-{i}" for i in range(64)]
    hashes = expr.eval_hash_columns({"tenant_id": pd.Series(names)})
    assert (hashes >= np.uint64(1) << np.uint64(63)).any(), "fixture needs a high hash"

    df = spark.createDataFrame(
        [(n, "user", None) for n in names],
        "tenant_id string, role string, tool string",
    )
    got = {
        r["tenant_id"]: r["partition_bucket"]
        for r in route_stage(df, "tenant_id", max_num_partitions=200).collect()
    }
    for name, h in zip(names, hashes):
        assert got[name] == int(h) % 200, (name, int(h))


def test_run_chunk_crash_retry_is_idempotent(spark, data_dir, tmp_path_factory):
    """Crash AFTER sink write but BEFORE checkpoint commit: the retry must
    replace (not append) the per-commit outputs — exactly-once publish."""
    import glob

    out = str(tmp_path_factory.mktemp("retry_out"))
    run_pipeline(spark, data_dir, out, PipelineConfig(), num_chunks=1)
    baseline = read_sinks(spark, out).count()
    base_lineage = spark.read.parquet(os.path.join(out, "_lineage")).count()

    # simulate the crash: data landed, checkpoint didn't
    for p in glob.glob(os.path.join(out, "_checkpoints", "*.json")):
        os.remove(p)
    run_pipeline(spark, data_dir, out, PipelineConfig(), num_chunks=1)

    assert read_sinks(spark, out).count() == baseline  # no duplicate part files
    assert spark.read.parquet(os.path.join(out, "_lineage")).count() == base_lineage
    assert (
        spark.read.parquet(os.path.join(out, "quarantine"))
        .select("conv_id", "turn_idx")
        .distinct()
        .count()
        == spark.read.parquet(os.path.join(out, "quarantine")).count()
    )


def test_spark_submit_py_files_entrypoint(tmp_path_factory):
    """North-rule shape: the pipeline runs under `spark-submit --py-files
    <pkg.zip>` from OUTSIDE the repo (fresh JVM, package shipped as an
    archive — the same mechanics as a multi-executor cluster submit)."""
    import json
    import shutil
    import subprocess
    import sys

    import pyspark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work = str(tmp_path_factory.mktemp("submit"))
    pkg = shutil.make_archive(
        os.path.join(work, "quickwit_spark_pkg"), "zip",
        root_dir=repo, base_dir="quickwit_spark",
    )
    src = os.path.join(work, "in")
    out = os.path.join(work, "out")
    metrics = os.path.join(work, "metrics.json")
    from quickwit_spark.pipeline.transcripts import materialize

    materialize(2_000, src, seed=5)

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    proc = subprocess.run(
        [
            submit, "--master", "local[4]", "--py-files", pkg,
            os.path.join(repo, "scripts", "submit_pipeline.py"),
            "--input", src, "--output", out, "--chunks", "2",
            "--json-metrics", metrics,
        ],
        capture_output=True, text=True, timeout=600, cwd=work,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    m = json.load(open(metrics))
    assert m["chunks_committed"] == ["chunk0000", "chunk0001"]
    assert m["num_valid"] > 1500


def test_partition_bucket_sink_layout(spark, data_dir, tmp_path_factory):
    """Optional physical layout partitionBy(sink, partition_bucket): same row
    set, bucket recoverable from the path (per-bucket file pruning at scale)."""
    out = str(tmp_path_factory.mktemp("bucket_layout"))
    cfg = PipelineConfig(max_num_partitions=8, partition_bucket_layout=True)
    run_pipeline(spark, data_dir, out, cfg, num_chunks=1)
    sinks = read_sinks(spark, out)
    assert "partition_bucket" in sinks.columns
    assert sinks.select("partition_bucket").distinct().count() <= 8
    import glob as g

    leafs = g.glob(os.path.join(out, "sinks", "commit=*", "sink=*", "partition_bucket=*"))
    assert leafs, "bucket dirs exist in the physical layout"
    # row set identical to the flat layout
    flat_out = str(tmp_path_factory.mktemp("flat_layout"))
    run_pipeline(spark, data_dir, flat_out, PipelineConfig(max_num_partitions=8), num_chunks=1)
    a = {tuple(r) for r in sinks.select("conv_id", "turn_idx", "sink").collect()}
    b = {
        tuple(r)
        for r in read_sinks(spark, flat_out).select("conv_id", "turn_idx", "sink").collect()
    }
    assert a == b


def test_parse_stage_malformed_lines_quarantine_not_crash(spark):
    """Self-review r4: duplicated k=v keys, overflowing latency digits and
    k=v text inside the quoted msg must quarantine/ignore, never abort the
    chunk — and never fabricate declared fields from message content."""
    from quickwit_spark.pipeline.stages import parse_stage

    rows = [
        ("c1", 0, 'level=INFO tenant=t1 msg="hi" retry=1 retry=2'),
        ("c2", 0, 'level=INFO tenant=t2 latency_ms=99999999999999999999 msg="x"'),
        ("c3", 0, 'level=INFO msg="please set tenant=evil now"'),
        ("c4", 0, 'level=WARN tenant=t4 latency_ms=12 msg="ok"'),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])
    out = {r["conv_id"]: r for r in parse_stage(df).collect()}
    # duplicate dynamic key: last wins, row still valid
    assert out["c1"]["_error_category"] == "valid"
    assert out["c1"]["_dynamic"]["retry"] == "2"
    # overflowing latency: null field, row valid (latency is optional)
    assert out["c2"]["latency_ms"] is None
    assert out["c2"]["_error_category"] == "valid"
    # tenant inside msg content is NOT a field: doc_mapper_error
    assert out["c3"]["tenant_id"] is None
    assert out["c3"]["_error_category"] == "doc_mapper_error"
    assert out["c4"]["latency_ms"] == 12


def test_all_invalid_chunk_commits_and_pipeline_progresses(spark, tmp_path_factory):
    """Self-review r4: a chunk whose rows are ALL invalid must still publish
    its checkpoint delta (no lineage/metrics) instead of wedging the
    pipeline on an unreadable empty sink dir."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from quickwit_spark.pipeline.runner import PipelineConfig, run_pipeline

    root = tmp_path_factory.mktemp("poison")
    vin = str(root / "in")
    os.makedirs(vin)
    n = 8
    tbl = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(n)]),
        "turn_idx": pa.array(list(range(n)), pa.int32()),
        "role": pa.array(["user"] * n),
        "text": pa.array(["no declared fields here at all"] * n),
        "tool": pa.array([None] * n, pa.string()),
        "ts": pa.array([1700000000000000 + i for i in range(n)], pa.timestamp("us")),
    })
    pq.write_table(tbl, os.path.join(vin, "transcripts.parquet"))
    pq.write_table(pa.table({
        "tenant_id": pa.array(["t1"]), "tenant_name": pa.array(["T"]),
        "tier": pa.array(["gold"]), "region": pa.array(["eu"]),
    }), os.path.join(vin, "tenants.parquet"))

    out = str(root / "out")
    res = run_pipeline(spark, vin, out, PipelineConfig(), num_chunks=2)
    assert len(res) == 2
    for m in res:
        assert m["outcome_counts"].get("valid", 0) == 0
        assert m["outcome_counts"]["doc_mapper_error"] > 0
    # re-run: all chunks already committed → no reprocessing, no crash
    assert run_pipeline(spark, vin, out, PipelineConfig(), num_chunks=2) == []


def test_degenerate_chunking_and_empty_table(spark, tmp_path_factory):
    from quickwit_spark.pipeline.transcripts import materialize
    from quickwit_spark.pipeline.runner import PipelineConfig, run_pipeline

    root = tmp_path_factory.mktemp("degenerate")
    vin = str(root / "in")
    materialize(60, vin, seed=11)
    out = str(root / "out")
    # num_chunks far beyond max turn_idx: empty ranges skipped, the rest
    # commit contiguously
    res = run_pipeline(spark, vin, out, PipelineConfig(), num_chunks=50)
    total = sum(m["num_valid"] for m in res)
    assert total > 0
    assert run_pipeline(spark, vin, out, PipelineConfig(), num_chunks=50) == []

    # empty input table: no chunks, no crash
    import pyarrow as pa
    import pyarrow.parquet as pq

    vin2 = str(root / "empty")
    os.makedirs(vin2)
    pq.write_table(pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "role": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
        "tool": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us")),
    }), os.path.join(vin2, "transcripts.parquet"))
    pq.write_table(pa.table({
        "tenant_id": pa.array(["t1"]), "tenant_name": pa.array(["T"]),
        "tier": pa.array(["gold"]), "region": pa.array(["eu"]),
    }), os.path.join(vin2, "tenants.parquet"))
    assert run_pipeline(spark, vin2, str(root / "out2"), PipelineConfig()) == []
