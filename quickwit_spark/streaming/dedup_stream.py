"""Streaming near-dup dedup: MinHash-LSH over a continuous document feed.

Wires :func:`quickwit_spark.operators.dedup.minhash_dedup_incremental`
into Structured Streaming's ``foreachBatch`` loop with a persisted
signature index, the same continuous-micro-batching model as
stream_pipeline.py (the reference commits micro-batches and makes them
searchable at the next commit; here each commit additionally contributes
its survivors' signatures to the dedup index consulted by every later
batch).

Exactly-once layout (the invariant shared with stream_pipeline.py): every
epoch writes to EPOCH-SCOPED directories with overwrite —

    <out>/kept/epoch=N        surviving document rows
    <out>/pairs/epoch=N       matched near-dup pairs (audit trail)
    <out>/sig_index/epoch=N   survivors' (id, signature) rows

so a replayed epoch REPLACES its own output instead of appending
duplicates, and epoch N's probe index is ``sig_index`` filtered to
``epoch < N`` — partition pruning skips the epoch's own (possibly
half-written, crashed-attempt) directory, which would otherwise
self-match the batch. Spark's checkpointLocation persists the source
offsets; together the pair is exactly-once end to end.

Scale shape: identical to the batch operator — the accumulated index
contributes postings derived in codegen from stored signatures, the new
micro-batch broadcasts, corpus text from prior epochs is never re-read.
A year of 1 TB/day ingestion probes 365 epoch directories of signatures
(num_perm × 8 bytes/doc), not 365 TB of text.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from quickwit_spark.operators.dedup import minhash_dedup_incremental


def _empty_index(spark: SparkSession, id_col: str) -> DataFrame:
    return spark.createDataFrame(
        [], f"{id_col} long, signature array<bigint>"
    )


# --- index layout: epoch=N deltas + compacted base generations -----------
#
# A long-lived stream accumulates one epoch=N directory per micro-batch;
# compact_index() folds epochs < upto into a GENERATIONAL base:
#
#     <index>/base_v3/                merged parquet
#     <index>/base_v3.manifest.json   {"upto_epoch": 37}   <- the commit
#
# The manifest file is written LAST (tmp + os.replace), so readers are
# consistent at every crash point: data-without-manifest is invisible;
# manifest-present means folded epoch dirs are EXCLUDED even if their
# directories still exist (cleanup is best-effort and idempotent — the
# next compaction or repair sweep removes leftovers). This is the same
# data-durable-then-commit discipline as the pipeline's publish step and
# the janitor's staged swaps.


def _base_state(index_dir: str) -> tuple[int, int, str | None]:
    """(version, upto_epoch, base_dir) of the newest COMMITTED base —
    (0, minimal, None) when no base generation exists."""
    best = (0, -(10**18), None)
    if not os.path.isdir(index_dir):
        return best
    for name in os.listdir(index_dir):
        if name.startswith("base_v") and name.endswith(".manifest.json"):
            try:
                v = int(name[len("base_v"):-len(".manifest.json")])
                with open(os.path.join(index_dir, name)) as f:
                    upto = int(json.load(f)["upto_epoch"])
            except (ValueError, KeyError, OSError):
                continue
            d = os.path.join(index_dir, f"base_v{v}")
            if v > best[0] and os.path.isdir(d):
                best = (v, upto, d)
    return best


def _epoch_dirs(index_dir: str) -> dict[int, str]:
    if not os.path.isdir(index_dir):
        return {}
    out = {}
    for name in os.listdir(index_dir):
        if name.startswith("epoch="):
            try:
                out[int(name.split("=", 1)[1])] = os.path.join(index_dir, name)
            except ValueError:
                continue
    return out


def _read_index(
    spark: SparkSession,
    index_dir: str,
    empty_schema: str,
    cols: list[str],
    before_epoch: int | None,
) -> DataFrame:
    """Newest committed base + live epoch deltas in [base.upto,
    before_epoch). Directory selection happens here, driver-side — the
    plan only ever scans live files (stronger than partition pruning: a
    crashed attempt's own half-written epoch dir is never even listed)."""
    _, base_upto, base_dir = _base_state(index_dir)
    paths = [base_dir] if base_dir else []
    for e, d in sorted(_epoch_dirs(index_dir).items()):
        if e < base_upto:
            continue  # folded into the base; dir may be a cleanup leftover
        if before_epoch is not None and e >= before_epoch:
            continue
        paths.append(d)
    if not paths:
        return spark.createDataFrame([], empty_schema)
    return spark.read.parquet(*paths).select(*cols)


def compact_index(
    spark: SparkSession,
    index_dir: str,
    upto_epoch: int,
    num_files: int = 8,
) -> dict:
    """Fold every committed epoch delta below ``upto_epoch`` (plus the
    previous base) into one new base generation. ``upto_epoch`` MUST NOT
    exceed the stream's last committed epoch + 1 — never fold an in-flight
    epoch (its replay-after-crash would then probe its own half-written
    signatures out of the base). Safe to run between triggers or from a
    separate maintenance job; a crash at any point leaves readers
    consistent (see layout note above).

    Returns {"version", "upto_epoch", "folded"} (folded = 0 is a no-op:
    nothing below the bound)."""
    ver, base_upto, base_dir = _base_state(index_dir)
    # sweep crash leftovers from a previous compaction's cleanup phase:
    # epoch dirs below the committed base bound are invisible to readers
    for e, d in _epoch_dirs(index_dir).items():
        if e < base_upto:
            shutil.rmtree(d, ignore_errors=True)
    fold = [
        d for e, d in sorted(_epoch_dirs(index_dir).items())
        if base_upto <= e < upto_epoch
    ]
    if not fold:
        return {"version": ver, "upto_epoch": base_upto, "folded": 0}
    paths = ([base_dir] if base_dir else []) + fold
    new_dir = os.path.join(index_dir, f"base_v{ver + 1}")
    shutil.rmtree(new_dir, ignore_errors=True)  # uncommitted leftover
    spark.read.parquet(*paths).coalesce(num_files).write.mode(
        "overwrite"
    ).parquet(new_dir)
    manifest = os.path.join(index_dir, f"base_v{ver + 1}.manifest.json")
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"upto_epoch": int(upto_epoch)}, f)
    os.replace(tmp, manifest)  # <- commit point
    # best-effort cleanup; leftovers are invisible to readers either way
    for d in fold:
        shutil.rmtree(d, ignore_errors=True)
    if base_dir:
        shutil.rmtree(base_dir, ignore_errors=True)
        try:
            os.remove(os.path.join(index_dir, f"base_v{ver}.manifest.json"))
        except OSError:
            pass
    return {"version": ver + 1, "upto_epoch": int(upto_epoch), "folded": len(fold)}


def read_sig_index(
    spark: SparkSession,
    index_dir: str,
    id_col: str = "doc_id",
    before_epoch: int | None = None,
) -> DataFrame:
    """The accumulated signature index — newest compacted base + epoch
    deltas before ``before_epoch`` (driver-side dir selection, so a
    crashed attempt's own directory is never scanned)."""
    return _read_index(
        spark,
        index_dir,
        f"{id_col} long, signature array<bigint>",
        [id_col, "signature"],
        before_epoch,
    )


def stream_minhash_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: str = "doc_id long, text string",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_size: int = 3,
    num_perm: int = 64,
    num_bands: int = 16,
    seed: int = 1,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming dedup; returns the StreamingQuery.

    Source: parquet file stream over ``input_dir`` (new files = new
    documents). Ids must be globally unique across the feed — the same
    contract as the batch operator."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_dir)

    kept_dir = os.path.join(out_dir, "kept")
    pairs_dir = os.path.join(out_dir, "pairs")
    index_dir = os.path.join(out_dir, "sig_index")

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index = read_sig_index(spark, index_dir, id_col, before_epoch=epoch_id)
        res = minhash_dedup_incremental(
            batch_df,
            index,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            shingle_size=shingle_size,
            num_perm=num_perm,
            num_bands=num_bands,
            seed=seed,
        )
        (
            batch_df.join(res.new_kept, id_col, "semi")
            .write.mode("overwrite")
            .parquet(os.path.join(kept_dir, f"epoch={epoch_id}"))
        )
        res.pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"epoch={epoch_id}")
        )
        res.kept_sigs.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"epoch={epoch_id}")
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", os.path.join(out_dir, "_dedup_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_emb_index(
    spark: SparkSession,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    before_epoch: int | None = None,
) -> DataFrame:
    """The accumulated embedding index (same epoch+base layout and
    compaction rules as :func:`read_sig_index`)."""
    return _read_index(
        spark,
        index_dir,
        f"{id_col} long, {vec_col} array<double>",
        [id_col, vec_col],
        before_epoch,
    )


def stream_embedding_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    schema: str = "vec_id long, embedding array<double>",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    bits: int = 8,
    tables: int = 8,
    seed: int = 11,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming SEMANTIC dedup: every micro-batch of embeddings is deduped
    against the accumulated survivor index by exact cosine (broadcast
    batch, one index scan — similarity.embedding_dedup_incremental), with
    the identical epoch-scoped exactly-once layout as
    :func:`stream_minhash_dedup` (kept/, pairs/, emb_index/)."""
    from quickwit_spark.operators.similarity import embedding_dedup_incremental

    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_dir)

    kept_dir = os.path.join(out_dir, "kept")
    pairs_dir = os.path.join(out_dir, "pairs")
    index_dir = os.path.join(out_dir, "emb_index")

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index = read_emb_index(
            spark, index_dir, id_col, vec_col, before_epoch=epoch_id
        )
        res = embedding_dedup_incremental(
            batch_df,
            index,
            vec_col=vec_col,
            id_col=id_col,
            threshold=threshold,
            bits=bits,
            tables=tables,
            seed=seed,
        )
        (
            batch_df.join(res.new_kept, id_col, "semi")
            .write.mode("overwrite")
            .parquet(os.path.join(kept_dir, f"epoch={epoch_id}"))
        )
        res.pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"epoch={epoch_id}")
        )
        res.kept_sigs.write.mode("overwrite").parquet(
            os.path.join(index_dir, f"epoch={epoch_id}")
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", os.path.join(out_dir, "_dedup_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
