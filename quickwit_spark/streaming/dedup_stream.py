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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quickwit_spark.operators.dedup import minhash_dedup_incremental


def _empty_index(spark: SparkSession, id_col: str) -> DataFrame:
    return spark.createDataFrame(
        [], f"{id_col} long, signature array<bigint>"
    )


def read_sig_index(
    spark: SparkSession,
    index_dir: str,
    id_col: str = "doc_id",
    before_epoch: int | None = None,
) -> DataFrame:
    """The accumulated signature index, optionally pruned to epochs before
    ``before_epoch`` (file-level partition pruning on the epoch= layout)."""
    if not os.path.isdir(index_dir) or not any(
        e.startswith("epoch=") for e in os.listdir(index_dir)
    ):
        return _empty_index(spark, id_col)
    df = spark.read.parquet(index_dir)
    if before_epoch is not None:
        df = df.filter(F.col("epoch") < before_epoch)
    return df.select(id_col, "signature")


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
    """The accumulated embedding index (same epoch layout/pruning rules as
    :func:`read_sig_index`)."""
    if not os.path.isdir(index_dir) or not any(
        e.startswith("epoch=") for e in os.listdir(index_dir)
    ):
        return spark.createDataFrame(
            [], f"{id_col} long, {vec_col} array<double>"
        )
    df = spark.read.parquet(index_dir)
    if before_epoch is not None:
        df = df.filter(F.col("epoch") < before_epoch)
    return df.select(id_col, vec_col)


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
