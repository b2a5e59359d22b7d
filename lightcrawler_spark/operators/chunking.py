"""Document chunking and sequence packing — the last mile of a training
corpus: long documents become overlapping context-window chunks, and the
token stream is packed into fixed-length training sequences.

No reference analog (the PHP crawler stops at extracted documents); these
follow the standard GPT-style recipe: whitespace pre-tokenization (same
convention as operators/text.py:with_token_counts), sliding-window
chunking, then concat-and-split packing where a document may span a
sequence boundary.

Scale notes:
- ``chunk_documents`` is a pure per-row JVM expression tree
  (split → sequence → posexplode → slice) — zero shuffle, codegen'd,
  and pushdown-safe (whole-array ops only; no per-element lambda
  captures an outer array — see the Gopher-stats lesson in BENCH.md).
- ``pack_sequences`` needs a GLOBAL running token offset; a naive
  ``Window.orderBy(order_col)`` funnels the corpus through one
  partition (the exact `WindowExec: No Partition Defined` scale-killer
  the round-2 audit hunted). Instead: range-repartition on the order
  key, per-partition cumulative sums, and a driver-side prefix of the
  tiny per-partition totals (num_partitions rows) broadcast back — the
  textbook distributed prefix-sum, O(rows/partition) memory per task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["chunk_documents", "pack_sequences", "assign_shards"]


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunks over the whitespace-token stream.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + max_tokens)`` with
    ``stride = max_tokens - overlap``; every document yields at least one
    chunk (possibly empty for an empty doc). Emits
    ``(id_col, chunk_idx, n_chunk_tokens, chunk_text)``.
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be < max_tokens")
    stride = max_tokens - overlap
    c = F.col(text_col)
    toks = F.filter(F.split(F.trim(c), r"\s+"), lambda x: F.length(x) > 0)
    n = F.size(toks)
    # ceil((n - overlap) / stride) in exact integer arithmetic, min 1
    n_chunks = F.greatest(
        F.lit(1), F.floor((n - F.lit(overlap) + F.lit(stride - 1)) / F.lit(stride))
    ).cast("int")
    with_chunks = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_idx"),
    )
    sl = F.slice(
        F.col("_toks"), F.col("chunk_idx") * stride + F.lit(1), max_tokens
    )
    return with_chunks.select(
        id_col,
        "chunk_idx",
        F.size(sl).alias("n_chunk_tokens"),
        F.array_join(sl, " ").alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    ctx_len: int,
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-split packing: documents are laid out in ``order_col``
    order as one token stream and cut every ``ctx_len`` tokens.

    Adds ``start_offset`` (global token offset of the doc), ``seq_idx``
    (training sequence containing the doc's first token),
    ``offset_in_seq``, and ``spans_boundary`` (doc crosses into the next
    sequence). ``order_col`` must be unique; the result is independent of
    the physical partitioning (asserted by tests across partition
    counts).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 2)
    ranged = df.repartitionByRange(num_partitions, F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # rows stay usable after the two actions below only if the partition
    # layout is stable -> pin it
    ranged = ranged.localCheckpoint(eager=False)

    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ranged.withColumn("_cum", F.sum(tokens_col).over(w))

    totals = (
        ranged.groupBy("_pid")
        .agg(F.sum(tokens_col).alias("_total"))
        .collect()
    )  # num_partitions rows — driver-side prefix of partition totals
    by_pid = {r["_pid"]: r["_total"] or 0 for r in totals}
    prefix, acc = {}, 0
    for pid in sorted(by_pid):
        prefix[pid] = acc
        acc += by_pid[pid]
    offsets = spark.createDataFrame(
        [(pid, off) for pid, off in prefix.items()], "_pid int, _offset long"
    )

    n = F.col(tokens_col).cast("long")
    start = F.col("_offset") + F.col("_cum") - n
    seq_idx = F.floor(start / ctx_len)
    return (
        cum.join(F.broadcast(offsets), "_pid")
        .withColumn("start_offset", start)
        .withColumn("seq_idx", seq_idx)
        .withColumn("offset_in_seq", start % ctx_len)
        .withColumn(
            "spans_boundary",
            (n > 0) & (F.floor((start + n - F.lit(1)) / ctx_len) > seq_idx),
        )
        .drop("_pid", "_cum", "_offset")
    )


def assign_shards(
    df: DataFrame,
    shard_bytes: int,
    order_col: str = "image_id",
    size_col: str = "n_bytes",
    num_partitions: int | None = None,
) -> DataFrame:
    """WebDataset-style shard assignment for multimodal samples: lay the
    samples out in ``order_col`` order and bin by byte offset —
    ``shard_idx = floor(start_byte / shard_bytes)``.

    Samples are never split (a tar member is atomic): a sample whose
    span crosses the bin boundary stays in the shard of its first byte,
    so a shard overflows by at most one sample (``overflows_shard``
    marks them). Same distributed prefix sum as ``pack_sequences`` —
    nothing centralizes beyond the P partition totals."""
    out = pack_sequences(
        df, ctx_len=shard_bytes, order_col=order_col,
        tokens_col=size_col, num_partitions=num_partitions,
    )
    return out.select(
        *df.columns,
        F.col("start_offset").alias("byte_offset"),
        F.col("seq_idx").alias("shard_idx"),
        F.col("offset_in_seq").alias("offset_in_shard"),
        F.col("spans_boundary").alias("overflows_shard"),
    )
