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

__all__ = [
    "chunk_documents",
    "pack_sequences",
    "assign_shards",
    "generate_aspect_buckets",
    "assign_aspect_buckets",
    "shard_manifest",
    "contrastive_batches",
    "sequence_spans",
    "epoch_shard_order",
    "manifest_diff",
]


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


def generate_aspect_buckets(
    target_area: int = 1024,
    step: int = 8,
    min_dim: int = 16,
    max_dim: int = 64,
    max_aspect: float = 4.0,
) -> list[tuple[int, int]]:
    """Deterministic aspect-bucket table, the NovelAI/SDXL recipe scaled
    by ``step``: for every height on the ``step`` grid, the width on the
    grid whose area is closest to ``target_area`` (and vice versa),
    aspect clamped to [1/max_aspect, max_aspect], deduplicated, sorted
    by (w/h ascending, w) so bucket_id order is aspect order.

    Production values are step=64, target_area=1024², dims ≤ 2048 (the
    published SDXL bucketing); the defaults here are the same algorithm
    on the step=8 grid so unit fixtures (24–56 px sides) spread over
    ~10 buckets. Pure driver-side arithmetic over a few dozen ints —
    the table is a broadcast literal, never a shuffle."""
    cand: set[tuple[int, int]] = set()
    for h in range(min_dim, max_dim + 1, step):
        w = max(min_dim, min(max_dim, round(target_area / h / step) * step))
        for a, b in ((w, h), (h, w)):
            if 1.0 / max_aspect <= a / b <= max_aspect:
                cand.add((a, b))
    return sorted(cand, key=lambda wh: (wh[0] / wh[1], wh[0]))


def assign_aspect_buckets(
    df: DataFrame,
    batch_size: int,
    buckets: list[tuple[int, int]] | None = None,
    w_col: str = "w",
    h_col: str = "h",
    order_col: str = "image_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Aspect-ratio bucketed batch assignment — the image-model analog
    of ``pack_sequences``: diffusion/vision training wants every batch
    drawn from ONE target resolution (no destructive square crops), so
    each image joins the bucket with the nearest aspect ratio and
    batches are cut within buckets.

    Bucket choice is INTEGER-exact: argmin over |w·bh − h·bw| (the
    cross-multiplied aspect distance — no float log whose ULP could
    flip a near-tie differently in another engine), ties to the lower
    bucket_id. Computed as a sorted array-of-structs literal per row —
    pure JVM expression, zero joins for the assignment itself.

    In-bucket order and batching use a GROUPED distributed prefix sum:
    range-repartition on (bucket_id, order_col), cumulative count per
    (partition, bucket), and a driver-side prefix over the P×|buckets|
    per-partition-per-bucket totals broadcast back. A plain
    ``Window.partitionBy(bucket_id)`` would funnel each bucket — and a
    popular aspect IS a mega-bucket at corpus scale — through one task;
    here a bucket spans as many range partitions as its row share
    (same scale argument as pack_sequences, asserted
    partitioning-invariant by tests).

    Adds: ``bucket_id``, ``bucket_w``, ``bucket_h``, ``rank_in_bucket``
    (0-based, ``order_col`` order), ``batch_idx`` (global, 0-based,
    dense across buckets in bucket_id order), ``batch_is_ragged``
    (batch is the bucket's short tail, < batch_size rows — the rows a
    drop-last loader would skip). ``order_col`` must be unique."""
    spark = df.sparkSession
    if buckets is None:
        buckets = generate_aspect_buckets()
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 2)

    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    cand = F.array(*[
        F.struct(
            F.abs(w * F.lit(int(bh)) - h * F.lit(int(bw))).alias("dist"),
            F.lit(i).alias("bucket_id"),
            F.lit(int(bw)).alias("bucket_w"),
            F.lit(int(bh)).alias("bucket_h"),
        )
        for i, (bw, bh) in enumerate(buckets)
    ])
    best = F.array_sort(cand).getItem(0)
    tagged = df.select(
        "*",
        best["bucket_id"].alias("bucket_id"),
        best["bucket_w"].alias("bucket_w"),
        best["bucket_h"].alias("bucket_h"),
    )

    ranged = tagged.repartitionByRange(
        num_partitions, F.col("bucket_id"), F.col(order_col)
    ).withColumn("_pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=False)  # pin layout across actions

    cw = (
        Window.partitionBy("_pid", "bucket_id")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ranged.withColumn("_cum", F.count(F.lit(1)).over(cw))

    totals = (
        ranged.groupBy("_pid", "bucket_id").count().collect()
    )  # ≤ P × |buckets| rows — driver-side grouped prefix
    per_bucket: dict[int, int] = {}
    prefix_rows = []
    for r in sorted(totals, key=lambda r: (r["bucket_id"], r["_pid"])):
        off = per_bucket.get(r["bucket_id"], 0)
        prefix_rows.append((r["_pid"], r["bucket_id"], off))
        per_bucket[r["bucket_id"]] = off + r["count"]
    # dense global batch numbering: buckets stacked in bucket_id order
    batch_base: dict[int, int] = {}
    acc = 0
    for bid in sorted(per_bucket):
        batch_base[bid] = acc
        acc += -(-per_bucket[bid] // batch_size)  # ceil-div batches
    offsets = spark.createDataFrame(
        [
            (pid, bid, off, batch_base[bid], per_bucket[bid])
            for pid, bid, off in prefix_rows
        ],
        "_pid int, bucket_id int, _offset long, _bbase long, _btotal long",
    )

    rank = F.col("_offset") + F.col("_cum") - F.lit(1)
    return (
        cum.join(F.broadcast(offsets), ["_pid", "bucket_id"])
        .withColumn("rank_in_bucket", rank)
        .withColumn(
            "batch_idx",
            F.col("_bbase") + F.floor(rank / F.lit(batch_size)),
        )
        .withColumn(
            "batch_is_ragged",
            (F.col("_btotal") - F.floor(rank / F.lit(batch_size))
             * F.lit(batch_size)) < F.lit(batch_size),
        )
        .drop("_pid", "_cum", "_offset", "_bbase", "_btotal")
    )


def contrastive_batches(
    df: DataFrame,
    batch_size: int,
    cluster_col: str = "cluster_id",
    id_col: str = "image_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dedup-cluster-aware training-batch assignment: no two members of
    the same near-duplicate cluster ever share a batch.

    Contrastive training (CLIP-style, every other in-batch sample is a
    negative) is silently poisoned by surviving near-duplicates — a dup
    pair landing in one batch is a FALSE NEGATIVE that pushes matching
    embeddings apart. Standard practice after web-scale dedup keeps the
    cluster structure around exactly for this; this operator turns a
    cluster assignment (e.g. ``graph.dedup_cluster_assignments`` output)
    into a conflict-free batch layout.

    Construction (exact, no randomness):
      * rows with NULL ``cluster_col`` are singletons (their own
        cluster, keyed by id);
      * ``n_batches = max(ceil(N / batch_size), max_cluster_size)`` —
        always feasible, growing the batch count (shrinking batches)
        only when a mega-cluster forces it;
      * rows are laid out in ``(cluster_size DESC, cluster_key ASC,
        id ASC)`` order, giving each a global 0-based rank ``g``; the
        batch is ``g % n_batches``.
    Same-cluster rows are CONTIGUOUS in that order (they share size and
    key), so their ranks are consecutive and their batches distinct
    whenever ``cluster_size <= n_batches`` — which the ``n_batches``
    choice guarantees. Every batch gets ``floor`` or ``ceil`` of
    ``N / n_batches`` rows, which is ``<= batch_size`` by construction.

    Scale shape: one hash-groupBy for cluster sizes, one
    AQE-splittable equi-join back, then the module's distributed
    prefix sum (range repartition on the layout key, per-partition
    cumulative counts, O(P) driver prefix broadcast back) — a plain
    ``Window.orderBy`` global rank would funnel the corpus through one
    task. Driver state: P partition totals plus two scalars (N,
    max cluster size). Result is independent of physical partitioning
    (asserted by tests).

    Adds ``cluster_key`` (string; ``c:<cluster>`` or singleton
    ``s:<id>``), ``cluster_size``, ``layout_rank`` (the global ``g``),
    ``batch_idx``. ``id_col`` must be unique.
    """
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 2)

    ckey = F.when(
        F.col(cluster_col).isNotNull(),
        F.concat(F.lit("c:"), F.col(cluster_col).cast("string")),
    ).otherwise(F.concat(F.lit("s:"), F.col(id_col).cast("string")))
    keyed = df.withColumn("cluster_key", ckey)

    # singletons (NULL cluster) have size 1 BY CONSTRUCTION — routing
    # them around the size aggregate+join keeps the shuffle proportional
    # to the clustered minority, not the corpus (post-dedup corpora are
    # mostly singletons; measured ~1.9x best-of-2 on the bench leg's
    # 80%-singleton shape, identical layout checksum)
    clustered = keyed.filter(F.col(cluster_col).isNotNull())
    singles = keyed.filter(F.col(cluster_col).isNull()).withColumn(
        "cluster_size", F.lit(1).cast("long")
    )
    sizes = clustered.groupBy("cluster_key").agg(
        F.count("*").alias("cluster_size")
    )
    sized = (
        clustered.join(sizes, "cluster_key")
        .select(*singles.columns)
        .unionByName(singles)
        .withColumn("_negsz", -F.col("cluster_size"))
    )

    ranged = sized.repartitionByRange(
        num_partitions, F.col("_negsz"), F.col("cluster_key"), F.col(id_col)
    ).withColumn("_pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=False)  # pin layout across actions

    w = (
        Window.partitionBy("_pid")
        .orderBy("_negsz", "cluster_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = ranged.withColumn("_cum", F.count(F.lit(1)).over(w))

    # ONE totals job yields both the prefix counts AND the max cluster
    # size (max of per-partition maxes) — a separate sizes.agg(max)
    # action would re-run the size aggregate end to end
    totals = ranged.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("n"), F.max("cluster_size").alias("mx")
    ).collect()  # P rows
    by_pid = {r["_pid"]: r["n"] for r in totals}
    prefix, acc = {}, 0
    for pid in sorted(by_pid):
        prefix[pid] = acc
        acc += by_pid[pid]
    n_rows = acc
    max_cluster = max((r["mx"] or 0 for r in totals), default=0)
    n_batches = max(
        -(-n_rows // batch_size) if n_rows else 1, max_cluster, 1
    )
    offsets = spark.createDataFrame(
        [(pid, off) for pid, off in prefix.items()], "_pid int, _offset long"
    )

    g = F.col("_offset") + F.col("_cum") - F.lit(1)
    return (
        cum.join(F.broadcast(offsets), "_pid")
        .withColumn("layout_rank", g)
        .withColumn("batch_idx", g % F.lit(int(n_batches)))
        .drop("_pid", "_cum", "_offset", "_negsz")
    )


def shard_manifest(
    df: DataFrame,
    shard_col: str = "shard_idx",
    key_col: str = "image_id",
    offset_col: str = "offset_in_shard",
    size_col: str = "n_bytes",
) -> DataFrame:
    """Integrity manifest for WebDataset-style shards — one row per
    shard with sample count, payload bytes, the key range, and a
    deterministic content signature (md5 over the layout-ordered
    ``key:size`` list). The manifest is what a training job checks
    before mounting a shard and what an incremental writer diffs to
    skip unchanged shards; consumes ``assign_shards`` output.

    Scale shape: one hash aggregate on the shard id. Per-shard state is
    BOUNDED BY CONSTRUCTION — a shard holds at most
    ``shard_bytes / min_sample_bytes`` samples (it is one tar file), so
    the sort+concat signature fold is O(shard), never O(corpus), and
    map-side combine keeps the shuffle at one row per shard per task.
    No window, no skew hazard (shard ids are sequential and uniform by
    construction of the byte binning).
    """
    item = F.struct(
        F.col(offset_col).alias("off"),
        F.concat_ws(
            ":", F.col(key_col).cast("string"),
            F.col(size_col).cast("string"),
        ).alias("kv"),
    )
    return (
        df.groupBy(F.col(shard_col))
        .agg(
            F.count("*").alias("n_samples"),
            F.sum(F.col(size_col)).cast("long").alias("total_bytes"),
            F.min(F.col(key_col)).alias("first_key"),
            F.max(F.col(key_col)).alias("last_key"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(item)),
                        lambda s: s["kv"],
                    ),
                )
            ).alias("content_md5"),
        )
        .withColumnRenamed(shard_col, "shard_idx")
    )


def sequence_spans(
    df: DataFrame,
    ctx_len: int,
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-sequence document span map — what a block-diagonal attention
    mask (the "attention separator" of packed pretraining: tokens never
    attend across document boundaries) and a sample-provenance index
    both need: for every training sequence, which documents occupy it
    and at which token offsets.

    Built on ``pack_sequences``'s distributed prefix sum, then one
    row-local explode over the sequences a document COVERS
    (``seq_idx .. floor((start+n-1)/ctx_len)`` — a long document spans
    many sequences, a short one exactly one; empty documents emit no
    span). Emits ``(seq_idx, doc_id, begin, end, doc_span_idx)`` with
    ``[begin, end)`` token offsets inside the sequence and
    ``doc_span_idx`` = which piece of the document this is (0-based).

    Scale shape: the fan-out is ceil(n_tokens/ctx_len) rows per doc —
    proportional to corpus tokens / ctx_len; everything after the
    prefix sum is codegen'd projection + explode, no extra shuffle.
    A sequence holds at most ctx_len spans (every doc contributes >= 1
    token), so per-sequence downstream state is bounded.
    """
    packed = pack_sequences(
        df, ctx_len=ctx_len, order_col=order_col, tokens_col=tokens_col,
        num_partitions=num_partitions,
    )
    n = F.col(tokens_col).cast("long")
    start = F.col("start_offset")
    last_seq = F.floor((start + n - F.lit(1)) / F.lit(ctx_len))
    out = packed.filter(n > 0).select(
        F.col(order_col),
        n.alias("_n"),
        start.alias("_start"),
        F.explode(
            F.sequence(F.col("seq_idx"), last_seq)
        ).alias("seq_idx"),
    )
    seq_base = F.col("seq_idx") * F.lit(ctx_len)
    begin = F.greatest(F.lit(0).cast("long"), F.col("_start") - seq_base)
    end = F.least(
        F.lit(ctx_len).cast("long"),
        F.col("_start") + F.col("_n") - seq_base,
    )
    return out.select(
        "seq_idx",
        order_col,
        begin.alias("begin"),
        end.alias("end"),
        (F.col("seq_idx") - F.floor(F.col("_start") / F.lit(ctx_len)))
        .cast("long").alias("doc_span_idx"),
    )


def epoch_shard_order(
    df: DataFrame,
    epoch: int,
    shard_col: str = "shard_idx",
    key_col: str = "image_id",
    salt: str = "order",
) -> DataFrame:
    """Deterministic per-epoch training order, the WebDataset two-level
    shuffle: each epoch visits SHARDS in a fresh pseudo-random order
    and samples WITHIN each shard in a fresh pseudo-random order — the
    I/O-friendly shuffle (sequential shard reads, no global permute)
    that still decorrelates batches across epochs. Order is pure
    md5(key‖epoch‖salt) rank: reproducible on resume, no RNG state.

    Adds ``shard_order`` (0-based dense rank of the shard this epoch)
    and ``sample_order`` (0-based rank within the shard); a loader
    sorts by (shard_order, sample_order).

    Scale shape: the within-shard window partitions by shard — bounded
    by the shard byte cap (a shard is one tar). The shard rank runs
    over the DISTINCT shard list only (corpus/shard_bytes rows —
    ~10^5 at 100 TB) via the two-stage range-partitioned rank
    (pack_sequences' prefix-sum idiom: per-partition row_number +
    driver prefix of O(P) partition counts) — even a bounded dim never
    plans a single-partition WindowExec — then broadcasts back.
    """
    e = str(int(epoch))
    spark = df.sparkSession
    distinct_shards = (
        df.select(F.col(shard_col).alias("_shard")).distinct()
        .withColumn(
            "_sh",
            F.md5(F.concat(F.col("_shard").cast("string"),
                           F.lit(f":{e}:{salt}"))),
        )
    )
    n_part = max(2, min(spark.sparkContext.defaultParallelism, 32))
    ranged = distinct_shards.repartitionByRange(
        n_part, F.col("_sh"), F.col("_shard")
    ).withColumn("_pid", F.spark_partition_id())
    # two actions below (counts collect + downstream join) must see the
    # same partition layout -> pin it
    ranged = ranged.localCheckpoint(eager=False)
    totals = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    by_pid = {r["_pid"]: r["_n"] for r in totals}
    prefix, acc = {}, 0
    for pid in sorted(by_pid):
        prefix[pid] = acc
        acc += by_pid[pid]
    offsets = spark.createDataFrame(
        [(pid, off) for pid, off in prefix.items()], "_pid int, _off long"
    )
    w_shard = Window.partitionBy("_pid").orderBy(F.col("_sh"), F.col("_shard"))
    shards = (
        ranged.withColumn("_rn", F.row_number().over(w_shard).cast("long"))
        .join(F.broadcast(offsets), "_pid")
        .withColumn("shard_order", F.col("_off") + F.col("_rn") - 1)
        .drop("_pid", "_rn", "_off", "_sh")
    )
    w = Window.partitionBy(shard_col).orderBy(
        F.md5(F.concat(F.col(key_col).cast("string"),
                       F.lit(f":{e}:{salt}"))),
        F.col(key_col),
    )
    return (
        df.withColumn("sample_order",
                      F.row_number().over(w).cast("long") - 1)
        .join(
            F.broadcast(shards),
            F.col(shard_col) == F.col("_shard"),
        )
        .drop("_shard")
        .withColumn("epoch", F.lit(int(epoch)))
    )


def manifest_diff(old: DataFrame, new: DataFrame,
                  shard_col: str = "shard_idx") -> DataFrame:
    """Incremental-writer plan from two shard manifests
    (``shard_manifest`` outputs): which shards are ADDED, REMOVED,
    CHANGED (same id, different content signature) or UNCHANGED — the
    diff that lets a 100 TB corpus rebuild rewrite only the shards
    whose membership actually moved, exactly how the manifest's
    content_md5 was designed to be consumed.

    One full-outer equi-join on the shard id (manifest rows are one
    per shard — ~10^5 at 100 TB, trivially shuffle-able; AQE can
    broadcast either side). Output: (shard_idx, status, old_md5,
    new_md5, old_samples, new_samples).
    """
    o = old.select(
        F.col(shard_col).alias("shard_idx"),
        F.col("content_md5").alias("old_md5"),
        F.col("n_samples").alias("old_samples"),
    )
    n = new.select(
        F.col(shard_col).alias("shard_idx"),
        F.col("content_md5").alias("new_md5"),
        F.col("n_samples").alias("new_samples"),
    )
    joined = o.join(n, "shard_idx", "full_outer")
    status = (
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        "shard_idx", status.alias("status"),
        "old_md5", "new_md5", "old_samples", "new_samples",
    )
