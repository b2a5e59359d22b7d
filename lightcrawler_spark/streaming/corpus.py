"""Streaming multimodal corpus gate — the always-on form of the batch
image+caption quality filter (operators/images.py:
filter_image_caption_pairs), for pipelines that gate samples as they
arrive from the crawl instead of in nightly batches.

Same split as streaming/ingest.py vs the BSP engine: the per-row
(stateless) LAION gates are the IDENTICAL whole-stage-codegen expression
the batch filter uses (`image_caption_reject_expr` — one implementation,
two execution modes); only the stateful half changes shape. Batch ranks
duplicates with a phash window (retroactive first-wins by id); a stream
cannot rank retroactively, so dedup becomes
``dropDuplicatesWithinWatermark`` on phash — first ARRIVAL wins and the
state store is evicted at the watermark horizon (bounded state on an
always-on stream; plain dropDuplicates would grow forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.images import image_caption_reject_expr

__all__ = ["gate_image_caption_stream", "start_corpus_sink"]


def gate_image_caption_stream(
    pairs: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "event_ts",
    **gate_kwargs,
) -> DataFrame:
    """pairs: streaming DF with the input_hint columns
    (image_id, bytes, w, h, fmt, caption, phash) + an event-time column.

    Returns the kept stream: scalar-gate survivors, phash-deduped within
    the watermark horizon. Rejected rows are dropped (a streaming sink
    for reject auditing can tap ``reject_reason`` before the filter by
    reusing `image_caption_reject_expr` — same expression, same rules).
    """
    reason = image_caption_reject_expr(**gate_kwargs)
    kept = pairs.withColumn("reject_reason", reason).filter(
        F.col("reject_reason").isNull()
    ).drop("reject_reason")
    return kept.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["phash"]
    )


def start_corpus_sink(kept: DataFrame, out_dir: str, checkpoint_dir: str):
    """Append sink with checkpointed exactly-once progress; availableNow
    so tests and backfills drain the source and stop."""
    return (
        kept.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
