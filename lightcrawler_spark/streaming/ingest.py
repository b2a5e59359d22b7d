"""Structured-Streaming variant of the ingest path (SURVEY.md §1.3:
"Structured Streaming is optional for a continuous-ingest variant").

The BSP engine (plans/crawl.py) is the trace-parity path; this module is
the always-on form of the same operators for continuous link ingest —
the closest analog of the reference's producer/consumer DocumentInfo
queue (/root/reference/vendor/PHPCrawl_083/libs/ProcessCommunication/
PHPCrawlerDocumentInfoQueue.class.php:58-100), re-expressed as:

  readStream(links) → canonicalize/admit (same JVM predicates as batch)
  → watermarked within-stream dedup on url_md5
  → stream-static left_anti against the persisted seen set
  → append sink (frontier dir) with checkpointed exactly-once progress

and a windowed metrics stream (A1/A2 analog): tumbling-window counts and
byte sums per host with late-data tolerance via watermark.

Scale notes: the stream-static anti-join broadcasts nothing — Spark
re-plans the static side per micro-batch, so the seen set can be a big
bucketed table. Within-stream dedup uses dropDuplicatesWithinWatermark,
the only dedup variant whose state store is actually evicted at the
watermark horizon (plain dropDuplicates(subset) keeps keys forever
unless the event-time column is part of the subset — unbounded state on
an always-on stream). All admission predicates are the same whole-stage-codegen
expressions the batch engine uses (operators/admission.py) — one
implementation, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import CrawlSpec
from ..operators.admission import admission_predicate, host_expr

__all__ = ["admit_link_stream", "windowed_fetch_metrics", "start_frontier_sink"]


def admit_link_stream(links: DataFrame, spec: CrawlSpec, start_url: str,
                      seen: DataFrame | None = None,
                      watermark: str = "10 minutes",
                      ts_col: str = "event_ts") -> DataFrame:
    """links: streaming DF with (url, linktext, linkcode, depth, event_ts).
    Returns the admitted, deduplicated stream of frontier candidates."""
    out = links.filter(admission_predicate(spec, start_url))
    out = out.withColumn("url_md5", F.md5("url")).withColumn(
        "host", host_expr(F.col("url"))
    )
    # within-stream first-wins (P1's in-batch half). Must be the
    # WithinWatermark variant: it is the one that expires url_md5 state
    # once the key's event time falls behind the watermark.
    out = out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["url_md5"]
    )
    if seen is not None:
        # stream-static anti-join (P1's cross-round half)
        out = out.join(seen.select("url_md5"), "url_md5", "left_anti")
    return out


def windowed_fetch_metrics(results: DataFrame,
                           window: str = "1 minute",
                           watermark: str = "5 minutes",
                           ts_col: str = "fetch_ts") -> DataFrame:
    """A1/A2 as a streaming agg: per (window, host) request counts, byte
    sums, mean latency. Append-mode-safe thanks to the watermark."""
    return (
        results.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "host")
        .agg(
            F.count("*").alias("requests"),
            F.sum("bytes_received").alias("bytes_received"),
            F.avg("latency_ms").alias("avg_latency_ms"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host", "requests", "bytes_received", "avg_latency_ms",
        )
    )


def start_frontier_sink(admitted: DataFrame, out_dir: str,
                        checkpoint_dir: str, trigger_available_now: bool = True):
    """Append admitted frontier rows to parquet with a checkpoint — the
    streaming face of RoundStore.write + commit (exactly-once via the
    sink's WAL instead of the round watermark)."""
    w = (
        admitted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
