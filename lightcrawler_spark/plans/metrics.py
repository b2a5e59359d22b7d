"""Crawl status aggregation + process report (SURVEY.md §2.6 A1–A5).

Reference: counters accumulated under a semaphore
(/root/reference/vendor/PHPCrawl_083/libs/ProcessCommunication/PHPCrawlerStatusHandler.class.php:94-122)
and derived report fields
(vendor/PHPCrawl_083/libs/PHPCrawler.class.php:1001-1046). The Spark
rebuild is a plain aggregation over the trace/pages tables — persisted
per-round so the metrics table carries lineage (north_rule)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["round_metrics", "process_report", "micro_time_ms"]


def micro_time_ms(fixed_ms: int | None = None):
    """C12: millisecond epoch (the reference's bcadd-based microTime,
    UrlCache/PHPCrawlerMySqlUrlCache.class.php:198-201 — used for
    ctime/mtime columns). The determinism contract keeps wall-clock OUT
    of logic paths: tests/goldens pass `fixed_ms`; only production
    lineage stamps use the live expression."""
    if fixed_ms is not None:
        return F.lit(int(fixed_ms)).cast("long")
    return F.unix_millis(F.current_timestamp())


def round_metrics(trace: DataFrame) -> DataFrame:
    """A1: per-round counters — links followed, documents received,
    bytes, latency sums."""
    return trace.groupBy("round").agg(
        F.count("*").alias("links_followed"),
        F.count(F.when(F.col("status").between(200, 299), 1)).alias(
            "documents_received"
        ),
        F.sum("bytes_received").alias("bytes_received"),
        F.sum("latency_ms").alias("sum_latency_ms"),
        F.avg("latency_ms").alias("avg_latency_ms"),
        F.min("seq").alias("first_seq"),
        F.max("seq").alias("last_seq"),
    )


def process_report(trace: DataFrame, runtime_s: float | None = None) -> dict:
    """A2: whole-run report. data_throughput = bytes/runtime (the
    reference's headline metric, PHPCrawler.class.php:1014-1015).

    A3/A4 via the per-request ``benchmarks`` named-timer map: average
    server response time (PHPCrawler.class.php:1037-1039) and the data
    transfer rate computed against transfer time ONLY — the analog of
    excluding socket-prefill bytes (:1041-1043,
    PHPCrawlerHTTPRequest.class.php:517-539)."""
    aggs = [
        F.count("*").alias("links_followed"),
        F.count(F.when(F.col("status").between(200, 299), 1)).alias(
            "documents_received"
        ),
        F.sum("bytes_received").alias("bytes_received"),
        F.sum("latency_ms").alias("sum_latency_ms"),
        F.avg("latency_ms").alias("avg_latency_ms"),
    ]
    has_bench = "benchmarks" in trace.columns
    if has_bench:
        resp = F.element_at(F.col("benchmarks"), F.lit("server_response_ms"))
        xfer = F.element_at(F.col("benchmarks"), F.lit("data_transfer_ms"))
        aggs += [
            F.avg(resp).alias("avg_server_response_ms"),
            F.sum(xfer).alias("sum_data_transfer_ms"),
        ]
    row = trace.agg(*aggs).collect()[0]
    report = {k: row[k] for k in row.asDict()}
    if has_bench and (row["sum_data_transfer_ms"] or 0) > 0:
        report["data_transfer_rate_bps"] = (
            (row["bytes_received"] or 0) / (row["sum_data_transfer_ms"] / 1000.0)
        )
    if runtime_s and runtime_s > 0:
        report["process_runtime_s"] = runtime_s
        report["data_throughput_bps"] = (row["bytes_received"] or 0) / runtime_s
        report["pages_per_s"] = row["links_followed"] / runtime_s
    return report
