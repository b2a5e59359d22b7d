"""Offline replay of stored raw-page snapshots (the reference's
"once task" workflow: worker/SpiderGovCnZhengceOnceTask.class.php).

The reference persists fetched pages to flat files and re-processes them
later WITHOUT refetching — `run($files)` loads each snapshot with
`loadLocalFiles` (:52-93) and pushes it straight into the detail-page
handler (:98-139). At 100 TB this is the workhorse pattern: extraction
logic changes far more often than the crawl reruns, so "replay stored
bodies through the new extraction" must be a first-class distributed
job, not a driver loop over files.

Snapshot format (loadLocalFiles, :66-93):
  line 1        the page URL (trimmed)
  line 2        fetch metadata — read and DISCARDED (one fgets, :77)
  line 3..EOF   the raw body, lines concatenated verbatim

Faithful quirks, both unit-pinned:
  * `while ($buf = fgets($f))` stops at the first falsy read, so a FINAL
    line that is exactly "0" with no trailing newline is silently
    dropped from the body (PHP string falsiness; mid-file "0" lines keep
    their "\n" and stay truthy, so only the tail is affected).
  * handleDetailPage (:102-120) normalizes chr(13) and the five literal
    break spellings '<BR>', '<br />', '<br>', '<BR />', '<br/>' to
    "\n" — '<BR/>' is NOT in the reference's pattern list and survives;
    we reproduce that hole rather than "fixing" it.

Spark rebuild: everything here is a JVM column expression (split /
slice / array_join / regexp_replace) — replay of 10^9 stored pages is
one narrow scan-local map, no shuffle, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "raw_snapshot_expr",
    "parse_raw_snapshot",
    "normalize_breaks",
    "replay_snapshots",
]

# order matters inside the alternation: the two-token spellings must win
# over their '<br>'/'<BR>' prefixes (regex alternation is leftmost-
# longest-listed-first at each position). '<BR/>' deliberately absent.
_BREAK_RE = r"\r|<BR />|<BR>|<br />|<br/>|<br>"


def raw_snapshot_expr(url_col: Column, meta_col: Column,
                      body_col: Column) -> Column:
    """Serialize a fetched page to the once-task snapshot layout —
    the write side of the replay contract (url line, one metadata line,
    then the body verbatim)."""
    return F.concat(url_col, F.lit("\n"), meta_col, F.lit("\n"), body_col)


def parse_raw_snapshot(snapshot_col: Column) -> Column:
    """loadLocalFiles as one expression: struct(url, source).

    url = trim(line 1); line 2 discarded; source = remaining lines
    rejoined, minus a trailing bare "0" line (the fgets loop-stop
    quirk documented in the module docstring)."""
    lines = F.split(snapshot_col, "\n")
    n = F.size(lines)
    body = F.slice(lines, F.lit(3), F.greatest(n - 2, F.lit(0)))
    body = F.when(
        (F.size(body) > 0) & (F.element_at(body, -1) == "0"),
        F.slice(body, F.lit(1), F.size(body) - 1),
    ).otherwise(body)
    return F.struct(
        F.trim(F.element_at(lines, 1)).alias("url"),
        F.array_join(body, "\n").alias("source"),
    )


def normalize_breaks(source_col: Column) -> Column:
    """handleDetailPage's str_replace pass: CR and the five listed <br>
    spellings become newlines ('<BR/>' intentionally survives)."""
    return F.regexp_replace(source_col, _BREAK_RE, "\n")


def replay_snapshots(df: DataFrame, snapshot_col: str = "snapshot") -> DataFrame:
    """Snapshot blobs → (url, source) rows ready for the extraction
    chain (E7-E14 in operators/content.py) — the distributed equivalent
    of `run($files)`: parse, break-normalize, hand to the handler."""
    parsed = df.withColumn("_p", parse_raw_snapshot(F.col(snapshot_col)))
    return (
        parsed.withColumn("url", F.col("_p.url"))
        .withColumn("source", normalize_breaks(F.col("_p.source")))
        .drop("_p", snapshot_col)
    )
