"""Stateful per-host politeness gate for the streaming ingest path —
the continuous-mode analog of the BSP engine's P8 budget windows
(operators/scheduler.py) and the reference's semaphore-serialized
`delayRequest` (/root/reference/vendor/PHPCrawl_083/libs/
PHPCrawler.class.php:906-925: wait until last_request_time + delay).

Implemented as a CUSTOM STATEFUL OPERATOR with
``applyInPandasWithState``: state per host = the event time of the last
ADMITTED candidate; a candidate passes iff its event time is at least
``crawl_delay`` past the stored one (event-time semantics keep the gate
deterministic and replayable — no wall clock in the logic path, per the
determinism contract). State is dropped after ``state_ttl`` of host
inactivity so an all-of-the-web host dimension cannot grow it without
bound.

Scale notes: state is hash-partitioned by host (the groupBy key), so
the gate shards across the cluster exactly like the batch engine's
per-host windows; each micro-batch ships one Arrow batch per active
host group.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["host_politeness_gate"]

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [T.StructField("last_admitted_ms", T.LongType())]
)


def host_politeness_gate(candidates: DataFrame, crawl_delay_s: float = 5.0,
                         state_ttl_s: float = 3600.0,
                         ts_col: str = "event_ts") -> DataFrame:
    """candidates: streaming DF with (host, url, event_ts). Returns the
    admitted sub-stream: per host, at most one URL per crawl_delay of
    EVENT time, first-come-first-served in event-time order within each
    micro-batch (ties broken by url for determinism)."""
    delay_ms = int(crawl_delay_s * 1000)
    ttl_ms = int(state_ttl_s * 1000)

    def gate(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (host,) = key
        last_ms = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, "url"], kind="mergesort")
        keep, ts_out = [], []
        for url, ts in zip(rows["url"], rows[ts_col]):
            ts_ms = int(ts.value // 1_000_000)  # pandas Timestamp → ms
            if last_ms is None or ts_ms - last_ms >= delay_ms:
                keep.append(url)
                ts_out.append(ts)
                last_ms = ts_ms
        if last_ms is not None:
            state.update((last_ms,))
            state.setTimeoutDuration(ttl_ms)
        if keep:
            yield pd.DataFrame(
                {"host": host, "url": keep, "event_ts": ts_out}
            )

    return (
        candidates.groupBy("host")
        .applyInPandasWithState(
            gate,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
