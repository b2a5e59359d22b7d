"""Priority + politeness scheduling (SURVEY.md §2.5 P2, P3, P8).

The reference pops ONE url at a time: global ``max(priority_level)`` then
FIFO by autoincrement id, under an exclusive DB lock
(/root/reference/vendor/PHPCrawl_083/libs/UrlCache/PHPCrawlerSQLiteURLCache.class.php:54-84,
PHPCrawlerMySqlUrlCache.class.php:119-178), and sleeps so that at most
one request per `crawl_delay` crosses the wire across ALL processes
(PHPCrawler.class.php:906-925).

The Spark rebuild replaces the lock with a deterministic ordering
contract — pop order = (priority_level DESC, insert_seq ASC) — and the
sleep with a *budget*: each BSP round claims the top-B pending rows,
where B = floor(round_duration / delay). With the reference's default
(one request per window) B == 1 and the orders coincide exactly; at
scale, per-host budgets turn the same window rank into a polite parallel
scheduler with no shared mutable state.

Scale notes (the part that must survive 1000 executors):
- the global pop uses a two-stage rank: per-partition top-B first
  (cheap, narrow), then a final top-B over ≤ B×P survivors — never a
  single-partition sort of the whole frontier.
- per-host pops are a plain window over host; skewed hosts are defused
  by `salted_repartition` BEFORE the fetch stage (the window itself is
  per-host and cannot be salted without breaking the budget).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import CrawlSpec, php_regex_to_std

__all__ = [
    "assign_priority",
    "pop_global",
    "pop_per_host",
    "interleave_rank",
    "salted_repartition",
    "recrawl_schedule",
    "priority_from_pagerank",
    "backoff_blocked_hosts",
    "politeness_audit",
]

def pop_order():
    """The deterministic ordering contract (P3): priority DESC, then
    frontier insertion order ASC. Lazily built — PySpark 4 requires an
    active session to create Column objects."""
    return [F.col("priority_level").desc(), F.col("insert_seq").asc()]


def assign_priority(df: DataFrame, rules: list[tuple[str, int]],
                    url_col: str = "url") -> DataFrame:
    """P2: first matching rule (checked in level-DESC order) wins, else 0
    (UrlCache/PHPCrawlerURLCacheBase.class.php:98-138). One codegen'd
    CASE WHEN chain — no UDF, no shuffle."""
    ordered = sorted(rules, key=lambda r: -r[1])
    expr = F.lit(0)
    for pat, level in reversed(ordered):
        expr = F.when(F.col(url_col).rlike(php_regex_to_std(pat)), F.lit(level)).otherwise(expr)
    return df.withColumn("priority_level", expr.cast("int"))


def pop_global(frontier: DataFrame, budget: int) -> DataFrame:
    """P3: claim the global top-`budget` pending rows by
    (priority DESC, insert_seq ASC).

    ``orderBy().limit(B)`` compiles to TakeOrderedAndProject: each
    partition keeps its local top-B heap, the driver merges — no global
    sort, no full shuffle, exactly the scalable top-k physical op.
    The rank window afterwards only sees the B claimed rows."""
    claimed = frontier.orderBy(*pop_order()).limit(budget)
    # ≤ B rows survive the limit: numbering them in one partition is fine
    # by design. The constant (but non-foldable — a lit() would be
    # optimized away) partition key keeps WindowExec's "No Partition
    # Defined" warning, which flags windows over UNBOUNDED input, out of
    # the engine's logs.
    w = Window.partitionBy(
        F.pmod(F.col("insert_seq"), F.lit(1))
    ).orderBy(*pop_order())
    return claimed.withColumn("pop_rank", F.row_number().over(w))


def pop_per_host(frontier: DataFrame, per_host_budget: int,
                 host_col: str = "host",
                 host_budgets: DataFrame | None = None) -> DataFrame:
    """P8 at scale: per-host politeness — top-B per host per round.
    One hash-partitioned window; hosts are independent so this
    parallelizes across the cluster.

    The window ranks a NARROW key projection (host, priority_level,
    insert_seq ≈ 30 bytes/row), not the full frontier row (url, referer,
    link text … ≈ hundreds of bytes): the per-round wide exchange over
    the whole pending set is the engine's dominant scale cost, and only
    the ordering keys are needed to decide the top-B. The ≤ B×hosts
    surviving keys join back to the unshuffled frontier scan on
    insert_seq (unique by construction — round/rank/pos bit-packing);
    AQE broadcasts that small side, so the full-width rows are never
    exchanged at all. Worst case (a work list too big to broadcast) the
    join-back hash-exchanges the frontier once — exactly what the old
    full-width window did, so this is never worse.

    `host_budgets` (host, host_budget) overrides the default budget for
    listed hosts — the robots Crawl-delay path (a host declaring
    Crawl-delay D gets floor(round_duration/D)). The dim is tiny (one
    row per host WITH a declared delay) and broadcast; unlisted hosts
    fall back to `per_host_budget`, so the common case stays a plain
    window + filter."""
    keys = frontier.select(host_col, "priority_level", "insert_seq")
    w = Window.partitionBy(host_col).orderBy(*pop_order())
    ranked = keys.withColumn("pop_rank", F.row_number().over(w))
    if host_budgets is None:
        ranked = ranked.filter(F.col("pop_rank") <= per_host_budget)
    else:
        ranked = (
            ranked.join(F.broadcast(host_budgets), host_col, "left")
            .filter(
                F.col("pop_rank")
                <= F.coalesce(F.col("host_budget"), F.lit(per_host_budget))
            )
            .drop("host_budget")
        )
    return frontier.join(
        ranked.select("insert_seq", "pop_rank"), "insert_seq"
    )


def interleave_rank(work: DataFrame, rank_col: str = "pop_rank") -> DataFrame:
    """Deterministic host interleave for per-host rounds (P8 at scale).

    Produces a dense global ``fetch_rank`` over the round's work list in
    ``(pop_rank ASC, priority DESC, insert_seq ASC)`` order — every
    host's first pick fetches before any host's second pick — WITHOUT a
    single-partition window over the whole B×hosts work list:

      1. ``row_number`` within each pop_rank tier. Tier k's partition
         holds one row per host that still has ≥k pending URLs, so the
         largest window partition is #hosts, never B×hosts.
      2. tier offsets from a ≤B-row aggregate (one row per distinct
         pop_rank value), broadcast-joined back. The cumulative offsets
         come from a ≤B×B triangle join over that aggregate — not a
         window — so no single-partition WindowExec exists anywhere in
         the per-host plan.

    fetch_rank is the engine's round serialization: it drives the trace
    ``seq``, the insert_seq bit-packing of extracted links, and (when a
    request_limit exists) the global cap.
    """
    tier_w = Window.partitionBy(rank_col).orderBy(*pop_order())
    counts = work.groupBy(rank_col).agg(F.count("*").alias("_tier_n"))
    lower = counts.select(
        F.col(rank_col).alias("_lo_rank"), F.col("_tier_n").alias("_lo_n")
    )
    offsets = (
        counts.join(F.broadcast(lower), F.col("_lo_rank") < F.col(rank_col), "left")
        .groupBy(rank_col)
        .agg(F.coalesce(F.sum("_lo_n"), F.lit(0)).alias("_tier_off"))
    )
    return (
        work.join(F.broadcast(offsets), rank_col)
        .withColumn(
            "fetch_rank",
            (F.col("_tier_off") + F.row_number().over(tier_w)).cast("int"),
        )
        .drop("_tier_off")
    )


def pop_batch(frontier: DataFrame, spec: CrawlSpec,
              host_budgets: DataFrame | None = None) -> DataFrame:
    if spec.per_host_politeness:
        return pop_per_host(frontier, spec.budget_per_round,
                            host_budgets=host_budgets)
    return pop_global(frontier, spec.budget_per_round)


def recrawl_schedule(history: DataFrame, url_col: str = "url",
                     ts_col: str = "fetch_ts",
                     hash_col: str = "content_hash",
                     seq_col: str | None = None,
                     min_interval_sec: int = 3600,
                     max_interval_sec: int = 30 * 86400) -> DataFrame:
    """Change-frequency recrawl scheduling (P7 generalized): estimate how
    often each URL's content changes from its fetch history and derive
    the next polite revisit interval — the freshness policy of Cho &
    Garcia-Molina, "Effective Page Refresh Policies for Web Crawlers"
    (TODS 2003). The reference re-queues a fixed ⅓ of list pages
    (worker/SpiderCsrcGov.class.php:52-111); a 100 TB crawl budgets
    revisits by OBSERVED change rate instead.

    Per URL over its (ts-ordered) fetch history:
      n_changes     = #fetches whose content hash differs from the
                      previous fetch's (lag window, partitioned by url)
      change_rate   = n_changes / max(n_fetches − 1, 1)
      est. period   = observed span / (n_changes + 1)  — the mean gap
                      between changes, counting the open interval
      next_interval = clamp(period, min_interval, max_interval); a URL
                      never seen twice gets max_interval (nothing is
                      known — poll at the lazy bound)
      next_fetch_unix = last fetch + next_interval

    Scale shape: ONE window (partitioned by url — millions of
    independent partitions, no skew beyond per-URL history length) and
    one groupBy(url); integer/6-decimal math only, so the DuckDB oracle
    reproduces every value exactly.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(seq_col).asc()] if seq_col else []
    )
    w = Window.partitionBy(url_col).orderBy(*order)
    prev = F.lag(F.col(hash_col)).over(w)
    flagged = history.withColumn(
        "_chg",
        (prev.isNotNull() & (prev != F.col(hash_col))).cast("long"),
    )
    # epoch seconds via ltz→long cast (truncates micros; matches DuckDB
    # floor(epoch(ts)) on the naive value under the UTC session tz)
    unix = F.col(ts_col).cast("timestamp_ltz").cast("long")
    agg = flagged.groupBy(F.col(url_col).alias("url")).agg(
        F.count("*").alias("n_fetches"),
        F.sum("_chg").alias("n_changes"),
        F.min(unix).alias("_first_unix"),
        F.max(unix).alias("_last_unix"),
    )
    span = F.col("_last_unix") - F.col("_first_unix")
    period = F.floor(span / (F.col("n_changes") + F.lit(1))).cast("long")
    interval = F.when(
        F.col("n_fetches") <= 1, F.lit(max_interval_sec).cast("long")
    ).otherwise(
        F.least(
            F.greatest(period, F.lit(min_interval_sec).cast("long")),
            F.lit(max_interval_sec).cast("long"),
        )
    )
    return agg.select(
        "url",
        "n_fetches",
        "n_changes",
        F.round(
            F.col("n_changes")
            / F.greatest(F.col("n_fetches") - 1, F.lit(1)).cast("double"),
            6,
        ).alias("change_rate"),
        interval.alias("next_interval_sec"),
        (F.col("_last_unix") + interval).alias("next_fetch_unix"),
    )


def salted_repartition(df: DataFrame, host_col: str = "host",
                       salt_buckets: int = 8,
                       num_partitions: int | None = None) -> DataFrame:
    """Host-skew defusal for the fetch stage: partition by
    (host, pmod(xxhash64(url), S)) so a mega-host's work-list spreads over
    S partitions instead of pinning one executor (SURVEY §4 — the
    reference has no skew handling at all; single-site spiders sidestep
    it). Politeness is already enforced upstream by the budget window, so
    splitting a host across partitions cannot overshoot the budget."""
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets))
    cols = [F.col(host_col), salt]
    if num_partitions:
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)


def backoff_blocked_hosts(
    pages,
    current_round: int,
    round_duration_s: float,
    default_backoff_rounds: int = 1,
    host_col: str = "host",
):
    """Adaptive throttle backoff (P8 extension; the reference drops
    throttled pages like any >400 status and never defers the host):
    given the fetched-pages history (host, round, status, retry_after),
    a host whose LAST throttled fetch (429/503) happened in round t is
    blocked for rounds t+1 .. t+W, where W = ceil(Retry-After /
    round_duration) when the server declared a wait, else
    `default_backoff_rounds`. "Last" = max(struct(round, retry_after)):
    latest round wins, ties by larger declared wait (null lowest).

    Returns the blocked-host dim (one `host_col` column) for
    `current_round` — tiny by construction (hosts currently throttled),
    meant to broadcast into an anti-join against the pending frontier.
    Scale shape: one partial-aggregating groupBy(host) over the pages
    scan; no window, no sort. State derives from persisted rows, so it
    survives resume for free (same property as the host cooldown).
    """
    thr = pages.filter(F.col("status").isin(429, 503))
    last = thr.groupBy(host_col).agg(
        F.max(F.struct("round", "retry_after")).alias("_l")
    )
    wait = (
        F.when(
            F.col("_l.retry_after").isNotNull(),
            F.ceil(F.col("_l.retry_after") / F.lit(float(round_duration_s))),
        )
        .otherwise(F.lit(default_backoff_rounds))
        .cast("int")
    )
    return last.filter(
        F.lit(current_round) <= F.col("_l.round") + wait
    ).select(host_col)


def assign_crawl_shards(df: DataFrame, n_shards: int,
                        host_col: str = "host",
                        out_col: str = "shard") -> DataFrame:
    """Rendezvous (highest-random-weight) host -> fetcher-shard mapping.

    The reference shares ONE frontier across its forked workers behind a
    table lock (UrlCache/PHPCrawlerMySqlUrlCache.class.php:124 LOCK
    TABLE) -- every pop serializes globally. A 1000-executor crawl
    instead statically owns hosts per fetcher fleet: shard =
    argmax_{s in 0..S-1} md5(host || ':' || s). Rendezvous hashing keeps
    politeness trivially correct (one shard owns a host's connections
    and rate limit) and, unlike `pmod(hash(host), S)`, resizing S -> S+1
    remaps only ~1/(S+1) of hosts (only those whose new candidate wins),
    so a fleet resize doesn't invalidate every host's cooldown state.

    Scale shape: row-local expression -- an S-element literal sequence
    transformed to (weight, shard) structs and reduced with array_max
    (struct ordering = lexicographic, weight first; md5 hex compares
    consistently in any engine). No shuffle, no Python, no join.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    cand = F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: F.struct(
            F.md5(F.concat(F.col(host_col), F.lit(":"),
                           s.cast("string"))).alias("w"),
            s.cast("int").alias("s"),
        ),
    )
    return df.withColumn(out_col, F.array_max(cand)["s"])


def apportion_budget(
    hosts_df: DataFrame,
    total_budget: int,
    host_col: str = "host",
    count_col: str = "pending",
    num_partitions: int | None = None,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a global fetch
    budget over hosts, proportional to pending frontier size.

    The reference has exactly one global budget knob (request_limit,
    PHPCrawler.class.php:1599-1606) and no notion of dividing it; a
    1000-executor round must split "fetch B pages this round" across
    hosts so that (a) budgets are integers, (b) they sum EXACTLY to B,
    (c) every host is within 1 page of its exact proportional share --
    which is precisely the Hamilton method: base = floor(B*n_h/N),
    then +1 to the R = B - sum(base) hosts with the largest remainders
    (ties by host name, deterministic).

    Scale shape: all quota math is exact int64 (DIV/pmod -- no float
    quotas); the remainder top-R uses a range-partitioned rank (per-
    partition row_number + broadcast partition-count prefix -- the
    pack_sequences decomposition), NEVER a single-partition window over
    the host dim. Two tiny driver scalars (N, R) are the only values
    that centralize.
    """
    spark = hosts_df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 2)
    B = int(total_budget)
    tot = hosts_df.agg(
        F.sum(F.col(count_col).cast("long")).alias("t")
    ).collect()[0]["t"]
    if not tot or B <= 0:
        return hosts_df.withColumn("budget", F.lit(0).cast("long"))

    prod = f"(CAST({B} AS BIGINT) * CAST({count_col} AS BIGINT))"
    based = hosts_df.withColumn(
        "_base", F.expr(f"{prod} DIV CAST({tot} AS BIGINT)")
    ).withColumn("_rem", F.expr(f"{prod} % CAST({tot} AS BIGINT)"))

    leftover = B - based.agg(F.sum("_base").alias("s")).collect()[0]["s"]

    ranged = based.repartitionByRange(
        num_partitions, F.col("_rem").desc(), F.col(host_col).asc()
    ).withColumn("_pid", F.spark_partition_id())
    ranged = ranged.localCheckpoint(eager=False)
    counts = ranged.groupBy("_pid").count().collect()
    by_pid = {r["_pid"]: r["count"] for r in counts}
    prefix, acc = {}, 0
    for pid in sorted(by_pid):
        prefix[pid] = acc
        acc += by_pid[pid]
    offsets = spark.createDataFrame(
        [(p, o) for p, o in prefix.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(
        F.col("_rem").desc(), F.col(host_col).asc()
    )
    return (
        ranged.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(
            "budget",
            (F.col("_base")
             + (F.col("_off") + F.col("_rn") <= F.lit(int(leftover)))
             .cast("long")).cast("long"),
        )
        .drop("_pid", "_rn", "_off", "_base", "_rem")
    )


def latency_budgets(
    pages: DataFrame,
    round_duration_ms: int,
    default_budget: int,
    max_budget: int | None = None,
    host_col: str = "host",
    latency_col: str = "fetch_ms",
) -> DataFrame:
    """Latency-adaptive per-host budgets (P8 extension): a host that
    answers in t ms can absorb ~round_duration/t sequential requests per
    round without concurrency -- the classic adaptive-politeness rule
    ("be no more than one outstanding request deep"), which the
    reference cannot express (its delay is one global constant,
    CrawlerSettings.class.php:43). Slow hosts automatically get small
    budgets; fast ones use the round.

    budget = clamp(floor(round_ms * n_obs / sum_ms), 1, max_budget) --
    EXACT int64 arithmetic on the (n, sum) sufficient statistics, never
    a float mean, so the verdict is reproducible across engines and
    partition orders. History-less hosts keep `default_budget`.

    Scale shape: one map-side-combining groupBy(host) over the pages
    scan; the result is a per-host dim meant to broadcast into
    pop_per_host exactly like the Crawl-delay budget overrides.
    """
    r = int(round_duration_ms)
    stats = pages.groupBy(host_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(F.col(latency_col).cast("long")).alias("sum_ms"),
    )
    raw = F.expr(f"(CAST({r} AS BIGINT) * n_obs) DIV sum_ms")
    b = F.greatest(F.lit(1).cast("long"), raw)
    if max_budget is not None:
        b = F.least(F.lit(int(max_budget)).cast("long"), b)
    return stats.withColumn(
        "host_budget",
        F.when(F.col("sum_ms") > 0, b)
        .otherwise(F.lit(int(default_budget)).cast("long")),
    )


def byte_budgets(
    pages: DataFrame,
    byte_budget: int,
    default_budget: int,
    max_budget: int | None = None,
    host_col: str = "host",
    bytes_col: str = "bytes_received",
) -> DataFrame:
    """Bandwidth politeness (P8 extension): cap the next round's
    per-host COUNT budget so the round's expected transfer from each
    host stays near ``byte_budget`` bytes, using the host's OBSERVED
    mean page size — the bytes analog of latency_budgets, for servers
    whose cost is bandwidth rather than request handling (media mirrors,
    archive hosts). The reference has a global traffic limit only
    (ABORTREASON_TRAFFICLIMIT, PHPCrawler.class.php docblocks); a
    per-host rate exists nowhere in it.

    budget = clamp(floor(byte_budget * n_obs / sum_bytes), 1,
    max_budget) — EXACT int64 arithmetic on the (n, sum) sufficient
    statistics (n counts ALL fetches, failed ones contributing 0 bytes,
    so error-prone hosts aren't over-throttled by a high observed
    mean). Hosts with no received bytes yet keep ``default_budget``.

    Scale shape: one map-side-combining groupBy(host) over the pages
    scan; the result is a per-host dim meant to broadcast into
    pop_per_host, MIN-combined with the Crawl-delay / latency /
    apportionment dims so the most conservative signal wins.
    """
    stats = pages.groupBy(host_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(F.col(bytes_col).cast("long")).alias("sum_bytes"),
    )
    raw = F.expr(
        f"(CAST({int(byte_budget)} AS BIGINT) * n_obs) DIV sum_bytes"
    )
    b = F.greatest(F.lit(1).cast("long"), raw)
    if max_budget is not None:
        b = F.least(F.lit(int(max_budget)).cast("long"), b)
    return stats.withColumn(
        "host_budget",
        F.when(F.col("sum_bytes") > 0, b)
        .otherwise(F.lit(int(default_budget)).cast("long")),
    )


def frontier_age_report(frontier: DataFrame, current_round: int,
                        priority_col: str = "priority_level",
                        round_col: str = "round") -> DataFrame:
    """Starvation telemetry for the pending frontier (A-series at
    scale): per priority level — pending count, the oldest insert
    round, the maximum wait, and the exact mean wait in rounds. Low
    levels legitimately wait under strict priority order (P3), but an
    UNBOUNDED max_wait at a level with steady budget is the starvation
    signal the reference's scalar counters (A1/A5) cannot show.

    One map-side-combining groupBy over the pending scan; the mean is
    one IEEE division over exact int64 (n, Σwait) — reproducible. The
    result has ≤ #priority-levels rows.
    """
    wait = (F.lit(int(current_round)) - F.col(round_col)).cast("long")
    return (
        frontier.groupBy(priority_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pending"),
            F.min(round_col).cast("long").alias("oldest_round"),
            F.max(wait).cast("long").alias("max_wait_rounds"),
            F.sum(wait).alias("_sw"),
        )
        .withColumn(
            "mean_wait_rounds",
            F.round(F.col("_sw").cast("double") / F.col("n_pending"), 6),
        )
        .drop("_sw")
    )


def priority_from_pagerank(
    frontier: DataFrame,
    ranks: DataFrame,
    levels: int = 4,
    node_col: str = "node",
    rank_col: str = "rank",
    scale_bits: int = 20,
) -> DataFrame:
    """P2 at web scale: derive the frontier's ``priority_level`` from
    link-graph PageRank (operators/graph.py:pagerank) instead of the
    reference's hand-written regex priority lists
    (UrlCache/PHPCrawlerURLCacheBase.class.php:98-138) — the crawl
    ordering Cho, Garcia-Molina & Page showed reaches important pages
    first. Output plugs straight into pop_order()/pop_per_host, and
    MIN-combines with admission/politeness like every other P2 source.

    Tiering is doubling-based and integer-exact: a page lands in the
    highest level whose threshold ``max_rank / 2^j`` it clears —
    computed as ``scaled << j >= max_scaled`` on
    ``scaled = floor(rank * 2^scale_bits)`` int64s, so the verdict has
    no float-comparison hazard between engines (ranks from the dyadic
    contract graph are exact; real-valued ranks just tier
    deterministically on their scaled floor).

    Scale shape: one partial-aggregating max() collapsed to a driver
    scalar (O(1), same idiom as the BM25 corpus stats), then the tier
    is ONE codegen'd CASE in the scan — no shuffle beyond the
    frontier ⋈ ranks equi-join on the node id, which AQE can
    skew-split; a frontier row without a rank (not yet in the link
    graph) gets level 0, the crawl-the-unknown-last default.
    """
    scaled = F.floor(F.col(rank_col) * F.lit(1 << scale_bits)).cast("long")
    r = ranks.select(F.col(node_col), scaled.alias("_scaled"))
    max_scaled = int(
        r.agg(F.max("_scaled")).collect()[0][0] or 0
    )
    tier = F.lit(0)
    if max_scaled > 0:  # all-zero/empty ranks → everything level 0
        # j doublings from max → level levels-1-j; built inside-out so
        # the TIGHTEST threshold (j=0, the top tier) is evaluated first
        for j in reversed(range(levels)):
            tier = F.when(
                F.col("_scaled") * F.lit(1 << j) >= F.lit(max_scaled),
                F.lit(levels - 1 - j),
            ).otherwise(tier)
    return (
        frontier.join(r, node_col, "left")
        .withColumn(
            "priority_level",
            F.when(F.col("_scaled").isNull(), F.lit(0))
            .otherwise(tier).cast("int"),
        )
        .drop("_scaled")
    )


def politeness_audit(trace: DataFrame, per_host_budget: int,
                     url_col: str = "url", round_col: str = "round",
                     host_budgets: DataFrame | None = None) -> DataFrame:
    """Compliance audit over a finished crawl's trace: did any host
    receive more fetches in one round than its politeness budget
    allows? The operational check a crawl operator runs before trusting
    a new scheduler configuration (the goldens prove the scheduler on
    fixtures; this proves a PRODUCTION RUN, after the fact, from its
    own persisted trace — A-series telemetry the reference's scalar
    counters cannot express).

    ``host_budgets`` (host, host_budget) optionally overrides the
    default per host — the same dim table shape pop_per_host consumes
    (robots Crawl-delay budgets, latency-adaptive budgets), broadcast
    here exactly as there.

    Output: one row per (round, host) with ``n_fetches``, ``budget``,
    ``exceeded`` — audit passes when ``filter(exceeded)`` is empty.
    Scale shape: one map-side-combined groupBy over the trace scan plus
    an optional broadcast join; rows out ≤ rounds × hosts.
    """
    from .admission import host_expr

    per_rh = trace.groupBy(
        F.col(round_col).cast("long").alias("round"),
        host_expr(F.col(url_col)).alias("host"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_fetches"))
    if host_budgets is not None:
        per_rh = per_rh.join(F.broadcast(host_budgets), "host", "left")
        budget = F.coalesce(
            F.col("host_budget").cast("long"),
            F.lit(int(per_host_budget)).cast("long"),
        )
    else:
        budget = F.lit(int(per_host_budget)).cast("long")
    return per_rh.select(
        "round", "host", "n_fetches",
        budget.alias("budget"),
        (F.col("n_fetches") > budget).alias("exceeded"),
    )


def host_crawl_report(
    trace: DataFrame,
    host_col: str = "host",
    status_col: str = "status",
    bytes_col: str = "bytes_received",
    latency_col: str = "latency_ms",
    attempts_col: str = "n_attempts",
) -> DataFrame:
    """Per-host crawl health report (A1/A2 generalized to the host
    grain): the ops table a production recrawl loop watches — which
    hosts error, which throttle, which answer 304 (conditional-GET
    efficiency per host), where the bytes go, what latency looks like.
    politeness_audit answers "did WE behave"; this answers "how do
    THEY behave".

    Exact integers end to end: counts by status class (2xx ok / 304
    not-modified / 3xx redirect / 4xx client / 5xx server / 0
    connection-dead / 429+503 throttle), total bytes, total attempts,
    and latency as (sum, n_obs) sufficient stats over NON-NULL
    latencies (a dead connection carries none and must not deflate the
    mean) with a milli-precision mean by integer division
    (mean_latency_mu = sum*1000 DIV n_latency_obs — bit-stable across
    engines, the latency_budgets rule).

    Scale shape: ONE map-side-combined groupBy(host) over the trace
    scan; every class count is a codegen'd conditional sum. Rows out =
    distinct hosts.
    """
    s = F.col(status_col)

    def n(cond, name):
        return F.sum(cond.cast("long")).alias(name)

    return trace.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches"),
        n(s.between(200, 299), "n_ok"),
        n(s == 304, "n_not_modified"),
        n(s.between(300, 399) & (s != 304), "n_redirect"),
        n(s.between(400, 499), "n_client_err"),
        n(s.between(500, 599), "n_server_err"),
        n(s == 0, "n_dead"),
        n(s.isin(429, 503), "n_throttled"),
        F.coalesce(F.sum(F.col(bytes_col).cast("long")), F.lit(0))
        .alias("total_bytes"),
        F.coalesce(F.sum(F.col(attempts_col).cast("long")), F.lit(0))
        .alias("total_attempts"),
        F.coalesce(F.sum(F.col(latency_col).cast("long")), F.lit(0))
        .alias("sum_latency_ms"),
        F.count(F.col(latency_col)).cast("long").alias("n_latency_obs"),
    ).withColumn(
        "mean_latency_mu",
        F.when(
            F.col("n_latency_obs") > 0,
            F.expr("(sum_latency_ms * 1000) DIV n_latency_obs"),
        ),
    )
