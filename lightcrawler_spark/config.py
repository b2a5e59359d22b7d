"""Crawl-job specification (the reference's "config IS the query").

Mirrors the settings surface of the reference
(/root/reference/libs/CrawlerSettings.class.php:11-58 and the per-spider
rule maps, worker/SpiderFrame.class.php:48-122): follow mode, depth
limit, deny/allow regex rules, priority rules, politeness budget, retry
budget. PHP-delimited regexes (``#...# i``) are accepted and translated
to Java/`re` syntax once at plan-build time.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# libs/CrawlerConst.class.php:19-22
FOLLOW_MODE_ANY = 0
FOLLOW_MODE_DOMAIN = 1   # default (libs/CrawlerSettings.class.php:23)
FOLLOW_MODE_HOST = 2
FOLLOW_MODE_PATH = 3

# libs/urlfilter_rules.txt:1 — the stock deny rule
DEFAULT_URL_FILTER_RULES = (
    r"#\.(jpg|gif|png|pdf|jpeg|css|js|mp3|mp4|flv|swf|svg|bmp)# i",
)


def php_regex_to_std(rx: str) -> str:
    """Translate a PHP-delimited PCRE (``#pat# i`` / ``/pat/is``) to a
    plain pattern with inline flags usable by both Java rlike and
    Python re. Raises on constructs neither engine supports."""
    rx = rx.strip()
    delim = rx[0]
    end = rx.rfind(delim)
    if end <= 0:
        return rx  # already a bare pattern
    pat, flags = rx[1:end], rx[end + 1:].replace(" ", "")
    inline = ""
    if "i" in flags:
        inline += "i"
    if "s" in flags:
        inline += "s"
    if "m" in flags:
        inline += "m"
    if "U" in flags:
        # PCRE ungreedy: invert quantifier greediness; we only support the
        # common case of making * and + lazy.
        pat = re.sub(r"([*+?}])(?!\?)", r"\1?", pat)
    return (f"(?{inline})" if inline else "") + pat


@dataclass
class CrawlSpec:
    """One crawl job == one logical query over the web graph."""

    seeds: list[str]
    follow_mode: int = FOLLOW_MODE_DOMAIN
    max_depth: int | None = 1          # libs/CrawlerSettings.class.php:44
    url_filter_rules: list[str] = field(default_factory=list)    # deny (F5)
    linktext_filter_rules: list[str] = field(default_factory=list)  # F6
    url_follow_rules: list[str] = field(default_factory=list)    # allow (F7)
    linktext_follow_rules: list[str] = field(default_factory=list)
    priority_rules: list[tuple[str, int]] = field(default_factory=list)  # P2
    obey_nofollow: bool = False
    obey_robots_txt: bool = False
    # Live robots.txt acquisition when obey_robots_txt is on and no
    # fixture was supplied (F8/S6 — the reference fetches the seed
    # host's robots once at startup, PHPCrawler.class.php:522-524,
    # through the parser's own fetch,
    # PHPCrawlerRobotsTxtParser.class.php:30-60):
    #   "seed"     — reference parity: fetch robots for the seed hosts
    #                before round 1 (default);
    #   "per_host" — scale generalization: fetch robots for each NEW
    #                host the round's admitted links introduce (once per
    #                host, cached), filtering those links before they
    #                enter the frontier.
    robots_fetch_mode: str = "seed"
    # F9: before the first 200-with-content page, keep only redirect
    # links (depth handed back) and re-base the URL filter to that first
    # content page. Reference default TRUE (PHPCrawler.class.php:198).
    follow_redirects_till_content: bool = True
    user_agent: str = "PHPCrawl"
    crawl_delay_s: float = 5.0         # libs/CrawlerSettings.class.php:43
    round_duration_s: float = 5.0      # BSP round = one politeness window
    per_host_politeness: bool = False  # scale generalization of the global budget
    # robots Crawl-delay → per-host budgets (extension beyond the
    # reference parser, which honors only Disallow): with
    # per_host_politeness + obey_robots_txt, a host whose robots.txt
    # declares "Crawl-delay: D" gets a per-round budget of
    # budget_for_delay(D) instead of budget_per_round. Off by default
    # (reference parity).
    honor_crawl_delay: bool = False
    # cross-round host cooldown: a host fetched in round r is ineligible
    # until round r + host_delay_rounds (0 = off). The stateful
    # "last-fetch-per-host carries over" politeness (SURVEY §7) — state
    # lives in the round store's host_state table, so it survives resume.
    host_delay_rounds: int = 0
    # adaptive throttle backoff (extension beyond the reference, which
    # drops throttled pages like any >400 status): when a host answers
    # 429/503, it becomes ineligible for the next
    # ceil(Retry-After / round_duration_s) BSP rounds (server-declared
    # wait) or default_backoff_rounds when the header is absent. The
    # throttled URL itself stays consumed (reference P9 parity — inline
    # retries already ran); only FUTURE work on the host is deferred.
    # State derives from the persisted pages rows (status, retry_after,
    # round), so it survives resume like the host cooldown. Off by
    # default (reference parity).
    retry_after_backoff: bool = False
    default_backoff_rounds: int = 1
    # latency-adaptive per-host budgets (P8 extension, off by default):
    # with per_host_politeness, a host's next-round budget becomes
    # min(budget_per_round, max(1, floor(round_ms * n / sum_ms))) from
    # the (n, sum latency_ms) of its ALREADY-PERSISTED pages rows — the
    # classic "one outstanding request" adaptive-politeness rule, exact
    # int64 math (scheduler.latency_budgets), combined with any robots
    # Crawl-delay override by MIN (most conservative wins). State derives
    # from committed rounds, so it survives resume like the cooldown.
    adaptive_latency_budgets: bool = False
    # Hamilton budget apportionment (P8 extension, off by default): with
    # per_host_politeness, a GLOBAL round budget of this many pages is
    # split across hosts proportional to their pending frontier size by
    # the largest-remainder method (scheduler.apportion_budget — exact
    # integer quotas summing to the budget, every host within one page
    # of its proportional share), MIN-combined with the per-host default
    # and any Crawl-delay / latency / backoff dim so the most
    # conservative signal still wins. 0 = off (uniform per-host budget).
    apportion_round_budget: int = 0
    # memory-store stats hygiene: sever Catalyst statistics on every
    # stored frame (checkpoint + JVM-side internalCreateDataFrame
    # rewrap, CrawlEngine._to_local — constant defaultSizeInBytes, zero
    # driver round-trip). A bare checkpoint inherits its source plan's
    # sizeInBytes, which per-host rounds multiply through their joins:
    # stored stats then compound geometrically until Catalyst grinds
    # inside BigInteger.multiply by round ~10 (measured 2.5e7-digit
    # BigInts). False = checkpoint-only, the regression-probe arm of
    # tests/test_stats_flatten.py; never disable in real crawls.
    # Durable stores are unaffected (parquet scans carry real stats).
    sever_stored_stats: bool = True
    # URL-seen set mode (P1). "exact": new links anti-join the full
    # frontier key set every round — bit-exact reference parity, but an
    # O(frontier) scan+shuffle per round. "bloom": the north-rule design
    # — a sharded Bloom URL-seen set (operators/dedup.py NumpyBloom,
    # vectorized Arrow probe). The engine appends one DELTA shard set
    # per round (built from that round's new frontier keys) to a
    # `seen_bloom` store table and probes new links against ALL deltas
    # with one cogroup pass — per-round dedup cost becomes O(new links),
    # independent of frontier size. A false positive drops a genuinely
    # new URL (the standard crawler seen-set tradeoff); cumulative FPR
    # after R rounds ≈ R × seen_bloom_fpp, so the per-delta budget is
    # set low. At 10^10 keys the aggregate bitmaps are ~3 GB across
    # seen_bloom_shards buckets — each bucket's deltas meet its link
    # bucket in one Arrow task, nothing is broadcast.
    seen_filter: str = "exact"
    seen_bloom_fpp: float = 1e-6
    seen_bloom_shards: int = 32
    # spider-trap gate (extension; the reference's per-site workers dodge
    # traps with hand-tuned regexes): with drop_traps, the Heritrix-style
    # pathological-URL verdict (operators/traps.py:is_trap_expr) joins
    # the admission battery — trap URLs never enter the frontier, so the
    # P1 anti-join can't be flooded by unbounded alias spaces.
    drop_traps: bool = False
    retry_limit: int = 3               # libs/CrawlerSettings.class.php:37
    request_limit: int = 0             # 0 = unlimited (P10)
    traffic_limit_bytes: int = 0
    aggressive_link_search: bool = False
    content_type_receive_rules: list[str] = field(
        default_factory=lambda: [r"#text/html# i"]
    )
    link_search_content_types: list[str] = field(
        default_factory=lambda: [r"#text/html# i"]
    )
    max_rounds: int = 1000
    # E17 pagination synthesis: (body_regex_with_count_group, template)
    # pairs. Pages whose body matches feed `dir + template(i)` for
    # i=1..count-1 back to the frontier via the reference's addFeed
    # semantics: depth 0, NO admission filtering, inserted BEFORE the
    # page's own extracted links (PHPCrawler.class.php:392-399 with
    # handleDocumentInfo running before filterUrls, :772-833). Patterns
    # are plain regexes (group 1 = the page count), not PHP-delimited.
    pagination_rules: list[tuple[str, str]] = field(default_factory=list)
    # Sitemap bootstrap (operators/sitemap.py wired into the engine):
    # at round 0, `Sitemap:` directives in the acquired robots bodies
    # (fixture or S6 live fetch — requires obey_robots_txt bodies to
    # exist, otherwise a no-op) are fetched out-of-band like robots,
    # parsed (one level of <sitemapindex> recursion, per protocol), and
    # the <loc> entries enter the frontier at depth 1 through the FULL
    # F1-F8 admission battery (no F9 bypass — ingestion is defined
    # outside the redirect bootstrap), deduped first-wins after the
    # seeds. The reference never reads sitemaps; this is the engine's
    # cheapest high-precision frontier source at web scale.
    ingest_sitemaps: bool = False
    # P7 generalized — round-based revisit scheduling (the reference
    # re-queues a fixed third of its list pages each run,
    # worker/SpiderCsrcGov.class.php:52-111; the engine re-queues by
    # AGE): a fetched URL matching any of these PHP-delimited regexes
    # re-enters the frontier once `revisit_after_rounds` rounds have
    # passed since its last fetch, up to `max_revisits` extra fetches.
    # Revisit rows carry the ORIGINAL row's depth/priority/referer and
    # rank AFTER all fresh discovery at equal priority (insert_seq
    # offset 1<<61). Derived every round from committed pages — no new
    # state tables, resume-safe by construction. Empty list = off.
    revisit_url_rules: list[str] = field(default_factory=list)
    revisit_after_rounds: int = 2
    max_revisits: int = 1
    # Conditional revalidation for revisits (RFC 9110 §13): revisit rows
    # carry the LAST committed page's validators (ETag → If-None-Match,
    # Last-Modified → If-Modified-Since, verbatim opaque strings); an
    # unchanged page answers 304 Not Modified — no body transfer, no
    # re-extraction, the recrawl-bandwidth saver every production
    # revisit loop runs with. Off by default: the reference's fetcher
    # sends no validators, so parity crawls must not either.
    conditional_get: bool = False
    # P8 bandwidth politeness: target bytes per host per round (0 =
    # off). Converted to a per-host COUNT budget from the host's
    # observed mean page size (scheduler.byte_budgets) and MIN-combined
    # with every other budget dim. Requires per_host_politeness.
    host_byte_budget: int = 0
    # Frontier hygiene at 10^10 scale: a FRESH pending URL not popped
    # within this many rounds of its insertion round expires (dropped
    # from pop eligibility before the pending anti-join, so dead rows
    # also skip the round's wide shuffle). 0 = off. Revisit rows are
    # exempt (their 1<<61 seq offset packs a far-future round). The
    # insertion round is recovered from insert_seq's bit-packing —
    # no new state, resume-safe by construction.
    frontier_ttl_rounds: int = 0
    # P8/P10 per-host LIFETIME quotas (the Heritrix maxDocsPerHost
    # analog; the reference has only global request/traffic limits):
    # once a host has host_page_cap claimed pages (or host_byte_cap
    # received bytes) across the whole crawl, its pending rows become
    # ineligible — breadth fairness against mega-sites. 0 = off.
    # Eligibility is decided on COMMITTED totals at round start (BSP),
    # so a host can overshoot its cap by up to one round's budget —
    # quotas gate rounds, they don't cut mid-round. Derived each round
    # from the committed pages (resume-safe); a tiny capped-host dim
    # broadcast into an anti-join, the cooldown shape.
    host_page_cap: int = 0
    host_byte_cap: int = 0
    # fetch-stage host-salting kicks in at this round budget: below it a
    # work-list is small enough that the extra shuffle costs more than
    # the skew it defuses; production budgets (thousands+) always salt
    salt_fetch_threshold: int = 256
    # opt-in rows arm of the fetch-repartition gate: the explicit
    # repartition ALSO engages — regardless of the per-host budget —
    # once the previous round fetched at least this many pages. OFF by
    # default (0 = disabled): the BENCH.md leg-10 A/B (20M nodes, 2048
    # hosts, B=48, ~94k URLs/round, 3 arms, identical trace hashes)
    # measured the arm as a ~7.5% steady-throughput LOSS at the
    # many-hosts shape. Reason: below salt_fetch_threshold the work
    # list otherwise keeps the pop/rank stage's partitioning — an
    # exchange whose bytes are the full PENDING set, so AQE never
    # collapses it, and per-host takes ≤ budget bound the skew by
    # construction — and the fetch fuses with that stage. The rows arm
    # inserts a new tiny-in-bytes exchange (which must then be pinned
    # against AQE) and pays a full extra shuffle for balance the plan
    # already had. Set > 0 only for fetch stages whose per-row cost is
    # extreme relative to the rank stage (e.g. real network fetches
    # with multi-second tails) where re-spreading the work list evenly
    # may be worth a shuffle; the salt arm (salt_fetch_threshold),
    # which fires when per-host takes are large enough to skew a
    # hash(host) partitioning, is unaffected and stays pinned.
    fetch_repartition_rows: int = 0

    def std_rules(self, rules: list[str]) -> list[str]:
        return [php_regex_to_std(r) for r in rules]

    @property
    def budget_per_round(self) -> int:
        """Politeness budget: fetches allowed per BSP round.

        With the reference's global 1-request-per-delay semantics a round
        of duration T admits floor(T/delay) fetches; the default config
        (T == delay) gives budget 1, which makes the BSP engine's pop
        order IDENTICAL to the reference's sequential pop order.
        """
        if self.crawl_delay_s <= 0:
            return 2 ** 31 - 1
        return max(1, int(self.round_duration_s / self.crawl_delay_s))

    def budget_for_delay(self, delay_s: float) -> int:
        """Per-host per-round budget for a robots-declared Crawl-delay:
        floor(round_duration / delay), at least 1 (a Crawl-delay slows a
        host down but never starves it — the host still advances every
        round, like the reference's single-pop floor)."""
        if delay_s is None or delay_s <= 0:
            return self.budget_per_round
        return max(1, int(self.round_duration_s / delay_s))
