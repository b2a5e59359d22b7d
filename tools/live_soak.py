"""Real-socket engine soak (VERDICT r4 "Next round" #8): the one engine
path whose scale evidence was fixture-only — HttpFetcher at modest
concurrency against a LOCALHOST MULTI-PORT server farm. 100+ distinct
hosts (one http.server port each; the politeness key includes the port,
so each is a first-class host to the scheduler), ~10^4 pages total,
per-host round budgets, live robots.txt with a disallowed subtree.

Publishes: pages/s over the whole run, a politeness audit over the
real-socket trace (zero rounds may exceed any host's budget), and the
robots compliance count (zero /private fetches). One JSON line on
stdout.

Usage:
  python tools/live_soak.py --hosts 120 --pages-per-host 100 \
      --budget 16 --cpus 32
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, "/root/repo")


def _page_body(host_idx: int, page: int, fanout: int, max_pages: int) -> str:
    """Deterministic synthetic site: page k links to its binary-tree
    children (k*fanout+1 .. k*fanout+fanout) below max_pages, plus a
    robots-disallowed /private link the engine must never fetch."""
    links = "".join(
        f'<a href="/p/{c}.htm">child {c}</a> '
        for c in range(page * fanout + 1, page * fanout + fanout + 1)
        if c < max_pages
    )
    return (
        f"<html><head><title>h{host_idx} p{page}</title></head><body>"
        f"<h1>host {host_idx} page {page}</h1>{links}"
        f'<a href="/private/{page}.htm">secret</a>'
        f"<p>body text for host {host_idx} page {page}</p></body></html>"
    )


def _make_handler(host_idx: int, fanout: int, max_pages: int):
    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            etag = None
            if self.path == "/robots.txt":
                body = b"User-agent: *\nDisallow: /private\n"
                ctype = "text/plain"
                status = 200
            elif self.path.startswith("/p/") and self.path.endswith(".htm"):
                try:
                    page = int(self.path[3:-4])
                except ValueError:
                    page = -1
                if 0 <= page < max_pages:
                    body = _page_body(
                        host_idx, page, fanout, max_pages
                    ).encode("utf-8")
                    ctype = "text/html"
                    status = 200
                    # content never changes in this farm, so the ETag is
                    # a pure content version; a matching If-None-Match
                    # revalidates to an empty 304 (RFC 9110 conditional
                    # path — the engine sends ONLY If-None-Match when an
                    # ETag is stored, per the r5 validator fix)
                    etag = f'"h{host_idx}-p{page}-v1"'
                    if self.headers.get("If-None-Match") == etag:
                        status, body = 304, b""
                else:
                    body, ctype, status = b"nope", "text/plain", 404
            else:
                body, ctype, status = b"nope", "text/plain", 404
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            if etag:
                self.send_header("ETag", etag)
                self.send_header(
                    "Last-Modified", "Wed, 01 Jan 2025 00:00:00 GMT"
                )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return H


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=120)
    ap.add_argument("--pages-per-host", type=int, default=100)
    ap.add_argument("--fanout", type=int, default=2)
    ap.add_argument("--budget", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--max-rounds", type=int, default=60)
    ap.add_argument("--revisit-after", dest="revisit_after", type=int,
                    default=0, help=">0: revisit pages after N rounds and "
                    "run a conditional-GET on/off A/B over real sockets")
    ap.add_argument("--max-revisits", dest="max_revisits", type=int,
                    default=1)
    ap.add_argument("--skew-mega", dest="skew_mega", type=int, default=0,
                    help=">1: host 0 serves this many TIMES pages_per_host "
                    "pages (politeness-under-skew through real sockets)")
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from lightcrawler_spark.config import CrawlSpec
    from lightcrawler_spark.operators.scheduler import politeness_audit
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.session import get_spark
    from lightcrawler_spark.sources.fetcher import HttpFetcher

    servers = []
    seeds = []
    pages_of = [
        a.pages_per_host * (a.skew_mega if i == 0 and a.skew_mega > 1 else 1)
        for i in range(a.hosts)
    ]
    for i in range(a.hosts):
        # one DISTINCT loopback IP per host (the whole 127.0.0.0/8
        # block loops back on Linux): the scheduler's politeness key is
        # the HOST (host_expr strips ports), so distinct ports alone
        # would collapse the farm into one politeness bucket
        ip = f"127.0.{i // 250}.{i % 250 + 1}"
        srv = ThreadingHTTPServer(
            (ip, 0), _make_handler(i, a.fanout, pages_of[i])
        )
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        seeds.append(f"http://{ip}:{srv.server_address[1]}/p/0.htm")

    spark = get_spark(
        f"live-soak-{a.cpus}", master=f"local[{a.cpus}]",
        shuffle_partitions=a.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    def _spec(conditional: bool) -> CrawlSpec:
        return CrawlSpec(
            seeds=seeds,
            # ANY: the follow base is the FIRST seed's domain (reference
            # semantics), which would reject the other farm hosts' links;
            # every generated link is same-host-relative anyway, and the
            # /private subtree is the robots gate's job
            follow_mode=0,
            max_depth=32,
            retry_limit=1,
            obey_robots_txt=True,  # live /robots.txt: /private disallowed
            per_host_politeness=True,
            # budget_per_round == round_duration / crawl_delay == a.budget
            crawl_delay_s=1.0,
            round_duration_s=float(a.budget),
            follow_redirects_till_content=False,
            # revisit machinery is gated on the url-rule list (empty = off)
            revisit_url_rules=["#/p/#"] if a.revisit_after > 0 else [],
            revisit_after_rounds=max(a.revisit_after, 1),
            max_revisits=a.max_revisits,
            conditional_get=conditional,
        )

    def _run_arm(conditional: bool) -> dict:
        spec = _spec(conditional)
        engine = CrawlEngine(spark, spec, HttpFetcher(spec, timeout_s=10.0))
        t0 = time.perf_counter()
        result = engine.run(max_rounds=a.max_rounds)
        wall = time.perf_counter() - t0
        pages = result.pages
        agg = pages.agg(
            F.count(F.lit(1)).alias("n"),
            F.max("round").alias("max_round"),
            F.sum("bytes_received").alias("bytes"),
            F.sum((F.col("status") == 304).cast("long")).alias("n_304"),
            F.sum(F.col("url").contains("/private/").cast("long"))
            .alias("n_private"),
        ).first()
        n_exceeded = politeness_audit(pages, a.budget).filter(
            F.col("exceeded")
        ).count()
        # pop-schedule identity across arms: order-insensitive xor-hash
        # over (seq, url) — statuses differ between arms by design
        sched = pages.agg(F.expr(
            "bit_xor(xxhash64(concat(cast(round as string), '|', url)))"
        )).first()[0]
        n_hosts_seen = pages.select(
            F.regexp_extract("url", r"^https?://([^/]+)", 1)
        ).distinct().count()
        # empty-crawl guards: a misbehaving farm must publish a
        # coverage-0 witness row, not die on int(None)
        return {
            "rounds": int(agg["max_round"]) + 1
            if agg["max_round"] is not None else 0,
            "pops": int(agg["n"]),
            "bytes": int(agg["bytes"] or 0),
            "n_304": int(agg["n_304"] or 0),
            "wall_s": round(wall, 1),
            "pages_per_sec": round(agg["n"] / wall, 1),
            "politeness_rounds_exceeded": int(n_exceeded),
            "robots_private_fetches": int(agg["n_private"] or 0),
            "hosts_seen": int(n_hosts_seen),
            "schedule_hash": int(sched) if sched is not None else 0,
        }

    expected = sum(pages_of)
    base = {
        "hosts": a.hosts, "pages_per_host": a.pages_per_host,
        "budget_per_round": a.budget, "cpus": a.cpus,
        "expected_pages": expected,
    }
    if a.skew_mega > 1:
        base["skew_mega"] = a.skew_mega
    if a.revisit_after > 0:
        off = _run_arm(conditional=False)
        on = _run_arm(conditional=True)
        print(json.dumps({
            "mode": "live-soak-conditional-ab",
            **base,
            "revisit_after": a.revisit_after,
            "max_revisits": a.max_revisits,
            "off": off, "on": on,
            "pop_schedule_identical":
                off["pops"] == on["pops"]
                and off["schedule_hash"] == on["schedule_hash"],
            "bytes_saved_pct": round(
                100.0 * (off["bytes"] - on["bytes"]) / max(off["bytes"], 1),
                2,
            ),
        }))
    else:
        arm = _run_arm(conditional=False)
        arm.pop("schedule_hash")
        n_pages = arm.pop("pops")
        print(json.dumps({
            "mode": "live-soak",
            **base,
            "pages_fetched": n_pages,
            "coverage": round(n_pages / expected, 4),
            **arm,
        }))

    for srv in servers:
        srv.shutdown()
    spark.stop()


if __name__ == "__main__":
    main()
