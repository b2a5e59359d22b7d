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
                else:
                    body, ctype, status = b"nope", "text/plain", 404
            else:
                body, ctype, status = b"nope", "text/plain", 404
            self.send_response(status)
            self.send_header("Content-Type", ctype)
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
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from lightcrawler_spark.config import CrawlSpec
    from lightcrawler_spark.operators.scheduler import politeness_audit
    from lightcrawler_spark.plans.crawl import CrawlEngine
    from lightcrawler_spark.session import get_spark
    from lightcrawler_spark.sources.fetcher import HttpFetcher

    servers = []
    seeds = []
    for i in range(a.hosts):
        # one DISTINCT loopback IP per host (the whole 127.0.0.0/8
        # block loops back on Linux): the scheduler's politeness key is
        # the HOST (host_expr strips ports), so distinct ports alone
        # would collapse the farm into one politeness bucket
        ip = f"127.0.{i // 250}.{i % 250 + 1}"
        srv = ThreadingHTTPServer(
            (ip, 0), _make_handler(i, a.fanout, a.pages_per_host)
        )
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        seeds.append(f"http://{ip}:{srv.server_address[1]}/p/0.htm")

    spark = get_spark(
        f"live-soak-{a.cpus}", master=f"local[{a.cpus}]",
        shuffle_partitions=a.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spec = CrawlSpec(
        seeds=seeds,
        # ANY: the follow base is the FIRST seed's domain (reference
        # semantics), which would reject the other farm hosts' links;
        # every generated link is same-host-relative anyway, and the
        # /private subtree is the robots gate's job
        follow_mode=0,
        max_depth=32,
        retry_limit=1,
        obey_robots_txt=True,   # live /robots.txt: /private is disallowed
        per_host_politeness=True,
        # budget_per_round == round_duration / crawl_delay == a.budget
        crawl_delay_s=1.0,
        round_duration_s=float(a.budget),
        follow_redirects_till_content=False,
    )
    engine = CrawlEngine(spark, spec, HttpFetcher(spec, timeout_s=10.0))

    t0 = time.perf_counter()
    result = engine.run(max_rounds=a.max_rounds)
    wall = time.perf_counter() - t0

    pages = result.pages
    n_pages = pages.count()
    n_rounds = pages.agg(F.max("round")).first()[0]
    audit = politeness_audit(pages, a.budget)
    n_exceeded = audit.filter(F.col("exceeded")).count()
    n_private = pages.filter(F.col("url").contains("/private/")).count()
    n_hosts_seen = pages.select(
        F.regexp_extract("url", r"^https?://([^/]+)", 1)
    ).distinct().count()

    for srv in servers:
        srv.shutdown()

    expected = a.hosts * a.pages_per_host
    print(json.dumps({
        "mode": "live-soak",
        "hosts": a.hosts, "pages_per_host": a.pages_per_host,
        "budget_per_round": a.budget, "cpus": a.cpus,
        "rounds": int(n_rounds) + 1 if n_rounds is not None else 0,
        "pages_fetched": int(n_pages),
        "expected_pages": expected,
        "coverage": round(n_pages / expected, 4),
        "wall_s": round(wall, 1),
        "pages_per_sec": round(n_pages / wall, 1),
        "politeness_rounds_exceeded": int(n_exceeded),
        "robots_private_fetches": int(n_private),
        "hosts_seen": int(n_hosts_seen),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
