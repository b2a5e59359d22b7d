"""Deterministic synthetic fixtures (FIXTURES.md §§1-5).

Everything is seeded and wall-clock-free: the same call always yields the
same bytes, so golden traces and per-row image invariants are stable
across runs and machines.

- images: seeded RNG → solid/gradient/noise RGB arrays, encoded per fmt
  (FIXTURES.md §1; schema == BASELINE.json input_hint).
- webgraph: a small multi-host web with list→detail trees, pagination
  JS counters, redirect chains, cross-host links, duplicate links,
  depth-overflow branches, GBK pages, and <img>+caption detail pages
  (FIXTURES.md §2).
- seeds/robots: crawl-job specs + robots bodies (FIXTURES.md §3-4).
- simulate_reference_crawl: single-claimant reference-semantics
  simulator producing the golden trace (FIXTURES.md §5) — pops ONE url
  at a time exactly like the reference with number_of_process=1
  (PHPCrawler.class.php:649-695), using the same kernels the engine
  uses (urlkit/extract/admission semantics in pure Python).
"""

from __future__ import annotations

import numpy as np

from .config import CrawlSpec
from .functions import urlkit
from .functions.urlkit import url_md5
from .imagecodec import decode_image, encode_image, phash64
from .operators.extract import extract_meta_tags, find_links
from .operators.admission import _NOFOLLOW_LINKCODE as _NOFOLLOW_LINKCODE_PY
from .operators.admission import parse_robots_body, parse_robots_crawl_delay

__all__ = [
    "make_images",
    "make_webgraph",
    "make_redirect_webgraph",
    "make_multihost_webgraph",
    "multihost_spec",
    "default_spec",
    "redirect_spec",
    "ROBOTS_FIXTURE",
    "simulate_reference_crawl",
    "webgraph_df",
]

CAPTIONS = [
    "A quiet harbor at dawn",
    "证券监督管理委员会公告",  # CJK caption case (input_hint)
    "Steam engine no. 4014 leaving the yard",
    "国务院关于促进信息消费的若干意见",
    "Aerial view of braided river delta",
    "Handwritten ledger, 1907",
]


def make_image_array(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB content: cycle solid / gradient / noise."""
    kind = i % 3
    if kind == 0:
        rgb = [(i * 37) % 256, (i * 59) % 256, (i * 83) % 256]
        return np.full((h, w, 3), rgb, dtype=np.uint8)
    if kind == 1:
        gy = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
        gx = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        arr = np.zeros((h, w, 3), dtype=np.uint8)
        arr[:, :, 0] = gy
        arr[:, :, 1] = gx
        arr[:, :, 2] = (i * 17) % 256
        return arr
    rng = np.random.default_rng(42 + i)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def make_images(n: int = 64) -> list[dict]:
    """Rows matching the input_hint schema: image_id, bytes, w, h, fmt,
    caption, phash."""
    rows = []
    for i in range(n):
        w = 24 + (i % 5) * 8
        h = 24 + (i % 7) * 4
        fmt = "png" if i % 2 == 0 else "jpeg"
        arr = make_image_array(i, w, h)
        data = encode_image(arr, fmt)
        rows.append(
            {
                "image_id": f"img_{i:012d}",
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": CAPTIONS[i % len(CAPTIONS)],
                # input_hint: phash is over DECODED pixels — i.e. the stored
                # artifact's pixels (post-lossy), so verification is exact
                "phash": phash64(decode_image(data)),
            }
        )
    return rows


HOST = "www.site-a.test"
HOST_B = "cdn.site-a.test"       # same domain, different host
HOST_X = "www.other-b.test"      # different domain (follow-mode drops)
HOST_R = "www.site-r.test"       # redirect-bootstrap seed host (F9)
HOST_S = "www.site-s.test"       # first-content host after redirects


def _page_row(url, body: bytes | str, status=200, ctype="text/html",
              redirect_to=None, image_id=None, host=None, fail_times=0,
              retry_after=None, etag=None, last_modified=None):
    if isinstance(body, str):
        body = body.encode("utf-8")
    return {
        "url": url,
        "host": host or urlkit.split_url(url).host,
        "status": status,
        "content_type": ctype,
        "redirect_to": redirect_to,
        "body": body,
        "image_id": image_id,
        "latency_ms": 10 + (len(url) % 25),
        "fail_times": fail_times,
        # throttle fixtures (429/503): the server's Retry-After seconds
        "retry_after": retry_after,
        # conditional-GET fixtures: validators the server would send
        "etag": etag,
        "last_modified": last_modified,
    }


def webgraph_df(spark, pages: list[dict]):
    """Fixture web rows → the SyntheticFetcher's webgraph DataFrame.
    Validator columns (etag / last_modified) appear only when some page
    declares one, so non-conditional fixture schemas are unchanged."""
    extra = [
        k for k in ("etag", "last_modified")
        if any(p.get(k) is not None for p in pages)
    ]
    return spark.createDataFrame(
        [
            (p["url"], p["host"], p["status"], p["content_type"],
             p["redirect_to"], bytearray(p["body"]), p["image_id"],
             p["latency_ms"], p.get("fail_times", 0), p.get("retry_after"),
             *[p.get(k) for k in extra])
            for p in pages
        ],
        "url string, host string, status int, content_type string, "
        "redirect_to string, body binary, image_id string, latency_ms int, "
        "fail_times int, retry_after int"
        + "".join(f", {k} string" for k in extra),
    )


def make_webgraph(n_lists: int = 3, details_per_list: int = 4,
                  images: list[dict] | None = None) -> list[dict]:
    """Rows: url, host, status, content_type, redirect_to, body(bytes),
    image_id, latency_ms. Deterministic HTML exercising all three
    link-finder passes + pagination + redirects + dupes."""
    images = images if images is not None else make_images(n_lists * details_per_list * 2)
    pages: list[dict] = []

    def page(url, body: bytes | str, status=200, ctype="text/html",
             redirect_to=None, image_id=None, host=None):
        pages.append(_page_row(url, body, status, ctype, redirect_to,
                               image_id, host))

    root = f"http://{HOST}"
    # seed root: links to list pages + a redirect + cross-host + deny-ext
    root_html = ["<html><head><title>root</title></head><body>"]
    for li in range(n_lists):
        root_html.append(f'<a href="/list{li}/index_0.htm">List {li}</a>')
    root_html.append('<a href="/moved/old.htm">old location</a>')
    root_html.append(f'<a href="http://{HOST_X}/offsite.htm">offsite</a>')
    root_html.append('<a href="/style/app.css">styles</a>')  # ext deny rule
    root_html.append('<a href="javascript:void(0)">js</a>')
    root_html.append('<a href="/list0/index_0.htm">duplicate raw</a>')
    root_html.append("</body></html>")
    page(root, "".join(root_html))

    # redirect chain: /moved/old.htm -> 301 -> /moved/new.htm (content)
    page(
        f"http://{HOST}/moved/old.htm",
        "",
        status=301,
        redirect_to=f"http://{HOST}/moved/new.htm",
    )
    page(f"http://{HOST}/moved/new.htm",
         "<html><body>arrived <a href='/list0/index_0.htm'>back</a></body></html>")

    img_i = 0
    for li in range(n_lists):
        ldir = f"http://{HOST}/list{li}/"
        # pagination: page 0 advertises countPage=N via JS counter
        n_pages = 2 + (li % 2)
        for pi in range(n_pages):
            body = [f"<html><body><script>var countPage = {n_pages}</script>"]
            if pi == 0:
                body.append(f"<script>var countPage = {n_pages}</script>")
            for di in range(details_per_list):
                body.append(
                    f'<a href="detail_{pi}_{di}.htm">Detail {li}-{pi}-{di}</a>'
                )
            # second pass fodder + off-site image host (same domain)
            body.append(f'<img src="http://{HOST_B}/banner{li}.png">')
            body.append("</body></html>")
            page(f"{ldir}index_{pi}.htm", "".join(body))
            for di in range(details_per_list):
                img = images[img_i % len(images)]
                img_i += 1
                detail = (
                    "<html><head><meta name='keywords' content='fixture'>"
                    f"</head><body><h1>Doc {li}-{pi}-{di}</h1>"
                    f'<img src="/img/{img["image_id"]}.{img["fmt"]}">'
                    f"<p>{img['caption']}</p>"
                    f'<p><a href="index_{pi}.htm">back</a></p>'
                    "</body></html>"
                )
                page(f"{ldir}detail_{pi}_{di}.htm", detail)

    # image binaries (unique set — lists may reuse an image id)
    seen_img = set()
    for img in images:
        url = f"http://{HOST}/img/{img['image_id']}.{img['fmt']}"
        if url not in seen_img:
            seen_img.add(url)
            page(url, img["bytes"], ctype=f"image/{img['fmt']}",
                 image_id=img["image_id"])

    # banner images on HOST_B (host-mode filtering fodder)
    for li in range(n_lists):
        arr = make_image_array(1000 + li, 32, 16)
        page(f"http://{HOST_B}/banner{li}.png", encode_image(arr, "png"),
             ctype="image/png")

    # deep branch for depth-overflow + robots-denied area
    page(f"http://{HOST}/style/app.css", "body{}", ctype="text/css")
    page(f"http://{HOST_X}/offsite.htm", "<a href='x.htm'>x</a>")
    page(f"http://{HOST}/private/secret.htm", "<html><body>deny me</body></html>")
    return pages


ROBOTS_FIXTURE = [
    (HOST, "User-agent: *\nDisallow: /private/\n"),
    (HOST_B, "User-agent: specialbot\nDisallow: /\n"),  # not our UA
]


def default_spec(max_depth: int = 4, budget: int = 1, **kw) -> CrawlSpec:
    return CrawlSpec(
        seeds=[f"http://{HOST}"],
        follow_mode=1,  # domain
        max_depth=max_depth,
        url_filter_rules=[r"#\.(css|js)$# i"],
        obey_robots_txt=True,
        crawl_delay_s=5.0,
        round_duration_s=5.0 * budget,
        **kw,
    )


def make_redirect_webgraph() -> list[dict]:
    """F9/F3/P9 fixture web: the seed 301→302-chains ACROSS DOMAINS to
    the first content page (bootstrap must bypass follow-mode and re-base
    the filter there — PHPCrawler.class.php:800-823), which then links to
    a meta-nofollow page (page-level F3), a rel=nofollow link (link-level
    F3), a flaky page (1 failed attempt → n_attempts=2), a dead page
    (exhausts the retry budget → status 0), a post-bootstrap redirect,
    and a link back to the SEED's domain that the re-based follow-mode
    must now drop."""
    P = _page_row
    landing = f"http://{HOST_S}/landing.htm"
    return [
        # bootstrap chain (no 200 until landing)
        P(f"http://{HOST_R}", "", status=301, ctype="text/plain",
          redirect_to=f"http://{HOST_R}/hop1.htm"),
        P(f"http://{HOST_R}/hop1.htm", "", status=302, ctype="text/plain",
          redirect_to=landing),
        P(
            landing,
            "<html><head><title>Landing</title></head><body>"
            '<a href="/a.htm">A page</a>'
            f'<a href="http://{HOST_R}/b.htm">back to seed domain</a>'
            '<a href="/nf.htm">nofollow page</a>'
            '<a href="/flaky.htm">flaky</a>'
            '<a href="/dead.htm">dead</a>'
            '<a href="/moved2.htm">moved</a>'
            "</body></html>",
        ),
        P(
            f"http://{HOST_S}/a.htm",
            "<html><body>"
            '<a rel="nofollow" href="/skipme.htm">skip</a>'
            '<a href="/c.htm">C</a>'
            "</body></html>",
        ),
        P(
            f"http://{HOST_S}/nf.htm",
            "<html><head><meta name='robots' content='nofollow'></head>"
            '<body><a href="/from-nf.htm">never followed</a></body></html>',
        ),
        P(f"http://{HOST_S}/flaky.htm",
          "<html><body>flaky ok</body></html>", fail_times=1),
        P(f"http://{HOST_S}/dead.htm",
          "<html><body>unreachable</body></html>", fail_times=99),
        P(f"http://{HOST_S}/moved2.htm", "", status=302, ctype="text/plain",
          redirect_to=f"http://{HOST_S}/target.htm"),
        P(f"http://{HOST_S}/target.htm", "<html><body>end</body></html>"),
        P(f"http://{HOST_S}/c.htm", "<html><body>leaf</body></html>"),
        # exist but must never be fetched
        P(f"http://{HOST_R}/b.htm", "<html><body>seed domain</body></html>"),
        P(f"http://{HOST_S}/skipme.htm", "<html><body>x</body></html>"),
        P(f"http://{HOST_S}/from-nf.htm", "<html><body>x</body></html>"),
    ]


def make_multihost_webgraph(n_hosts: int = 5, chain_len: int = 4) -> list[dict]:
    """P8 per-host-mode fixture: a hub page fans out to ``n_hosts``
    independent hosts; each host is a chain root → p1 → … → p{chain_len}
    plus a sibling page per step, so every host keeps discovering new
    work each round. With per-host budget B a steady round must fetch
    B × n_hosts pages — the property the engine's scale scheduler has to
    deliver (VERDICT r2 §What's wrong #1)."""
    P = _page_row
    pages = [
        P(
            "http://hub.m.test",
            "<html><body>"
            + "".join(
                f'<a href="http://www.m{h}.test/">host {h}</a>'
                for h in range(n_hosts)
            )
            + "</body></html>",
        )
    ]
    for h in range(n_hosts):
        root = f"http://www.m{h}.test"
        pages.append(
            P(root,
              f'<html><body><a href="/p1.htm">start</a>'
              f'<a href="/s0.htm">side</a></body></html>')
        )
        for i in range(1, chain_len + 1):
            nxt = (
                f'<a href="/p{i + 1}.htm">next</a>' if i < chain_len else ""
            )
            pages.append(
                P(f"{root}/p{i}.htm",
                  f'<html><body>{nxt}<a href="/s{i}.htm">side</a></body></html>')
            )
        for i in range(0, chain_len + 1):
            pages.append(
                P(f"{root}/s{i}.htm", "<html><body>leaf</body></html>")
            )
    return pages


def make_skewed_webgraph(
    n_small: int = 3,
    mega_branches: int = 9,
    leaves_per_branch: int = 10,
) -> list[dict]:
    """Host-skew fixture (SURVEY §4, north_rule "skew handled explicitly"):
    one mega host `www.mega.test` holds ≥90% of all pages — a hub fans out
    to the mega root plus `n_small` two-page hosts; the mega root fans out
    to `mega_branches` branch pages, each linking `leaves_per_branch`
    leaves. The mega frontier backlog (branches × leaves pending at once)
    is the shape `salted_repartition` exists to defuse: without salting
    the whole mega work-list lands in one (host)-hash partition."""
    P = _page_row
    mega = "http://www.mega.test"
    pages = [
        P(
            "http://hub.skew.test",
            "<html><body>"
            + f'<a href="{mega}/">mega</a>'
            + "".join(
                f'<a href="http://www.sm{h}.test/">small {h}</a>'
                for h in range(n_small)
            )
            + "</body></html>",
        ),
        P(
            f"{mega}",
            "<html><body>"
            + "".join(
                f'<a href="/b{b}.htm">branch {b}</a>'
                for b in range(mega_branches)
            )
            + "</body></html>",
        ),
    ]
    for b in range(mega_branches):
        pages.append(
            P(
                f"{mega}/b{b}.htm",
                "<html><body>"
                + "".join(
                    f'<a href="/b{b}l{i}.htm">leaf {i}</a>'
                    for i in range(leaves_per_branch)
                )
                + "</body></html>",
            )
        )
        for i in range(leaves_per_branch):
            pages.append(P(f"{mega}/b{b}l{i}.htm", "<html><body>leaf</body></html>"))
    for h in range(n_small):
        root = f"http://www.sm{h}.test"
        pages.append(
            P(root, '<html><body><a href="/only.htm">one</a></body></html>')
        )
        pages.append(P(f"{root}/only.htm", "<html><body>leaf</body></html>"))
    return pages


def multihost_spec(per_host_budget: int = 2, **kw) -> CrawlSpec:
    return CrawlSpec(
        seeds=["http://hub.m.test"],
        follow_mode=0,  # any: the whole point is many hosts in flight
        max_depth=16,
        per_host_politeness=True,
        crawl_delay_s=5.0,
        round_duration_s=5.0 * per_host_budget,
        follow_redirects_till_content=False,
        **kw,
    )


def redirect_spec(budget: int = 1) -> CrawlSpec:
    return CrawlSpec(
        seeds=[f"http://{HOST_R}"],
        follow_mode=1,
        max_depth=6,
        obey_nofollow=True,
        retry_limit=3,
        crawl_delay_s=5.0,
        round_duration_s=5.0 * budget,
    )


HOST_SM = "www.site-sm.test"
_SM_ROOT = f"http://{HOST_SM}"

SITEMAP_ROBOTS_FIXTURE = [(HOST_SM, f"""User-agent: *
Disallow: /private
Sitemap: {_SM_ROOT}/sitemap_index.xml
Sitemap: {_SM_ROOT}/extra.xml
""")]


def make_sitemap_webgraph(with_robots_page: bool = False) -> list[dict]:
    """Sitemap-bootstrap fixture (spec.ingest_sitemaps): a robots body
    with two `Sitemap:` directives — one <sitemapindex> (child
    recursion, including a NESTED index that must be ignored) and one
    plain <urlset>. Exercises: relative <loc> (C3), robots-disallowed
    loc (F8), cross-domain loc (F4), duplicate loc, seed duplicate."""
    r = _SM_ROOT
    xml = "application/xml"
    sitemap_index = (
        "<?xml version=\"1.0\"?>\n<sitemapindex>\n"
        f"  <sitemap><loc>{r}/sm1.xml</loc></sitemap>\n"
        f"  <sitemap><loc>{r}/sm_nested.xml</loc></sitemap>\n"
        "</sitemapindex>\n"
    )
    sm1 = (
        "<?xml version=\"1.0\"?>\n<urlset>\n"
        f"  <url><loc>{r}/a.html</loc><priority>0.9</priority></url>\n"
        "  <url><loc>/b.html</loc></url>\n"
        f"  <url><loc>{r}/private/secret.html</loc></url>\n"
        "  <url><loc>http://www.other-dom.test/x.html</loc></url>\n"
        f"  <url><loc>{r}/a.html</loc></url>\n"
        "</urlset>\n"
    )
    sm_nested = (
        "<?xml version=\"1.0\"?>\n<sitemapindex>\n"
        f"  <sitemap><loc>{r}/sm_deep.xml</loc></sitemap>\n"
        "</sitemapindex>\n"
    )
    sm_deep = (
        "<?xml version=\"1.0\"?>\n<urlset>\n"
        f"  <url><loc>{r}/never.html</loc></url>\n"
        "</urlset>\n"
    )
    extra = (
        "<?xml version=\"1.0\"?>\n<urlset>\n"
        f"  <url><loc>{r}/d.html</loc></url>\n"
        f"  <url><loc>{r}/</loc></url>\n"
        "</urlset>\n"
    )
    pages = [
        # keyed at the NORMALIZED seed URL (C2 drops the bare "/")
        _page_row(r, "<html><a href='/linked.html'>go</a></html>"),
        _page_row(f"{r}/linked.html", "<html>leaf</html>"),
        _page_row(f"{r}/sitemap_index.xml", sitemap_index, ctype=xml),
        _page_row(f"{r}/sm1.xml", sm1, ctype=xml),
        _page_row(f"{r}/sm_nested.xml", sm_nested, ctype=xml),
        _page_row(f"{r}/sm_deep.xml", sm_deep, ctype=xml),
        _page_row(f"{r}/extra.xml", extra, ctype=xml),
        _page_row(f"{r}/a.html", "<html>a</html>"),
        _page_row(f"{r}/b.html", "<html>b</html>"),
        _page_row(f"{r}/d.html", "<html>d</html>"),
        _page_row(f"{r}/never.html", "<html>never</html>"),
        _page_row(f"{r}/private/secret.html", "<html>s</html>"),
        _page_row("http://www.other-dom.test/x.html", "<html>x</html>"),
    ]
    if with_robots_page:
        pages.append(_page_row(
            f"{r}/robots.txt", SITEMAP_ROBOTS_FIXTURE[0][1],
            ctype="text/plain",
        ))
    return pages


def sitemap_spec(**kw) -> CrawlSpec:
    return CrawlSpec(
        seeds=[f"{_SM_ROOT}/"],
        max_depth=2,
        obey_robots_txt=True,
        ingest_sitemaps=True,
        **kw,
    )


HOST_RV = "www.site-rv.test"
_RV_ROOT = f"http://{HOST_RV}"


def make_revisit_webgraph() -> list[dict]:
    """P7-revisit fixture: a /list/ page (matches the revisit rule)
    linking two details, plus a non-matching about page."""
    r = _RV_ROOT
    return [
        _page_row(
            r,
            "<html><a href='/list/index.htm'>list</a>"
            "<a href='/about.htm'>about</a></html>",
        ),
        _page_row(
            f"{r}/list/index.htm",
            "<html><a href='/d1.htm'>one</a>"
            "<a href='/d2.htm'>two</a></html>",
        ),
        _page_row(f"{r}/about.htm", "<html>about</html>"),
        _page_row(f"{r}/d1.htm", "<html>d1</html>"),
        _page_row(f"{r}/d2.htm", "<html>d2</html>"),
    ]


def revisit_spec(**kw) -> CrawlSpec:
    return CrawlSpec(
        seeds=[_RV_ROOT],
        max_depth=3,
        revisit_url_rules=[r"#/list/# i"],
        revisit_after_rounds=2,
        max_revisits=1,
        **kw,
    )


HOST_TTL = "www.site-ttl.test"


def make_ttl_webgraph() -> list[dict]:
    """Frontier-TTL fixture: one root fanning out to six details, budget
    1/round — with frontier_ttl_rounds=3 the oldest unfetched details
    expire before their turn (d4/d5 age past 3 by rounds 6-7)."""
    root = f"http://{HOST_TTL}"
    links = "".join(f"<a href='/d{i}.htm'>d{i}</a>" for i in range(6))
    pages = [_page_row(root, f"<html>{links}</html>")]
    for i in range(6):
        pages.append(_page_row(f"{root}/d{i}.htm", f"<html>d{i}</html>"))
    return pages


def ttl_spec(**kw) -> CrawlSpec:
    kw.setdefault("frontier_ttl_rounds", 3)
    return CrawlSpec(
        seeds=[f"http://{HOST_TTL}"],
        max_depth=2,
        **kw,
    )


HOST_CG = "www.site-cg.test"
_CG_ROOT = f"http://{HOST_CG}"


def make_conditional_webgraph() -> list[dict]:
    """Conditional-GET fixture: three revisit-matching /list/ pages —
    one with an ETag (revisit answers 304 via If-None-Match), one with
    only Last-Modified (304 via If-Modified-Since), one with neither
    (every revisit is a full 200 refetch) — plus a detail page outside
    the revisit rule."""
    r = _CG_ROOT
    return [
        _page_row(
            r,
            "<html><a href='/list/a.htm'>a</a>"
            "<a href='/list/b.htm'>b</a>"
            "<a href='/list/c.htm'>c</a></html>",
        ),
        _page_row(
            f"{r}/list/a.htm",
            "<html><a href='/d1.htm'>one</a></html>",
            etag='"v1"',
        ),
        _page_row(f"{r}/list/b.htm", "<html>no validators</html>"),
        _page_row(
            f"{r}/list/c.htm",
            "<html>lm only</html>",
            last_modified="Mon, 01 Jan 2024 00:00:00 GMT",
        ),
        _page_row(f"{r}/d1.htm", "<html>d1</html>"),
    ]


HOST_BB_BIG = "big.site-bb.test"
HOST_BB_SMALL = "small.site-bb.test"


def make_bytebudget_webgraph() -> list[dict]:
    """Bandwidth-politeness fixture: a heavy host (≈2 KB pages) and a
    light host (≈40 B pages), each a root linking five details. With
    host_byte_budget=3000 the heavy host's budget collapses to 1/round
    after the first observation while the light host keeps the full
    per-host budget."""
    pages = []
    for host, pad in ((HOST_BB_BIG, 2000), (HOST_BB_SMALL, 8)):
        root = f"http://{host}"
        links = "".join(
            f"<a href='/d{i}.htm'>d{i}</a>" for i in range(5)
        )
        pages.append(_page_row(root, f"<html>{links}</html>"))
        for i in range(5):
            body = "<html>" + ("x" * pad) + f"d{i}</html>"
            pages.append(_page_row(f"{root}/d{i}.htm", body))
    return pages


def bytebudget_spec(**kw) -> CrawlSpec:
    kw.setdefault("host_byte_budget", 3000)
    return CrawlSpec(
        seeds=[f"http://{HOST_BB_BIG}", f"http://{HOST_BB_SMALL}"],
        follow_mode=0,  # two seed hosts in one crawl
        max_depth=2,
        per_host_politeness=True,
        crawl_delay_s=5.0,
        round_duration_s=15.0,  # per-host budget 3
        **kw,
    )


def make_combined_webgraph() -> list[dict]:
    """Feature-interaction fixture: the heavy/light byte-budget web
    with ETags on the heavy host's detail pages — so ONE crawl can
    exercise conditional revisits, byte-derived budgets, frontier TTL
    and lifetime quotas simultaneously."""
    pages = make_bytebudget_webgraph()
    for p in pages:
        if HOST_BB_BIG in p["url"] and "/d" in p["url"]:
            p["etag"] = '"v-' + p["url"][-6:] + '"'
    return pages


def combined_spec(**kw) -> CrawlSpec:
    """All four round-4 politeness/recrawl dims on at once."""
    kw.setdefault("revisit_url_rules", [r"#/d\d# i"])
    kw.setdefault("revisit_after_rounds", 2)
    kw.setdefault("max_revisits", 1)
    kw.setdefault("conditional_get", True)
    kw.setdefault("frontier_ttl_rounds", 8)
    kw.setdefault("host_page_cap", 10)
    return bytebudget_spec(**kw)


def conditional_spec(**kw) -> CrawlSpec:
    kw.setdefault("conditional_get", True)
    return CrawlSpec(
        seeds=[_CG_ROOT],
        max_depth=3,
        revisit_url_rules=[r"#/list/# i"],
        revisit_after_rounds=2,
        max_revisits=1,
        **kw,
    )


def simulate_reference_crawl(
    webgraph: list[dict],
    spec: CrawlSpec,
    robots: list[tuple[str, str]] | None = None,
    max_pops: int = 10_000,
) -> list[dict]:
    """Single-claimant reference-semantics crawl → golden trace rows:
    (seq, url, url_md5, depth, referer, priority_level, status,
    n_attempts, final_seen). Pops strictly one URL at a time with
    frontier re-ranking between pops — byte-identical to the reference's
    number_of_process=1 behavior under the deterministic ordering
    contract (priority DESC, insert_seq ASC).

    With ``spec.per_host_politeness`` the simulator switches to the
    engine's per-host round contract instead: each round claims the top
    budget_per_round rows PER HOST and serializes the batch by the
    deterministic host interleave (pop_rank ASC, priority DESC,
    insert_seq ASC) — the scale generalization of the reference's global
    budget (PHPCrawler.class.php:906-925, SURVEY §2.5 P8).

    Models, like the engine: the inline retry loop P9 (fail_times
    failures then success; retry on error or status >400/<100 —
    PHPCrawler.class.php:735-751), and the F9 redirect-only bootstrap
    with filter re-basing (keepRedirectUrls bypasses ALL admission
    checks; the first 200 page becomes the follow-mode base —
    PHPCrawler.class.php:800-823).
    """
    import re as _re

    from .config import php_regex_to_std

    web = {p["url"]: p for p in webgraph}
    robots = robots if robots is not None else []
    deny_prefixes: list[str] = []
    host_budgets: dict[str, int] = {}
    if spec.obey_robots_txt:
        for host, body in robots:
            deny_prefixes += parse_robots_body(body, spec.user_agent, f"http://{host}")
            if spec.honor_crawl_delay:
                d = parse_robots_crawl_delay(body, spec.user_agent)
                if d is not None:
                    host_budgets[host] = spec.budget_for_delay(d)

    state = {"base_parts": urlkit.split_url(spec.seeds[0]),
             "first_content_url": None}
    url_deny = [_re.compile(php_regex_to_std(r)) for r in spec.url_filter_rules]
    lt_deny = [_re.compile(php_regex_to_std(r)) for r in spec.linktext_filter_rules]
    url_allow = [_re.compile(php_regex_to_std(r)) for r in spec.url_follow_rules]
    lt_allow = [_re.compile(php_regex_to_std(r)) for r in spec.linktext_follow_rules]
    prio_rules = [
        (_re.compile(php_regex_to_std(p)), lvl)
        for p, lvl in sorted(spec.priority_rules, key=lambda r: -r[1])
    ]

    def priority(url: str) -> int:
        for rx, lvl in prio_rules:
            if rx.search(url):
                return lvl
        return 0

    def admit(link: dict, depth: int, page_nofollow: bool) -> bool:
        u = link["url"]
        start_parts = state["base_parts"]
        if not (u.startswith("http://") or u.startswith("https://")):
            return False
        if spec.max_depth is not None and depth > spec.max_depth:
            return False
        if spec.obey_nofollow and page_nofollow:
            return False
        if spec.obey_nofollow and _re.match(
            _NOFOLLOW_LINKCODE_PY, link.get("linkcode") or ""
        ):
            return False
        parts = urlkit.split_url(u)
        if spec.follow_mode >= 1 and parts.domain != start_parts.domain:
            return False
        if spec.follow_mode >= 2:
            sh = _re.sub(r"^www\.", "", start_parts.host)
            if _re.sub(r"^www\.", "", parts.host) != sh:
                return False
        if spec.follow_mode == 3:
            if parts.protocol != start_parts.protocol:
                return False
            if not parts.path.startswith(start_parts.path):
                return False
        for rx in url_deny:
            if rx.search(u):
                return False
        for rx in lt_deny:
            if rx.search(link["linktext"] or ""):
                return False
        if url_allow or lt_allow:
            ok = any(rx.search(u) for rx in url_allow) or any(
                rx.search(link["linktext"] or "") for rx in lt_allow
            )
            if not ok:
                return False
        for p in deny_prefixes:
            if u.startswith(p):
                return False
        if spec.drop_traps:
            from .operators.traps import is_trap_py

            if is_trap_py(u):
                return False
        return True

    # frontier rows: dicts keyed by md5; state mirrors the urls table
    frontier: list[dict] = []
    seen: set[str] = set()
    insert_seq = 0

    # engine-equivalent packed insertion round for the frontier-TTL
    # mirror: 0 during seeding/sitemap bootstrap, r+1 for links pushed
    # while round r runs (CrawlEngine packs (r+1)<<40 into insert_seq)
    cur_ins_round = [0]

    def push(url, depth, referer):
        nonlocal insert_seq
        k = url_md5(url)
        if k in seen:
            return
        seen.add(k)
        frontier.append(
            {
                "url": url,
                "url_md5": k,
                "host": urlkit.split_url(url).host,
                "depth": depth,
                "referer": referer,
                "priority_level": priority(url),
                "insert_seq": insert_seq,
                "ins_round": cur_ins_round[0],
                "done": False,
            }
        )
        insert_seq += 1

    for i, s in enumerate(spec.seeds):
        norm = urlkit.normalize_url(s)
        push(norm, 0 if i == 0 else 1, None)

    if spec.ingest_sitemaps:
        # sitemap bootstrap mirror of CrawlEngine._sitemap_frontier:
        # robots `Sitemap:` directives (fixture order) → fetch from the
        # web dict → parse (one level of <sitemapindex> recursion) →
        # <loc> entries resolved (C3) through the FULL admission battery
        # at depth 1, pushed in discovery order right after the seeds
        _SM_DIRECTIVE = r"(?im)^[ \t]*sitemap:[ \t]*(\S+)"
        sm_seen: set[str] = set()
        wave0: list[str] = []
        for _h, body in robots:
            for m in _re.finditer(_SM_DIRECTIVE, body):
                u = m.group(1)
                if u not in sm_seen:
                    sm_seen.add(u)
                    wave0.append(u)

        def _sm_body(u: str) -> str | None:
            p = web.get(u)
            if (
                p is None or p["status"] != 200 or p["body"] is None
                or (p.get("fail_times", 0) or 0) >= spec.retry_limit
            ):
                return None
            b = p["body"]
            return (
                b.decode("utf-8", errors="replace")
                if isinstance(b, bytes) else b
            )

        def _sm_parse(text: str) -> tuple[str, list[str]]:
            kind = (
                "index" if _re.search("<sitemapindex", text) else "urlset"
            )
            pat = (
                r"(?s)<sitemap>(.*?)</sitemap>" if kind == "index"
                else r"(?s)<url>(.*?)</url>"
            )
            locs = []
            for blk in _re.findall(pat, text):
                m = _re.search(r"(?s)<loc>\s*(.*?)\s*</loc>", blk)
                if m and m.group(1) != "":
                    locs.append(m.group(1))
            return kind, locs

        sm_entries: list[tuple[str, str]] = []
        sm_children: list[str] = []
        for u in wave0:
            text = _sm_body(u)
            if text is None:
                continue
            kind, locs = _sm_parse(text)
            if kind == "urlset":
                sm_entries += [(u, l) for l in locs]
            else:
                base = urlkit.split_url(u)
                for l in locs:
                    cu = (
                        urlkit.build_url_from_link(l, base) if base else None
                    )
                    if cu and cu not in sm_seen:
                        sm_seen.add(cu)
                        sm_children.append(cu)
        for u in sm_children:
            text = _sm_body(u)
            if text is None:
                continue
            kind, locs = _sm_parse(text)
            if kind == "urlset":  # nested index NOT followed (one level)
                sm_entries += [(u, l) for l in locs]
        for sm_url, loc in sm_entries:
            base = urlkit.split_url(sm_url)
            url = urlkit.build_url_from_link(loc, base) if base else None
            if url is None:
                continue
            if admit({"url": url, "linktext": None, "linkcode": None},
                     1, False):
                push(url, 1, sm_url)

    def select_batch(pending: list[dict]) -> list[dict]:
        """One round's pop set, in fetch order.

        Global mode: ONE row — (priority DESC, insert_seq ASC), the
        reference's sequential pop. Per-host mode (the engine's scale
        contract): top budget_per_round rows PER HOST, the whole batch
        serialized by the deterministic host interleave
        (pop_rank ASC, priority DESC, insert_seq ASC) — every host's
        first pick fetches before any host's second pick."""
        if not spec.per_host_politeness:
            return [min(pending, key=lambda f: (-f["priority_level"], f["insert_seq"]))]
        # Hamilton apportionment of a global round budget (mirrors
        # scheduler.apportion_budget: integer base = B*n_h div N, then
        # +1 to the largest remainders, ties by host name ASC), MIN-
        # combined with every other budget dim like the engine does.
        shares: dict[str, int] | None = None
        if spec.apportion_round_budget > 0:
            n_by_host: dict[str, int] = {}
            for f in pending:
                n_by_host[f["host"]] = n_by_host.get(f["host"], 0) + 1
            B, N = spec.apportion_round_budget, len(pending)
            shares = {h: B * n // N for h, n in n_by_host.items()}
            leftover = B - sum(shares.values())
            for h in sorted(n_by_host, key=lambda h: (-(B * n_by_host[h] % N), h))[:max(leftover, 0)]:
                shares[h] += 1
        counts: dict[str, int] = {}
        ranked: list[tuple] = []
        for f in sorted(pending, key=lambda f: (-f["priority_level"], f["insert_seq"])):
            k = counts.get(f["host"], 0) + 1
            counts[f["host"]] = k
            # robots Crawl-delay override (honor_crawl_delay): hosts with
            # a declared delay get budget_for_delay(D), others the default
            b = _effective_budget(f["host"])
            if shares is not None:
                b = min(b, shares.get(f["host"], 0))
            if k <= b:
                ranked.append((k, -f["priority_level"], f["insert_seq"], f))
        ranked.sort(key=lambda t: t[:3])
        return [t[3] for t in ranked]

    trace: list[dict] = []
    seq = 0
    # adaptive_latency_budgets state: host -> [n_pages, sum_ms | None],
    # updated only when a round COMPLETES (the engine derives its dim
    # from pages persisted up to r-1). sum stays None until a non-null
    # latency arrives — mirroring SQL sum() over all-null groups, where
    # the engine falls back to the default budget.
    lat_stats: dict[str, list] = {}
    # host_byte_budget state: host -> [n_pops, sum_received_bytes],
    # updated per pop (the engine counts ALL pages rows; failures
    # contribute 0 bytes), consumed at NEXT round's batch selection —
    # the engine derives its dim from pages persisted up to r-1
    byte_stats: dict[str, list] = {}
    # lifetime host quotas (host_page_cap / host_byte_cap): totals over
    # all prior pops, mirroring the engine's claimed-pages aggregate
    host_pages: dict[str, int] = {}
    host_cap_bytes: dict[str, int] = {}

    def _host_capped(host: str) -> bool:
        if spec.host_page_cap > 0 and host_pages.get(host, 0) >= spec.host_page_cap:
            return True
        if (spec.host_byte_cap > 0
                and host_cap_bytes.get(host, 0) >= spec.host_byte_cap):
            return True
        return False

    recv_rules_std = [
        _re.compile(php_regex_to_std(x))
        for x in spec.content_type_receive_rules
    ]

    def _effective_budget(host: str) -> int:
        b = host_budgets.get(host, spec.budget_per_round)
        if spec.adaptive_latency_budgets and host in lat_stats:
            n, sm = lat_stats[host]
            if sm is not None and sm > 0:
                ab = min(
                    spec.budget_per_round,
                    max(1, (int(spec.round_duration_s * 1000) * n) // sm),
                )
            else:
                ab = spec.budget_per_round
            b = min(b, ab)
        if spec.host_byte_budget > 0 and host in byte_stats:
            n, sb = byte_stats[host]
            if sb > 0:
                cap = min(
                    spec.budget_per_round,
                    max(1, (spec.host_byte_budget * n) // sb),
                )
            else:
                cap = spec.budget_per_round
            b = min(b, cap)
        return b
    # retry_after_backoff state: host -> (throttle_round, retry_after|None),
    # keeping the LATEST throttled round (ties: larger retry_after) —
    # mirrors the engine's max(struct(round, retry_after)) aggregate
    throttled_hosts: dict[str, tuple[int, int | None]] = {}
    round_idx = 0

    def _backoff_rounds(ra: int | None) -> int:
        import math as _math

        if ra is None:
            return spec.default_backoff_rounds
        return int(_math.ceil(ra / spec.round_duration_s))

    def _host_blocked(host: str) -> bool:
        if not spec.retry_after_backoff or host not in throttled_hosts:
            return False
        t_round, ra = throttled_hosts[host]
        return round_idx <= t_round + _backoff_rounds(ra)

    def _process_pop(nxt: dict) -> None:
        nonlocal seq
        nxt["done"] = True
        p = web.get(nxt["url"])
        # P9 inline retry, closed form (mirrors SyntheticFetcher): the
        # first fail_times attempts error out; retry also on status
        # >400/<100; unknown URL == connection error (status 0)
        raw_status = p["status"] if p else 0
        # conditional revalidation mirror (SyntheticFetcher not_mod):
        # a validator match on a would-be-2xx page answers 304 with no
        # body; If-None-Match takes precedence over If-Modified-Since
        if spec.conditional_get and p and 200 <= raw_status <= 299:
            inm = nxt.get("if_none_match")
            ims = nxt.get("if_modified_since")
            if inm is not None:
                # RFC 9110 §13.1.2: If-None-Match present -> evaluate it
                # ALONE (If-Modified-Since MUST be ignored), even when
                # the page serves no ETag to match against
                if p.get("etag") is not None and inm == p["etag"]:
                    raw_status = 304
            elif ims is not None and p.get("last_modified") is not None:
                if ims == p["last_modified"]:
                    raw_status = 304
        fail_times = (p.get("fail_times", 0) if p else 0) or 0
        exhausted = fail_times >= spec.retry_limit
        status = 0 if exhausted else raw_status
        invalid = status < 100 or status > 400
        n_attempts = spec.retry_limit if invalid else fail_times + 1
        trace.append(
            {
                "seq": seq,
                "url": nxt["url"],
                "url_md5": nxt["url_md5"],
                "depth": nxt["depth"],
                "referer": nxt["referer"],
                "priority_level": nxt["priority_level"],
                "status": status,
                "n_attempts": n_attempts,
            }
        )
        seq += 1
        if spec.retry_after_backoff and status in (429, 503):
            ra = p.get("retry_after") if p else None
            prev = throttled_hosts.get(nxt["host"])
            cand = (round_idx, ra)
            # latest round wins; within a round the larger declared wait
            # (None sorts lowest) — the engine's max(struct(...)) order
            if prev is None or (cand[0], -1 if cand[1] is None else cand[1]) > (
                prev[0], -1 if prev[1] is None else prev[1]
            ):
                throttled_hosts[nxt["host"]] = cand
        if spec.host_byte_budget > 0 or spec.host_byte_cap > 0:
            ct = (p["content_type"] or "") if p else ""
            received = (
                not exhausted and p is not None and 200 <= status <= 299
                and any(rx.search(ct) for rx in recv_rules_std)
            )
            nbytes = (
                len(p["body"]) if received and p["body"] is not None else 0
            )
            if spec.host_byte_budget > 0:
                st = byte_stats.setdefault(nxt["host"], [0, 0])
                st[0] += 1
                st[1] += nbytes
            if spec.host_byte_cap > 0:
                host_cap_bytes[nxt["host"]] = (
                    host_cap_bytes.get(nxt["host"], 0) + nbytes
                )
        if spec.host_page_cap > 0:
            host_pages[nxt["host"]] = host_pages.get(nxt["host"], 0) + 1
        if p is None or exhausted:
            return
        # body only when received (status 2xx + html), like the engine's
        # F10/F11 gate; redirect links come from the header regardless
        is_html = "text/html" in (p["content_type"] or "")
        body = (
            p["body"].decode("utf-8", errors="replace")
            if is_html and 200 <= status <= 299
            else None
        )
        redirect = p["redirect_to"] if 300 <= status < 400 else None
        links = find_links(
            body,
            nxt["url"],
            aggressive=spec.aggressive_link_search,
            redirect_location=redirect,
        )
        # E17 pagination feeds (addFeed: depth 0, NO admission, inserted
        # BEFORE this page's own links — PHPCrawler.class.php:392-399)
        if body:
            for pattern, template in spec.pagination_rules:
                m = _re.search(pattern, body)
                if not m:
                    continue
                n = int(m.group(1))
                base_dir = _re.match(r"^(.*/)[^/]*$", nxt["url"])
                if n > 1 and base_dir:
                    for i in range(1, n):
                        push(base_dir.group(1) + template.replace("{i}", str(i)),
                             0, nxt["url"])

        bootstrapping = (
            spec.follow_redirects_till_content
            and state["first_content_url"] is None
        )
        if bootstrapping:
            if status == 200:
                # first content page: re-base the filter here and fall
                # through to normal admission (PHPCrawler:806-812)
                state["first_content_url"] = nxt["url"]
                state["base_parts"] = urlkit.split_url(nxt["url"])
            else:
                # keepRedirectUrls: redirects only, depth handed back,
                # ALL other admission checks bypassed (URLFilter:121-135)
                for link in links:
                    if link["is_redirect"]:
                        push(link["url"], nxt["depth"], nxt["url"])
                return
        page_nofollow = False
        if spec.obey_nofollow and body:
            page_nofollow = "nofollow" in extract_meta_tags(body).get("robots", "")
        for link in links:
            depth = nxt["depth"] + 1
            if admit(link, depth, page_nofollow):
                push(link["url"], depth, nxt["url"])

    # P7 revisit mirror (CrawlEngine._revisit_candidates): url_md5 ->
    # {row: first-fetch attrs, n: fetches, last: last fetch round}
    revisit_rules = [
        _re.compile(php_regex_to_std(x)) for x in spec.revisit_url_rules
    ]
    fetch_hist: dict[str, dict] = {}

    def _record_fetch(nxt: dict) -> None:
        if not revisit_rules or not any(
            rx.search(nxt["url"]) for rx in revisit_rules
        ):
            return
        h = fetch_hist.get(nxt["url_md5"])
        if h is None:
            h = fetch_hist[nxt["url_md5"]] = {
                "row": {
                    k: nxt[k]
                    for k in ("url", "url_md5", "host", "depth",
                              "referer", "priority_level", "insert_seq")
                },
                "n": 1,
                "last": round_idx,
            }
        else:
            h["n"] += 1
            h["last"] = round_idx
        if spec.conditional_get:
            # the engine keeps the latest NON-NULL validator per family
            # (max(struct(seq, v)) over non-null v): a response that
            # omits a validator must not erase the stored one
            p = web.get(nxt["url"])
            dead = ((p.get("fail_times", 0) if p else 0) or 0) >= spec.retry_limit
            new_etag = p.get("etag") if p and not dead else None
            new_lm = p.get("last_modified") if p and not dead else None
            if new_etag is not None:
                h["etag"] = new_etag
            if new_lm is not None:
                h["lm"] = new_lm

    round_idx = 1  # engine rounds start at 1 (round 0 = seeding)
    while seq < max_pops and round_idx < 100_000:
        pending = [f for f in frontier if not f["done"]]
        if spec.frontier_ttl_rounds > 0:
            pending = [
                f for f in pending
                if round_idx - f["ins_round"] <= spec.frontier_ttl_rounds
            ]
        if revisit_rules:
            for h in fetch_hist.values():
                if (
                    h["n"] <= spec.max_revisits
                    and round_idx - h["last"] >= spec.revisit_after_rounds
                ):
                    row = dict(
                        h["row"],
                        insert_seq=(1 << 61) + h["row"]["insert_seq"],
                        done=False,
                    )
                    if spec.conditional_get:
                        row["if_none_match"] = h.get("etag")
                        row["if_modified_since"] = h.get("lm")
                    pending.append(row)
        if spec.host_page_cap > 0 or spec.host_byte_cap > 0:
            # lifetime quotas: capped hosts drop out of pending for
            # good (the engine filters before its cooldown capture, so
            # an all-capped frontier shares the idle/drain semantics
            # below — including the engine's revisit-budget idle)
            pending = [f for f in pending if not _host_capped(f["host"])]
        if not pending:
            if revisit_rules and any(
                h["n"] <= spec.max_revisits
                and not _host_capped(h["row"]["host"])
                for h in fetch_hist.values()
            ):
                round_idx += 1  # idle: revisits still maturing
                continue
            break
        # retry_after_backoff: hosts inside their declared (or default)
        # backoff window sit the round out; if EVERY pending host is
        # blocked this is an idle politeness round — advance the clock
        eligible = [f for f in pending if not _host_blocked(f["host"])]
        if not eligible:
            round_idx += 1
            continue
        # batch membership freezes BEFORE any of the round's fetches —
        # links pushed mid-round only become poppable next round, exactly
        # like the engine's BSP rounds
        cur_ins_round[0] = round_idx + 1
        batch = select_batch(eligible)
        if spec.request_limit:
            batch = batch[: spec.request_limit - seq]
            if not batch:
                break
        for nxt in batch:
            if seq >= max_pops:
                break
            _process_pop(nxt)
            _record_fetch(nxt)
            if spec.adaptive_latency_budgets:
                p = web.get(nxt["url"])
                lat = p.get("latency_ms") if p else None
                st = lat_stats.setdefault(nxt["host"], [0, None])
                st[0] += 1
                if lat is not None:
                    st[1] = lat if st[1] is None else st[1] + lat
        round_idx += 1

    final_seen = {t["url_md5"] for t in trace}
    for t in trace:
        t["final_seen"] = t["url_md5"] in final_seen
    return trace
