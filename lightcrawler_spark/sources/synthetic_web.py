"""Generative synthetic web: the engine-at-scale soak substrate.

The golden fixtures (fixtures.py) materialize every page as a driver-side
row and broadcast the web into each round's fetch join — perfect for
trace parity, structurally capped at ~10^3 pages. Proving the 10^10-URL
design claims (BASELINE.json north_rule: frontier anti-join, per-host
politeness, salting, compaction, resume — all at production budgets)
needs a web that is never materialized at all.

Here the web IS a function: every page is computed from its URL by pure
JVM expressions (hash-derived out-links, deterministic latency) plus one
Arrow-batched pandas UDF for image bodies — no fixture rows, no
broadcast, no driver state. `GenerativeFetcher.fetch(work)` is a narrow
`withColumns` over the round's work list, so the ONLY scale-bearing
state in a soak run is the engine's own frontier/pages tables, which is
exactly what the soak is meant to stress.

Graph shape (all parameters in `SynthWebSpec`):

- article node ids 0..n_nodes-1; node X lives at
  ``http://h{H(X)}.test/p{X}`` where H(X) = pmod(xxhash64(X, seed+1),
  n_hosts) — or host 0 for `skew_pct`% of nodes (the mega-host knob for
  skew soaks, SURVEY §4).
- X links to `out_degree` children C_j(X) = pmod(xxhash64(X, j, seed),
  n_nodes): a dense random digraph, so BFS from any seed set saturates
  the whole graph and every round's admitted links carry real dedup
  pressure against the grown frontier (P1 at scale).
- every `img_every`-th article embeds ``<img src=".../i{X}.png">``
  followed by a ``<p>Synthetic caption {X}</p>`` line — the proven
  detail-page markup of fixtures.make_webgraph (the reference's
  keep_img text walk, ExtractContent.class.php:264-346, keeps the
  caption the first non-empty line after the marker), so
  plans/assemble.build_image_caption_table assembles the input_hint
  image+caption product table straight from a soak run's pages, and the
  per-row invariants (caption equality, exact PNG pixel round-trip) are
  re-derivable from the image id alone.

Determinism: xxhash64 is a fixed pure function, the image synthesis is
closed-form (no RNG), and the engine's pop order is deterministic — so
two soak runs (or a crashed+resumed run vs an uninterrupted control)
must produce identical traces and URL-seen sets, which
tools/engine_soak.py asserts by fingerprint.

tests/test_synthetic_web.py pins the generative web to the materialized
path: at small N, `CrawlEngine` over `GenerativeFetcher` produces the
exact trace/frontier of `SyntheticFetcher(materialize_webgraph(...))`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..config import CrawlSpec
from .fetcher import _rlike_any, decode_body_udf

__all__ = [
    "SynthWebSpec",
    "GenerativeFetcher",
    "article_url_expr",
    "image_url_expr",
    "article_html_expr",
    "synth_image_array",
    "seed_urls",
    "materialize_webgraph",
    "soak_crawl_spec",
]


@dataclass(frozen=True)
class SynthWebSpec:
    """Parameters of the generated web (one value = one exact web)."""

    n_nodes: int                 # article pages; ids 0..n_nodes-1
    n_hosts: int = 64            # h0.test .. h{n_hosts-1}.test
    out_degree: int = 8          # links per article page
    img_every: int = 8           # every k-th article embeds an image; 0 = none
    seed: int = 7                # xxhash64 salt base
    skew_pct: int = 0            # % of article nodes pinned to host 0


# --- pure-JVM web geometry -------------------------------------------------

def _host_of(web: SynthWebSpec, node_id: Column) -> Column:
    """Host index of an article node (skew-aware)."""
    base = F.pmod(F.xxhash64(node_id, F.lit(web.seed + 1)), F.lit(web.n_hosts))
    if web.skew_pct <= 0:
        return base
    coin = F.pmod(F.xxhash64(node_id, F.lit(web.seed + 13)), F.lit(100))
    return F.when(coin < F.lit(web.skew_pct), F.lit(0).cast("long")).otherwise(base)


def _img_host_of(web: SynthWebSpec, img_id: Column) -> Column:
    """Image hosting spreads independently of the article's host (a CDN)."""
    return F.pmod(F.xxhash64(img_id, F.lit(web.seed + 101)), F.lit(web.n_hosts))


def article_url_expr(web: SynthWebSpec, node_id: Column) -> Column:
    return F.concat(
        F.lit("http://h"), _host_of(web, node_id).cast("string"),
        F.lit(".test/p"), node_id.cast("string"),
    )


def image_url_expr(web: SynthWebSpec, img_id: Column) -> Column:
    return F.concat(
        F.lit("http://h"), _img_host_of(web, img_id).cast("string"),
        F.lit(".test/i"), img_id.cast("string"), F.lit(".png"),
    )


def _child_id(web: SynthWebSpec, node_id: Column, j: int) -> Column:
    return F.pmod(F.xxhash64(node_id, F.lit(j), F.lit(web.seed)),
                  F.lit(web.n_nodes))


def article_html_expr(web: SynthWebSpec, node_id: Column) -> Column:
    """The page body of article `node_id`, as one JVM concat tree."""
    parts: list[Column] = [
        F.lit("<html><body><h1>Article "), node_id.cast("string"),
        F.lit("</h1>\n"),
    ]
    if web.img_every > 0:
        img_block = F.concat(
            F.lit('<img src="'), image_url_expr(web, node_id),
            F.lit('">\n<p>Synthetic caption '), node_id.cast("string"),
            F.lit("</p>\n"),
        )
        parts.append(
            F.when(F.pmod(node_id, F.lit(web.img_every)) == 0, img_block)
            .otherwise(F.lit(""))
        )
    for j in range(web.out_degree):
        cid = _child_id(web, node_id, j)
        # each link in its own block tag: the keep_img text walk emits
        # newlines on block boundaries only, so inline <a> text would
        # otherwise merge into the caption line above
        parts += [
            F.lit('<p><a href="'), article_url_expr(web, cid),
            F.lit(f'">child {j}</a></p>\n'),
        ]
    parts.append(F.lit("</body></html>"))
    return F.concat(*parts)


def _latency_expr(web: SynthWebSpec, any_id: Column) -> Column:
    return (F.pmod(F.xxhash64(any_id, F.lit(web.seed + 99)), F.lit(180))
            + F.lit(20)).cast("int")


# --- image synthesis (the one Arrow kernel) --------------------------------

def synth_image_array(img_id: int) -> np.ndarray:
    """Deterministic closed-form RGB content (no RNG — recomputable
    anywhere for the pixel-equality invariant). Dims vary with id so
    decode/dims checks aren't trivially constant."""
    w = 8 + (img_id % 5) * 4
    h = 8 + (img_id % 7) * 4
    gy = np.arange(h, dtype=np.uint32)[:, None]
    gx = np.arange(w, dtype=np.uint32)[None, :]
    r = (gy * 7 + img_id * 37) % 256
    g = (gx * 11 + img_id * 59) % 256
    b = (gy * gx + img_id * 83) % 256
    arr = np.empty((h, w, 3), dtype=np.uint8)
    arr[:, :, 0] = r
    arr[:, :, 1] = g
    arr[:, :, 2] = b
    return arr


@pandas_udf(T.BinaryType())
def _synth_image_bytes_udf(ids: pd.Series) -> pd.Series:
    """img_id → PNG bytes; null in (non-image row) → null out."""
    from ..imagecodec import png_encode

    out = []
    for v in ids:
        out.append(None if pd.isna(v) else png_encode(synth_image_array(int(v))))
    return pd.Series(out)


# --- the fetcher -----------------------------------------------------------

class GenerativeFetcher:
    """Fetch = compute the page from its URL. Same output contract as
    SyntheticFetcher (status/content_type/body/body_text/bytes_received/
    latency_ms/n_attempts/benchmarks/redirect_to/retry_after), but with
    NO webgraph table: a narrow projection, O(work) at any graph size.
    """

    # pure function of the URL — safe to recompute inside a fused job
    side_effect_free = True

    def __init__(self, web: SynthWebSpec, spec: CrawlSpec):
        self.web = web
        self.spec = spec
        self._exprs: dict[bool, dict] = {}

    def _output_exprs(self, has_validators: bool = False) -> dict:
        cached = self._exprs.get(has_validators)
        if cached is not None:
            return cached
        web, spec = self.web, self.spec
        url = F.col("url")
        aid = F.regexp_extract(url, r"^http://h\d+\.test/p(\d+)$", 1).try_cast("long")
        iid = F.regexp_extract(url, r"^http://h\d+\.test/i(\d+)\.png$", 1).try_cast("long")
        # a URL is "known" iff it names an in-range node AND its host
        # matches the geometry (a mangled URL 404s, like a real web)
        known_article = (
            aid.isNotNull() & (aid < F.lit(web.n_nodes))
            & (url == article_url_expr(web, aid))
        )
        if web.img_every > 0:
            known_image = (
                iid.isNotNull() & (iid < F.lit(web.n_nodes))
                & (F.pmod(iid, F.lit(web.img_every)) == 0)
                & (url == image_url_expr(web, iid))
            )
        else:
            known_image = F.lit(False)
        status = (
            F.when(known_article | known_image, F.lit(200))
            .otherwise(F.lit(404))
        )
        # deterministic per-URL validator (the synthetic web never
        # changes, so every conditional revisit revalidates — the
        # slow-changing-corpus bound of the bandwidth saving)
        etag = (
            F.when(known_article,
                   F.concat(F.lit('"a'), aid.cast("string"), F.lit('"')))
            .when(known_image,
                  F.concat(F.lit('"i'), iid.cast("string"), F.lit('"')))
        )
        not_mod = F.lit(False)
        if has_validators:
            not_mod = (
                status.between(200, 299)
                & F.col("if_none_match").isNotNull()
                & (F.col("if_none_match") == etag)
            )
            status = F.when(not_mod, F.lit(304)).otherwise(status)
        content_type = (
            F.when(known_image, F.lit("image/png"))
            .when(known_article, F.lit("text/html; charset=utf-8"))
        )
        body = (
            F.when(known_image, _synth_image_bytes_udf(F.when(known_image, iid)))
            .when(known_article, F.encode(article_html_expr(web, aid), "utf-8"))
        )
        if has_validators:
            body = F.when(~not_mod, body)
        invalid = (status < 100) | (status > 400)
        n_attempts = (
            F.when(invalid, F.lit(spec.retry_limit)).otherwise(F.lit(1))
        ).cast("int")
        lat = _latency_expr(web, F.coalesce(aid, iid, F.lit(0))).cast("double")
        benchmarks = F.create_map(
            F.lit("server_response_ms"), F.round(lat * 0.6, 3),
            F.lit("data_transfer_ms"), F.round(lat * 0.4, 3),
        )
        # F10/F11 receive gates — same projection shape as SyntheticFetcher
        ct = F.coalesce(content_type, F.lit(""))
        received = (
            status.between(200, 299)
            & _rlike_any(ct, spec.content_type_receive_rules)
        )
        exprs = {
            "status": status,
            "content_type": content_type,
            "body": body,
            "latency_ms": lat.cast("int"),
            "n_attempts": n_attempts,
            "benchmarks": benchmarks,
            "received": received,
            "bytes_received": F.when(received, F.length(body)).otherwise(F.lit(0)),
            "body_text": F.when(
                received & _rlike_any(ct, spec.link_search_content_types),
                decode_body_udf(body, content_type),
            ).otherwise(F.lit(None).cast("string")),
            "redirect_to": F.lit(None).cast("string"),
            "retry_after": F.lit(None).cast("int"),
            "etag": etag,
            "last_modified": F.lit(None).cast("string"),
        }
        self._exprs[has_validators] = exprs
        return exprs

    def fetch(self, work: DataFrame) -> DataFrame:
        return work.withColumns(
            self._output_exprs("if_none_match" in work.columns)
        )


# --- helpers for soaks & tests ---------------------------------------------

def seed_urls(spark: SparkSession, web: SynthWebSpec, n_seeds: int) -> list[str]:
    """Article URLs of nodes 0..n_seeds-1 (host hash computed by the
    same JVM expression the fetcher uses — one tiny Spark job)."""
    rows = (
        spark.range(n_seeds)
        .select(article_url_expr(web, F.col("id")).alias("u"))
        .collect()
    )
    return [r["u"] for r in rows]


def soak_crawl_spec(web: SynthWebSpec, spark: SparkSession,
                    per_host_budget: int, n_seeds: int,
                    max_rounds: int = 1000, **kw) -> CrawlSpec:
    """The production-shaped spec of a soak run: per-host politeness
    (budget B per host per round), follow-any, unbounded depth, HTML +
    image receive rules so image bodies persist for product assembly."""
    from ..config import FOLLOW_MODE_ANY

    return CrawlSpec(
        seeds=seed_urls(spark, web, n_seeds),
        follow_mode=FOLLOW_MODE_ANY,
        max_depth=None,
        follow_redirects_till_content=False,
        per_host_politeness=True,
        crawl_delay_s=1.0,
        round_duration_s=float(per_host_budget),
        content_type_receive_rules=[r"#text/html# i", r"#image/# i"],
        max_rounds=max_rounds,
        **kw,
    )


def materialize_webgraph(spark: SparkSession, web: SynthWebSpec) -> DataFrame:
    """The SAME web as explicit rows (SyntheticFetcher's input schema) —
    only viable at small N; used to pin GenerativeFetcher to the
    broadcast-join fetch path in tests."""
    ids = spark.range(web.n_nodes).select(F.col("id").cast("long").alias("id"))
    articles = ids.select(
        article_url_expr(web, F.col("id")).alias("url"),
        F.lit(200).alias("status"),
        F.lit("text/html; charset=utf-8").alias("content_type"),
        F.lit(None).cast("string").alias("redirect_to"),
        F.encode(article_html_expr(web, F.col("id")), "utf-8").alias("body"),
        _latency_expr(web, F.col("id")).alias("latency_ms"),
        F.concat(F.lit('"a'), F.col("id").cast("string"), F.lit('"'))
        .alias("etag"),
    )
    if web.img_every <= 0:
        return articles
    images = ids.filter(F.pmod(F.col("id"), F.lit(web.img_every)) == 0).select(
        image_url_expr(web, F.col("id")).alias("url"),
        F.lit(200).alias("status"),
        F.lit("image/png").alias("content_type"),
        F.lit(None).cast("string").alias("redirect_to"),
        _synth_image_bytes_udf(F.col("id")).alias("body"),
        _latency_expr(web, F.col("id")).alias("latency_ms"),
        F.concat(F.lit('"i'), F.col("id").cast("string"), F.lit('"'))
        .alias("etag"),
    )
    return articles.unionByName(images)
