"""Unit tests: CDX SURT keys, DUST dedup keys, snapshot diffing."""

from pyspark.sql import functions as F

from lightcrawler_spark.operators.diffing import snapshot_diff
from lightcrawler_spark.operators.traps import dust_key
from lightcrawler_spark.operators.warc import cdx_entries


def _surt(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return cdx_entries(df).collect()[0].surt_key


def _dust(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(dust_key(F.col("url")).alias("k")).collect()[0].k


class TestSurtKeys:
    def test_basic_and_www_strip(self, spark):
        assert _surt(spark, "https://www.example.com/a/b?x=1") == \
            "com,example)/a/b?x=1"
        assert _surt(spark, "http://example.com") == "com,example)/"

    def test_subdomains_cluster_under_host(self, spark):
        a = _surt(spark, "http://news.example.com/1")
        b = _surt(spark, "http://example.com/2")
        assert a.startswith("com,example,news)")
        assert b.startswith("com,example)")
        # lexicographic sort puts example.com and its subdomains together
        assert a.split(")")[0].startswith(b.split(")")[0])

    def test_case_folding(self, spark):
        assert _surt(spark, "HTTP://Example.COM/Path") == "com,example)/Path"


class TestDustKey:
    def test_sorts_and_strips_params(self, spark):
        assert _dust(
            spark, "HTTPS://Site.COM/a?utm_source=x&b=2&a=1&PHPSESSID=q"
        ) == "https://site.com/a?a=1&b=2"

    def test_collapses_slashes_and_drops_fragment(self, spark):
        assert _dust(spark, "http://h.test//a///b/#sec") == "http://h.test/a/b/"

    def test_bare_and_empty(self, spark):
        assert _dust(spark, "http://h.test") == "http://h.test/"
        assert _dust(spark, "http://h.test/p?") == "http://h.test/p"

    def test_idempotent(self, spark):
        urls = [
            "HTTPS://Site.COM/a?utm_source=x&b=2&a=1",
            "http://h.test//a//b?z=1&m=2#f",
            "http://h.test",
        ]
        once = [_dust(spark, u) for u in urls]
        twice = [_dust(spark, u) for u in once]
        assert once == twice


class TestSnapshotDiff:
    def test_all_four_categories(self, spark):
        old = spark.createDataFrame(
            [("u1", "h1"), ("u2", "h2"), ("u3", "h3")],
            "url string, content_md5 string")
        new = spark.createDataFrame(
            [("u2", "h2"), ("u3", "h3x"), ("u4", "h4")],
            "url string, content_md5 string")
        got = {r.url: r.change for r in snapshot_diff(old, new).collect()}
        assert got == {"u1": "removed", "u2": "unchanged",
                       "u3": "changed", "u4": "added"}
