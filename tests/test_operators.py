"""Unit tests for admission / scheduler / dedup / bloom / robots /
pagination / metrics operators (SURVEY.md §2.2, §2.5, §2.6)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lightcrawler_spark.config import CrawlSpec, php_regex_to_std


class TestPhpRegexTranslation:
    def test_delimiters_and_flags(self):
        assert php_regex_to_std("#\\.(jpg|png)# i") == "(?i)\\.(jpg|png)"
        assert php_regex_to_std("/abc/is") == "(?is)abc"
        assert php_regex_to_std("plain") == "plain"

    def test_ungreedy_flag(self):
        assert php_regex_to_std("#<a.*># Ui") == "(?i)<a.*?>"


@pytest.fixture(scope="module")
def links_df(spark):
    rows = [
        # url, linktext, linkcode, depth, is_redirect
        ("http://www.foo.com/a.htm", "ok", "<a href='a.htm'>ok</a>", 1, False),
        ("https://www.foo.com/b.htm", "b", "<a>", 1, False),
        ("ftp://www.foo.com/c", "c", "<a>", 1, False),              # F1
        ("http://www.foo.com/deep.htm", "d", "<a>", 9, False),      # F2
        ("http://other.org/x.htm", "x", "<a>", 1, False),           # F4
        ("http://sub.foo.com/y.htm", "y", "<a>", 1, False),         # host mode
        ("http://www.foo.com/pic.jpg", "p", "<a>", 1, False),       # F5
        ("http://www.foo.com/nf.htm", "nf",
         '<a href="nf.htm" rel="nofollow">nf</a>', 1, False),       # F3
        ("http://www.foo.com/ad.htm", "advertisement", "<a>", 1, False),  # F6
    ]
    return spark.createDataFrame(
        rows, "url string, linktext string, linkcode string, depth int, "
              "is_redirect boolean",
    )


class TestAdmission:
    START = "http://www.foo.com/"

    def _admit(self, df, spec):
        from lightcrawler_spark.operators.admission import admit_links

        return {r["url"] for r in admit_links(df, spec, self.START).collect()}

    def test_protocol_depth_domain(self, spark, links_df):
        spec = CrawlSpec(seeds=[self.START], follow_mode=1, max_depth=3)
        got = self._admit(links_df, spec)
        assert "ftp://www.foo.com/c" not in got
        assert "http://www.foo.com/deep.htm" not in got
        assert "http://other.org/x.htm" not in got
        assert "http://sub.foo.com/y.htm" in got  # same domain
        assert "http://www.foo.com/a.htm" in got
        assert "https://www.foo.com/b.htm" in got

    def test_host_mode_strips_www(self, spark, links_df):
        spec = CrawlSpec(seeds=[self.START], follow_mode=2, max_depth=3)
        got = self._admit(links_df, spec)
        assert "http://sub.foo.com/y.htm" not in got
        assert "http://www.foo.com/a.htm" in got

    def test_deny_rules(self, spark, links_df):
        spec = CrawlSpec(
            seeds=[self.START], follow_mode=1, max_depth=3,
            url_filter_rules=[r"#\.(jpg|png)$# i"],
            linktext_filter_rules=[r"#advertisement# i"],
        )
        got = self._admit(links_df, spec)
        assert "http://www.foo.com/pic.jpg" not in got
        assert "http://www.foo.com/ad.htm" not in got

    def test_follow_rules_allowlist(self, spark, links_df):
        spec = CrawlSpec(
            seeds=[self.START], follow_mode=1, max_depth=3,
            url_follow_rules=[r"#a\.htm#"],
            linktext_follow_rules=[r"#^b$#"],
        )
        got = self._admit(links_df, spec)
        assert got == {"http://www.foo.com/a.htm", "https://www.foo.com/b.htm"}

    def test_nofollow(self, spark, links_df):
        spec = CrawlSpec(
            seeds=[self.START], follow_mode=1, max_depth=3, obey_nofollow=True
        )
        got = self._admit(links_df, spec)
        assert "http://www.foo.com/nf.htm" not in got
        assert "http://www.foo.com/a.htm" in got


class TestRobots:
    def test_parse_robots_body(self):
        from lightcrawler_spark.operators.admission import parse_robots_body

        body = (
            "User-agent: *\nDisallow: /private/\nDisallow: tmp/\n\n"
            "User-agent: otherbot\nDisallow: /all/\n"
        )
        got = parse_robots_body(body, "PHPCrawl", "http://www.foo.com")
        assert got == [
            "http://www.foo.com/private/",
            "http://www.foo.com/tmp/",
        ]

    def test_exact_ua_section_case_insensitive(self):
        from lightcrawler_spark.operators.admission import parse_robots_body

        body = "User-agent: MyBot\nDisallow: /x/\n"
        assert parse_robots_body(body, "mybot", "http://h.com") == ["http://h.com/x/"]
        assert parse_robots_body(body, "elsebot", "http://h.com") == []

    def test_filter_join(self, spark):
        from lightcrawler_spark.operators.admission import (
            apply_robots_filter,
            robots_rules_df,
        )

        rules = robots_rules_df(
            spark, [("www.foo.com", "User-agent: *\nDisallow: /private/\n")],
            "PHPCrawl",
        )
        df = spark.createDataFrame(
            [("http://www.foo.com/private/x.htm",), ("http://www.foo.com/ok.htm",)],
            "url string",
        )
        got = {r["url"] for r in apply_robots_filter(df, rules).collect()}
        assert got == {"http://www.foo.com/ok.htm"}


class TestScheduler:
    def test_priority_first_match_in_desc_order(self, spark):
        from lightcrawler_spark.operators.scheduler import assign_priority

        df = spark.createDataFrame(
            [("http://h/x/list.htm",), ("http://h/x/detail.htm",), ("http://h/z.htm",)],
            "url string",
        )
        rules = [(r"#list#", 1), (r"#x/#", 5)]
        got = {
            r["url"]: r["priority_level"]
            for r in assign_priority(df, rules).collect()
        }
        # level-5 rule checked first: list.htm matches 'x/' first → 5
        assert got["http://h/x/list.htm"] == 5
        assert got["http://h/x/detail.htm"] == 5
        assert got["http://h/z.htm"] == 0

    def test_pop_global_order(self, spark):
        from lightcrawler_spark.operators.scheduler import pop_global

        df = spark.createDataFrame(
            [(f"u{i}", (i * 7) % 3, i) for i in range(30)],
            "url string, priority_level int, insert_seq long",
        )
        got = [
            (r["priority_level"], r["insert_seq"], r["pop_rank"])
            for r in pop_global(df, 5).orderBy("pop_rank").collect()
        ]
        want = sorted(
            [((i * 7) % 3, i) for i in range(30)], key=lambda t: (-t[0], t[1])
        )[:5]
        assert [(p, s) for p, s, _ in got] == want
        assert [r for _, _, r in got] == [1, 2, 3, 4, 5]

    def test_pop_per_host_budget(self, spark):
        from lightcrawler_spark.operators.scheduler import pop_per_host

        df = spark.createDataFrame(
            [(f"u{i}", f"h{i % 3}", 0, i) for i in range(30)],
            "url string, host string, priority_level int, insert_seq long",
        )
        got = pop_per_host(df, 2).groupBy("host").count().collect()
        assert all(r["count"] == 2 for r in got)


class TestDedup:
    def test_first_wins(self, spark):
        from lightcrawler_spark.operators.dedup import first_wins_within_batch

        df = spark.createDataFrame(
            [("k1", 5, "late"), ("k1", 2, "early"), ("k2", 9, "only")],
            "url_md5 string, insert_seq long, tag string",
        )
        got = {
            r["url_md5"]: r["tag"]
            for r in first_wins_within_batch(df).collect()
        }
        assert got == {"k1": "early", "k2": "only"}

    def test_anti_join_seen(self, spark):
        from lightcrawler_spark.operators.dedup import anti_join_seen

        new = spark.createDataFrame([("a",), ("b",), ("c",)], "url_md5 string")
        seen = spark.createDataFrame([("b",)], "url_md5 string")
        got = {r["url_md5"] for r in anti_join_seen(new, seen).collect()}
        assert got == {"a", "c"}


class TestBloom:
    def test_numpy_bloom_no_false_negatives(self):
        from lightcrawler_spark.operators.dedup import NumpyBloom

        rng = np.random.default_rng(42)
        keys = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
        m, k = NumpyBloom.size_for(len(keys), 0.01)
        bloom = NumpyBloom(m, k)
        bloom.add(keys)
        assert bloom.might_contain(keys).all()
        other = rng.integers(0, 2**63, size=20000, dtype=np.uint64)
        fresh = other[~np.isin(other, keys)]
        fpr = bloom.might_contain(fresh).mean()
        assert fpr < 0.03

    def test_sharded_bloom_prefilter(self, spark):
        from lightcrawler_spark.operators.dedup import (
            bloom_prefilter,
            build_bloom_shards,
        )

        seen = spark.range(0, 2000).select(
            F.concat(F.lit("http://h/p"), F.col("id")).alias("url")
        )
        shards = build_bloom_shards(seen, num_shards=8, fpp=0.01).cache()
        new = spark.range(1500, 3000).select(
            F.concat(F.lit("http://h/p"), F.col("id")).alias("url")
        )
        survivors = {
            r["url"] for r in bloom_prefilter(new, shards, num_shards=8).collect()
        }
        # all genuinely-new URLs survive except bloom FPs (<3%)
        truly_new = {f"http://h/p{i}" for i in range(2000, 3000)}
        assert survivors <= truly_new
        assert len(survivors) >= 0.97 * len(truly_new)


class TestPagination:
    def test_synthesize(self, spark):
        from lightcrawler_spark.operators.extract import synthesize_pagination

        df = spark.createDataFrame(
            [
                ("http://h/list/index_0.htm", "<script>var countPage = 3</script>"),
                ("http://h/nolist/x.htm", "no counter here"),
            ],
            "url string, body_text string",
        )
        got = {r["url"] for r in synthesize_pagination(df).collect()}
        assert got == {
            "http://h/list/index_1.htm",
            "http://h/list/index_2.htm",
        }


class TestMetrics:
    def test_round_metrics_and_report(self, spark):
        from lightcrawler_spark.plans.metrics import process_report, round_metrics

        trace = spark.createDataFrame(
            [
                (0, 1, "u1", 200, 1000, 10),
                (1, 1, "u2", 200, 2000, 20),
                (2, 2, "u3", 404, 0, 5),
            ],
            "seq long, round int, url string, status int, "
            "bytes_received long, latency_ms int",
        )
        rm = {r["round"]: r for r in round_metrics(trace).collect()}
        assert rm[1]["links_followed"] == 2
        assert rm[1]["documents_received"] == 2
        assert rm[2]["documents_received"] == 0
        rep = process_report(trace, runtime_s=10.0)
        assert rep["bytes_received"] == 3000
        assert rep["data_throughput_bps"] == 300.0

    def test_named_timers_a3_a4(self, spark):
        from pyspark.sql import functions as F
        from lightcrawler_spark.plans.metrics import process_report

        trace = spark.createDataFrame(
            [
                (0, "u1", 200, 1000, 10, 6.0, 4.0),
                (1, "u2", 200, 3000, 20, 14.0, 6.0),
            ],
            "seq long, url string, status int, bytes_received long, "
            "latency_ms int, resp double, xfer double",
        ).select(
            "seq", "url", "status", "bytes_received", "latency_ms",
            F.create_map(
                F.lit("server_response_ms"), F.col("resp"),
                F.lit("data_transfer_ms"), F.col("xfer"),
            ).alias("benchmarks"),
        )
        rep = process_report(trace)
        assert rep["avg_server_response_ms"] == 10.0       # (6+14)/2
        # A4: 4000 bytes over 10 ms of TRANSFER time only
        assert rep["data_transfer_rate_bps"] == 400_000.0


class TestCuckooFilter:
    def test_membership_and_fpr(self):
        import numpy as np
        from lightcrawler_spark.operators.dedup import NumpyCuckoo

        rng = np.random.default_rng(7)
        keys = rng.integers(0, 2**63, size=50_000, dtype=np.uint64)
        keys = np.unique(keys)
        ck = NumpyCuckoo(NumpyCuckoo.size_for(len(keys)))
        ck.insert(keys)
        # no false negatives
        assert ck.might_contain(keys).all()
        # FPR of 16-bit fingerprints in 2x4 slots: ~ 8/2^16 ≈ 0.012%
        probe = rng.integers(2**63, 2**64 - 1, size=50_000, dtype=np.uint64)
        fpr = ck.might_contain(probe).mean()
        assert fpr < 0.005

    def test_delete_unsees(self):
        import numpy as np
        from lightcrawler_spark.operators.dedup import NumpyCuckoo

        keys = np.arange(1000, dtype=np.uint64) * 64 + 3  # congruent keys
        ck = NumpyCuckoo(NumpyCuckoo.size_for(len(keys)))
        ck.insert(keys)
        victims = keys[::10]
        assert ck.delete(victims).all()
        assert not ck.might_contain(victims).any()
        survivors = np.setdiff1d(keys, victims)
        assert ck.might_contain(survivors).all()

    def test_sharded_cuckoo_prefilter(self, spark):
        from pyspark.sql import functions as F
        from lightcrawler_spark.operators.dedup import (
            build_cuckoo_shards, cuckoo_prefilter,
        )

        seen = spark.range(0, 3000).select(
            F.concat(F.lit("http://c.test/p/"), F.col("id").cast("string")).alias("url")
        )
        new = spark.range(1500, 4500).select(
            F.concat(F.lit("http://c.test/p/"), F.col("id").cast("string")).alias("url")
        )
        shards = build_cuckoo_shards(seen, num_shards=8).cache()
        shards.count()
        got = {r["url"] for r in cuckoo_prefilter(new, shards, num_shards=8).collect()}
        fresh = {f"http://c.test/p/{i}" for i in range(3000, 4500)}
        # survivors ⊆ fresh (no false negatives on seen), nearly all fresh kept
        assert got <= fresh
        assert len(got) >= len(fresh) - 2


class TestAnnRecall:
    def test_recall_fraction(self, spark):
        from lightcrawler_spark.operators.similarity import ann_recall

        exact = spark.createDataFrame(
            [(0, 1), (0, 2), (0, 3), (1, 4), (1, 5)],
            "query_id long, neighbor_id long",
        )
        approx = spark.createDataFrame(
            [(0, 2), (0, 9), (1, 4), (1, 5)],
            "query_id long, neighbor_id long",
        )
        got = {r["query_id"]: r for r in ann_recall(exact, approx).collect()}
        assert got[0]["n_exact"] == 3 and got[0]["n_hits"] == 1
        assert got[0]["recall"] == pytest.approx(1 / 3, abs=1e-6)
        assert got[1]["n_hits"] == 2 and got[1]["recall"] == 1.0

    def test_identical_inputs_full_recall(self, spark):
        from lightcrawler_spark.operators.similarity import ann_recall

        t = spark.createDataFrame(
            [(q, n) for q in range(3) for n in range(5)],
            "query_id long, neighbor_id long",
        )
        out = ann_recall(t, t).collect()
        assert all(r["recall"] == 1.0 and r["n_exact"] == 5 for r in out)
