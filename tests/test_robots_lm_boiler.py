"""Unit tests: RFC 9309 longest-match robots + boilerplate line removal."""

from pyspark.sql import functions as F

from lightcrawler_spark.operators.admission import (
    apply_robots_longest_match,
    parse_robots_rules_extended,
    robots_pattern_regex,
    robots_rules_extended_df,
)
from lightcrawler_spark.operators.text import strip_boilerplate_lines


def _verdicts(spark, body, urls, ua="bot"):
    rules = robots_rules_extended_df(spark, [("h.test", body)], ua)
    links = spark.createDataFrame([(u,) for u in urls], "url string")
    out = apply_robots_longest_match(links, rules)
    return {r.url: (r.allowed, r.matched_len) for r in out.collect()}


class TestRobotsLongestMatch:
    def test_wikipedia_style_allow_override(self, spark):
        body = "User-agent: *\nDisallow: /w/\nAllow: /w/load.php\n"
        v = _verdicts(spark, body, [
            "http://h.test/w/index.php",
            "http://h.test/w/load.php?x=1",
            "http://h.test/wiki/Spark",
        ])
        assert v["http://h.test/w/index.php"] == (False, 3)
        assert v["http://h.test/w/load.php?x=1"] == (True, 11)
        assert v["http://h.test/wiki/Spark"] == (True, -1)

    def test_tie_goes_to_allow(self, spark):
        body = "User-agent: *\nDisallow: /abc\nAllow: /ab*\n"  # both len 4
        v = _verdicts(spark, body, ["http://h.test/abc"])
        assert v["http://h.test/abc"] == (True, 4)

    def test_dollar_anchor_and_wildcard(self, spark):
        body = "User-agent: *\nDisallow: /a$\nDisallow: /x*.pdf$\n"
        v = _verdicts(spark, body, [
            "http://h.test/a", "http://h.test/ab",
            "http://h.test/x/deep/file.pdf", "http://h.test/x/file.pdfx",
        ])
        assert v["http://h.test/a"][0] is False
        assert v["http://h.test/ab"][0] is True
        assert v["http://h.test/x/deep/file.pdf"][0] is False
        assert v["http://h.test/x/file.pdfx"][0] is True

    def test_ua_section_selection(self, spark):
        body = ("User-agent: other\nDisallow: /\n"
                "User-agent: bot\nDisallow: /only\n")
        v = _verdicts(spark, body, ["http://h.test/", "http://h.test/only"])
        assert v["http://h.test/"][0] is True
        assert v["http://h.test/only"][0] is False

    def test_pattern_regex_translation(self):
        assert robots_pattern_regex("/a*b$") == "^/a.*b$"
        assert robots_pattern_regex("/p.php") == r"^/p\.php"
        assert parse_robots_rules_extended(
            "User-agent: *\nDisallow:\nAllow: /x\n", "bot"
        ) == [("/x", True)]

    # --- RFC 9309 §2.2.1 group semantics (round-4 ADVICE fix) ---

    def test_consecutive_ua_lines_share_one_group(self):
        body = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        assert parse_robots_rules_extended(body, "a") == [("/x", False)]
        assert parse_robots_rules_extended(body, "b") == [("/x", False)]
        assert parse_robots_rules_extended(body, "c") == []

    def test_exact_group_suppresses_star_group(self):
        body = ("User-agent: bot\nDisallow: /private\n"
                "User-agent: *\nAllow: /private\nDisallow: /docs\n")
        # bot: ONLY its own group — the * Allow must not tie-override
        assert parse_robots_rules_extended(body, "bot") == [
            ("/private", False)
        ]
        # any other agent: only the * group
        assert parse_robots_rules_extended(body, "other") == [
            ("/private", True), ("/docs", False)
        ]

    def test_exact_group_verdict_end_to_end(self, spark):
        body = ("User-agent: bot\nDisallow: /private\n"
                "User-agent: *\nAllow: /private\n")
        v = _verdicts(spark, body, ["http://h.test/private/x"])
        assert v["http://h.test/private/x"][0] is False

    def test_multiple_equally_specific_groups_combine(self):
        body = ("User-agent: bot\nDisallow: /a\n"
                "User-agent: x\nDisallow: /z\n"
                "User-agent: bot\nDisallow: /b\n")
        assert parse_robots_rules_extended(body, "bot") == [
            ("/a", False), ("/b", False)
        ]

    def test_rule_line_ends_ua_run(self):
        # a UA line AFTER rules starts a fresh group, not an extension
        body = ("User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n")
        assert parse_robots_rules_extended(body, "b") == [("/y", False)]


class TestBoilerplateLines:
    def test_prose_kept_chrome_dropped_order_preserved(self, spark):
        text = "\n".join([
            "The quick brown fox jumps over the lazy dog in the park.",
            "Home | About | Contact",
            "This is a second sentence of the prose that we keep here.",
            "Copyright 2026 All rights reserved",
            "nav menu items",
        ])
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        r = strip_boilerplate_lines(df).collect()[0]
        assert r.n_lines == 5
        assert r.n_boiler == 3
        assert r.clean_text.split("\n") == [
            "The quick brown fox jumps over the lazy dog in the park.",
            "This is a second sentence of the prose that we keep here.",
        ]

    def test_all_boiler_doc_survives_with_empty_text(self, spark):
        df = spark.createDataFrame(
            [(1, "Home | About\nClick here")], "doc_id long, text string")
        r = strip_boilerplate_lines(df).collect()[0]
        assert r.n_boiler == 2 and r.clean_text == ""

    def test_stopword_threshold_exact(self, spark):
        # 10 words, 1 stopword -> 1*100 < 10*10 == False -> kept
        line = "the fox dog cat bird cow pig hen owl bat"
        df = spark.createDataFrame([(1, line)], "doc_id long, text string")
        assert strip_boilerplate_lines(df).collect()[0].n_boiler == 0
        # 10 words, 0 stopwords -> 0 < 100 -> boiler
        line2 = "fox dog cat bird cow pig hen owl bat rat"
        df2 = spark.createDataFrame([(1, line2)], "doc_id long, text string")
        assert strip_boilerplate_lines(df2).collect()[0].n_boiler == 1


class TestKeywordScreen:
    """Category keyword screen (text.keyword_screen): word-boundary
    honesty, null text, custom categories, empty-list guard."""

    def test_paths(self, spark):
        from lightcrawler_spark.operators.text import keyword_screen

        df = spark.createDataFrame(
            [
                (0, "a photo by Shutterstock of a cat"),
                (1, "shutterstocky is not a hit"),
                (2, "No Image Available"),
                (3, None),
                (4, "getty images watermark visible"),
            ],
            "doc_id long, caption string",
        )
        got = {r["doc_id"]: r for r in keyword_screen(df).collect()}
        assert got[0]["kw_stock_site"] == 1 and got[0]["kw_flagged"] is True
        assert got[1]["kw_stock_site"] == 0 and got[1]["kw_flagged"] is False
        assert got[2]["kw_placeholder"] == 1
        assert got[3]["kw_flagged"] is False     # null -> nothing to screen
        assert got[4]["kw_stock_site"] == 1      # multi-word keyword

    def test_custom_categories_and_guard(self, spark):
        import pytest as _pytest

        from lightcrawler_spark.operators.text import keyword_screen

        df = spark.createDataFrame(
            [(0, "foo C++ bar")], "doc_id long, caption string"
        )
        got = keyword_screen(
            df, {"lang": ("c++",)}
        ).collect()[0]
        # regex metacharacters in keywords are escaped, not interpreted
        assert got["kw_lang"] == 1
        with _pytest.raises(ValueError):
            keyword_screen(df, {"empty": ()})
