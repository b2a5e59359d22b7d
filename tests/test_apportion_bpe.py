"""Unit tests: Hamilton budget apportionment + BPE pair counts."""

from pyspark.sql import functions as F

from lightcrawler_spark.operators.scheduler import apportion_budget
from lightcrawler_spark.operators.text import bpe_pair_counts


def _hosts(spark, counts, parts=3):
    return spark.createDataFrame(
        [(f"h{i}.test", int(c)) for i, c in enumerate(counts)],
        "host string, pending long",
    ).repartition(parts)


class TestApportionBudget:
    def test_sums_exactly_and_within_one_of_quota(self, spark):
        counts = [(i * 37) % 500 + 1 for i in range(200)]
        total = sum(counts)
        b = 7777
        rows = apportion_budget(_hosts(spark, counts), b).collect()
        assert sum(r.budget for r in rows) == b
        for r in rows:
            exact = b * r.pending / total
            assert exact - 1 < r.budget < exact + 1

    def test_deterministic_across_partitionings(self, spark):
        counts = [5, 3, 3, 1]  # forces remainder tie-breaking by host
        a = {r.host: r.budget
             for r in apportion_budget(_hosts(spark, counts, 1), 10).collect()}
        c = {r.host: r.budget
             for r in apportion_budget(_hosts(spark, counts, 4), 10).collect()}
        assert a == c
        assert sum(a.values()) == 10

    def test_zero_budget_and_empty(self, spark):
        rows = apportion_budget(_hosts(spark, [4, 2]), 0).collect()
        assert all(r.budget == 0 for r in rows)

    def test_budget_larger_than_pending_total(self, spark):
        rows = apportion_budget(_hosts(spark, [1, 1]), 9).collect()
        assert sum(r.budget for r in rows) == 9


class TestBpePairs:
    def test_hand_corpus(self, spark):
        # "abab abab" -> word 'abab' twice: pairs ab,ba,ab per word
        df = spark.createDataFrame(
            [(1, "abab abab"), (2, "xy")], "doc_id long, text string")
        got = {r.pair: (r.cnt, r.pair_rank)
               for r in bpe_pair_counts(df, k=10).collect()}
        assert got["ab"] == (4, 1)
        assert got["ba"] == (2, 2)
        assert got["xy"] == (1, 3)

    def test_single_char_words_ignored(self, spark):
        df = spark.createDataFrame([(1, "a b c dd")], "doc_id long, text string")
        got = {r.pair: r.cnt for r in bpe_pair_counts(df, k=10).collect()}
        assert got == {"dd": 1}

    def test_case_folding_and_punct(self, spark):
        df = spark.createDataFrame([(1, "AB! ab?")], "doc_id long, text string")
        got = {r.pair: r.cnt for r in bpe_pair_counts(df, k=10).collect()}
        assert got == {"ab": 2}


class TestFrontierAge:
    def test_stats_exact(self, spark):
        from lightcrawler_spark.operators.scheduler import frontier_age_report

        rows = [(0, 1), (0, 5), (0, 9), (1, 10)]
        df = spark.createDataFrame(rows, "priority_level int, round long")
        got = {r.priority_level: r
               for r in frontier_age_report(df, current_round=10).collect()}
        assert got[0].n_pending == 3
        assert got[0].oldest_round == 1
        assert got[0].max_wait_rounds == 9
        assert abs(got[0].mean_wait_rounds - round((9 + 5 + 1) / 3, 6)) < 1e-12
        assert got[1].max_wait_rounds == 0 and got[1].mean_wait_rounds == 0.0
