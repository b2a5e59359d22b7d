"""Unit tests: deterministic train/val/test split."""

from pyspark.sql import functions as F

from lightcrawler_spark.operators.sampling import train_val_test_split


def _docs(spark, n=400, parts=4):
    return spark.range(0, n, 1, parts).select(F.col("id").alias("doc_id"))


class TestDatasetSplit:
    def test_fractions_and_determinism(self, spark):
        a = {r.doc_id: r.split
             for r in train_val_test_split(_docs(spark)).collect()}
        b = {r.doc_id: r.split
             for r in train_val_test_split(_docs(spark, parts=1)).collect()}
        assert a == b  # partitioning-independent
        n = len(a)
        frac = {s: sum(1 for v in a.values() if v == s) / n
                for s in ("train", "val", "test")}
        assert 0.05 < frac["test"] < 0.15
        assert 0.05 < frac["val"] < 0.15
        assert frac["train"] > 0.7

    def test_growth_keeps_assignments(self, spark):
        small = {r.doc_id: r.split
                 for r in train_val_test_split(_docs(spark, 200)).collect()}
        big = {r.doc_id: r.split
               for r in train_val_test_split(_docs(spark, 400)).collect()}
        assert all(big[k] == v for k, v in small.items())

    def test_growing_test_frac_only_promotes(self, spark):
        s1 = {r.doc_id: r.split for r in train_val_test_split(
            _docs(spark), val_frac=0.1, test_frac=0.1).collect()}
        s2 = {r.doc_id: r.split for r in train_val_test_split(
            _docs(spark), val_frac=0.1, test_frac=0.2).collect()}
        for k in s1:
            if s1[k] == "test":
                assert s2[k] == "test"  # test never leaks back out
