"""Unit tests: int8 quantization, param-relevance mining, rel=canonical."""

import numpy as np
from pyspark.sql import functions as F

from lightcrawler_spark.operators.extract import extract_canonical
from lightcrawler_spark.operators.similarity import quantize_embeddings
from lightcrawler_spark.operators.traps import mine_param_relevance


class TestQuantizeEmbeddings:
    def test_codes_match_numpy(self, spark):
        rng = np.random.default_rng(3)
        vecs = [rng.standard_normal(16).astype(np.float32) for _ in range(8)]
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>")
        rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
        for i, v in enumerate(vecs):
            scale = 127.0 / np.abs(v.astype(np.float64)).max()
            exp = np.round(v.astype(np.float64) * scale).astype(int)
            assert list(rows[i].q_codes) == exp.tolist()
            assert max(abs(c) for c in rows[i].q_codes) == 127

    def test_reconstruction_error_bounded(self, spark):
        rng = np.random.default_rng(4)
        v = rng.standard_normal(64).astype(np.float32)
        df = spark.createDataFrame(
            [(0, [float(x) for x in v])], "vec_id long, embedding array<float>")
        r = quantize_embeddings(df).collect()[0]
        recon = np.array(r.q_codes, dtype=np.float64) / r.q_scale
        assert np.abs(recon - v.astype(np.float64)).max() <= 0.5 / r.q_scale

    def test_zero_vector(self, spark):
        df = spark.createDataFrame(
            [(0, [0.0, 0.0])], "vec_id long, embedding array<float>")
        r = quantize_embeddings(df).collect()[0]
        assert r.q_scale == 0.0 and list(r.q_codes) == [0, 0]


class TestParamRelevanceMining:
    def _pages(self, spark, rows):
        return spark.createDataFrame(rows, "url string, content_md5 string")

    def test_irrelevant_vs_relevant(self, spark):
        rows = []
        for doc in range(4):
            for sess in range(3):
                rows.append(
                    (f"http://a.test/d?id={doc}&sess={sess}", f"h{doc}"))
        out = {(r.host, r.param_name): r
               for r in mine_param_relevance(self._pages(spark, rows)).collect()}
        assert out[("a.test", "sess")].irrelevant
        assert out[("a.test", "sess")].contradictions == 0
        assert not out[("a.test", "id")].irrelevant
        assert out[("a.test", "id")].contradictions > 0

    def test_min_support_gate(self, spark):
        rows = [("http://a.test/d?x=1&y=1", "h"),
                ("http://a.test/d?x=2&y=1", "h")]  # one supporting group
        out = {r.param_name: r for r in mine_param_relevance(
            self._pages(spark, rows), min_support=2).collect()}
        assert out["x"].support == 1 and not out["x"].irrelevant
        out2 = {r.param_name: r for r in mine_param_relevance(
            self._pages(spark, rows), min_support=1).collect()}
        assert out2["x"].irrelevant


class TestCanonicalExtract:
    def _one(self, spark, url, body):
        df = spark.createDataFrame([(url, body)], "url string, body string")
        return extract_canonical(df).collect()[0]

    def test_both_attribute_orders_and_quotes(self, spark):
        r1 = self._one(spark, "http://s.test/a",
                       '<link rel="canonical" href="http://s.test/c">')
        r2 = self._one(spark, "http://s.test/a",
                       "<LINK HREF='http://s.test/c' REL=canonical>")
        assert r1.canonical_url == r2.canonical_url == "http://s.test/c"
        assert r1.is_alias and r2.is_alias

    def test_self_canonical_is_not_alias(self, spark):
        r = self._one(spark, "http://s.test/a",
                      '<link rel=canonical href="http://s.test/a">')
        assert r.canonical_url == "http://s.test/a" and not r.is_alias

    def test_no_declaration(self, spark):
        r = self._one(spark, "http://s.test/a", "<html><body>x</body></html>")
        assert r.canonical_url is None and not r.is_alias

    def test_other_link_rels_ignored(self, spark):
        r = self._one(spark, "http://s.test/a",
                      '<link rel="stylesheet" href="http://s.test/s.css">')
        assert r.canonical_url is None
