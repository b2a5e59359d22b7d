"""sequence_spans: block-diagonal attention span map over packed docs."""

from pyspark.sql import functions as F

from lightcrawler_spark.operators.chunking import sequence_spans


def _toks(spark, sizes):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n_tokens long"
    )


def _spans(spark, sizes, ctx=8, parts=None):
    out = sequence_spans(
        _toks(spark, sizes), ctx_len=ctx, num_partitions=parts
    )
    return sorted(
        (r["seq_idx"], r["doc_id"], r["begin"], r["end"], r["doc_span_idx"])
        for r in out.collect()
    )


def test_spans_tile_sequences_exactly(spark):
    sizes = [3, 5, 20, 1, 0, 7]  # total 36 tokens, ctx 8 -> 5 sequences
    spans = _spans(spark, sizes)
    by_seq = {}
    for seq, doc, b, e, _ in spans:
        assert 0 <= b < e <= 8
        by_seq.setdefault(seq, []).append((b, e, doc))
    total = sum(sizes)
    for seq, items in by_seq.items():
        items.sort()
        expect_end = min(8, total - seq * 8)
        assert items[0][0] == 0
        assert items[-1][1] == expect_end
        for (b1, e1, _), (b2, e2, _) in zip(items, items[1:]):
            assert e1 == b2  # contiguous, no overlap
    assert set(by_seq) == {0, 1, 2, 3, 4}


def test_long_doc_pieces_numbered(spark):
    spans = _spans(spark, [3, 5, 20, 1, 0, 7])
    doc2 = [(s, b, e, i) for s, d, b, e, i in spans if d == 2]
    # doc 2: start 8, 20 tokens -> sequences 1,2,3 pieces 0,1,2
    assert doc2 == [(1, 0, 8, 0), (2, 0, 8, 1), (3, 0, 4, 2)]


def test_zero_token_docs_emit_nothing(spark):
    spans = _spans(spark, [4, 0, 4])
    assert {d for _, d, _, _, _ in spans} == {0, 2}


def test_partitioning_invariance(spark):
    sizes = [(i * 7) % 13 for i in range(200)]
    assert _spans(spark, sizes, ctx=16, parts=2) == _spans(
        spark, sizes, ctx=16, parts=11
    )


def test_span_count_bounded_by_ctx(spark):
    spans = _spans(spark, [1] * 100, ctx=8)  # all 1-token docs
    per_seq = {}
    for s, *_ in spans:
        per_seq[s] = per_seq.get(s, 0) + 1
    assert max(per_seq.values()) == 8  # ctx_len spans max
