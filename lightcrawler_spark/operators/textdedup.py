"""Document deduplication family for training-data pipelines
(exact, n-gram Jaccard, MinHash+LSH, SimHash) over the ``documents``
table. Graft context: generalizes the reference's 4-key product dedup
(/root/reference/worker/DaoXlegalLawContentRecord.class.php:96-121) and
its outsourced simhash check (worker/FlaskRestClient.class.php:41-53).

Scale design notes:
- exact dedup: hash-groupBy on md5(text) — one shuffle, AQE-coalesced.
- n-gram Jaccard: shingles via JVM sequence+explode (NOT a UDF), blocked
  by (source, length-bucket) so the candidate self-join never goes
  quadratic in the corpus — only within blocks.
- MinHash: min-wise signatures as lexicographic MIN of md5(seed‖shingle)
  — computable identically in ANSI SQL (the oracle) and entirely
  JVM-side; LSH bands bucket-join candidates so the exact Jaccard is
  only computed for colliding pairs.
- SimHash: 64-bit signature in an Arrow pandas UDF (bit-twiddling isn't
  SQL-friendly); candidate pairs via band equality on 16-bit chunks
  (Hamming ≤ 3 ⇒ some 16-bit quarter is equal — pigeonhole).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.hashing import simhash64

__all__ = [
    "exact_dedup",
    "shingle_df",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "word_ngrams",
    "decontaminate",
    "dedup_lines",
    "mask_duplicate_ngrams",
    "select_cluster_representatives",
    "dedup_report",
]


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each exact-duplicate group."""
    key = F.md5(F.col(text_col))
    w = Window.partitionBy("dup_key").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("dup_key", key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def shingle_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               k: int = 3, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Distinct character k-grams per doc, all JVM-side:
    sequence(1, len-k+1) → transform(substr) → explode → distinct.
    `extra_cols` ride along (blocking keys)."""
    c = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(k)),
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            *[F.col(x) for x in extra_cols],
            F.explode(grams).alias("shingle"),
        )
        .distinct()
    )


ALL_PAIRS_GUARD_ROWS = 50_000


def guard_all_pairs(df: DataFrame, what: str,
                    max_rows: int | None = None,
                    allow: bool = False) -> None:
    """Refuse silent O(n²) blowups: the unblocked forms of the near-dup
    operators are verifiable baselines for bounded candidate sets, not
    corpus-scale paths. Above `max_rows` input rows an unblocked call
    raises unless the caller explicitly opts in (allow_all_pairs=True).
    The probe is a cheap `limit(max_rows+1).count()` — it never scans
    more than max_rows+1 rows."""
    if allow:
        return
    if max_rows is None:
        max_rows = ALL_PAIRS_GUARD_ROWS  # read at call time (testable)
    probe = df.limit(max_rows + 1).count()
    if probe > max_rows:
        raise ValueError(
            f"{what}: unblocked all-pairs run over >{max_rows:,} rows — "
            "pass a blocking key (block_cols=/block_bits=) for corpus-"
            "scale inputs, or allow_all_pairs=True to accept O(n²) cost"
        )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.8,
                        block_cols: list[str] | None = None,
                        allow_all_pairs: bool = False) -> DataFrame:
    """Near-dup pairs by character-k-gram Jaccard ≥ threshold.

    Candidate blocking: docs only compare within the same `block_cols`
    values (default: none → full self-join on shingles, fine at test
    scale; production passes e.g. ["source"] or ["lang"] — the blocking
    key joins WITH the shingle so cross-block pairs never materialize).
    The shingle join is an inverted-index join (pair appears once per
    shared shingle, then group-count) — the standard scalable
    formulation. Unblocked calls are guarded above
    ALL_PAIRS_GUARD_ROWS input rows (no silent O(n²)).
    """
    block_cols = tuple(block_cols or ())
    if not block_cols:
        guard_all_pairs(df, "ngram_jaccard_pairs", allow=allow_all_pairs)
    sh = shingle_df(df, text_col, id_col, k, extra_cols=block_cols)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    for c_ in block_cols:
        cond = cond & (F.col(f"a.{c_}") == F.col(f"b.{c_}"))
    inter = (
        a.join(b, cond)
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "n_a", "n_b", "jaccard")
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3,
                       num_hashes: int = 8) -> DataFrame:
    """Min-wise signature h_j = MIN(md5(j‖shingle)) — lexicographic min of
    a uniform hash is a valid min-hash family, uses only md5/min, and the
    ANSI-SQL oracle computes the identical value. One row per doc with
    sig_0..sig_{n-1} columns (pivot via conditional aggregation —
    single shuffle)."""
    sh = shingle_df(df, text_col, id_col, k)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}\x1f"), F.col("shingle")))).alias(f"sig_{j}")
        for j in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3,
                      num_hashes: int = 8, bands: int = 4) -> DataFrame:
    """LSH candidate pairs: band signature = concat of rows-per-band
    minhashes; pairs colliding in ≥1 band, deduped. Returns
    (id_a, id_b, n_bands_hit)."""
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, k, num_hashes)
    band_cols = [
        F.concat_ws(
            ",", *[F.col(f"sig_{b * rows + i}") for i in range(rows)]
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select("doc_id", *band_cols)
    stacked = banded.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat(F.lit(f"{b}:"), F.col(f"band_{b}"))
                    for b in range(bands)
                ]
            )
        ).alias("band_key"),
    )
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_bands_hit"))
    )


_simhash_schema = T.LongType()


@pandas_udf(_simhash_schema)
def simhash_udf(texts: pd.Series) -> pd.Series:
    """64-bit simhash over whitespace tokens (Arrow-batched)."""
    out = []
    for t in texts:
        toks = (t or "").split()
        # signed two's complement for Spark LongType
        v = simhash64(toks)
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return pd.Series(out, dtype="int64")


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming.

    Pigeonhole banding: split the 64-bit signature into n equal chunks
    with n > max_hamming (n ∈ {4, 8, 16}) — at distance ≤ max_hamming at
    least one chunk is equal, so candidate recall is GUARANTEED; the
    equality bucket-joins shuffle on small chunk keys and the exact
    popcount filters false candidates. max_hamming > 15 degrades to
    probabilistic recall with 16 chunks."""
    n_chunks = 4 if max_hamming <= 3 else 8 if max_hamming <= 7 else 16
    width = 64 // n_chunks
    mask = (1 << width) - 1
    sig = df.select(
        F.col(id_col).alias("doc_id"), simhash_udf(F.col(text_col)).alias("simhash")
    )
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(i),
                        (F.shiftrightunsigned(F.col("simhash"), i * width)
                         .bitwiseAND(F.lit(mask))),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("chunk_key"),
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_key") == F.col("b.chunk_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    )


def word_ngrams(c, n: int):
    """Lowercased word n-grams as space-joined strings, JVM-side.

    Tokenization = lowercase, split on non-alphanumeric runs (the same
    rule operators/text.py uses), identical to the oracle's
    ``regexp_split_to_array(lower(text), '[^a-z0-9]+')``. Guarded
    against Spark's descending sequence(1, 0) quirk."""
    words = F.filter(
        F.split(F.lower(F.coalesce(c, F.lit(""))), r"[^a-z0-9]+"),
        lambda x: F.length(x) > 0,
    )
    cnt = F.size(words) - (n - 1)
    return F.when(
        cnt > 0,
        F.transform(
            F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with an evaluation set (the GPT-3 appendix-C /
    PaLM-style 13-gram rule, parameterized). Returns the input plus
    ``n_eval_ngram_hits`` (distinct contaminating n-grams) and a
    ``contaminated`` flag.

    Scale shape: the eval set is small by definition, so its distinct
    n-grams build once and BROADCAST to every executor — the 100 TB
    training side is a scan (ngrams → explode → distinct-per-doc) that
    probes the broadcast hash table with zero shuffle of the big side;
    the only shuffle is the final partial-aggregated groupBy(doc_id),
    whose input is already collapsed to the (rare) hit rows. The rider
    join back to `docs` is id-keyed on rows ≤ #contaminated docs, also
    broadcast."""
    gram_sets = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
        )
        .distinct()
    )
    eval_grams = (
        eval_docs.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )
    hits = (
        gram_sets.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_eval_ngram_hits"))
    )
    return (
        docs.join(
            F.broadcast(hits),
            docs[id_col] == hits["doc_id"],
            "left",
        )
        .drop(hits["doc_id"])
        .withColumn(
            "n_eval_ngram_hits",
            F.coalesce(F.col("n_eval_ngram_hits"), F.lit(0).cast("long")),
        )
        .withColumn("contaminated", F.col("n_eval_ngram_hits") > 0)
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 30,
    keep_text: bool = True,
) -> DataFrame:
    """Corpus-global line-level exact dedup (C4/Dolma-style): a line
    survives only in its FIRST occurrence across the whole corpus
    (ordered by (doc_id, position)); later copies — boilerplate, nav
    text, license banners — are dropped from the document body. Lines
    shorter than `min_chars` never participate (too generic to be
    meaningful duplicates) and are always kept.

    Scale shape (this is the one to get right at 100 TB): winner
    selection is `groupBy(line_md5).agg(min(struct(doc_id, pos)))` — a
    partial-aggregating (map-side combine) hash aggregate, NOT a rank
    window, so a boilerplate line with 10^8 occurrences collapses to one
    row per map task before the shuffle instead of landing in a single
    window partition. The join back to mark winners is a binary(16)
    equi-join AQE can skew-split; reassembly is one groupBy(doc_id) of
    pre-filtered rows. Graft context: the reference dedups whole
    products only (DaoXlegalLawContentRecord.class.php:96-121); this is
    the finer-grained corpus-curation pass the brief adds.

    Returns `df` plus `text_deduped`, `n_lines` and `n_lines_removed`.
    """
    pos_lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    eligible = F.length(F.col("line")) >= min_chars
    keyed = pos_lines.withColumn("_k", F.unhex(F.md5(F.col("line"))))
    winners = (
        keyed.filter(eligible)
        .groupBy("_k")
        .agg(F.min(F.struct(id_col, "pos")).alias("_w"))
    )
    marked = keyed.join(winners, "_k", "left").withColumn(
        "_keep",
        (~eligible)
        | (F.struct(F.col(id_col), F.col("pos")) == F.col("_w")),
    )
    rebuilt = marked.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct("pos", "line"))
                    )
                ),
                lambda x: x["line"],
            ),
        ).alias("text_deduped"),
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(~F.col("_keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_lines_removed"),
    )
    out = df.join(rebuilt, id_col)
    return out if keep_text else out.drop(text_col)


def mask_duplicate_ngrams(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = True,
) -> DataFrame:
    """Cross-document duplicated-span masking — the practical analog of
    exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): any word `n`-gram occurring in
    ≥ `min_docs` DISTINCT documents is "corpus-duplicated", and every
    token covered by an occurrence of a duplicated gram is removed from
    the document body (boilerplate, licence banners, syndicated
    paragraphs). Finer than doc-level dedup, coarser (and shuffle-
    bounded, unlike a distributed suffix array) than true suffix-array
    substring dedup — the standard practical middle ground.

    Scale shape: (1) gram frequency is `groupBy(gram)` with map-side
    partial aggregation over (gram, doc) pairs pre-distincted per
    partition — at 100 TB hash the gram to binary(16) first (flag
    below) so the shuffle carries 16-byte keys, not strings; (2)
    marking is a plain equi-join of the gram stream against the
    (rare) duplicated-gram set — AQE broadcasts it when small;
    (3) span coverage folds back with one groupBy(doc_id) of hit
    positions; reassembly is a row-local lambda over the token array.
    No window anywhere; every stage partial-aggregates.

    Returns `df` plus `n_tokens`, `dup_positions`, `dup_token_fraction`
    (round 6) and `text_masked`.
    """
    words = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"[^a-z0-9]+"),
        lambda x: F.length(x) > 0,
    )
    base = df.select(F.col(id_col), words.alias("_w"))
    cnt = F.size(F.col("_w")) - (n - 1)
    grams = base.select(
        id_col,
        F.posexplode(
            F.when(
                cnt > 0,
                F.transform(
                    F.sequence(F.lit(1), F.greatest(cnt, F.lit(1))),
                    lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "gram"),
    )
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gram")
    )
    covered = (
        grams.join(dup_grams, "gram")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("_cp"),
        )
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("_cp")).alias("_cps"))
    )
    masked = (
        base.join(covered, id_col, "left")
        .withColumn(
            "_cps", F.coalesce(F.col("_cps"), F.array().cast("array<int>"))
        )
        .select(
            id_col,
            F.size(F.col("_w")).cast("long").alias("n_tokens"),
            F.size(F.col("_cps")).cast("long").alias("dup_positions"),
            F.round(
                F.when(
                    F.size(F.col("_w")) > 0,
                    F.size(F.col("_cps"))
                    / F.size(F.col("_w")).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_token_fraction"),
            F.concat_ws(
                " ",
                F.filter(
                    F.col("_w"),
                    lambda tok, i: ~F.array_contains(F.col("_cps"), i),
                ),
            ).alias("text_masked"),
        )
    )
    out = df.join(masked, id_col)
    return out if keep_text else out.drop(text_col)


def select_cluster_representatives(
    df: DataFrame,
    cluster_col: str = "component",
    id_col: str = "doc_id",
    quality_cols: tuple[str, ...] = ("n_chars",),
    keep_cluster_size: bool = True,
) -> DataFrame:
    """Keep ONE row per near-dup cluster — the highest-quality member —
    the curation step that consumes ``connected_components`` /
    ``dedup_cluster_assignments`` output (LAION/DataComp "keep best of
    each dup group": highest resolution image, longest caption, best
    quality score; the reference keeps whichever dup arrives first,
    DaoXlegalLawContentRecord.class.php:96-121).

    Quality is the lexicographic struct of ``quality_cols`` (higher
    wins on each, in order); ties break on the LOWEST ``id_col`` so the
    winner is deterministic under any partitioning — required for the
    resume/oracle contracts.

    NULL quality fields are safe: struct ordering puts NULL below any
    value (a null-quality row never beats a scored one) and struct
    equality is null-safe per field (the winner probe still matches),
    so an all-null cluster falls back to its lowest-id member rather
    than vanishing — pinned in tests/test_curation_round4.py. Note the
    SQL-window oracle formulation must order NULLS LAST... ASC ties to
    mirror this if null quality ever reaches a contract query (the
    shipped ones synthesize non-null quality).

    Scale shape: a spam campaign can put 10^8 near-identical pages in
    ONE cluster, so a rank window partitioned by cluster id is exactly
    the mega-key collapse this engine bans. Three partial-aggregating
    shapes instead: (1) ``groupBy(cluster).agg(max(struct(quality)))``
    — map-side combine collapses the mega-cluster to one row per map
    task before the shuffle; (2) an equi-join back on
    (cluster, best-quality struct) keeps only quality-maximal members;
    (3) ``min(id)`` among those breaks ties. Every stage is a hash
    aggregate or an AQE-skew-splittable equi-join; nothing serializes
    on the hot cluster.

    Returns the representative rows of ``df`` (original columns), plus
    ``cluster_size`` when ``keep_cluster_size``.
    """
    qual = F.struct(*[F.col(c) for c in quality_cols]).alias("_q")
    agg = [F.max(qual).alias("_best")]
    if keep_cluster_size:
        agg.append(F.count("*").alias("cluster_size"))
    best = df.groupBy(cluster_col).agg(*agg)
    maximal = df.join(best, cluster_col).filter(
        F.struct(*[F.col(c) for c in quality_cols]) == F.col("_best")
    )
    winner = maximal.groupBy(cluster_col).agg(
        F.min(F.col(id_col)).alias("_wid")
    )
    out_cols = list(df.columns) + (
        ["cluster_size"] if keep_cluster_size else []
    )
    return (
        maximal.join(winner, cluster_col)
        .filter(F.col(id_col) == F.col("_wid"))
        .select(*out_cols)
    )


def dedup_report(assignments: DataFrame,
                 cluster_col: str = "cluster") -> DataFrame:
    """Corpus-level dedup telemetry from a cluster assignment (the
    output of ``graph.dedup_cluster_assignments`` /
    ``clustering.kmeans`` blocking / any (row, cluster) table): one row
    per CLUSTER SIZE with how many clusters have that size, how many
    rows they hold, and the exact removal fraction that size class
    contributes — the summary a curation run reports ("38% of the
    corpus was duplicate; the top size class was pairs") and the input
    to dedup-strategy tuning (a fat tail of mega-clusters means the
    banding is under-splitting).

    Two map-side-combined aggregates (rows→clusters, clusters→size
    histogram); the removed fraction is exact integer arithmetic over
    corpus totals collapsed to literals — round(6) for the contract.
    Output: (cluster_size, n_clusters, n_rows, removed_rows,
    removed_frac) sorted nowhere (order-free contract)."""
    sizes = assignments.groupBy(cluster_col).agg(
        F.count("*").alias("cluster_size")
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count("*").cast("long").alias("n_clusters")
    )
    total = assignments.count()  # driver scalar (one aggregate)
    return hist.select(
        F.col("cluster_size").cast("long").alias("cluster_size"),
        "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).cast("long")
        .alias("n_rows"),
        ((F.col("cluster_size") - 1) * F.col("n_clusters")).cast("long")
        .alias("removed_rows"),
        F.round(
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            / F.lit(float(total) if total else 1.0),
            6,
        ).alias("removed_frac"),
    )
