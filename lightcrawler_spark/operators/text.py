"""Text-analysis operators for training-data pipelines over the
``documents`` table: language-ID, quality scoring, token counting,
fingerprinting.

Design rule: every operator here is ALSO expressible in ANSI SQL with
identical integer/string arithmetic, so the DuckDB oracle in
``__spark_entry__.py`` can verify values bit-for-bit. That forces the
hot path to stay JVM-side (length/replace/regexp built-ins inside
whole-stage codegen) — no Python per row, which is exactly what you want
at 100 TB anyway. Graft context: these generalize the reference's
content-quality gates (size gate F13, SpiderFrame.class.php:136-141;
extraction heuristics worker/ExtractContent.class.php:622-706).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "occurrence_count",
    "lang_scores",
    "with_lang_id",
    "with_quality_score",
    "with_token_counts",
    "with_fingerprint",
    "with_pii_scrub",
    "with_repetition_stats",
    "unigram_logprob",
    "vocab_topk",
    "bpe_train",
    "ccnet_buckets",
    "corpus_datasheet",
    "keyword_screen",
    "DEFAULT_KEYWORD_CATEGORIES",
]

# tiny stopword marker sets — deliberately small & fixed so the SQL oracle
# embeds the same lists literally
EN_MARKERS = [" the ", " and ", " of ", " to ", " in "]
ZH_MARKERS = ["的", "是", "了", "在", "和"]
ES_MARKERS = [" el ", " la ", " de ", " que ", " los "]


def occurrence_count(col: Column, pat: str) -> Column:
    """#occurrences of literal `pat` via the length-difference trick —
    identical semantics in Spark and ANSI SQL (no regex, no UDF)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(pat), F.lit(""))))
        / F.lit(len(pat))
    ).cast("long")


def _marker_score(col: Column, markers: list[str]) -> Column:
    return reduce(
        lambda a, b: a + b, [occurrence_count(col, m) for m in markers]
    )


def lang_scores(col: Column) -> dict[str, Column]:
    return {
        "en": _marker_score(col, EN_MARKERS),
        "zh": _marker_score(col, ZH_MARKERS),
        "es": _marker_score(col, ES_MARKERS),
    }


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-count language ID with deterministic tie-break
    (zh > en > es on equal score, 'und' when all zero). CASE-WHEN chain —
    same expression runs in the DuckDB oracle."""
    c = F.col(text_col)
    s = lang_scores(c)
    return (
        df.withColumn("en_score", s["en"])
        .withColumn("zh_score", s["zh"])
        .withColumn("es_score", s["es"])
        .withColumn(
            "lang_pred",
            F.when(
                (F.col("zh_score") >= F.col("en_score"))
                & (F.col("zh_score") >= F.col("es_score"))
                & (F.col("zh_score") > 0),
                F.lit("zh"),
            )
            .when(
                (F.col("en_score") >= F.col("es_score")) & (F.col("en_score") > 0),
                F.lit("en"),
            )
            .when(F.col("es_score") > 0, F.lit("es"))
            .otherwise(F.lit("und")),
        )
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + alnum-run tokens (BPE-ish pre-tokenization) +
    char count. Pure regexp built-ins."""
    c = F.col(text_col)
    ws = F.size(F.split(F.trim(c), r"\s+"))
    return (
        df.withColumn(
            "ws_tokens", F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(ws)
        )
        .withColumn(
            "alnum_tokens",
            F.size(
                F.filter(
                    F.split(c, r"[^0-9A-Za-z]+"), lambda x: F.length(x) > 0
                )
            ),
        )
        .withColumn("n_chars_calc", F.length(c))
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality heuristics: length, punctuation density,
    uppercase ratio, mean word length; combined into a 0-100 score with
    integer/4-decimal math (oracle-replicable)."""
    c = F.col(text_col)
    n = F.length(c).cast("double")
    punct = (n - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))).cast("double")
    upper = (n - F.length(F.regexp_replace(c, r"[A-Z]", ""))).cast("double")
    spaces = (n - F.length(F.replace(c, F.lit(" "), F.lit("")))).cast("double")
    words = spaces + F.lit(1.0)
    return (
        df.withColumn("punct_ratio", F.round(punct / F.greatest(n, F.lit(1.0)), 6))
        .withColumn("upper_ratio", F.round(upper / F.greatest(n, F.lit(1.0)), 6))
        .withColumn("mean_word_len", F.round(n / words, 4))
        .withColumn(
            "quality_score",
            F.round(
                F.least(n / F.lit(10.0), F.lit(50.0))
                + F.when((F.col("punct_ratio") > 0.001) & (F.col("punct_ratio") < 0.2), 25.0).otherwise(0.0)
                + F.when((F.col("mean_word_len") > 3.0) & (F.col("mean_word_len") < 12.0), 25.0).otherwise(0.0),
                4,
            ),
        )
    )


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     k: int = 16) -> DataFrame:
    """Document fingerprint: lexicographic-min md5 over the document's
    k-gram substrings sampled at stride k (a winnowing-style min-hash that
    both Spark and ANSI SQL compute identically via sequence+explode /
    generate_series). Short docs fall back to md5(text)."""
    c = F.col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest((F.length(c) - k) + 1, F.lit(1)), F.lit(k)),
        lambda i: F.md5(c.substr(i, F.lit(k))),
    )
    return df.withColumn("fingerprint", F.array_min(grams))


# PII scrub patterns, applied in order (URLs first so an address inside
# a query string is redacted as part of the URL, not left behind as a
# bare email; placeholders contain no digits, so the phone pass cannot
# re-match inside an earlier replacement). ASCII classes only — the
# same pattern text must mean the same thing to Java regex (Spark) and
# RE2 (the DuckDB oracle).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^ \t\n\r]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
]


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / phone numbers / URLs from a text column — the
    standard pre-training PII pass — entirely in JVM ``regexp_replace``
    / ``regexp_count`` (whole-stage codegen, no Python). Adds
    ``n_url``/``n_email``/``n_phone`` (occurrences counted on the text
    as it stood before that category's replacement, so the counts
    deterministically match the sequential scrub) and ``text_scrubbed``.
    """
    cur = F.col(text_col)
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, repl)
    return df.withColumns({**counts, "text_scrubbed": cur})


def _nonempty_lines(c: Column) -> Column:
    return F.filter(
        F.split(F.coalesce(c, F.lit("")), "\n"),
        lambda x: F.length(F.trim(x)) > 0,
    )


def _words(c: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.coalesce(c, F.lit(""))), r"[^a-z0-9]+"),
        lambda x: F.length(x) > 0,
    )


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Corpus unigram language-model score per document — the model-free
    stand-in for the perplexity filters (CCNet / Wenzek et al. 2020) a
    training pipeline runs before the expensive LM pass: documents whose
    tokens are corpus-typical score high, gibberish and boilerplate-rare
    token soups score low.

    mean_logprob(d) = (Σ_{t ∈ d} ln c_t) / |d| − ln N, where c_t is the
    corpus count of token t and N the corpus token total (every scored
    token exists in the corpus, so c_t ≥ 1 and no smoothing is needed).

    Scale shape: explode → one groupBy(token) count (map-side combine
    collapses the heavy hitters) → hash-join tokens back to their counts
    → one groupBy(doc) aggregate. N collapses to a driver scalar in one
    1-row aggregate (the BM25 pattern — ranking.py) and is inlined as a
    literal, so the scoring pass carries no extra join.

    Float determinism across engines: per-token ln c_t is quantized to
    integer MICRO-NATS (round(ln c × 10⁶) as long) BEFORE summing — an
    integer sum is exact and order-independent, unlike a double sum
    whose value depends on reduction order. The mean then involves
    exactly one float division over identical operands on both sides,
    so the DuckDB oracle hash-matches without tolerance.

    Output: ``(id_col, n_tokens, mean_logprob)``, one row per document
    that has ≥1 token.
    """
    import math

    tokens = df.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("tok")
    )
    counts = tokens.groupBy("tok").agg(F.count("*").alias("c"))
    n_total = counts.agg(F.sum("c").alias("n")).first()["n"] or 0
    if n_total == 0:
        return df.select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0.0).alias("mean_logprob"),
        ).limit(0)
    lp_micro = F.round(
        F.log(F.col("c").cast("double")) * F.lit(1e6), 0
    ).cast("long")
    scored = tokens.join(counts, "tok")
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(lp_micro).alias("_lp_micro"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(
                (F.col("_lp_micro").cast("double") / F.col("n_tokens"))
                / F.lit(1e6)
                - F.lit(math.log(n_total)),
                6,
            ).alias("mean_logprob"),
        )
    )


def _word_ngrams_zipped(words: Column, n: int) -> Column:
    """Positional word n-grams (space-joined) built ONLY from whole-array
    operations: fold ``zip_with(grams, slice(words, k+1, L), concat)``
    n−1 times, then drop the null tail. zip_with/slice ARGUMENTS are
    evaluated once per row, unlike a ``transform(sequence(...), i ->
    slice(words, i, n))`` whose lambda re-evaluates the captured `words`
    subtree per element — O(W²) per row once predicate pushdown inlines
    the alias into a filter condition (measured 40× on the
    corpus_pipeline gate)."""
    grams = words
    for k in range(1, n):
        nxt = F.slice(words, k + 1, F.greatest(F.size(words) - k, F.lit(1)))
        grams = F.zip_with(
            grams,
            nxt,
            lambda a, b: F.when(
                a.isNotNull() & b.isNotNull(), F.concat(a, F.lit(" "), b)
            ),
        )
    return F.filter(grams, lambda x: x.isNotNull())


def _top_ngram_best(words: Column, n: int) -> Column:
    """max over word n-grams of (#occurrences × summed word chars).

    Shuffle-free: build the gram array, ``sort_array`` it so equal
    grams are adjacent, then one ``aggregate`` pass with a struct
    accumulator tracking (prev, current run, best run×charlen). O(G log
    G) per row inside codegen — no explode, no groupBy, so a 100 TB
    scan stays a scan. charlen counts the words' characters only
    (length(gram) − (n−1) joiner spaces), per the Gopher definition."""
    grams = _word_ngrams_zipped(words, n)
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        charlen = (F.length(x) - (n - 1)).cast("long")
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run * charlen).alias("best"),
        )

    return F.aggregate(F.sort_array(grams), init, step, lambda acc: acc["best"])


def with_repetition_stats(
    df: DataFrame, text_col: str = "text", ngram_ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Gopher/MassiveText repetition-removal signals (Rae et al. 2021,
    §A1.1): fraction of duplicated lines, fraction of characters inside
    duplicated lines, and — per requested n — the fraction of word
    characters covered by the single most-repeated word n-gram
    (``top{n}gram_char_frac``). Boilerplate-heavy and degenerate pages
    (nav link farms, keyword stuffing) light these up; a training
    pipeline drops rows above thresholds (Gopher: dup_line_frac > 0.30,
    top2gram_char_frac > 0.20).

    All metrics are per-row array expressions (split → sort_array →
    aggregate), so the pass is a pure map over the corpus: no shuffle,
    no Python, whole-stage codegen end-to-end. Duplicated-line chars use
    sorted-neighbour adjacency (a line instance is duplicated iff it
    equals its predecessor or successor in the sorted line array) — an
    O(L log L) equivalent of the group-and-count definition the DuckDB
    oracle computes relationally. Fractions are rounded to 6 places;
    empty/degenerate docs yield 0.0, never null.

    The split/sort arrays are staged as real (temp) columns, NOT
    captured expression trees: a lambda inside a higher-order function
    re-evaluates every captured subtree per element, so an aggregate
    doing `get(sort_array(split(text)), i)` per i is O(L² log L) per
    row (measured 10× on the corpus_pipeline bench). As attributes they
    evaluate once per row, and CollapseProject keeps multiply-referenced
    non-cheap aliases staged instead of re-inlining them."""
    c = F.col(text_col)
    staged = df.withColumns(
        {"_rl": _nonempty_lines(c), "_rw": _words(c)}
    ).withColumn("_rs", F.sort_array(F.col("_rl")))
    lines, srt, words = F.col("_rl"), F.col("_rs"), F.col("_rw")
    n_lines = F.size(lines).cast("long")
    n_distinct = F.size(F.array_distinct(lines)).cast("long")
    total_line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    # neighbour-adjacency via zip_with against the shifted copies: the
    # array arguments evaluate once per row, so the expression stays
    # linear even when predicate pushdown inlines it into a filter
    # (a per-element get(srt, i) lambda re-evaluates the captured sort
    # per element — quadratic after inlining)
    prev_arr = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(srt, 1, F.greatest(F.size(srt) - 1, F.lit(1))),
    )
    next_arr = F.slice(srt, 2, F.greatest(F.size(srt) - 1, F.lit(1)))
    with_prev = F.zip_with(
        srt,
        prev_arr,
        lambda cur, prv: F.struct(
            cur.alias("cur"),
            (prv.isNotNull() & (prv == cur)).alias("dup"),
        ),
    )
    dup_flagged = F.zip_with(
        with_prev,
        next_arr,
        lambda s, nxt: F.when(
            s["dup"] | (nxt.isNotNull() & (nxt == s["cur"])),
            F.length(s["cur"]).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    dup_line_chars = F.aggregate(
        dup_flagged, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    total_word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )

    def frac(num, den):
        return F.round(
            F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
                F.lit(0.0)
            ),
            6,
        )

    cols = {
        "n_lines": n_lines,
        "dup_line_frac": frac(n_lines - n_distinct, n_lines),
        "dup_line_char_frac": frac(dup_line_chars, total_line_chars),
    }
    for n in ngram_ns:
        cols[f"top{n}gram_char_frac"] = frac(
            _top_ngram_best(words, n), total_word_chars
        )
    return staged.withColumns(cols).drop("_rl", "_rs", "_rw")


def vocab_topk(df: DataFrame, k: int = 100, text_col: str = "text",
               min_count: int = 1) -> DataFrame:
    """Corpus-global top-k token vocabulary — the seed list a tokenizer
    build (BPE/WordPiece) starts from, and the coverage report every
    corpus audit wants ("what are the 50k most frequent tokens and how
    much of the stream do they cover").

    Scale shape: explode → ONE groupBy(token) count whose map-side
    partial aggregation collapses heavy hitters per task before the
    shuffle, then a global top-k via orderBy(...).limit(k) — Spark
    plans that as TakeOrderedAndProject (per-partition heap of k, then
    a k·P driver merge), never a global sort. Tie-break is
    deterministic: (count DESC, token ASC). `cum_frac` (cumulative
    corpus coverage, micro-rounded) rides on a window over the ≤ k
    survivor rows — bounded by k, not by the corpus, so the
    single-partition window is safe by construction.
    """
    from pyspark.sql import Window

    tokens = df.select(F.explode(_words(F.col(text_col))).alias("tok"))
    counts = tokens.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt")).first()[0] or 0
    top = (
        counts.filter(F.col("cnt") >= min_count)
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(k)
    )
    if total == 0:
        return top.withColumn("vocab_rank", F.lit(0).cast("long")).withColumn(
            "cum_frac", F.lit(0.0)
        )
    # rank window over ≤k post-limit rows: the constant-but-non-foldable
    # partition key (same idiom as scheduler.pop_global) keeps WindowExec's
    # "No Partition Defined" warning — which flags windows over UNBOUNDED
    # input — out of audit logs for a window that is bounded by construction
    w = Window.partitionBy(F.pmod(F.xxhash64("tok"), F.lit(1))).orderBy(
        F.col("cnt").desc(), F.col("tok").asc()
    )
    return (
        top.withColumn("vocab_rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_frac",
            F.round(
                F.sum("cnt").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ).cast("double")
                / F.lit(float(total)),
                6,
            ),
        )
    )


# Function words whose presence separates prose from navigation chrome
# (juText's stopword-density criterion, Pomikalek 2011). Shared with the
# contract oracle.
BOILER_STOPWORDS = (
    "the", "a", "an", "of", "to", "in", "and", "is", "on", "for", "with",
    "that", "as", "are", "was", "it", "by", "this", "be", "or", "at",
)
# Chrome phrasing that marks a line boilerplate outright.
BOILER_LINE_PAT = (
    r"(?i)(all rights reserved|cookie|privacy policy|terms of (use|service)"
    r"|copyright|subscribe to|follow us|click here|\|)"
)


def strip_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 4,
    min_stopword_pct: int = 10,
) -> DataFrame:
    """Doc-local boilerplate line removal (jusText-lite): a line is
    chrome if it is too short (< min_words), too stopword-poor
    (function-word share below min_stopword_pct percent -- prose has
    function words, nav menus don't), or matches chrome phrasing.
    Complements the corpus-global `textdedup.dedup_lines` (which needs a
    line to REPEAT across docs; this fires on the first sighting).

    Exactness: the stopword test is integer cross-multiplication
    (sw * 100 < pct * n_words), never a float fraction -- the verdict is
    bit-reproducible. E9's DOM link-block pruning (content.py) is the
    markup-aware sibling; this one runs on extracted plain text.

    Scale shape: posexplode fans out to lines, per-line classification
    is codegen'd expressions, and the doc folds back with ONE
    groupBy(id) whose accumulators are a sorted struct array (kept
    lines) + counters -- no window, no Python, no second shuffle.

    Output: (id, n_lines, n_boiler, clean_text).
    """
    lines = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    words = F.filter(
        F.split(F.lower(F.col("line")), "[^a-z0-9]+"),
        lambda w: w != F.lit(""),
    )
    n_words = F.size(words)
    sw = F.size(F.filter(words, lambda w: w.isin(*BOILER_STOPWORDS)))
    boiler = (
        (n_words < F.lit(int(min_words)))
        | (sw * 100 < F.lit(int(min_stopword_pct)) * n_words)
        | F.col("line").rlike(BOILER_LINE_PAT)
    )
    classified = lines.withColumn("_boiler", boiler)
    return (
        classified.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_lines"),
            F.sum(F.col("_boiler").cast("int")).cast("int").alias("n_boiler"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        ~F.col("_boiler"),
                        F.struct(F.col("pos").alias("p"),
                                 F.col("line").alias("t")),
                    )
                )
            ).alias("_kept"),
        )
        .withColumn(
            "clean_text",
            F.array_join(
                F.transform(F.col("_kept"), lambda x: x["t"]), "\n"
            ),
        )
        .drop("_kept")
    )


def bpe_pair_counts(
    df: DataFrame, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """Corpus-global adjacent-symbol pair frequencies — the first merge
    step of BPE tokenizer training (Sennrich et al. 2016): the pair the
    trainer would merge next is exactly `pair_rank = 1`. Iterating this
    op (re-tokenize with the merged symbol, recount) IS the training
    loop; each iteration stays this same shuffle shape.

    Scale shape: word split + char pairs are whole-array expressions
    (`zip_with` over two `slice`s — arguments evaluate once per row,
    pushdown-safe per SURVEY §11), the count is a map-side-combining
    groupBy(pair), and top-k goes through TakeOrderedAndProject (never
    a global sort). Words come from the ascii-lowercase tokenizer, so
    char indexing agrees byte-for-byte with any SQL engine.
    """
    words = df.select(
        F.explode(_words(F.col(text_col))).alias("w")
    ).filter(F.length("w") >= 2)
    chars = F.split(F.col("w"), "")
    n = F.size(chars)
    pairs = F.zip_with(
        F.slice(chars, 1, n - 1),
        F.slice(chars, 2, n - 1),
        lambda a, b: F.concat(a, b),
    )
    from pyspark.sql import Window

    counted = (
        words.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    topk = counted.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(k)
    # rank window runs over <= k rows by construction (post-limit); the
    # constant-but-non-foldable partition key (scheduler.pop_global idiom)
    # silences WindowExec's unbounded-input warning for this bounded window
    w = Window.partitionBy(F.pmod(F.xxhash64("pair"), F.lit(1))).orderBy(
        F.col("cnt").desc(), F.col("pair").asc()
    )
    return topk.withColumn("pair_rank", F.row_number().over(w).cast("int"))


def bpe_train(df: DataFrame, n_merges: int = 8,
              text_col: str = "text") -> DataFrame:
    """Full BPE tokenizer training (Sennrich et al. 2016) — the
    iterative loop ``bpe_pair_counts`` documents, actually run: per
    iteration, count adjacent-symbol pairs over the word-frequency
    vocabulary (weighted by word freq), merge the argmax pair
    (ties: count DESC, left ASC, right ASC) left-to-right
    non-overlapping in every word, repeat. Words come from the
    ascii-lowercase tokenizer (_words) with the classic ``</w>``
    end-of-word marker, so merges never cross word boundaries.

    Scale shape: the loop state is the VOCABULARY table (word-freq
    rows — millions, not the corpus; the corpus is touched once for
    the initial frequency count). Each iteration: one
    map-side-combined groupBy over exploded pairs, one O(1) driver
    argmax (TakeOrdered top-1), and one row-local fold applying the
    merge (aggregate with a (out, carry) accumulator — pure JVM, no
    Python); localCheckpoint caps lineage like the k-means loop.

    Returns the merge table — ``(merge_idx, left, right, pair_count,
    new_symbol)`` — the training artifact a tokenizer ships. Stops
    early when no pair remains.
    """
    spark = df.sparkSession
    vocab = (
        df.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    words = vocab.select(
        "freq",
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit("</w>"))
        ).alias("syms"),
    ).localCheckpoint(eager=False)

    merges: list[tuple] = []
    for i in range(int(n_merges)):
        n = F.size("syms")
        pairs = F.zip_with(
            F.slice(F.col("syms"), 1, n - 1),
            F.slice(F.col("syms"), 2, n - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        )
        best = (
            words.filter(n >= 2)
            .select("freq", F.explode(pairs).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(),
                     F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((i, a, b, cnt, a + b))
        merged = F.aggregate(
            F.col("syms"),
            F.struct(
                F.array().cast("array<string>").alias("out"),
                F.lit(None).cast("string").alias("carry"),
            ),
            lambda acc, s: F.when(
                acc["carry"].isNotNull()
                & (acc["carry"] == F.lit(a)) & (s == F.lit(b)),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(a + b)))
                    .alias("out"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            ).otherwise(
                F.struct(
                    F.when(
                        acc["carry"].isNotNull(),
                        F.concat(acc["out"], F.array(acc["carry"])),
                    ).otherwise(acc["out"]).alias("out"),
                    s.alias("carry"),
                )
            ),
            lambda acc: F.when(
                acc["carry"].isNotNull(),
                F.concat(acc["out"], F.array(acc["carry"])),
            ).otherwise(acc["out"]),
        )
        words = words.select("freq", merged.alias("syms")).localCheckpoint(
            eager=False
        )
    return spark.createDataFrame(
        merges,
        "merge_idx int, left string, right string, pair_count long, "
        "new_symbol string",
    )


def ccnet_buckets(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  head_frac: float = 1 / 3,
                  mid_frac: float = 1 / 3) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): score every
    document with the corpus unigram LM (``unigram_logprob`` — the
    model-free stand-in for the wiki-LM perplexity), then split the
    corpus into head / middle / tail tertiles by EXACT order statistics
    — the partition CCNet publishes and trainers mix from. Higher
    logprob = more corpus-typical = head.

    The two cut points come from ``sampling.exact_score_quantile``
    (radix-select histograms, no global sort, no approx-percentile
    sketch error) over a milli-nat integer score
    ``round((mean_logprob + 30) * 1000)`` — offset keeps the radix
    domain non-negative 32-bit. Tie-inclusive at each cut (ties go to
    the better bucket), so the split is deterministic under any
    partitioning.

    Output: ``(id_col, n_tokens, mean_logprob, ppl_score, bucket)``.
    """
    from .text import unigram_logprob as _ulp
    from ..operators.sampling import exact_score_quantile

    scored = _ulp(df, text_col=text_col, id_col=id_col).withColumn(
        "ppl_score",
        F.round((F.col("mean_logprob") + F.lit(30.0)) * F.lit(1000.0), 0)
        .cast("long"),
    )
    scored = scored.localCheckpoint(eager=False)  # scored twice below
    t_head, _ = exact_score_quantile(
        scored, "ppl_score", None, keep_frac=head_frac
    )
    t_mid, _ = exact_score_quantile(
        scored, "ppl_score", None, keep_frac=head_frac + mid_frac
    )
    bucket = (
        F.when(F.col("ppl_score") >= F.lit(int(t_head)), F.lit("head"))
        .when(F.col("ppl_score") >= F.lit(int(t_mid)), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.select(
        id_col, "n_tokens", "mean_logprob", "ppl_score",
        bucket.alias("bucket"),
    )


def corpus_datasheet(df: DataFrame, text_col: str = "text",
                     lang_col: str = "lang",
                     source_col: str = "source") -> DataFrame:
    """One-pass corpus summary in long format — the quantitative half
    of a dataset datasheet (Gebru et al. 2021) every release ships:
    document/token/char totals, emptiness, per-language and per-source
    document shares. Exact integers and one rounded ratio per row, so
    the report is hash-reproducible.

    Scale shape: ONE map-side-combined grouping-sets aggregate over a
    single scan (lang and source rollups share the pass via
    grouping sets), output rows = 4 + |langs| + |sources|. No window,
    no join; the token count reuses the whitespace convention
    (with_token_counts).
    """
    toks = F.size(
        F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                 lambda x: F.length(x) > 0)
    ).cast("long")
    base = df.select(
        F.col(lang_col).alias("_lang"),
        F.col(source_col).alias("_src"),
        toks.alias("_t"),
        F.length(F.col(text_col)).cast("long").alias("_c"),
        (F.length(F.trim(F.col(text_col))) == 0).cast("long").alias("_e"),
    )
    agg = base.cube("_lang", "_src").agg(
        F.count("*").alias("n_docs"),
        F.sum("_t").alias("n_tokens"),
        F.sum("_c").alias("n_chars"),
        F.sum("_e").alias("n_empty"),
        # grouping_id disambiguates real NULL key values from rollups
        F.grouping_id().alias("_gid"),
    )
    total = agg.filter(F.col("_gid") == 3)
    by_lang = agg.filter(F.col("_gid") == 1)
    by_src = agg.filter(F.col("_gid") == 2)

    def rows(dfx, key_expr, prefix):
        return dfx.select(
            F.concat(F.lit(prefix), F.coalesce(key_expr, F.lit("null")))
            .alias("metric"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("n_empty").cast("long").alias("n_empty"),
        )

    return (
        rows(total, F.lit("corpus"), "total:")
        .unionByName(rows(by_lang, F.col("_lang"), "lang:"))
        .unionByName(rows(by_src, F.col("_src"), "source:"))
    )


# Default screen categories — a DEMO list (production deployments ship
# their own curated lists; the mechanism, not the list, is the
# operator). Keywords are matched as whole words, case-insensitive.
DEFAULT_KEYWORD_CATEGORIES: dict[str, tuple[str, ...]] = {
    "stock_site": (
        "shutterstock", "getty images", "alamy", "dreamstime",
        "istockphoto",
    ),
    "placeholder": (
        "no image available", "image not found", "coming soon",
        "lorem ipsum",
    ),
    "nsfw": ("nsfw", "explicit content"),
}


def keyword_screen(
    df: DataFrame,
    categories: dict[str, tuple[str, ...]] | None = None,
    text_col: str = "caption",
) -> DataFrame:
    """Category keyword screen over a text/caption column — the
    LAION-style list-based cut (stock-site attributions, placeholder
    alt-text, NSFW terms) as pure JVM regex: one codegen'd
    ``regexp_count`` per category with a word-boundary, case-insensitive
    alternation of ESCAPED literal keywords. No UDF, no shuffle; the
    screen rides the scan like the admission battery (F5-F7), and the
    DuckDB oracle re-counts with the identical RE2-compatible pattern.

    The keyword list is pure CONFIG (callers ship their own curated
    lists; DEFAULT_KEYWORD_CATEGORIES is a demo) — exactly how the
    reference treats its deny/allow regex rules as per-site data.

    Adds ``kw_<category>`` (hit count, long) per category and
    ``kw_flagged`` (any category hit). NULL text → 0 counts, flagged
    false (nothing to screen; emptiness is the quality gate's job).
    """
    import re as _re

    def _bounded(kw: str) -> str:
        # \b only exists at a word/non-word edge: anchor each keyword
        # edge only when that edge IS a word character, so keywords
        # like 'c++' still match as standalone tokens
        pre = r"\b" if _re.match(r"\w", kw) else ""
        suf = r"\b" if _re.search(r"\w$", kw) else ""
        return pre + _re.escape(kw) + suf

    if categories is None:
        categories = DEFAULT_KEYWORD_CATEGORIES
    text = F.coalesce(F.col(text_col), F.lit(""))
    flag = F.lit(False)
    out = df
    for cat in sorted(categories):
        kws = categories[cat]
        if not kws:
            raise ValueError(f"empty keyword list for category {cat!r}")
        pat = "(?i)(?:" + "|".join(
            _bounded(k) for k in sorted(kws)
        ) + ")"
        out = out.withColumn(
            f"kw_{cat}",
            F.regexp_count(text, F.lit(pat)).cast("long"),
        )
        flag = flag | (F.col(f"kw_{cat}") > 0)
    return out.withColumn("kw_flagged", flag)
