"""Deterministic stratified sampling for training-mix assembly.

A pre-training corpus is rarely used whole: the mix recipe says "40% of
the en web text, 100% of books, 5% of low-quality tier …". This module
implements the sampling step the way a 100 TB pipeline must: as a pure
row-local predicate — hash the row's stable key to a uniform number in
[0, 1) and keep it iff u < rate(stratum). No shuffle, no sort, no
driver-side randomness; re-running the job (or resuming half of it)
keeps exactly the same rows, and upsampling a stratum later keeps every
previously-kept row (rates are nested: u < 0.2 ⊂ u < 0.5).

The uniform comes from md5 so the DuckDB oracle reproduces it
bit-for-bit: u = int(hex(md5(key‖salt))[:8], 16) / 2^32 — Spark's
``conv(substring(md5(..), 1, 8), 16, 10)`` ≡ DuckDB's
``('0x' || substr(md5(..), 1, 8))::uint64``. Graft context: the
reference has no sampling stage (it crawls everything); this is one of
the training-data operators the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "uniform_hash",
    "stratified_sample",
    "cap_per_key",
    "temperature_rebalance",
    "exact_score_quantile",
    "quantile_gate",
    "epoch_mix",
]


def uniform_hash(key: Column, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1): first 32 md5 bits of key‖salt.
    Oracle-replicable (see module docstring); changing `salt` draws an
    independent sample."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8),
        16,
        10,
    ).cast("long")
    return h.cast("double") / F.lit(4294967296.0)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
    keep_u: bool = True,
) -> DataFrame:
    """Keep each row with probability `rates[stratum]` (else
    `default_rate`), decided by the row's own key hash. The rate lookup
    folds into one literal CASE expression — the whole operator is a
    single codegen'd filter over the scan, the plan you want on 100 TB
    (predicate evaluated next to the parquet reader; nothing moves).

    `keep_u` surfaces the uniform as ``sample_u`` (rounded to 9 places)
    so audits — and the oracle — can verify the decision per row."""
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(r))).otherwise(rate)
    u = uniform_hash(F.col(key_col), salt=salt)
    out = df.withColumn("sample_u", F.round(u, 9)).filter(u < rate)
    return out if keep_u else out.drop("sample_u")


def cap_per_key(
    df: DataFrame,
    key_col: str = "source",
    k: int = 100,
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
    salt_partitions: int = 16,
    keep_rank: bool = True,
) -> DataFrame:
    """Keep at most `k` rows per `key_col` value, preferring rows first
    in `order_by` (default: ascending `id_col`) — the per-domain quota
    cap every corpus-mix recipe needs ("at most K docs per host so one
    SEO farm can't dominate the corpus").

    Scale shape: an exact top-k per key with a SKEWED key (a giant
    domain can hold 10^8 docs) must not become one rank-window
    partition. Two stages: (1) rank within (key, salt-of-row-id) — the
    hot key's rows spread over `salt_partitions` window partitions, each
    keeping its local top-k, bounding survivors at k·S per key; (2)
    exact rank over that ≤ k·S remnant. Both orders end with the row id,
    so the total order is deterministic and the result equals the
    single-window top-k. `salt_partitions=1` collapses to the plain
    window for small inputs.

    Adds `key_rank` (1-based within key) unless `keep_rank=False`.
    """
    from pyspark.sql import Window

    order = list(order_by) if order_by else []
    order.append(F.col(id_col).asc())
    s = max(int(salt_partitions), 1)
    work = df
    if s > 1:
        w_local = Window.partitionBy(key_col, "_salt").orderBy(*order)
        work = (
            work.withColumn(
                "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(s))
            )
            .withColumn("_lr", F.row_number().over(w_local))
            .filter(F.col("_lr") <= k)
            .drop("_salt", "_lr")
        )
    w = Window.partitionBy(key_col).orderBy(*order)
    out = (
        work.withColumn("key_rank", F.row_number().over(w))
        .filter(F.col("key_rank") <= k)
    )
    return out if keep_rank else out.drop("key_rank")


def temperature_rebalance(
    df: DataFrame,
    alpha: float = 0.5,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "",
    keep_u: bool = True,
) -> DataFrame:
    """Temperature-based corpus rebalancing: downsample each stratum s
    toward the α-smoothed mix p_s ∝ n_s^α (the multilingual-sampling
    rule of mBERT/XLM-R, Conneau et al. 2020 §3). With rates normalized
    so the smallest stratum keeps everything, keep-rate
    r_s = (n_min / n_s)^(1-α): head languages shrink toward the tail
    without any stratum upsampling.

    Exactness: for the default α = 0.5 the keep rule is evaluated as
    ``u·u·n_s < n_min`` (u from `uniform_hash`) — squaring instead of
    square-rooting, so every operation is an IEEE-defined op on
    identical inputs in Spark and the DuckDB oracle: u is an exact
    dyadic (32 md5 bits / 2³²), n_s and n_min are exact int-valued
    doubles, and the product rounds identically → the kept set is
    bit-reproducible across engines. Other α values go through
    `pow` (documented: last-ulp threshold ties are possible across
    engines; fine operationally, not used by the oracle query).

    Scale shape: one tiny groupBy(strata).count() (map-side combined,
    #strata rows) collected to a literal CASE; the sampling itself is a
    row-local codegen'd filter over the scan — no shuffle, no window,
    resume-stable, nested under re-sampling with a different salt.

    Adds ``rebalance_rate`` (round 6) and ``sample_u`` (round 9, unless
    `keep_u=False`) to the kept rows.
    """
    # NULL strata carry no meaningful n_s (and would break the sorted()
    # below): drop null-stratum rows explicitly, like a groupBy would
    # isolate them — a corpus with unlabeled language rows must label
    # them (e.g. "und") before rebalancing.
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).count().collect()
        if r[0] is not None
    }
    if not counts:
        return df.withColumn("rebalance_rate", F.lit(0.0)).withColumn(
            "sample_u", F.lit(0.0)
        ).limit(0)
    df = df.filter(F.col(strata_col).isNotNull())
    n_min = float(min(counts.values()))
    n_s = F.lit(0.0)
    for stratum, c in sorted(counts.items()):
        n_s = F.when(F.col(strata_col) == stratum, F.lit(float(c))).otherwise(n_s)
    u = uniform_hash(F.col(key_col), salt=salt)
    if alpha == 0.5:
        keep = (u * u) * n_s < F.lit(n_min)
        rate = F.sqrt(F.lit(n_min) / n_s)
    else:
        rate = F.pow(F.lit(n_min) / n_s, F.lit(1.0 - float(alpha)))
        keep = u < rate
    out = (
        df.withColumn("rebalance_rate", F.round(rate, 6))
        .withColumn("sample_u", F.round(u, 9))
        .filter(keep)
    )
    return out if keep_u else out.drop("sample_u")


def domain_quality_gate(
    df: DataFrame,
    key_col: str = "source",
    score_col: str = "score_milli",
    min_docs: int = 100,
    tau_milli: int = 500,
) -> DataFrame:
    """URL/domain-level curation (RefinedWeb-style): block every document
    from a domain whose MEAN quality score is below threshold once the
    domain has enough documents to judge (small domains pass -- no
    evidence, no verdict).

    The reference has no corpus-level notion of source quality at all
    (its per-site workers ARE the quality judgment, hand-written); at
    web scale the judgment must be computed, and it must be computed per
    DOMAIN -- spam farms are domain-shaped, not document-shaped.

    Exactness contract: ``score_col`` is an INTEGER (milli-units), so
    the verdict is pure int64 math -- `sum(score) < tau * n` instead of
    a float mean compare -- and therefore bit-reproducible across
    engines and partitionings (no IEEE summation-order dependence at
    the threshold). The reported ``domain_mean_milli`` is one IEEE
    division + round(6), display-only.

    Scale shape: one map-side-combining groupBy over the corpus collapses
    to #domains rows; the verdict joins back as a broadcast dim. No
    window, no sort, no Python.
    """
    n = F.count(F.lit(1)).cast("long")
    s = F.sum(F.col(score_col).cast("long"))
    stats = df.groupBy(key_col).agg(
        n.alias("domain_docs"), s.alias("_sum_milli")
    )
    verdict = stats.select(
        key_col,
        "domain_docs",
        F.round(F.col("_sum_milli").cast("double") / F.col("domain_docs"), 6)
        .alias("domain_mean_milli"),
        (
            (F.col("domain_docs") >= F.lit(int(min_docs)))
            & (F.col("_sum_milli") < F.lit(int(tau_milli)) * F.col("domain_docs"))
        ).alias("domain_blocked"),
    )
    return df.join(F.broadcast(verdict), key_col)


def train_val_test_split(
    df: DataFrame,
    key_col: str = "doc_id",
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Deterministic, leakage-safe train/val/test assignment: split =
    a pure function of md5(key), never of row order or partitioning --
    re-running over a grown corpus keeps every old row's assignment
    (downstream eval sets stay frozen), and keying by a DEDUP CLUSTER id
    instead of doc_id makes near-duplicates land in the same split (the
    standard contamination guard; pair with graph.py's cluster ids).

    Interval layout: [0, test) -> test, [test, test+val) -> val, rest
    train -- growing test_frac only PROMOTES val/train rows into test
    (monotone, like stratified_sample's nested-rate property). Adds
    `split` and `split_u` (round 9). Shuffle-free codegen'd expressions.
    """
    u = uniform_hash(F.col(key_col), salt=salt)
    split = (
        F.when(u < float(test_frac), "test")
        .when(u < float(test_frac) + float(val_frac), "val")
        .otherwise("train")
    )
    return df.withColumn("split", split).withColumn(
        "split_u", F.round(u, 9)
    )


def exact_score_quantile(
    df: DataFrame,
    score_col: str,
    n_keep: int | None,
    keep_frac: float = 0.0,
) -> tuple[int, int]:
    """Exact distributed order statistic WITHOUT a global sort: the
    threshold T such that at least ``n_keep`` rows have
    ``score >= T`` (the largest such integer score) — radix-select over
    the integer score domain:

      1. ``groupBy(score >> 16)`` histogram — one partial-aggregating
         shuffle of ≤ 65,536 tiny rows regardless of corpus size or
         score cardinality; a descending driver scan finds the 16-bit
         bucket holding the n_keep-th largest score.
      2. ``groupBy(score)`` WITHIN that one bucket (filter pushed to
         the scan) — again ≤ 65,536 rows; a second descending scan
         pins T exactly.

    Two jobs, two O(65k) driver collects, exact for any n — the
    pattern a top-X%-by-quality gate needs where approx_percentile's
    error is a curation-policy bug and a global sort is a 100 TB
    shuffle.

    Contract: scores must be non-negative 32-BIT integers (the
    engine's milli-score idiom) — the ≤65,536-bucket bound of the
    coarse histogram holds only for a 2×16-bit split; a wider domain
    would make the driver collect unbounded, so it raises instead
    (rescale the score, or add a radix level). NULL scores are
    unscored: they never survive a top cut and are excluded from n.

    ``n_keep=None`` derives k as ``ceil(keep_frac × n)`` from the
    coarse histogram's own total — no separate count() pass.
    Returns (T, n_total).
    """
    import math

    df = df.filter(F.col(score_col).isNotNull())
    hi_col = F.floor(F.col(score_col) / F.lit(65536)).cast("long")
    hist = (
        df.groupBy(hi_col.alias("_hi")).agg(F.count("*").alias("_c"))
        .collect()
    )
    buckets = sorted(((r["_hi"], r["_c"]) for r in hist), reverse=True)
    if buckets and (buckets[0][0] > 65535 or buckets[-1][0] < 0):
        raise ValueError(
            "score domain too wide for one radix level (scores must be "
            f"non-negative and < 2^32; saw coarse bucket {buckets[0][0]} "
            f"… {buckets[-1][0]}). The ≤65,536-row bounded-collect "
            "contract breaks beyond 32 bits — rescale the score column."
        )
    n_total = sum(c for _, c in buckets)
    if n_total == 0:
        return 0, 0
    if n_keep is None:
        n_keep = math.ceil(keep_frac * n_total)
    k = min(max(n_keep, 1), n_total)
    seen = 0
    target_hi = buckets[-1][0]
    for hi, c in buckets:
        if seen + c >= k:
            target_hi = hi
            break
        seen += c
    fine = (
        df.filter(hi_col == F.lit(target_hi))
        .groupBy(F.col(score_col).alias("_s"))
        .agg(F.count("*").alias("_c"))
        .collect()
    )
    thr = None
    for s, c in sorted(((r["_s"], r["_c"]) for r in fine), reverse=True):
        seen += c
        thr = s
        if seen >= k:
            break
    return int(thr), n_total


def quantile_gate(
    df: DataFrame,
    score_col: str = "score_milli",
    keep_top_frac: float = 0.3,
) -> DataFrame:
    """DataComp-style curation cut: keep the top ``keep_top_frac`` of
    rows by integer score, EXACTLY and deterministically. The threshold
    comes from ``exact_score_quantile`` (radix-select, no sort, no
    sketch); the gate itself is one codegen'd ``score >= T`` scan with
    T a literal, so the data pass is filter-pushdown-friendly.

    Tie-inclusive: every row tied at the cut survives (at least
    ``ceil(keep_top_frac * n)`` rows pass; never an arbitrary
    partition-order-dependent drop among equals — required for the
    resume/oracle determinism contracts). NULL scores never pass (an
    unscored row cannot be in any top fraction). Adds
    ``score_threshold``. Three data passes total: coarse histogram
    (which also yields n — no separate count job), fine histogram,
    literal filter.
    """
    thr, n_total = exact_score_quantile(
        df, score_col, n_keep=None, keep_frac=keep_top_frac
    )
    if n_total == 0:
        return df.filter(F.col(score_col).isNotNull()).withColumn(
            "score_threshold", F.lit(0).cast("long")
        )
    return df.filter(F.col(score_col) >= F.lit(thr)).withColumn(
        "score_threshold", F.lit(thr).cast("long")
    )


def epoch_mix(
    df: DataFrame,
    targets: dict[str, int],
    max_epochs: int = 4,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "epoch",
) -> DataFrame:
    """Data-constrained training mix with REPEATS (the upsampling dual
    of ``temperature_rebalance``): each stratum s with n_s rows and a
    row target t_s contributes ``min(t_s, max_epochs * n_s)`` samples —
    the epoch cap is the Muennighoff et al. 2023 ("Scaling
    Data-Constrained Language Models") finding that repeating data
    beyond ~4 epochs stops buying loss. Whole epochs replicate every
    row; the fractional remainder epoch keeps rows whose md5 uniform
    (``uniform_hash``, the module's shared primitive) falls under
    ``(eff mod n_s) / n_s`` — deterministic per row, shuffle-free,
    resume-stable, oracle-replicable.

    Strata absent from ``targets`` (or with target <= 0), and NULL
    strata, are excluded — the mix is an explicit allocation, not a
    passthrough (NULLs sort out before the driver map per the
    temperature_rebalance NULL lesson).

    Scale shape: one hash-groupBy for the O(strata) count map (driver
    literals), then ONE codegen'd projection: CASE lookups + the hash
    compare + ``explode(sequence(0, n_repeats-1))`` — row-local fan-out
    next to the scan, no shuffle, no window.

    Adds ``n_repeats`` (this row's emitted copies, 0-rows filtered) and
    ``epoch`` (0-based copy index); every input column is preserved.
    """
    if max_epochs < 1:
        raise ValueError("max_epochs must be >= 1")
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
        if r[strata_col] is not None
    }
    plans: dict[str, tuple[int, float]] = {}
    for s, tgt in sorted(targets.items()):
        n = counts.get(s)
        if not n or tgt is None or int(tgt) <= 0:
            continue
        eff = min(int(tgt), max_epochs * n)
        plans[s] = (eff // n, (eff % n) / n)
    if not plans:
        return (
            df.withColumn("n_repeats", F.lit(0))
            .withColumn("epoch", F.lit(0))
            .filter(F.lit(False))
        )
    full_expr = F.lit(None).cast("int")
    rate_expr = F.lit(None).cast("double")
    for s, (full, rate) in plans.items():
        cond = F.col(strata_col) == s
        full_expr = F.when(cond, F.lit(full)).otherwise(full_expr)
        rate_expr = F.when(cond, F.lit(rate)).otherwise(rate_expr)
    u = uniform_hash(F.col(key_col), salt=salt)
    n_rep = (
        full_expr + (u < rate_expr).cast("int")
    ).alias("n_repeats")
    return (
        df.withColumn("n_repeats", n_rep)
        .filter(F.col("n_repeats") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("n_repeats") - 1))
        )
    )
