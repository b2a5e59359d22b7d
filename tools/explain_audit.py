"""Physical-plan audit: `.explain("formatted")` for the headline queries
with automated checks that the plans have the shape a 100 TB deployment
needs — filters pushed to the parquet scan, pruned read schemas, joins
broadcast where a side is tiny, whole-stage codegen on the hot JVM path.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
Prints PASS/WARN per check and the full plan on WARN.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# query -> list of (check_name, regex that must appear in the plan)
CHECKS: dict[str, list[tuple[str, str]]] = {
    # doc_id < N filter must reach the scan; only needed columns read
    "minhash_signatures": [
        ("filter pushed to scan", r"PushedFilters: \[.*LessThan\(doc_id"),
        ("column pruning", r"ReadSchema: [^\n]*doc_id[^\n]*text"),
        ("codegen", r"\*\(\d+\)"),
    ],
    "token_counts": [
        ("column pruning (no unneeded cols)", r"ReadSchema: [^\n]*text"),
        ("codegen", r"\*\(\d+\)"),
    ],
    "embedding_topk": [
        ("query side filtered at scan", r"PushedFilters: \[.*LessThan\(vec_id"),
        ("broadcast of small query side", r"Broadcast"),
    ],
    "frontier_dedup_anti": [
        ("anti join present", r"LeftAnti"),
        ("seen side filter pushed", r"PushedFilters: \[.*GreaterThan\(p_size"),
    ],
    "sessionize": [
        ("single shuffle for window+agg", r"hashpartitioning\(user_id"),
        ("codegen", r"\*\(\d+\)"),
    ],
    "admission_filter": [
        ("admission predicates in scan/filter", r"PushedFilters"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # SRP hyperplane weights must be literal arrays — NO md5 evaluated
    # per row in the bucket expression (verified by absence)
    "embedding_near_dup": [
        ("bucket equi-join (no cross join)", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no per-row md5 in bucket expr", r"!md5\("),
    ],
    "ngram_jaccard": [
        ("doc slice pushed to scan", r"PushedFilters: \[.*LessThan\(doc_id"),
        ("lang blocking key in join", r"lang"),
    ],
    "handler_route": [
        ("single codegen'd projection", r"\*\(\d+\)"),
        ("column pruning", r"ReadSchema: [^\n]*p_partkey"),
    ],
    # per-host politeness (P8 at scale): the round serialization must be
    # window-partitioned (host rank + pop_rank tiers) with the tier
    # offsets broadcast back — NO unpartitioned window over the work
    # list (the r2 defect), NO sort of the whole frontier
    "per_host_rounds": [
        ("host-partitioned rank window", r"Window.*\[host#\d+\]"),
        ("tier-partitioned interleave window", r"Window.*\[pop_rank#\d+\]"),
        ("tier offsets broadcast", r"Broadcast"),
        ("no unpartitioned window", r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
    ],
    "cookie_harvest": [
        ("header parse fully codegen'd (no UDF)", r"!BatchEvalPython|ArrowEvalPython"),
        ("generator explode of set_cookies", r"Generate posexplode"),
    ],
    # LAION-style joint gate: pure JVM expressions, single phash window
    "image_caption_filter": [
        ("no Python in the gate", r"!BatchEvalPython|ArrowEvalPython"),
        ("phash-partitioned dedup window", r"hashpartitioning\(phash"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # Gopher repetition signals: a pure map over the scan — no shuffle,
    # no Python, doc slice pushed down
    "repetition_stats": [
        ("doc slice pushed to scan", r"PushedFilters: \[.*LessThan\(doc_id"),
        ("no shuffle (pure scan pass)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # decontamination: eval n-gram set broadcast; the big training side
    # must probe it with a broadcast hash join, never sort-merge
    "decontaminate": [
        ("eval grams broadcast-joined", r"BroadcastHashJoin"),
        ("no sort-merge of the corpus side", r"!SortMergeJoin"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # stratified sampling: one codegen'd filter next to the scan —
    # nothing moves, nothing shuffles
    "training_mix_sample": [
        ("no shuffle (pure filter)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # line-level corpus dedup: winner selection must be a PARTIAL hash
    # aggregate (map-side combine collapses hot boilerplate lines), not
    # a rank window over the line key; no Python anywhere
    "line_dedup": [
        ("doc slice pushed to scan", r"PushedFilters: \[.*LessThan\(doc_id"),
        ("map-side partial min of (doc_id,pos)", r"partial_min"),
        ("no window over the line key", r"!windowspecdefinition\(_k#"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # per-domain quota cap: both rank windows must be partitioned (the
    # salted local stage and the exact final stage) — no global sort,
    # no unpartitioned window
    "domain_cap": [
        ("salted local window", r"windowspecdefinition\(source#\d+, _salt#"),
        ("exact final window on source", r"Window.*\[source#\d+\]"),
        ("no unpartitioned window", r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # chunking: a pure generator pass over the scan — explode of the
    # chunk-index sequence, whole-array slices, nothing moves
    "doc_chunk": [
        ("generator explode of chunk starts", r"Generate explode"),
        ("no shuffle (pure scan pass)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # sequence packing: the global prefix sum must decompose — every
    # window partitioned by _pid, partition-total prefix broadcast back,
    # never a single-partition window over the corpus
    "sequence_pack": [
        ("cumsum window partitioned by _pid", r"Window.*\[_pid#\d+\]"),
        ("no unpartitioned window", r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
        ("partition-total prefix broadcast", r"BroadcastHashJoin"),
    ],
    # exact top-fraction cut: the data pass must be a codegen'd literal
    # filter — the order statistic came from radix-select histograms,
    # never a global sort or a rank window over the corpus
    "quality_quantile_gate": [
        ("codegen'd literal gate", r"\*\(\d+\)"),
        ("no global sort", r"!\bSort \["),
        ("no corpus-wide window", r"!windowspecdefinition"),
    ],
    # image eval-set decontamination: eval band keys broadcast (corpus
    # never shuffles for candidacy), banned ids removed by anti-join,
    # all hamming math JVM-side
    "image_decontaminate": [
        ("eval band keys broadcast-joined", r"BroadcastHashJoin"),
        ("banned ids removed via anti-join", r"LeftAnti"),
        ("no cartesian / nested-loop join",
         r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # caption boilerplate: frequency via hash-groupBy with map-side
    # combine, surviving frequent set broadcast back — the corpus is
    # never shuffled and a mega-caption never lands on one reducer
    "caption_boilerplate": [
        ("map-side partial count", r"partial_count"),
        ("frequent set broadcast back", r"BroadcastHashJoin"),
        ("no corpus-wide window", r"!windowspecdefinition"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # low-information gate: ONE Arrow pass computes the signals, the
    # verdict is a codegen'd JVM expression, nothing moves
    "image_quality_gate": [
        ("single Arrow stats pass", r"ArrowEvalPython|MapInPandas"),
        ("no shuffle (row-local signals)", r"!Exchange"),
        ("codegen'd verdict", r"\*\(\d+\)"),
    ],
    # PSNR pair verification: candidate-sized equi-joins attach bytes,
    # then exactly ONE Arrow decode pass
    "psnr_verify": [
        ("candidate equi-joins",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no cartesian / nested-loop join",
         r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("single Arrow decode pass", r"MapInPandas"),
    ],
    # pagerank-driven P2: the doubling tiers must be one codegen'd CASE
    # over the scaled rank; the rank join must be an equi-join
    "pagerank_priority": [
        ("rank join is an equi-join",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("codegen'd tier CASE", r"\*\(\d+\)"),
        ("no rank-ordering window", r"!windowspecdefinition"),
    ],
    # keep-best representative: winner via max(struct)+join+min(id) —
    # a spam mega-cluster must never become one rank-window partition
    "cluster_representatives": [
        ("partial-agg winner selection", r"partial_max"),
        ("no window at all", r"!Window"),
    ],
    # hard negatives: SRP bucket equi-join candidates (never all-pairs,
    # no per-row md5), rank window keyed on the maximal-cardinality
    # anchor id only
    "hard_negative_mine": [
        ("bucket equi-join (no cross join)",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no per-row md5 in bucket expr", r"!md5\("),
        ("rank window on anchor id", r"windowspecdefinition\(anchor_id"),
    ],
    # shard manifest: offsets from the distributed prefix sum (partition
    # totals broadcast), signature fold inside a hash aggregate bounded
    # by the shard byte cap — no rank window on the shard id
    "shard_manifest": [
        ("manifest is a hash aggregate", r"HashAggregate"),
        ("partition-total prefix broadcast", r"BroadcastHashJoin"),
        ("no rank window on shard id", r"!windowspecdefinition\(shard_idx"),
    ],
    # grouped prefix sum: the in-bucket rank window must be keyed by
    # (physical partition, bucket) — a bare partitionBy(bucket_id) would
    # funnel a popular aspect (a corpus-scale mega-bucket) into one task
    "aspect_bucket_batches": [
        ("rank window keyed by (_pid, bucket)",
         r"Window.*\[_pid#\d+, bucket_id#\d+\]"),
        ("no bucket-only window partitioning",
         # a regressed partitionBy(bucket_id) puts bucket_id FIRST in
         # windowspecdefinition; the good plan leads with _pid (no '$'
         # anchor — checks run without re.MULTILINE)
         r"!windowspecdefinition\(bucket_id#\d+,"),
        ("grouped-prefix offsets broadcast", r"BroadcastHashJoin"),
    ],
    # conflict-free batch layout: the global layout rank comes from the
    # distributed prefix sum — the cumulative window is keyed by the
    # physical partition, never a bare orderBy (which would funnel the
    # corpus through one task); offsets join back broadcast
    "contrastive_batches": [
        ("rank window keyed by _pid", r"windowspecdefinition\(_pid#\d+"),
        ("no unpartitioned window",
         r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
        ("prefix offsets broadcast", r"BroadcastHashJoin"),
        ("no cartesian / nested-loop join",
         r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # manifest diff: one full-outer equi-join of manifest-sized sides
    "manifest_diff": [
        ("equi-join of the manifests",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no cartesian / nested-loop join",
         r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # CCNet partition: thresholds are radix-select literals; the final
    # labeling pass is codegen'd over the checkpoint-backed scores
    "ccnet_buckets": [
        ("codegen'd literal labeling", r"\*\(\d+\)"),
        ("no corpus-wide window", r"!windowspecdefinition"),
        ("no global sort", r"!\bSort \["),
    ],
    # orientation normalize: one Arrow pass, row-local
    "image_orientation": [
        ("one Arrow orientation pass", r"MapInPandas"),
        ("no shuffle", r"!Exchange"),
        ("no row-at-a-time Python", r"!BatchEvalPython"),
    ],
    # datasheet: one grouping-sets aggregate over a single scan
    "corpus_datasheet": [
        ("grouping-sets hash aggregate", r"HashAggregate|ObjectHashAggregate"),
        ("no window", r"!windowspecdefinition"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # privacy flagship: chained Arrow passes, zero shuffle
    "privacy_pipeline": [
        ("chained Arrow passes", r"MapInPandas"),
        ("no shuffle", r"!Exchange"),
        ("no row-at-a-time Python", r"!BatchEvalPython"),
    ],
    # speech flagship: three chained Arrow passes, zero shuffle
    "speech_pipeline": [
        ("chained Arrow passes", r"MapInPandas"),
        ("no shuffle", r"!Exchange"),
        ("no row-at-a-time Python", r"!BatchEvalPython"),
    ],
    # audio trim: one Arrow container pass, row-local
    "audio_trim": [
        ("one Arrow trim pass", r"MapInPandas"),
        ("no shuffle", r"!Exchange"),
        ("no row-at-a-time Python", r"!BatchEvalPython"),
    ],
    # epoch shuffle: within-shard window (shard-cap bounded) + a
    # distinct-shard-only two-stage rank (range partition + _pid-keyed
    # window + broadcast prefix offsets) — corpus never funnels and
    # even the bounded shard dim plans no single-partition WindowExec
    "epoch_shard_order": [
        ("within-shard rank window", r"windowspecdefinition\(shard_idx"),
        ("shard rank keyed by _pid", r"windowspecdefinition\(_pid#\d+"),
        ("shard ranks broadcast back", r"BroadcastHashJoin"),
        ("no unpartitioned window",
         r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # layout flagship: after the checkpoint-truncated CC, the plan is
    # the contrastive layout — same invariants as contrastive_batches
    "layout_pipeline": [
        ("rank window keyed by _pid", r"windowspecdefinition\(_pid#\d+"),
        ("no unpartitioned window",
         r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
        ("prefix offsets broadcast", r"BroadcastHashJoin"),
        ("no cartesian / nested-loop join",
         r"!CartesianProduct|BroadcastNestedLoopJoin"),
    ],
    # span map: prefix-sum machinery (partitioned window + broadcast
    # offsets) then a row-local explode — no extra shuffle, no Python
    "sequence_spans": [
        ("rank window keyed by _pid", r"windowspecdefinition\(_pid#\d+"),
        ("no unpartitioned window",
         r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
        ("prefix offsets broadcast", r"BroadcastHashJoin"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # trace compliance audit: one map-side-combined groupBy + an
    # optional broadcast override dim — no window, no Python
    "politeness_audit": [
        ("hash aggregate over the trace", r"HashAggregate"),
        ("override dim broadcast", r"BroadcastHashJoin"),
        ("no window", r"!windowspecdefinition"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # text-overlay screen: one Arrow pass + codegen'd verdict
    "text_overlay_gate": [
        ("one Arrow stats pass", r"ArrowEvalPython"),
        ("no shuffle", r"!Exchange"),
        ("no row-at-a-time Python", r"!BatchEvalPython"),
    ],
    # archive read-back: segment assembly is one hash aggregate, the
    # parse one Arrow fan-out pass — no rank window, no cartesian
    "warc_roundtrip": [
        ("one Arrow parse pass", r"MapInPandas"),
        ("segment assembly is a hash aggregate",
         r"HashAggregate|ObjectHashAggregate|SortAggregate"),
        ("no rank window", r"!windowspecdefinition\(seg_id"),
        ("no cartesian / nested-loop join",
         r"!CartesianProduct|BroadcastNestedLoopJoin"),
    ],
    # repeat mix: counts collapse to driver literals; the projection +
    # sequence explode is one codegen'd scan — no join, no shuffle
    "epoch_mix": [
        ("no join (plan is literal CASEs)", r"!Join"),
        ("no shuffle (single scan)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # JPEG container scrub: one Arrow pass over the bytes column,
    # row-local — nothing shuffles
    "jpeg_meta_scrub": [
        ("one Arrow container pass", r"MapInPandas"),
        ("no shuffle", r"!Exchange"),
        ("no row-at-a-time Python", r"!BatchEvalPython"),
    ],
    # retrieval eval: the broadcast cross join is the documented
    # bounded-eval-slice shape (|eval|², never the corpus); the image
    # encoder is one Arrow pass and the rank window is keyed per query
    "crossmodal_recall": [
        ("Arrow image-encoder pass", r"ArrowEvalPython"),
        ("query side broadcast (bounded eval cross)",
         r"BroadcastNestedLoopJoin"),
        ("rank window keyed by query", r"windowspecdefinition\(query_id"),
        ("no row-at-a-time Python", r"!BatchEvalPython"),
    ],
    # BM25: corpus stats were collapsed to literals at plan-build time —
    # the scoring pass is one codegen'd scan, no join, no shuffle
    "bm25_rank": [
        ("no join (stats inlined as literals)", r"!Join"),
        ("no shuffle (single scan)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # audio: Arrow-batched UDFs over the binary column, zero shuffle
    "audio_features": [
        ("Arrow-batched UDF", r"ArrowEvalPython"),
        ("no row-at-a-time Python", r"!BatchEvalPython"),
        ("no shuffle", r"!Exchange"),
    ],
    # minhash end-to-end: candidates from the band-key equi-join (the
    # final CC-assignment scan is checkpoint-backed; the BAND join shape
    # is what must never regress to all-pairs)
    "minhash_band_join": [
        ("band-key equi-join", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no cartesian / nested-loop join", r"!CartesianProduct|BroadcastNestedLoopJoin"),
    ],
    # ANN recall evaluator: the exact side's query×corpus crossing is the
    # DOCUMENTED bounded shape (broadcast K-row query side); the rankings
    # must stay query-partitioned and the LSH side an equi-join
    "ann_recall": [
        ("query side broadcast", r"Broadcast"),
        ("bucket equi-join on the LSH side", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("rank windows partitioned by query", r"Window.*\[query_id#\d+L?\]"),
    ],
    # augmentation: relational op fan-out above one Arrow pass
    "image_augment": [
        ("relational explode of the op list", r"Generate explode"),
        ("Arrow-batched pixel pass", r"ArrowEvalPython|MapInPandas"),
        ("no shuffle", r"!Exchange"),
    ],
    # one PageRank power-iteration step (audited on a synthetic graph —
    # the entry query returns a post-run checkpoint scan)
    "pagerank_iteration": [
        ("ranks equi-joined to edges", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no cartesian / nested-loop join", r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("map-side partial sum of contributions", r"partial_sum"),
    ],
    # one connected-components propagation step (see _cc_iteration_plan:
    # the dedup_clusters entry query returns a post-run checkpoint scan,
    # so the per-iteration plan shape is audited on a synthetic graph)
    "cc_iteration": [
        ("equi join on node id", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no cartesian / nested-loop join", r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("map-side partial min", r"partial_min"),
    ],
    # anchor-text rollup: pre-agg with map-side combine, then rank
    # window + final agg BOTH partitioned by target — one shuffle key,
    # never an unpartitioned window
    "anchor_text_agg": [
        ("map-side partial count", r"partial_count"),
        ("target-partitioned rank window", r"Window.*\[target_url#\d+\]"),
        ("no unpartitioned window", r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # recrawl scheduling: the lag window must be partitioned by url
    # (millions of independent partitions), aggregates partial
    "recrawl_schedule": [
        ("url-partitioned lag window", r"Window.*\[url#\d+\]"),
        ("no unpartitioned window", r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
        ("map-side partial aggregates", r"partial_count"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # sitemap parsing: a pure generator pass over the scan — posexplode
    # of the block list, per-field regexp, nothing moves
    "sitemap_parse": [
        ("generator posexplode of blocks", r"Generate posexplode"),
        ("no shuffle (pure parse pass)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # unigram LM score: corpus total inlined as a literal (driver
    # 1-row aggregate), token counts equi-joined back — never cartesian
    "unigram_logprob": [
        ("token-count equi-join", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no cartesian / nested-loop join", r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("map-side partial count", r"partial_count"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # robots Sitemap: discovery — a pure generator pass per host row
    "robots_sitemaps": [
        ("generator posexplode of directives", r"Generate posexplode"),
        ("no shuffle (pure parse pass)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # tf-idf keywords: tf/df aggregates with map-side combine, df
    # equi-joined back, rank window partitioned by doc
    "tfidf_keywords": [
        ("map-side partial count", r"partial_count"),
        ("df equi-join", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no cartesian / nested-loop join", r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("doc-partitioned rank window", r"Window.*\[doc_id#\d+L?\]"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # aspect bucketing: argmin via array_min of literal structs — one
    # codegen'd map, nothing moves
    "aspect_bucket": [
        ("no shuffle (pure map)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # throttle backoff: last-throttle per host must be a partial-agg
    # max(struct), never a rank window over the pages history
    "backoff_blocked": [
        ("map-side partial max(struct)", r"partial_max"),
        ("no window", r"!Window"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # temperature rebalance: row-local codegen'd filter over the scan —
    # the only exchange in the whole plan is the tiny driver-side
    # count() that ran before plan-build (not in this plan at all)
    "lang_rebalance": [
        ("no shuffle (row-local keep rule)", r"!Exchange"),
        ("no window", r"!Window"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # duplicated-span masking: gram frequency must partial-aggregate
    # map-side; marking is an equi-join (AQE may broadcast); coverage
    # folds back with a partial-agg groupBy — no window, no Python
    "dup_span_mask": [
        ("map-side partial gram count", r"partial_count"),
        ("gram equi-join", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no cartesian / nested-loop join", r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no window", r"!Window"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # vocab top-k: global top-k must be a bounded heap merge, never a
    # full sort; token counting must partial-aggregate map-side
    "vocab_topk": [
        ("top-k via TakeOrderedAndProject", r"TakeOrderedAndProject"),
        ("map-side partial token count", r"partial_count"),
        ("no global Sort before the limit", r"!Sort \[cnt"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # CLIP-style gate: ONE Arrow batch pass for the image side, the
    # caption side and the cosine fully codegen'd, zero joins/shuffles
    "clip_score_filter": [
        ("single Arrow pass (image encoder)", r"ArrowEvalPython"),
        ("no row-at-a-time Python", r"!BatchEvalPython"),
        ("no shuffle (row-local score)", r"!Exchange"),
        ("no join", r"!Join"),
    ],
    # trap signals must be evaluable inside the admission battery:
    # row-local expressions only — no shuffle, no Python, no join
    "url_traps": [
        ("no shuffle (row-local signals)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("no join", r"!Join"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # rendezvous sharding: argmax over a literal candidate array —
    # row-local, no shuffle, no join
    "host_shard": [
        ("no shuffle (row-local argmax)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("no join", r"!Join"),
    ],
    # magic-byte sniff: one byte-slice + CASE chain next to the scan
    "mime_sniff": [
        ("no shuffle (pure scan pass)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # WARC offsets: cumsum window must be partition-local (_pid) with
    # the partition-total prefix broadcast back — never a global-order
    # window over the archive
    "warc_export": [
        ("pid-partitioned cumsum window", r"Window.*\[_pid#\d+\]"),
        ("partition totals broadcast", r"Broadcast"),
        ("no unpartitioned window", r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # CDX keys ride the WARC offset plan: cumsum window stays
    # partition-local, SURT transform adds no Python and no extra shuffle
    "cdx_index": [
        ("pid-partitioned cumsum window", r"Window.*\[_pid#\d+\]"),
        ("partition totals broadcast", r"Broadcast"),
        ("no unpartitioned window", r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # DUST key: row-local regex/array expressions only
    "dust_normalize": [
        ("no shuffle (row-local key)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("no join", r"!Join"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # snapshot diff: ONE equi-join on the url key, verdict is a CASE
    "snapshot_diff": [
        ("full-outer equi-join", r"FullOuter"),
        ("no window", r"!Window"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # RFC 9309 longest match: precedence via partial-agg max(struct),
    # rules broadcast both ways — never a window or global sort
    "robots_longest_match": [
        ("rule dim broadcast", r"BroadcastHashJoin"),
        ("partial-agg precedence", r"partial_max"),
        ("no window", r"!Window"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # boilerplate lines: explode → codegen'd classify → one fold-back agg
    "boilerplate_lines": [
        ("line explode generator", r"Generate posexplode"),
        ("no window", r"!Window"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # Hamilton apportionment: remainder rank must be the range-
    # partitioned decomposition, never one window over all hosts
    "budget_apportion": [
        ("pid-partitioned rank window", r"Window.*\[_pid#\d+\]"),
        ("partition-count prefix broadcast", r"Broadcast"),
        ("no unpartitioned window", r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # BPE pairs: map-side-combined count + top-k via TakeOrdered;
    # the rank window runs over <= k rows (post-limit), like vocab_topk
    "bpe_pairs": [
        ("top-k via TakeOrderedAndProject", r"TakeOrderedAndProject"),
        ("map-side partial pair count", r"partial_count"),
        ("no global Sort before the limit", r"!Sort \[cnt"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # letterbox: ONE Arrow batch pass, nothing else moves
    "image_letterbox": [
        ("single Arrow pass (mapInPandas)", r"MapInPandas"),
        ("no shuffle", r"!Exchange"),
        ("no join", r"!Join"),
    ],
    # latency budgets: sufficient statistics via map-side combine
    "latency_budgets": [
        ("map-side partial agg", r"partial_(count|sum)"),
        ("no window", r"!Window"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # int8 quantization: row-local array transforms only
    "embedding_quantize": [
        ("no shuffle (row-local transform)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("no join", r"!Join"),
    ],
    # DUST param mining: explode + two map-side-combined aggregations
    "param_relevance": [
        ("map-side partial agg", r"partial_"),
        ("no window", r"!Window"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("no join", r"!Join"),
    ],
    # rel=canonical: one codegen'd regex projection next to the scan
    "canonical_alias": [
        ("no shuffle (pure scan pass)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # SQ8 top-k: broadcast query side; rank window partitioned by query
    "quantized_topk": [
        ("query side broadcast", r"Broadcast"),
        ("query-partitioned rank window", r"Window.*\[query_id#\d+L?\]"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # revisit records: one equi-join + the pid-partitioned offset sum
    "warc_revisit": [
        ("pid-partitioned cumsum window", r"Window.*\[_pid#\d+\]"),
        ("no unpartitioned window", r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # PNG scrub: one Arrow pass, nothing else moves
    "image_meta_scrub": [
        ("single Arrow pass (mapInPandas)", r"MapInPandas"),
        ("no shuffle", r"!Exchange"),
        ("no join", r"!Join"),
    ],
    # CDC: one Arrow pass fanning out chunks; no shuffle, no join
    "cdc_chunks": [
        ("single Arrow pass (mapInPandas)", r"MapInPandas"),
        ("no shuffle", r"!Exchange"),
        ("no join", r"!Join"),
    ],
    # crawl→archive composite final stage (the pre-checkpoint winner
    # aggregate is audited separately as archive_dedup_stage — the
    # localCheckpoint inside warc_records truncates the visible lineage)
    "archive_pipeline": [
        ("pid-partitioned cumsum window", r"Window.*\[_pid#\d+\]"),
        ("no unpartitioned window", r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # trap filter → dust key → first-wins winner: the alias dedup must
    # collapse map-side (partial min), never rank over the key
    "archive_dedup_stage": [
        ("winner via map-side partial min", r"partial_min"),
        ("no window", r"!Window"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # consensus pairs: candidates from the band equi-join, never a
    # cartesian product of the corpus
    "image_consensus": [
        ("band-key equi-join", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no cartesian / nested-loop join", r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no row-at-a-time Python", r"!BatchEvalPython"),
    ],
    # frontier age: sufficient statistics via map-side combine
    "frontier_age": [
        ("map-side partial agg", r"partial_(count|min|max|sum)"),
        ("no window", r"!Window"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # dataset split: one codegen'd projection next to the scan
    "dataset_split": [
        ("no shuffle (pure projection)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # domain gate: verdict dim built by a map-side-combining agg and
    # joined back broadcast; no window, no sort-merge of the corpus
    "domain_gate": [
        ("map-side partial agg", r"partial_(sum|count)"),
        ("verdict joined back broadcast", r"BroadcastHashJoin"),
        ("no sort-merge of the corpus side", r"!SortMergeJoin"),
        ("no window", r"!Window"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
    ],
    # k-means assignment: the scale path must be a pure codegen'd
    # projection — the k trained centroids are inlined literal arrays,
    # so there is NO join, NO shuffle and NO Python between the scan
    # and the (cid, dist) output
    "kmeans_assign": [
        ("no join (centroids inlined as literals)", r"!Join"),
        ("no shuffle (pure projection)", r"!Exchange"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # precision-curation flagship, final plan: the CC result is a
    # checkpoint-backed scan, so here we assert the size join-back is
    # broadcast and nothing after the checkpoint regresses
    "precision_curation": [
        ("cluster sizes joined back broadcast", r"BroadcastHashJoin"),
        ("no cartesian / nested-loop join",
         r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no unpartitioned window",
         r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
    ],
    # large-k assignment: centroids as ONE broadcast data row — the
    # 1-row nested-loop crossing is the documented bounded shape; after
    # it, a pure projection (no shuffle, no Python, no plan literals)
    "kmeans_assign_bcast": [
        ("1-row broadcast crossing", r"BroadcastNestedLoopJoin"),
        # BroadcastExchange of the 1-row side (and the k-row
        # SinglePartition collapse that builds it) is the documented
        # bounded shape; what must never appear is a hash/range shuffle
        # over the corpus
        ("no corpus shuffle (pure projection)",
         r"!Exchange (hash|range)partitioning"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("codegen", r"\*\(\d+\)"),
    ],
    # SemDeDup k-means blocking: the candidate-pair stage must be a cid
    # EQUI-join (cost ∝ Σ cluster_size², never the n² cartesian), with
    # assignment inlined as literals (no per-row Python, no extra join)
    "kmeans_block_join": [
        ("cid equi-join",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no cartesian / nested-loop join",
         r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no Python", r"!BatchEvalPython|ArrowEvalPython"),
        ("no rank window", r"!windowspecdefinition"),
    ],
    # precision-curation PRE-CC stage (gate → cut → hash → decontaminate
    # → consensus candidates → PSNR verify — the part the checkpoint
    # hides from the final plan): decode/PSNR are Arrow passes, the
    # candidate/bytes attachments are hash equi-joins, never cartesian
    "precision_verify_stage": [
        ("Arrow decode/PSNR passes", r"ArrowEvalPython|MapInPandas"),
        ("hash equi-joins",
         r"BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin"),
        ("no cartesian / nested-loop join",
         r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no unpartitioned window",
         r"!windowspecdefinition\([a-z_]+#\d+L? (?:ASC|DESC)"),
    ],
    # watermark band screen / d4-min hashes: ONE row-local Arrow pass,
    # verdicts codegen'd JVM-side — never a shuffle or join
    "watermark_gate": [
        ("single Arrow pass", r"ArrowEvalPython|MapInPandas"),
        ("no shuffle (row-local)", r"!Exchange"),
        ("no join", r"!Join"),
    ],
    "rot_invariant_hash": [
        ("single Arrow pass", r"ArrowEvalPython|MapInPandas"),
        ("no shuffle (row-local)", r"!Exchange"),
        ("no join", r"!Join"),
    ],
    # bandwidth budget dim: one map-side-combining groupBy(host) over
    # the pages projection; the clamp math is a codegen'd projection
    # rot/mirror dedup flagship: one Arrow decode pass, map-side
    # partial groupBy on the key, equi-join of the group dim back —
    # never a rank window (mega-group safe), never a cartesian
    "rot_dedup_pipeline": [
        ("Arrow decode pass", r"ArrowEvalPython|MapInPandas"),
        ("group dim equi-join",
         r"BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin"),
        ("no cartesian / nested-loop join",
         r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no rank window", r"!windowspecdefinition"),
    ],
    # rotation-aware near-dup: banded candidate equi-join (8x keys on
    # the exploded side), never cartesian; verdict a codegen'd
    # array_min popcount per candidate, no window
    "rot_near_dup": [
        ("band equi-join",
         r"BroadcastHashJoin|ShuffledHashJoin|SortMergeJoin"),
        ("no cartesian / nested-loop join",
         r"!CartesianProduct|BroadcastNestedLoopJoin"),
        ("no rank window", r"!windowspecdefinition"),
    ],
    "byte_budgets": [
        ("partial-agg groupBy(host)", r"HashAggregate"),
        ("no join", r"!Join"),
        ("no window", r"!windowspecdefinition"),
        ("codegen", r"\*\(\d+\)"),
    ],
}


def _archive_dedup_stage_plan(spark):
    """The pre-checkpoint stage of archive_pipeline: trap filter →
    dust key → first-wins winner selection (groupBy min)."""
    from pyspark.sql import functions as F

    from lightcrawler_spark.operators.traps import dust_key, with_trap_signals

    pages = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".test/d/"), (F.col("id") % 100).cast("string"),
                 F.lit("?utm_source=x&a=1")).alias("url"),
    )
    ok = with_trap_signals(pages).filter(~F.col("is_trap")).select(
        "doc_id", "url", dust_key(F.col("url")).alias("dust_key"))
    return ok.groupBy("dust_key").agg(F.min("doc_id").alias("doc_id"))


def _cc_iteration_plan(spark):
    """The plan operators/graph.py runs per CC iteration."""
    from pyspark.sql import functions as F

    edges = spark.range(1000).select(
        (F.col("id") % 97).alias("src"), (F.col("id") % 89).alias("dst")
    )
    labels = spark.range(100).select(
        F.col("id").alias("node"), F.col("id").alias("component")
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    neighbor = sym.join(labels, sym["dst"] == labels["node"]).select(
        F.col("src").alias("node"), "component"
    )
    return (
        labels.unionByName(neighbor)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def _pagerank_iteration_plan(spark):
    """The plan operators/graph.py:pagerank runs per power iteration."""
    from pyspark.sql import functions as F

    edges = spark.range(1000).select(
        (F.col("id") % 97).alias("src"), (F.col("id") % 89).alias("dst")
    )
    state = spark.range(100).select(
        F.col("id").alias("node"),
        F.lit(2).alias("out_deg"),
        F.lit(0.01).alias("rank"),
    )
    base = state.select("node", "out_deg")
    contrib = edges.join(state, edges["src"] == state["node"]).select(
        F.col("dst").alias("node"),
        (F.col("rank") / F.col("out_deg")).alias("c"),
    )
    summed = contrib.groupBy("node").agg(F.sum("c").alias("in_sum"))
    return base.join(summed, "node", "left").select(
        "node",
        (F.lit(0.005) + F.lit(0.5) * F.coalesce("in_sum", F.lit(0.0))).alias("rank"),
    )


def _precision_verify_stage_plan(spark):
    """The pre-CC stage of precision_curation (gate → cut → hash →
    decontaminate → consensus → PSNR verify) — the exact DF the
    flagship feeds to connected components, whose localCheckpoint hides
    this stage from the final plan."""
    import __spark_entry__ as entrymod

    return entrymod._precision_verified_stage(spark)[0]


def _kmeans_block_join_plan(spark):
    """The candidate-pair stage of semantic_dedup_kmeans (pre-CC):
    kmeans_block_pairs over bench.py's shared synthetic corpus."""
    import bench

    from lightcrawler_spark.operators.clustering import kmeans_block_pairs

    emb = bench.synthetic_vectors(spark, 500, 16, 4)
    return kmeans_block_pairs(emb, k=4, iters=1, threshold=0.2)


def _minhash_band_join_plan(spark):
    """The candidate-pair stage of minhash_dedup (pre-CC)."""
    from pyspark.sql import functions as F

    from lightcrawler_spark.operators.textdedup import minhash_lsh_pairs

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text body "), (F.col("id") % 40).cast("string")).alias("text"),
    )
    return minhash_lsh_pairs(docs, k=5, num_hashes=8, bands=4)


# plans audited outside the entry-query registry
EXTRA_PLANS = {
    "archive_dedup_stage": _archive_dedup_stage_plan,
    "cc_iteration": _cc_iteration_plan,
    "pagerank_iteration": _pagerank_iteration_plan,
    "minhash_band_join": _minhash_band_join_plan,
    "precision_verify_stage": _precision_verify_stage_plan,
    "kmeans_block_join": _kmeans_block_join_plan,
}


def main() -> int:
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from lightcrawler_spark.session import get_spark

    # AQE off: with AQE on, pre-execution plans print isFinalPlan=false
    # without codegen-stage markers, so the codegen check can't see them.
    spark = get_spark("explain-audit", master="local[4]", shuffle_partitions=8,
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    queries = entrymod.queries()
    warned = 0
    for name, checks in CHECKS.items():
        if only and name not in only:
            continue
        if name in EXTRA_PLANS:
            df = EXTRA_PLANS[name](spark)
        else:
            df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
            df.explain("simple")  # has the *(n) codegen-stage markers
        plan = buf.getvalue()
        # a "!"-prefixed regex asserts ABSENCE from the plan
        fails = [
            c for c, rx in checks
            if (re.search(rx[1:], plan) if rx.startswith("!")
                else not re.search(rx, plan))
        ]
        if fails:
            warned += 1
            print(f"WARN {name}: missing {fails}")
            print(plan)
        else:
            print(f"PASS {name}: " + ", ".join(c for c, _ in checks))
    spark.stop()
    return 1 if warned else 0


if __name__ == "__main__":
    raise SystemExit(main())
