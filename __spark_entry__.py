"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the /image rasterization kernel -
the reference viewer's core aggregate, SURVEY A6) on sf0.001.
``queries()`` exposes every implemented operator's declared query;
``oracle_sql()`` the DuckDB twins (queries without a twin are
non-SQL-expressible and get the driver's rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from web_maxiv_hdbppviewer_spark.plans.queries import CORE_QUERIES
from web_maxiv_hdbppviewer_spark.plans.oracle import CORE_ORACLE

try:  # extension operators (dedup / similarity / text / multimodal)
    from web_maxiv_hdbppviewer_spark.plans.extensions import (
        EXTENSION_QUERIES,
        EXTENSION_ORACLE,
    )
except ImportError:  # pragma: no cover - extensions not built yet
    EXTENSION_QUERIES, EXTENSION_ORACLE = {}, {}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return CORE_QUERIES["q20"](spark, "/root/testdata/sf0.001")


# The verification driver records correctness rows for at most the first 50
# dict entries of queries(). WITNESS SCHEDULE (deterministic, since r5):
#   window = [queries CHANGED or NEW this round] + [least-recently-witnessed
#            stable queries, to fill 50]
# _CHANGED_THIS_ROUND is the builder-maintained per-round changelist;
# tests/test_plans.py asserts it leads the window, so an r7-style miss
# (text_bpe_apply rewritten but left unwitnessed) fails the suite instead
# of relying on judge review.
#
# ROUND-11 WINDOW. CORRECTNESS_r10.json landed: the entire r9 backlog +
# all 14 r10 additions are driver-witnessed green (sole red row
# sim_pca_gram, fixed this round - see changelist). The window therefore
# finally rotates back to the DISPLACED CORE, stale since r7/r8: the
# r11 changelist leads, then q9-q15+q22, q1-q8, q16-q21 (the raster
# path q20/q21 per VERDICT r10 #6), the four r8-row streaming queries,
# dedup_clusters_semantic + text_keywords (the recorded r11 queue), and
# the remaining slots go to the r7-row extensions displaced at r9
# (events_quantiles/window_sessions also happen to be two of the r10
# bench-spike queries - their value semantics get re-witnessed here
# alongside the isolated re-probes recorded in BASELINE.md).
# (Prior-round window rationales: git history, commits b154ccb/82f29f9.)
#
# Round-11 changelist: dedup_substr (NEW - exact substring-level dedup,
# Lee et al. ExactSubstr as overlapping-window hashes + island merging,
# VERDICT r10 #8), sim_index_append (NEW - incremental PQ index
# maintenance: base-trained frozen codebooks, O(batch) append encode,
# parquet-append, re-serve; oracle re-encodes the whole corpus against
# the base-trained codebooks), sim_index_persist (generation-dir
# retention cleanup, shared _pq_index_gen_dir), sim_pca_gram
# (signed-zero canonicalization after the round-6 on BOTH sides - the
# r10 red row), dedup_fuzzy (posting-list df_cap=64 + R x R
# guarantee-restoring fallback + band-before-distinct), 
# pipe_sample_weighted (w > 0 contract guard, both sides),
# events_rolling (floor division for negative-epoch portability),
# events_scd2 (null-safe run breaks anchored on the never-null ts).
# Batch 2: sim_mips (NEW - exact MIPS top-k with the norm-augmentation
# reduction certified per row from materialized augmented arrays),
# pipe_mixture_schedule (NEW - largest-remainder apportionment of a
# 100k training-slot budget, integer-exact, slots sum == budget).
# Batch 3: q29 (typed summary split into a hash-only full-corpus pass +
# broadcast discrete join - same values, ~20% faster, sort aggregation
# no longer touches the whole input), text_winnow (NEW - robust
# winnowing fingerprint selection, Schleimer et al. SIGMOD'03),
# events_gap_fill (NEW - day-grid forward fill with integer-quantized
# series checksums), text_pii_scrub (NEW - deterministic PII injection +
# regex redaction accounting), pipe_epoch_shuffle (NEW - per-epoch
# deterministic global permutations via the distributed rank).
# Batches 4-5 (see inline comments + PLANS.md/SURVEY round-11 notes):
# diversity selection (kcenter/mmr), LTTB downsampling, CUSUM twice
# (batch argmax + streaming O(1)-state monitor), winnow matching, the
# dedup and IVF method/tuning tables, cluster-keyed leakage-safe
# splitting, and the binary content signature.
_CHANGED_THIS_ROUND = [
    # -- round 11 --
    "dedup_substr",  # NEW - ExactSubstr substring-level dedup accounting
    "sim_index_append",  # NEW - incremental PQ index append lifecycle
    "sim_index_persist",  # generation retention cleanup (shared helper)
    "sim_pca_gram",  # -0.0 canonicalization - the r10 red driver row
    "dedup_fuzzy",  # df-capped postings + R x R fallback
    "pipe_sample_weighted",  # w > 0 guard (engine + oracle)
    "events_rolling",  # floor-division epoch seconds
    "events_scd2",  # null-safe gaps-and-islands run breaks
    # -- round 11, batch 2 --
    "sim_mips",  # NEW - MIPS top-k + norm-augmentation reduction contract
    "pipe_mixture_schedule",  # NEW - Hamilton apportionment of slots
    # -- round 11, batch 3 --
    "q29",  # typed summary: hash-only main pass + broadcast discrete join
    "text_winnow",  # NEW - robust winnowing fingerprints
    "events_gap_fill",  # NEW - day-grid forward fill, integer checksums
    "text_pii_scrub",  # NEW - PII injection + redaction accounting
    "pipe_epoch_shuffle",  # NEW - deterministic epoch permutations
    # -- round 11, batch 4 --
    "sim_kcenter",  # NEW - greedy farthest-first coreset selection
    "events_lttb",  # NEW - parallel-anchor LTTB plot downsampling
    "events_changepoint",  # NEW - integer-exact CUSUM drift detection
    "sim_mmr",  # NEW - maximal-marginal-relevance diversified top-k
    "dedup_winnow",  # NEW - cross-doc winnow-fingerprint matching (MOSS)
    "dedup_compare",  # NEW - dedup-method recall/precision harness
    "stream_cusum",  # NEW - streaming online-CUSUM drift monitor
    "pipe_split_safe",  # NEW - cluster-keyed leakage-safe split
    "sim_ivf_probe_sweep",  # NEW - recall-vs-nprobe tuning curve
    "multimodal_phash",  # NEW - block-mean binary content signature
    # -- round 11, batch 6 --
    "pipe_token_budget",  # NEW - per-source greedy token-budget fill
    "dedup_cross_source",  # NEW - cross-source near-dup matrix
    "sim_nearest_centroid",  # NEW - fixed-point Rocchio confusion matrix
    "sim_cluster_stats",  # NEW - per-label centroid dispersion report
    "text_boilerplate",  # NEW - high-df 8-gram boilerplate exposure
    # -- round 11, batch 7 --
    "text_entropy",  # NEW - zero-shuffle unigram Shannon entropy
    "sim_dim_stats",  # NEW - per-dimension embedding health card
    "pipe_interleave",  # NEW - domain-interleaved stream order
]
# the displaced core, least-recently-witnessed first (q9-q15 + q22 were
# displaced in r10; every entry is r7/r8-row-witnessed, code-unchanged,
# and sf0.001-parity-checked each suite run)
_STALE_CORE = (
    # batch 6 (5 new queries) claims 5 more slots: the r7-row core keeps
    # priority (q9-q15+q22, q16-q21), lifecycle_aggregate stays (VERDICT
    # r10 #6 names the raster path), and the FRESHEST-witnessed members
    # of the previous window - q6-q8 and the r8-row streaming pair - rotate
    # out to lead the r12 queue alongside the batch-1-5 displacements
    # listed below
    [f"q{i}" for i in (9, 10, 11, 12, 13, 14, 15, 22)]
    # batch 7 (+2) displaces q18, q19 - drawn from q16-q21, the segment
    # VERDICT r10's rotation order lists LAST (q20/q21 kept: the raster
    # path r10 #6 names; q16/q17 kept: the set-op family)
    + [f"q{i}" for i in (16, 17, 20, 21)]
    # pipe_interleave (+1) displaces q5 (r8 row) to the r12 queue
    + [f"q{i}" for i in range(1, 5)]
)
_STALE_TAIL = [
    # r7-row extension displaced at r9, never re-witnessed since
    "lifecycle_aggregate",
    # dedup_exact, window_sliding, events_pivot (batch 1/2),
    # dedup_minhash_lsh, pipe_domain_mix, sim_topk_cosine,
    # sim_topk_quantized, pipe_shard_sink (batch 3), and
    # dedup_ngram_jaccard, pipe_curation, pipe_contamination,
    # sim_ann_ivf_trained, window_sessions, events_quantiles,
    # text_keywords, dedup_clusters_semantic, stream_sessions,
    # stream_dedup (batch 4/5), q6, q7, q8, stream_last_value,
    # stream_window (batch 6;
    # lifecycle_aggregate stays - VERDICT r10 #6 names the raster path)
    # yield their slots to
    # the round-11 NEW/changed queries (each r7/r8-row-witnessed,
    # parity-checked every suite run; they lead the r12 rotation queue)
]
_WINDOW = _CHANGED_THIS_ROUND + _STALE_CORE + _STALE_TAIL


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    all_q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    all_q.update(CORE_QUERIES)
    all_q.update(EXTENSION_QUERIES)
    missing = [n for n in _WINDOW if n not in all_q]
    assert not missing, f"witness window names unknown: {missing}"
    assert len(_WINDOW) == 50, len(_WINDOW)
    out = {name: all_q[name] for name in _WINDOW}
    for name, fn in all_q.items():
        out.setdefault(name, fn)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(CORE_ORACLE)
    out.update(EXTENSION_ORACLE)
    return out
