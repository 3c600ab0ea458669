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
# ROUND-12 WINDOW. CORRECTNESS_r11 landed 50/50 green (first zero-red
# round since r7), so the window rotates to the recorded r12 queue
# (VERDICT r11 #1): the 12-entry r12 changelist leads (q18 and q32
# joined late for the half-even bucket tie rule - they were already in
# the stale fill, so the SET of 50 is unchanged, only the partition),
# then the two NEVER-driver-witnessed queries (dedup_clusters_semantic
# + text_keywords - queued and displaced twice, mandated to lead the
# fill), then the stale backlog OLDEST FIRST: the 22 remaining r7-row
# queries (q18 moved up to the changelist), then 14 r8-row queries
# (q5-q8, q23-q28, q30/q31/q33/q34 - q32 moved up; stream_last_value
# yielded its slot to dedup_spans). The remaining r8 rows
# (stream_window/dedup/sessions, the text_bpe family, multimodal,
# q31-adjacent fixtures) lead the r13 queue - with 62 stale entries
# and 50 slots this was always a 2-round rotation.
# (Prior-round window rationales: git history.)
#
# Round-12 changelist: sim_dim_stats (ADVICE: +0.0 canonicalization
# moved OUTSIDE the round on both sides - the sim_pca_gram signed-zero
# class), dedup_substr (ADVICE: oracle now counts the engine's own
# 60-bit window hashes, identical criterion both sides), sim_mips
# (ADVICE: exact-ip peer groups share one aug_cos representative so
# float noise in the materialized augmented norm cannot flip the
# aug_ok tiebreak), graph_pagerank (VERDICT #2: top-20 is now
# TakeOrderedAndProject, not a partition-less row_number window),
# pipe_contamination_bloom (rewrite: ONE md5 per shingle bit-sliced
# into join key + both bloom positions, int-only shuffles, train-side
# distinct+localCheckpoint dropped - the in-battery eviction spike),
# lifecycle_image (VERDICT #4: now ORACLE-TWINNED - decoded-pixel
# digests pinned as literals per corpus size, so a render regression
# hash-fails at the driver instead of hiding behind rows-only),
# lifecycle_query (NEW - VERDICT #5: the /query §3.2 end-to-end twin:
# resolve -> combined scan -> exact trim -> raw + 12h round-to-nearest
# resample, first-principles SQL oracle), q35 (NEW - VERDICT #7:
# value_w write-value sidecar through DATAPOINTS_SCHEMA -> rw fixture
# -> typed_summary(write_values=True) -> CSV renderer; closes the
# reference's server.py:21 documented gap), stream_raster (NEW -
# VERDICT #8: the A6 raster kernel under Structured Streaming,
# availableNow drain, oracle aliased to q20's so batch and stream can
# never drift).
_CHANGED_THIS_ROUND = [
    "sim_dim_stats",  # +0.0 outside the round, both sides (ADVICE)
    "dedup_substr",  # oracle counts the same 60-bit hashes (ADVICE)
    "sim_mips",  # aug_ok robust to exact-ip ties (ADVICE)
    "graph_pagerank",  # TakeOrderedAndProject top-k (VERDICT #2)
    "pipe_contamination_bloom",  # md5 bit-slice rewrite, no checkpoint
    "lifecycle_image",  # pinned-digest oracle - now hash-gated
    "lifecycle_query",  # NEW - /query lifecycle end-to-end witness
    "q35",  # NEW - value_w write-value surface (rw attributes)
    "stream_raster",  # NEW - streaming twin of the raster kernel
    # found by the builder's own sweep for the dedup_substr ADVICE class:
    # dedup_spans' oracle partitioned by the span STRING while the engine
    # partitions by its 60-bit hash - oracle now hashes too (identical
    # criterion; a collision marks the same span duplicated in both)
    "dedup_spans",
    # session-2 reference-parity fix: the reference resamples with PYTHON
    # round (data.py:12-14) = half-to-EVEN at exact half-bucket instants;
    # nearest_bucket was floor(t/w + 0.5) = half-UP. Engine now brounds,
    # oracles use round_even - outputs verified identical on all driver
    # data (zero half-ties at sf0.001/0.01/0.1), constructed-tie test
    # added. q18/q32 move here from the stale fill (same 50-query
    # window, changed entries lead); lifecycle_query already leads.
    "q18",
    "q32",
]
# never driver-witnessed (VERDICT r11 #1 mandates these lead the fill)
_NEVER_WITNESSED = [
    "dedup_clusters_semantic",
    "text_keywords",
]
# stale backlog, oldest driver row first: the 22 remaining r7-row queries...
_STALE_R7 = [
    "q19",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_clusters",
    "sim_topk_cosine", "sim_topk_quantized",
    "sim_ann_lsh", "sim_ann_ivf", "sim_ann_ivf_trained",
    "pipe_split", "pipe_domain_mix", "pipe_curation", "pipe_pack",
    "pipe_shard_sink", "pipe_contamination",
    "window_sliding", "window_sessions",
    "events_rollup", "events_pivot", "events_quantiles",
]
# ...then the r8-row core (q5-q8, q23-q28, q30/q31/q33/q34 - VERDICT
# r11 #1 named q30-q34, q32 moved up to the changelist);
# stream_last_value yielded its slot to the dedup_spans oracle fix and
# leads the r13 queue with the other r8 rows
_STALE_R8 = (
    [f"q{i}" for i in (5, 6, 7, 8)]
    + [f"q{i}" for i in range(23, 29)]
    + [f"q{i}" for i in (30, 31, 33, 34)]
)
_WINDOW = _CHANGED_THIS_ROUND + _NEVER_WITNESSED + _STALE_R7 + _STALE_R8


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
