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
# STEADY-STATE ROTATION POLICY (VERDICT r13 #7 - the staleness ledger
# closes with r14, so this is the standing rule; no per-round judge
# arbitration needed):
#   1. _CHANGED_THIS_ROUND leads: every query whose PLAN or semantics
#      changed this round (new queries, operator rewrites, oracle
#      changes) - suite-enforced by
#      tests/test_plans.py::test_witness_window_leads_with_changed_queries.
#   2. The remaining slots fill OLDEST-FIRST by freshest driver-witness
#      round (from the committed CORRECTNESS_r*.json history),
#      alphabetical within an equal-age cohort - machine-checked by
#      tests/test_round14.py::test_witness_window_fill_is_oldest_first,
#      which recomputes the ledger from the artifacts, so a hand-edited
#      window that skips a stale row fails the suite.
# With 163 declared queries and ~44 fill slots/round, every stable query
# is re-witnessed at least every 4 rounds.
#
# ROUND-14 WINDOW. CORRECTNESS_r13 landed 50/50 green (all hash
# matches). Per VERDICT r13 #1 the window closes the ledger: the (small)
# r14 changelist leads, then ALL 26 queries whose freshest driver rows
# are r10 (the recorded r14 queue), then the oldest-first fill from the
# r11 cohort (alphabetical). After this round every declared query is
# witnessed r11+, and rotation is pure steady-state.
#
# Round-14 changelist: sim_mmr + sim_kcenter (the recorded VERDICT r13
# #2 perf fix: per-superstep center vectors are now ONE F.lit(list)
# array-literal node instead of F.array over 64 F.lit leaves - the r13
# sim_pca lesson; same doubles in the same order, plans changed ->
# witnesses lead), lifecycle_image_stream (ADVICE r13: its consumer now
# folds a right-edge-exact streamed column nx into nx-1 via
# api/png.snap_streamed_edge_rows, matching batch bin_2d's inclusive
# upper-edge snap; driver corpus is interior so the digest is unchanged
# - the witness proves it - and the constructed edge corpus in
# tests/test_round14.py exercises the fold), q20 + q21 (ADVICE r13:
# _canvas_time_clip now asserts integral spans so the µs-floored clip
# and the float bin math can never disagree on the right edge; plans
# and values unchanged - re-certification witnesses), q9 (catalog
# search now int()-coerces a string max_n like the reference's query
# param shape, server.py:77; the enforced cap is unchanged for int
# callers - re-certification witness), lifecycle_image +
# lifecycle_aggregate (VERDICT r13 #5: image_aggregates now resolves the
# catalog ONCE for the whole request instead of once per axis - the
# per-axis _resolve was ~0.8 s of catalog-join collect per axis, the
# single largest line in the lifecycle_image profile; routing results
# identical, PLANS.md records the attribution), sim_ivf_probe_sweep
# (r14 checkpoint-laziness pass: its exact baseline and per-probe
# rankings now localCheckpoint(eager=False) because their first
# consumer is a sequential count() that materializes the blocks in the
# same pass - eager spent a separate full pass writing them; the
# parallel-branch consumers elsewhere stay EAGER by measurement, see
# plans/extensions.py sim_ann_compare. dedup_compare and
# events_changepoint got the same treatment and sit in the fill below;
# sim_mmr/sim_kcenter supersteps also checkpoint lazily now - one
# corpus pass per superstep, values identical), sim_hybrid_rrf (NEW
# r14 - hybrid retrieval: BM25 lexical leg + exact-cosine vector leg,
# each TakeOrdered to top-20, fused full-outer with Cormack RRF
# 1/(60+rank); the RAG first-stage / hard-negative-mining primitive.
# Oracle reuses the text_bm25 and sim_topk_cosine CTEs; the one
# bounded 20-row global window is plan-lint-allowlisted with the
# graph_pagerank argument), sim_hard_negatives (NEW r14 - contrastive
# hard-negative mining: top-5 most-similar DIFFERENT-label vectors per
# query, the sim_topk_cosine pass plus one label-inequality predicate;
# oracle folds the constraint into the join condition).
# text_nb_train / text_nb_classify / text_nb_eval (NEW r14 - trained
# multinomial Naive-Bayes text classifier, the CCNet/fastText-style
# quality/domain filtering primitive: min_count-vocab model with
# add-one smoothing published as int64 micro-nats, broadcast wide-model
# scoring in ONE groupBy(doc) aggregate, argmax as a bounded when-chain;
# oracle re-derives the identical model in SQL CTEs - operators/nbayes.py).
# pipe_dsir (NEW r14 - DSIR corpus targeting, Xie et al. 2023: hashed
# 256-bucket token importance-ratio model, int64 micro-nat scores,
# Gumbel-top-k with deterministic hash noise - operators/sampling.py).
# text_fertility (NEW r14 - per-language tokenizer fertility under the
# trained BPE merges: token-per-word and byte-per-token ratios, the
# multilingual token-budget diagnostic; per-doc metadata rides THROUGH
# the Arrow counting pass via apply_bpe_merges carry columns, so there
# is no corpus-sized doc_id join).
# stream_classify (NEW r14 - the batch-trained NB model served over a
# document stream STATELESSLY: artifacts in the task closure, Arrow
# scoring kernel, append mode with zero state operators (asserted in
# the query); integer micro-nat sums make streamed output bit-identical
# to batch text_nb_classify, whose oracle it shares verbatim - the
# stream_raster aliasing discipline).
_CHANGED_THIS_ROUND = [
    "stream_classify",
    "text_fertility",
    "pipe_dsir",
    "text_nb_train",
    "text_nb_classify",
    "text_nb_eval",
    "sim_hybrid_rrf",
    "sim_hard_negatives",
    "sim_mmr",
    "sim_kcenter",
    "lifecycle_image_stream",
    "q20",
    "q21",
    "q9",
    "lifecycle_image",
    "lifecycle_aggregate",
    "sim_ivf_probe_sweep",
]
# ALL 26 r10-freshness rows - VERDICT r13 #1 mandates the full set; this
# closes the staleness ledger (everything witnessed r11+ after r14)
_STALE_R10 = [
    "pipe_bootstrap", "pipe_curriculum", "pipe_dedup_sweep",
    "pipe_delta_apply", "pipe_manifest", "pipe_pack_bpe",
    "pipe_reweight", "pipe_stats", "pipe_stats_delta",
    "pipe_temperature_mix", "scale_bucketed", "scale_colstats",
    "scale_compact", "scale_zorder", "sim_ann_compare", "sim_knn_graph",
    "sim_sparse_topk", "stream_join", "stream_restart",
    "stream_sessions_evict", "stream_sink_compact", "text_chunk",
    "text_collocations", "text_domain_shift", "text_lm_score",
    "text_vocab",
]
# fill: first 7 of the r11 cohort, alphabetical (sim_mmr/sim_kcenter/
# q9/sim_ivf_probe_sweep graduated from that cohort into the
# changelist; the NEW sim_hybrid_rrf + sim_hard_negatives +
# text_nb_train/classify/eval + pipe_dsir + text_fertility +
# stream_classify take eight more slots); the remaining r11 rows lead
# the r15 oldest-first queue
_STALE_R11 = [
    "dedup_compare", "dedup_cross_source", "dedup_winnow",
    "events_changepoint", "events_gap_fill", "events_lttb",
    "events_rolling",
]
_WINDOW = _CHANGED_THIS_ROUND + _STALE_R10 + _STALE_R11


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
