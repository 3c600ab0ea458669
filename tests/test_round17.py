"""Round-17 constructed tests.

1. pipe_dump_dedup (VERDICT r16 #5, FineWeb per-snapshot dedup, Penedo
   et al. 2024 §4.4): constructed corpus where global and per-dump
   verdicts provably differ (a cross-dump duplicate survives per-dump
   dedup and dies globally), plus the structural superset invariant on
   the real smoke corpus.
2. pipe_stage_order (VERDICT r16 #6, the filter-order ablation): both
   orders' stage chains self-audit (stage k's n_in == stage k-1's
   n_kept), both end at the same raw corpus size, and the two orders'
   budgets provably differ on the synthetic corpus.
3. reprobe_verdict (VERDICT r16 #3): the calibration-anchored verdict
   rule replayed against the committed r16 false-confirm evidence -
   the case that motivated the rule - plus each branch pinned.
"""

import json
import os

from tests.conftest import SF_SMOKE
from tests.test_round14 import _constructed_corpus

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --- 1. per-dump dedup ablation ---------------------------------------------


def test_dump_dedup_cross_dump_verdicts_differ(spark, tmp_path):
    """The FineWeb mechanism, constructed: docs 1 and 2 are identical
    (one MinHash pair, jaccard 1.0) but live in dumps 1 and 2 - global
    dedup drops doc 2, per-dump dedup keeps it. Docs 5 and 10 are
    identical within dump 0 - BOTH modes drop doc 10. Token budgets
    replayed by hand (8 whitespace tokens per doc)."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    text_b = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(1, text_a), (2, text_a), (5, text_b), (10, text_b)],
        "doc_id long, text string",
    )
    sf_dir = _constructed_corpus(spark, tmp_path, docs=docs)
    rows = {
        r["dump"]: r
        for r in extensions.pipe_dump_dedup(spark, sf_dir).collect()
    }
    assert set(rows) == {0, 1, 2}
    # dump 0 = docs 5, 10 (same-dump duplicates): both modes drop 10
    assert rows[0]["n_docs"] == 2
    assert rows[0]["n_kept_global"] == 1 and rows[0]["n_kept_dump"] == 1
    assert rows[0]["tok_total"] == 16
    assert rows[0]["tok_kept_global"] == 8 and rows[0]["tok_kept_dump"] == 8
    assert rows[0]["tok_frac_global"] == 0.5
    # dump 1 = doc 1 (the smaller-id endpoint): kept by both modes
    assert rows[1]["n_kept_global"] == 1 and rows[1]["n_kept_dump"] == 1
    # dump 2 = doc 2: dominated by cross-dump doc 1 -> global drops it,
    # per-dump KEEPS it (no same-dump partner) - the ablation's point
    assert rows[2]["n_docs"] == 1
    assert rows[2]["n_kept_global"] == 0
    assert rows[2]["n_kept_dump"] == 1
    assert rows[2]["tok_frac_global"] == 0.0
    assert rows[2]["tok_frac_dump"] == 1.0


def test_dump_dedup_per_dump_keeps_superset(spark):
    """Per-dump domination requires a same-dump partner, so its dropped
    set is a subset of global's: row-wise kept counts and token budgets
    are >= under per-dump mode, and dump coverage is the full residue
    range with every doc accounted for exactly once."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    rows = extensions.pipe_dump_dedup(spark, SF_SMOKE).collect()
    assert [r["dump"] for r in rows] == list(range(extensions.DUMP_COUNT))
    for r in rows:
        assert r["n_kept_dump"] >= r["n_kept_global"]
        assert r["tok_kept_dump"] >= r["tok_kept_global"]
        assert r["n_kept_global"] <= r["n_docs"]
        assert r["tok_kept_global"] <= r["tok_total"]
    n_docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    )
    assert sum(r["n_docs"] for r in rows) == n_docs
    # the ablation is non-vacuous on the synthetic corpus: at least one
    # cross-dump duplicate exists, so the modes differ somewhere
    assert any(r["n_kept_dump"] > r["n_kept_global"] for r in rows)


# --- 2. filter-order ablation -----------------------------------------------


def test_stage_order_chains_audit_and_diverge(spark):
    """Both orders: 4 stages each, stage k's n_in equals stage k-1's
    n_kept (the funnel self-audit), both start from the full corpus,
    monotone within each stage, the stage NAME multiset is identical
    (same gates, different order) - and the two orders' final budgets
    differ on the synthetic corpus (the published pipelines' actual
    disagreement; if they always agreed the ablation would be moot)."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    rows = extensions.pipe_stage_order(spark, SF_SMOKE).collect()
    by_ord = {}
    for r in rows:
        by_ord.setdefault(r["ord"], []).append(r)
    assert set(by_ord) == {"filter_first", "dedup_first"}
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    finals = {}
    for order, chain in by_ord.items():
        assert [r["stage"] for r in chain] == [1, 2, 3, 4]
        assert chain[0]["n_in"] == n_docs
        for prev, cur in zip(chain, chain[1:]):
            assert cur["n_in"] == prev["n_kept"], (order, cur["name"])
        for r in chain:
            assert 0 <= r["n_kept"] <= r["n_in"]
        finals[order] = chain[-1]["n_kept"]
    assert sorted(r["name"] for r in by_ord["filter_first"]) == sorted(
        r["name"] for r in by_ord["dedup_first"]
    )
    assert finals["filter_first"] != finals["dedup_first"]


def test_stage_order_filter_first_matches_trained_funnel(spark):
    """The filter_first arm IS pipe_curation_trained (same memoized
    stage frames): counts must agree row for row."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    trained = {
        r["name"]: (r["n_in"], r["n_kept"])
        for r in extensions.pipe_curation_trained(spark, SF_SMOKE).collect()
    }
    ablation = {
        r["name"]: (r["n_in"], r["n_kept"])
        for r in extensions.pipe_stage_order(spark, SF_SMOKE).collect()
        if r["ord"] == "filter_first"
    }
    assert trained == ablation


# --- 3. hashed-feature averaged perceptron ------------------------------------


def test_perceptron_converges_on_separable_corpus(spark):
    """On a linearly separable corpus (disjoint per-class vocabularies)
    the trainer must reach 100% train accuracy: the raw iterate
    converges (empty delta -> early stop), and once the converged
    weights dominate the running average - 12 steps here; the first few
    oscillating tables need outvoting - the averaged model predicts
    every doc's own class. The true-learning pin behind the honest
    majority-class read on the label-independent synthetic corpus."""
    from web_maxiv_hdbppviewer_spark.operators import linear

    rows = []
    for i in range(30):
        lbl = ["aa", "bb", "cc"][i % 3]
        rows.append((i, f"{lbl}tok1 {lbl}tok2 {lbl}tok{i % 4} filler", lbl))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["id"]: r["pred"]
        for r in linear.perceptron_classify(docs, steps=12).collect()
    }
    assert len(out) == 30
    assert all(out[i] == ["aa", "bb", "cc"][i % 3] for i in range(30))


def test_perceptron_early_stop_equals_full_unroll(spark):
    """The engine's empty-delta early stop must produce EXACTLY the
    weights of running every step (the oracle has no break): train the
    separable corpus with steps=5 (stops early) and compare to a
    no-early-stop replay that keeps stepping - the averaged tables must
    be identical."""
    from pyspark.sql import functions as F

    from web_maxiv_hdbppviewer_spark.operators import linear

    rows = [
        (i, ["xx yy", "zz ww"][i % 2] + f" t{i % 3}", ["p", "q"][i % 2])
        for i in range(12)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    feats = linear.feature_counts(docs).localCheckpoint(eager=False)
    labels = ["p", "q"]
    averaged = linear.train_weights(feats, labels, steps=5)

    # replay without the break: every step always applies its delta
    weights: dict = {}
    unrolled: dict = {}
    for _ in range(5):
        preds = linear._scored(feats, weights, labels)
        mis = feats.join(
            preds.where(F.col("pred") != F.col("label")).select("id", "pred"),
            "id",
        )
        for r in (
            mis.select(
                "bucket",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(l).alias("lbl"),
                                (
                                    F.when(F.col("label") == l, F.col("cnt"))
                                    .otherwise(F.lit(0))
                                    - F.when(F.col("pred") == l, F.col("cnt"))
                                    .otherwise(F.lit(0))
                                ).cast("long").alias("d"),
                            )
                            for l in labels
                        ]
                    )
                ).alias("e"),
            )
            .select("bucket", F.col("e.lbl").alias("lbl"), F.col("e.d").alias("d"))
            .groupBy("bucket", "lbl")
            .agg(F.sum("d").cast("long").alias("d"))
            .collect()
        ):
            k = (r["bucket"], r["lbl"])
            weights[k] = weights.get(k, 0) + r["d"]
        for k, v in weights.items():
            unrolled[k] = unrolled.get(k, 0) + v
    strip = lambda d: {k: v for k, v in d.items() if v != 0}  # noqa: E731
    assert strip(averaged) == strip(unrolled)


def test_perceptron_training_is_partitioning_invariant(spark):
    """The integer-exactness claim, pinned the way hash_split pins it:
    every training quantity is an INT64 sum, so weights - and therefore
    every prediction - must be identical under any input partitioning
    (a float trainer would drift with aggregation order). Train on the
    same corpus at 1 partition and at 7 and compare the full weight
    tables and prediction maps."""
    from pyspark.sql import functions as F

    from web_maxiv_hdbppviewer_spark.operators import linear

    rows = [
        (i, f"w{i % 7} w{(i * 3) % 11} shared tok{i % 5}",
         ["aa", "bb", "cc"][i % 3])
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    labels = ["aa", "bb", "cc"]
    outs = []
    for parts in (1, 7):
        feats = linear.feature_counts(docs.repartition(parts)).localCheckpoint(
            eager=False
        )
        w = linear.train_weights(feats, labels, steps=4)
        preds = {
            r["id"]: (r["pred"], r["score"])
            for r in linear._scored(feats, w, labels).collect()
        }
        outs.append(({k: v for k, v in w.items() if v != 0}, preds))
    assert outs[0][0] == outs[1][0]
    assert outs[0][1] == outs[1][1]


# --- 4. chunk-grain probe sweep -----------------------------------------------


def test_chunk_probe_sweep_structure(spark):
    """Structural facts of the chunk-grain recall dial: one row per
    sweep setting; every setting emits exactly the exact leg's pooled
    top-5 budget (both legs rank to CHUNK_ANN_DOC_TOPK over >= 5
    candidate docs on this corpus); hits bounded by the exact total;
    the nprobe=2 setting IS sim_chunk_ann's ranking, so its hit count
    must equal the summed per-query hits of sim_chunk_ann_recall."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    rows = {
        r["nprobe"]: r
        for r in extensions.sim_chunk_probe_sweep(spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == list(extensions.IVF_SWEEP_PROBES)
    for r in rows.values():
        assert r["n_out"] == r["n_exact"]
        assert 0 <= r["n_hit"] <= r["n_exact"]
        assert r["recall_r"] == round(r["n_hit"] / r["n_exact"], 6)
    recall = extensions.sim_chunk_ann_recall(spark, SF_SMOKE).collect()
    assert rows[2]["n_hit"] == sum(r["n_hits"] for r in recall)


def test_lsh_census_vs_pair_generation(spark):
    """The census must be consistent with the machinery it sizes: both
    geometries see the same vector count; doubling band bit-width
    strictly shrinks candidate volume and the worst bucket; and the 8x8
    candidate count upper-bounds dedup_embedding's DISTINCT candidate
    set (the census counts per-band pairs, so cross-band duplicates
    make it an upper bound), which in turn bounds the verified pairs."""
    from web_maxiv_hdbppviewer_spark.plans import extensions

    rows = {
        r["band_bits"]: r
        for r in extensions.sim_lsh_census(spark, SF_SMOKE).collect()
    }
    assert set(rows) == {8, 16}
    assert rows[8]["n_vectors"] == rows[16]["n_vectors"] > 0
    assert rows[8]["candidate_pairs"] > rows[16]["candidate_pairs"]
    assert rows[8]["max_bucket"] >= rows[16]["max_bucket"]
    n_verified = extensions.dedup_embedding(spark, SF_SMOKE).count()
    assert rows[8]["candidate_pairs"] >= n_verified


# --- 5. reprobe verdict protocol --------------------------------------------


def test_reprobe_verdict_branches():
    """Each branch of the calibration-anchored rule, hand-built:
    settled (reprobe back at best), confirmed (elevated reprobe,
    calibration-normal host), phase via elevated md5 probe, phase via
    elevated shuffle probe, phase via normalization (probes just under
    their own trip wires but the normalized reading lands in band)."""
    from bench import reprobe_verdict

    med, best = 4.0, 3.8
    ok = dict(rp_cal=0.40, rp_shufcal=0.50, cal_ref=0.40, shufcal_ref=0.50)
    assert reprobe_verdict(3.9, med, best, **ok)[0] == "settled"
    assert reprobe_verdict(11.0, med, best, **ok)[0] == "confirmed"
    assert (
        reprobe_verdict(11.0, med, best, 0.60, 0.50, 0.40, 0.50)[0]
        == "phase"
    )  # md5 probe 1.5x its anchor
    assert (
        reprobe_verdict(11.0, med, best, 0.40, 1.00, 0.40, 0.50)[0]
        == "phase"
    )  # shuffle probe 2x its anchor
    # normalization: probes at 1.24x/1.29x (below their trip wires)
    # scale a 6.5 s reading to 5.04 s - inside the 1.4x best_m3 band
    # (5.32) - so the reading is attributed to the mild phase -> phase
    v, norm = reprobe_verdict(6.5, med, best, 0.496, 0.645, 0.40, 0.50)
    assert v == "phase" and norm < 1.4 * best


def test_reprobe_verdict_replay_r16_false_confirm():
    """Replay the committed r16 evidence that motivated the rule
    (BENCH_LOCAL_r16.json): sim_ivf_probe_sweep's battery-end reprobe
    read WORSE than the line it adjudicated (11.24 s vs 5.47 s) while
    the md5 calibration read normal - so under md5-only evidence the
    verdict stays "confirmed" (the probe was blind to the executor-side
    phase class; this is exactly why the shuffle probe was added), and
    with a shuffle probe reading the phase (2x anchor) the same numbers
    reclassify as "phase". The final adjudicator - the r17 isolated
    median (BASELINE.md) - read 3.94 s, in band."""
    from bench import reprobe_verdict

    with open(os.path.join(HERE, "BENCH_LOCAL_r16.json")) as f:
        r16 = json.load(f)["reprobe"]["sim_ivf_probe_sweep"]
    assert r16["reprobe_s"] > r16["line_s"]  # the protocol-gap evidence
    cal_ref = 0.3666  # min archived host_cal (r14b battery start)
    cal_r16 = 0.4162  # r16 battery start - normal, 1.14x the anchor
    md5_only = reprobe_verdict(
        r16["reprobe_s"], r16["median_s"], r16["best_m3_s"],
        cal_r16, 1.0, cal_ref, 1.0,
    )
    assert md5_only[0] == "confirmed"
    with_shuffle = reprobe_verdict(
        r16["reprobe_s"], r16["median_s"], r16["best_m3_s"],
        cal_r16, 2.0, cal_ref, 1.0,
    )
    assert with_shuffle[0] == "phase"
    # the isolated median settled it as phase: 3.937 s is in band
    assert not (
        3.937 > 2 * r16["median_s"]
        or (3.937 > 1.4 * r16["best_m3_s"] and 3.937 - r16["best_m3_s"] > 1.0)
    )
