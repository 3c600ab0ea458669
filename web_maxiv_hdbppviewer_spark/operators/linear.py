"""Hashed-feature linear text classifier, trained by bounded full-batch
steps (train / score) - the fastText-class upgrade of the NB family
(VERDICT r16 #8).

Model: multiclass linear scores over HASHED unigram counts (the hashing
trick, Weinberger et al. 2009 / fastText's bag-of-features):

    bucket(t)   = md5_int60("lr:" || t) % D          (D = LR_BUCKETS)
    x(d)        = multiset of bucket counts of d's tokens
    score(d, L) = sum over buckets of cnt(d, b) * W[b, L]
    pred(d)     = argmax_L score(d, L), ties -> smaller label string

Training is LR_STEPS FULL-BATCH subgradient steps of the multiclass
perceptron loss (step size 1, W0 = 0): each step scores the whole
corpus under the current weights and adds, for every misclassified
document, its feature counts to the true label's row and subtracts them
from the predicted label's row -

    W_t = W_{t-1} + sum over misclassified d of x(d) x (e_y(d) - e_pred(d))

and the PUBLISHED model is the AVERAGED perceptron (Freund & Schapire
1999): scores use sum over t of W_t - the integer SUM of the per-step
weight tables, which is argmax-equivalent to their average (argmax is
scale-invariant), so no division ever happens. Averaging matters: the
raw full-batch iterate OSCILLATES on non-separable data (each step's
update carries the whole misclassified class mass, so the newly-favored
label overshoots and the cycle repeats - measured on the synthetic
corpus: the raw iterate visits en/fr/es/zh in a 4-cycle); the average
of the cycle is the stable majority-respecting predictor, and on
separable data the iterate converges (empty update -> early stop) so
the average converges with it.

The perceptron subgradient was chosen over logistic softmax
DELIBERATELY: every quantity above is an INT64 (counts, weights,
scores), so training is exact in any engine and any aggregation order -
the nbayes fixed-point discipline extended from scoring to TRAINING
(softmax needs exp, whose last-ulp cross-engine parity nothing
certifies; a single flipped prediction in step 1 would cascade through
every later weight). The SQL oracle unrolls the same steps (the
graph_pagerank unrolled-superstep discipline).

Honest dial: the synthetic corpus's unigram distributions are nearly
label-independent (the per-lang token histograms are proportional), so
the averaged gate settles at the majority class - accuracy equals the
majority baseline and kappa vs the NB gate reads ~0. That is what a
linear bag-of-words model SHOULD read on label-independent text; true
convergence (100% train accuracy, early stop, beats majority) is
pinned on a constructed separable corpus in tests/test_round17.py.

Scale posture (100 TB): the feature frame is one explode + one hash
aggregate, lazily localCheckpoint-ed and reread by every step; each
step is ONE broadcast join (the D x L weight table, bounded by
construction) + one groupBy(doc) aggregate + one groupBy(bucket) delta
aggregate whose result - at most D x L rows - is the step's driver
round-trip (the bounded-trainer discipline shared with BPE / k-means /
NB); the driver never holds anything corpus-sized. Steps are inherently
sequential (each step's scores need the previous step's weights), which
is the full-batch trade every published linear trainer makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texthash import md5_int60, words

LR_BUCKETS = 512
LR_STEPS = 5


def feature_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(id, label, bucket, cnt) hashed-unigram counts over the labeled
    corpus (NULL-label rows neither train nor classify - the NB
    contract). One explode + one hash aggregate."""
    return (
        df.where(F.col(label_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.col(label_col).alias("label"),
            F.explode(words(F.col(text_col))).alias("token"),
        )
        .select(
            "id",
            "label",
            (md5_int60(F.col("token"), salt="lr") % LR_BUCKETS).alias("bucket"),
        )
        .groupBy("id", "label", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _scored(feats: DataFrame, weights: dict, labels: list):
    """(id, label, pred): argmax over the when-chain fold, ascending
    label order with strictly-greater wins (ties -> smaller label) -
    nb_classify's argmax discipline. ``weights`` maps (bucket, label) ->
    int; zero rows are omitted, and a bucket with no weight row scores 0
    via coalesce. Docs are never dropped: every labeled doc has >= 1
    token row or no row at all - token-less docs have no feature rows
    and are excluded from feats, which matches the oracle (a doc with no
    tokens has no defined bag-of-features score)."""
    w_rows = [
        (b, *[int(weights.get((b, l), 0)) for l in labels])
        for b in sorted({b for b, _ in weights})
    ]
    spark = feats.sparkSession
    if w_rows:
        schema = "bucket long, " + ", ".join(
            f"w_{i} long" for i in range(len(labels))
        )
        w_df = F.broadcast(spark.createDataFrame(w_rows, schema))
        joined = feats.join(w_df, "bucket", "left")
    else:
        joined = feats.select(
            "*", *[F.lit(None).cast("long").alias(f"w_{i}") for i in range(len(labels))]
        )
    scored = joined.groupBy("id", "label").agg(
        *[
            F.sum(F.col("cnt") * F.coalesce(F.col(f"w_{i}"), F.lit(0)))
            .cast("long")
            .alias(f"s_{i}")
            for i in range(len(labels))
        ]
    )
    best_s, best_l = F.col("s_0"), F.lit(labels[0])
    for i in range(1, len(labels)):
        s = F.col(f"s_{i}")
        gt = s > best_s
        best_l = F.when(gt, F.lit(labels[i])).otherwise(best_l)
        best_s = F.when(gt, s).otherwise(best_s)
    return scored.select(
        "id", "label", best_l.alias("pred"), best_s.alias("score")
    )


def train_weights(feats: DataFrame, labels: list, steps: int = LR_STEPS) -> dict:
    """The bounded trainer: ``steps`` full-batch perceptron updates,
    returning the AVERAGED model - the (bucket, label) -> int SUM of
    the per-step weight tables (argmax-equivalent to their average;
    module docstring). Driver-held, <= D x |labels| entries; each
    step's driver round-trip is the bounded delta aggregate - at most
    D x |labels| rows."""
    weights: dict = {}
    averaged: dict = {}
    for step_i in range(steps):
        preds = _scored(feats, weights, labels)
        mis = feats.join(
            preds.where(F.col("pred") != F.col("label")).select("id", "pred"),
            "id",
        )
        delta = (
            mis.select(
                "bucket",
                "cnt",
                F.col("label").alias("y"),
                "pred",
            )
            .select(
                "bucket",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(l).alias("lbl"),
                                (
                                    F.when(F.col("y") == l, F.col("cnt"))
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
            .where(F.col("d") != 0)
            .groupBy("bucket", "lbl")
            .agg(F.sum("d").cast("long").alias("d"))
            .collect()
        )  # bounded: <= LR_BUCKETS x |labels| rows
        if not delta:
            # converged: the weight table stops changing, so steps
            # step_i+1 .. steps would each add this SAME table to the
            # average. The oracle has no early stop - it always unrolls
            # all `steps` - so add those copies explicitly to keep the
            # break EXACTLY equal to running every step.
            for k, v in weights.items():
                averaged[k] = averaged.get(k, 0) + (steps - step_i) * v
            break
        for r in delta:
            k = (r["bucket"], r["lbl"])
            weights[k] = weights.get(k, 0) + r["d"]
        for k, v in weights.items():
            averaged[k] = averaged.get(k, 0) + v
    return averaged


def perceptron_classify(
    df: DataFrame,
    steps: int = LR_STEPS,
    id_col: str = "doc_id",
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Train on the labeled corpus, then score it: (id, label, pred,
    score) with integer scores. Labels are the sorted distinct non-NULL
    label set (a bounded driver round-trip, the NB stats class)."""
    feats = feature_counts(df, id_col, label_col, text_col).localCheckpoint(
        eager=False
    )
    labels = sorted(
        r["label"]
        for r in df.where(F.col(label_col).isNotNull())
        .select(F.col(label_col).alias("label"))
        .distinct()
        .collect()
    )  # bounded: one row per label
    if not labels:
        return df.sparkSession.createDataFrame(
            [], "id long, label string, pred string, score long"
        )
    return _scored(feats, train_weights(feats, labels, steps), labels)
