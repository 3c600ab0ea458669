"""Trained multinomial Naive-Bayes text classifier (train / score / eval).

The CCNet / fastText-style pipeline primitive the extension surface was
missing: every production pretraining pipeline trains a cheap linear
classifier on labeled text (quality buckets, domains, languages) and
scores the whole corpus with it to filter or reweight documents. The
reference viewer has no analogue (its text surface is the raw archive);
this family extends SURVEY §2's training-data operators alongside
text_quality / text_langid (which are untrained heuristics).

Model: multinomial NB with add-one smoothing over the whitespace-token
vocabulary restricted to tokens whose corpus-wide count >= ``min_count``
(the standard hashing-trick-free vocabulary cut):

    logp(t, L)  = ln((c(t,L) + 1) / (T_L + V))
    default(L)  = ln(1 / (T_L + V))          # unseen / out-of-vocab token
    prior(L)    = ln(N_L / N)
    score(d, L) = prior(L) + sum over tokens of logp/default
    pred(d)     = argmax_L score(d, L), ties -> smaller label string

where c(t,L) is the count of vocab token t in label-L documents, T_L the
total vocab-token count in label-L documents, V the vocab size, N_L the
label-L document count.

Cross-engine exactness (the sim_quantize / pca fixed-point discipline):
every log-probability is published as ``logp_fp = CAST(ROUND(ln(..)*1e6,
0) AS BIGINT)`` and per-document scores are SUMS OF THOSE INT64 values -
integer-exact in any engine and in any aggregation order, so the only
cross-engine float surface is the one ROUND-guarded ``ln`` per model
cell (the repo-wide accepted class, see bm25's ROUND-6 idf).

Scale posture (100 TB): training is one explode + one (token,label)
hash aggregate (map-side combinable) + a token-partition window whose
state is bounded by |labels|; the label/vocab statistics collected to
the driver are |labels|+1 rows (the bounded-trainer discipline shared
with BPE / k-means). Scoring broadcast-joins the WIDE model (one row
per vocab token, one int64 column per label - bounded by the vocabulary
cut) onto the exploded corpus and reduces with ONE groupBy(doc) hash
aggregate; the argmax over the bounded label set is a literal
when-chain, not a window, so no per-document shuffle beyond the single
score aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.texthash import words

NB_MIN_COUNT = 5
_FP = 1_000_000.0  # fixed-point scale for log-probabilities

# NULL-label contract (shared with the SQL oracles, which carry the same
# WHERE lang IS NOT NULL base): unlabeled rows neither train nor
# classify. Without this the engines diverge silently - Spark's NULL
# group sorts unorderably against strings on the driver while DuckDB
# ranks NULL as a candidate label NULLS LAST - and a supervised model
# has no defined semantics for an unlabeled example anyway.


def _labeled(df: DataFrame, label_col: str) -> DataFrame:
    return df.where(F.col(label_col).isNotNull())


def _fp(col):
    """ln -> int64 micro-nats: CAST(ROUND(x*1e6, 0) AS BIGINT) - written
    identically in the SQL oracle so both engines publish the same
    integer (ROUND parity on the last ulp of ln is the repo-wide
    accepted class)."""
    return F.round(col * F.lit(_FP), 0).cast("long")


def _tokens(df: DataFrame, id_col: str, label_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), F.col(label_col).alias("label"),
        F.explode(words(F.col(text_col))).alias("token"),
    )


def nb_counts(
    df: DataFrame,
    min_count: int = NB_MIN_COUNT,
    id_col: str = "doc_id",
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(token, label, n) over the min_count-filtered vocabulary: one
    (token,label) hash aggregate, then the corpus-wide token total as a
    token-partition window sum (per-partition state bounded by |labels|)."""
    c = (
        _tokens(_labeled(df, label_col), id_col, label_col, text_col)
        .groupBy("token", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("token"))
    return c.withColumn("tot", tot).where(F.col("tot") >= min_count).drop("tot")


def _label_stats(
    df: DataFrame, m: DataFrame, label_col: str, include_total: bool = False
) -> DataFrame:
    """Per-label (T_L, N_L) plus the scalar V, derived from the filtered
    counts; labels come from the CORPUS (left join) so a label none of
    whose tokens survived the vocabulary cut still trains a prior and a
    default. ``include_total`` adds the corpus document count (the prior
    denominator) - only the classifier's bounded driver round-trip needs
    it, so the train plan skips that scalar job."""
    labels = _labeled(df, label_col).groupBy(
        F.col(label_col).alias("label")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    per_label = m.groupBy("label").agg(F.sum("n").alias("t_l"))
    vrow = m.select(F.count_distinct("token").alias("v"))
    out = (
        labels.join(F.broadcast(per_label), "label", "left")
        .na.fill({"t_l": 0})
        # 1-row stats frames -> broadcast NLJ (the repo's bounded
        # broadcast-1-row-stats join pattern)
        .crossJoin(F.broadcast(vrow))
    )
    if include_total:
        nrow = _labeled(df, label_col).select(F.count(F.lit(1)).alias("n_total"))
        out = out.crossJoin(F.broadcast(nrow))
    return out


def _stats_fp(df: DataFrame, m: DataFrame, label_col: str) -> list:
    """The classifier's bounded driver round-trip, in ONE dialect for
    batch and streamed serving alike (the two used to spell the same
    formulas in Column DSL and selectExpr SQL - a drift risk for the
    stream/batch bit-identical contract): collected, sorted
    [(label, def_fp, prior_fp)]. Raises when the corpus is labeled but
    the vocabulary cut left NOTHING (t_l + v = 0 makes ln(1/0)
    divide-to-NULL in Spark and inf in SQL - neither is a model; the
    caller must lower min_count or accept there is nothing to train
    on). Empty labeled corpus -> []."""
    denom = (F.col("t_l") + F.col("v")).cast("double")
    rows = (
        _label_stats(df, m, label_col, include_total=True)
        .withColumn(
            # the when-guard keeps ANSI mode from raising DIVIDE_BY_ZERO
            # before the v == 0 check below can turn it into the real
            # diagnosis (empty vocabulary, not a numeric accident)
            "def_fp",
            F.when(denom > 0, _fp(F.log(F.lit(1.0) / denom))),
        )
        .withColumn(
            "prior_fp",
            _fp(F.log(F.col("n_docs").cast("double") / F.col("n_total"))),
        )
        .collect()
    )  # bounded: one row per label
    if rows and rows[0]["v"] == 0:
        raise ValueError(
            "NB vocabulary is empty under min_count: no token reaches the "
            "cut, so there is no model to train (lower min_count)"
        )
    return sorted(
        ((r["label"], r["def_fp"], r["prior_fp"]) for r in rows),
        key=lambda r: r[0],
    )


def nb_model(
    df: DataFrame,
    min_count: int = NB_MIN_COUNT,
    id_col: str = "doc_id",
    label_col: str = "lang",
    text_col: str = "text",
    counts: DataFrame | None = None,
) -> DataFrame:
    """The published model: (token, label, n, logp_fp) for every
    (vocab token x label observed with it); defaults/priors are recomputed
    from the same statistics by the scorer (and by the SQL oracle).
    ``counts`` lets the classifier pass its lazily-checkpointed counts
    frame so the training aggregation executes ONCE per request."""
    m = counts if counts is not None else nb_counts(
        df, min_count, id_col, label_col, text_col
    )
    stats = _label_stats(df, m, label_col)
    denom = (F.col("t_l") + F.col("v")).cast("double")
    return m.join(F.broadcast(stats), "label").select(
        "token", F.col("label"), "n",
        _fp(F.log((F.col("n") + F.lit(1.0)) / denom)).alias("logp_fp"),
    )


def nb_classify(
    df: DataFrame,
    min_count: int = NB_MIN_COUNT,
    id_col: str = "doc_id",
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Score every document and predict: (id, label, pred, score_fp).

    The per-label statistics collected to the driver are |labels| rows
    (the bounded-trainer round-trip); the model joins the corpus WIDE
    (one int64 column per label) and broadcast, so scoring is
    broadcast-join + ONE groupBy(id) aggregate. The counts frame is
    LAZILY localCheckpoint'ed: the stats collect is a sequential action
    over it (the eager/lazy decision rule, PLANS.md r14), so that one
    pass both computes and freezes the training aggregation, and the
    scoring plan's model subtree reads frozen blocks instead of
    re-running the corpus explode."""
    m = nb_counts(df, min_count, id_col, label_col, text_col).localCheckpoint(
        eager=False
    )
    stats = _stats_fp(df, m, label_col)
    if not stats:
        return df.select(
            F.col(id_col), F.col(label_col),
            F.lit(None).cast("string").alias("pred"),
            F.lit(None).cast("long").alias("score_fp"),
        ).where(F.lit(False))
    model_wide = (
        nb_model(df, min_count, id_col, label_col, text_col, counts=m)
        .groupBy("token")
        .agg(*[
            F.sum(F.when(F.col("label") == lbl, F.col("logp_fp"))).alias(f"lp_{i}")
            for i, (lbl, _, _) in enumerate(stats)
        ])
    )
    toks = _labeled(df, label_col).select(
        F.col(id_col), F.col(label_col),
        F.explode_outer(words(F.col(text_col))).alias("token"),
    )
    scored = (
        toks.join(F.broadcast(model_wide), "token", "left")
        .groupBy(id_col, label_col)
        .agg(*[
            F.sum(
                F.when(F.col("token").isNull(), F.lit(0).cast("long"))
                .otherwise(F.coalesce(F.col(f"lp_{i}"), F.lit(def_fp)))
            ).alias(f"s_{i}")
            for i, (_, def_fp, _) in enumerate(stats)
        ])
    )
    score_cols = [
        (F.col(f"s_{i}") + F.lit(prior_fp)).alias(f"score_{i}")
        for i, (_, _, prior_fp) in enumerate(stats)
    ]
    scored = scored.select(id_col, label_col, *score_cols)
    # argmax fold, ascending label order: a later label wins only on a
    # STRICTLY greater score, so ties resolve to the smaller label string
    best_s, best_l = F.col("score_0"), F.lit(stats[0][0])
    for i in range(1, len(stats)):
        s = F.col(f"score_{i}")
        gt = s > best_s
        best_l = F.when(gt, F.lit(stats[i][0])).otherwise(best_l)
        best_s = F.when(gt, s).otherwise(best_s)
    return scored.select(
        F.col(id_col), F.col(label_col),
        best_l.alias("pred"), best_s.alias("score_fp"),
    )


def nb_confusion(classified: DataFrame, label_col: str = "lang") -> DataFrame:
    """Confusion matrix of the classifier over its own training corpus
    (the standard fit-quality report): (actual, pred, n)."""
    return classified.groupBy(
        F.col(label_col).alias("actual"), "pred"
    ).agg(F.count(F.lit(1)).alias("n"))


def nb_artifacts(
    df: DataFrame,
    min_count: int = NB_MIN_COUNT,
    id_col: str = "doc_id",
    label_col: str = "lang",
    text_col: str = "text",
):
    """The trained model as DRIVER artifacts for closure shipping: the
    (token, label) -> logp_fp dict plus sorted [(label, def_fp,
    prior_fp)] - the fastText-style "model file" a stateless serving
    path distributes to workers. Bounded by the vocabulary cut x
    |labels| (the same boundedness argument as the BPE merge table in
    apply_bpe_merges' closure). Shares _stats_fp with nb_classify so
    the batch and streamed scorers can never drift on the formulas, and
    lazily checkpoints the counts frame so the model collect's pass
    freezes the training aggregation for the stats collect."""
    m = nb_counts(df, min_count, id_col, label_col, text_col).localCheckpoint(
        eager=False
    )
    model = {
        (r["token"], r["label"]): r["logp_fp"]
        for r in nb_model(
            df, min_count, id_col, label_col, text_col, counts=m
        ).collect()
    }
    return model, _stats_fp(df, m, label_col)


def nb_score_kernel(model: dict, stats: list):
    """Arrow batch kernel scoring rows with the shipped artifacts -
    STATELESS (no state store, no watermark): pure-integer micro-nat
    sums and the same ascending-label strictly-greater argmax as the
    engine's when-chain, so streamed output is bit-identical to batch
    nb_classify. NULL/token-less text scores prior-only, matching the
    batch explode_outer row; NULL-label rows are dropped, matching the
    batch _labeled contract (without it, stream and batch would diverge
    on unlabeled documents)."""
    import pandas as pd

    labels = [lbl for lbl, _, _ in stats]

    def score_batches(batches):
        for pdf in batches:
            keep, preds, scores = [], [], []
            for i, (lang, text) in enumerate(zip(pdf["lang"], pdf["text"])):
                if not isinstance(lang, str):
                    continue  # NULL label: excluded, like batch _labeled
                toks = (
                    [t for t in text.lower().split(" ") if t]
                    if isinstance(text, str) else []
                )
                best_l, best_s = None, None
                for lbl, def_fp, prior_fp in stats:
                    s = prior_fp + sum(
                        model.get((w, lbl), def_fp) for w in toks
                    )
                    if best_s is None or s > best_s:
                        best_l, best_s = lbl, s
                keep.append(i)
                preds.append(best_l)
                scores.append(best_s)
            kept = pdf.iloc[keep].reset_index(drop=True)
            out = pd.DataFrame(
                {
                    "doc_id": kept["doc_id"],
                    "lang": kept["lang"],
                    "pred": pd.array(preds, dtype="string"),
                    "score_fp": pd.array(scores, dtype="Int64"),
                }
            )
            yield out

    return score_batches, labels
