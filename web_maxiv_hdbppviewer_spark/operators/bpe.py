"""Distributed BPE merge training (SURVEY §7.1 M6, the "BPE-ish" token
counter's missing half: REAL learned merges).

Classic word-frequency BPE (Sennrich'16): tokenize the corpus to a
word-frequency table once, represent every word as a separator-joined
character-token string, then iterate - count adjacent token pairs weighted
by word frequency, merge the globally most frequent pair everywhere, repeat.

Scale shape: the corpus is touched ONCE (word-count groupBy); every
iteration after that runs over the VOCABULARY table (orders of magnitude
smaller than the corpus - the standard trick that makes BPE training
tractable), as one pair-explode + groupBy and one fold projection. Only the
single winning (pair, count) row crosses the driver per iteration, bounded
by the merge count - the same discipline as ``train_ivf_centroids``
(operators/similarity.py). States are localCheckpoint-ed so plan depth
stays constant across iterations.

Determinism / oracle parity: the winning pair is argmax by
(count DESC, lhs ASC, rhs ASC) - binary string order, identical for ASCII
in any engine - and the merge application is an exact greedy left-to-right
fold (acc ends with SEP+lhs and next == rhs -> append rhs to acc), which
DuckDB reproduces verbatim with ``list_reduce`` (the oracle unrolls the
same iterations; see plans/extensions_oracle._bpe_train_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.texthash import words

#: token separator inside a word's state string; ASCII unit separator never
#: appears in whitespace-split tokens of the (ASCII-asserted) corpus
SEP = "\x1f"

#: default number of merges a declared query trains (kept small enough for
#: the unrolled SQL oracle to stay readable; the operator takes any n)
N_MERGES = 6


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, f): lower-cased whitespace vocabulary with corpus frequencies -
    the ONE corpus-wide pass of BPE training."""
    return (
        df.select(F.explode(words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )


def _merge_fold(l, lhs: str, rhs: str):
    """Exact greedy left-to-right application of one merge to a token list:
    fold tokens into a SEP-joined string, gluing rhs onto acc whenever the
    accumulated string's LAST token is lhs and the incoming token is rhs
    (tokens never contain SEP, so the endswith test identifies the last
    token precisely; runs like [a,a,a] with pair (a,a) merge as [aa, a])."""
    acc0 = F.element_at(l, 1)
    rest = F.slice(l, 2, F.greatest(F.size(l) - 1, F.lit(0)))
    return F.aggregate(
        rest,
        acc0,
        lambda acc, x: F.when(
            ((acc == F.lit(lhs)) | acc.endswith(F.lit(SEP + lhs)))
            & (x == F.lit(rhs)),
            F.concat(acc, F.lit(rhs)),
        ).otherwise(F.concat(acc, F.lit(SEP), x)),
    )


def train_bpe_merges(
    df: DataFrame, n_merges: int = N_MERGES, text_col: str = "text"
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (step, lhs, rhs, n_pairs) - step is 1-based training order, n_pairs the
    frequency-weighted adjacent-pair count that won the step."""
    spark = df.sparkSession
    # ONE materialization (the corpus-wide word-count pass); the evolving
    # tokenization stays a LAZY nested-fold expression over it - per
    # iteration that re-evaluates every prior merge's fold (O(n_merges^2 x
    # vocab) total, cheap for vocabulary tables), which beats a
    # localCheckpoint job per iteration (measured: checkpoint scheduling
    # dominated the loop on small vocabularies, and at large vocab a
    # checkpoint write per merge step is corpus-I/O the folds avoid).
    states = (
        word_frequencies(df, text_col)
        .select("w", "f", F.array_join(F.split("w", ""), SEP).alias("s"))
        .localCheckpoint()
    )
    s_expr = F.col("s")
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        l = F.split(s_expr, SEP)
        pairs = states.select(
            "f",
            F.explode(
                F.arrays_zip(
                    F.slice(l, 1, F.size(l) - 1).alias("lhs"),
                    F.slice(l, 2, F.size(l) - 1).alias("rhs"),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(
                F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs")
            )
            .agg(F.sum("f").cast("long").alias("n_pairs"))
            .orderBy(F.col("n_pairs").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0]["lhs"], best[0]["rhs"], int(best[0]["n_pairs"])
        merges.append((step, a, b, n))
        s_expr = _merge_fold(F.split(s_expr, SEP), a, b)
    return spark.createDataFrame(
        merges, "step long, lhs string, rhs string, n_pairs long"
    )


def apply_bpe_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token count under a learned merge list: re-tokenize the
    vocabulary once through the merge sequence (vocabulary-sized work), then
    count each document's tokens word by word - (id, n_bpe_tokens)."""
    toks = words(F.col(text_col))
    vocab = df.select(F.explode(toks).alias("w")).distinct()
    s = F.array_join(F.split("w", ""), SEP)
    for a, b in merges:
        s = _merge_fold(F.split(s, SEP), a, b)
    sized = vocab.select(
        "w", F.size(F.split(s, SEP)).cast("long").alias("n_tok")
    )
    exploded = df.select(F.col(id_col), F.explode(toks).alias("w"))
    return (
        exploded.join(F.broadcast(sized), "w")
        .groupBy(id_col)
        .agg(F.sum("n_tok").cast("long").alias("n_bpe_tokens"))
    )
