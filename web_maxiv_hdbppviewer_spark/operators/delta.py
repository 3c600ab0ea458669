"""Corpus snapshot reconciliation: what changed between two versions.

An incremental training-data pipeline re-processes only the delta between
corpus snapshots (yesterday's crawl vs today's): added documents enter
dedup/quality scoring, removed ones retire from the index, changed ones
invalidate downstream artifacts. The reference has no analogue (its archive
is append-only); this is pipeline-surface functionality like
operators/sampling.py.

Scale shape (100 TB): each side reduces to (id, fingerprint) BEFORE the
join - a 16-byte md5 per document instead of the document itself - so the
full-outer equi-join on the id key shuffles ~24 bytes/doc, not the corpus.
With both snapshots bucketed by id (operators/skew.write_datapoints_bucketed
pattern) the join is exchange-free; either way it is one shuffle, no
cartesian anywhere, and the output is one row per distinct id across both
snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """(id, status): 'added' | 'removed' | 'changed' | 'unchanged'.

    Documents are compared by an md5 fingerprint of ``content_cols``
    (computed per side pre-shuffle; fingerprints never cross engines, so
    any deterministic hash gives identical statuses). Each content column
    is coalesced to a distinct NULL sentinel BEFORE hashing: concat_ws
    silently skips NULL args, which would otherwise fingerprint
    (NULL,) == ('',) and ('a', NULL) == ('a', '') - and would diverge from
    a md5(NULL)=NULL oracle, where NULL-text rows misreport as
    added/removed instead of unchanged.
    """
    fp = F.md5(
        F.concat_ws(
            "\x1f",
            *[F.coalesce(F.col(c), F.lit("\x00NULL")) for c in content_cols],
        )
    )
    o = old.select(F.col(id_col).alias("id"), fp.alias("fp_old"))
    n = new.select(F.col(id_col).alias("id"), fp.alias("fp_new"))
    status = (
        F.when(F.col("fp_old").isNull(), "added")
        .when(F.col("fp_new").isNull(), "removed")
        .when(F.col("fp_old") == F.col("fp_new"), "unchanged")
        .otherwise("changed")
    )
    return o.join(n, "id", "full_outer").select("id", status.alias("status"))


def incremental_group_stats(
    v1: DataFrame,
    v2: DataFrame,
    diff: DataFrame,
    keys: tuple[str, ...] = ("lang", "source"),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental MAINTENANCE of a per-group aggregate under a snapshot
    diff - the materialized-view algebra a daily 100 TB pipeline runs
    instead of full recompute: for additive stats S,

        S(v2) = S(v1) - contrib(removed + changed@v1)
                      + contrib(added + changed@v2)

    Returns the maintained (lang, source, n_docs, tok_sum, char_sum) -
    exactly equal to recomputing over v2 (the oracle proves it), but the
    expensive per-document work (tokenization) touches ONLY the diff
    slices: both contribution subtrees are LEFT SEMI joins of a snapshot
    against the diff ids, so maintenance cost is O(|delta|) + the cost
    of re-reading the standing aggregate, never O(|corpus|). Counts and
    sums are exact integers, so subtraction is exact; groups whose doc
    count reaches zero drop out, groups new in v2 appear - both via the
    same union + re-aggregate."""
    from ..functions.texthash import words

    def contrib(df, sign: int):
        return df.groupBy(*[F.col(k) for k in keys]).agg(
            (F.lit(sign) * F.count(F.lit(1))).alias("n_docs"),
            (
                F.lit(sign)
                * F.sum(F.size(words(F.col(text_col))).cast("long"))
            ).alias("tok_sum"),
            (F.lit(sign) * F.sum(F.length(text_col).cast("long"))).alias(
                "char_sum"
            ),
        )

    old = contrib(v1, 1)
    out_ids = diff.where(F.col("status").isin("removed", "changed")).select("id")
    in_ids = diff.where(F.col("status").isin("added", "changed")).select("id")
    neg = contrib(
        v1.join(out_ids, v1[id_col] == out_ids["id"], "left_semi"), -1
    )
    pos = contrib(v2.join(in_ids, v2[id_col] == in_ids["id"], "left_semi"), 1)
    return (
        old.unionByName(neg)
        .unionByName(pos)
        .groupBy(*keys)
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("tok_sum").alias("tok_sum"),
            F.sum("char_sum").alias("char_sum"),
        )
        .where(F.col("n_docs") > 0)
    )
