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
