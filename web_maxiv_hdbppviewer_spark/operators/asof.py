"""As-of (latest-before-t) lookup operators (SURVEY S5/J3/O3).

The reference fetches the latest parameter row before a point in time with
``ORDER BY recv_time DESC LIMIT 1`` per key (reference hdbpp.py:166-177,
261-270) - a point-in-time/as-of join between a probe time and a history
table. Spark-first: a window top-1 per key, or ``max_by`` when only one
payload column is needed.

Scale: ``row_number`` over (key, ts desc) is a single shuffle by key; with
storage bucketed by key it is shuffle-free. For many probe times (true
as-of join between two tables) use ``asof_join`` below: union-and-window,
which stays a single sort per key rather than an O(n^2) theta join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
) -> DataFrame:
    """Top-1 row per key under a descending order (LIMIT 1 DESC analog)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def latest_before(
    df: DataFrame,
    t,
    keys: list[str],
    ts_col: str = "ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Latest row strictly before ``t`` per key (reference hdbpp.py:261-270).

    The cutoff literal goes through utc_ts_lit (r19: a naive datetime in
    F.lit converts via the HOST zone - see functions/time.utc_ts_lit)."""
    from ..functions.time import utc_ts_lit

    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    return latest_per_key(df.where(F.col(ts_col) < utc_ts_lit(t)), keys, order)


def asof_join(
    probes: DataFrame,
    history: DataFrame,
    keys: list[str],
    probe_ts: str = "ts",
    hist_ts: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """Generalized as-of join: for each probe row, the nearest history row
    at-or-before (backward) / at-or-after (forward) its timestamp.

    Implemented as union + window ``last(ignorenulls)`` - one shuffle on
    the key, no range explosion; the idiomatic Spark shape for point-in-time
    correctness joins.
    """
    h = history.select(
        *keys,
        F.col(hist_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[c for c in history.columns if c not in keys]).alias("_payload"),
    )
    p = probes.select(
        *keys,
        F.col(probe_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(h.schema["_payload"].dataType).alias("_payload"),
    )
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        # ties: a history row AT the probe timestamp must precede the probe
        # in the (descending-time) window so "at-or-after" includes it -
        # _side ASC puts history (0) first, exactly like the backward path
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    joined = (
        h.unionByName(p)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    return joined.select(*keys, F.col("_t").alias(probe_ts), F.col("_match").alias("asof"))
