"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join split (enabled in session.py) handles most runtime skew by
splitting oversized shuffle partitions, but it cannot help two cases that a
100 TB archive hits:

  - a GROUP BY whose hottest key exceeds one task's memory (AQE splits
    partitions, not keys): ``salted_agg`` runs the aggregation in two
    stages - first on (key, salt), then on key - so the hot key's rows
    spread over ``n_salts`` tasks and the final stage only combines
    ``n_salts`` partial rows per key. Works for any algebraic aggregate
    (sum/count/min/max, and avg via sum+count).
  - a JOIN whose hot key floods one task: ``salted_join`` salts the big
    (probe) side with a random salt in [0, n_salts) and explodes the small
    (build) side n_salts times, turning one hot shuffle partition into
    n_salts co-partitioned ones. Row multiplication is confined to the
    SMALL side (n_salts x |small|), the exact dual of a broadcast join for
    dimensions too big to broadcast but small enough to replicate.

Both transformations are semantics-preserving for their stated aggregate /
join types (inner and left-outer on the big side) - property-tested against
the unsalted plans in tests/test_plans.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: deterministic per-row salt: hash of all columns + the source partition id,
#: mod n. Deterministic (no rand() -> retried tasks recompute identical
#: salts, required for exactly-once shuffle files) yet spreads even a hot
#: key consisting of IDENTICAL duplicate rows, which an all-column hash
#: alone would send to one salt.


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    cols = [F.col(c) for c in df.columns] + [F.spark_partition_id()]
    return F.pmod(F.hash(*cols), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {"sum", "count", "min", "max"}. Example::

        salted_agg(dp, ["att_conf_id"], {"n": ("value_r", "count"),
                                         "mx": ("value_r", "max")})

    equals ``dp.groupBy("att_conf_id").agg(count(value_r), max(value_r))``
    row-for-row, but no single task ever holds a full hot key.
    """
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for _out, (_c, fn) in aggs.items():
        if fn not in first:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    stage1 = df.withColumn("_salt", _row_salt(df, n_salts)).groupBy(
        *keys, "_salt"
    )
    partials = stage1.agg(
        *[first[fn](c).alias(out) for out, (c, fn) in aggs.items()]
    )
    return partials.groupBy(*keys).agg(
        *[recombine[fn](out).alias(out) for out, (c, fn) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Join a skewed big side to a replicable small side without one hot
    shuffle partition.

    Supported ``how``: "inner" and "left" (outer on the BIG side) - the
    salt is an equi-key on both sides so match semantics are unchanged;
    small-side rows are replicated once per salt value.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner / left (big-side) joins")
    on = list(on)
    salted_big = big.withColumn("_salt", _row_salt(big, n_salts))
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(replicated, on + ["_salt"], how).drop("_salt")
