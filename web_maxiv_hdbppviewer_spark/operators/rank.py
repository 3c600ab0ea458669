"""Distributed global ranking - the scale-correct form of
``row_number() OVER (ORDER BY ...)``.

A global window with no PARTITION BY collapses to ONE task in Spark - the
classic 100 TB scale killer. The distributed construction: range-partition
on the order columns (sampled boundaries, the same machinery as orderBy),
rank WITHIN each partition, then shift each partition by the total row
count of the partitions before it. The only driver-side value is the
per-partition count vector (bounded: n_partitions rows), exactly the
TakeOrdered/watermark-scalar discipline. The result is independent of the
sampled partition boundaries because ``order_cols`` must be a TOTAL order
(add a unique id as the last column - same rule as every deterministic
ranking in this engine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str | Column],
    n_partitions: int = 32,
    out_col: str = "rank",
) -> DataFrame:
    """Add 1-based ``out_col`` = global row number under ``order_cols``."""
    part = df.repartitionByRange(
        n_partitions, *[F.col(c) if isinstance(c, str) else c for c in order_cols]
    ).withColumn("_pid", F.spark_partition_id())
    # MATERIALIZE the range partitioning before anything reads it twice:
    # the counts job and the rank job would otherwise each re-execute the
    # exchange, and RangePartitioner re-SAMPLES boundaries per execution
    # (seeded by rdd id) - under real sampling the two runs can split ties
    # differently, silently misaligning the offsets against the partitions
    # they are applied to. After the checkpoint both jobs read the same
    # frozen blocks (the doc_shingle_arrays discipline); correctness no
    # longer depends on boundary reproducibility, only on the total order.
    part = part.localCheckpoint()
    counts = {
        r["_pid"]: r["c"]
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off = part.sparkSession.createDataFrame(offsets, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_cols]
    )
    return (
        part.join(F.broadcast(off), "_pid")
        .withColumn(out_col, (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )


def quantile_tiers(
    df: DataFrame,
    order_cols: list[str | Column],
    k: int,
    n_partitions: int = 32,
) -> DataFrame:
    """Even-spread quantile tiers: tier = floor((rank-1) * k / n) + 1 over
    the global ranking - pure integer arithmetic (no float boundary, no
    engine-specific NTILE fill rule), so any SQL engine reproduces it from
    the same ROW_NUMBER. The curriculum/quality-bucketing shape: tier 1 =
    lowest ``order_cols``, tier k = highest."""
    ranked = global_rank(df, order_cols, n_partitions)
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(
            "tier",
            (F.floor((F.col("rank") - 1) * k / F.col("n")) + 1).cast("long"),
        )
        .drop("n")
    )
