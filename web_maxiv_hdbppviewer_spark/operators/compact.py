"""Small-file compaction: rewrite a fragmented parquet dataset into
target-sized, range-clustered files.

The 100 TB operational problem: streaming/incremental ingest (the
reference's 10 s cassandra flush cadence, hdbpp.py:33-46) lands thousands
of KB-sized files per partition; every scan then pays one task + one
footer read per file, and min/max pruning is useless because each file
spans the whole key range. Compaction is the standing maintenance job
that fixes both: one shuffle to ``ceil(rows / target_rows)`` RANGE
partitions on the clustering key, so output files are (a) uniformly
target-sized and (b) key-disjoint - a point/range predicate on the key
prunes to one file via parquet min/max stats alone.

Spark-first shape: ``repartitionByRange`` (sampled range boundaries,
explicit file count - AQE leaves user-specified partition counts alone,
so the on-disk layout is the planned one) + a plain parquet write. The
only driver-side values are per-FILE aggregates (``file_ranges``:
``n_files`` rows), never per-row data.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_fragmented(df: DataFrame, path: str, n_files: int) -> None:
    """Round-robin scatter into ``n_files`` files - the ingest-shaped
    anti-layout (used by the witness to manufacture the problem)."""
    df.repartition(n_files).write.mode("overwrite").parquet(path)


def compact(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    key: str,
    target_rows: int,
) -> int:
    """Compact ``src_path`` into ``ceil(n / target_rows)`` files range-
    clustered on ``key``; returns the planned file count."""
    df = spark.read.parquet(src_path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows))
    (
        df.repartitionByRange(n_files, F.col(key))
        .write.mode("overwrite")
        .parquet(dest_path)
    )
    return n_files


def count_part_files(path: str) -> int:
    """Actual data files on disk (what a scan would open)."""
    return sum(1 for f in os.listdir(path) if f.startswith("part-"))


def file_ranges(spark: SparkSession, path: str, key: str) -> DataFrame:
    """(file, lo, hi) per data file - bounded at n_files rows."""
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.min(key).alias("lo"), F.max(key).alias("hi"))
    )


def n_range_overlaps(spark: SparkSession, path: str, key: str) -> int:
    """Count of overlapping file pairs on ``key`` - 0 certifies that the
    files are key-disjoint (min/max pruning hits exactly one file for a
    point predicate). Bounded: n_files^2 over an n_files-row frame."""
    r = file_ranges(spark, path, key)
    a = r.select(F.col("file").alias("fa"), F.col("lo").alias("la"), F.col("hi").alias("ha"))
    b = r.select(F.col("file").alias("fb"), F.col("lo").alias("lb"), F.col("hi").alias("hb"))
    return (
        a.crossJoin(b)
        .where(F.col("fa") < F.col("fb"))
        .where((F.col("la") <= F.col("hb")) & (F.col("lb") <= F.col("ha")))
        .count()
    )
