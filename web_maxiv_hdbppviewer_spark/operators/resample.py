"""Resample / downsample operator (reference data.py:12-47, SURVEY A1/T3).

The reference buckets timestamps to a pandas frequency and takes the mean of
all numeric columns per bucket; crucially it rounds to the NEAREST bucket
(``round_timestamp``, reference data.py:12-14), not the floor. We replicate
with explicit bucket arithmetic so batch and (future) streaming share one
expression; output schema is explicit, never "all numeric columns".

Scale: a single hash aggregate; partial aggregation (map-side combine) means
shuffle volume is O(buckets x series), not O(rows). No skew risk: bucket
cardinality is bounded by time-range/width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.time import epoch_us, nearest_bucket

_FREQ_US = {"us": 1, "ms": 1_000, "s": 1_000_000, "m": 60_000_000, "h": 3_600_000_000, "d": 86_400_000_000}


def freq_to_us(freq: str) -> int:
    """Parse a reference-style interval string ('30s', '15m') to microseconds.

    Mirrors the reference's pandas offset translation (data.py:19-24:
    ms->L, s->S, m->T) without pandas.
    """
    n = ""
    i = 0
    while i < len(freq) and (freq[i].isdigit() or freq[i] == "."):
        n += freq[i]
        i += 1
    unit = freq[i:].strip().lower() or "s"
    if unit not in _FREQ_US:
        raise ValueError(f"unsupported resample unit: {freq!r}")
    return int(float(n or "1") * _FREQ_US[unit])


def resample_mean(
    df: DataFrame,
    width_us: int,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Tumbling mean with round-to-nearest buckets.

    Returns (keys..., bucket, mean_v, n). ``bucket`` is the integer bucket
    index; bucket * width_us is its center-aligned epoch.
    """
    b = nearest_bucket(epoch_us(F.col(ts_col)), width_us).alias(bucket_col)
    grouped = df.groupBy(*(keys or []), b)
    return grouped.agg(
        F.avg(value_col).alias("mean_v"),
        F.count(F.lit(1)).alias("n"),
    )
