"""Time-column expression helpers.

The reference reconstructs event time from a split (second-precision
timestamp + int microsecond remainder) in three places with three different
precisions (reference data.py:25-30 int64 us; hdbpp.py:86-87 float ms;
hdbpp.py:256 float s). Our engine keeps ONE native microsecond TIMESTAMP
column and derives integer epochs from it - exact int64 arithmetic, no float
round-trips (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

US_PER_SECOND = 1_000_000
US_PER_DAY = 86_400_000_000


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def epoch_us(c: Column | str) -> Column:
    """Microseconds since epoch as BIGINT (exact; reference data.py:27-30)."""
    return F.unix_micros(_col(c))


def epoch_ms(c: Column | str) -> Column:
    """Milliseconds since epoch as BIGINT, floored from the us epoch.

    Mirrors the Grafana sink's ms timestamps (reference hdbpp.py:86-87,
    data.py:70-73) but without the float64 precision loss.
    """
    return F.floor(epoch_us(c) / 1000.0).cast("long")


def nearest_bucket(t_us: Column, width_us: float) -> Column:
    """Round-to-NEAREST time bucket index.

    The reference's resample rounds timestamps to the nearest bucket
    (``round(t / freq) * freq``, reference data.py:12-14) while Spark's
    ``window()`` and DuckDB's ``time_bucket`` floor; this explicit
    ``floor(t/w + 0.5)`` replicates the reference semantics exactly and is
    identical arithmetic in any engine (SURVEY §7.3 hard-part #1).
    """
    return F.floor(t_us / float(width_us) + 0.5).cast("long")
