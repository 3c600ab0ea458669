"""Time-column expression helpers.

The reference reconstructs event time from a split (second-precision
timestamp + int microsecond remainder) in three places with three different
precisions (reference data.py:25-30 int64 us; hdbpp.py:86-87 float ms;
hdbpp.py:256 float s). Our engine keeps ONE native microsecond TIMESTAMP
column and derives integer epochs from it - exact int64 arithmetic, no float
round-trips (SURVEY §7.3).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

US_PER_SECOND = 1_000_000
US_PER_DAY = 86_400_000_000

_EPOCH_NAIVE = datetime(1970, 1, 1)
_EPOCH_UTC = datetime(1970, 1, 1, tzinfo=timezone.utc)
_US = timedelta(microseconds=1)


def datetime_to_epoch_us(t: datetime) -> int:
    """Epoch microseconds, timezone-INDEPENDENT for naive datetimes.

    Naive datetimes are engine-wide UTC (spark.sql.session.timeZone=UTC;
    the DuckDB oracle reads naive TIMESTAMP the same way). ``t.timestamp()``
    would instead interpret them in the HOST's local zone, silently shifting
    every pushed-down time filter by the UTC offset on non-UTC hosts.
    """
    epoch = _EPOCH_NAIVE if t.tzinfo is None else _EPOCH_UTC
    return (t - epoch) // _US


def utc_ts_lit(t: datetime) -> Column:
    """TIMESTAMP literal for a datetime, HOST-TIMEZONE-INDEPENDENT.

    A naive datetime handed to ``F.lit`` rides py4j's DatetimeConverter,
    which converts via ``time.mktime`` - the HOST LOCAL zone - so on any
    non-UTC machine every literal time bound silently shifts by the host
    offset while the engine's naive-IS-UTC contract (and the DuckDB
    oracles, and the period day-key pruning) do not (r19 review;
    pyspark/sql/types.py DatetimeConverter). Building the literal from
    the integer epoch via ``timestamp_micros`` pins the instant exactly;
    Catalyst constant-folds it back to a plain literal, so predicate
    pushdown is unaffected."""
    return F.timestamp_micros(F.lit(datetime_to_epoch_us(t)))


def parse_time_to_naive_utc(timestring: str) -> datetime:
    """API-edge request-time parsing, the reference's rule verbatim
    (reference utils.py:14-19): the database speaks UTC and the engine's
    datetimes are naive, so a naive input is taken AS UTC unchanged, and
    an aware input is converted to UTC and stripped of its tzinfo. ISO
    8601 strings (what the JS client posts, js/actions.js)."""
    parsed = datetime.fromisoformat(timestring)
    if parsed.tzinfo is None:
        return parsed
    return parsed.astimezone(timezone.utc).replace(tzinfo=None)


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


def push_time_filter(
    df,
    t0=None,
    t1=None,
    lower_inclusive: bool = True,
    upper_inclusive: bool = True,
    ts_col: str = "ts",
):
    """Time-range filter that reaches parquet row-group statistics.

    A predicate on the DERIVED microsecond timestamp
    (``timestamp_micros(ns div 1000)``) is an opaque expression to the
    parquet source - no pushdown, full scan. When the raw int64
    nanosecond scan column (``_ts_ns``) is present, this helper expresses
    the same bound as a plain integer comparison on it, which pushes down
    (X2; the reference's server-side ``data_time >= ?``, hdbpp.py:203-208).

    Bound translation is exact for the truncating ns->us conversion:
      derived ts >= t0  <=>  ns >= us(t0)*1000
      derived ts >  t0  <=>  ns >= (us(t0)+1)*1000
      derived ts <= t1  <=>  ns <  (us(t1)+1)*1000
      derived ts <  t1  <=>  ns <  us(t1)*1000
    Falls back to the timestamp column when no raw column exists (e.g.
    native-timestamp stores, where pushdown needs no help).
    """
    _us = datetime_to_epoch_us

    if "_ts_ns" in df.columns:
        c = F.col("_ts_ns")
        if t0 is not None:
            lo = _us(t0) if lower_inclusive else _us(t0) + 1
            df = df.where(c >= lo * 1000)
        if t1 is not None:
            hi = _us(t1) + 1 if upper_inclusive else _us(t1)
            df = df.where(c < hi * 1000)
        return df
    # utc_ts_lit, never F.lit(datetime): the bare literal converts via
    # the HOST zone (r19 review - see utc_ts_lit)
    c = F.col(ts_col)
    if t0 is not None:
        lo = utc_ts_lit(t0)
        df = df.where(c >= lo if lower_inclusive else c > lo)
    if t1 is not None:
        hi = utc_ts_lit(t1)
        df = df.where(c <= hi if upper_inclusive else c < hi)
    return df


def nearest_bucket(t_us: Column, width_us: float) -> Column:
    """Round-to-NEAREST time bucket index, ties to EVEN.

    The reference's resample rounds timestamps to the nearest bucket with
    PYTHON round (``round(t.value/freq.delta.value)``, reference
    data.py:12-14) - which is round-half-to-EVEN at an exactly-halfway
    instant, not half-up. Spark's ``window()`` and DuckDB's
    ``time_bucket`` floor; a ``floor(t/w + 0.5)`` would round half UP and
    silently diverge from the reference for events landing bitwise on a
    half-bucket boundary with an even quotient floor (entirely plausible
    for regularly-sampled archiver data). ``bround`` is BigDecimal
    HALF_EVEN over the same IEEE quotient python round sees, so the tie
    rule matches exactly; DuckDB twins use ``round_even``. (Remaining
    deliberate difference: the reference divides NANOsecond int64s as
    doubles, losing integer precision above 2^53 ns - that is ~104 days
    after epoch, so essentially every realistic timestamp; our
    microsecond quotient is the same index computed without that loss.)
    """
    return F.bround(t_us / float(width_us)).cast("long")
