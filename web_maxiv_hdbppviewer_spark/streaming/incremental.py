"""Incremental merge for the hot "today" partition (SURVEY X8/T1).

The reference can't cache the growing current day as immutable, so it keeps
a cached frame, computes the watermark max(data_time), TRUNCATES the final
second of the cache (because Cassandra can't filter microseconds
server-side) and re-fetches data_time >= watermark (reference
hdbpp.py:362-397).

With native microsecond timestamps the truncate-a-second trick is obsolete:
we keep cached rows strictly before the exact watermark, fetch ts >=
watermark, and drop duplicate (att_conf_id, ts) on the seam - semantically
identical, no re-read amplification. ``merged_equals_full`` is the
correctness property the reference relies on implicitly; our tests assert
it (SURVEY §5.4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermark_us(cached: DataFrame, ts_col: str = "ts"):
    """Exact max event time of the cached slice (reference hdbpp.py:386 A4)."""
    row = cached.agg(F.max(ts_col).alias("wm")).collect()[0]
    return row["wm"]


def incremental_merge(
    cached: DataFrame,
    fetch_from: Callable[[object], DataFrame],
    keys: list[str] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """cached + freshly fetched suffix, exact-once on the seam.

    ``fetch_from(watermark)`` must return rows with ts >= watermark (the
    pushed lower-bound scan S2). The seam is handled by the STRICT cache
    trim: ``keep`` holds ts < watermark and ``fresh`` holds ts >=
    watermark, so the watermark row itself always comes from the fresh
    fetch and the two sides cannot overlap - replacing the reference's
    truncate-one-second + re-fetch (F4). dropDuplicates on (keys, ts) is
    the SECOND, independent guarantee (r18 review - previously
    documented as the seam mechanism, which the strict trim already is):
    it makes the merge idempotent per (key, ts) WITHIN each side too, so
    a source that re-delivers a row (an at-least-once upstream) yields
    the same merged frame as a clean fetch - the same final-state
    contract the oracle's full-refetch twin checks."""
    wm = watermark_us(cached, ts_col)
    if wm is None:
        return fetch_from(None)
    keep = cached.where(F.col(ts_col) < F.lit(wm))
    fresh = fetch_from(wm)
    return keep.unionByName(fresh).dropDuplicates((keys or []) + [ts_col])


def streaming_resample(
    stream: DataFrame,
    width_seconds: int,
    ts_col: str = "ts",
    value_col: str = "value_r",
    keys: list[str] | None = None,
    late_threshold: str = "10 seconds",
) -> DataFrame:
    """The T3 tumbling mean under Structured Streaming: identical window
    expression to the batch resample, plus an event-time watermark for late
    data (the reference's polling refresh, js/actions.js:125-190, becomes a
    real stream). Note: streaming windows FLOOR bucket edges (standard
    streaming semantics); the batch path's round-to-nearest exists for
    reference parity only.
    """
    return (
        stream.withWatermark(ts_col, late_threshold)
        .groupBy(
            *(keys or []),
            F.window(F.col(ts_col), f"{width_seconds} seconds").alias("win"),
        )
        .agg(F.avg(value_col).alias("mean_v"), F.count(F.lit(1)).alias("n"))
        .select(
            *(keys or []),
            F.col("win.start").alias("bucket_start"),
            "mean_v",
            "n",
        )
    )


def streaming_raster_windowed(
    stream: DataFrame,
    x0_us: int,
    span_us: float,
    nx: int,
    ymin: float,
    ymax: float,
    ny: int,
    ts_col: str = "ts",
    value_col: str = "value",
    late_threshold: str = "1 hour",
    keys: list[str] | None = None,
) -> DataFrame:
    """APPEND-MODE twin of the A6 raster kernel - the production shape of
    a live /image dashboard (the complete-mode ``stream_raster`` witness
    re-emits the whole raster per trigger; a deployment instead wants
    each pixel COLUMN emitted exactly once, when the event-time watermark
    passes it, and its state evicted).

    The pixel column is an event-time tumbling window whose duration is
    the column width (span / nx). Windowing on the raw ``ts`` would bin
    by EXACT integer grid arithmetic, which disagrees with the batch
    ``xbin`` float expression ``floor((t-x0)/span*nx)`` for events
    bitwise-exactly on a column boundary (two float roundings can pull
    the quotient one ulp below the integer; with the production 30-day
    span and nx=100, columns 29/57/58 bin boundary events one column
    left of the exact grid). So each event is instead windowed on a
    SYNTHETIC event time - the start of the column the batch expression
    assigns it to, ``x0 + xbin(ts)*col_us`` - making the streaming grid
    carry the batch bin arithmetic bit-for-bit, boundary events
    included. Requires an integral-microsecond column width (true for
    any resolution the /image API serves; asserted).

    Output (append per finalized column): (xb, yb, cnt, vmean, vmin,
    vmax) - bit-compatible with ``operators.raster.bin_2d``. State is
    bounded by (open windows x ny) cells and evicted at the watermark:
    the screen-resolution-bounded property, now also TIME-bounded. The
    watermark rides the synthetic time, which differs from the real
    event time by AT MOST one column width in either direction (a
    hazard-boundary event lands exactly one column away; the float
    quotient can also round a near-boundary value up) - so the
    effective lateness bound is ``late_threshold`` plus at most one
    pixel column.
    """
    from ..functions.time import epoch_us
    from ..operators.raster import xbin_long, ybin

    col_us = span_us / nx
    assert col_us == int(col_us), (
        f"pixel column width must be integral microseconds, got {col_us}"
    )
    col_us = int(col_us)
    dur = f"{col_us} microseconds"
    off = f"{x0_us % col_us} microseconds"
    v = F.col(value_col)
    # xbin_long, never the int32-narrowed xbin: this timestamp is
    # deliberately UNCLIPPED (see below), and a far-out-of-canvas event
    # must bin to a far-away-but-faithful column, not int32-wrap to a
    # months-in-the-future synthetic time that jumps the watermark and
    # finalizes every open column (r18 review)
    col_start = F.timestamp_micros(
        F.lit(x0_us)
        + xbin_long(epoch_us(F.col(ts_col)), x0_us, span_us, nx)
        * F.lit(col_us)
    )
    keys = keys or []  # per-series rasters (the /image multi-line panel)
    # y canvas semantics match batch bin_2d (r13: inclusive upper edge,
    # snapped into the top row). x stays UNCLIPPED here, unlike bin_2d's
    # canvas clip: a live stream's watermark must ride every event (an
    # out-of-view event still advances time and finalizes columns), and a
    # dashboard's x-range moves - the consumer crops columns to its
    # current canvas (api/png.py drops out-of-grid rows). Consequence:
    # only IN-CANVAS columns are bit-compatible with bin_2d; an event
    # exactly on the canvas right edge opens column nx here where batch
    # snaps it into nx-1. A consumer whose canvas right edge equals
    # x0+span must fold column nx into nx-1 itself -
    # api/png.snap_streamed_edge_rows does the cnt-merge (ADVICE r13;
    # lifecycle_image_stream applies it).
    # watermark BEFORE the y-range filter (r18 review): the same "must
    # ride every event" rationale that keeps x unclipped applies to y -
    # filtered-out out-of-band excursions must still advance event time,
    # or a sensor excursing above the canvas for an hour freezes the
    # watermark, stalls every completed in-range column (append mode
    # emits nothing) and retains state unbounded for the duration.
    # The predicate must REFERENCE the event-time column (r19, ADVICE
    # r18): Catalyst's PushPredicateThroughNonJoin pushes any
    # deterministic predicate whose references exclude the watermark
    # attribute straight back below EventTimeWatermark, so a plain
    # value-range filter placed "after" withWatermark still filtered
    # BEFORE the watermark in the optimized plan and the stall
    # persisted. Wrapping it in CASE WHEN isnotnull(_col_ts) makes
    # _col_ts a reference of the predicate, which pins it above the
    # watermark operator (verified on the OPTIMIZED plan of a started
    # query; tests/test_round18.py asserts exactly that). Rows with a
    # NULL event time are dropped either way - F.window(NULL) already
    # produced a NULL key the consumers crop.
    return (
        stream.withColumn("_col_ts", col_start)
        .withWatermark("_col_ts", late_threshold)
        .where(
            F.when(
                F.col("_col_ts").isNotNull(), (v >= ymin) & (v <= ymax)
            ).otherwise(F.lit(False))
        )
        .groupBy(
            *keys,
            F.window(F.col("_col_ts"), dur, dur, off).alias("win"),
            F.least(ybin(v, ymin, ymax, ny), F.lit(ny - 1)).alias("yb"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg(value_col), 6).alias("vmean"),
            F.round(F.min(value_col), 6).alias("vmin"),
            F.round(F.max(value_col), 6).alias("vmax"),
        )
        .select(
            *keys,
            F.floor(
                (epoch_us(F.col("win.start")) - F.lit(x0_us))
                / F.lit(float(col_us))
            ).cast("int").alias("xb"),
            "yb",
            "cnt",
            "vmean",
            "vmin",
            "vmax",
        )
    )
