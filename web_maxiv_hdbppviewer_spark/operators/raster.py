"""Rasterization operators: the /image pipeline's aggregate kernel.

The reference rasterizes each timeseries into a per-pixel image with
datashader: ``Canvas.points`` with a summary of (count, mean, min, max) of
value per (x, y) pixel (reference plot.py:22-33), then collapses the 2-D
aggregate along y for per-pixel-column hover stats (reference plot.py:44-60).

Spark-first restatement: both are plain binned hash aggregates -
``groupBy(xbin, ybin).agg(...)`` - which Catalyst executes with partial
aggregation, so an arbitrary number of input rows reduces to at most
(w x h) output rows BEFORE anything reaches the driver. That is exactly the
reference's "response size bounded by screen resolution, not data volume"
property (reference server.py:144-146), achieved with a shuffle of at most
w*h rows per series. At 100 TB this is the only stage whose output the
driver ever collects.

The float expression shapes below are chosen to be bit-identical across
engines (same IEEE ops in the same order) so results hash-match any oracle
that mirrors the shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.time import epoch_us


def xbin(t_us: Column, x0_us: int, span_us: float, nx: int) -> Column:
    """Pixel column index: floor((t - x0) / span * nx)."""
    return F.floor((t_us - F.lit(x0_us)) / F.lit(float(span_us)) * F.lit(nx)).cast("int")


def ybin(v: Column, ymin: float, ymax: float, ny: int) -> Column:
    """Pixel row index: floor((v - ymin) / (ymax - ymin) * ny)."""
    return F.floor((v - F.lit(float(ymin))) / F.lit(float(ymax) - float(ymin)) * F.lit(ny)).cast("int")


def bin_2d(
    df: DataFrame,
    x0_us: int,
    span_us: float,
    nx: int,
    ymin: float,
    ymax: float,
    ny: int,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
) -> DataFrame:
    """2-D binned aggregate over the (time x value) plane (SURVEY A6).

    Output: (keys..., xb, yb, cnt, vmean, vmin, vmax) - the datashader
    ``summary(count, mean, min, max)`` decomposed into built-in aggregates
    (reference plot.py:29-33). Rows outside [ymin, ymax) are dropped, like
    datashader's canvas clipping.
    """
    v = F.col(value_col)
    binned = (
        df.where((v >= ymin) & (v < ymax))
        .select(
            *(keys or []),
            xbin(epoch_us(F.col(ts_col)), x0_us, span_us, nx).alias("xb"),
            ybin(v, ymin, ymax, ny).alias("yb"),
            v.alias("_v"),
        )
    )
    return binned.groupBy(*(keys or []), "xb", "yb").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg("_v"), 6).alias("vmean"),
        F.round(F.min("_v"), 6).alias("vmin"),
        F.round(F.max("_v"), 6).alias("vmax"),
    )


def hover_stats(
    df: DataFrame,
    x0_us: int,
    span_us: float,
    nx: int,
    ymin: float,
    ymax: float,
    ts_col: str = "ts",
    value_col: str = "value",
    keys: list[str] | None = None,
) -> DataFrame:
    """Per-pixel-column stats for hover descriptions (SURVEY A8).

    The reference computes these by collapsing the 2-D raster along y
    (reference plot.py:44-60: nanmin of mins, nanmax of maxes, sum of
    counts per x column, keeping only columns with data). Expressed
    directly as a 1-D binned aggregate - Catalyst's partial/final agg is
    the reference's collapse.
    """
    v = F.col(value_col)
    binned = df.where((v >= ymin) & (v < ymax)).select(
        *(keys or []),
        xbin(epoch_us(F.col(ts_col)), x0_us, span_us, nx).alias("xb"),
        v.alias("_v"),
    )
    return (
        binned.groupBy(*(keys or []), "xb")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("_v"), 6).alias("vmin"),
            F.round(F.max("_v"), 6).alias("vmax"),
        )
        .where(F.col("cnt") > 0)
    )
