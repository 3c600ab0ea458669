"""Line rasterization kernel (SURVEY A7, reference plot.py:27,34-42).

The reference draws each series with datashader's ``Canvas.line`` -
connect-the-dots onto the pixel grid - then shades per-series colors and
stacks. That is not a relational aggregate (a segment between two points
touches pixels no single row maps to), so it is the one place the engine
runs a Pandas kernel: ``applyInPandas`` per series group, a vectorized
numpy Bresenham-style segment walk, emitting (series, xb, yb, cnt) pixel
rows. Everything after (shade, stack, encode) happens driver-side on
<= w*h rows per series.

Scale: one group = one series' points in the view window (the reference
assumes <100k points/day/attr, hdbpp.py:283-284). For longer windows,
pre-group into (series, x-tile) with one boundary point duplicated per tile
edge so segments crossing tiles still draw; tiles then shuffle-group
independently. The kernel is O(points + drawn pixels) per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..functions.time import epoch_us

LINE_PIXELS_SCHEMA = StructType(
    [
        StructField("series", LongType(), False),
        StructField("xb", LongType(), False),
        StructField("yb", LongType(), False),
        StructField("cnt", LongType(), False),
    ]
)


def _segments_to_pixels(xs: np.ndarray, ys: np.ndarray, w: int, h: int) -> np.ndarray:
    """Walk each consecutive segment, marking covered pixels (dense w x h
    count grid). Vectorized per segment via linear interpolation at
    max(|dx|,|dy|)+1 sample points - equivalent coverage to Bresenham."""
    grid = np.zeros((h, w), dtype=np.int64)
    if len(xs) == 1:
        x, y = int(xs[0]), int(ys[0])
        if 0 <= x < w and 0 <= y < h:
            grid[y, x] += 1
        return grid
    for i in range(len(xs) - 1):
        x0, y0, x1, y1 = xs[i], ys[i], xs[i + 1], ys[i + 1]
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        px = np.rint(np.linspace(x0, x1, n)).astype(np.int64)
        py = np.rint(np.linspace(y0, y1, n)).astype(np.int64)
        keep = (px >= 0) & (px < w) & (py >= 0) & (py < h)
        if keep.any():
            # dedup within the segment so a pixel counts once per pass
            flat = np.unique(py[keep] * w + px[keep])
            grid.flat[flat] += 1
    return grid


def rasterize_lines(
    df: DataFrame,
    x0_us: int,
    span_us: float,
    w: int,
    ymin: float,
    ymax: float,
    h: int,
    series_col: str = "att_conf_id",
    ts_col: str = "ts",
    value_col: str = "value_r",
) -> DataFrame:
    """Per-series connect-the-dots raster -> (series, xb, yb, cnt) rows.

    Points are mapped to CONTINUOUS pixel coordinates before the segment
    walk (the line can pass through pixels between points), y axis in data
    orientation (yb 0 = ymin row).
    """

    def draw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t_us")
        pdf = pdf[pdf["v"].notna()]
        if len(pdf) == 0:
            return pd.DataFrame(columns=["series", "xb", "yb", "cnt"])
        xs = (pdf["t_us"].to_numpy(np.float64) - x0_us) / span_us * w
        ys = (pdf["v"].to_numpy(np.float64) - ymin) / (ymax - ymin) * h
        grid = _segments_to_pixels(xs, ys, w, h)
        yy, xx = np.nonzero(grid)
        return pd.DataFrame(
            {
                "series": pdf["series"].iloc[0],
                "xb": xx.astype(np.int64),
                "yb": yy.astype(np.int64),
                "cnt": grid[yy, xx],
            }
        )

    prepared = df.select(
        F.col(series_col).alias("series"),
        epoch_us(F.col(ts_col)).alias("t_us"),
        F.col(value_col).cast("double").alias("v"),
    )
    return prepared.groupBy("series").applyInPandas(draw, LINE_PIXELS_SCHEMA)
