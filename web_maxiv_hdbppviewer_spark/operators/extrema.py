"""Extrema operators for axis-range computation (SURVEY A2/A3/F3, J4).

The reference computes per-series min/max over the view window (reference
plot.py:92-99), dropping non-positive values first when the axis is log
scaled (plot.py:94-97), then folds min-of-mins / max-of-maxes across all
series on one axis (plot.py:112-130), finally merging manual axis overrides
(plot.py:101-104). All of it is one aggregation pass here; series with no
surviving points surface as null extrema (the reference's ``nodata`` set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def series_extrema(
    df: DataFrame,
    keys: list[str],
    value_col: str = "value",
    log_scale: bool = False,
) -> DataFrame:
    """Per-series (vmin, vmax, n) with optional log-axis positivity filter."""
    v = F.col(value_col)
    if log_scale:
        df = df.where(v > 0)  # reference plot.py:94-97
    return df.groupBy(*keys).agg(
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.count(v).alias("n"),
    )


def axis_extrema(
    df: DataFrame,
    value_col: str = "value",
    log_scale: bool = False,
    manual_min: float | None = None,
    manual_max: float | None = None,
) -> DataFrame:
    """Cross-series axis extrema (min of mins / max of maxes, plot.py:112-130)
    with the reference's manual-override merge (plot.py:101-104)."""
    v = F.col(value_col)
    if log_scale:
        df = df.where(v > 0)
    agg = df.agg(F.min(v).alias("axis_min"), F.max(v).alias("axis_max"))
    if manual_min is not None:
        agg = agg.withColumn("axis_min", F.lit(float(manual_min)))
    if manual_max is not None:
        agg = agg.withColumn("axis_max", F.lit(float(manual_max)))
    return agg


def pad_range(vmin: float, vmax: float, log_scale: bool = False) -> tuple[float, float]:
    """Driver-side axis-range padding, replicating the reference's observable
    behavior for degenerate ranges (reference plot.py:160-188):
    constant series get an invented +/-0.5 (or decade on log) band; normal
    ranges get 5% padding.
    """
    if vmin is None or vmax is None:
        return (0.0, 1.0)
    if vmin == vmax:
        if log_scale:
            return (vmin / 10.0 if vmin > 0 else 0.1, vmax * 10.0 if vmax > 0 else 1.0)
        return (vmin - 0.5, vmax + 0.5)
    pad = (vmax - vmin) * 0.05
    return (vmin - pad, vmax + pad)
