"""Type-dispatched aggregation over the unified datapoints model.

The reference declares the full Tango type matrix - string / boolean /
state / spectrum tables are enumerated in its access layer (reference
hdbpp.py:55-82) - but implements none of them downstream; its README lists
them as missing (reference README.md:27) and the viewer only ever plots
scalars. This engine makes the declared types first-class: the ONE logical
``datapoints`` frame (schemas.DATAPOINTS_SCHEMA) carries
``value_r``/``value_str``/``value_arr`` sidecars, and ``typed_summary``
dispatches the aggregation per element type:

  - numeric scalars (schemas.NUMERIC_ELEMENT_TYPES): min / max / mean -
    the only kinds for which numeric folds are DEFINED;
  - discrete scalars (string / state / boolean / encoded): last value by
    event time + distinct cardinality - the Tango semantics of "current
    state" (latest reading wins);
  - spectrum (array_*) types: reading length stats + element range.

Everything is ONE grouped aggregation with conditional (kind-guarded)
aggregate expressions - no per-type job fan-out, no Python: a single
shuffle on the attribute key with map-side partial aggregation, exactly as
scale-safe as a plain groupBy at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import NUMERIC_ELEMENT_TYPES

#: data_type grammar: (scalar|array)_dev<element>_{ro,rw} (reference
#: hdbpp.py:55-82 table names, e.g. att_scalar_devdouble_ro)
_TYPE_RE = r"^(?:scalar|array)_dev([a-z0-9]+)_(?:ro|rw)$"


def element_type(data_type: Column) -> Column:
    """Tango element type ('double', 'string', ...) from a data_type name."""
    return F.regexp_extract(data_type, _TYPE_RE, 1)


def type_kind(data_type: Column) -> Column:
    """Dispatch class: 'spectrum' (array_*), 'numeric', or 'discrete'."""
    el = element_type(data_type)
    return (
        F.when(data_type.startswith("array_"), F.lit("spectrum"))
        .when(el.isin(*sorted(NUMERIC_ELEMENT_TYPES)), F.lit("numeric"))
        .otherwise(F.lit("discrete"))
    )


def typed_summary(dp: DataFrame) -> DataFrame:
    """Per-attribute summary with kind-dispatched aggregates.

    Output: (att_conf_id, data_type, kind, n, n_err, vmin, vmax, vmean,
    last_str, n_distinct, mean_len, el_min, el_max) - the aggregates that
    don't apply to a kind are NULL (or 0 for counts), never garbage: a
    string attribute can NEVER produce a numeric mean here even if a
    malformed row carries value_r.
    """
    kind = type_kind(F.col("data_type"))
    ok = F.col("error_desc").isNull()
    is_num = (kind == "numeric") & ok
    is_disc = (kind == "discrete") & ok & F.col("value_str").isNotNull()
    is_spec = (kind == "spectrum") & ok & F.col("value_arr").isNotNull()
    return (
        dp.groupBy("att_conf_id", "data_type", kind.alias("kind"))
        .agg(
            F.count(F.when(ok, F.lit(1))).alias("n"),
            F.count(F.when(~ok, F.lit(1))).alias("n_err"),
            F.min(F.when(is_num, F.col("value_r"))).alias("vmin"),
            F.max(F.when(is_num, F.col("value_r"))).alias("vmax"),
            F.round(F.avg(F.when(is_num, F.col("value_r"))), 6).alias("vmean"),
            # latest reading wins (Tango current-state semantics); ordering
            # key is null for non-discrete rows so they never participate
            F.max_by(F.col("value_str"), F.when(is_disc, F.col("ts"))).alias("last_str"),
            F.count_distinct(F.when(is_disc, F.col("value_str"))).alias("n_distinct"),
            F.round(F.avg(F.when(is_spec, F.size("value_arr"))), 6).alias("mean_len"),
            F.min(F.when(is_spec, F.array_min("value_arr"))).alias("el_min"),
            F.max(F.when(is_spec, F.array_max("value_arr"))).alias("el_max"),
        )
        .orderBy("att_conf_id")
    )


def spectrum_resample(
    dp: DataFrame, width_us: int, bucket_col: str = "bucket"
) -> DataFrame:
    """Per-ELEMENT tumbling-window mean for spectrum (array) attributes -
    the analytical operation the reference's missing array support would
    need first (trend each channel of a 1024-point spectrum over time).

    posexplode turns each reading into |arr| (element-index, value) rows -
    the idiomatic columnar explode: Catalyst applies map-side partial
    aggregation to the (att, bucket, idx) key before the single shuffle, so
    the exchanged rows are one per (attribute, window, channel), not one
    per raw element. Readings of differing lengths contribute to exactly
    the channels they carry (n counts per channel). Round-to-nearest
    buckets match operators/resample.resample_mean.
    """
    from ..functions.time import epoch_us, nearest_bucket

    spec = dp.where(
        (type_kind(F.col("data_type")) == "spectrum")
        & F.col("error_desc").isNull()
        & F.col("value_arr").isNotNull()
    )
    el = spec.select(
        "att_conf_id",
        nearest_bucket(epoch_us(F.col("ts")), width_us).alias(bucket_col),
        F.posexplode("value_arr").alias("idx", "v"),
    ).where(F.col("v").isNotNull())  # null elements carry no reading
    return el.groupBy("att_conf_id", bucket_col, "idx").agg(
        F.round(F.avg("v"), 6).alias("mean_v"),
        F.count(F.lit(1)).alias("n"),
    )
