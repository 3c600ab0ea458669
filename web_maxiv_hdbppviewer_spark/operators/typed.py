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


def typed_summary(dp: DataFrame, write_values: bool = False) -> DataFrame:
    """Per-attribute summary with kind-dispatched aggregates.

    Output: (att_conf_id, data_type, kind, n, n_err, vmin, vmax, vmean,
    last_str, n_distinct, mean_len, el_min, el_max) - the aggregates that
    don't apply to a kind are NULL (or 0 for counts), never garbage: a
    string attribute can NEVER produce a numeric mean here even if a
    malformed row carries value_r.

    ``write_values=True`` appends the rw-attribute surface over the
    ``value_w`` sidecar (the reference's server.py:21 documented gap):
    n_w, wmin, wmax, wmean, and trk_err_r = ROUND(AVG(value_r -
    value_w), 6) - the setpoint tracking error, THE health number an
    operator reads off a rw attribute. All five are primitive-buffer
    aggregates guarded to numeric *_rw rows, so they ride the same ONE
    map-side-combining HashAggregate; non-rw attributes report NULLs
    (n_w = 0), never garbage.

    Shape (round-11 rewrite, measured ~25% faster at sf0.1 and the right
    100 TB trade): the original single aggregation carried
    ``max_by(value_str, ts)`` and ``count_distinct(value_str)`` - a
    string-valued aggregation buffer plus a two-phase distinct, which
    forces the WHOLE corpus through THREE chained SortAggregates (4
    sorts, 2 full-width exchanges). Split instead into:

      1. the numeric/spectrum/count aggregates - mutable primitive
         buffers only, so one map-side-combining HashAggregate over the
         full input (1 exchange, no sorts);
      2. the string aggregates (latest reading, distinct cardinality)
         over ONLY the discrete-kind non-null rows - the sort-based
         distinct machinery still runs, but on the discrete subset of a
         column-pruned (att, data_type, ts, value_str) projection;
      3. a per-attribute-grain join of the two (K rows, broadcast).

    The input is read twice, but read 2 is narrow (column pruning) and
    filtered, while read 1 escapes sort aggregation entirely.
    """
    kind = type_kind(F.col("data_type"))
    ok = F.col("error_desc").isNull()
    rw = (kind == "numeric") & F.col("data_type").endswith("_rw")
    pre_cols = [
        F.col("att_conf_id"),
        F.col("data_type"),
        kind.alias("kind"),
        F.col("ts"),
        ok.alias("ok"),
        F.when((kind == "numeric") & ok, F.col("value_r")).alias("num_v"),
        F.when(
            (kind == "discrete") & ok & F.col("value_str").isNotNull(),
            F.col("value_str"),
        ).alias("disc_v"),
        F.when(
            (kind == "spectrum") & ok & F.col("value_arr").isNotNull(),
            F.col("value_arr"),
        ).alias("spec_v"),
    ]
    if write_values:
        pre_cols.append(F.when(rw & ok, F.col("value_w")).alias("w_v"))
    pre = dp.select(*pre_cols)
    aggs = [
        F.count(F.when(F.col("ok"), F.lit(1))).alias("n"),
        F.count(F.when(~F.col("ok"), F.lit(1))).alias("n_err"),
        F.min("num_v").alias("vmin"),
        F.max("num_v").alias("vmax"),
        F.round(F.avg("num_v"), 6).alias("vmean"),
        F.round(F.avg(F.size("spec_v")), 6).alias("mean_len"),
        F.min(F.array_min("spec_v")).alias("el_min"),
        F.max(F.array_max("spec_v")).alias("el_max"),
    ]
    if write_values:
        aggs += [
            F.count("w_v").cast("long").alias("n_w"),
            F.min("w_v").alias("wmin"),
            F.max("w_v").alias("wmax"),
            F.round(F.avg("w_v"), 6).alias("wmean"),
            F.round(
                F.avg(
                    F.when(
                        F.col("num_v").isNotNull(),
                        F.col("num_v") - F.col("w_v"),
                    )
                ),
                6,
            ).alias("trk_err_r"),
        ]
    main = pre.groupBy("att_conf_id", "data_type", "kind").agg(*aggs)
    disc = (
        pre.where(F.col("disc_v").isNotNull())
        .groupBy("att_conf_id", "data_type", "kind")
        .agg(
            # latest reading wins (Tango current-state semantics)
            F.max_by(F.col("disc_v"), F.col("ts")).alias("last_str"),
            F.count_distinct("disc_v").alias("n_distinct"),
        )
    )
    return (
        main.join(disc, ["att_conf_id", "data_type", "kind"], "left")
        .select(
            "att_conf_id",
            "data_type",
            "kind",
            "n",
            "n_err",
            "vmin",
            "vmax",
            "vmean",
            "last_str",
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            "mean_len",
            "el_min",
            "el_max",
            *(
                ["n_w", "wmin", "wmax", "wmean", "trk_err_r"]
                if write_values
                else []
            ),
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
