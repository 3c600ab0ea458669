"""Interchange source formats for the datapoints dataset: CSV, JSONL, ORC.

The reference's only ingest path is Cassandra (reference hdbpp.py:103-145)
and its only text output is the rendered CSV response (reference
data.py:79-98); operators of such a system routinely need to BULK-move
archive slices as flat files (export for spreadsheets, re-ingest from a
dump, exchange with an ORC/Hive warehouse). These helpers make every
format a first-class, schema-ENFORCED source:

  - schema-on-read with the fixed ``DATAPOINTS_SCHEMA`` - never inference
    (inference samples the file and silently drifts types per partition;
    a 100 TB re-ingest must fail loudly instead, so ``mode=FAILFAST``).
  - timestamps serialize as explicit ISO-8601 with microseconds - the
    engine's µs TIMESTAMP survives the text round-trip bit-for-bit.
  - ``value_arr`` (spectrum types) cannot live in flat CSV: it is encoded
    as a semicolon-joined string column on write and decoded on read -
    lossless for finite doubles via round-trippable %.17g formatting.
    JSONL and ORC carry the array natively.

CSV corner contract (the edges a naive encoding silently loses):
  - EMPTY array vs NULL array: empty encodes as the ``[]`` sentinel (never
    a valid %.17g list), NULL as the \\N null marker - both round-trip.
  - literal backslashes in free-form strings (value_str / error_desc) are
    doubled on write so a reading whose TEXT is exactly ``\\N`` cannot
    collide with the null marker; the read side undoes the doubling.
  - non-finite / NULL array elements are OUTSIDE the %.17g round-trip
    guarantee: the writer raises instead of corrupting silently (use JSONL
    or ORC for NaN/Inf spectra - both carry them natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import DATAPOINTS_SCHEMA

#: explicit timestamp wire format: second fraction keeps all 6 µs digits
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

_CSV_OPTS = {
    "header": "true",
    "timestampFormat": _TS_FMT,
    "nullValue": "\\N",  # distinguish NULL from empty string readings
}

#: CSV wire schema: value_arr flattened to a string column
_CSV_SCHEMA = ", ".join(
    [
        "att_conf_id long",
        "data_type string",
        "period string",
        "ts timestamp",
        "value_r double",
        "value_w double",
        "value_str string",
        "value_arr_csv string",
        "quality int",
        "error_desc string",
    ]
)


#: empty-array sentinel: cannot appear in a ;-joined %.17g list
_EMPTY_ARR = "[]"


def _escape_free_text(c):
    """Double every backslash so a literal ``\\N`` reading cannot collide
    with the CSV null marker (the marker on the wire stays single-\\)."""
    return F.replace(c, F.lit("\\"), F.lit("\\\\"))


def _unescape_free_text(c):
    return F.replace(c, F.lit("\\\\"), F.lit("\\"))


def _fmt_finite(x):
    """%.17g, asserting finiteness: NaN/Inf/NULL elements have no lossless
    flat-text form - fail the export loudly (data.py P7 NaN handling is a
    SINK rule; an interchange dump must preserve, not rewrite)."""
    return F.when(
        x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
        F.raise_error(
            F.format_string(
                "CSV value_arr element %s is outside the finite %%.17g "
                "round-trip guarantee; export spectra with NaN/Inf via "
                "JSONL or ORC",
                x,
            )
        ),
    ).otherwise(F.format_string("%.17g", x))


def write_datapoints_csv(df: DataFrame, path: str) -> None:
    """Datapoints -> headered CSV, partitioned by period (one directory per
    day, mirroring the day-partition storage layout)."""
    arr = F.col("value_arr")
    out = df.select(
        "att_conf_id",
        "data_type",
        "period",
        "ts",
        "value_r",
        "value_w",
        _escape_free_text(F.col("value_str")).alias("value_str"),
        F.when(F.size(arr) == 0, F.lit(_EMPTY_ARR))
        .otherwise(F.array_join(F.transform(arr, _fmt_finite), ";"))
        .alias("value_arr_csv"),
        "quality",
        _escape_free_text(F.col("error_desc")).alias("error_desc"),
    )
    (
        out.write.mode("overwrite")
        .options(**_CSV_OPTS)
        .partitionBy("period")
        .csv(path)
    )


def read_datapoints_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV -> datapoints with the ENFORCED wire schema (FAILFAST: a
    malformed row aborts the read instead of nulling out silently), the
    spectrum column decoded back to array<double>."""
    raw = (
        spark.read.schema(_CSV_SCHEMA)
        .options(**_CSV_OPTS, mode="FAILFAST")
        .csv(path)
    )
    wire = F.col("value_arr_csv")
    return raw.select(
        "att_conf_id",
        "data_type",
        "period",
        "ts",
        "value_r",
        "value_w",
        _unescape_free_text(F.col("value_str")).alias("value_str"),
        F.when(wire == _EMPTY_ARR, F.array().cast("array<double>"))
        .when(
            wire.isNotNull() & (wire != ""),
            F.transform(F.split(wire, ";"), lambda s: s.cast("double")),
        )
        .alias("value_arr"),
        "quality",
        _unescape_free_text(F.col("error_desc")).alias("error_desc"),
    )


def write_datapoints_jsonl(df: DataFrame, path: str) -> None:
    """Datapoints -> JSON Lines (arrays carried natively), partitioned by
    period."""
    (
        df.write.mode("overwrite")
        .option("timestampFormat", _TS_FMT)
        .partitionBy("period")
        .json(path)
    )


def _schema_order(df: DataFrame) -> DataFrame:
    # the period partition column comes back APPENDED after the data
    # columns; restore the declared schema order
    return df.select(*[f.name for f in DATAPOINTS_SCHEMA.fields])


def read_datapoints_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL -> datapoints under the fixed schema, FAILFAST like CSV."""
    return _schema_order(
        spark.read.schema(DATAPOINTS_SCHEMA)
        .options(timestampFormat=_TS_FMT, mode="FAILFAST")
        .json(path)
    )


def write_datapoints_orc(df: DataFrame, path: str) -> None:
    """Datapoints -> ORC (Hive-warehouse interchange), partitioned by
    period; ORC carries the full schema natively."""
    df.write.mode("overwrite").partitionBy("period").orc(path)


def read_datapoints_orc(spark: SparkSession, path: str) -> DataFrame:
    return _schema_order(spark.read.schema(DATAPOINTS_SCHEMA).orc(path))
