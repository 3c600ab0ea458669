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
        "value_str string",
        "value_arr_csv string",
        "quality int",
        "error_desc string",
    ]
)


def write_datapoints_csv(df: DataFrame, path: str) -> None:
    """Datapoints -> headered CSV, partitioned by period (one directory per
    day, mirroring the day-partition storage layout)."""
    out = df.select(
        "att_conf_id",
        "data_type",
        "period",
        "ts",
        "value_r",
        "value_str",
        F.array_join(
            F.transform(F.col("value_arr"), lambda x: F.format_string("%.17g", x)),
            ";",
        ).alias("value_arr_csv"),
        "quality",
        "error_desc",
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
    return raw.select(
        "att_conf_id",
        "data_type",
        "period",
        "ts",
        "value_r",
        "value_str",
        F.when(
            F.col("value_arr_csv").isNotNull() & (F.col("value_arr_csv") != ""),
            F.transform(
                F.split(F.col("value_arr_csv"), ";"), lambda s: s.cast("double")
            ),
        ).alias("value_arr"),
        "quality",
        "error_desc",
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
