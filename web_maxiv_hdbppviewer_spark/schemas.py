"""Fixed StructType declarations for the HDB++ logical model.

The reference hard-codes its schema in prepared CQL (reference
hdbpp.py:147-211) and enumerates 26 typed data tables
att_<type> x {ro, rw} (hdbpp.py:55-82). Our engine replaces the
26-table physical split with ONE logical ``datapoints`` dataset carrying
``data_type`` as a partition column (schema-on-read union, SURVEY §1.5):
numeric values in ``value_r`` (double), non-numeric readings in the
``value_str`` sidecar, spectrum (array) types in ``value_arr`` - the
reference declares string/boolean/state/spectrum but never implements them
downstream (reference README.md:27); we support them for real.

Timestamps: one native microsecond TIMESTAMP column ``ts`` replaces the
reference's (data_time, data_time_us) split (hdbpp.py:23-28); the split
columns exist only at the ingest boundary.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: 13 Tango scalar element types x {ro, rw} (reference hdbpp.py:55-82)
TANGO_ELEMENT_TYPES = [
    "boolean",
    "double",
    "encoded",
    "float",
    "long64",
    "long",
    "short",
    "state",
    "string",
    "uchar",
    "ulong64",
    "ulong",
    "ushort",
]
HDBPP_DATA_TYPES = [
    f"scalar_dev{t}_{rw}" for t in TANGO_ELEMENT_TYPES for rw in ("ro", "rw")
]

#: numeric element types - min/max/mean aggregation is only defined for these
NUMERIC_ELEMENT_TYPES = {
    "double",
    "float",
    "long64",
    "long",
    "short",
    "uchar",
    "ulong64",
    "ulong",
    "ushort",
}

ATT_CONF_SCHEMA = StructType(
    [
        StructField("cs_name", StringType(), False),
        StructField("att_name", StringType(), False),
        StructField("att_conf_id", LongType(), False),
        StructField("data_type", StringType(), False),
    ]
)

ATT_NAMES_SCHEMA = StructType(
    [
        StructField("cs_name", StringType(), False),
        StructField("domain", StringType(), False),
        StructField("family", StringType(), False),
        StructField("member", StringType(), False),
        StructField("name", StringType(), False),
    ]
)

ATT_PARAMETER_SCHEMA = StructType(
    [
        StructField("att_conf_id", LongType(), False),
        StructField("recv_time", TimestampType(), False),
        StructField("label", StringType(), True),
        StructField("unit", StringType(), True),
        StructField("display_unit", StringType(), True),
        StructField("format", StringType(), True),
        StructField("description", StringType(), True),
    ]
)

ATT_HISTORY_SCHEMA = StructType(
    [
        StructField("att_conf_id", LongType(), False),
        StructField("time", TimestampType(), False),
        StructField("event", StringType(), False),
    ]
)

#: the unified logical datapoint stream (reference att_<type> tables,
#: hdbpp.py:196-208, with value-or-error rows: error_desc marks errors)
DATAPOINTS_SCHEMA = StructType(
    [
        StructField("att_conf_id", LongType(), False),
        StructField("data_type", StringType(), False),
        StructField("period", StringType(), False),  # local-date partition key
        StructField("ts", TimestampType(), False),  # microsecond event time
        StructField("value_r", DoubleType(), True),  # numeric reading
        # numeric write/setpoint sidecar, non-null only for *_rw attributes
        # (closes the reference's own documented gap: server.py:21 lists
        # "showing write values" as missing)
        StructField("value_w", DoubleType(), True),
        StructField("value_str", StringType(), True),  # string/state/bool sidecar
        StructField("value_arr", ArrayType(DoubleType()), True),  # spectrum types
        StructField("quality", IntegerType(), True),
        StructField("error_desc", StringType(), True),  # non-null = error sample
    ]
)
