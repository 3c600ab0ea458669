"""Custom stateful streaming operator: per-key running current state
(SURVEY §2.9; the streaming form of the S5 latest-parameter semantics).

The reference approximates live state by client-side polling
(js/actions.js:125-190 re-fetches on a timer); Structured Streaming makes
it a real continuously-maintained state: ``applyInPandasWithState`` keeps
one tiny state tuple per attribute - (event time, value, running count) of
the latest reading - updated per Arrow-batched micro-batch group. State is
O(1) per key regardless of stream volume, checkpointed by the engine, so
a 100 TB/day firehose costs exactly |keys| state rows.

Late/out-of-order rows are handled by the max-timestamp merge (a batch
whose newest row is older than the current state leaves the state
unchanged) - the same last-write-wins-by-EVENT-time rule as the batch
``latest_per_key``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: (key, last event time, last value, rows seen) - driver-visible contract
OUTPUT_SCHEMA = "att_conf_id long, last_ts timestamp, last_value double, n long"
#: engine-managed per-key state: epoch-us keeps the state schema int-exact
STATE_SCHEMA = "last_ts_us long, last_value double, n long"

_EPOCH = pd.Timestamp(1970, 1, 1)


def _update_last_value(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    last_us, last_v, n = state.get if state.exists else (None, None, 0)
    for pdf in pdfs:
        pdf = pdf[pdf["value_r"].notna()]
        if len(pdf) == 0:
            continue
        n += len(pdf)
        newest = pdf.loc[pdf["ts"].idxmax()]
        newest_us = int((pd.Timestamp(newest["ts"]) - _EPOCH).value // 1000)
        if last_us is None or newest_us >= last_us:
            last_us, last_v = newest_us, float(newest["value_r"])
    state.update((last_us, last_v, n))
    # explicit dtypes: an all-NA object column would trip pandas' concat
    # dtype-inference deprecation inside Spark's Arrow serializer
    yield pd.DataFrame(
        {
            "att_conf_id": pd.array([key[0]], dtype="int64"),
            "last_ts": pd.array(
                [pd.NaT if last_us is None else _EPOCH + pd.Timedelta(microseconds=last_us)],
                dtype="datetime64[us]",
            ),
            "last_value": pd.array([last_v], dtype="float64"),
            "n": pd.array([n], dtype="int64"),
        }
    )


def streaming_last_value(stream: DataFrame, key_col: str = "att_conf_id") -> DataFrame:
    """Continuously-maintained latest reading per attribute.

    Input stream columns: (key_col, ts timestamp, value_r double).
    Output (update mode): one row per key per micro-batch with the running
    (last_ts, last_value, n).
    """
    renamed = stream.withColumnRenamed(key_col, "att_conf_id")
    return renamed.groupBy("att_conf_id").applyInPandasWithState(
        _update_last_value,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
