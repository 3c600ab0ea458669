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


#: online CUSUM literals: reference level (micro-quantized 50.0) and the
#: alarm threshold on the drift statistic (500 value-units cumulated)
CUSUM_REF_MICRO = 50_000_000
CUSUM_ALARM = 500_000_000

CUSUM_OUTPUT_SCHEMA = (
    "user_id long, n long, p_final long, max_drift long, n_alarms long"
)
#: (running sum P of centered excess, running prefix-min of P incl. the
#: empty prefix 0, max drift seen, alarm-row count, rows seen)
CUSUM_STATE_SCHEMA = "p long, minp long, maxs long, nal long, n long"


def _update_cusum(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Page's one-sided online CUSUM, integer-exact, via the closed form
    S_k = P_k - min(0, min_{j<=k} P_j) with P = cumsum(q - ref): the
    recurrence S_k = max(0, S_{k-1} + x_k) needs no per-row python loop
    - prefix sums + accumulated minima vectorize over each Arrow batch,
    and (P, minP) is all the cross-batch state the recurrence needs.
    Rows are sorted by (us, event_id) within the batch; cross-batch
    correctness requires batches to arrive in event-time order (the
    availableNow single-file drain used by the declared query - the
    same contract as the batch-convergence checks of the rest of the
    streaming battery)."""
    import numpy as np

    p, minp, maxs, nal, n = state.get if state.exists else (0, 0, 0, 0, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["us", "event_id"])
        x = pdf["q"].to_numpy(dtype="int64") - CUSUM_REF_MICRO
        P = p + np.cumsum(x)
        run_min = np.minimum(minp, np.minimum.accumulate(P))
        S = P - run_min
        p = int(P[-1])
        minp = int(run_min[-1])
        maxs = max(maxs, int(S.max()))
        nal += int((S > CUSUM_ALARM).sum())
        n += len(pdf)
    state.update((p, minp, maxs, nal, n))
    yield pd.DataFrame(
        {
            "user_id": pd.array([key[0]], dtype="int64"),
            "n": pd.array([n], dtype="int64"),
            "p_final": pd.array([p], dtype="int64"),
            "max_drift": pd.array([maxs], dtype="int64"),
            "n_alarms": pd.array([nal], dtype="int64"),
        }
    )


def streaming_cusum(stream: DataFrame) -> DataFrame:
    """Continuously-maintained per-series drift monitor (the streaming
    twin of the batch events_changepoint CUSUM): input stream columns
    (user_id, us long, event_id long, q long = micro-quantized value).
    O(1) state per key; drained over the full feed the final state must
    equal the batch closed form exactly (integer arithmetic end to end).
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_cusum,
        CUSUM_OUTPUT_SCHEMA,
        CUSUM_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
