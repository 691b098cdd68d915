"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the engine's escape hatch for operators the built-in
stateful set (window agg / session_window / dropDuplicates) cannot
express: arbitrary per-key state machines. The example operator is a
per-user running profile — cumulative event count, exact cumulative
value cents, and last-seen timestamp — emitted once per micro-batch
per updated user.

Scale properties: state lives in the state store sharded by the
group-by key (user_id), so memory is O(active users / executors);
the pandas kernel sees one key's rows per call, Arrow-batched. A
GroupStateTimeout would evict idle users in a live deployment; the
availableNow test path never times out.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("value_cents", T.LongType()),
    T.StructField("last_ts_micros", T.LongType()),
])

OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
    T.StructField("last_ts_micros", T.LongType()),
])


def _update_profile(key: tuple, pdfs: Iterable[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # Match the engine-wide exact-money policy: per-row rounding to
        # integer cents, then integer accumulation. Half-away-from-zero
        # explicitly — pandas .round() is banker's (half-to-even), which
        # would diverge from Spark's F.round and the DuckDB oracle on an
        # exact .5 tie in value*100.
        v100 = pdf["value"].mul(100)
        away = np.sign(v100) * np.floor(np.abs(v100) + 0.5)
        cents += int(away.astype("int64").sum())
        ts_us = (pdf["ts"].astype("int64") // 1000).max()
        last_us = max(last_us, int(ts_us))
    state.update((n, cents, last_us))
    yield pd.DataFrame({
        "user_id": [user_id],
        "n_events": [n],
        "total_value": [cents / 100.0],
        "last_ts_micros": [last_us],
    })


def user_profiles(events: DataFrame) -> DataFrame:
    """Per-user running profile as an update-mode stateful stream."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
