"""Custom stateful streaming operator (SURVEY.md §2.9):
applyInPandasWithState — arbitrary per-key state evolved across
micro-batches, the escape hatch when watermarked windows can't express
the semantics (counters with custom reset logic, per-entity ML state,
complex session payloads).

Demonstrated: a per-user running profile (event count, value sum,
last event type) maintained in explicit state. With an availableNow
drive over a bounded source the final emission per user must equal
the batch aggregate — tests/test_streaming_stateful.py asserts that.

Scale: state lives in the state store, one store per shuffle
partition; keys hash-partition, state size is O(|users|) not
O(|events|). Pandas batches flow through Arrow per (partition, key
group) — the same slow-path economics as applyInPandas.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_type string"
STATE_SCHEMA = "n long, total double, last string"


def _update_user_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last = state.get
    else:
        n, total, last = 0, 0.0, None
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last = pdf["event_type"].iloc[-1]
    state.update((n, total, last))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)],
         "last_type": [last]}
    )


def streaming_user_profiles(events: DataFrame) -> DataFrame:
    """Stateful per-user profile stream (update mode): emits the
    current profile for every user seen in each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
