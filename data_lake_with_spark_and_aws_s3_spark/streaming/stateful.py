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

State-store provider at scale: the default HDFSBackedStateStore keeps
every key's state on the executor HEAP (plus snapshot files) — fine
for these tests, a memory wall once per-partition state outgrows the
executor. Production configuration for large keyspaces:

    spark.sql.streaming.stateStore.providerClass =
        org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
    # optional: changelog checkpointing trades snapshot upload cost
    # for faster commits on large state
    spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled = true

RocksDB spills state to local disk with block-cache reads, bounding
heap usage regardless of key cardinality; transformWithStateInPandas
(below) additionally REQUIRES the RocksDB provider in Spark 4.x.
The operator code in this package is provider-agnostic — the provider
is a session conf, not an API change.
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


def streaming_user_profiles_tws(events: DataFrame) -> DataFrame:
    """Same operator on the Spark 4.x successor API,
    transformWithStateInPandas: a StatefulProcessor with named,
    composable state variables (ValueState here; List/MapState and
    event/processing-time timers are the API's additions over
    applyInPandasWithState's single state tuple). Requires the RocksDB
    state store provider (set by the caller/test) and the `protobuf`
    package (Spark's Python<->JVM state-server protocol; absent in this
    container, so the equivalence test import-skips — the operator
    itself is complete). State economics are unchanged — one store per
    shuffle partition, O(|users|) state."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._profile = handle.getValueState("profile", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            prior = self._profile.get() if self._profile.exists() else None
            n, total, last = prior if prior is not None else (0, 0.0, None)
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"])
                n += len(pdf)
                total += float(pdf["value"].sum())
                if len(pdf):
                    last = pdf["event_type"].iloc[-1]
            self._profile.update((n, total, last))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "last_type": [last],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        UserProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
