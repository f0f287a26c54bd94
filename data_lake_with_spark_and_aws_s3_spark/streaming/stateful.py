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


# ---------------------------------------------------------------------------
# Stateful interval-union twin (batch form: operators/timeseries.py
# q_interval_union). State per user = the MERGED busy intervals so far,
# held as parallel arrays (starts/ends in epoch-µs, per-island event
# counts). Each micro-batch merges its new intervals into that state
# with the same sweep the batch operator runs, so out-of-order arrival
# across batches is handled by construction — merging is associative
# and commutative over interval sets. Emission per batch is one
# summary row per touched user; n_events grows monotonically, so the
# final state is the emission with the max n_events (test contract,
# same selection rule as the profile twin above).
# ---------------------------------------------------------------------------

IU_OUTPUT_SCHEMA = (
    "user_id long, n_events long, n_islands long, total_busy_us long"
)
IU_STATE_SCHEMA = "starts array<long>, ends array<long>, counts array<long>"
_IU_MIN_US = 60_000_000  # one minute in µs


def _merge_intervals(items: list[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
    """Sweep-merge (start_us, end_us, count) triples; touching
    intervals (start == prev end) merge, same as the batch operator's
    strict `start > prev_max_end` island rule."""
    items.sort()
    out: list[tuple[int, int, int]] = []
    for s, e, c in items:
        if out and s <= out[-1][1]:
            ps, pe, pc = out[-1]
            out[-1] = (ps, max(pe, e), pc + c)
        else:
            out.append((s, e, c))
    return out


def _update_busy_intervals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        starts, ends, counts = state.get
        merged = list(zip(starts, ends, counts))
    else:
        merged = []
    for pdf in pdfs:
        ts_us = pd.to_datetime(pdf["ts"]).astype("int64") // 1_000
        dur_us = (pdf["event_id"] % 45 + 5) * _IU_MIN_US
        merged.extend(
            (int(s), int(s + d), 1) for s, d in zip(ts_us, dur_us)
        )
    merged = _merge_intervals(merged)
    state.update(
        ([s for s, _, _ in merged], [e for _, e, _ in merged],
         [c for _, _, c in merged])
    )
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [sum(c for _, _, c in merged)],
            "n_islands": [len(merged)],
            "total_busy_us": [sum(e - s for s, e, _ in merged)],
        }
    )


def streaming_interval_union(events: DataFrame) -> DataFrame:
    """Incremental interval-overlap union (update mode): per user, the
    merged busy periods evolve as events stream in. State size is
    O(islands per user), not O(events) — merging compacts on every
    batch, the property that keeps the state store bounded on an
    unbounded stream."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_busy_intervals,
        outputStructType=IU_OUTPUT_SCHEMA,
        stateStructType=IU_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
