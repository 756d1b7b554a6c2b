"""Custom stateful streaming operators via applyInPandasWithState.

The reference's coordinator keeps job state as S3 objects and
re-derives progress from bucket listings on every event
(reducerCoordinator.py:34-41,63-105 — "the listing IS the state").
Structured Streaming's state store is the principled version: keyed
state, exactly-once updates, watermark-driven eviction. This module
provides the custom-stateful seam for operators the built-in
aggregations can't express.
"""

from __future__ import annotations

from collections.abc import Iterator

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

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n_events", LongType(), False),
        StructField("total", DoubleType(), True),
        StructField("running_max", DoubleType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("mx", DoubleType()),
    ]
)


def running_stats_per_key(
    stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Running (count, sum, max) per key maintained in keyed state —
    the reference's incremental merge-reduce generalized to a
    non-commutative-friendly accumulator with custom logic.

    Emits the updated accumulator row for every micro-batch in which
    the key saw data. State is O(1) per key; no timeout (caller can
    bound keys upstream or add a watermark variant).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, mx = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            if len(vals) == 0:
                continue
            n += int(len(vals))
            total += float(vals.sum())
            m = float(vals.max())
            mx = m if mx is None else max(mx, m)
        state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "n_events": [n],
                "total": [round(total, 6)],
                "running_max": [mx],
            }
        )

    return (
        stream.selectExpr(f"cast({key_col} as string) as k", f"{value_col}")
        .groupBy("k")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class _RunningStatsProcessor:
    """StatefulProcessor for running_stats_per_key_tws — defined at
    module scope so it pickles cleanly to executors."""

    def init(self, handle) -> None:
        self._value_col = self.value_col  # set by factory below
        self._state = handle.getValueState("acc", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values):
        n, total, mx = (
            self._state.get() if self._state.exists() else (0, 0.0, None)
        )
        for pdf in rows:
            vals = pdf[self._value_col].dropna()
            if len(vals) == 0:
                continue
            n += int(len(vals))
            total += float(vals.sum())
            m = float(vals.max())
            mx = m if mx is None else max(mx, m)
        self._state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "n_events": [n],
                "total": [round(total, 6)],
                "running_max": [mx],
            }
        )

    def close(self) -> None:
        pass


def running_stats_per_key_tws(
    stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """The transformWithStateInPandas twin of running_stats_per_key —
    Spark 4's arbitrary-stateful API (SPARK-49564): typed state
    handles (ValueState/ListState/MapState), optional per-key timers
    and state TTL, schema'd state evolution. Same accumulator
    semantics as the applyInPandasWithState version (the two are
    cross-validated in tests/test_streaming.py); this is the API new
    stateful operators should target, with applyInPandasWithState
    kept as the stable seam.

    NOTE: executing this requires the ``protobuf`` package (the TWS
    Python state-server protocol is protobuf-based) — absent in the
    build container, so the test is a tracked environment-blocked
    skip, the same class as the Avro jar."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    proc_cls = type(
        "RunningStatsTWS",
        (_RunningStatsProcessor, StatefulProcessor),
        {"value_col": value_col},
    )
    return (
        stream.selectExpr(f"cast({key_col} as string) as k", f"{value_col}")
        .groupBy("k")
        .transformWithStateInPandas(
            statefulProcessor=proc_cls(),
            outputStructType=RUNNING_STATS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


ATTRIBUTION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("channel", StringType(), False),
        StructField("value", DoubleType(), True),
    ]
)

_TOUCH_STATE_SCHEMA = StructType(
    [
        StructField("last_type", StringType()),
        StructField("last_us", LongType()),
        StructField("last_eid", LongType()),
    ]
)


def attribute_last_touch_stream(
    stream: DataFrame, conversion: str = "purchase"
) -> DataFrame:
    """Streaming last-touch attribution — the continuous twin of
    operators/analytics.last_touch_attribution: keyed state holds one
    row per user (the most recent non-conversion touch), each
    conversion event emits its credited channel the moment it
    arrives. State is O(1) per user regardless of history length —
    the batch window's UNBOUNDED PRECEDING frame collapses to three
    scalar fields, which is why attribution is a streaming-native
    workload at 100 TB/day event volumes.

    Within a micro-batch, a user's events are replayed in
    (ts, event_id) order; ACROSS batches the source must deliver
    event-time-ordered files (the append-only log contract the batch
    twin's window provides for free). A touch later than an already
    seen one never regresses state (the max-ordering guard), so
    duplicate replays are idempotent."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_type, last_us, last_eid = (
            state.get if state.exists else (None, -1, -1)
        )
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["us", "event_id"])
            for row in pdf.itertuples(index=False):
                if row.event_type == conversion:
                    out.append(
                        (
                            int(key[0]),
                            last_type if last_type is not None else "(direct)",
                            float(row.value),
                        )
                    )
                elif (int(row.us), int(row.event_id)) > (last_us, last_eid):
                    last_type = row.event_type
                    last_us = int(row.us)
                    last_eid = int(row.event_id)
        state.update((last_type, last_us, last_eid))
        yield pd.DataFrame(
            out, columns=[f.name for f in ATTRIBUTION_SCHEMA.fields]
        )

    return (
        stream.selectExpr(
            "user_id",
            "event_id",
            "event_type",
            "value",
            "unix_micros(ts) as us",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=ATTRIBUTION_SCHEMA,
            stateStructType=_TOUCH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("stage", StringType(), False),
        StructField("reached_us", LongType(), False),
    ]
)

_FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("stage_idx", LongType()),
        StructField("stage_us", LongType()),
        StructField("stage_eid", LongType()),
    ]
)


def funnel_stages_stream(stream: DataFrame, stages: list[str]) -> DataFrame:
    """Streaming strict-order funnel — the continuous twin of
    operators/analytics.funnel: per-user state is (current stage,
    reach time), a user advances to stage i+1 the moment an event of
    that type arrives strictly after their stage-i reach, and each
    advance emits a row. Greedy earliest-advance over time-ordered
    events reproduces the batch funnel's min-chaining exactly, so
    drained per-stage counts equal the batch summary. State is O(1)
    per user (three scalars) however long the history — the property
    that makes funnels streaming-native at event-firehose scale.
    Same ordering contract as attribute_last_touch_stream: in-batch
    replay is (ts, event_id)-sorted, across batches the source must
    deliver event-time-ordered files."""
    first = stages[0]

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        idx, s_us, s_eid = state.get if state.exists else (0, -1, -1)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["us", "event_id"])
            for row in pdf.itertuples(index=False):
                if idx >= len(stages):
                    break
                # stage 1 needs only its event type; later stages need
                # theirs strictly after the previous reach
                if idx == 0:
                    if row.event_type == first:
                        idx, s_us, s_eid = 1, int(row.us), int(row.event_id)
                        out.append((int(key[0]), f"1_{first}", s_us))
                elif row.event_type == stages[idx] and int(row.us) > s_us:
                    idx, s_us, s_eid = idx + 1, int(row.us), int(row.event_id)
                    out.append((int(key[0]), f"{idx}_{stages[idx - 1]}", s_us))
        state.update((idx, s_us, s_eid))
        yield pd.DataFrame(
            out, columns=[f.name for f in FUNNEL_SCHEMA.fields]
        )

    return (
        stream.selectExpr(
            "user_id", "event_id", "event_type", "unix_micros(ts) as us"
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=_FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
