"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9: the extension path for stateful semantics the built-in
windowed aggregations can't express).

``budget_alerts_stream`` is a per-key running-accumulator detector: each
user's event values accumulate across micro-batches (and across restarts —
the accumulator lives in the streaming state store, checkpointed with the
query), and every time the running total crosses another multiple of the
threshold an alert row is emitted. The per-user state is one double, so
state size is O(distinct active users) regardless of stream length — the
bounded-state property that matters on an unbounded feed.

Ordering contract: events are processed in (ts_us, event_id) order WITHIN a
micro-batch, and micro-batches arrive in file order — the standard
file-source contract. Out-of-order data across batches should be handled
upstream with a watermarked sort or tolerated (alerts may fire on a
slightly different event, totals are unaffected: addition commutes).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

ALERT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("running_total", DoubleType()),
        StructField("threshold_multiple", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("total", DoubleType())])


def _alerts_fn(threshold: float):
    def fn(
        key: tuple,
        pdf_iter: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        (total,) = state.get if state.exists else (0.0,)
        chunks = [pdf for pdf in pdf_iter if len(pdf)]
        out: list[tuple] = []
        if chunks:
            events = pd.concat(chunks).sort_values(["ts_us", "event_id"])
            for ev_id, ts_us, value in zip(
                events["event_id"], events["ts_us"], events["value"]
            ):
                before = int(total // threshold)
                total += float(value)
                after = int(total // threshold)
                if after > before:
                    out.append((user_id, int(ev_id), int(ts_us), total, after))
        state.update((total,))
        yield pd.DataFrame(
            out,
            columns=[f.name for f in ALERT_SCHEMA.fields],
        )

    return fn


def budget_alerts_stream(events: DataFrame, threshold: float = 100.0) -> DataFrame:
    """Per-user threshold-crossing alerts over a stream with columns
    (event_id, ts_us, user_id, value). Grouping keys partition the state;
    Arrow batches carry the rows — no per-row Python round trips."""
    return events.groupBy("user_id").applyInPandasWithState(
        _alerts_fn(threshold),
        outputStructType=ALERT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming funnel (stateful twin of harness events_funnel) ---------------

FUNNEL_WINDOW_US = 86_400_000_000  # 24 h, matches the batch operator

FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_signup_us", LongType()),
        StructField("first_conversion_us", LongType()),
    ]
)

_FUNNEL_STATE = StructType(
    [
        StructField("fs", LongType()),
        StructField("conv", LongType()),
    ]
)


def _funnel_fn(
    key: tuple,
    pdf_iter: "Iterable[pd.DataFrame]",
    state: "GroupState",
) -> "Iterator[pd.DataFrame]":
    """Per-user funnel state: first signup ts and first purchase ts within
    24 h AFTER it. Two longs per user — O(users) state however long the
    stream runs. Emits the user's current (fs, conv) row whenever a batch
    changes it; the LAST emission per user equals the batch operator's row.
    Same in-batch ordering contract as ``budget_alerts_stream``."""
    (user_id,) = key
    fs, conv = state.get if state.exists else (None, None)
    before = (fs, conv)
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        events = pd.concat(chunks).sort_values(["ts_us", "event_id"])
        for etype, ts_us in zip(events["event_type"], events["ts_us"]):
            if etype == "signup" and fs is None:
                fs = int(ts_us)
            elif (
                etype == "purchase"
                and fs is not None
                and conv is None
                and int(ts_us) - fs <= FUNNEL_WINDOW_US
            ):
                conv = int(ts_us)
    state.update((fs, conv))
    if fs is not None and (fs, conv) != before:
        yield pd.DataFrame(
            [(user_id, fs, conv)],
            columns=[f.name for f in FUNNEL_SCHEMA.fields],
        )
    else:
        yield pd.DataFrame(columns=[f.name for f in FUNNEL_SCHEMA.fields])


def funnel_stream(events: DataFrame) -> DataFrame:
    """Streaming signup→purchase funnel over (event_id, ts_us, user_id,
    event_type); per-user state is two longs in the state store,
    checkpoint-recoverable like the budget accumulator."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_fn,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming burst detector (stateful twin of events_activity_bursts) ------

BURST_WINDOW_US = 3_600_000_000  # trailing 1 h, matches the batch operator
BURST_MIN_EVENTS = 3

BURST_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts_us", LongType()),
        StructField("burst_n", LongType()),
    ]
)

_BURST_STATE = StructType(
    [StructField("recent", ArrayType(LongType()))]
)


def _bursts_fn(
    key: tuple,
    pdf_iter: "Iterable[pd.DataFrame]",
    state: "GroupState",
) -> "Iterator[pd.DataFrame]":
    """Per-user trailing-window burst detection: state is the sorted list of
    event timestamps still inside the last BURST_WINDOW_US — pruned on every
    arrival, so its size is bounded by the user's event rate × window, never
    the stream length. An event whose inclusive trailing window [ts − W, ts]
    holds ≥ BURST_MIN_EVENTS events (itself included) emits an alert —
    exactly the batch operator's RANGE-frame count for tie-free timestamps
    (an equal-ts peer processed later is not visible to the earlier event;
    the batch RANGE frame counts such peers both ways)."""
    (user_id,) = key
    recent = list(state.get[0]) if state.exists else []
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    out: list[tuple] = []
    if chunks:
        events = pd.concat(chunks).sort_values(["ts_us", "event_id"])
        for ev_id, ts in zip(events["event_id"], events["ts_us"]):
            ts = int(ts)
            lo = ts - BURST_WINDOW_US
            recent = [t for t in recent if t >= lo]
            recent.append(ts)
            if len(recent) >= BURST_MIN_EVENTS:
                out.append((user_id, int(ev_id), ts, len(recent)))
    state.update((recent,))
    yield pd.DataFrame(out, columns=[f.name for f in BURST_SCHEMA.fields])


def bursts_stream(events: DataFrame) -> DataFrame:
    """Streaming activity-burst alerts over (event_id, ts_us, user_id):
    append-mode emissions the moment the count condition is met — the
    low-latency twin of the batch events_activity_bursts RANGE window."""
    return events.groupBy("user_id").applyInPandasWithState(
        _bursts_fn,
        outputStructType=BURST_SCHEMA,
        stateStructType=_BURST_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
