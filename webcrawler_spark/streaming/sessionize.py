"""Incremental sessionization — custom stateful streaming operator.

Streaming twin of operators/sessions.sessionize: gap-based sessions
assembled incrementally over a live event stream with
``applyInPandasWithState`` (the Spark-native path for stateful logic the
built-in windowed aggregates can't express — a session's extent depends
on data, not on a fixed grid).

Per-user state is ONE open session (start/last/count/sum — four scalars,
bounded by distinct active users, not stream length). Each micro-batch:
the user's new events are sorted by (ts_us, event_id) and folded into the
open session; any gap > ``gap_minutes`` CLOSES the current session (it is
emitted and final) and opens a new one. The still-open session stays in
state and is NOT emitted — identical to how the batch operator's last
session per user only exists once the log is complete. Equivalence
contract (asserted in tests/test_streaming.py): drained stream output ==
batch sessionize minus each user's final (still-open) session.

Arrow batches move (user_id, ts_us, event_id, value) only — integers and
one double; all gap math is integer microseconds, matching the batch
operator and its DuckDB oracle exactly.

Caveat (documented, inherent to append-mode stateful streaming): events
arriving LATE — after their user's later-ts events were already folded —
would reorder history; run behind a watermark-sorted upstream or accept
per-batch ordering, same trade as the reference's single-threaded
scheduler avoids by construction (scheduler/scheduler.go:528 processes
rounds in order).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _fold_sessions(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: Any, gap_us: int
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start_us, last_us, n_events, sum_value = state.get
    else:
        start_us = last_us = None
        n_events, sum_value = 0, 0.0

    closed: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for ts_us, value in zip(pdf["ts_us"], pdf["value"]):
            ts_us = int(ts_us)
            if start_us is None:
                start_us, last_us, n_events, sum_value = ts_us, ts_us, 1, float(value)
            elif ts_us - last_us > gap_us:
                closed.append(
                    (user_id, start_us, last_us, n_events, round(sum_value, 6))
                )
                start_us, last_us, n_events, sum_value = ts_us, ts_us, 1, float(value)
            else:
                last_us = ts_us
                n_events += 1
                sum_value += float(value)

    if start_us is not None:
        state.update((start_us, last_us, n_events, sum_value))
    if closed:
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id", "session_start_us", "session_end_us",
                "n_events", "sum_value",
            ],
        )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Emit CLOSED sessions of a streaming events frame; open sessions
    remain in per-user state. Output: (user_id, session_start_us,
    session_end_us, n_events, sum_value)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_minutes) * 60_000_000
    from webcrawler_spark.operators.sessions import epoch_us

    prepared = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        epoch_us(F.col(ts_col)).alias("ts_us"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(value_col).cast("double").alias("value"),
    )

    def fn(key, pdfs, state):
        return _fold_sessions(key, pdfs, state, gap_us)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
