"""Event sessionization — gap-based session assembly over an event log.

The reference crawler has no event analytics surface (its only temporal
state is the round counter, scheduler/scheduler.go:528); this is a §2.8
training-pipeline operator: user-behavior logs (the ``events`` table)
rolled up into sessions for downstream feature extraction.

Semantics: events of one user, ordered by (ts, event_id), belong to the
same session while consecutive gaps are <= ``gap_minutes``; a larger gap
starts a new session. ``session_idx`` is the 1-based running session
number per user. All boundary math is INTEGER microseconds
(``unix_micros``) so the oracle (DuckDB ``date_diff('microsecond')``)
agrees exactly — no float epoch anywhere.

Plan shape at 10^12 events: one hash shuffle on user_id (high
cardinality — no skew salt needed), two window passes over each user's
partition-local slice, one partial-aggregated groupBy. Nothing driver-
side, nothing quadratic. The streaming twin (incremental sessions over a
live event stream) is streaming/sessionize.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def epoch_us(c: Column) -> Column:
    """NTZ-safe epoch microseconds. The engine pins the session timezone
    to UTC (session.py), so casting TIMESTAMP_NTZ -> TIMESTAMP is the
    identity on the wall-clock value and this equals DuckDB's
    ``epoch_us`` of the same naive timestamp."""
    return F.unix_micros(c.cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, session_idx, session_start, session_end, n_events,
    sum_value) — sum rounded to 6 dp (FP summation-order quantization,
    same convention as every other aggregate in the contract)."""
    gap_us = int(gap_minutes) * 60_000_000
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    prev = F.lag(ts_col).over(w)
    is_new = F.when(
        prev.isNull() | ((epoch_us(F.col(ts_col)) - epoch_us(prev)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("event_id"),
            F.col(value_col).alias("value"),
        )
        .withColumn("session_idx", sess)
        .groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
