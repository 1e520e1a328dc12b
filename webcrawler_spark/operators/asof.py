"""As-of join — match each left event to the latest right event at or
before it, per key.

The classic temporal join Spark's built-ins lack (the brief's canonical
"custom operator" example): for every left row (user, ts), find the most
recent right row with right.ts <= left.ts for the same user. Feature
joins ("last purchase before this click"), session attribution, and
point-in-time-correct training joins are all this operator.

Implementation is the MERGE pattern, not a range join: union both sides
with a side tag, ONE shuffle on the key, ONE ordered window pass using
``last_value(..., ignorenulls)`` over the preceding frame to carry the
latest right attributes forward onto each left row. Work is
O((|L|+|R|) log) per key partition — a range join (l.ts >= r.ts) would
explode to O(|L|·|R|) pairs per key before aggregation, which is the
difference between a merge and a disaster at 10^12 events.

Determinism: multiple right rows at the same (key, ts) are collapsed
first to the max-id row (explicit tie rule); the union sort orders right
BEFORE left at equal ts so ties match "at or before" inclusively. All
ordering keys are integers (epoch microseconds + ids) — engine-exact,
and the DuckDB oracle can state the same semantics directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from webcrawler_spark.operators.sessions import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Left rows + (matched_id, matched_ts_us, matched_value) of the
    latest right row with right.ts <= left.ts on the same key; NULLs when
    no right row precedes. Right-side ties at one (key, ts): max id wins."""
    # collapse right-side ts ties to the max-id row (deterministic rule)
    rw = Window.partitionBy(on, ts_col).orderBy(F.col(id_col).desc())
    r = (
        right.withColumn("_rn", F.row_number().over(rw))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(on).alias("_k"),
            epoch_us(F.col(ts_col)).alias("_ts"),
            F.lit(0).alias("_side"),  # right sorts before left at equal ts
            F.col(id_col).cast("long").alias("_rid"),
            F.col(value_col).cast("double").alias("_rval"),
            F.lit(None).cast("long").alias("_lid"),
        )
    )
    l = left.select(
        F.col(on).alias("_k"),
        epoch_us(F.col(ts_col)).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rid"),
        F.lit(None).cast("double").alias("_rval"),
        F.col(id_col).cast("long").alias("_lid"),
    )
    merged = r.unionByName(l)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_lid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        "_k", "_ts", "_side", "_lid",
        F.last("_rid", ignorenulls=True).over(w).alias("matched_id"),
        F.last("_rval", ignorenulls=True).over(w).alias("matched_value"),
        F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True)
        .over(w).alias("matched_ts_us"),
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col("_k").alias(on),
        F.col("_lid").alias(id_col),
        F.col("_ts").alias("ts_us"),
        "matched_id",
        "matched_ts_us",
        "matched_value",
    )
