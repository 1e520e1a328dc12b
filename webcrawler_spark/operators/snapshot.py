"""Corpus snapshot diff — change-data-capture between two crawl snapshots.

Recrawls produce a new corpus snapshot; the training pipeline wants the
DELTA (new docs to process, changed docs to re-embed/re-dedup, removed
docs to retire) rather than reprocessing 100 TB. The reference's closest
analog is its URL-seen set (scheduler/scheduler.go:132 — presence only);
this extends presence to content-level change detection, which is what
incremental pipelines actually key on.

Shape: ONE full-outer equi-join on the doc key comparing a content hash
— no sort, no window. At 10^10 docs both sides shuffle on the key once;
with both snapshots bucketed on the key (the storage layout the seen
table already uses, storage.py) the exchange disappears entirely and the
diff is a co-located merge. Output rows are only the changed minority
(added/removed/changed); the unchanged bulk is filtered pre-output, so
downstream work scales with churn, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, status, old_hash, new_hash) with status in
    added | removed | changed; unchanged rows are dropped."""
    o = old.select(
        F.col(id_col).alias("_oid"), F.md5(F.col(text_col)).alias("old_hash")
    )
    n = new.select(
        F.col(id_col).alias("_nid"), F.md5(F.col(text_col)).alias("new_hash")
    )
    j = o.join(n, o["_oid"] == n["_nid"], "full_outer")
    # null-SAFE hash compare: md5(NULL text) is NULL, and a NULL<->text
    # transition must surface as 'changed' — plain != would yield NULL and
    # fall through to 'unchanged', silently dropping the row from the CDC
    status = (
        F.when(F.col("_oid").isNull(), F.lit("added"))
        .when(F.col("_nid").isNull(), F.lit("removed"))
        .when(~F.col("old_hash").eqNullSafe(F.col("new_hash")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status") != "unchanged")
        .select(
            F.coalesce(F.col("_oid"), F.col("_nid")).alias(id_col),
            "status",
            "old_hash",
            "new_hash",
        )
    )
