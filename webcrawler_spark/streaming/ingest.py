"""Structured Streaming ingest over the same tables the batch engine reads.

The reference is a batch crawler (fixed scheduler rounds,
scheduler/scheduler.go:528-576) with no streaming surface; these are the
§2.8 additions a continuously-fed 100-TB ingest needs — the
fetched-pages/documents/events firehose processed incrementally instead
of in nightly batches. Design rules:

* **the streaming plan IS the batch plan** — stateless projections reuse
  the exact same Column expressions, and draining a stream with the
  available-now trigger must be bit-identical to the batch query over the
  same files; that equivalence is what lets the driver's DuckDB oracle
  hash-check streaming results, and it is asserted per-operator in
  tests/test_streaming.py;
* **state is bounded and keyed** — aggregation state lives in the state
  store keyed by (group), sized by distinct keys, not input rows;
  event-time aggregations carry an explicit watermark so late data has
  defined semantics and state is evictable in append mode;
* **sinks**: tests and the contract drain into the memory sink (tiny
  results); the production path is ``writeStream.format("parquet")`` with
  a checkpointLocation — the same atomic resume semantics RoundStore
  gives the batch crawl, provided by the streaming engine itself.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet table (file or directory).

    The schema is pinned from a one-off batch read — file streams require
    an explicit schema; inferring it from the same files keeps the
    streaming plan column-identical to the batch plan. New files appearing
    under ``path`` become new micro-batches; with
    ``trigger(availableNow=True)`` the stream drains what exists and
    stops, which is the contract/test mode.

    ``max_files_per_trigger`` (a SOURCE option) forces multi-micro-batch
    execution so the state store and watermark are exercised across
    batches — used by tests.
    """
    import os

    schema = spark.read.format(fmt).load(path).schema
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(path):
        # file-stream sources require a DIRECTORY; stream the parent with
        # a glob pinned to exactly this table's file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.load(path)


def drain_available_now(
    sdf: DataFrame, output_mode: str = "append"
) -> DataFrame:
    """Run a streaming DataFrame to completion with the available-now
    trigger into a memory sink and return the sink's contents as a batch
    DataFrame (the streaming analog of ``.collect()``-free evaluation —
    results stay queryable/lazy for the caller)."""
    name = "drain_" + uuid.uuid4().hex[:12]
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_" + name))
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


def exact_dedup_counts_stream(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Streaming twin of dedup.exact_dedup_groups: running (content_hash,
    n_copies, keeper_id) maintained incrementally in the state store.

    State is one row per DISTINCT content hash — the deduped size, not
    the stream size; keeper stays min(id) (deterministic, arrival-order
    independent), so the drained result equals the batch groupBy exactly.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Event-time tumbling-window aggregation with a watermark.

    Works on a batch OR streaming ``events`` frame (the watermark is a
    no-op in batch). In append mode a window emits once the watermark
    passes its end — late events inside the watermark still count,
    later ones are dropped with defined semantics; state per open
    (window, event_type) only. Windows align to the epoch, so the batch
    twin is ``date_trunc`` — asserted in tests and the oracle.
    """
    # watermarks require TIMESTAMP; session tz is pinned UTC so the NTZ
    # cast is the identity on the wall-clock value (sessions.epoch_us)
    ev = events.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, watermark)
    return (
        ev.groupBy(
            F.window(F.col(ts_col), window).alias("w"), F.col(type_col)
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(type_col).alias("event_type"),
            "n_events",
            "sum_value",
        )
    )
