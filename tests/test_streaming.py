"""Structured Streaming operators: drained-stream == batch equivalence,
multi-micro-batch state, watermark append semantics, sessionization."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from webcrawler_spark import streaming
from webcrawler_spark.operators import dedup, sessions


def _write_event_files(path, rows):
    """One parquet file per event, named and mtime-stamped in ts order, so
    1-file-per-trigger micro-batches arrive in EVENT-TIME order — the
    deterministic arrival the cross-batch state tests need."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    for i, r in enumerate(sorted(rows, key=lambda r: (r[1], r[0]))):
        t = pa.table(
            {
                "event_id": pa.array([r[0]], pa.int64()),
                "ts": pa.array([r[1]], pa.timestamp("us")),
                "user_id": pa.array([r[2]], pa.int64()),
                "event_type": pa.array([r[3]], pa.string()),
                "value": pa.array([r[4]], pa.float64()),
            }
        )
        f = os.path.join(path, f"ev{i:03d}.parquet")
        pq.write_table(t, f)
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))


def _write_docs(spark, path, n_files=3):
    rows = [
        (i, f"doc text {i % 7} repeated tokens {i % 3}") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


TS0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events_rows():
    """Two users; user 1 has two sessions split by a 45-min gap, user 2
    one session. Events deliberately out of id-order inside sessions."""
    m = dt.timedelta(minutes=1)
    return [
        # user 1, session 1: 00:00, 00:10, 00:20
        (0, TS0 + 0 * m, 1, "click", 1.0),
        (1, TS0 + 10 * m, 1, "view", 2.0),
        (2, TS0 + 20 * m, 1, "click", 3.0),
        # gap 45 min -> session 2: 01:05, 01:15
        (3, TS0 + 65 * m, 1, "buy", 4.0),
        (4, TS0 + 75 * m, 1, "click", 5.0),
        # user 2: one session 00:05, 00:25
        (5, TS0 + 5 * m, 2, "view", 10.0),
        (6, TS0 + 25 * m, 2, "view", 20.0),
    ]


@pytest.fixture()
def events_df(spark):
    return spark.createDataFrame(
        _events_rows(),
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double",
    )


class TestStreamIngest:
    def test_stateless_stream_equals_batch(self, spark, tmp_path):
        path = str(tmp_path / "docs")
        batch = _write_docs(spark, path)
        sdf = streaming.stream_table(spark, path, max_files_per_trigger=1)
        got = streaming.drain_available_now(
            sdf.select("doc_id", F.length("text").alias("n"))
        )
        want = batch.select("doc_id", F.length("text").alias("n"))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_dedup_counts_accumulate_across_batches(self, spark, tmp_path):
        path = str(tmp_path / "docs")
        batch = _write_docs(spark, path, n_files=4)
        # one file per micro-batch -> counts must merge in the state store
        sdf = streaming.stream_table(spark, path, max_files_per_trigger=1)
        got = streaming.drain_available_now(
            streaming.exact_dedup_counts_stream(sdf), output_mode="complete"
        )
        want = dedup.exact_dedup_groups(batch)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_frontier_admission_stream_equals_batch(self, spark, tmp_path):
        """The crawl admission hot path over a multi-micro-batch candidate
        stream: duplicates split ACROSS batches must still resolve to one
        deterministic winner (dedup state crosses the state store), and the
        seen anti-join (stream-static) drops the same keys as batch."""
        from webcrawler_spark.operators import admission

        rows = [
            # (url, depth, parent, pos) — dup of /a in different files
            ("http://www.example.com/a", 2, "http://p9", 9),
            ("http://www.example.com/a", 1, "http://p2", 3),
            ("http://www.example.com/b", 0, None, 1),
            ("http://www.example.com/seen", 0, None, 2),
        ]
        path = str(tmp_path / "cand")
        df = spark.createDataFrame(
            rows, "url string, depth long, parent_url string, link_pos long"
        )
        df.repartition(4).write.mode("overwrite").parquet(path)

        def pipeline(cand):
            cand = (
                cand.withColumn("url_sha1", F.md5(F.col("url")))
                .withColumn("host", F.lit("www.example.com"))
                .withColumn("path", F.expr("substring(url, 23)"))
            )
            seen = spark.createDataFrame(
                [("http://www.example.com/seen",)], "u string"
            ).select(F.md5(F.col("u")).alias("url_sha1"))
            return admission.dedup_in_round(
                admission.anti_join_seen(cand, seen)
            )

        sdf = streaming.stream_table(spark, path, max_files_per_trigger=1)
        got = sorted(
            map(tuple, streaming.drain_available_now(
                pipeline(sdf), output_mode="complete"
            ).collect())
        )
        want = sorted(map(tuple, pipeline(spark.read.parquet(path)).collect()))
        assert got == want
        urls = {r[1] for r in got}
        assert urls == {"http://www.example.com/a", "http://www.example.com/b"}
        winner = [r for r in got if r[1].endswith("/a")][0]
        assert winner[4] == 1 and winner[5] == "http://p2"  # min winner

    def test_windowed_events_complete_equals_batch(self, spark, events_df, tmp_path):
        path = str(tmp_path / "ev")
        events_df.repartition(2).write.mode("overwrite").parquet(path)
        sdf = streaming.stream_table(spark, path, max_files_per_trigger=1)
        got = streaming.drain_available_now(
            streaming.windowed_event_stats(sdf, window="1 hour"),
            output_mode="complete",
        )
        want = streaming.windowed_event_stats(spark.read.parquet(path))
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        # epoch-aligned windows == date_trunc semantics
        trunc = (
            spark.read.parquet(path)
            .groupBy(
                F.date_trunc("hour", F.col("ts")).alias("window_start"),
                "event_type",
            )
            .agg(F.count("*").alias("n_events"))
        )
        got_counts = {
            (r["window_start"], r["event_type"]): r["n_events"]
            for r in got.collect()
        }
        for r in trunc.collect():
            assert got_counts[(r["window_start"], r["event_type"])] == r["n_events"]

    def test_windowed_append_emits_only_closed_windows(self, spark, events_df, tmp_path):
        """Append mode with a 30-min watermark across micro-batches: every
        emitted window must be closed (end <= max event time - watermark)
        and agree with the batch aggregation; still-open windows are
        withheld by design."""
        path = str(tmp_path / "ev")
        # one file per event forces many micro-batches -> watermark advances
        _write_event_files(path, _events_rows())
        sdf = streaming.stream_table(spark, path, max_files_per_trigger=1)
        got = streaming.drain_available_now(
            streaming.windowed_event_stats(sdf, window="1 hour", watermark="30 minutes"),
            output_mode="append",
        ).collect()
        want = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in streaming.windowed_event_stats(
                spark.read.parquet(path)
            ).collect()
        }
        for r in got:
            key = (r["window_start"], r["event_type"])
            assert want[key] == (r["n_events"], r["sum_value"])


    def test_admission_update_mode_merges_to_complete_state(self, spark, tmp_path):
        """UPDATE-mode drain (the continuous-operation surface): per-batch
        emissions of changed winners, merged by re-applying the dedup
        aggregate over the sink, must equal the complete-mode final state —
        across micro-batches that keep improving the same key's winner."""
        from webcrawler_spark.operators import admission

        # three files, each improving /a's winner (forces a re-emission per
        # micro-batch) plus unique keys per batch
        batches = [
            [("http://www.example.com/a", 5, "http://p9", 9),
             ("http://www.example.com/b", 0, None, 1)],
            [("http://www.example.com/a", 3, "http://p5", 5),
             ("http://www.example.com/c", 2, None, 2)],
            [("http://www.example.com/a", 1, "http://p1", 1),
             ("http://www.example.com/seen", 0, None, 2)],
        ]
        path = str(tmp_path / "cand_upd")
        for i, rows in enumerate(batches):
            spark.createDataFrame(
                rows, "url string, depth long, parent_url string, link_pos long"
            ).coalesce(1).write.mode("append").parquet(path)

        def pipeline(cand):
            cand = (
                cand.withColumn("url_sha1", F.md5(F.col("url")))
                .withColumn("host", F.lit("www.example.com"))
                .withColumn("path", F.expr("substring(url, 23)"))
            )
            seen = spark.createDataFrame(
                [("http://www.example.com/seen",)], "u string"
            ).select(F.md5(F.col("u")).alias("url_sha1"))
            return admission.dedup_in_round(
                admission.anti_join_seen(cand, seen)
            )

        sdf = streaming.stream_table(spark, path, max_files_per_trigger=1)
        drained = streaming.drain_available_now(
            pipeline(sdf), output_mode="update"
        )
        # multi-batch proof: /a was re-emitted at least twice (update mode
        # emits every winner improvement), so the raw sink holds duplicates
        raw = drained.collect()
        a_emissions = [r for r in raw if r["url"].endswith("/a")]
        assert len(a_emissions) >= 2
        merged = sorted(map(tuple, admission.dedup_in_round(drained).collect()))
        want = sorted(map(tuple, pipeline(spark.read.parquet(path)).collect()))
        assert merged == want
        winner = [r for r in merged if r[1].endswith("/a")][0]
        assert winner[4] == 1 and winner[5] == "http://p1"


class TestSessionize:
    def test_batch_sessions(self, events_df):
        got = {
            (r["user_id"], r["session_idx"]): (
                r["session_start"], r["session_end"], r["n_events"], r["sum_value"]
            )
            for r in sessions.sessionize(events_df, gap_minutes=30).collect()
        }
        m = dt.timedelta(minutes=1)
        assert got[(1, 1)] == (TS0, TS0 + 20 * m, 3, 6.0)
        assert got[(1, 2)] == (TS0 + 65 * m, TS0 + 75 * m, 2, 9.0)
        assert got[(2, 1)] == (TS0 + 5 * m, TS0 + 25 * m, 2, 30.0)
        assert len(got) == 3

    def test_gap_boundary_is_exclusive(self, spark):
        # exactly 30:00 gap stays ONE session; 30:00.000001 splits
        rows = [
            (0, TS0, 1, "a", 1.0),
            (1, TS0 + dt.timedelta(minutes=30), 1, "a", 1.0),
            (2, TS0 + dt.timedelta(minutes=60, microseconds=1), 1, "a", 1.0),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id: long, ts: timestamp, user_id: long, "
            "event_type: string, value: double",
        )
        out = sessions.sessionize(df, gap_minutes=30).collect()
        assert sorted(r["session_idx"] for r in out) == [1, 2]
        n = {r["session_idx"]: r["n_events"] for r in out}
        assert n == {1: 2, 2: 1}

    def test_stream_emits_closed_sessions_only(self, spark, events_df, tmp_path):
        """Drained stream == batch sessions MINUS each user's final
        (still-open) session — the documented append contract."""
        path = str(tmp_path / "ev")
        events_df.coalesce(1).write.mode("overwrite").parquet(path)
        sdf = streaming.stream_table(spark, path)
        got = sorted(
            map(tuple, streaming.drain_available_now(
                streaming.sessionize_stream(sdf, gap_minutes=30)
            ).collect())
        )
        batch = sessions.sessionize(events_df, gap_minutes=30)
        last = batch.groupBy("user_id").agg(
            F.max("session_idx").alias("session_idx")
        )
        closed = batch.join(last, ["user_id", "session_idx"], "left_anti")
        # compare on (user, start_us, end_us, n, sum)
        want = sorted(
            map(tuple, closed.select(
                "user_id",
                sessions.epoch_us(F.col("session_start")).alias("s"),
                sessions.epoch_us(F.col("session_end")).alias("e"),
                "n_events", "sum_value",
            ).collect())
        )
        assert got == want

    def test_stream_closes_session_across_batches(self, spark, events_df, tmp_path):
        """One file per event -> user 1's first session closes only when a
        LATER batch delivers the post-gap event; state must carry over."""
        path = str(tmp_path / "ev")
        _write_event_files(path, _events_rows())
        sdf = streaming.stream_table(spark, path, max_files_per_trigger=1)
        got = streaming.drain_available_now(
            streaming.sessionize_stream(sdf, gap_minutes=30)
        ).collect()
        u1 = [r for r in got if r["user_id"] == 1]
        assert any(r["n_events"] == 3 and r["sum_value"] == 6.0 for r in u1)
