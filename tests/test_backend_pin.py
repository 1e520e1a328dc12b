"""Seen-backend pinning + legacy backfill (ADVICE r3, high).

A checkpoint created under seen_backend='parquet' (or before the bucketed
backend existed) holds its seen set only in per-round seen_delta parquet.
Resuming it under the default 'bucketed' backend used to read a freshly
created EMPTY table — silently re-admitting every previously crawled URL.
Now: explicit backend mismatch fails loudly; a legacy store (no pin) is
backfilled from the committed seen_delta parquet before the first read.
"""

import json
import os
import shutil

import pytest

from webcrawler_spark.fixtures import WHITELIST
from webcrawler_spark.plans.crawl import CrawlConfig, run_crawl
from webcrawler_spark.storage import RoundStore


def _state(spark, result):
    order = sorted((r["round"], r["url"]) for r in result.order(spark).collect())
    seen = sorted(r["url_sha1"] for r in result.seen(spark).collect())
    return order, seen


def _kill_after(store: RoundStore, k: int) -> None:
    for rnd in store.committed_rounds():
        if rnd > k:
            os.remove(os.path.join(store.manifest_dir, f"round_{rnd}.json"))
            shutil.rmtree(
                os.path.join(store.rounds_dir, f"r={rnd}"), ignore_errors=True
            )
    m = store.manifest(k)
    if m.get("done"):
        m["done"] = False
        with open(os.path.join(store.manifest_dir, f"round_{k}.json"), "w") as f:
            json.dump(m, f)


def test_backend_mismatch_fails_loudly(spark, fixture_web, tmp_path):
    paths = fixture_web["paths"]
    pages = spark.read.parquet(paths["pages"])
    seeds = spark.read.parquet(paths["seeds"])
    d = str(tmp_path / "pq")
    cfg = CrawlConfig(whitelist=WHITELIST, max_depth=1, max_rounds=3,
                      parsers="bm1365", seen_backend="parquet")
    run_crawl(spark, pages, seeds, cfg, checkpoint_dir=d)
    cfg_b = CrawlConfig(whitelist=WHITELIST, max_depth=1, max_rounds=3,
                        parsers="bm1365", seen_backend="bucketed")
    with pytest.raises(ValueError, match="seen_backend"):
        run_crawl(spark, pages, seeds, cfg_b, checkpoint_dir=d, resume=True)


def test_legacy_store_backfills_seen_table(spark, fixture_web, tmp_path):
    """Simulate a pre-pin checkpoint: parquet backend + meta file deleted.
    Resuming under 'bucketed' must reproduce the uninterrupted run exactly
    (no URL re-admitted, identical order/seen)."""
    paths = fixture_web["paths"]
    pages = spark.read.parquet(paths["pages"])
    seeds = spark.read.parquet(paths["seeds"])
    cfg_legacy = CrawlConfig(whitelist=WHITELIST, max_depth=2, max_rounds=8,
                             parsers="combined", seen_backend="parquet")
    cfg_new = CrawlConfig(whitelist=WHITELIST, max_depth=2, max_rounds=8,
                          parsers="combined", seen_backend="bucketed")

    want_dir = str(tmp_path / "want")
    want = _state(
        spark,
        run_crawl(spark, pages, seeds, cfg_new, checkpoint_dir=want_dir),
    )

    d = str(tmp_path / "legacy")
    run_crawl(spark, pages, seeds, cfg_legacy, checkpoint_dir=d)
    store = RoundStore(d)
    _kill_after(store, k=1)
    os.remove(store._meta_path())  # legacy stores have no _store_meta.json

    resumed = run_crawl(spark, pages, seeds, cfg_new, checkpoint_dir=d,
                        resume=True)
    assert _state(spark, resumed) == want
    # the table now holds every committed round's keys (incl. backfilled)
    n_table = (
        spark.table(store.seen_table)
        .select("url_sha1").distinct().count()
    )
    assert n_table == len(want[1])
    # and the backfill is idempotent: nothing missing on a second resume
    assert store.backfill_seen_bucketed(spark, upto=store.last_committed()) == []
