"""Fetch+parse throughput workload — pages-fetched/sec, the north metric.

One "mega round" of the crawl's fetch stage: frontier ⋈ pages on url,
then the Arrow-batched HTML parse UDF (links + scoped imgs + JcUx struct +
text invariant) with posexplode of the outlinks — exactly the per-page
work of plans/crawl.py, isolated from the round-loop bookkeeping.

Setup (untimed) synthesizes a pages table of n_pages rows by tiling the
deterministic fixture web with distinct URLs (Spark-side cross join — the
driver never materializes the pages). Timed section = scan → join →
parse → explode → count, forced by one action.

At 100 TB this stage dominates crawl cost (~1.5 ms/page of DOM work vs
~5 µs/URL of admission algebra), so pages/sec here is the number that
matters for the ≥0.8 N→4N scaling target.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawler_spark.functions.html import parse_html_udf


def synth_pages(spark: SparkSession, n_pages: int, partitions: int) -> DataFrame:
    """Tile the 200-page fixture web to n_pages rows with distinct URLs."""
    from webcrawler_spark import fixtures

    base_pages, _, _ = fixtures.generate(n_pages=200, seed=42)
    html_pages = [
        (p["url"], p["html"]) for p in base_pages if p["html"][:4] != b"IMG:"
    ]
    base = spark.createDataFrame(html_pages, "url: string, html: binary")
    k = (n_pages + len(html_pages) - 1) // len(html_pages)
    tiles = spark.range(0, k, 1, partitions)
    # no .limit(): a global limit collapses the write to ONE partition and
    # cripples every downstream stage; actual row count is k*len(base)
    return tiles.join(F.broadcast(base)).select(
        F.concat(F.col("url"), F.lit("?v="), F.col("id").cast("string")).alias("url"),
        "html",
    )


def run_parse_workload(
    spark: SparkSession, n_pages: int = 30_000, partitions: int | None = None,
    workdir: str | None = None,
) -> dict:
    import shutil
    import tempfile

    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism * 2
    own = workdir is None
    if own:
        workdir = tempfile.mkdtemp(prefix="parse_bench_")
    try:
        pages_path = f"{workdir}/pages"
        synth_pages(spark, n_pages, partitions).write.mode("overwrite").parquet(pages_path)

        t0 = time.time()
        pages = spark.read.parquet(pages_path)
        frontier = pages.select("url")  # this round fetches every page
        # repartition before the UDF: AQE coalesces join output by BYTES,
        # but parse cost is per-ROW cpu — without this the parse stage can
        # run ~7-wide on a 32-core box (html is small, DOM work is not)
        fetched = frontier.join(pages, on="url", how="inner").repartition(partitions)
        parsed = fetched.withColumn(
            "p", parse_html_udf(F.col("html"), F.col("url"))
        ).select(
            "url",
            F.col("p.jcux.info").alias("text"),
            F.posexplode(F.concat(F.col("p.scoped_img_links"), F.col("p.links"),
                                  F.col("p.img_links"))).alias("link_pos", "out_url"),
        )
        row = parsed.agg(
            F.count("*").alias("links"),
            F.countDistinct("url").alias("pages"),
        ).collect()[0]
        wall = time.time() - t0
    finally:
        if own:
            shutil.rmtree(workdir, ignore_errors=True)
    return {
        "n_pages": n_pages,
        "pages_parsed": row["pages"],
        "links": row["links"],
        "wall_s": round(wall, 3),
        "pages_per_sec": round(row["pages"] / wall, 1),
    }


if __name__ == "__main__":
    import sys

    from webcrawler_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    spark = get_spark("parse-bench")
    print(run_parse_workload(spark, n))
    spark.stop()
