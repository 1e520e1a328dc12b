"""Inverted index + term ranking over the document corpus.

The classic IR pair a web-crawl corpus feeds: term -> postings (which
docs contain it) and per-doc salient terms (tf·idf-style). No reference
analog (the crawler stores, never indexes) — §2.8 pipeline operators.

Scale shape:

* **index build**: explode to (term, doc) pairs — distinct per doc — then
  ONE groupBy(term) with map-side combine. Postings are emitted as a
  sorted comma-joined string (deterministic; at true scale you'd write
  the exploded pairs bucketed by term instead of aggregating giant
  arrays — both paths share the same (term, doc) relation, and stop-term
  df caps bound the worst posting like the Jaccard shingle cap).
* **term ranking**: tf from one (doc, term) groupBy, df joined back from
  the index relation, top-k per doc via window. The df side is |vocab|
  rows — broadcastable for any real vocabulary.

Determinism: scoring avoids floats entirely — score = tf·1e9 DIV df
(monotone in tf/df, the idf ordering for a fixed corpus since ln(N/df)
is monotone in 1/df) — so ranks, ties (broken by term asc) and hashes
are engine-exact. A float ln() score could differ in the last ulp
between libm and Java Math.log and flip rank order; the integer score
cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from webcrawler_spark.operators.textstats import tokens

SCORE_UNIT = 1_000_000_000


def term_doc_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct (term, doc_id) pairs; empty texts contribute nothing."""
    t = F.trim(F.col(text_col))
    return (
        docs.filter(F.length(t) > 0)
        .select(F.col(id_col).alias("doc_id"), F.explode(tokens(t)).alias("term"))
        .distinct()
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """(term, df, postings) — postings a sorted comma-joined doc-id string.
    ``max_df`` drops stop terms (present in more docs than the cap) the
    same way the Jaccard path caps stop shingles."""
    idx = (
        term_doc_pairs(docs, id_col, text_col)
        .groupBy("term")
        .agg(
            F.count("*").cast("long").alias("df"),
            F.array_join(
                F.sort_array(F.collect_list(F.col("doc_id").cast("long"))), ","
            ).alias("postings"),
        )
    )
    if max_df is not None:
        idx = idx.filter(F.col("df") <= max_df)
    return idx


def top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k salient terms per doc by tf/df (integer-scaled): (doc_id,
    term, tf, df, score, rank). Ties: higher tf first, then term asc."""
    t = F.trim(F.col(text_col))
    tf = (
        docs.filter(F.length(t) > 0)
        .select(F.col(id_col).alias("doc_id"), F.explode(tokens(t)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = tf.join(F.broadcast(df_counts), "term").withColumn(
        "score", F.expr(f"(tf * {SCORE_UNIT}) DIV df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", F.col("rank").cast("long").alias("rank"))
    )
