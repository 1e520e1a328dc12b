"""Sequence packing — assign documents to fixed-token-budget training windows.

LLM pretraining consumes fixed-length windows (2k/4k/8k tokens); the
batch builder concatenates documents in a fixed order and chunks the
stream at budget boundaries (GPT-style "pack by concatenation"). This
operator computes that assignment as METADATA — (doc -> pack_id, offset)
— without ever materializing concatenated text, so the actual window
assembly can happen streaming-side or in the data loader.

Semantics (exactly the concat-then-chunk rule):

* docs are sharded by a hash of their id into ``n_shards`` independent
  streams (shards pack in parallel; pack ids are disjoint per shard);
* within a shard, docs are ordered by id (fixed, replayable order);
* the running token total before each doc determines its pack:
  ``pack_local = tokens_before DIV budget`` — a doc that straddles a
  boundary belongs to the pack where it STARTS (its tail flows into the
  next window, exactly how causal-LM packing treats document crossings);
* ``offset_in_pack = tokens_before MOD budget``.

Plan shape: one projection (token counts), one shuffle on the shard key,
one window pass per shard — no joins, no iteration, no Python. At 10^12
docs the shard count is the parallelism knob; each shard's window scan is
a single ordered pass. Every expression is integer arithmetic over a
hash-fixed order, so the assignment is engine-exact (DuckDB oracle twin)
and independent of input partitioning.

Token counts use textstats.token_count (the whitespace tokenizer the rest
of the engine standardizes on, JcUx.go:197 analog); swap in a real BPE
count column upstream if you have one — the packing math is agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from webcrawler_spark.operators.sampling import hash_bucket
from webcrawler_spark.operators.textstats import token_count, tokens

# pack_id = shard * PACKS_PER_SHARD + pack_local. The multiplier bounds
# packs PER SHARD, not per corpus: at the documented 10^12-token scale a
# shard can easily exceed 10^6 packs, and an overflow would silently
# collide with the next shard's id range. 2^44 packs/shard x a 2048-token
# budget ≈ 3.6x10^16 tokens per shard before overflow, while shard ids up
# to 2^19 still fit the positive long range (2^19 * 2^44 < 2^63).
PACKS_PER_SHARD = 1 << 44


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking — (doc_id, chunk_idx, start_tok, n_tokens,
    chunk_text) for every window of ``chunk_tokens`` tokens advancing by
    ``chunk_tokens - overlap`` (RAG / context-window prep; packing's
    complement: packing concatenates short docs, chunking splits long
    ones).

    Pure projection + one explode per doc — no shuffle, no Python; chunk
    count per doc is ceil(max(n - overlap, 1) / step), so output volume
    ~ corpus tokens x (1 + overlap/step). Token slices reuse the
    whitespace tokenizer the rest of the engine standardizes on, so
    chunk_text is engine-exact (DuckDB list-slice twin)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n_chunks = F.ceil(
        F.greatest(F.col("_n") - F.lit(overlap), F.lit(1)).cast("double")
        / F.lit(step)
    ).cast("long")
    out = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)  # split("") == [""]
        .select(
            F.col(id_col).alias("doc_id"),
            toks.alias("_t"),
            F.size(toks).alias("_n"),
        )
        .select(
            "doc_id", "_t", "_n",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
    )
    start = (F.col("chunk_idx") * step + 1).cast("long")  # 1-based slice
    piece = F.slice(F.col("_t"), start, chunk_tokens)
    return out.select(
        "doc_id",
        "chunk_idx",
        (start - 1).alias("start_tok"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """(doc_id, shard, n_tokens, pack_id, offset_in_pack) for every doc.

    ``budget`` is the window length in tokens; ``n_shards`` the number of
    independent packing streams (parallelism at scale)."""
    doc_id = F.col(id_col)
    shard = (hash_bucket(doc_id, salt) % n_shards).alias("shard")
    with_tokens = docs.select(
        doc_id.alias("doc_id"),
        shard,
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("_before")
    return (
        with_tokens.withColumn("_before", before)
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            (
                F.col("shard") * PACKS_PER_SHARD
                + F.expr(f"_before DIV {int(budget)}")
            ).cast("long").alias("pack_id"),
            (F.col("_before") % int(budget)).cast("long").alias("offset_in_pack"),
        )
    )
