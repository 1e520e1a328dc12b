"""Link-graph analytics — PageRank over the crawled web graph.

The reference crawler EXTRACTS the link graph (every ``a[href]`` edge,
exampes/finder/bm1365Model/JcUx.go:84-118 via analyzer.go:119-132) but
never analyzes it; ranking crawled URLs by link structure is the natural
§2.8 follow-on — crawl prioritization, spam-domain discounting, and
quality weighting for training-data mixtures all start from PageRank.

Spark-iterative shape (the same discipline as dedup.duplicate_clusters):

* one equi-join (ranks ⋈ edges on src) + one map-side-combined sum per
  iteration — work scales with |edges|, nothing quadratic;
* the dangling-node mass is ONE scalar aggregate per iteration, folded
  back in via a broadcast 1-row cross join (no driver collect inside the
  plan);
* ranks are ``localCheckpoint()``-ed each round so lineage stays O(1)
  across iterations (swap for ``checkpoint(dir)`` on a real cluster);
* out-degrees are computed once, outside the loop.

Determinism: ranks are carried as INTEGER units of 1e-9 (``UNIT = 10^9``)
and every step uses integer division (``DIV``), so sums commute exactly
and any engine — Spark, DuckDB, a pencil — produces bit-identical ranks.
This quantizes the classic float PageRank at 1e-9, which is far below any
ranking-relevant difference, and buys exact cross-engine verification
(the DuckDB oracle unrolls the same iteration; FP PageRank could never
hash-match across engines because summation order differs).

Update rule per iteration (damping d = 85/100, n nodes):

    share(u)   = r(u) DIV outdeg(u)            for u with outdeg > 0
    dangling   = sum of r(u) for outdeg(u) = 0
    r'(v)      = (15 * (UNIT DIV n)) DIV 100
               + (85 * (incoming(v) + dangling DIV n)) DIV 100
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNIT = 1_000_000_000


def synth_link_graph(nodes: DataFrame, n: int, id_col: str = "node") -> DataFrame:
    """Deterministic synthetic web graph over integer node ids 0..n-1
    (contract/test fixture — the operator itself takes ANY edge list).

    Three affine out-edge rules with divisibility gates so out-degree
    varies 0..3 and ~1/12 of nodes are dangling:

        rule j in {0,1,2}:  dst = (node * P_j + Q_j) mod n,
                            emitted iff node mod (j+2) != 0 and dst != node

    P = (7, 13, 31), Q = (3, 5, 11). Self-loops dropped, parallel edges
    deduped. Expressible identically in SQL (the oracle twin).
    """
    node = F.col(id_col)
    parts = []
    for j, (p, q) in enumerate([(7, 3), (13, 5), (31, 11)]):
        parts.append(
            nodes.filter(node % (j + 2) != 0).select(
                node.alias("src"), ((node * p + q) % n).alias("dst")
            )
        )
    edges = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return edges.filter(F.col("dst") != F.col("src")).distinct()


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n: int,
    iters: int = 5,
    id_col: str = "node",
    checkpoint: bool = True,
    early_stop: bool = True,
) -> DataFrame:
    """Integer-unit PageRank; returns (id_col, rank_units: long).

    ``nodes`` one row per node; ``edges`` (src, dst), deduped. ``n`` is
    the node count (pass it in — callers already know it; avoids a count
    job here). All arithmetic integer (see module docstring), so results
    are engine-exact and iteration-order-free.

    ``early_stop``: the integer update is a pure function of the rank
    vector, so two consecutive IDENTICAL vectors are an exact fixed point
    — every remaining iteration would recompute the same frame. The probe
    (an equi-join + limit-1 existence scan over two checkpointed
    integer columns) runs every 2nd iteration, the same amortized
    discipline as dedup.duplicate_clusters; output is bit-identical with
    or without it, converged inputs just skip the tail iterations.
    """
    base = UNIT // n  # uniform start mass per node, in 1e-9 units
    outdeg = edges.groupBy("src").agg(F.count("*").alias("k"))

    ranks = nodes.select(F.col(id_col).alias("node")).withColumn(
        "r", F.lit(base).cast("long")
    )
    if checkpoint:
        ranks = ranks.localCheckpoint()
        outdeg = outdeg.localCheckpoint()
        edges = edges.localCheckpoint()

    prev = None
    for it in range(iters):
        # scalar dangling mass -> 1-row frame, broadcast-cross-joined back
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"], "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm"))
        )
        incoming = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"), F.expr("r DIV k").alias("share"))
            .groupBy("node")
            .agg(F.sum("share").cast("long").alias("inc"))
        )
        ranks = (
            nodes.select(F.col(id_col).alias("node"))
            .join(incoming, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((15 * base) // 100)
                    + F.expr(
                        f"(85 * (coalesce(inc, 0L) + (dm DIV {n}))) DIV 100"
                    )
                ).cast("long").alias("r"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint()

        if (
            early_stop
            and prev is not None
            and it % 2 == 1
            and it + 1 < iters
        ):
            changed = (
                ranks.alias("a")
                .join(prev.alias("b"), "node")
                .filter(F.col("a.r") != F.col("b.r"))
                .limit(1)
                .count()
            )
            if changed == 0:
                break
        prev = ranks

    return ranks.select(F.col("node").alias(id_col), F.col("r").alias("rank_units"))
