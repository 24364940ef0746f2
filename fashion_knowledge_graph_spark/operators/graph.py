"""Iterative graph algorithms over DataFrame edge lists.

PageRank here is the canonical iterative join-aggregate: each
iteration is (ranks ⋈ edges on src) → groupBy dst → weighted sum.
Catalyst handles the physical side (broadcast vs shuffle per AQE);
the loop is driver-side control flow only — no per-row driver work.
Lineage is truncated every iteration with an eager localCheckpoint,
otherwise the plan tree doubles per iteration and the optimizer
chokes long before the data does (the classic iterative-Spark trap).

Related: ``components.py`` (connected components / label propagation)
covers the other iterative-graph need in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             weight: str | None = None, iterations: int = 3,
             damping: float = 0.85) -> DataFrame:
    """Weighted PageRank with a fixed iteration count.

    r₀(v) = 1/N;  rₖ₊₁(v) = (1-d)/N + d·( Σ_{u→v} rₖ(u)·w(u,v)/outw(u)
                                          + dangling_massₖ/N )

    Dangling mass (rank parked on nodes with no out-edges) is
    redistributed uniformly — one scalar aggregation per iteration,
    the same single-number driver round-trip GraphX performs. A fixed
    ``iterations`` (vs convergence test) keeps the result
    deterministic and ANSI-SQL-replayable (the oracle unrolls the
    loop as CTEs).

    Scale: each iteration shuffles |edges| contribution rows into a
    partial-agg groupBy on dst — the same profile as one
    co-occurrence aggregation; ranks (2 narrow columns) broadcast
    when small, shuffle-join when not. Node set and out-weights are
    computed once, checkpointed, and reused every iteration.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"),
                     w.alias("w"))
    nodes = (e.select(F.col("e_src").alias("node"))
             .unionByName(e.select(F.col("e_dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    outw = e.groupBy("e_src").agg(F.sum("w").alias("outw")) \
        .localCheckpoint(eager=True)

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        with_out = ranks.join(
            outw, ranks["node"] == outw["e_src"], "left")
        # rank mass on dangling nodes (no out-edges) — ONE scalar
        dangling = with_out.filter(F.col("outw").isNull()) \
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0))).first()[0]
        contribs = (e.join(ranks, e["e_src"] == ranks["node"])
                    .select(F.col("e_dst").alias("node"),
                            (F.col("rank") * F.col("w")).alias("num"),
                            "e_src"))
        contribs = contribs.join(outw, "e_src") \
            .select("node", (F.col("num") / F.col("outw")).alias("contrib"))
        summed = contribs.groupBy("node").agg(
            F.sum("contrib").alias("in_mass"))
        ranks = (nodes.join(summed, "node", "left")
                 .select(
                     "node",
                     (F.lit((1.0 - damping) / n)
                      + F.lit(damping)
                      * (F.coalesce(F.col("in_mass"), F.lit(0.0))
                         + F.lit(dangling / n))).alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks
