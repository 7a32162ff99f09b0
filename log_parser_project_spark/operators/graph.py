"""Iterative graph algorithms as Spark join loops.

Sibling of the distributed connected components in
``operators/dedup.py`` (min-label propagation + path halving): the
same driver-side loop discipline — each iteration is ONE join + ONE
aggregate over the edge list, ``localCheckpoint`` cuts lineage so the
plan does not grow with iterations, and driver state is O(1).

Exactness discipline: ranks are maintained as BIGINT e9 fixed-point
with truncating division at every step, so a fixed iteration count
produces bit-identical results at any parallelism AND in any engine —
a DuckDB oracle replays the recurrence with unrolled CTEs where a
float PageRank would drift with partial-sum order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E9 = 1_000_000_000


def pagerank_e9(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over a directed edge list, exact e9 fixed-point.

    Recurrence (all integer; total mass E9):

        r_0(v)     = E9 div N
        r_{t+1}(v) = (E9·(100−damping_pct) div 100) div N
                     + damping_pct · Σ_{u→v} (r_t(u) div outdeg(u)) div 100

    Dangling nodes (no out-edges) receive rank but their mass is not
    redistributed — the drop is deterministic and identical in any
    engine, which is the property the oracle needs; at 100 TB the
    variant choice changes scores, not the execution shape. Per
    iteration: one broadcast-or-shuffle join of ranks onto edges and
    one sum by destination — shuffle ∝ edges, driver state O(1),
    lineage cut per iteration. Returns ``(node, rank_e9)``.
    """
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank_e9: empty graph")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint()
    base = (E9 * (100 - damping_pct) // 100) // n
    ranks = nodes.withColumn("rank_e9", F.lit(E9 // n).cast("long"))
    for _ in range(iters):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_e9 div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
                )
                .cast("long")
                .alias("rank_e9"),
            )
            .localCheckpoint()
        )
    return ranks
