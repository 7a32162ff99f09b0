"""Fixed-point PageRank (operators/graph.py): exact replay against a
pure-python reference on a crafted graph, parallelism invariance, and
argument guards. The oracle-value pin runs in test_duckdb_parity.py
(q_graph_pagerank)."""

import pytest
from pyspark.sql import functions as F

from log_parser_project_spark.operators.graph import E9, pagerank_e9

EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3),  # 4 → 3 → 1 cycle w/ fan
]


def _python_pagerank(edges, iters, damping_pct=85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    base = (E9 * (100 - damping_pct) // 100) // n
    r = {v: E9 // n for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {v: base + (damping_pct * s[v]) // 100 for v in nodes}
    return r


def test_pagerank_matches_python_replay(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    for iters in (1, 3):
        got = {r.node: r.rank_e9
               for r in pagerank_e9(df, iters=iters).collect()}
        assert got == _python_pagerank(EDGES, iters)


def test_pagerank_is_parallelism_invariant(spark):
    df = spark.createDataFrame(EDGES * 3, "src long, dst long")  # dup edges
    a = sorted(tuple(r) for r in pagerank_e9(df, iters=2).collect())
    b = sorted(tuple(r) for r in
               pagerank_e9(df.repartition(7), iters=2).collect())
    assert a == b == sorted(_python_pagerank(EDGES, 2).items())


def test_pagerank_sink_accumulates_and_mass_bounded(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {r.node: r.rank_e9 for r in pagerank_e9(df, iters=5).collect()}
    # nodes 1 and 3 sit on the cycle fed by every edge: both outrank 2
    assert min(got[1], got[3]) > got[2]
    # node 4 is a source (no in-edges): exactly the teleport mass
    assert got[4] == (E9 * 15 // 100) // 4
    assert got[4] == min(got.values())
    # total mass never exceeds E9 (dangling drop + truncation only lose)
    assert sum(got.values()) <= E9


def test_pagerank_guards(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank_e9(df, damping_pct=100)
    with pytest.raises(ValueError, match="empty graph"):
        pagerank_e9(df.filter(F.lit(False)))
