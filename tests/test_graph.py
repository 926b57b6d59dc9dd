"""Graph operators (operators/graph.py): PageRank against a hand-computed
reference (including a zero-in-degree vertex the left-join floor must keep),
triangle counting on known graphs, and the generated-graph premises the
oracle twins rely on. Cross-engine parity runs in test_oracle_twins."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.graph import (
    EDGE_FAMILIES,
    doc_link_edges,
    pagerank,
    triangle_count,
)


def _pagerank_np(n, edges, n_iter=10, d=0.85):
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1.0 - d) / n)
        for s, t in edges:
            nxt[t] += d * r[s] / out[s]
        r = nxt
    return r


def test_pagerank_matches_reference_with_dangling_in_vertex(spark):
    # vertex 3 has NO in-edges: it must keep the (1-d)/n floor every
    # iteration (the left-join-back-to-nodes path)
    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (3, 1)]
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id BIGINT")
    edf = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {r.id: r.rank for r in pagerank(nodes, edf, n_iter=10).collect()}
    want = _pagerank_np(4, edges)
    for i in range(4):
        assert got[i] == pytest.approx(want[i], rel=1e-12)
    assert got[3] == pytest.approx((1.0 - 0.85) / 4.0)
    assert sum(got.values()) < 1.0  # no dangling-mass redistribution (doc'd)


def test_pagerank_rejects_empty_nodes(spark):
    nodes = spark.createDataFrame([], "id BIGINT")
    edges = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    with pytest.raises(ValueError):
        pagerank(nodes, edges)


def test_triangle_count_known_graphs(spark):
    # K4 has 4 triangles; direction/duplication must not matter
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    edf = spark.createDataFrame(k4, "src BIGINT, dst BIGINT")
    tris = {(r.a, r.b, r.c) for r in triangle_count(edf).collect()}
    assert tris == {(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)}
    # a 4-cycle has none
    c4 = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src BIGINT, dst BIGINT"
    )
    assert triangle_count(c4).count() == 0


def test_generated_graph_premises(spark):
    """The twin oracles' premises on the generated graph: full in-degree
    coverage (recursive-CTE PageRank drops uncovered vertices) and a
    non-vacuous triangle surface (the ring-successor families)."""
    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    edges = doc_link_edges(docs, 500)
    assert edges.select("dst").distinct().count() == 500
    assert edges.filter(F.col("src") == F.col("dst")).count() == 0
    assert triangle_count(edges).count() >= 500  # one per ring vertex
    assert any(m == 1 for m, _ in EDGE_FAMILIES)  # successor families present
