"""HITS contracts (operators/graph.hits): python-reference equivalence of
the integer Jacobi iterates on random digraphs, the hub/authority
asymmetry on a star, and zero-degree handling. Cross-engine parity is
the graph_hits_top twin."""

import random

from erased_cells_spark.operators.graph import hits


def _reference(n, edges, iters):
    hub = {v: 1 for v in range(n)}
    auth = {v: 1 for v in range(n)}
    for _ in range(iters):
        na = {v: 0 for v in range(n)}
        nh = {v: 0 for v in range(n)}
        for u, v in edges:
            na[v] += hub[u]
            nh[u] += auth[v]
        hub, auth = nh, na
    return hub, auth


def _run(spark, n, edges, iters):
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.id: (r.hub, r.auth) for r in hits(nodes, e, n_iter=iters).collect()
    }


def test_matches_reference_on_random_digraph(spark):
    rng = random.Random(17)
    n = 40
    edges = list(
        {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(150)
        }
    )
    edges = [(u, v) for u, v in edges if u != v]
    got = _run(spark, n, edges, 5)
    hub, auth = _reference(n, edges, 5)
    assert got == {v: (hub[v], auth[v]) for v in range(n)}


def test_star_separates_hubs_from_authorities(spark):
    # 0 -> 1..4: node 0 is a pure hub, 1..4 pure authorities
    edges = [(0, i) for i in range(1, 5)]
    got = _run(spark, 5, edges, 4)
    assert got[0][1] == 0 and got[0][0] > 0  # hub only
    assert all(got[i][0] == 0 and got[i][1] > 0 for i in range(1, 5))
    hub, auth = _reference(5, edges, 4)
    assert got == {v: (hub[v], auth[v]) for v in range(5)}


def test_isolated_node_scores_zero(spark):
    got = _run(spark, 3, [(0, 1)], 3)
    assert got[2] == (0, 0)
