"""BFS shortest hops (operators/graph.bfs_hops): hand graphs (chain,
cycle, diamond, disconnected), python-BFS brute equivalence on a random
graph, multi-source minimality, early-exit, and validation. Cross-engine
identity is proven by the graph_bfs_hops twin."""

from collections import deque

import numpy as np
import pytest

from erased_cells_spark.operators.graph import bfs_hops


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src LONG, dst LONG")


def sources_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id LONG")


def run(spark, pairs, srcs, max_hops):
    out = bfs_hops(edges_df(spark, pairs), sources_df(spark, srcs), max_hops)
    return {r["id"]: r["hops"] for r in out.collect()}


def python_bfs(pairs, srcs, max_hops):
    adj: dict = {}
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in srcs}
    q = deque(srcs)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_chain_cycle_diamond(spark):
    # chain 0->1->2->3, cycle 3->0, diamond 1->4, 2->4 (4 at hops 2)
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 4), (2, 4)]
    assert run(spark, pairs, [0], 10) == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2}


def test_hop_cap_and_disconnected(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (7, 8)]  # 7->8 unreachable from 0
    got = run(spark, pairs, [0], 2)
    assert got == {0: 0, 1: 1, 2: 2}


def test_multi_source_min(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (9, 3)]
    got = run(spark, pairs, [0, 9], 10)
    assert got[3] == 1  # via source 9, not hops 3 via 0


def test_matches_python_bfs_random(spark):
    rng = np.random.default_rng(17)
    n = 200
    pairs = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, n, 600), rng.integers(0, n, 600))
            if a != b
        }
    )
    for cap in (0, 1, 3, 6):
        assert run(spark, pairs, [0, 1], cap) == python_bfs(pairs, [0, 1], cap)


def test_validation(spark):
    with pytest.raises(ValueError):
        run(spark, [(0, 1)], [0], -1)


# ---------------------------------------------------------- bellman-ford --
from erased_cells_spark.operators.graph import bellman_ford  # noqa: E402


def wedges_df(spark, triples):
    return spark.createDataFrame(triples, "src LONG, dst LONG, w LONG")


def run_bf(spark, triples, srcs, rounds):
    out = bellman_ford(wedges_df(spark, triples), sources_df(spark, srcs), rounds)
    return {r["id"]: r["cost"] for r in out.collect()}


def python_bf(triples, srcs, rounds):
    dist = {s: 0 for s in srcs}
    for _ in range(rounds):
        new = dict(dist)
        for s, d, w in triples:
            if s in dist and dist[s] + w < new.get(d, 1 << 60):
                new[d] = dist[s] + w
        if new == dist:
            break
        dist = new
    return dist


def test_bf_cheaper_long_path_beats_short(spark):
    # direct edge cost 10 vs 3-hop path cost 3: enough rounds finds 3
    triples = [(0, 9, 10), (0, 1, 1), (1, 2, 1), (2, 9, 1)]
    assert run_bf(spark, triples, [0], 1)[9] == 10
    assert run_bf(spark, triples, [0], 3)[9] == 3


def test_bf_matches_python_random(spark):
    import numpy as np

    rng = np.random.default_rng(23)
    n = 150
    triples = list(
        {
            (int(a), int(b), int(w))
            for a, b, w in zip(
                rng.integers(0, n, 500), rng.integers(0, n, 500), rng.integers(1, 9, 500)
            )
            if a != b
        }
    )
    for rounds in (0, 1, 4):
        assert run_bf(spark, triples, [0, 1], rounds) == python_bf(triples, [0, 1], rounds)


def test_bf_fixpoint_early_exit_is_exact(spark):
    # rounds far beyond the diameter: result equals the converged table
    triples = [(0, 1, 2), (1, 2, 2), (2, 3, 2)]
    assert run_bf(spark, triples, [0], 50) == {0: 0, 1: 2, 2: 4, 3: 6}


def test_bf_validation(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        run_bf(spark, [(0, 1, 1)], [0], -1)


# ------------------------------------------------------------ dag depth --
from erased_cells_spark.operators.graph import dag_depth  # noqa: E402


def run_depth(spark, pairs, **kw):
    out = dag_depth(edges_df(spark, pairs), **kw)
    return {r["id"]: r["depth"] for r in out.collect()}


def test_dag_depth_hand_case(spark):
    # diamond with a long arm: 0->1->2->4, 0->3->4, 5 isolated source via 5->4
    pairs = [(0, 1), (1, 2), (2, 4), (0, 3), (3, 4), (5, 4)]
    assert run_depth(spark, pairs) == {0: 0, 1: 1, 2: 2, 3: 1, 4: 3, 5: 0}


def test_dag_depth_matches_python(spark):
    import numpy as np

    rng = np.random.default_rng(29)
    pairs = list(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in zip(rng.integers(0, 80, 300), rng.integers(0, 80, 300))
            if a != b
        }
    )
    # python longest-path relaxation over the (acyclic: src < dst) edges
    depth = {v: 0 for e in pairs for v in e}
    changed = True
    while changed:
        changed = False
        for s, d in pairs:
            if depth[s] + 1 > depth[d]:
                depth[d] = depth[s] + 1
                changed = True
    assert run_depth(spark, pairs) == depth


def test_dag_depth_cycle_fails_loud(spark):
    with pytest.raises(ValueError, match="cycle"):
        run_depth(spark, [(0, 1), (1, 2), (2, 0)], max_rounds=10)
