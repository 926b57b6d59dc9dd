"""Temporal reachability contracts (operators/graph.
temporal_reachability): time-respecting vs static reachability on a
hand-built contact chain (the backwards-in-time path must NOT
transmit), earliest-arrival minimality, multi-source, and the
convergence guard. Cross-engine parity is the user_temporal_reach twin."""

import pytest

from erased_cells_spark.operators.graph import temporal_reachability


def _run(spark, edges, seeds, **kw):
    e = spark.createDataFrame(edges, "src long, dst long, t long")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    return {r.id: r.arr for r in temporal_reachability(e, s, **kw).collect()}


def test_backwards_contact_does_not_transmit(spark):
    # 0 -(t=10)-> 1 -(t=5)-> 2: the 1->2 contact happened BEFORE 1 was
    # reached, so 2 is NOT reachable; static reachability would say yes
    got = _run(spark, [(0, 1, 10), (1, 2, 5)], [0])
    assert got == {0: 0, 1: 10}


def test_earliest_arrival_over_alternative_paths(spark):
    # two routes to 3: via 1 (arrive 20) and via 2 (arrive 15)
    edges = [(0, 1, 5), (1, 3, 20), (0, 2, 7), (2, 3, 15)]
    got = _run(spark, edges, [0])
    assert got[3] == 15 and got[1] == 5 and got[2] == 7


def test_equal_time_chain_transmits(spark):
    # t >= arrival: a same-instant relay is allowed (meeting convention)
    got = _run(spark, [(0, 1, 9), (1, 2, 9)], [0])
    assert got == {0: 0, 1: 9, 2: 9}


def test_multi_source_min(spark):
    edges = [(0, 5, 50), (1, 5, 30)]
    got = _run(spark, edges, [0, 1])
    assert got[5] == 30


def test_convergence_guard(spark):
    with pytest.raises(RuntimeError, match="converge"):
        # a 5-hop chain cannot converge in 2 rounds
        _run(
            spark,
            [(i, i + 1, i + 1) for i in range(5)],
            [0],
            max_rounds=2,
        )
