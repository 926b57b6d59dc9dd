"""Flow accumulation / watershed contracts (operators/raster.
d8_accumulation): python-reference equivalence on random forests (paths
long enough to force several doubling rounds), chain/star shapes, and
isolated sinks. Cross-engine parity is the raster_flow_accumulation twin."""

import random

from erased_cells_spark.operators.raster import d8_accumulation


def _flow_df(spark, succ: dict, docs: dict):
    rows = [
        (c, docs.get(c, 1), 0 if succ.get(c) is None else 1, succ.get(c))
        for c in succ
    ]
    return spark.createDataFrame(
        rows, "cell long, n_docs long, dir_code long, to_cell long"
    )


def _reference(succ: dict, docs: dict):
    out = {}
    ups = {c: 0 for c in succ}
    load = {c: 0 for c in succ}
    for c in succ:
        cur = succ[c]
        while cur is not None:
            ups[cur] += 1
            load[cur] += docs.get(c, 1)
            cur = succ[cur]
    for c in succ:
        cur = c
        while succ[cur] is not None:
            cur = succ[cur]
        out[c] = (docs.get(c, 1), ups[c], load[c], cur)
    return out


def _check(spark, succ, docs=None):
    docs = docs or {c: 1 for c in succ}
    got = {
        r.cell: (r.n_docs, r.n_upstream, r.docs_upstream, r.basin)
        for r in d8_accumulation(_flow_df(spark, succ, docs)).collect()
    }
    assert got == _reference(succ, docs)


def test_long_chain_forces_doubling_rounds(spark):
    # 20-node chain: needs ceil(log2(19)) = 5 doubling rounds
    succ = {i: i + 1 for i in range(19)} | {19: None}
    docs = {i: i + 10 for i in range(20)}
    _check(spark, succ, docs)


def test_star_and_isolated_sink(spark):
    succ = {1: 0, 2: 0, 3: 0, 0: None, 99: None}
    _check(spark, succ)


def test_random_forest_matches_reference(spark):
    rng = random.Random(11)
    # topological ids: each node drains to a strictly smaller id or is a pit
    succ = {0: None}
    for i in range(1, 120):
        succ[i] = rng.randrange(0, i) if rng.random() < 0.85 else None
    docs = {i: rng.randrange(1, 9) for i in succ}
    _check(spark, succ, docs)


def test_constraint_conf_restored(spark):
    prev = spark.conf.get("spark.sql.constraintPropagation.enabled", "true")
    d8_accumulation(
        _flow_df(spark, {1: 0, 0: None}, {0: 1, 1: 1})
    ).collect()
    assert spark.conf.get("spark.sql.constraintPropagation.enabled", "true") == prev
