"""Clustering-coefficient contracts (operators/graph.
clustering_coefficient): triangle=1.0, path=0.0, star=0.0, a clique, and
deg<2 exclusion. Cross-engine parity is the graph_clustering_top twin."""

from erased_cells_spark.operators.graph import clustering_coefficient


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.id: (r.deg, r.n_tri, round(r.coeff, 9))
        for r in clustering_coefficient(df).collect()
    }


def test_triangle_is_one(spark):
    got = _run(spark, [(0, 1), (1, 2), (2, 0)])
    assert got == {0: (2, 1, 1.0), 1: (2, 1, 1.0), 2: (2, 1, 1.0)}


def test_path_and_star_are_zero(spark):
    got = _run(spark, [(0, 1), (1, 2), (2, 3)])
    assert got[1] == (2, 0, 0.0) and got[2] == (2, 0, 0.0)
    assert 0 not in got and 3 not in got  # deg 1 excluded
    star = _run(spark, [(9, i) for i in range(4)])
    assert star == {9: (4, 0, 0.0)}


def test_clique_minus_one_edge(spark):
    # K4 minus edge (2,3): vertices 0,1 keep coeff 2*2/(3*2)=2/3;
    # vertices 2,3 have deg 2 and one triangle -> 1.0
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]
    got = _run(spark, edges)
    assert got[0] == (3, 2, round(2 / 3, 9))
    assert got[1] == (3, 2, round(2 / 3, 9))
    assert got[2] == (2, 1, 1.0) and got[3] == (2, 1, 1.0)


def test_directed_duplicates_collapse(spark):
    # both directions + repeats are one undirected edge
    got = _run(spark, [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2), (0, 2)])
    assert got == {0: (2, 1, 1.0), 1: (2, 1, 1.0), 2: (2, 1, 1.0)}
