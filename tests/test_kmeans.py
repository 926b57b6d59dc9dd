"""Quantized-exact k-means (operators/kmeans.py). The assignment step's
cross-engine identity is proven by the emb_kmeans_assign twin; here:
blob recovery, repartition determinism, monotone quantized WCSS,
empty-cluster survival, and argument validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.kmeans import kmeans_assign, kmeans_fit, quantized_vec


@pytest.fixture(scope="module")
def blobs(spark):
    """Three well-separated gaussian blobs of 60 points in 8-D."""
    rng = np.random.default_rng(3)
    rows = []
    for b, center in enumerate([0.0, 5.0, -5.0]):
        for i in range(60):
            vec = (rng.normal(center, 0.3, size=8)).astype("float32").tolist()
            rows.append((b * 60 + i, vec, b))
    return spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>, true_blob INT"
    ).cache()


def test_recovers_separated_blobs(spark, blobs):
    out = kmeans_fit(blobs, k=3, iters=10)
    a = out["assignments"].join(blobs.select("vec_id", "true_blob"), "vec_id")
    # every true blob maps to exactly one cluster and vice versa
    m = a.groupBy("true_blob").agg(F.countDistinct("cluster").alias("n")).collect()
    assert all(r["n"] == 1 for r in m)
    m2 = a.groupBy("cluster").agg(F.countDistinct("true_blob").alias("n")).collect()
    assert all(r["n"] == 1 for r in m2) and len(m2) == 3


def test_wcss_monotone_nonincreasing(spark, blobs):
    out = kmeans_fit(blobs, k=3, iters=8)
    w = out["wcss"]
    assert all(w[i + 1] <= w[i] for i in range(len(w) - 1)), w


def test_deterministic_across_partitionings(spark, blobs):
    a = kmeans_fit(blobs, k=3, iters=5)["assignments"].orderBy("vec_id").collect()
    b = (
        kmeans_fit(blobs.repartition(13), k=3, iters=5)["assignments"]
        .orderBy("vec_id")
        .collect()
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_assignment_tie_break_on_smaller_cid(spark):
    vecs = spark.createDataFrame([(0, [0, 0])], "vec_id LONG, v ARRAY<LONG>")
    cents = spark.createDataFrame(
        [(1, [3, 4]), (2, [5, 0]), (0, [0, 5])], "cid LONG, cv ARRAY<LONG>"
    )
    r = kmeans_assign(vecs, cents).collect()[0]
    assert (r["cluster"], r["dist"]) == (0, 25)  # three-way tie at 25 -> min cid


def test_empty_cluster_keeps_centroid(spark):
    # k=3 over 2 distinct points: one seed never wins; fit must not crash
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [0.0, 0.0])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    out = kmeans_fit(df, k=3, iters=4)
    assert out["assignments"].count() == 3
    assert len(out["centroids"]) == 3


def test_validation(spark, blobs):
    with pytest.raises(ValueError):
        kmeans_fit(blobs, k=0)
    with pytest.raises(ValueError, match="only"):
        kmeans_fit(blobs.limit(2), k=5)


def test_quantization_is_exact_roundtrip(spark):
    df = spark.createDataFrame(
        [(0, [0.1234565, -0.9999995, 2.5e-07])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    v = df.select(quantized_vec(F.col("embedding")).alias("v")).collect()[0]["v"]
    # float32 values quantized via exact double multiply + half-away round
    import numpy as np

    f32 = np.array([0.1234565, -0.9999995, 2.5e-07], dtype="float32").astype("float64")
    expect = [int(np.floor(abs(x) * 1e6 + 0.5) * (1 if x >= 0 else -1)) for x in f32]
    assert v == expect
