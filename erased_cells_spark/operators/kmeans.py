"""Distributed k-means over embedding columns — Lloyd's algorithm with a
QUANTIZED-EXACT assignment step.

Why quantize: the assignment argmin compares floating-point distance
sums, and float accumulation order differs across engines, partition
counts, and hardware — the classic source of non-reproducible k-means.
Here every vector is quantized once to integers (round(x * scale) as
BIGINT, identical on any IEEE engine since the multiply is one exact
double op and round-half-away-from-zero matches Spark's HALF_UP and
DuckDB's round), and distances are EXACT int64 sums — so an assignment
is bit-reproducible across engines, cluster sizes, and runs, with a
deterministic (dist, cluster-id) tie-break. Overflow: |x| <= 2000 after
a scale of 1e6 on unit-ish embeddings gives per-term <= (4e9)^2 — the
caller-visible bound is |quantized| <= ~3.7e8 per element at d=64
(sum d*(2m)^2 < 2^63); real embedding scales sit 3 orders below it.

Scale shape (100 TB of vectors): assignment is a crossJoin against a
BROADCAST k-row centroid table (k centroids always fit on an executor),
all arithmetic in JVM zip_with/aggregate expressions — no Python, no
shuffle; the only shuffle is the centroid update's groupBy(cluster, dim)
on k*d groups, and the per-iteration driver state is the k*d centroid
matrix (bounded, metadata-scale — the documented small-collect
contract, same as IVF/PQ training in similarity.py).

The single assignment step is twinned against DuckDB
(`emb_kmeans_assign` in queries.py) — exact integer equality, no
rounding anywhere. The iterative fit is contract-tested (blob recovery,
repartition determinism, monotone quantized-WCSS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SCALE = 1_000_000


def quantized_vec(vec_col, scale: int = DEFAULT_SCALE):
    """array<long> quantization of an array<float/double> column: one
    exact double multiply + round-half-away per element."""
    return F.transform(vec_col, lambda x: F.round(x.cast("double") * scale).cast("long"))


def _sq_dist(a, b):
    """Exact int64 squared distance between two array<long> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def kmeans_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    cent_id_col: str = "cid",
    cent_vec_col: str = "cv",
) -> DataFrame:
    """Assign every (id, quantized-vector) row to its nearest centroid —
    exact integer distances, ties broken on the smaller centroid id.
    `centroids` must be broadcast-small (k rows). Returns
    (id_col, cluster, dist)."""
    d = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "dist", _sq_dist(F.col(vec_col), F.col(cent_vec_col))
    )
    w = Window.partitionBy(id_col).orderBy("dist", cent_id_col)
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, F.col(cent_id_col).alias("cluster"), "dist")
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = DEFAULT_SCALE,
) -> dict:
    """Lloyd's k-means: seed with the k smallest ids' vectors (the
    deterministic convention every reproducible surface here uses), then
    alternate exact quantized assignment and mean-update. Each update
    collects only the k*d centroid matrix (metadata-scale). Returns
    {"assignments": DataFrame(id, cluster, dist), "centroids": [[...]],
    "wcss": [per-iteration quantized within-cluster sum of squares]}.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    q = df.select(id_col, quantized_vec(F.col(vec_col), scale).alias("v")).cache()
    seeds = q.orderBy(id_col).limit(k).collect()
    if len(seeds) < k:
        raise ValueError(f"k={k} but only {len(seeds)} vectors")
    cents = [[int(x) for x in r["v"]] for r in seeds]
    spark = df.sparkSession
    wcss = []
    assign = None
    for _ in range(max(1, iters)):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cid LONG, cv ARRAY<LONG>"
        )
        assign = kmeans_assign(q, cdf, id_col=id_col)
        joined = q.join(assign.select(id_col, "cluster", "dist"), id_col)
        wcss.append(joined.agg(F.sum("dist")).collect()[0][0])
        # mean update: explode to (cluster, dim, val), avg, re-quantize.
        # k*d groups — the collect is bounded by the centroid matrix size.
        upd = (
            joined.select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]  # empty clusters keep their centroid
        byc: dict = {}
        for r in upd:
            byc.setdefault(r["cluster"], {})[r["pos"]] = int(round(r["m"]))
        for c, dims in byc.items():
            for p, v in dims.items():
                new[c][p] = v
        if new == cents:
            break
        cents = new
    q.unpersist()
    return {"assignments": assign, "centroids": cents, "wcss": wcss}
