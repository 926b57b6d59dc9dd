"""Deterministic cross-engine KMV (k-minimum-values / bottom-k theta)
distinct sketches — the set-operation counterpart of the HLL module
(functions/cardinality.py).

HLL registers union by max, which makes them perfect for distinct COUNTS
but structurally unable to estimate INTERSECTIONS (max-merge destroys
the sample identity). KMV keeps the k smallest distinct hash values
themselves, so sketches support the full set algebra a corpus-overlap
dashboard needs (shared-vocabulary, cross-snapshot audience overlap,
contamination screens): union = bottom-k of the merged hash sets,
theta = the union's k-th smallest hash, and the classic estimators

    n_hat(S)        = (k - 1) * 2^60 / h_k          (h_k = k-th min hash)
    jaccard_hat     = |bottom-k(A ∪ B) ∩ A ∩ B| / k
    intersect_hat   = jaccard_hat * n_hat(A ∪ B)

Engine neutrality: the hash is the shared md5-60-bit idiom (first 15
hex chars, always positive in int64); every ranking, threshold, and
membership test is pure int64; the ONLY floats are the final estimator
divides over exact integers, which are single IEEE ops both engines
perform identically (never divide the 60-bit hash itself — that is the
documented double-corruption trap; the estimator numerator (k-1)*2^60
is a shared literal, so even its representation rounding is identical).
Groups with fewer than k distinct values are EXACT (the sketch holds
every hash; n_hat short-circuits to the true distinct count).

Relative error ~1/sqrt(k-2) for the distinct estimate (k=64: ~13%);
intersection error compounds with the Jaccard binomial term — standard
KMV behavior (Beyer et al., SIGMOD'07, public literature).

Scale shape (100 TB): one distinct-shuffle on (group, hash) with
map-side partial dedup, then a per-group window bounded by the distinct
count. The sketch table is (|groups| * k) rows of pure int64 — metadata
scale — and persists as a normal table; merging day-shards is a union +
re-rank, never a rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_BITS = 60
_HASH_SPAN = float(1 << _HASH_BITS)  # shared literal; exact in double


def hash60(col) -> "F.Column":
    """The repo's engine-neutral 60-bit hash: first 15 md5 hex chars."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_sketch(df: DataFrame, col: str, group_cols: list[str], k: int = 64) -> DataFrame:
    """The sketch: per group, the k smallest DISTINCT hash values with
    their rank — (group_cols..., hv, rank). Mergeable: union sketch
    tables, re-dedup, re-rank, refilter to k."""
    if k < 2:
        raise ValueError("k must be >= 2")
    hashed = df.select(*group_cols, hash60(F.col(col)).alias("hv")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("hv")
    return (
        hashed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """(group_cols..., kmv_estimate_r): (k-1)*2^60 / h_k when the sketch
    is full, the exact distinct count when it is not (fewer than k
    distinct values means every hash is present)."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("n_hashes"),
        F.max(F.when(F.col("rank") == k, F.col("hv"))).alias("h_k"),
    )
    est = F.when(
        F.col("n_hashes") < k, F.col("n_hashes").cast("double")
    ).otherwise(F.lit((k - 1) * _HASH_SPAN) / F.col("h_k").cast("double"))
    return agg.select(*group_cols, F.round(est, 4).alias("kmv_estimate_r"))


def kmv_pair_overlap(
    sketch: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """Pairwise set-overlap estimates between every pair of groups
    (a < b) from one sketch table:

      (group_a, group_b, est_union_r, est_jaccard_r, est_intersect_r)

    Union sketch = bottom-k of the two hash sets' union (dedup by hv —
    identical values hash identically); theta = its k-th min;
    jaccard_hat = fraction of the union sketch's hashes present in BOTH
    input sketches. When the union has fewer than k distinct hashes the
    union estimate is exact and jaccard is the exact ratio over all of
    them. All counts are exact ints; each estimator is one divide /
    multiply over exact ints under round(,4)."""
    a = sketch.select(
        F.col(group_col).alias("group_a"), "hv", F.lit(1).alias("in_a")
    )
    b = sketch.select(
        F.col(group_col).alias("group_b"), "hv", F.lit(1).alias("in_b")
    )
    # pair every group with every later group (the group list is
    # metadata-small — sources, days, shards), then full-outer the two
    # sketches per pair on hv; identical members collide exactly
    pairs = (
        a.select("group_a").distinct()
        .crossJoin(b.select("group_b").distinct())
        .filter(F.col("group_a") < F.col("group_b"))
    )
    ga = F.broadcast(pairs).join(a, "group_a").select("group_a", "group_b", "hv", "in_a")
    gb = F.broadcast(pairs).join(b, "group_b").select("group_a", "group_b", "hv", "in_b")
    u = (
        ga.join(gb, ["group_a", "group_b", "hv"], "full")
        .select(
            "group_a",
            "group_b",
            "hv",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
    )
    w = Window.partitionBy("group_a", "group_b").orderBy("hv")
    ranked = u.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    agg = ranked.groupBy("group_a", "group_b").agg(
        F.count("*").alias("n_u"),
        F.max(F.when(F.col("rank") == k, F.col("hv"))).alias("theta"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    est_union = F.when(
        F.col("n_u") < k, F.col("n_u").cast("double")
    ).otherwise(F.lit((k - 1) * _HASH_SPAN) / F.col("theta").cast("double"))
    jac = F.col("n_both").cast("double") / F.col("n_u").cast("double")
    return agg.select(
        "group_a",
        "group_b",
        F.round(est_union, 4).alias("est_union_r"),
        F.round(jac, 4).alias("est_jaccard_r"),
        F.round(jac * est_union, 4).alias("est_intersect_r"),
        F.col("n_both").alias("sketch_overlap"),
    )
