"""Exact distributed DBSCAN over integer planar points — density-based
clustering with NO randomness and NO floats, so the full labeling (core
/ border / noise and every cluster id) is deterministic and
cross-engine reproducible:

  - neighbors: squared euclidean distance <= eps^2 in pure int64
    (coordinates quantized upstream; |coord| <= ~2^30 keeps dx^2+dy^2
    exact);
  - core points: |N_eps(p)| >= min_pts, COUNTING p itself (the common
    convention, stated);
  - clusters: connected components of the core-core neighbor graph,
    labeled by MIN core id (the engine's components convention);
  - border points: non-core within eps of >= 1 core, assigned to the
    MINIMUM cluster id among their neighboring cores (the classic
    DBSCAN order-dependence — which cluster claims a shared border
    point — is resolved deterministically instead of by scan order);
  - noise: everything else, cluster -1.

Plan: candidate neighbor pairs come from an eps-sized grid (each point
joins only its own cell's 3x3 neighborhood — one JVM explode + one
equi-join, no cross join), degree counts and border assignment are
groupBys on the pair list, and the component step is the shared
size-adaptive pointer-jumping operator. Skew: a dense blob makes its
cells hot exactly in proportion to its true neighbor count — the
output itself is quadratic there (DBSCAN's nature), not an artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erased_cells_spark.operators.components import connected_components


def _neighbor_pairs(pts: DataFrame, eps: int) -> DataFrame:
    """Ordered pairs (a, b), a != b, with |p_a - p_b|^2 <= eps^2 — BOTH
    directions, so per-a degree counts and border lookups are one
    groupBy. Grid cells of size eps: any neighbor lies in the 3x3 cell
    block, and emitting each POINT once per cell (not per pair) keeps
    the explode factor at 9 on one side only."""
    cx = F.expr(f"CAST(floor(x / {eps}) AS BIGINT)")
    cy = F.expr(f"CAST(floor(y / {eps}) AS BIGINT)")
    a = pts.select(
        F.col("id").alias("a"), F.col("x").alias("xa"), F.col("y").alias("ya"),
        cx.alias("cx"), cy.alias("cy"),
    )
    off = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    )
    probe = a.select("a", "xa", "ya", "cx", "cy", off.alias("o")).select(
        "a", "xa", "ya",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    b = pts.select(
        F.col("id").alias("b"), F.col("x").alias("xb"), F.col("y").alias("yb"),
        cx.alias("cx"), cy.alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        probe.join(b, ["cx", "cy"])
        .filter((F.col("a") != F.col("b")) & (d2 <= eps * eps))
        .select("a", "b")
    )


def dbscan(pts: DataFrame, eps: int, min_pts: int) -> DataFrame:
    """pts: (id, x, y) integer columns. Returns (id, role, cluster) with
    role in {'core', 'border', 'noise'} and cluster = min core id of the
    component (-1 for noise)."""
    if eps <= 0 or min_pts < 1:
        raise ValueError("eps must be positive and min_pts >= 1")
    pairs = _neighbor_pairs(pts, eps).localCheckpoint(eager=True)
    deg = pairs.groupBy("a").agg(F.count("*").alias("nbrs"))
    core = (
        pts.join(deg, pts["id"] == deg["a"], "left")
        .select("id", (F.coalesce(F.col("nbrs"), F.lit(0)) + 1 >= min_pts).alias("is_core"))
    ).localCheckpoint(eager=True)
    core_ids = core.filter("is_core").select(F.col("id").alias("cid"))
    cc_edges = (
        pairs.join(core_ids.withColumnRenamed("cid", "a"), "a")
        .join(core_ids.withColumnRenamed("cid", "b"), "b")
        .filter(F.col("a") < F.col("b"))
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
    )
    comp = connected_components(cc_edges)  # (node, component)
    # isolated cores (no core neighbor) are their own singleton cluster
    core_cluster = (
        core_ids.join(comp, core_ids["cid"] == comp["node"], "left")
        .select(
            F.col("cid"),
            F.coalesce(F.col("component"), F.col("cid")).alias("cluster"),
        )
    )
    # border: non-core -> min cluster among neighboring cores
    border = (
        pairs.join(core_cluster.withColumnRenamed("cid", "b"), "b")
        .groupBy("a")
        .agg(F.min("cluster").alias("b_cluster"))
    )
    out = (
        pts.select("id")
        .join(core.select("id", "is_core"), "id")
        .join(core_cluster.withColumnRenamed("cid", "id"), "id", "left")
        .join(border.withColumnRenamed("a", "id"), "id", "left")
    )
    role = (
        F.when(F.col("is_core"), F.lit("core"))
        .when(F.col("b_cluster").isNotNull(), F.lit("border"))
        .otherwise(F.lit("noise"))
    )
    clu = (
        F.when(F.col("is_core"), F.col("cluster"))
        .when(F.col("b_cluster").isNotNull(), F.col("b_cluster"))
        .otherwise(F.lit(-1))
    )
    return out.select("id", role.alias("role"), clu.cast("long").alias("cluster"))
