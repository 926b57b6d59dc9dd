"""Spatial autocorrelation — global Moran's I, LISA cluster quadrants, and
Getis-Ord-style star sums over a gridded density surface.

The hotspot-analytics layer on top of the density rollups: "is web-doc
density spatially CLUSTERED (hot regions next to hot regions), and which
cells are the hot/cold cores?" — the standard ESDA pair (Anselin's local
Moran quadrants + the global Moran statistic) over the repo's
equirectangular grid cells.

EXACTNESS DISCIPLINE. The study region is the set of OCCUPIED cells
(n = |cells|, S = Σx). Deviations are kept integral by scaling through n:

    u_i = n·x_i − S            (int64 — u_i = n·z_i for z_i = x_i − S/n)

Rook weights w_ij = 1 between occupied cells sharing a grid edge (lon
wraps at 2^res, lat does not). Every per-cell output is then exact
integer arithmetic: the neighbor sums Σ_j u_j / Σ_j x_j, the LISA
quadrant (pure sign tests on u_i and Σ_j u_j — HH/LL/HL/LH, ISO for
isolated cells), and the local Moran numerator

    local_num_i = u_i · Σ_{j∈N(i)} u_j

which is folded in DECIMAL(38,0) (each |u| ≤ n·x_max + S; the product
can pass 2^63 at corpus scale, and decimal folds are order-independent —
the repo's cross-engine float rule). The global statistic

    I = (n / W) · (Σ_i local_num_i) / (Σ_i u_i²)      (W = Σ_i |N(i)|)

has the n² scaling cancel between numerator and denominator, so the
u-scaled sums give the textbook I; it is computed as ONE double division
chain over the exact decimal sums, under round(, 6).

SCALE SHAPE: everything after the density rollup runs on the CELL table
(bounded by 4^res — metadata scale at fixed res): a 4-row offset explode,
one equi-join on (ix, iy), two small aggregations. At 100 TB the only
corpus-sized stage is the density groupBy the caller already owns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OFFSETS = [(1, 0), (-1, 0), (0, 1), (0, -1)]


def local_moran_cells(cells: DataFrame, res: int) -> DataFrame:
    """Per-cell ESDA over an occupied-cell density table (ix, iy, n_docs):

    (ix, iy, n_docs, n_nbrs, nbr_docs, star_docs, local_num, quadrant,
     moran_i_r)

    - nbr_docs  = Σ x_j over rook neighbors (exact int)
    - star_docs = x_i + nbr_docs (the Gi* focal sum, exact int)
    - local_num = u_i · Σ u_j in DECIMAL(38,0) (see module docstring)
    - quadrant  = HH/LL/HL/LH sign-quadrant, ISO when no neighbor exists
    - moran_i_r = global Moran's I, identical constant per row, round(,6)
    """
    n_lon = 1 << res
    stats = cells.agg(
        F.count(F.lit(1)).alias("n_cells"), F.sum("n_docs").alias("s_docs")
    )
    u = cells.crossJoin(F.broadcast(stats)).select(
        "ix", "iy", "n_docs", "n_cells",
        (F.col("n_cells") * F.col("n_docs") - F.col("s_docs")).alias("u"),
    )

    # rook edges via a 4-offset explode + equi-join on the neighbor cell
    # (lon wraps at 2^res; lat clamps, so no wrap on iy)
    offs = F.array(
        *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in _OFFSETS]
    )
    probes = (
        u.select("ix", "iy", F.explode(offs).alias("o"))
        .select(
            "ix", "iy",
            F.pmod(F.col("ix") + F.col("o.dx"), F.lit(n_lon)).alias("nix"),
            (F.col("iy") + F.col("o.dy")).alias("niy"),
        )
    )
    nbr = u.select(
        F.col("ix").alias("nix"), F.col("iy").alias("niy"),
        F.col("n_docs").alias("nx"), F.col("u").alias("nu"),
    )
    nbr_sums = (
        probes.join(nbr, ["nix", "niy"])
        .groupBy("ix", "iy")
        .agg(
            F.count(F.lit(1)).alias("n_nbrs"),
            F.sum("nx").alias("nbr_docs"),
            F.sum("nu").alias("nbr_u"),
        )
    )
    j = (
        u.join(nbr_sums, ["ix", "iy"], "left")
        .select(
            "ix", "iy", "n_docs", "n_cells", "u",
            F.coalesce("n_nbrs", F.lit(0)).alias("n_nbrs"),
            F.coalesce("nbr_docs", F.lit(0)).alias("nbr_docs"),
            F.coalesce("nbr_u", F.lit(0)).alias("nbr_u"),
        )
        .withColumn("local_num", F.col("u").cast("decimal(38,0)") * F.col("nbr_u"))
    )
    glob = j.agg(
        F.first("n_cells").alias("n_cells"),
        F.sum("n_nbrs").alias("w_sum"),
        F.sum("local_num").alias("num"),
        F.sum(F.col("u").cast("decimal(38,0)") * F.col("u")).alias("den"),
    ).select(
        # I is undefined with no edges (W=0) or a constant surface (den=0):
        # NULL on both engines, never a divide error (Spark runs ANSI)
        F.when(
            (F.col("w_sum") > 0) & (F.col("den") > 0),
            F.round(
                (F.col("n_cells").cast("double") / F.col("w_sum").cast("double"))
                * (F.col("num").cast("double") / F.col("den").cast("double")),
                6,
            ),
        ).alias("moran_i_r")
    )
    quadrant = (
        F.when(F.col("n_nbrs") == 0, F.lit("ISO"))
        .when((F.col("u") > 0) & (F.col("nbr_u") > 0), F.lit("HH"))
        .when((F.col("u") < 0) & (F.col("nbr_u") < 0), F.lit("LL"))
        .when(F.col("u") > 0, F.lit("HL"))
        .otherwise(F.lit("LH"))
    )
    return j.crossJoin(F.broadcast(glob)).select(
        "ix", "iy", "n_docs", "n_nbrs", "nbr_docs",
        (F.col("n_docs") + F.col("nbr_docs")).alias("star_docs"),
        "local_num",
        quadrant.alias("quadrant"),
        "moran_i_r",
    )


def sql_local_moran(pts_sql: str, res: int) -> str:
    """DuckDB oracle twin of local_moran_cells over a point CTE with
    (lon, lat) columns: identical binning, identical u-scaling, identical
    decimal folds, identical CASE order, identical double chain."""
    from erased_cells_spark.operators.cells_expr import sql_ix, sql_iy

    n_lon = 1 << res
    return f"""
WITH pts AS ({pts_sql}),
cells AS (
  SELECT {sql_ix('lon', res)} AS ix, {sql_iy('lat', res)} AS iy,
         count(*)::BIGINT AS n_docs
  FROM pts GROUP BY 1, 2
),
st AS (SELECT count(*)::BIGINT AS n_cells, sum(n_docs)::BIGINT AS s_docs FROM cells),
u AS (
  SELECT ix, iy, n_docs, st.n_cells,
         st.n_cells * n_docs - st.s_docs AS u
  FROM cells, st
),
probes AS (
  SELECT ix, iy,
         (((ix + o.dx) % {n_lon}) + {n_lon}) % {n_lon} AS nix,
         iy + o.dy AS niy
  FROM u CROSS JOIN (
    SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dx, dy)
  ) o
),
nbr_sums AS (
  SELECT p.ix, p.iy,
         count(*)::BIGINT AS n_nbrs,
         sum(v.n_docs)::BIGINT AS nbr_docs,
         sum(v.u)::BIGINT AS nbr_u
  FROM probes p JOIN u v ON v.ix = p.nix AND v.iy = p.niy
  GROUP BY 1, 2
),
j AS (
  SELECT u.ix, u.iy, u.n_docs, u.n_cells, u.u,
         coalesce(s.n_nbrs, 0) AS n_nbrs,
         coalesce(s.nbr_docs, 0) AS nbr_docs,
         coalesce(s.nbr_u, 0) AS nbr_u,
         CAST(u.u AS DECIMAL(38,0)) * coalesce(s.nbr_u, 0) AS local_num
  FROM u LEFT JOIN nbr_sums s ON s.ix = u.ix AND s.iy = u.iy
),
gstat AS (
  SELECT CASE WHEN sum(n_nbrs) > 0 AND sum(CAST(u AS DECIMAL(38,0)) * u) > 0
         THEN round(
           (any_value(n_cells)::DOUBLE / sum(n_nbrs)::DOUBLE)
           * (sum(local_num)::DOUBLE
              / sum(CAST(u AS DECIMAL(38,0)) * u)::DOUBLE),
           6) END AS moran_i_r
  FROM j
)
SELECT j.ix, j.iy, j.n_docs, j.n_nbrs, j.nbr_docs,
       j.n_docs + j.nbr_docs AS star_docs,
       j.local_num,
       CASE WHEN j.n_nbrs = 0 THEN 'ISO'
            WHEN j.u > 0 AND j.nbr_u > 0 THEN 'HH'
            WHEN j.u < 0 AND j.nbr_u < 0 THEN 'LL'
            WHEN j.u > 0 THEN 'HL'
            ELSE 'LH' END AS quadrant,
       gstat.moran_i_r
FROM j, gstat
"""


# ------------------------------------------------------------ Ripley's K ---
_EARTH_R_KM = 6371.0088
# injected as the SAME literal into Spark and the SQL oracle so the
# normalization constant is bit-identical (computing 4*pi*R^2 in each
# engine separately would still agree, but a shared literal removes the
# question entirely)
SPHERE_AREA_KM2 = 4.0 * 3.141592653589793 * _EARTH_R_KM * _EARTH_R_KM
PI = 3.141592653589793


def ripley_k(
    pts: DataFrame,
    radii_km: list[float],
    *,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Ripley's K at multiple radii over a global (spherical) point set:
    for each r, the count of unordered pairs within r great-circle km,
    the K estimate, the CSR (complete spatial randomness) expectation,
    and their ratio — the second-order clustering statistic that says
    HOW MUCH more often points co-occur within r than chance, as a
    function of scale (Moran tells you THAT density clusters; K tells
    you at WHICH radii).

        K_hat(r) = A * 2*pairs(r) / (n*(n-1))     (A = sphere area)
        CSR K(r) = 2*pi*R^2*(1 - cos(r/R))        (spherical cap area)

    ratio > 1: clustered at that scale; < 1: dispersed/inhibited.

    Plan: ONE radius_pairs call at max(radii) — the exactly-once banded
    equi-join — then conditional counts per radius from the same pair
    table (one aggregate row, fanned to |radii| result rows). Pair
    counts are exact ints; each statistic is a short shared-literal
    double chain under round(,4)/(,6). O(|radii|) extra cost over the
    single-radius join; no second shuffle."""
    from erased_cells_spark.operators.radius import radius_pairs

    if not radii_km or any(r <= 0 for r in radii_km):
        raise ValueError("radii_km must be positive")
    rmax = max(radii_km)
    pairs = radius_pairs(pts, rmax, id_col=id_col, lon_col=lon_col, lat_col=lat_col)
    n_pts = pts.select(F.count(F.lit(1)).alias("n"))
    agg = pairs.agg(
        *[
            F.sum((F.col("dist_km") <= F.lit(float(r))).cast("long")).alias(f"p{i}")
            for i, r in enumerate(radii_km)
        ]
    ).crossJoin(F.broadcast(n_pts))
    import math

    per_radius = []
    for i, r in enumerate(radii_km):
        csr = 2.0 * PI * _EARTH_R_KM * _EARTH_R_KM * (1.0 - math.cos(r / _EARTH_R_KM))
        k_hat = (
            F.lit(SPHERE_AREA_KM2)
            * (F.col(f"p{i}").cast("double") * 2.0)
            / (F.col("n").cast("double") * (F.col("n").cast("double") - 1.0))
        )
        per_radius.append(
            agg.select(
                F.lit(float(r)).alias("r_km"),
                F.col("n").alias("n_pts"),
                F.col(f"p{i}").alias("n_pairs"),
                F.round(k_hat, 4).alias("k_hat_r"),
                F.lit(round(csr, 4)).alias("csr_k_r"),
                F.round(k_hat / F.lit(csr), 6).alias("clustering_ratio_r"),
            )
        )
    out = per_radius[0]
    for df in per_radius[1:]:
        out = out.unionAll(df)
    return out
