"""Flagship pipeline: pages → extract → geocode → cell-encode → PIP join →
zonal counts (SURVEY.md §7.3 — exercises scan, UDF, broadcast join, shuffle,
agg in one plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erased_cells_spark.functions.geocode import geocode_lat, geocode_lon, host_of
from erased_cells_spark.functions.text import extract_text
from erased_cells_spark.operators.pip import pip_join
from erased_cells_spark.spatial.geom import make_polygon_fixtures


def geocoded_pages(pages: DataFrame, use_extracted_text: bool = True) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → + host, extracted, lon, lat.

    Extraction is the one pandas UDF; geocode is pure builtins so Catalyst
    keeps pruning/pushdown through it.
    """
    df = pages.withColumn("host", host_of(F.col("url")))
    if use_extracted_text:
        df = df.withColumn("extracted", extract_text(F.col("html")))
    return df.withColumn("lon", geocode_lon(F.col("host"))).withColumn(
        "lat", geocode_lat(F.col("host"))
    )


def flagship_zone_counts(
    pages: DataFrame, polygons: list[dict] | None = None, res: int = 8
) -> DataFrame:
    """Per-polygon page counts + distinct hosts, ordered by zone."""
    polys = polygons if polygons is not None else make_polygon_fixtures(64, seed=42)
    pts = geocoded_pages(pages, use_extracted_text=False).select("url", "host", "lon", "lat")
    joined = pip_join(pts, polys, res=res)
    return (
        joined.groupBy("poly_id")
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct("host").alias("n_hosts"),
        )
        .orderBy("poly_id")
    )


def flagship_with_invariant(pages: DataFrame, polygons: list[dict] | None = None, res: int = 8):
    """Fused single-scan flagship: the extraction byte-identity invariant is
    computed via Observation DURING the PIP aggregation pass — no second scan
    of the heavy html/text columns. Returns (result_df, observation); read
    observation.get["bad_extractions"] AFTER an action on the result.
    """
    from pyspark.sql import Observation

    polys = polygons if polygons is not None else make_polygon_fixtures(64, seed=42)
    obs = Observation("invariants")
    g = geocoded_pages(pages, use_extracted_text=True).observe(
        obs,
        F.sum(
            F.when(F.col("extracted") != F.col("text"), F.lit(1)).otherwise(F.lit(0))
        ).alias("bad_extractions"),
        F.count(F.lit(1)).alias("rows_in"),
    )
    pts = g.select("url", "host", "lon", "lat")
    joined = pip_join(pts, polys, res=res)
    out = (
        joined.groupBy("poly_id")
        .agg(F.count("*").alias("n_pages"), F.countDistinct("host").alias("n_hosts"))
        .orderBy("poly_id")
    )
    return out, obs
