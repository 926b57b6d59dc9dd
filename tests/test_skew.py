"""Salted aggregation correctness (exact decomposition) and skew evidence:
the zipfian generator really produces hot cells, and salting spreads them."""

import numpy as np
from pyspark.sql import functions as F

from erased_cells_spark.operators.cells_expr import cell_key_expr
from erased_cells_spark.pipeline import geocoded_pages
from erased_cells_spark.plans.skew import salted_agg_counts, with_salt
from erased_cells_spark.sources.pages import generate_pages


class TestSkew:
    def test_salted_counts_exact(self, spark):
        pages = generate_pages(spark, 20_000).cache()
        pts = geocoded_pages(pages, use_extracted_text=False).withColumn(
            "cell", cell_key_expr(F.col("lon"), F.col("lat"), 6)
        )
        plain = {r.cell: r.n for r in pts.groupBy("cell").agg(F.count("*").alias("n")).collect()}
        salted = {r.cell: r.n for r in salted_agg_counts(pts, ["cell"], "url", 16).collect()}
        assert plain == salted

    def test_hot_cells_exist_and_salt_spreads(self, spark):
        pages = generate_pages(spark, 20_000)
        pts = geocoded_pages(pages, use_extracted_text=False).withColumn(
            "cell", cell_key_expr(F.col("lon"), F.col("lat"), 6)
        )
        counts = pts.groupBy("cell").count().collect()
        sizes = sorted((r["count"] for r in counts), reverse=True)
        # zipf(1.2) over 1000 hosts: the hottest cell dwarfs the median
        assert sizes[0] > 20 * np.median(sizes)
        # after salting, the max (cell, salt) group is ~1/16 of the hot cell
        salted = with_salt(pts, "url", 16).groupBy("cell", "_salt").count().collect()
        max_salted = max(r["count"] for r in salted)
        assert max_salted < sizes[0] / 4  # conservatively: ≥4× spread
