"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)     — flagship pipeline smoke on sf0.001.
queries()        — every implemented operator (SURVEY.md §2 Part B + the
                   training-data ops) as (spark, sf_dir) → DataFrame.
                   EXACTLY 50 registered (the driver artifact's window,
                   enforced by tests/test_inventory.py), highest-risk
                   first; exact quadratic ground truths live in
                   queries.TWIN_QUERIES (oracle-checked in pytest and via
                   `tools/check_oracles.py <sf> --twins`).
oracle_sql()     — a DuckDB twin for EVERY registered query (50/50 in
                   round 5, green at sf0.001/sf0.01/sf0.1):
                   winding-number PIP as an edge-crossing VALUES query,
                   simhash as md5 signature algebra in SQL, IVF with
                   data-derived centroids, LSH ANN + LSH near-dup with
                   literal hyperplanes, image-dHash near-dup clusters via
                   driver-computed hashes + a recursive reachability CTE,
                   as-of via DuckDB's native ASOF JOIN, multimodal with
                   inlined deterministic expected rows.
                   tests/test_inventory.py asserts queries() ≡ oracle_sql()
                   and that no operator is test-only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable regardless of the harness cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geocode documents → cell-encode → PIP join against the 64
    polygon fixtures → per-zone counts (scan + builtin geocode + broadcast
    join + winding UDF + shuffle agg in one plan)."""
    from erased_cells_spark.queries import SPARK_QUERIES

    return SPARK_QUERIES["pip_zone_counts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from erased_cells_spark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from erased_cells_spark.queries import ORACLES

    return dict(ORACLES)
