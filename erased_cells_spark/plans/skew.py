"""Skew control for hot cells (zipfian hosts ⇒ hot H3/S2 cells at web scale).

Three layers, cheapest first:
1. AQE skew-join splitting — free, enabled in conf presets.
2. Two-phase salted aggregation — `salted_agg_counts`: partial counts on
   (key, salt), final on key. Turns one hot reducer into SALT reducers.
3. Range repartition on the cell key before wide stateful ops.

The salt is derived from a stable hash of a row-unique column, so results
are deterministic and the partial/final decomposition is exact for
algebraic aggregates (count/sum/min/max).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, n_salts: int = 16) -> DataFrame:
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)))


def salted_agg_counts(
    df: DataFrame, key_cols: list[str], unique_col: str, n_salts: int = 16
) -> DataFrame:
    """groupBy(key).count() that survives hot keys: partial aggregate on
    (key, salt) — map-side combine already shrinks each partition to ≤
    |keys|×|salts| rows — then final aggregate on key alone. The second
    shuffle moves only the tiny partials."""
    partial = (
        with_salt(df, unique_col, n_salts)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_partial_n"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial_n").alias("n"))


def repartition_by_cell(df: DataFrame, cell_col: str, n_partitions: int | None = None) -> DataFrame:
    """Range partitioning on the cell key: neighboring cells co-locate, so
    downstream ring/rollup joins shuffle less; range (not hash) keeps spatial
    locality inside each partition."""
    if n_partitions:
        return df.repartitionByRange(n_partitions, F.col(cell_col))
    return df.repartitionByRange(F.col(cell_col))


SCALE_CONF = {
    # AQE: runtime re-plan, skew-join splitting, partition coalescing
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Arrow for every pandas UDF hop
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # parquet scans: pruning + pushdown stay on (defaults, pinned explicitly)
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
}


def apply_scale_conf(builder):
    for k, v in SCALE_CONF.items():
        builder = builder.config(k, v)
    return builder
