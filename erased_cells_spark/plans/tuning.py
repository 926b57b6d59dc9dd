"""Session-level planner tuning applied by the query surface itself.

These are Spark feature flags whose defaults exist for compatibility, not
performance, and whose effect is identical at every scale — they belong to
the engine code (set once per session on the query path) rather than to any
particular launcher's config, so every entry point (bench, spark-submit
jobs, tests, a user's own session) gets the same plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_APPLIED_CONF = "spark.erased_cells.session_tuned"


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Driver-side rows → an Arrow-backed JVM LocalRelation.

    `spark.createDataFrame(list, schema)` builds a PICKLED PYTHON RDD: every
    downstream job then schedules one Python-worker round-trip per partition
    just to re-read a handful of driver-constructed rows (~0.3 s of
    scheduling at defaultParallelism=32, per job, per site — r8 profiling).
    Routing the same rows through a positional pandas DataFrame makes Spark
    plan a LocalRelation literal: no Python at runtime, constant-folds, and
    broadcasts directly. Columns match the schema BY POSITION (verified for
    flat, nested-array and binary columns). Empty row lists fall back to the
    RDD path (Arrow cannot infer an empty frame) — callers with a cheap
    empty representation should prefer `df.limit(0)` on an existing plan."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)
    import pandas as pd

    pdf = pd.DataFrame(rows)
    if isinstance(rows[0], dict) and hasattr(schema, "names"):
        pdf = pdf[list(schema.names)]  # dict rows: order columns per schema
    return spark.createDataFrame(pdf, schema)


def tune_session(spark: SparkSession) -> None:
    """Idempotent per-session planner tuning.

    - spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true:
      lets AQE coalesce/right-size the output partitioning of CACHED plans.
      The default (false) pins every cached intermediate at the raw
      spark.sql.shuffle.partitions width purely so downstream code that
      relied on a cached DataFrame's physical partitioning keeps seeing it —
      nothing in this engine does. The LSH family caches narrow signature /
      band tables that feed several plan branches; without this flag those
      caches materialize at full shuffle width regardless of size and every
      downstream stage schedules that many tasks (measured at sf0.1: 64-task
      stages over 5k cached rows, ~35% of simhash_dups' wall time; at real
      scale AQE picks the data-proportional width it would pick for any
      uncached exchange). Row-level results are unaffected.
    """
    if spark.conf.get(_APPLIED_CONF, None) == "1":
        return
    spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
    )
    spark.conf.set(_APPLIED_CONF, "1")
