"""Sorted shard export (operators/export.py): global cross-shard order
verified from footers, row conservation, manifest range pruning, skew
survival, and validation."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.export import (
    export_sorted_shards,
    read_manifest,
    shards_for_range,
)


def test_export_is_globally_ordered_and_conserving(spark, tmp_path):
    df = spark.range(0, 20000).select(
        (F.xxhash64("id") % 100000).alias("key"), F.col("id").alias("payload")
    )
    out = str(tmp_path / "exp")
    man = export_sorted_shards(df, out, ["key"], n_shards=8)
    assert man["total_rows"] == 20000
    assert man["n_shards"] >= 2
    pop = [s for s in man["shards"] if s["rows"] > 0]
    for a, b in zip(pop, pop[1:]):
        assert a["max"] <= b["min"]
    # reading shards in manifest order yields a globally sorted key column
    back = spark.read.parquet(out)
    assert back.count() == 20000
    # per-shard internal order: verify one shard directly
    import os

    import pyarrow.parquet as pq

    first = pq.read_table(os.path.join(out, pop[0]["file"])).to_pandas()
    assert (first["key"].values[:-1] <= first["key"].values[1:]).all()


def test_manifest_range_pruning(spark, tmp_path):
    df = spark.range(0, 10000).select(F.col("id").alias("key"))
    out = str(tmp_path / "exp")
    man = export_sorted_shards(df, out, ["key"], n_shards=10)
    hits = shards_for_range(man, 2500, 2600)
    assert 1 <= len(hits) <= 2  # a 1% range touches ~1 of 10 shards
    # the pruned read still finds every row in range
    import os

    found = (
        spark.read.parquet(*[os.path.join(out, h) for h in hits])
        .filter(F.col("key").between(2500, 2600))
        .count()
    )
    assert found == 101


def test_skewed_key_survives(spark, tmp_path):
    df = spark.range(0, 5000).select(F.lit(7).alias("key"), F.col("id").alias("p"))
    out = str(tmp_path / "exp")
    man = export_sorted_shards(df, out, ["key"], n_shards=4)
    assert man["total_rows"] == 5000  # one fat shard, ordering trivially holds


def test_validation(spark, tmp_path):
    df = spark.range(3).select(F.col("id").alias("key"))
    with pytest.raises(ValueError):
        export_sorted_shards(df, str(tmp_path / "a"), [], 2)
    with pytest.raises(ValueError):
        export_sorted_shards(df, str(tmp_path / "b"), ["key"], 0)
