"""Manifest-level NDV statistics (snapshot.build_ndv/ndv): metadata-only
commits, pure-metadata estimates matching the direct HLL sketch exactly,
accuracy envelope, stale-analyze fail-loud after appends, mixed-precision
guard, and CDC's treatment of the analyze commit as non-data."""

import math

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.functions.cardinality import hll_count_distinct
from erased_cells_spark.sources.pages import generate_pages
from erased_cells_spark.sources.snapshot import SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    df = generate_pages(spark, 3000).withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(4))
    )
    tbl = SnapshotTable(str(tmp_path / "tbl"))
    tbl.write_partitions(df, "bucket", [0, 1, 2, 3])
    return tbl


def test_analyze_is_metadata_only_and_matches_direct_sketch(spark, table):
    rows_before = {k: m["path"] for k, m in table.current_manifest()["partitions"].items()}
    table.build_ndv(spark, "url", p=6)
    rows_after = {k: m["path"] for k, m in table.current_manifest()["partitions"].items()}
    assert rows_before == rows_after  # no data file moved
    got = table.ndv("url")
    # merged-register estimate == the one-shot sketch over the same rows
    direct = (
        hll_count_distinct(
            table.read(spark).withColumn("g", F.lit(1)), "url", ["g"], p=6
        ).collect()[0]["hll_estimate_r"]
    )
    assert got["estimate"] == direct
    assert got["partitions_merged"] == 4
    # accuracy: 3000 distinct urls, 4-sigma envelope at m=64
    assert abs(got["estimate"] - 3000) / 3000 <= 4 * 1.04 / math.sqrt(64)


def test_stale_analyze_fails_loud(spark, table):
    table.build_ndv(spark, "url", p=6)
    extra = generate_pages(spark, 100, seed=77).withColumn("bucket", F.lit(9).cast("long"))
    table.write_partitions(extra, "bucket", [9])
    with pytest.raises(ValueError, match="no NDV registers"):
        table.ndv("url")
    table.build_ndv(spark, "url", p=6)
    assert table.ndv("url")["partitions_merged"] == 5


def test_unanalyzed_and_mixed_precision_guards(spark, table):
    with pytest.raises(ValueError, match="run build_ndv"):
        table.ndv("url")
    table.build_ndv(spark, "url", p=6)
    with pytest.raises(ValueError, match="no NDV registers for 'lang'"):
        table.ndv("lang")


def test_time_travel_sees_pre_analyze_manifest(spark, table):
    sid = table.metrics()["snapshot_id"]
    table.build_ndv(spark, "url")
    with pytest.raises(ValueError):
        table.ndv("url", snapshot_id=sid)  # the old snapshot has no stats
    assert table.ndv("url")["partitions_merged"] == 4


def test_cdc_treats_analyze_as_non_data(spark, table):
    """A build_ndv commit must not read as a replace-style CDC window
    (the build_bloom precedent): the strict stream crosses it cleanly."""
    import shutil

    from erased_cells_spark.streaming.cdc_source import SnapshotCdcDataSource

    spark.dataSource.register(SnapshotCdcDataSource)
    table.build_ndv(spark, "url")
    shutil.rmtree("/tmp/ckpt_ndv_cdc", ignore_errors=True)
    stream = (
        spark.readStream.format("snapshot_cdc")
        .option("path", table.path)
        .option("from_snapshot", 0)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ndv_cdc")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", "/tmp/ckpt_ndv_cdc")
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("ndv_cdc").count() == 3000  # all appends, no failure
