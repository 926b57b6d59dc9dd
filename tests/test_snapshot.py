"""Snapshot sink: atomic commits, resume-with-skip, snapshot isolation,
kill-and-resume determinism (SURVEY.md §5.3 item 5)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.pages import generate_pages
from erased_cells_spark.sources.snapshot import SnapshotTable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def pages_with_lineage(spark, n=2000):
    return generate_pages(spark, n).withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(4))
    )


class TestSnapshot:
    def test_write_read_round_trip(self, spark, table):
        df = pages_with_lineage(spark)
        stats = table.write_partitions(df, "bucket", [0, 1, 2, 3])
        assert sum(s["rows"] for s in stats.values()) == 2000
        back = table.read(spark)
        assert back.count() == 2000
        assert set(back.columns) == set(df.columns)

    def test_resume_skips_committed(self, spark, table):
        df = pages_with_lineage(spark)
        table.write_partitions(df, "bucket", [0, 1])
        assert table.metrics()["n_partitions"] == 2
        # resume: writes only the remaining buckets
        stats = table.write_partitions(df, "bucket", [0, 1, 2, 3])
        assert stats["0"].get("skipped") and stats["1"].get("skipped")
        assert not stats["2"].get("skipped") and not stats["3"].get("skipped")
        assert table.read(spark).count() == 2000

    def test_lineage_string_mismatch_fails_loudly(self, spark, table):
        """ADVICE r2: if Spark's partition-dir string for a lineage value
        differs from Python's str() (bool True → dir 'true' vs key 'True'),
        write_partitions must RAISE — never commit an empty partition and
        delete the staged rows (silent data loss)."""
        df = generate_pages(spark, 200).withColumn("flag", F.lit(True))
        with pytest.raises(RuntimeError, match="staged lineage dirs"):
            table.write_partitions(df, "flag", [True])
        # nothing was committed for the mismatched value
        assert table.metrics()["n_partitions"] == 0

    def test_crash_atomicity_uncommitted_invisible(self, spark, table):
        df = pages_with_lineage(spark)
        table.write_partitions(df, "bucket", [0, 1])
        n_before = table.read(spark).count()
        # simulate a crash: data files written but manifest never committed
        orphan = os.path.join(table.data_dir, "part-ZZZ-deadbeef")
        df.filter("bucket = 2").write.parquet(orphan)
        assert table.read(spark).count() == n_before  # orphan invisible
        # resume completes and the result equals a clean full write
        table.write_partitions(df, "bucket", [2, 3])
        assert table.read(spark).count() == 2000

    def test_deterministic_across_resume(self, spark, table, tmp_path):
        df = pages_with_lineage(spark)
        table.write_partitions(df, "bucket", [0, 1])
        table.write_partitions(df, "bucket", [2, 3])  # resumed
        clean = SnapshotTable(str(tmp_path / "clean"))
        clean.write_partitions(df, "bucket", [0, 1, 2, 3])  # one shot
        a = sorted(r.url for r in table.read(spark).collect())
        b = sorted(r.url for r in clean.read(spark).collect())
        assert a == b

    def test_manifest_lineage_metrics(self, spark, table):
        df = pages_with_lineage(spark)
        table.write_partitions(df, "bucket", [0, 1, 2, 3])
        m = table.metrics()
        assert m["snapshot_id"] == 4  # one atomic commit per partition
        assert m["n_partitions"] == 4 and m["total_rows"] == 2000
        for key, p in m["partitions"].items():
            assert p["lineage"] == key and p["rows"] > 0 and "path" in p
        # manifests are valid JSON history with parent links
        with open(os.path.join(table.path, "snapshot-000004.json")) as f:
            man = json.load(f)
        assert man["parent"] == 3
