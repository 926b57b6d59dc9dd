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

    def test_schema_evolution_add_column(self, spark, table):
        """Add-column evolution: partitions written before the column existed
        read as NULL for it; time travel to the old snapshot keeps the old
        schema."""
        df = pages_with_lineage(spark)
        table.write_partitions(df, "bucket", [0, 1])
        sid_old = table.metrics()["snapshot_id"]
        evolved = df.withColumn("quality", (F.length("text") % 7).cast("double"))
        table.write_partitions(evolved, "bucket", [2, 3])
        merged = table.read(spark)
        assert "quality" in merged.columns
        assert merged.count() == 2000
        # old partitions surface NULL quality; new ones carry real values
        assert merged.filter(F.col("quality").isNull()).count() == \
            merged.filter(F.col("bucket").isin([0, 1])).count()
        assert merged.filter(F.col("quality").isNotNull() & F.col("bucket").isin([2, 3])).count() > 0
        # time travel: the pre-evolution snapshot has the original schema
        assert "quality" not in table.read(spark, snapshot_id=sid_old).columns

    def test_time_travel_and_rollback(self, spark, table):
        """Every commit is a live snapshot: read(snapshot_id) reproduces the
        table as of that commit; rollback is append-only (a NEW snapshot
        with the old state) so history survives it."""
        df = pages_with_lineage(spark)
        table.write_partitions(df, "bucket", [0, 1])
        sid_2parts = table.metrics()["snapshot_id"]
        n_01 = table.read(spark).count()
        table.write_partitions(df, "bucket", [2, 3])
        assert table.read(spark).count() == 2000
        # time travel: the older snapshot still sees only buckets 0-1
        assert table.read(spark, snapshot_id=sid_2parts).count() == n_01
        # rollback to the 2-partition state (append-only: new snapshot id)
        rb = table.rollback(sid_2parts)
        assert rb > table.manifest(sid_2parts)["snapshot_id"]
        assert table.read(spark).count() == n_01
        assert table.committed_lineage() == {"0", "1"}
        # history intact across the rollback: the 4-partition snapshot is
        # still time-travel readable
        four = [s for s in table.snapshots() if s["n_partitions"] == 4]
        assert four and table.read(spark, snapshot_id=four[0]["snapshot_id"]).count() == 2000
        # resume after rollback rewrites the rolled-back partitions
        table.write_partitions(df, "bucket", [0, 1, 2, 3])
        assert table.read(spark).count() == 2000

    def test_compact_preserves_rows_and_history(self, spark, table):
        df = pages_with_lineage(spark).repartition(8)  # many files/partition
        table.write_partitions(df, "bucket", [0, 1, 2, 3])
        before = table.metrics()
        sid_before = before["snapshot_id"]
        files_before = sum(p["n_files"] for p in before["partitions"].values())
        assert files_before > 4
        sid = table.compact(spark, max_files_per_partition=1)
        after = table.metrics()
        assert sid == after["snapshot_id"] > sid_before
        assert sum(p["n_files"] for p in after["partitions"].values()) == 4
        assert after["total_rows"] == before["total_rows"]
        got = sorted(r.url for r in table.read(spark).collect())
        old = sorted(r.url for r in table.read(spark, snapshot_id=sid_before).collect())
        assert got == old  # pure layout change; old snapshot still readable
        # idempotent: nothing left to compact → no new snapshot
        assert table.compact(spark, max_files_per_partition=1) == sid

    def test_expire_snapshots_gc(self, spark, table):
        df = pages_with_lineage(spark).repartition(8)
        table.write_partitions(df, "bucket", [0, 1, 2, 3])
        sid_small_files = table.metrics()["snapshot_id"]
        table.compact(spark, max_files_per_partition=1)
        n_dirs_before = len(os.listdir(table.data_dir))
        out = table.expire_snapshots(keep_last=1)
        assert sid_small_files in out["expired_snapshots"]
        assert out["deleted_dirs"]  # the pre-compaction dirs are gone
        assert len(os.listdir(table.data_dir)) < n_dirs_before
        # current snapshot unaffected; expired one now raises
        assert table.read(spark).count() == 2000
        with pytest.raises(ValueError, match="expired"):
            table.read(spark, snapshot_id=sid_small_files)

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


class TestCommitBatching:
    def test_commit_batch_reduces_snapshots_same_state(self, spark, tmp_path):
        """commit_batch trades commit I/O for resume granularity: 8
        partitions at batch 4 → 2 commits; batch 0 → 1 commit; table
        content identical to per-partition commits either way."""
        from pyspark.sql import functions as F

        from erased_cells_spark.sources.snapshot import SnapshotTable

        def df(spark):
            return spark.range(800).select(
                F.col("id").alias("doc_id"), (F.col("id") % 8).alias("bucket")
            )

        per = SnapshotTable(str(tmp_path / "per"))
        per.write_partitions(df(spark), "bucket", list(range(8)))
        assert per.metrics()["snapshot_id"] == 8

        batched = SnapshotTable(str(tmp_path / "batched"))
        batched.write_partitions(df(spark), "bucket", list(range(8)), commit_batch=4)
        assert batched.metrics()["snapshot_id"] == 2

        one = SnapshotTable(str(tmp_path / "one"))
        one.write_partitions(df(spark), "bucket", list(range(8)), commit_batch=0)
        assert one.metrics()["snapshot_id"] == 1

        want = sorted(r.doc_id for r in per.read(spark).collect())
        for tbl in (batched, one):
            assert sorted(r.doc_id for r in tbl.read(spark).collect()) == want
        # resume still skips everything
        stats = one.write_partitions(df(spark), "bucket", list(range(8)), commit_batch=0)
        assert all(m.get("skipped") for m in stats.values())

    def test_internal_column_prefix_rejected(self, spark, tmp_path):
        """Engine-internal names (__lineage/__part/__file/__pos) are
        reserved at write time — a user column named __file would collide
        with the position-delete identity columns mid-read."""
        import pytest
        from pyspark.sql import functions as F

        from erased_cells_spark.sources.snapshot import SnapshotTable

        t = SnapshotTable(str(tmp_path / "resv"))
        df = spark.range(4).select(
            F.col("id").alias("doc_id"), F.lit(0).alias("bucket"), F.lit("x").alias("__file")
        )
        with pytest.raises(ValueError, match="reserved"):
            t.write_partitions(df, "bucket", [0])
