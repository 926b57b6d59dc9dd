"""Iceberg-v2 tail (r6, VERDICT r5 item 8): POSITION delete files and
partition-spec evolution. Contracts: delete_where_positions hides exactly
the predicate's rows while touching zero data partitions; idempotent;
time-travel isolated; composes with equality delete_keys; apply_deletes
folds BOTH flavors with exact row accounting and clears both lists;
compact/COW rewrites refuse while positions are pending (ordinal safety);
CDC changes() sees position-delete windows; expire GCs dead position
files. Spec evolution: new batches may partition by a different column
with zero rewrites, reads/pruning unioning transparently; cross-spec key
collisions fail loudly."""

import os

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.snapshot import SnapshotTable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def docs_df(spark, lo=0, hi=400, tag="v1"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 100).cast("long").alias("bucket"),
        F.concat(F.lit(tag + "-"), F.col("id").cast("string")).alias("val"),
    )


def write_base(spark, table, n=400):
    table.write_partitions(docs_df(spark, 0, n), "bucket", [0, 1, 2, 3])
    return table.metrics()["snapshot_id"]


def part_paths(table):
    return {k: m["path"] for k, m in table.current_manifest()["partitions"].items()}


class TestPositionDeletes:
    def test_hides_rows_zero_partition_touch(self, spark, table):
        sid0 = write_base(spark, table)
        before = part_paths(table)
        sid1 = table.delete_where_positions(spark, "doc_id % 100 = 7")
        assert sid1 == sid0 + 1
        assert part_paths(table) == before  # ZERO data partitions rewritten
        got = sorted(r.doc_id for r in table.read(spark).select("doc_id").collect())
        assert got == [i for i in range(400) if i % 100 != 7]
        assert len(table.position_delete_files()) == 1
        assert table.position_delete_files()[0]["n_rows"] == 4

    def test_predicate_needs_no_key_column(self, spark, table):
        """The point vs delete_keys: any predicate, e.g. a LIKE over a
        value column with no key semantics."""
        write_base(spark, table)
        table.delete_where_positions(spark, "val LIKE 'v1-39%'")
        got = table.read(spark).filter("doc_id >= 390").count()
        # 390..399 all match 'v1-39%' → gone; 39 itself also matches v1-39
        assert got == 0
        assert table.read(spark).count() == 400 - 11

    def test_idempotent(self, spark, table):
        write_base(spark, table)
        sid1 = table.delete_where_positions(spark, "doc_id = 5")
        sid2 = table.delete_where_positions(spark, "doc_id = 5")
        assert sid2 == sid1  # already hidden: nothing recorded
        assert len(table.position_delete_files()) == 1

    def test_time_travel_isolation(self, spark, table):
        sid0 = write_base(spark, table)
        table.delete_where_positions(spark, "doc_id < 100")
        assert table.read(spark, snapshot_id=sid0).count() == 400
        assert table.read(spark).count() == 300

    def test_composes_with_equality_deletes(self, spark, table):
        write_base(spark, table)
        table.delete_keys(spark, spark.createDataFrame([(1,), (2,)], "doc_id long"), "doc_id")
        table.delete_where_positions(spark, "doc_id IN (2, 3)")
        # doc 2 was already hidden by the key delete → only 3 records
        assert table.position_delete_files()[0]["n_rows"] == 1
        got = [r.doc_id for r in table.read(spark).select("doc_id").orderBy("doc_id").limit(5).collect()]
        assert got == [0, 4, 5, 6, 7]

    def test_apply_deletes_folds_both_flavors(self, spark, table):
        write_base(spark, table)
        table.delete_keys(spark, spark.createDataFrame([(10,)], "doc_id long"), "doc_id")
        table.delete_where_positions(spark, "doc_id IN (20, 120)")
        table.apply_deletes(spark)
        assert table.delete_files() == [] and table.position_delete_files() == []
        man = table.current_manifest()
        # only buckets 0 and 1 held deleted rows → only they rewrote
        rewritten = {k for k, m in man["partitions"].items() if "rewrite_of" in m}
        assert rewritten == {"0", "1"}
        assert table.read(spark).count() == 397
        assert table.read(spark).filter("doc_id IN (10, 20, 120)").count() == 0

    def test_compact_refuses_then_works_after_fold(self, spark, table):
        table.write_partitions(
            docs_df(spark).repartition(8), "bucket", [0, 1, 2, 3]
        )
        table.delete_where_positions(spark, "doc_id = 9")
        with pytest.raises(ValueError, match="POSITION delete"):
            table.compact(spark)
        with pytest.raises(ValueError, match="pending"):
            table.delete_where(spark, "doc_id = 8")  # COW guard covers both
        table.apply_deletes(spark)
        table.compact(spark)
        assert table.read(spark).count() == 399

    def test_cdc_window_sees_position_deletes(self, spark, table):
        sid0 = write_base(spark, table)
        table.delete_where_positions(spark, "doc_id IN (3, 303)")
        ch = table.changes(spark, sid0)
        assert sorted(r.doc_id for r in ch["deleted"].collect()) == [3, 303]
        assert ch["appended"].count() == 0
        assert table.last_changes_scan["mor_delta"] is True

    def test_rename_then_position_delete_on_new_name(self, spark, table):
        write_base(spark, table)
        table.rename_column("val", "content")
        table.delete_where_positions(spark, "content = 'v1-42'")
        assert table.read(spark).filter("doc_id = 42").count() == 0
        assert table.read(spark).count() == 399

    def test_expire_gcs_dead_position_files(self, spark, table):
        write_base(spark, table)
        table.delete_where_positions(spark, "doc_id = 0")
        rel = table.position_delete_files()[0]["path"]
        assert os.path.exists(os.path.join(table.path, rel))
        # live while referenced
        table.expire_snapshots(keep_last=1)
        assert os.path.exists(os.path.join(table.path, rel))
        table.apply_deletes(spark)
        table.expire_snapshots(keep_last=1)
        assert not os.path.exists(os.path.join(table.path, rel))
        assert table.read(spark).count() == 399


class TestPartitionSpecEvolution:
    def test_new_batches_under_new_spec_zero_rewrites(self, spark, table):
        table.write_partitions(docs_df(spark), "bucket", [0, 1, 2, 3])
        before = part_paths(table)
        batch2 = (
            docs_df(spark, 400, 500, tag="v2")
            .withColumn("src", F.concat(F.lit("host-"), (F.col("doc_id") % 2).cast("string")))
        )
        table.write_partitions(batch2, "src", ["host-0", "host-1"])
        after = part_paths(table)
        assert all(after[k] == v for k, v in before.items())  # old untouched
        assert table.read(spark).count() == 500
        specs = table.partition_specs()
        assert specs["bucket"] == ["0", "1", "2", "3"]
        assert specs["src"] == ["host-0", "host-1"]

    def test_pruning_works_across_specs(self, spark, table):
        table.write_partitions(docs_df(spark), "bucket", [0, 1, 2, 3])
        batch2 = docs_df(spark, 1000, 1100, tag="v2").withColumn("src", F.lit("host-9"))
        table.write_partitions(batch2, "src", ["host-9"])
        got = table.read(spark, where=[("doc_id", ">=", 1000)])
        assert got.count() == 100
        scan = table.last_scan
        assert scan["partitions_read"] == 1 and scan["partitions_total"] == 5

    def test_cross_spec_key_collision_raises(self, spark, table):
        table.write_partitions(docs_df(spark), "bucket", [0, 1, 2, 3])
        clash = docs_df(spark, 400, 420, tag="v2").withColumn("src", F.lit("0"))
        with pytest.raises(ValueError, match="spec"):
            table.write_partitions(clash, "src", ["0"])

    def test_same_spec_resume_skip_still_works(self, spark, table):
        table.write_partitions(docs_df(spark), "bucket", [0, 1, 2, 3])
        stats = table.write_partitions(docs_df(spark), "bucket", [0, 1, 2, 3])
        assert all(m.get("skipped") for m in stats.values())


class TestRollbackTakedownInterplay:
    def test_rollback_never_resurrects_taken_down_rows(self, spark, table):
        """Pinned semantics (r6): rolling back across a merge-on-read
        delete commit restores the PARTITION state but keeps the pending
        delete lists — a takedown survives a rollback (the operational
        must-have: an operator reverting a bad batch cannot re-expose
        removed content). Time travel to the pre-delete snapshot itself is
        unaffected."""
        sid0 = write_base(spark, table)
        table.delete_keys(
            spark, spark.createDataFrame([(7,)], "doc_id long"), "doc_id"
        )
        table.delete_where_positions(spark, "doc_id = 205")
        table.write_partitions(docs_df(spark, 400, 450), "bucket", [4])
        table.rollback(sid0)
        # partitions restored to the pre-append, pre-delete state...
        assert set(table.current_manifest()["partitions"]) == {"0", "1", "2", "3"}
        # ...but both delete flavors still apply to the CURRENT read
        cur = table.read(spark)
        assert cur.count() == 398
        assert cur.filter("doc_id IN (7, 205)").count() == 0
        # history is intact: the target snapshot itself reads unfiltered
        assert table.read(spark, snapshot_id=sid0).count() == 400
