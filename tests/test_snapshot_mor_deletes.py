"""Merge-on-read delete files (r5): delete_keys commits a small key file
and touches ZERO data partitions; reads anti-join pending sets; time
travel ignores later deletes; apply_deletes folds into copy-on-write
rewrites of only the affected partitions and clears the list; rewrites
with pending deletes fail loudly (row accounting); rename interplay works
through the written-name mapping; expire GCs dead delete files."""

import os

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.snapshot import SnapshotTable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def base_df(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 100).cast("long").alias("bucket"),
        F.concat(F.lit("v1-"), F.col("id").cast("string")).alias("val"),
    )


def keys_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id LONG")


class TestDeleteKeys:
    def test_zero_partition_touch_and_read_excludes(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        sid0 = table.metrics()["snapshot_id"]
        paths_before = {
            k: v["path"] for k, v in table.current_manifest()["partitions"].items()
        }
        sid1 = table.delete_keys(spark, keys_df(spark, [5, 150, 399]), "doc_id")
        assert sid1 == sid0 + 1
        paths_after = {
            k: v["path"] for k, v in table.current_manifest()["partitions"].items()
        }
        assert paths_after == paths_before  # zero data partitions touched
        out = {r.doc_id for r in table.read(spark).collect()}
        assert len(out) == 397 and not {5, 150, 399} & out
        # time travel to the pre-delete snapshot still sees the rows
        old = {r.doc_id for r in table.read(spark, snapshot_id=sid0).collect()}
        assert {5, 150, 399} <= old
        assert table.metrics()["pending_delete_files"] == 1

    def test_deletes_accumulate_and_compose_with_pruning(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.delete_keys(spark, keys_df(spark, [5]), "doc_id")
        table.delete_keys(spark, keys_df(spark, [120]), "doc_id")
        assert table.metrics()["pending_delete_files"] == 2
        pruned = table.read(spark, where=[("doc_id", "<", 150)])
        got = {r.doc_id for r in pruned.collect()}
        assert len(got) == 148 and not {5, 120} & got
        assert table.last_scan["partitions_read"] == 2

    def test_empty_and_null_keys_are_noops(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        sid = table.metrics()["snapshot_id"]
        assert table.delete_keys(spark, keys_df(spark, []), "doc_id") == sid
        nulls = spark.createDataFrame([(None,)], "doc_id LONG")
        assert table.delete_keys(spark, nulls, "doc_id") == sid


class TestApplyDeletes:
    def test_folds_only_affected_partitions_and_clears(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.delete_keys(spark, keys_df(spark, [5, 7, 150]), "doc_id")
        before = {
            k: v["path"] for k, v in table.current_manifest()["partitions"].items()
        }
        table.apply_deletes(spark)
        after = table.current_manifest()["partitions"]
        assert after["0"]["path"] != before["0"]  # held 5 and 7
        assert after["1"]["path"] != before["1"]  # held 150
        assert after["2"]["path"] == before["2"]  # untouched
        assert after["3"]["path"] == before["3"]
        assert after["0"]["rows"] == 98 and after["1"]["rows"] == 99
        assert table.metrics()["pending_delete_files"] == 0
        out = {r.doc_id for r in table.read(spark).collect()}
        assert len(out) == 397 and not {5, 7, 150} & out
        # idempotent: nothing pending → same snapshot id
        sid = table.metrics()["snapshot_id"]
        assert table.apply_deletes(spark) == sid

    def test_unmatched_keys_clear_without_rewrites(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.delete_keys(spark, keys_df(spark, [99999]), "doc_id")
        before = {
            k: v["path"] for k, v in table.current_manifest()["partitions"].items()
        }
        table.apply_deletes(spark)
        after = {
            k: v["path"] for k, v in table.current_manifest()["partitions"].items()
        }
        assert after == before
        assert table.metrics()["pending_delete_files"] == 0


class TestInterplay:
    def test_rewrites_require_fold_first(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.delete_keys(spark, keys_df(spark, [5]), "doc_id")
        upd = spark.createDataFrame(
            [(6, 0, "NEW-6")], "doc_id LONG, bucket LONG, val STRING"
        )
        with pytest.raises(ValueError, match="apply_deletes"):
            table.merge(spark, upd, key_col="doc_id", lineage_col="bucket")
        with pytest.raises(ValueError, match="apply_deletes"):
            table.delete_where(spark, "doc_id = 6")
        table.apply_deletes(spark)
        table.merge(spark, upd, key_col="doc_id", lineage_col="bucket")
        back = {r.doc_id: r.val for r in table.read(spark).collect()}
        assert back[6] == "NEW-6" and 5 not in back

    def test_delete_file_survives_rename(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.delete_keys(spark, keys_df(spark, [5]), "doc_id")
        table.rename_column("doc_id", "page_id")
        out = {r.page_id for r in table.read(spark).collect()}
        assert 5 not in out and len(out) == 399
        table.apply_deletes(spark)  # folds through the mapping
        assert table.metrics()["pending_delete_files"] == 0
        assert table.read(spark).count() == 399

    def test_drop_of_delete_key_raises(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.delete_keys(spark, keys_df(spark, [5]), "doc_id")
        with pytest.raises(ValueError, match="apply_deletes"):
            table.drop_column("doc_id")

    def test_expire_gcs_dead_delete_files(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.delete_keys(spark, keys_df(spark, [5]), "doc_id")
        rel = table.delete_files()[0]["path"]
        assert os.path.exists(os.path.join(table.path, rel))
        table.apply_deletes(spark)
        res = table.expire_snapshots(keep_last=1)
        assert rel in res["deleted_manifests"]
        assert not os.path.exists(os.path.join(table.path, rel))
        assert table.read(spark).count() == 399


class TestComposition:
    def test_streamed_table_takedown_and_bloom_lookup(self, spark, table, tmp_path):
        """The operational composition a crawl pipeline runs: stream →
        snapshot sink (per-batch lineage), then a takedown via
        merge-on-read delete_keys (zero rewrites), then a bloom point-lookup
        index over the batch-lineage layout where zone maps can't prune."""
        from erased_cells_spark.streaming.events import stream_to_snapshot

        src = str(tmp_path / "src")
        df = base_df(spark, 300).drop("bucket")
        df.repartition(3).write.parquet(src)
        stream = spark.readStream.schema(df.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = stream_to_snapshot(
            stream, str(table.path), query_name="mor_compose",
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(180)
        assert table.read(spark).count() == 300
        assert len(table.current_manifest()["partitions"]) >= 2  # per-batch lineage
        # takedown: zero rewrites
        paths = {k: v["path"] for k, v in table.current_manifest()["partitions"].items()}
        table.delete_keys(spark, keys_df(spark, [7, 123]), "doc_id")
        assert {
            k: v["path"] for k, v in table.current_manifest()["partitions"].items()
        } == paths
        got = {r.doc_id for r in table.read(spark).collect()}
        assert len(got) == 298 and not {7, 123} & got
        # bloom index requires the fold first (exact accounting), then prunes
        with pytest.raises(ValueError, match="apply_deletes"):
            table.build_bloom(spark, "doc_id")
        table.apply_deletes(spark)
        table.build_bloom(spark, "doc_id")
        plan = table.plan_scan(where=[("doc_id", "=", 250)])
        assert len(plan["read"]) < plan["partitions_total"]
        assert table.read(spark, where=[("doc_id", "=", 250)]).count() == 1
        assert table.read(spark, where=[("doc_id", "=", 7)]).count() == 0
