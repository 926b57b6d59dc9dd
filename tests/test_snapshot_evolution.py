"""Schema evolution beyond add-column (r5, VERDICT r4 'missing' item 6):
metadata-only rename_column / drop_column via the written-name mapping.
Contracts: renames/drops rewrite NO data and NO group manifests; reads
surface every written generation under the current name; time travel reads
each snapshot under its own mapping; written names are never reused
(fail-loud); zone pruning keeps working across a rename."""

import os

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.snapshot import SnapshotTable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def base_df(spark, n=400, tag="v1"):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 100).cast("long").alias("bucket"),
        F.concat(F.lit(tag + "-"), F.col("id").cast("string")).alias("val"),
    )


class TestRename:
    def test_rename_is_metadata_only_and_reads_old_generations(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        sid_before = table.metrics()["snapshot_id"]
        groups_before = sorted(
            n for n in os.listdir(table.path) if n.startswith("manifest-")
        )
        sid = table.rename_column("val", "content")
        assert sid == sid_before + 1
        # metadata-only: no new group manifests, no new data dirs
        assert sorted(
            n for n in os.listdir(table.path) if n.startswith("manifest-")
        ) == groups_before
        out = table.read(spark)
        assert "content" in out.columns and "val" not in out.columns
        assert out.count() == 400
        assert out.filter("content = 'v1-7'").count() == 1
        # time travel: the pre-rename snapshot still reads under 'val'
        old = table.read(spark, snapshot_id=sid_before)
        assert "val" in old.columns and "content" not in old.columns

    def test_new_writes_use_current_name_and_coalesce(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.rename_column("val", "content")
        post = base_df(spark, 500, tag="v2").withColumnRenamed("val", "content").filter(
            "bucket = 4"
        )
        table.write_partitions(post, "bucket", [4])
        out = table.read(spark)
        assert out.count() == 500
        got = {r.doc_id: r.content for r in out.collect()}
        assert got[7] == "v1-7" and got[450] == "v2-450"  # both generations

    def test_chained_rename_compresses(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.rename_column("val", "txt")
        table.rename_column("txt", "content")
        m = table.column_mapping()
        assert m["renames"] == {"val": "content", "txt": "content"}
        out = table.read(spark)
        assert "content" in out.columns
        assert out.filter("content = 'v1-7'").count() == 1

    def test_zone_pruning_survives_rename(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.rename_column("doc_id", "page_id")
        plan = table.plan_scan(where=[("page_id", "<", 150)])
        assert plan["pruned_n"] == 2  # stats recorded under 'doc_id' still prune
        pruned = table.read(spark, where=[("page_id", "<", 150)])
        assert pruned.count() == 150
        assert table.last_scan["partitions_read"] == 2

    def test_merge_after_rename(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.rename_column("val", "content")
        upd = spark.createDataFrame(
            [(5, 0, "NEW-5")], "doc_id LONG, bucket LONG, content STRING"
        )
        table.merge(spark, upd, key_col="doc_id", lineage_col="bucket")
        back = {r.doc_id: r.content for r in table.read(spark).collect()}
        assert back[5] == "NEW-5" and back[6] == "v1-6"


class TestDrop:
    def test_drop_hides_column_history_survives(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        sid_before = table.metrics()["snapshot_id"]
        table.drop_column("val")
        out = table.read(spark)
        assert "val" not in out.columns and out.count() == 400
        old = table.read(spark, snapshot_id=sid_before)
        assert "val" in old.columns  # time travel unaffected

    def test_drop_renamed_column_by_current_name(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.rename_column("val", "content")
        table.drop_column("content")
        out = table.read(spark)
        assert "content" not in out.columns and "val" not in out.columns


class TestNameReuseGuards:
    def test_writing_a_retired_name_raises(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.rename_column("val", "content")
        with pytest.raises(ValueError, match="retired"):
            table.write_partitions(base_df(spark, 500).filter("bucket = 4"), "bucket", [4])

    def test_readding_a_dropped_name_raises(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.drop_column("val")
        with pytest.raises(ValueError, match="retired"):
            table.write_partitions(base_df(spark, 500).filter("bucket = 4"), "bucket", [4])

    def test_rename_to_retired_name_raises(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.rename_column("val", "content")
        with pytest.raises(ValueError, match="never reused"):
            table.rename_column("content", "val")

    def test_merge_with_retired_name_raises(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.rename_column("val", "content")
        upd = spark.createDataFrame(
            [(5, 0, "NEW-5")], "doc_id LONG, bucket LONG, val STRING"
        )
        with pytest.raises(ValueError, match="retired"):
            table.merge(spark, upd, key_col="doc_id", lineage_col="bucket")


class TestAddColumnDefault:
    def test_metadata_only_add_with_default(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        sid0 = table.metrics()["snapshot_id"]
        groups_before = sorted(
            n for n in os.listdir(table.path) if n.startswith("manifest-")
        )
        table.add_column("score", default=0)
        assert sorted(
            n for n in os.listdir(table.path) if n.startswith("manifest-")
        ) == groups_before  # no rewrites
        out = table.read(spark)
        assert "score" in out.columns
        assert out.filter("score = 0").count() == 400
        # pre-add snapshot doesn't have the column (time travel)
        assert "score" not in table.read(spark, snapshot_id=sid0).columns

    def test_new_writes_carry_real_values_old_read_default(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.add_column("score", default=-1)
        post = base_df(spark, 500).filter("bucket = 4").withColumn(
            "score", F.col("doc_id") * 2
        )
        table.write_partitions(post, "bucket", [4])
        got = {r.doc_id: r.score for r in table.read(spark).collect()}
        assert got[7] == -1 and got[450] == 900
        # filters on the defaulted column work across generations
        assert table.read(spark, where=[("score", "=", -1)]).count() == 400

    def test_pruning_disabled_for_defaulted_columns(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.add_column("score", default=-1)
        post = base_df(spark, 500).filter("bucket = 4").withColumn(
            "score", F.col("doc_id") * 2
        )
        table.write_partitions(post, "bucket", [4])
        # partition 4's stats say score in [800, 998] — but old partitions
        # materialize score = -1, so a score predicate must NOT prune them
        plan = table.plan_scan(where=[("score", "<", 0)])
        assert plan["pruned_n"] == 0
        assert table.read(spark, where=[("score", "<", 0)]).count() == 400

    def test_default_follows_rename_and_dies_with_drop(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.add_column("score", default=7)
        table.rename_column("score", "rating")
        out = table.read(spark)
        assert "rating" in out.columns and "score" not in out.columns
        assert out.filter("rating = 7").count() == 400
        table.drop_column("rating")
        assert "rating" not in table.read(spark).columns

    def test_guards(self, spark, table):
        table.write_partitions(base_df(spark), "bucket", [0, 1, 2, 3])
        table.rename_column("val", "content")
        with pytest.raises(ValueError, match="never reused"):
            table.add_column("val", default=1)
        table.add_column("score", default=0)
        with pytest.raises(ValueError, match="already has a default"):
            table.add_column("score", default=5)
        with pytest.raises(ValueError, match="non-NULL"):
            table.add_column("other", default=None)
