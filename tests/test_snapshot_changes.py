"""Incremental/CDC snapshot reads (VERDICT r5 item 3): changes(from, to)
returns the row-level changelog — appended = visible at to but not from,
deleted = visible at from but not to — under the TO snapshot's logical
schema. Contracts: append / overwrite / copy-on-write delete / MOR
delete_keys / merge windows; rename + add-default evolution inside the
window; stable partitions are NEVER SCANNED (pruning is observable via
last_changes_scan); compaction is invisible; time-travel isolation from
later commits; identity window is empty."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.snapshot import SnapshotTable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def docs_df(spark, lo, hi, tag="v1"):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") / 100).cast("long").alias("bucket"),
            F.concat(F.lit(tag + "-"), F.col("id").cast("string")).alias("val"),
        )
    )


def rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def write_base(spark, table):
    table.write_partitions(docs_df(spark, 0, 400), "bucket", [0, 1, 2, 3])
    return table.metrics()["snapshot_id"]


class TestAppendWindows:
    def test_pure_append_yields_new_rows_only(self, spark, table):
        sid0 = write_base(spark, table)
        table.write_partitions(docs_df(spark, 400, 500), "bucket", [4])
        ch = table.changes(spark, sid0)
        assert rows(ch["appended"], "doc_id") == [(i,) for i in range(400, 500)]
        assert ch["deleted"].count() == 0
        # only the new partition was scanned, on the to side only
        scan = table.last_changes_scan
        assert scan["scanned_to"] == 1 and scan["scanned_from"] == 0

    def test_identity_window_is_empty(self, spark, table):
        sid0 = write_base(spark, table)
        ch = table.changes(spark, sid0, sid0)
        assert ch["appended"].count() == 0 and ch["deleted"].count() == 0
        assert table.last_changes_scan["scanned_to"] == 0

    def test_overwrite_window_diffs_replaced_partition(self, spark, table):
        sid0 = write_base(spark, table)
        recrawl = docs_df(spark, 100, 180, tag="v2")
        table.write_partitions(recrawl, "bucket", [1], overwrite=True)
        ch = table.changes(spark, sid0)
        # bucket 1 held 100..199 v1; now holds 100..179 v2
        assert rows(ch["deleted"], "doc_id") == [(i,) for i in range(100, 200)]
        assert rows(ch["appended"], "doc_id") == [(i,) for i in range(100, 180)]
        assert all(v.startswith("v2-") for (v,) in ch["appended"].select("val").collect())
        scan = table.last_changes_scan
        assert scan["scanned_to"] == 1 and scan["scanned_from"] == 1

    def test_merge_window_emits_upsert_before_and_after(self, spark, table):
        sid0 = write_base(spark, table)
        upd = spark.createDataFrame(
            [(7, 0, "patched"), (999, 3, "new")], "doc_id long, bucket long, val string"
        )
        table.merge(spark, upd, key_col="doc_id", lineage_col="bucket")
        ch = table.changes(spark, sid0)
        assert rows(ch["appended"], "doc_id", "val") == [(7, "patched"), (999, "new")]
        assert rows(ch["deleted"], "doc_id", "val") == [(7, "v1-7")]
        # only the two touched partitions diff
        assert table.last_changes_scan["scanned_from"] == 2


class TestDeleteWindows:
    def test_copy_on_write_delete(self, spark, table):
        sid0 = write_base(spark, table)
        table.delete_where(spark, "doc_id IN (5, 150)")
        ch = table.changes(spark, sid0)
        assert ch["appended"].count() == 0
        assert rows(ch["deleted"], "doc_id") == [(5,), (150,)]
        assert table.last_changes_scan["scanned_from"] == 2

    def test_mor_delete_keys_window(self, spark, table):
        sid0 = write_base(spark, table)
        keys = spark.createDataFrame([(5,), (150,)], "doc_id long")
        table.delete_keys(spark, keys, "doc_id")
        ch = table.changes(spark, sid0)
        assert ch["appended"].count() == 0
        assert rows(ch["deleted"], "doc_id") == [(5,), (150,)]
        # metas identical but the delete delta forces the shared partitions
        # into the diff — recorded honestly
        assert table.last_changes_scan["mor_delta"] is True

    def test_apply_deletes_after_mor_is_invisible(self, spark, table):
        """delete_keys then apply_deletes: the fold itself changes no
        visible rows relative to the post-delete_keys snapshot."""
        write_base(spark, table)
        keys = spark.createDataFrame([(5,)], "doc_id long")
        table.delete_keys(spark, keys, "doc_id")
        sid1 = table.metrics()["snapshot_id"]
        table.apply_deletes(spark)
        ch = table.changes(spark, sid1)
        assert ch["appended"].count() == 0 and ch["deleted"].count() == 0


class TestEvolutionWindows:
    def test_rename_inside_window_surfaces_new_name(self, spark, table):
        sid0 = write_base(spark, table)
        table.rename_column("val", "content")
        table.write_partitions(
            docs_df(spark, 400, 420, tag="v2").withColumnRenamed("val", "content"),
            "bucket",
            [4],
        )
        ch = table.changes(spark, sid0)
        assert "content" in ch["appended"].columns and "val" not in ch["appended"].columns
        assert rows(ch["appended"], "doc_id") == [(i,) for i in range(400, 420)]
        assert ch["deleted"].count() == 0

    def test_rename_plus_overwrite_diffs_under_new_name(self, spark, table):
        sid0 = write_base(spark, table)
        table.rename_column("val", "content")
        table.write_partitions(
            docs_df(spark, 0, 100, tag="v2").withColumnRenamed("val", "content"),
            "bucket",
            [0],
            overwrite=True,
        )
        ch = table.changes(spark, sid0)
        # from-side rows surface under the TO name with their old values
        assert rows(ch["deleted"], "doc_id", "content")[:1] == [(0, "v1-0")]
        assert rows(ch["appended"], "doc_id", "content")[:1] == [(0, "v2-0")]

    def test_add_column_default_fills_from_side(self, spark, table):
        sid0 = write_base(spark, table)
        table.add_column("lang", "en")
        table.write_partitions(
            docs_df(spark, 100, 150, tag="v2").withColumn("lang", F.lit("fr")),
            "bucket",
            [1],
            overwrite=True,
        )
        ch = table.changes(spark, sid0)
        # deleted before-images read the default for the column added later,
        # exactly as the to-snapshot reads pre-existing partitions
        assert set(r["lang"] for r in ch["deleted"].collect()) == {"en"}
        assert set(r["lang"] for r in ch["appended"].collect()) == {"fr"}

    def test_drop_column_vanishes_from_both_sides(self, spark, table):
        sid0 = write_base(spark, table)
        table.drop_column("val")
        table.write_partitions(
            docs_df(spark, 0, 50, tag="v2").drop("val"), "bucket", [0], overwrite=True
        )
        ch = table.changes(spark, sid0)
        assert "val" not in ch["appended"].columns
        assert "val" not in ch["deleted"].columns


class TestPruningAndIsolation:
    def test_compaction_is_invisible_and_pruned(self, spark, table):
        write_base(spark, table)
        table.write_partitions(
            docs_df(spark, 0, 400).repartition(8), "bucket", [0, 1, 2, 3], overwrite=True
        )
        sid1 = table.metrics()["snapshot_id"]
        table.compact(spark)
        ch = table.changes(spark, sid1)
        assert ch["appended"].count() == 0 and ch["deleted"].count() == 0
        # compacted partitions are recognized as pure layout changes: no scan
        assert table.last_changes_scan["scanned_to"] == 0
        assert table.last_changes_scan["scanned_from"] == 0

    def test_time_travel_isolation(self, spark, table):
        sid0 = write_base(spark, table)
        table.write_partitions(docs_df(spark, 400, 450), "bucket", [4])
        sid1 = table.metrics()["snapshot_id"]
        ch = table.changes(spark, sid0, sid1)
        # a commit AFTER the window must not leak in
        table.write_partitions(docs_df(spark, 450, 500), "bucket", [5])
        assert rows(ch["appended"], "doc_id") == [(i,) for i in range(400, 450)]
        ch2 = table.changes(spark, sid0, sid1)
        assert rows(ch2["appended"], "doc_id") == [(i,) for i in range(400, 450)]

    def test_from_after_to_raises(self, spark, table):
        sid0 = write_base(spark, table)
        table.write_partitions(docs_df(spark, 400, 450), "bucket", [4])
        sid1 = table.metrics()["snapshot_id"]
        with pytest.raises(ValueError, match="after"):
            table.changes(spark, sid1, sid0)

    def test_multiset_duplicates_diff_exactly(self, spark, table):
        """exceptAll semantics: appending a second copy of an existing row
        yields exactly ONE appended row."""
        base = docs_df(spark, 0, 10)
        table.write_partitions(base, "bucket", [0])
        sid0 = table.metrics()["snapshot_id"]
        table.write_partitions(
            base.unionAll(base.filter("doc_id = 3")), "bucket", [0], overwrite=True
        )
        ch = table.changes(spark, sid0)
        assert rows(ch["appended"], "doc_id") == [(3,)]
        assert ch["deleted"].count() == 0


class TestEmptyToSide:
    def test_window_ending_in_empty_table(self, spark, table):
        """Everything deleted in the window: deleted = all prior rows,
        appended empty — the to side has no files to derive a schema from,
        so it renames through the window mapping instead of crashing."""
        table.write_partitions(docs_df(spark, 0, 50), "bucket", [0])
        sid0 = table.metrics()["snapshot_id"]
        table.rename_column("val", "content")
        table.delete_where(spark, "doc_id >= 0")  # empties the table
        ch = table.changes(spark, sid0)
        assert ch["appended"].count() == 0
        assert ch["deleted"].count() == 50
        assert "content" in ch["deleted"].columns and "val" not in ch["deleted"].columns
