"""Structured-Streaming CDC source over SnapshotTable (r6): offsets are
snapshot ids, each micro-batch is the appended-partition delta, restarts
resume from the checkpointed id with no duplicates. Append-only contract:
replace windows fail loud (or are skipped with skip_replace); schema
evolution (rename/default) applies file-side against the frozen schema;
pending equality delete sets anti-filter appended rows."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.snapshot import SnapshotTable
from erased_cells_spark.streaming.cdc_source import SnapshotCdcDataSource


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def docs_df(spark, lo, hi, tag="v1"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).alias("bucket"),
        F.concat(F.lit(tag + "-"), F.col("id").cast("string")).alias("val"),
    )


def write_batch(spark, table, lo, hi, batch, tag="v1"):
    df = docs_df(spark, lo, hi, tag).withColumn(
        "part", F.concat(F.lit(f"b{batch}-"), F.col("bucket").cast("string"))
    )
    table.write_partitions(df, "part", df.select("part"))


def drain(spark, table, ckpt, out, **options):
    """Run the stream to exhaustion into a PARQUET sink (supports
    checkpoint recovery, unlike the memory sink) and return the
    ACCUMULATED output — so re-draining the same checkpoint also proves
    the no-duplicates property."""
    spark.dataSource.register(SnapshotCdcDataSource)
    reader = spark.readStream.format("snapshot_cdc").option("path", table.path)
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


class TestCdcStream:
    def test_full_table_then_incremental_no_duplicates(self, spark, table, tmp_path):
        write_batch(spark, table, 0, 100, 0)
        ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
        got = drain(spark, table, ckpt, out)
        assert sorted(r.doc_id for r in got.collect()) == list(range(100))
        # new batch appended AFTER the first drain: resuming from the same
        # checkpoint emits ONLY the delta — the accumulated sink has every
        # doc exactly once
        write_batch(spark, table, 100, 160, 1, tag="v2")
        got2 = drain(spark, table, ckpt, out)
        assert sorted(r.doc_id for r in got2.collect()) == list(range(160))
        new = {r.doc_id: r.val for r in got2.collect() if r.doc_id >= 100}
        assert all(v.startswith("v2-") for v in new.values())

    def test_from_snapshot_option_skips_history(self, spark, table, tmp_path):
        write_batch(spark, table, 0, 100, 0)
        sid0 = table.metrics()["snapshot_id"]
        write_batch(spark, table, 100, 130, 1)
        got = drain(
            spark, table, str(tmp_path / "ck2"), str(tmp_path / "o2"),
            from_snapshot=str(sid0),
        )
        assert sorted(r.doc_id for r in got.collect()) == list(range(100, 130))

    def test_replace_window_fails_loud(self, spark, table, tmp_path):
        write_batch(spark, table, 0, 100, 0)
        ckpt, out = str(tmp_path / "ck3"), str(tmp_path / "o3")
        drain(spark, table, ckpt, out)
        table.delete_where(spark, "doc_id = 5")  # partition rewrite
        with pytest.raises(Exception, match="APPEND-ONLY"):
            drain(spark, table, ckpt, out)

    def test_skip_replace_streams_only_new_partitions(self, spark, table, tmp_path):
        write_batch(spark, table, 0, 100, 0)
        ckpt, out = str(tmp_path / "ck4"), str(tmp_path / "o4")
        drain(spark, table, ckpt, out)
        table.delete_where(spark, "doc_id = 5")  # rewrite inside the window
        write_batch(spark, table, 100, 120, 1)
        got = drain(spark, table, ckpt, out, skip_replace="true")
        # accumulated: original 0..99 batch + only the NEW partitions
        assert sorted(r.doc_id for r in got.collect()) == list(range(120))

    def test_schema_evolution_applies_file_side(self, spark, table, tmp_path):
        write_batch(spark, table, 0, 50, 0)
        table.rename_column("val", "content")
        table.add_column("lang", "en")
        df = (
            docs_df(spark, 50, 80, tag="v2")
            .withColumnRenamed("val", "content")
            .withColumn("lang", F.lit("fr"))
            .withColumn("part", F.concat(F.lit("b1-"), F.col("bucket").cast("string")))
        )
        table.write_partitions(df, "part", df.select("part"))
        got = drain(spark, table, str(tmp_path / "ck5"), str(tmp_path / "o5"))
        assert "content" in got.columns and "val" not in got.columns
        langs = {r.doc_id: r.lang for r in got.collect()}
        assert langs[0] == "en" and langs[60] == "fr"
        assert {r.content for r in got.collect() if r.doc_id == 60} == {"v2-60"}

    def test_pending_equality_deletes_filter_appends(self, spark, table, tmp_path):
        write_batch(spark, table, 0, 50, 0)
        table.delete_keys(
            spark, spark.createDataFrame([(7,), (105,)], "doc_id long"), "doc_id"
        )
        sid = table.metrics()["snapshot_id"]
        write_batch(spark, table, 100, 110, 1)
        # stream from AFTER the delete commit: the appended batch must not
        # resurface key 105 (pending takedown applies to appends too)
        got = drain(
            spark, table, str(tmp_path / "ck6"), str(tmp_path / "o6"),
            from_snapshot=str(sid),
        )
        assert sorted(r.doc_id for r in got.collect()) == [
            i for i in range(100, 110) if i != 105
        ]


class TestDeleteScoping:
    def test_scoped_delete_does_not_filter_later_appends(self, spark, table, tmp_path):
        """scope='past' (r7): a sequence-scoped delete pending at the
        window end must NOT swallow rows appended after it — the appended
        partition's data-seq postdates the entry."""
        write_batch(spark, table, 0, 50, 0)
        table.delete_keys(
            spark, spark.createDataFrame([(7,), (105,)], "doc_id long"),
            "doc_id", scope="past",
        )
        sid = table.metrics()["snapshot_id"]
        write_batch(spark, table, 100, 110, 1)
        got = drain(
            spark, table, str(tmp_path / "ck7"), str(tmp_path / "o7"),
            from_snapshot=str(sid),
        )
        # 105 appended AFTER the scoped delete → visible (global would hide it)
        assert sorted(r.doc_id for r in got.collect()) == list(range(100, 110))

    def test_metadata_only_commit_does_not_wedge_strict_stream(self, spark, table, tmp_path):
        """ADVICE r6: build_bloom rewrites every partition meta (blooms key)
        with zero data change — routine index maintenance must not read as
        a replace-style window in strict mode."""
        write_batch(spark, table, 0, 40, 0)
        ckpt, out = str(tmp_path / "ck8"), str(tmp_path / "o8")
        drain(spark, table, ckpt, out)
        table.build_bloom(spark, "doc_id")
        write_batch(spark, table, 40, 60, 1)
        got = drain(spark, table, ckpt, out)  # strict mode: must not raise
        assert sorted(r.doc_id for r in got.collect()) == list(range(60))

    def test_compaction_window_does_not_wedge_strict_stream(self, spark, table, tmp_path):
        """Pure compaction (compacted_from chain, equal rows) is a layout
        change — whitelisted exactly like batch-side changes() does."""
        # multi-file partitions so compact() actually rewrites
        df = docs_df(spark, 0, 40).repartition(4).withColumn(
            "part", F.concat(F.lit("b0-"), F.col("bucket").cast("string"))
        )
        table.write_partitions(df, "part", df.select("part"))
        ckpt, out = str(tmp_path / "ck9"), str(tmp_path / "o9")
        drain(spark, table, ckpt, out)
        sid_before = table.metrics()["snapshot_id"]
        table.compact(spark, max_files_per_partition=1)
        assert table.metrics()["snapshot_id"] > sid_before, "compaction was a no-op"
        write_batch(spark, table, 40, 50, 2)
        got = drain(spark, table, ckpt, out)  # strict mode: must not raise
        assert sorted(r.doc_id for r in got.collect()) == list(range(50))

    def test_position_deletes_filter_skip_replace_window(self, spark, table, tmp_path):
        """ADVICE r6 (medium): with skip_replace a window can contain an
        append followed by a delete_where_positions commit whose positions
        reference the appended files — those rows must not stream."""
        write_batch(spark, table, 0, 30, 0)
        ckpt, out = str(tmp_path / "ck10"), str(tmp_path / "o10")
        drain(spark, table, ckpt, out)
        write_batch(spark, table, 100, 110, 1)
        table.delete_where_positions(spark, "doc_id in (103, 107)")
        got = drain(spark, table, ckpt, out, skip_replace="true")
        assert sorted(r.doc_id for r in got.collect()) == (
            list(range(30)) + [i for i in range(100, 110) if i not in (103, 107)]
        )


class TestRestartAcrossEvolution:
    def test_restart_surfaces_columns_added_after_first_run(self, spark, table, tmp_path):
        """The documented fixed-schema rule: a running stream keeps its
        frozen schema; a RESTART re-derives it from the current snapshot,
        so columns added (with defaults) between drains appear after the
        restart — with old batches' rows reading the default."""
        write_batch(spark, table, 0, 40, 0)
        ckpt, out1 = str(tmp_path / "ck"), str(tmp_path / "o1")
        got = drain(spark, table, ckpt, out1)
        assert "lang" not in got.columns
        table.add_column("lang", "en")
        df = (
            docs_df(spark, 40, 60)
            .withColumn("lang", F.lit("fr"))
            .withColumn("part", F.concat(F.lit("b1-"), F.col("bucket").cast("string")))
        )
        table.write_partitions(df, "part", df.select("part"))
        # restart with the SAME checkpoint + sink (the file sink's batch
        # log is checkpoint-bound): only the delta streams, now carrying
        # lang; the accumulated output unions schemas — old batches read
        # NULL for the later column (mergeSchema), new rows read 'fr'
        drain(spark, table, ckpt, out1)
        got2 = spark.read.option("mergeSchema", "true").parquet(out1)
        assert "lang" in got2.columns
        langs = {r.doc_id: r.lang for r in got2.collect()}
        assert sorted(langs) == list(range(60))
        assert langs[50] == "fr" and langs[0] is None


class TestChangelogMode:
    """r7 (verdict #3): option('mode','changelog') adds _change_type ∈
    {insert, delete}; windows that ADD merge-on-read delete sets emit the
    hidden rows as delete rows, multiset-equal to batch changes()."""

    def test_appends_stamp_insert(self, spark, table, tmp_path):
        write_batch(spark, table, 0, 40, 0)
        got = drain(
            spark, table, str(tmp_path / "ck"), str(tmp_path / "o"),
            mode="changelog",
        )
        rows = got.collect()
        assert sorted(r.doc_id for r in rows) == list(range(40))
        assert {r._change_type for r in rows} == {"insert"}

    def test_takedown_emits_delete_rows_and_matches_batch_changes(
        self, spark, table, tmp_path
    ):
        write_batch(spark, table, 0, 40, 0)
        ckpt, out = str(tmp_path / "ck2"), str(tmp_path / "o2")
        drain(spark, table, ckpt, out, mode="changelog")
        sid0 = table.metrics()["snapshot_id"]
        table.delete_keys(
            spark, spark.createDataFrame([(7,), (11,)], "doc_id long"), "doc_id"
        )
        write_batch(spark, table, 100, 110, 1, tag="v2")
        sid1 = table.metrics()["snapshot_id"]
        got = drain(spark, table, ckpt, out, mode="changelog")
        window = [r for r in got.collect() if r.doc_id >= 100 or r._change_type == "delete"]
        dels = sorted(r.doc_id for r in window if r._change_type == "delete")
        ins = sorted(r.doc_id for r in window if r._change_type == "insert")
        assert dels == [7, 11]
        assert ins == list(range(100, 110))
        # delete rows carry the FULL row payload (the hidden row's columns)
        payload = {r.doc_id: r.val for r in window if r._change_type == "delete"}
        assert payload == {7: "v1-7", 11: "v1-11"}
        # batch twin over the same window
        ch = table.changes(spark, sid0, sid1)
        assert sorted(r.doc_id for r in ch["deleted"].collect()) == dels
        assert sorted(r.doc_id for r in ch["appended"].collect()) == ins

    def test_already_hidden_rows_never_reemit(self, spark, table, tmp_path):
        """A second overlapping takedown emits only NEWLY hidden rows —
        start-snapshot visibility excludes rows a prior set already hid."""
        write_batch(spark, table, 0, 40, 0)
        ckpt, out = str(tmp_path / "ck3"), str(tmp_path / "o3")
        drain(spark, table, ckpt, out, mode="changelog")
        table.delete_keys(
            spark, spark.createDataFrame([(5,)], "doc_id long"), "doc_id"
        )
        drain(spark, table, ckpt, out, mode="changelog")
        table.delete_keys(
            spark, spark.createDataFrame([(5,), (9,)], "doc_id long"), "doc_id"
        )
        got = drain(spark, table, ckpt, out, mode="changelog")
        dels = sorted(
            r.doc_id for r in got.collect() if r._change_type == "delete"
        )
        assert dels == [5, 9]  # 5 exactly once, across both windows

    def test_append_then_delete_same_window_nets_to_nothing(
        self, spark, table, tmp_path
    ):
        """A doc appended AND taken down inside one window appears on
        neither lane — matching batch changes() multiset semantics."""
        write_batch(spark, table, 0, 20, 0)
        ckpt, out = str(tmp_path / "ck4"), str(tmp_path / "o4")
        drain(spark, table, ckpt, out, mode="changelog")
        write_batch(spark, table, 100, 110, 1)
        table.delete_keys(
            spark, spark.createDataFrame([(3,), (105,)], "doc_id long"), "doc_id"
        )
        got = drain(spark, table, ckpt, out, mode="changelog")
        window = [
            r for r in got.collect()
            if r.doc_id >= 100 or r._change_type == "delete"
        ]
        dels = sorted(r.doc_id for r in window if r._change_type == "delete")
        ins = sorted(r.doc_id for r in window if r._change_type == "insert")
        assert dels == [3]  # 105 was never visible at the window start
        assert ins == [i for i in range(100, 110) if i != 105]

    def test_position_delete_takedown_emits_delete_rows(self, spark, table, tmp_path):
        write_batch(spark, table, 0, 30, 0)
        ckpt, out = str(tmp_path / "ck5"), str(tmp_path / "o5")
        drain(spark, table, ckpt, out, mode="changelog")
        table.delete_where_positions(spark, "doc_id in (4, 22)")
        got = drain(spark, table, ckpt, out, mode="changelog")
        dels = sorted(r.doc_id for r in got.collect() if r._change_type == "delete")
        assert dels == [4, 22]

    def test_bloom_prunes_delete_scan_partitions(self, spark, table, tmp_path):
        """100 TB path: with per-partition blooms on the key column, a
        takedown window plans delete-scan tasks ONLY for partitions whose
        bloom admits a key — not one per table partition."""
        from erased_cells_spark.streaming.cdc_source import (
            SnapshotCdcStreamReader,
        )

        write_batch(spark, table, 0, 400, 0)  # 4 bucket partitions
        table.build_bloom(spark, "doc_id")
        sid0 = table.metrics()["snapshot_id"]
        # doc 8: bucket 0 → exactly one of the 4 partitions can hide it
        table.delete_keys(
            spark, spark.createDataFrame([(8,)], "doc_id long"), "doc_id"
        )
        sid1 = table.metrics()["snapshot_id"]
        import pyarrow as pa

        reader = SnapshotCdcStreamReader(
            table.path,
            pa.schema([
                ("doc_id", pa.int64()), ("bucket", pa.int64()),
                ("val", pa.string()), ("_change_type", pa.string()),
            ]),
            {"mode": "changelog"},
        )
        parts = reader.partitions(
            {"snapshot_id": sid0}, {"snapshot_id": sid1}
        )
        scans = [p for p in parts if p.kind == "delete"]
        assert len(scans) == 1  # bloom pruned the other 3
        rows = [
            b.to_pandas() for p in scans for b in reader.read(p)
        ]
        import pandas as pd

        allrows = pd.concat(rows)
        assert sorted(allrows.doc_id) == [8]
        assert set(allrows._change_type) == {"delete"}

    def test_position_takedown_prunes_to_referenced_partitions(
        self, spark, table, tmp_path
    ):
        from erased_cells_spark.streaming.cdc_source import (
            SnapshotCdcStreamReader,
        )
        import pyarrow as pa

        write_batch(spark, table, 0, 400, 0)  # 4 partitions, no blooms
        sid0 = table.metrics()["snapshot_id"]
        table.delete_where_positions(spark, "doc_id = 13")  # one bucket
        sid1 = table.metrics()["snapshot_id"]
        reader = SnapshotCdcStreamReader(
            table.path,
            pa.schema([
                ("doc_id", pa.int64()), ("bucket", pa.int64()),
                ("val", pa.string()), ("_change_type", pa.string()),
            ]),
            {"mode": "changelog"},
        )
        parts = reader.partitions({"snapshot_id": sid0}, {"snapshot_id": sid1})
        scans = [p for p in parts if p.kind == "delete"]
        assert len(scans) == 1  # position files name their partition

    def test_restart_exactly_once(self, spark, table, tmp_path):
        """Delete rows obey the same checkpoint exactly-once story as
        inserts: re-draining a drained checkpoint emits nothing new."""
        write_batch(spark, table, 0, 30, 0)
        ckpt, out = str(tmp_path / "ck6"), str(tmp_path / "o6")
        drain(spark, table, ckpt, out, mode="changelog")
        table.delete_keys(
            spark, spark.createDataFrame([(2,)], "doc_id long"), "doc_id"
        )
        got1 = drain(spark, table, ckpt, out, mode="changelog")
        got2 = drain(spark, table, ckpt, out, mode="changelog")
        assert got1.count() == got2.count() == 31  # 30 inserts + 1 delete

    def test_shrunk_delete_list_fails_loud(self, spark, table, tmp_path):
        """apply_deletes folds delete sets into rewritten partitions —
        inexpressible as changelog lanes, so the window must raise."""
        write_batch(spark, table, 0, 30, 0)
        ckpt, out = str(tmp_path / "ck7"), str(tmp_path / "o7")
        drain(spark, table, ckpt, out, mode="changelog")
        table.delete_keys(
            spark, spark.createDataFrame([(2,)], "doc_id long"), "doc_id"
        )
        drain(spark, table, ckpt, out, mode="changelog")
        table.apply_deletes(spark)
        with pytest.raises(Exception, match="REMOVED|APPEND-ONLY"):
            drain(spark, table, ckpt, out, mode="changelog")

    def test_scoped_delete_scan_respects_seq(self, spark, table, tmp_path):
        """scope='past' takedown added in the window: hides (and emits
        delete rows for) only partitions whose data-seq predates it."""
        write_batch(spark, table, 0, 20, 0)
        ckpt, out = str(tmp_path / "ck8"), str(tmp_path / "o8")
        drain(spark, table, ckpt, out, mode="changelog")
        write_batch(spark, table, 100, 110, 1)
        drain(spark, table, ckpt, out, mode="changelog")
        # scoped delete of an OLD doc and a doc id that matches nothing new
        table.delete_keys(
            spark, spark.createDataFrame([(6,), (104,)], "doc_id long"),
            "doc_id", scope="past",
        )
        got = drain(spark, table, ckpt, out, mode="changelog")
        dels = sorted(r.doc_id for r in got.collect() if r._change_type == "delete")
        # both 6 and 104 predate the scoped delete → both emitted
        assert dels == [6, 104]
        # and a NEW append after the scoped delete is NOT hidden
        write_batch(spark, table, 104, 105, 2, tag="v3")
        got2 = drain(spark, table, ckpt, out, mode="changelog")
        re_ins = [
            r for r in got2.collect()
            if r.doc_id == 104 and r._change_type == "insert" and r.val == "v3-104"
        ]
        assert len(re_ins) == 1
