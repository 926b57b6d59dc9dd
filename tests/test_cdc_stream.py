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
