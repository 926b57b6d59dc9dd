"""Incremental materialized aggregate (sources/matview.py): build equals
the full GROUP BY, every changelog window class (append, delete, update,
vanished group, metadata-only, noop) refreshes to exactly the full
recompute, and a replayed refresh (stale cursor = crash recovery) lands
on the identical state — the recompute-affected-groups design makes
replay idempotent where delta application would double-count."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.matview import MaterializedAggregate
from erased_cells_spark.sources.snapshot import SnapshotTable

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def src(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(4))
    )
    tbl = SnapshotTable(str(tmp_path / "src"))
    tbl.write_partitions(docs, "bucket", [0, 1, 2, 3])
    return tbl


def full_agg(spark, tbl):
    return {
        (r["lang"],): (r["n"], round(r["s"], 6))
        for r in tbl.read(spark)
        .groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum(F.col("n_chars").cast("double")).alias("s"))
        .collect()
    }


def view_state(spark, mv):
    return {
        (r["lang"],): (r["n"], round(r["sum_n_chars"], 6))
        for r in mv.read(spark).collect()
    }


def test_build_and_append_and_update_and_delete(spark, tmp_path, src):
    mv = MaterializedAggregate(str(tmp_path / "mv"))
    out = mv.build(spark, src, ["lang"], ["n_chars"])
    assert out["mode"] == "build"
    assert view_state(spark, mv) == full_agg(spark, src)

    # APPEND window: new docs in existing + brand-new langs
    extra = spark.createDataFrame(
        [(90001, "xx yy", "tlh", "source-99", 5, 5),
         (90002, "zz", "en", "source-99", 2, 5)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG, bucket LONG",
    )
    src.write_partitions(extra, "bucket", [5], overwrite=False)
    r = mv.refresh(spark, src)
    assert r["mode"] == "incremental" and r["affected_groups"] == 2
    assert view_state(spark, mv) == full_agg(spark, src)

    # DELETE window: a whole lang vanishes (copy-on-write delete)
    src.delete_where(spark, "lang = 'tlh'")
    r = mv.refresh(spark, src)
    assert r["mode"] == "incremental" and r["vanished_groups"] == 1
    state = view_state(spark, mv)
    assert state == full_agg(spark, src)
    assert ("tlh",) not in state  # empty groups never stored

    # UPDATE window (delete + re-append in one refresh window)
    src.delete_where(spark, "doc_id = 90002")
    upd = spark.createDataFrame(
        [(90002, "zz zz", "en", "source-99", 99, 6)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG, bucket LONG",
    )
    src.write_partitions(upd, "bucket", [6])
    r = mv.refresh(spark, src)
    assert r["mode"] == "incremental"
    assert view_state(spark, mv) == full_agg(spark, src)


def test_noop_and_metadata_only_windows(spark, tmp_path, src):
    mv = MaterializedAggregate(str(tmp_path / "mv"))
    mv.build(spark, src, ["lang"])
    assert mv.refresh(spark, src)["mode"] == "noop"
    src.build_bloom(spark, "doc_id")  # metadata-only commit
    r = mv.refresh(spark, src)
    assert r["mode"] == "noop-data"
    assert mv.model["src_snapshot"] == src.metrics()["snapshot_id"]


def test_crash_replay_is_idempotent(spark, tmp_path, src):
    mv = MaterializedAggregate(str(tmp_path / "mv"))
    mv.build(spark, src, ["lang"], ["n_chars"])
    extra = spark.createDataFrame(
        [(90010, "aa", "en", "source-1", 7, 5)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG, bucket LONG",
    )
    src.write_partitions(extra, "bucket", [5])
    stale = dict(mv.model)  # cursor BEFORE the refresh
    mv.refresh(spark, src)
    want = view_state(spark, mv)
    # simulate the crash: data committed, cursor not saved -> replay
    mv._save_model(stale)
    r = mv.refresh(spark, src)
    assert r["mode"] == "incremental"
    assert view_state(spark, mv) == want == full_agg(spark, src)


def test_build_guards(spark, tmp_path, src):
    mv = MaterializedAggregate(str(tmp_path / "mv"))
    with pytest.raises(ValueError):
        mv.build(spark, src, [])
    mv.build(spark, src, ["lang"])
    with pytest.raises(ValueError, match="already exists"):
        mv.build(spark, src, ["lang"])


def test_stream_driven_refresh_composition(spark, tmp_path, src):
    """Streaming IVM: the snapshot CDC stream TRIGGERS matview refreshes
    per micro-batch (foreachBatch) — the view tracks the table with no
    poller and no full recompute; a second stream drain after more
    writes resumes from the checkpoint and converges again."""
    import shutil

    from erased_cells_spark.streaming.cdc_source import SnapshotCdcDataSource

    spark.dataSource.register(SnapshotCdcDataSource)
    mv = MaterializedAggregate(str(tmp_path / "mv"))
    mv.build(spark, src, ["lang"], ["n_chars"])
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("snapshot_cdc")
            .option("path", src.path)
            .load()
            .writeStream.foreachBatch(lambda df, bid: mv.refresh(spark, src))
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)

    extra = spark.createDataFrame(
        [(91001, "aa bb", "en", "source-2", 5, 7)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG, bucket LONG",
    )
    src.write_partitions(extra, "bucket", [7])
    drain()
    assert view_state(spark, mv) == full_agg(spark, src)
    src.write_partitions(
        spark.createDataFrame(
            [(91002, "cc", "tlh", "source-2", 2, 8)],
            "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG, bucket LONG",
        ),
        "bucket", [8],
    )
    shutil.rmtree(ckpt, ignore_errors=True)  # fresh drain over the new window
    drain()
    assert view_state(spark, mv) == full_agg(spark, src)
    assert mv.model["src_snapshot"] == src.metrics()["snapshot_id"]
