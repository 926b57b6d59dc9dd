"""Incremental curation (r6): the curation job consumes the source
snapshot table's changes() on re-runs — only appended docs are curated
(zero re-scan of old batches, asserted via last_changes_scan) and source
deletions propagate to the keep list as merge-on-read delete keys.
Semantics are pinned against the SHARED curate() stage function, so the
full and incremental paths cannot drift."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.snapshot import SnapshotTable
from jobs.run_curation import curate, run_incremental


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "source", "text")
        .cache()
    )


def write_src_batch(spark, src, docs, lo, hi, batch):
    b = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).withColumn(
        "part", F.concat(F.lit(f"b{batch}-"), F.pmod(F.col("doc_id"), F.lit(4)).cast("string"))
    )
    src.write_partitions(b, "part", b.select("part"))


class TestIncrementalCuration:
    def test_full_then_incremental_then_takedown(self, spark, docs, tmp_path):
        src = SnapshotTable(str(tmp_path / "src"))
        out = str(tmp_path / "keep")

        # ---- batch 0: full run ----
        write_src_batch(spark, src, docs, 0, 300, 0)
        r1 = run_incremental(spark, src.path, out, buckets=4)
        assert r1["mode"] == "full" and r1["keep_list"] > 0
        keep1 = {r.doc_id for r in SnapshotTable(out).read(spark).collect()}
        # semantics ≡ the shared stage function on the same input
        ref1, _ = curate(
            src.read(spark).filter(F.col("source") != "src0"),
            src.read(spark).filter(F.col("source") == "src0"),
        )
        assert keep1 == {r.doc_id for r in ref1.collect()}

        # ---- batch 1: incremental run scans ONLY the new partitions ----
        write_src_batch(spark, src, docs, 300, 500, 1)
        r2 = run_incremental(spark, src.path, out, buckets=4)
        assert r2["mode"] == "incremental"
        assert r2["changes_scan"]["scanned_from"] == 0  # no old-batch rescan
        keep2 = {r.doc_id for r in SnapshotTable(out).read(spark).collect()}
        assert keep1 <= keep2
        new_ids = keep2 - keep1
        assert new_ids and all(i >= 300 for i in new_ids)

        # ---- no source change: noop ----
        r3 = run_incremental(spark, src.path, out, buckets=4)
        assert r3["mode"] == "noop"

        # ---- source takedown propagates to the keep list ----
        victim = sorted(keep2)[0]
        src.delete_where(spark, f"doc_id = {victim}")
        r4 = run_incremental(spark, src.path, out, buckets=4)
        assert r4["mode"] == "incremental"
        assert r4["source_deletions_propagated"] >= 1
        keep3 = {r.doc_id for r in SnapshotTable(out).read(spark).collect()}
        assert victim not in keep3
        assert keep3 == keep2 - {victim}
        # zero keep-list partitions were rewritten for the takedown (MOR)
        tbl = SnapshotTable(out)
        assert len(tbl.delete_files()) >= 1

    def test_update_window_keeps_new_version(self, spark, docs, tmp_path):
        """ADVICE r6 (medium): a doc deleted AND re-appended (= updated) in
        one CDC window must NOT vanish from the keep list — the takedown of
        its old version is scope='past', so the re-curated new version
        (written at a higher data-seq) stays visible with the NEW text."""
        src = SnapshotTable(str(tmp_path / "src3"))
        out = str(tmp_path / "keep3")
        write_src_batch(spark, src, docs, 0, 300, 0)
        run_incremental(spark, src.path, out, buckets=4)
        keep1 = {r.doc_id for r in SnapshotTable(out).read(spark).collect()}
        victim = sorted(keep1)[0]
        old_text = (
            src.read(spark).filter(F.col("doc_id") == victim).collect()[0].text
        )
        new_text = old_text + " and then some more plain text follows here"

        # one window: delete the old version AND append the updated one
        src.delete_where(spark, f"doc_id = {victim}")
        upd = spark.createDataFrame(
            [(victim, "src1", new_text, f"b9-{victim % 4}")],
            "doc_id long, source string, text string, part string",
        )
        src.write_partitions(upd, "part", upd.select("part"))

        r = run_incremental(spark, src.path, out, buckets=4)
        assert r["mode"] == "incremental"
        assert r["source_deletions_propagated"] >= 1
        tbl = SnapshotTable(out)
        ids = {r_.doc_id for r_ in tbl.read(spark).collect()}
        assert victim in ids, "updated doc silently disappeared from the keep list"
        # duplicated nowhere: the old keep row is hidden by the scoped
        # delete, only the re-written one is visible
        all_rows = [r_.doc_id for r_ in tbl.read(spark).collect()]
        assert all_rows.count(victim) == 1
        # the visible row is the NEW one (written in the b<new-sid> lineage
        # partition, i.e. at a data-seq above the scoped delete's)
        part = {
            r_.doc_id: r_.bucket for r_ in tbl.read(spark).collect()
        }[victim]
        assert part == f"b{r['source_snapshot']}-{victim % 4}"
        # and a later apply_deletes fold must not change visibility
        tbl.apply_deletes(spark)
        ids2 = {r_.doc_id for r_ in tbl.read(spark).collect()}
        assert victim in ids2 and ids2 == ids

    def test_crash_between_state_and_write_is_idempotent(self, spark, docs, tmp_path):
        """A re-run after a crash that committed partitions but not the
        state file must not duplicate keep rows (write_partitions resume
        + id anti-join)."""
        src = SnapshotTable(str(tmp_path / "src2"))
        out = str(tmp_path / "keep2")
        write_src_batch(spark, src, docs, 0, 200, 0)
        r1 = run_incremental(spark, src.path, out, buckets=4)
        import os

        os.remove(os.path.join(out, "curation_state.json"))  # simulate crash
        r2 = run_incremental(spark, src.path, out, buckets=4)  # replays full
        keep = [r.doc_id for r in SnapshotTable(out).read(spark).collect()]
        assert len(keep) == len(set(keep)) == r1["keep_list"]
        assert r2["keep_list"] == r1["keep_list"]
