"""The merge-maintained rollup table must equal a from-scratch aggregate
over ALL cells — the registered query's driver oracle verifies the
zone-pruned range (cells < 1024, which also proves the pruned read); this
pytest keeps the FULL-table equality under oracle-grade verification after
the r5 consolidation."""

import duckdb

import erased_cells_spark.queries as Q


def test_incremental_rollup_full_table_equals_recompute(spark):
    sf_dir = "/root/testdata/sf0.001"
    # build (or reuse) the session's merge-maintained table by running the
    # registered query once, then read the WHOLE table back
    Q.SPARK_QUERIES["incremental_cell_rollup"](spark, sf_dir).collect()
    import hashlib
    import os

    from erased_cells_spark.sources.snapshot import SnapshotTable

    tag = hashlib.md5(
        f"incr:{os.path.abspath(sf_dir)}:{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:10]
    tbl = SnapshotTable(f"/tmp/erased_cells_snap/{tag}")
    got = sorted(
        (r.cell, r.n_docs) for r in tbl.read(spark).select("cell", "n_docs").collect()
    )

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    full_sql = Q._INCR_ROLLUP_SQL.replace(
        f"WHERE {Q.CE.sql_cell_key('lon', 'lat', 6)} < 1024\n", ""
    )
    assert full_sql != Q._INCR_ROLLUP_SQL  # the range predicate was removed
    want = sorted(tuple(r) for r in con.sql(full_sql).fetchall())
    assert got == want and len(got) > 0


def test_cdc_maintained_rollup_through_append_and_delete(spark, tmp_path):
    """The full CDC-maintenance pattern (VERDICT r5 item 3): a rollup kept
    in sync with a source table purely from changes() — appended rows
    increment, deleted rows decrement — must equal a from-scratch aggregate
    after BOTH an append window and a takedown (delete_where) window."""
    from pyspark.sql import functions as F

    from erased_cells_spark.sources.snapshot import SnapshotTable

    src = SnapshotTable(str(tmp_path / "src"))

    def docs(lo, hi, batch):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).alias("cell"),
            F.concat(F.lit(f"b{batch}-"), (F.col("id") % 4).cast("string")).alias("part"),
        )

    src.write_partitions(docs(0, 300, 0), "part", docs(0, 300, 0).select("part"))
    sid0 = src.metrics()["snapshot_id"]
    rollup = {
        r.cell: r.n
        for r in src.read(spark).groupBy("cell").agg(F.count("*").alias("n")).collect()
    }

    def refresh(from_sid):
        ch = src.changes(spark, from_sid)
        for r in ch["appended"].groupBy("cell").agg(F.count("*").alias("n")).collect():
            rollup[r.cell] = rollup.get(r.cell, 0) + r.n
        for r in ch["deleted"].groupBy("cell").agg(F.count("*").alias("n")).collect():
            rollup[r.cell] = rollup[r.cell] - r.n
        return src.metrics()["snapshot_id"]

    # append window
    src.write_partitions(docs(300, 420, 1), "part", docs(300, 420, 1).select("part"))
    sid1 = refresh(sid0)
    # takedown window
    src.delete_where(spark, "doc_id % 50 = 0")
    refresh(sid1)

    want = {
        r.cell: r.n
        for r in src.read(spark).groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    assert {c: n for c, n in rollup.items() if n} == want
