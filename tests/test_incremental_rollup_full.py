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
