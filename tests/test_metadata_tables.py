"""Metadata tables (snapshot.history_df/partitions_df/files_df) and
timestamp time travel (snapshot_as_of): counts reconcile with the data,
files fold to partitions fold to the table, AS OF resolves to the last
snapshot at-or-before a commit instant and composes with read()."""

import time

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.pages import generate_pages
from erased_cells_spark.sources.snapshot import SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    df = generate_pages(spark, 1200).withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(3))
    )
    tbl = SnapshotTable(str(tmp_path / "tbl"))
    tbl.write_partitions(df, "bucket", [0, 1, 2])
    return tbl


def test_metadata_tables_reconcile(spark, table):
    hist = table.history_df(spark).collect()
    assert [h["snapshot_id"] for h in hist] == [1, 2, 3]
    assert hist[-1]["total_rows"] == 1200
    parts = table.partitions_df(spark).collect()
    assert sum(p["rows"] for p in parts) == 1200
    assert {p["spec"] for p in parts} == {"bucket"}
    files = table.files_df(spark).collect()
    # files fold to partitions fold to the table
    assert sum(f["rows"] for f in files) == 1200
    by_lineage: dict = {}
    for f in files:
        by_lineage[f["lineage"]] = by_lineage.get(f["lineage"], 0) + f["rows"]
    assert by_lineage == {p["lineage"]: p["rows"] for p in parts}
    # time travel: the first snapshot's metadata tables see one partition
    assert table.partitions_df(spark, snapshot_id=1).count() == 1


def test_as_of_timestamp_travel(spark, table):
    hist = {h["snapshot_id"]: h for h in table.history_df(spark).collect()}
    raw = {s["snapshot_id"]: s["committed_at"] for s in table.snapshots()}
    # at the instant of snapshot 2's commit -> snapshot 2
    assert table.snapshot_as_of(raw[2]) == 2
    # just before snapshot 2 -> snapshot 1
    assert table.snapshot_as_of(raw[2] - 1e-4) == 1
    # far future -> CURRENT
    sid = table.snapshot_as_of(time.time() + 3600)
    assert sid == 3
    # composes with read(): row count grows across the instants
    n1 = table.read(spark, table.snapshot_as_of(raw[1])).count()
    n3 = table.read(spark, table.snapshot_as_of(raw[3])).count()
    assert 0 < n1 < n3 == 1200
    with pytest.raises(ValueError, match="no snapshot"):
        table.snapshot_as_of(raw[1] - 10.0)
