"""Z-order as a TABLE PROPERTY (r7, VERDICT r6 missing #6): the sort-order
spec is declared once on the SnapshotTable (Iceberg sort_order / Delta
OPTIMIZE ZORDER), carried across commits like column_mapping, and applied
by routine compact() — no standalone layout writer. Proven here:

- write-unsorted -> set_sort_order -> compact -> a box query touches
  STRICTLY FEWER parquet row groups (footer stats) and reads identical rows;
- partition-level pruning: read(where=[(key, "ranges", runs)]) skips
  partitions whose zone map excludes every Morton run of the box cover;
- the spec survives appends (new partitions re-cluster on the NEXT compact,
  already-stamped partitions are untouched) and schema evolution (renames
  re-point the spec's columns; dropping a spec column fails loud);
- plain `sorted` specs order rows within each rewritten partition.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.cells_expr import morton_key_expr
from erased_cells_spark.sources.layout import box_query_ranges, rowgroups_touched
from erased_cells_spark.sources.pages import generate_pages
from erased_cells_spark.sources.snapshot import SnapshotTable

RES = 8  # 256x256 grid: covers stay metadata-sized, runs stay few


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def _points(spark, n=20_000, batches=4, seed=11):
    """Deterministic points spanning the full globe in EVERY batch (the
    realistic crawl shape: each ingest batch is spatially uniform)."""
    df = spark.range(n).select(
        F.col("id").alias("pid"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(360_000)) / 1000.0 - 180.0).alias("lon"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(170_000)) / 1000.0 - 85.0).alias("lat"),
        F.pmod(F.col("id"), F.lit(batches)).cast("int").alias("batch"),
    )
    return df.withColumn("zcell", morton_key_expr(F.col("lon"), F.col("lat"), RES))


def _touched(table, ranges):
    """(touched, total) row groups across ALL current data files whose
    zcell footer interval intersects any query range."""
    man = table.current_manifest()
    touched = total = 0
    for meta in man["partitions"].values():
        t, n = rowgroups_touched(
            os.path.join(table.path, meta["path"]), "zcell", ranges
        )
        touched += t
        total += n
    return touched, total


BOX = (-60.0, -60.0, -20.0, -20.0)  # lon_min, lat_min, lon_max, lat_max


class TestSortOrderSpec:
    def test_spec_validation(self, spark, table):
        df = _points(spark, n=400, batches=1)
        table.write_partitions(df, "batch", [0])
        with pytest.raises(ValueError, match="kind"):
            table.set_sort_order({"kind": "hilbert", "cols": ["lon", "lat"]})
        with pytest.raises(ValueError, match="zorder"):
            table.set_sort_order({"kind": "zorder", "cols": ["lon"]})
        with pytest.raises(ValueError, match="sorted"):
            table.set_sort_order({"kind": "sorted", "cols": []})
        assert table.sort_order() is None
        table.set_sort_order({"kind": "sorted", "cols": ["pid"]})
        assert table.sort_order() == {"kind": "sorted", "cols": ["pid"]}
        table.set_sort_order(None)
        assert table.sort_order() is None

    def test_compact_reclusters_box_queries_prune(self, spark, table):
        """The headline contract: unsorted writes, one spec, one compact —
        strictly fewer row groups under a box query, identical rows."""
        df = _points(spark)
        # 8 files per partition so pruning granularity exists on both sides
        table.write_partitions(df.repartition(8), "batch", [0, 1, 2, 3])
        runs = box_query_ranges(*BOX, RES, "morton")
        before_touched, before_total = _touched(table, runs)
        assert before_touched == before_total  # unsorted: nothing prunes

        table.set_sort_order(
            {"kind": "zorder", "cols": ["lon", "lat"], "res": RES, "key_col": "zcell"}
        )
        table.compact(spark, max_files_per_partition=8)
        man = table.current_manifest()
        fp = SnapshotTable._sort_order_fp(table.sort_order())
        assert all(m.get("sorted_by") == fp for m in man["partitions"].values())

        after_touched, after_total = _touched(table, runs)
        assert after_total >= 4
        assert after_touched < before_touched, (after_touched, before_touched)
        assert after_touched <= after_total // 2, (after_touched, after_total)

        # result equality: pruned ranges read + exact box filter == full scan
        box_filter = (
            (F.col("lon") >= BOX[0]) & (F.col("lon") <= BOX[2])
            & (F.col("lat") >= BOX[1]) & (F.col("lat") <= BOX[3])
        )
        got = sorted(
            r.pid
            for r in table.read(spark, where=[("zcell", "ranges", runs)])
            .filter(box_filter)
            .select("pid")
            .collect()
        )
        want = sorted(
            r.pid for r in table.read(spark).filter(box_filter).select("pid").collect()
        )
        assert got == want and len(got) > 0
        # and the whole table round-trips exactly (pure layout change)
        assert table.read(spark).count() == 20_000

    def test_ranges_predicate_prunes_partitions(self, spark, table):
        """Partition-level zone-map pruning: quadrant-partitioned data has
        disjoint Morton id ranges per partition (the top two interleaved
        bits are the lat/lon hemisphere bits), so a box inside one quadrant
        plans a scan of exactly one partition."""
        df = _points(spark, n=8_000, batches=1).withColumn(
            "quad",
            (F.when(F.col("lat") >= 0, 2).otherwise(0)
             + F.when(F.col("lon") >= 0, 1).otherwise(0)).cast("int"),
        )
        table.write_partitions(df, "quad", [0, 1, 2, 3])
        table.set_sort_order(
            {"kind": "zorder", "cols": ["lon", "lat"], "res": RES, "key_col": "zcell"}
        )
        table.compact(spark)
        # a box strictly inside the south-west quadrant
        runs = box_query_ranges(-100.0, -60.0, -40.0, -20.0, RES, "morton")
        out = table.read(spark, where=[("zcell", "ranges", runs)])
        assert out.count() > 0
        assert table.last_scan["partitions_total"] == 4
        assert table.last_scan["partitions_read"] == 1, table.last_scan
        # empty ranges fail loud (same contract as empty IN)
        with pytest.raises(ValueError, match="ranges"):
            table.read(spark, where=[("zcell", "ranges", [])])

    def test_spec_survives_appends_and_recompacts_only_new(self, spark, table):
        df = _points(spark)
        table.write_partitions(df, "batch", [0, 1])
        table.set_sort_order(
            {"kind": "zorder", "cols": ["lon", "lat"], "res": RES, "key_col": "zcell"}
        )
        table.compact(spark)
        stamped = {
            k: m["path"] for k, m in table.current_manifest()["partitions"].items()
        }
        # append arrives AFTER the spec: un-stamped until the next compact
        table.write_partitions(df, "batch", [0, 1, 2, 3])
        man = table.current_manifest()
        assert table.sort_order() is not None  # spec carried across the append
        assert "sorted_by" not in man["partitions"]["2"]
        table.compact(spark)
        man2 = table.current_manifest()
        fp = SnapshotTable._sort_order_fp(table.sort_order())
        assert all(m.get("sorted_by") == fp for m in man2["partitions"].values())
        # already-clustered partitions were NOT rewritten (O(churn) upkeep)
        for k, path in stamped.items():
            assert man2["partitions"][k]["path"] == path

    def test_spec_derives_missing_key_column(self, spark, table):
        """Data written WITHOUT the Morton key: compaction derives it from
        the spec's lon/lat and materializes it as a real column whose
        footer stats feed the zone maps; pre-compact reads still work."""
        df = _points(spark, n=4_000, batches=2).drop("zcell")
        table.write_partitions(df, "batch", [0, 1])
        table.set_sort_order(
            {"kind": "zorder", "cols": ["lon", "lat"], "res": RES, "key_col": "zcell"}
        )
        assert "zcell" not in table.read(spark).columns
        table.compact(spark)
        out = table.read(spark)
        assert "zcell" in out.columns
        assert out.count() == 4_000
        # derived key is bit-identical to the expression the covers emit
        bad = out.filter(
            F.col("zcell") != morton_key_expr(F.col("lon"), F.col("lat"), RES)
        ).count()
        assert bad == 0
        runs = box_query_ranges(*BOX, RES, "morton")
        assert table.read(spark, where=[("zcell", "ranges", runs)]).count() > 0

    def test_spec_follows_rename_and_guards_drop(self, spark, table):
        df = _points(spark, n=4_000, batches=2).drop("zcell")
        table.write_partitions(df, "batch", [0, 1])
        table.set_sort_order(
            {"kind": "zorder", "cols": ["lon", "lat"], "res": RES, "key_col": "zcell"}
        )
        table.rename_column("lon", "longitude")
        assert table.sort_order()["cols"] == ["longitude", "lat"]
        with pytest.raises(ValueError, match="sort-order"):
            table.drop_column("lat")
        # compaction after the rename: old files carry the written name,
        # the spec speaks the current one — both resolve
        table.compact(spark)
        out = table.read(spark)
        assert {"longitude", "zcell"} <= set(out.columns)
        assert out.count() == 4_000
        # clearing the spec unblocks the drop
        table.set_sort_order(None)
        table.drop_column("lat")
        assert "lat" not in table.read(spark).columns

    def test_sorted_kind_orders_rows(self, spark, table):
        df = _points(spark, n=6_000, batches=2).drop("zcell")
        table.write_partitions(df.repartition(4), "batch", [0, 1])
        table.set_sort_order({"kind": "sorted", "cols": ["pid"]})
        table.compact(spark)
        man = table.current_manifest()
        import pyarrow.parquet as pq

        for meta in man["partitions"].values():
            files = sorted(
                glob.glob(os.path.join(table.path, meta["path"], "*.parquet"))
            )
            assert len(files) == 1
            pids = pq.read_table(files[0], columns=["pid"])["pid"].to_pylist()
            assert pids == sorted(pids)
        assert table.read(spark).count() == 6_000

    def test_hilbert_curve_spec(self, spark, table):
        """curve='hilbert' in the zorder spec: compaction derives the
        Hilbert key (Arrow-vectorized), the column is bit-identical to
        hilbert_py over the grid coords, box queries prune row groups via
        hilbert cover runs, and results equal the unpruned read."""
        from erased_cells_spark.functions.hilbert import hilbert_py
        from erased_cells_spark.operators.cells_expr import cell_key_np

        df = _points(spark, n=8_000, batches=2).drop("zcell")
        table.write_partitions(df, "batch", [0, 1])
        table.set_sort_order(
            {"kind": "zorder", "cols": ["lon", "lat"], "res": RES,
             "key_col": "zcell", "curve": "hilbert"}
        )
        assert table.sort_order()["curve"] == "hilbert"
        # several files per partition -> narrow per-file key bands the
        # footer pruning assertion below can actually skip
        table.compact(spark, max_files_per_partition=4)
        out = table.read(spark)
        assert out.count() == 8_000
        import numpy as np

        for r in out.limit(300).collect():
            cell = int(cell_key_np(np.array([r.lon]), np.array([r.lat]), RES)[0])
            iy, ix = divmod(cell, 1 << RES)
            assert r.zcell == hilbert_py(RES, ix, iy)
        runs = box_query_ranges(*BOX, RES, "hilbert")
        pruned = table.read(spark, where=[("zcell", "ranges", runs)])
        t, total = _touched(table, runs)
        assert 0 < t < total  # footer pruning engaged
        # pruned read is a superset filter: re-filtering to the exact box
        # must equal filtering the full table
        def in_box(d):
            return d.filter(
                (F.col("lon") >= BOX[0]) & (F.col("lon") <= BOX[2])
                & (F.col("lat") >= BOX[1]) & (F.col("lat") <= BOX[3])
            )

        assert sorted(r.pid for r in in_box(pruned).collect()) == sorted(
            r.pid for r in in_box(out).collect()
        )

    def test_curve_validation(self, spark, table):
        with pytest.raises(ValueError, match="curve"):
            table.set_sort_order(
                {"kind": "zorder", "cols": ["lon", "lat"], "curve": "peano"}
            )
