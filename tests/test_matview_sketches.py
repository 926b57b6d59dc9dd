"""Materialized SKETCH tables (sources/matview.py agg_exprs/derive_exprs
generalization): a deterministic-HLL register table maintained from the
changelog — because refresh recomputes affected groups ABSOLUTELY, the
non-invertible max-merge survives append AND delete windows; the view
equals both a full rebuild and the direct hll_registers computation, and
estimates fold identically. Also pins back-compat (count/sum-only models
keep working — the whole pre-existing matview suite covers that)."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.functions.cardinality import hll_registers
from erased_cells_spark.sources.matview import MaterializedAggregate
from erased_cells_spark.sources.snapshot import SnapshotTable

# the engine-neutral 60-bit md5 hash as a Spark-SQL string (the
# functions/cardinality.py idiom in SQL-text form, p=6 -> 64 buckets)
_HV = "cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)"
DERIVE = {
    "hbucket": f"pmod({_HV}, 64)",
    "rho": f"case when shiftright({_HV}, 6) = 0 then 55 "
           f"else 55 - length(bin(shiftright({_HV}, 6))) end",
}
AGG = {"rho_max": "max(rho)"}


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"s{i % 3}", i % 2) for i in ids],
        "doc_id long, source string, batch int",
    )


@pytest.fixture()
def src(spark, tmp_path):
    tbl = SnapshotTable(str(tmp_path / "src"))
    tbl.write_partitions(_docs(spark, range(400)), "batch", [0, 1])
    return tbl


def _view_registers(spark, mv):
    return {
        (r.source, r.hbucket): r.rho_max
        for r in mv.read(spark).filter(F.col("n") > 0).collect()
    }


def _direct_registers(spark, src):
    return {
        (r.source, r.bucket): r.rho
        for r in hll_registers(src.read(spark), "doc_id", ["source"], p=6).collect()
    }


def test_sketch_view_builds_and_equals_direct(spark, tmp_path, src):
    mv = MaterializedAggregate(str(tmp_path / "mv"))
    out = mv.build(
        spark, src, group_cols=["source", "hbucket"],
        derive_exprs=DERIVE, agg_exprs=AGG,
    )
    assert out["mode"] == "build"
    assert _view_registers(spark, mv) == _direct_registers(spark, src)


def test_refresh_survives_append_and_delete_windows(spark, tmp_path, src):
    mv = MaterializedAggregate(str(tmp_path / "mv"))
    mv.build(
        spark, src, group_cols=["source", "hbucket"],
        derive_exprs=DERIVE, agg_exprs=AGG,
    )
    # append new docs, then DELETE some originals (max-merge alone could
    # never lower a register — only absolute recompute can)
    src.write_partitions(_docs(spark, range(400, 520)), "batch", [0, 1])
    src.delete_where(spark, "doc_id >= 300 AND doc_id < 400")
    res = mv.refresh(spark, src)
    assert res["mode"] == "incremental"
    assert _view_registers(spark, mv) == _direct_registers(spark, src)

    # estimates fold identically from the maintained view
    from erased_cells_spark.functions.cardinality import estimate_from_registers

    direct = _direct_registers(spark, src)
    view = _view_registers(spark, mv)
    for s in ("s0", "s1", "s2"):
        d = {b: r for (g, b), r in direct.items() if g == s}
        v = {b: r for (g, b), r in view.items() if g == s}
        assert estimate_from_registers(d, 6) == estimate_from_registers(v, 6)


def test_refresh_noop_when_source_unmoved(spark, tmp_path, src):
    mv = MaterializedAggregate(str(tmp_path / "mv"))
    mv.build(
        spark, src, group_cols=["source", "hbucket"],
        derive_exprs=DERIVE, agg_exprs=AGG,
    )
    assert mv.refresh(spark, src)["mode"] == "noop"


def test_stream_driven_sketch_view(spark, tmp_path, src):
    """Three subsystems in one loop: the snapshot CDC stream triggers
    refreshes of a SKETCH matview per micro-batch — a live
    distinct-count dashboard that tracks the table with no poller, no
    full recompute, and a non-invertible aggregate (HLL register max)
    that stays correct because refresh recomputes affected groups
    absolutely."""
    from erased_cells_spark.streaming.cdc_source import SnapshotCdcDataSource

    spark.dataSource.register(SnapshotCdcDataSource)
    mv = MaterializedAggregate(str(tmp_path / "mv"))
    mv.build(
        spark, src, group_cols=["source", "hbucket"],
        derive_exprs=DERIVE, agg_exprs=AGG,
    )
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

    src.write_partitions(_docs(spark, range(520, 640)), "batch", [0, 1])
    drain()
    assert _view_registers(spark, mv) == _direct_registers(spark, src)
    assert mv.model["src_snapshot"] == src.metrics()["snapshot_id"]
