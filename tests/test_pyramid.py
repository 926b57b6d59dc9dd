"""TilePyramid (sources/pyramid.py): a persisted overview pyramid must
equal the full rebuild after every refresh, recompute ONLY affected
geography, delete tiles that became empty, and advance its cursor with
exactly-once semantics (noop windows, metadata-only windows)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.raster import build_overviews, rasterize_points
from erased_cells_spark.sources.pyramid import TilePyramid, _child_keys, _parent_key
from erased_cells_spark.sources.snapshot import SnapshotTable

RES, TS, NL = 6, 3, 2


def _mk_src(spark, tmp_path, rows, name="src"):
    t = SnapshotTable(str(tmp_path / name))
    df = spark.createDataFrame(rows, "doc_id BIGINT, lon DOUBLE, lat DOUBLE").withColumn(
        "batch", F.lit("b0")
    )
    t.write_partitions(df, "batch", ["b0"])
    return t


def _rows(seed, n, lon0=-170.0, lon1=170.0):
    rng = np.random.default_rng(seed)
    return [
        (int(i), float(lon), float(lat))
        for i, (lon, lat) in enumerate(
            zip(rng.uniform(lon0, lon1, n), rng.uniform(-80.0, 80.0, n))
        )
    ]


def _full_rebuild(spark, src):
    pts = src.read(spark)
    base = rasterize_points(pts, RES, TS)
    out = {}
    for lvl, df in [(RES, base)] + build_overviews(base, RES, TS, NL):
        for r in df.collect():
            out[(lvl, r.tile_key)] = (bytes(r.data), bytes(r.mask), r.cell_type)
    return out


def _pyramid_state(spark, pyr):
    out = {}
    for lvl in range(RES, RES - NL - 1, -1):
        for r in pyr.level(spark, lvl).collect():
            out[(lvl, r.tile_key)] = (bytes(r.data), bytes(r.mask), r.cell_type)
    return out


def test_parent_child_key_roundtrip():
    for pres in (3, 5):
        tn_p = 1 << (pres - 3)
        for pkey in range(tn_p * tn_p):
            kids = _child_keys(pkey, pres, 3)
            assert len(set(kids)) == 4
            assert all(_parent_key(k, pres + 1, 3) == pkey for k in kids)


def test_build_matches_full_rebuild(spark, tmp_path):
    src = _mk_src(spark, tmp_path, _rows(1, 300))
    pyr = TilePyramid(str(tmp_path / "pyr"))
    pyr.build(spark, src, res=RES, tile_shift=TS, n_levels=NL)
    assert _pyramid_state(spark, pyr) == _full_rebuild(spark, src)
    with pytest.raises(ValueError):
        pyr.build(spark, src, res=RES, tile_shift=TS, n_levels=NL)


def test_refresh_append_delete_equals_rebuild_and_prunes(spark, tmp_path):
    src = _mk_src(spark, tmp_path, _rows(2, 300))
    pyr = TilePyramid(str(tmp_path / "pyr2"))
    pyr.build(spark, src, res=RES, tile_shift=TS, n_levels=NL)
    before = _pyramid_state(spark, pyr)

    # churn: a localized append batch + a delete of a doc range
    extra = [(10_000 + i, float(-10.0 + i * 0.1), float(5.0 + i * 0.1)) for i in range(20)]
    df = spark.createDataFrame(extra, "doc_id BIGINT, lon DOUBLE, lat DOUBLE").withColumn(
        "batch", F.lit("b1")
    )
    src.write_partitions(df, "batch", ["b1"])
    src.delete_where(spark, "doc_id >= 0 AND doc_id < 15")

    out = pyr.refresh(spark, src)
    assert out["mode"] == "incremental"
    after = _pyramid_state(spark, pyr)
    assert after == _full_rebuild(spark, src)
    # only affected geography recomputed: every changed (level, key) must be
    # inside the reported affected counts, and most tiles are untouched
    changed = {k for k in set(before) | set(after) if before.get(k) != after.get(k)}
    n_aff = sum(out["affected_per_level"].values())
    assert len(changed) <= n_aff
    assert n_aff < len(before) / 2, (n_aff, len(before))

    # noop window
    again = pyr.refresh(spark, src)
    assert again["mode"] == "noop"


def test_refresh_deletion_empties_tile_everywhere(spark, tmp_path):
    # one isolated doc far from the cluster: deleting it must REMOVE its
    # tile at every level (the copy-on-write empty-tile delete path)
    rows = _rows(3, 120, lon0=-30.0, lon1=30.0) + [(9999, 150.0, 70.0)]
    src = _mk_src(spark, tmp_path, rows)
    pyr = TilePyramid(str(tmp_path / "pyr3"))
    pyr.build(spark, src, res=RES, tile_shift=TS, n_levels=NL)
    src.delete_where(spark, "doc_id = 9999")
    out = pyr.refresh(spark, src)
    assert out["mode"] == "incremental" and out["emptied_tiles"] >= 1
    assert _pyramid_state(spark, pyr) == _full_rebuild(spark, src)
