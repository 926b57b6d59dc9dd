"""Hilbert curve contracts (functions/hilbert.py): the two DEFINING
properties (bijectivity onto [0, 4^res) and unit-step adjacency — what
makes it Hilbert, independent of any reference implementation), python ≡
numpy ≡ Spark-expression equality, the layout-writer integration, and
the locality payoff vs Morton (box queries touch no more row groups).
Cross-engine parity is the doc_hilbert_density twin."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.functions.hilbert import (
    hilbert_index_expr,
    hilbert_np,
    hilbert_py,
)


@pytest.mark.parametrize("res", [1, 2, 3, 4])
def test_bijective_and_unit_steps(res):
    n = 1 << res
    m = {hilbert_py(res, x, y): (x, y) for x in range(n) for y in range(n)}
    assert sorted(m) == list(range(n * n))
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = m[d], m[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # NO quadrant-seam jumps


def test_np_and_expr_match_py(spark):
    res, n = 5, 32
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    want = np.array([hilbert_py(res, int(x), int(y)) for x, y in zip(xs.ravel(), ys.ravel())])
    assert (hilbert_np(res, xs.ravel(), ys.ravel()) == want).all()
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(xs.ravel(), ys.ravel())], "ix long, iy long"
    )
    got = {
        (r.ix, r.iy): r.hd
        for r in df.select(
            "ix", "iy", hilbert_index_expr(F.col("ix"), F.col("iy"), res).alias("hd")
        ).collect()
    }
    assert got == {
        (int(x), int(y)): hilbert_py(res, int(x), int(y))
        for x, y in zip(xs.ravel(), ys.ravel())
    }


def test_res_validation():
    with pytest.raises(ValueError):
        hilbert_index_expr(F.lit(0), F.lit(0), 0)
    with pytest.raises(ValueError):
        hilbert_index_expr(F.lit(0), F.lit(0), 13)


def test_unit_steps_hold_at_writer_resolution():
    # the locality guarantee the layout buys: at res 8 (65k cells) every
    # pair of consecutive Hilbert keys is still a grid 4-neighbor —
    # Morton, by contrast, jumps O(2^res) at quadrant seams
    res = 8
    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    d = hilbert_np(res, xs, ys)
    order = np.argsort(d)
    assert (d[order] == np.arange(n * n)).all()  # bijective at depth
    dx = np.abs(np.diff(xs[order]))
    dy = np.abs(np.diff(ys[order]))
    assert (dx + dy == 1).all()


def test_layout_writer_hilbert_end_to_end(spark, tmp_path):
    from erased_cells_spark.functions.geocode import geocode_lat, geocode_lon
    from erased_cells_spark.sources.layout import (
        box_query_ranges,
        rowgroups_touched,
        write_spatially_clustered,
    )

    key = F.concat(F.lit("h-"), F.col("id").cast("string"))
    df = (
        spark.range(20000)
        .select(F.col("id"), geocode_lon(key).alias("lon"), geocode_lat(key).alias("lat"))
    )
    res, parts = 8, 8
    path = str(tmp_path / "hilbert")
    write_spatially_clustered(df, path, res=res, n_partitions=parts, curve="hilbert")
    # the written zcell column is the exact hilbert_np index
    back = spark.read.parquet(path).limit(500).collect()
    from erased_cells_spark.operators.cells_expr import cell_key_np

    for r in back:
        cell = int(cell_key_np(np.array([r.lon]), np.array([r.lat]), res)[0])
        iy, ix = divmod(cell, 1 << res)
        assert r.zcell == hilbert_py(res, ix, iy)
    # box ranges prune: a ~25-degree box must skip most row groups
    touched = total = 0
    for box in [
        (-120.0, -40.0, -95.0, -18.0),
        (5.0, 10.0, 30.0, 33.0),
        (100.0, 40.0, 125.0, 62.0),
    ]:
        ranges = box_query_ranges(*box, res=res, curve="hilbert")
        tt, tot = rowgroups_touched(path, "zcell", ranges)
        touched += tt
        total += tot
    assert touched / total < 0.5, (touched, total)
