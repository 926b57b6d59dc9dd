"""Overview pyramid (operators/raster.downsample_tiles / build_overviews /
tiles_to_cells): mask-aware 2x2 block means against dense numpy references,
NODATA propagation, quarter assembly across tile boundaries, and argument
guards. Cross-engine parity runs in test_oracle_twins
(raster_overview_pyramid)."""

from __future__ import annotations

import numpy as np
import pytest

from erased_cells_spark.operators.raster import (
    build_overviews,
    downsample_tiles,
    rasterize_points,
    tiles_to_cells,
)


def _cells_dict(df):
    return {(r.ix, r.iy): r.value for r in df.collect()}


def _dense_downsample(cells, n):
    """Dense numpy reference: mask-aware 2x2 block mean over the full grid."""
    grid = np.zeros((n, n))
    mask = np.zeros((n, n), dtype=bool)
    for (ix, iy), v in cells.items():
        grid[iy, ix] = v
        mask[iy, ix] = True
    gb = grid.reshape(n // 2, 2, n // 2, 2)
    mb = mask.reshape(n // 2, 2, n // 2, 2)
    cnt = mb.sum(axis=(1, 3))
    s = (gb * mb).sum(axis=(1, 3))
    out = {}
    for iy, ix in zip(*np.nonzero(cnt)):
        out[(int(ix), int(iy))] = float(s[iy, ix] / cnt[iy, ix])
    return out


@pytest.fixture(scope="module")
def doc_tiles(spark):
    rng = np.random.default_rng(13)
    n_pts = 400
    pts = spark.createDataFrame(
        list(
            zip(
                map(float, rng.uniform(-179.0, 179.0, n_pts)),
                map(float, rng.uniform(-89.0, 89.0, n_pts)),
            )
        ),
        "lon DOUBLE, lat DOUBLE",
    )
    return rasterize_points(pts, res=6, tile_shift=3)


def test_one_level_matches_dense_reference(spark, doc_tiles):
    base = _cells_dict(tiles_to_cells(doc_tiles, res=6, tile_shift=3))
    lv1 = downsample_tiles(doc_tiles, res=6, tile_shift=3)
    got = _cells_dict(tiles_to_cells(lv1, res=5, tile_shift=3))
    want = _dense_downsample(base, 1 << 6)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_pyramid_recursive_levels(spark, doc_tiles):
    base = _cells_dict(tiles_to_cells(doc_tiles, res=6, tile_shift=3))
    levels = build_overviews(doc_tiles, res=6, tile_shift=3, n_levels=2)
    want = _dense_downsample(base, 1 << 6)
    want2 = _dense_downsample(want, 1 << 5)  # recursive: level 2 from level 1
    got2 = _cells_dict(tiles_to_cells(levels[1][1], res=4, tile_shift=3))
    assert levels[0][0] == 5 and levels[1][0] == 4
    assert got2.keys() == want2.keys()
    for k in want2:
        assert got2[k] == pytest.approx(want2[k], rel=1e-12)


def test_nodata_skipped_in_block_mean(spark):
    # one 2x2 block with counts [3, 1] present and two NODATA cells: the
    # parent mean is 2.0 (present children only), never 1.0 (zero-filled)
    pts = []
    # res 4 -> 16x16 grid; cell (0,0) spans lon [-180,-157.5), lat [-90,-78.75)
    pts += [(-170.0, -85.0)] * 3  # cell (0,0)
    pts += [(-150.0, -85.0)] * 1  # cell (1,0) — same parent block
    df = spark.createDataFrame([(float(a), float(b)) for a, b in pts], "lon DOUBLE, lat DOUBLE")
    tiles = rasterize_points(df, res=4, tile_shift=2)
    lv1 = downsample_tiles(tiles, res=4, tile_shift=2)
    got = _cells_dict(tiles_to_cells(lv1, res=3, tile_shift=2))
    assert got == {(0, 0): 2.0}


def test_downsample_guards(spark, doc_tiles):
    with pytest.raises(ValueError):
        downsample_tiles(doc_tiles, res=3, tile_shift=3)  # below one tile
    with pytest.raises(ValueError):
        downsample_tiles(doc_tiles, res=6, tile_shift=0)  # odd tile side
