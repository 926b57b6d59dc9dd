"""Mann-Kendall / Theil-Sen contracts (operators/changepoint.
mann_kendall_sen): python-reference equivalence on random series, known
monotone/flat answers, lower-median tie convention, and single-bin drop.
Cross-engine parity is the events_trend_cells twin."""

import random

from erased_cells_spark.operators.changepoint import mann_kendall_sen


def _run(spark, series: dict):
    rows = [(k, tt, v) for k, pts in series.items() for tt, v in pts]
    df = spark.createDataFrame(rows, "grp string, t long, v long")
    return {
        r.grp: (r.n_bins, r.n_pairs, r.s_stat, r.sen_slope)
        for r in mann_kendall_sen(df, ["grp"], "t", "v").collect()
    }


def _reference(pts):
    pts = sorted(pts)
    pairs = [
        (b[1] - a[1], b[0] - a[0])
        for i, a in enumerate(pts)
        for b in pts[i + 1 :]
    ]
    s = sum((dv > 0) - (dv < 0) for dv, _ in pairs)
    slopes = sorted(dv / dt for dv, dt in pairs)
    sen = slopes[(len(slopes) + 1) // 2 - 1]
    return len(pts), len(pairs), s, sen


def test_known_trends(spark):
    got = _run(
        spark,
        {
            "up": [(i, 2 * i) for i in range(6)],
            "down": [(i, 100 - 3 * i) for i in range(5)],
            "flat": [(i, 7) for i in range(4)],
        },
    )
    assert got["up"] == (6, 15, 15, 2.0)
    assert got["down"] == (5, 10, -10, -3.0)
    assert got["flat"] == (4, 6, 0, 0.0)


def test_matches_reference_random(spark):
    rng = random.Random(23)
    series = {
        f"s{k}": [(tt, rng.randrange(0, 50)) for tt in sorted(rng.sample(range(60), 12))]
        for k in range(8)
    }
    got = _run(spark, series)
    for k, pts in series.items():
        assert got[k] == _reference(pts), k


def test_single_bin_series_dropped(spark):
    got = _run(spark, {"one": [(5, 3)], "two": [(1, 1), (2, 5)]})
    assert "one" not in got
    assert got["two"] == (2, 1, 1, 4.0)
