"""Distributed selection contracts (operators/selection.
kth_smallest_grouped): sorted-reference equality on random multisets
(heavy duplicates, negatives, singleton and constant groups), several
quantile fractions, and validation. Cross-engine parity is the
events_median_bisect twin."""

import random

import pytest

from erased_cells_spark.operators.selection import kth_smallest_grouped


def _run(spark, series: dict, frac):
    rows = [(g, v) for g, vs in series.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, v long")
    return {
        r.grp: (r.n, r.k, r.kth_value)
        for r in kth_smallest_grouped(df, ["grp"], "v", frac).collect()
    }


def _want(vs, frac):
    s = sorted(vs)
    k = int((len(vs) - 1) * frac) + 1
    return (len(vs), k, s[k - 1])


@pytest.mark.parametrize("frac", [0.1, 0.5, 1.0])
def test_matches_sorted_reference(spark, frac):
    rng = random.Random(31)
    series = {
        "dups": [rng.randrange(-5, 6) for _ in range(400)],   # heavy ties
        "wide": [rng.randrange(-10**6, 10**6) for _ in range(300)],
        "single": [42],
        "constant": [7] * 50,
    }
    got = _run(spark, series, frac)
    assert got == {g: _want(vs, frac) for g, vs in series.items()}


def test_groups_converge_independently(spark):
    series = {"a": list(range(100)), "b": [5, 5, 5, 9]}
    got = _run(spark, series, 0.5)
    assert got["a"] == (100, 50, 49)
    assert got["b"] == (4, 2, 5)


def test_fraction_validation(spark):
    df = spark.createDataFrame([("g", 1)], "grp string, v long")
    with pytest.raises(ValueError):
        kth_smallest_grouped(df, ["grp"], "v", 0.0)
    with pytest.raises(ValueError):
        kth_smallest_grouped(df, ["grp"], "v", 1.5)
