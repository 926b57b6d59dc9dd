"""K-anonymity audit contracts (functions/pii.k_anonymity_audit):
hand-built group structure with known histogram and exposures, single
mega-group, and validation. Cross-engine parity is events_kanon_audit."""

import pytest

from erased_cells_spark.functions.pii import k_anonymity_audit


def _df(spark, combos):
    rows = [(a, b) for (a, b), n in combos.items() for _ in range(n)]
    return spark.createDataFrame(rows, "qa string, qb long")


def test_histogram_and_exposure(spark):
    combos = {("x", 1): 1, ("x", 2): 1, ("y", 1): 3, ("y", 2): 5, ("z", 1): 5}
    audit, exposure = k_anonymity_audit(_df(spark, combos), ["qa", "qb"], [2, 4, 6])
    hist = {r.group_size: (r.n_groups, r.n_rows) for r in audit.collect()}
    assert hist == {1: (2, 2), 3: (1, 3), 5: (2, 10)}
    exp = {r.k: (r.rows_below, round(r.frac_below, 9)) for r in exposure.collect()}
    assert exp[2] == (2, round(2 / 15, 9))
    assert exp[4] == (5, round(5 / 15, 9))
    assert exp[6] == (15, 1.0)


def test_single_group_is_fully_anonymous(spark):
    audit, exposure = k_anonymity_audit(
        _df(spark, {("a", 0): 40}), ["qa", "qb"], [10]
    )
    assert [tuple(r) for r in audit.collect()] == [(40, 1, 40)]
    [r] = exposure.collect()
    assert (r.rows_below, r.frac_below) == (0, 0.0)


def test_validation(spark):
    with pytest.raises(ValueError):
        k_anonymity_audit(None, [], [2])
    with pytest.raises(ValueError):
        k_anonymity_audit(None, ["qa"], [])
