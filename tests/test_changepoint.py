"""CUSUM closed-form contract (operators/changepoint.py): the one-window
prefix-sum/prefix-min form must equal the sequential
max(0, s + x - drift) recurrence row for row — the identity the module
docstring claims. Cross-engine value parity is the events_cusum_alarms
twin."""

from hypothesis import given, settings
from hypothesis import strategies as st

from erased_cells_spark.operators.changepoint import cusum_scores


def _sequential(xs, drift):
    s, out = 0, []
    for x in xs:
        s = max(0, s + x - drift)
        out.append(s)
    return out


@settings(max_examples=12, deadline=None)
@given(
    xs=st.lists(st.integers(min_value=-100, max_value=100), min_size=1, max_size=60),
    drift=st.integers(min_value=-10, max_value=10),
)
def test_closed_form_equals_recurrence(spark, xs, drift):
    rows = [("s", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "grp string, i long, x long")
    got = {
        r.i: r.cusum
        for r in cusum_scores(df, ["grp"], ["i"], "x", drift=drift, h=50).collect()
    }
    want = _sequential(xs, drift)
    assert [got[i] for i in range(len(xs))] == want


def test_alarm_flag_and_series_isolation(spark):
    rows = [("a", 0, 100), ("a", 1, 100), ("b", 0, 1)]
    df = spark.createDataFrame(rows, "grp string, i long, x long")
    out = {(r.grp, r.i): (r.cusum, r.alarm) for r in
           cusum_scores(df, ["grp"], ["i"], "x", drift=0, h=150).collect()}
    assert out[("a", 0)] == (100, False)
    assert out[("a", 1)] == (200, True)
    assert out[("b", 0)] == (1, False)  # series never mix
