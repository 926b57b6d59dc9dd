"""AS-OF join vs brute-force twin: random keys/timestamps including exact
ties, keys with no right rows, and strict (<) vs inclusive (<=) semantics."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.asof import asof_join, asof_join_np


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(23)
    n_keys = 12
    left = []
    right = []
    for i in range(300):
        left.append((int(rng.integers(0, n_keys)), int(rng.integers(0, 1000)), i))
    for j in range(150):
        # key 11 gets NO right rows (no-match case); duplicate ts are possible
        right.append((int(rng.integers(0, n_keys - 1)), int(rng.integers(0, 1000)), 1000 + j))
    # force exact-tie cases: right rows at timestamps some left rows share
    right += [(0, left[0][1], 5000), (1, left[1][1], 5001)]
    # make right unique per (key, ts): keep max payload (the operator's
    # determinism contract, same as DuckDB ASOF)
    dedup = {}
    for k, ts, p in right:
        dedup[(k, ts)] = max(dedup.get((k, ts), -1), p)
    right = [(k, ts, p) for (k, ts), p in sorted(dedup.items())]
    ldf = spark.createDataFrame(
        pd.DataFrame(left, columns=["k", "ts", "lid"]).assign(
            ts=lambda d: pd.to_datetime(d.ts, unit="s")
        )
    )
    rdf = spark.createDataFrame(
        pd.DataFrame(right, columns=["k", "ts", "payload"]).assign(
            ts=lambda d: pd.to_datetime(d.ts, unit="s")
        )
    )
    lrows = [(k, ts) for k, ts, _ in left]
    rrows = [(k, ts, p) for k, ts, p in right]
    return ldf, rdf, left, lrows, rrows


class TestAsofJoin:
    def test_inclusive_matches_bruteforce(self, spark, data):
        ldf, rdf, left, lrows, rrows = data
        out = asof_join(ldf, rdf, by_col="k", ts_col="ts", right_cols=["payload"])
        got = {r.lid: r.payload for r in out.collect()}
        want = asof_join_np(lrows, rrows, strict=False)
        assert len(got) == len(left)  # every left row kept (left join)
        for (k, ts, lid), w in zip(left, want):
            assert got[lid] == w, (k, ts, lid)

    def test_strict_excludes_equal_ts(self, spark, data):
        ldf, rdf, left, lrows, rrows = data
        out = asof_join(ldf, rdf, by_col="k", ts_col="ts", right_cols=["payload"], strict=True)
        got = {r.lid: r.payload for r in out.collect()}
        want = asof_join_np(lrows, rrows, strict=True)
        for (k, ts, lid), w in zip(left, want):
            assert got[lid] == w, (k, ts, lid)
        # the planted exact-tie rows differ between modes
        incl = asof_join_np(lrows, rrows, strict=False)
        assert incl[0] == 5000 and want[0] != 5000

    def test_null_right_ts_matches_nothing(self, spark):
        """A NULL-ts right row must not leak as a 'before everything' fill."""
        import pandas as pd

        ldf = spark.createDataFrame(
            pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-01"]), "lid": [0]})
        )
        rdf = spark.createDataFrame(
            [(1, None, 99)], "k LONG, ts TIMESTAMP, payload LONG"
        )
        out = asof_join(ldf, rdf, by_col="k", ts_col="ts", right_cols=["payload"]).collect()
        assert out[0].payload is None

    def test_null_payload_in_latest_row_is_preserved(self, spark):
        """ADVICE r3: a NULL payload in the LATEST matching right row must be
        returned as NULL — a per-column last(ignorenulls) fill would skip it
        for an older row's value. And all right_cols must come from the SAME
        (latest) right row, never mixed across rows."""
        import pandas as pd

        ldf = spark.createDataFrame(
            pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-10"]), "lid": [0]})
        )
        # older row: (a=old_a, b=old_b); latest row: (a=new_a, b=NULL)
        rdf = spark.createDataFrame(
            [
                (1, "2024-01-01", "old_a", "old_b"),
                (1, "2024-01-05", "new_a", None),
            ],
            "k LONG, ts_s STRING, a STRING, b STRING",
        ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "a", "b")
        row = asof_join(ldf, rdf, by_col="k", ts_col="ts", right_cols=["a", "b"]).collect()[0]
        assert row.a == "new_a"
        assert row.b is None  # NOT "old_b": genuine NULL from the latest row

    def test_colliding_right_cols_raise(self, spark, data):
        ldf, rdf, *_ = data
        with pytest.raises(ValueError, match="collide"):
            asof_join(ldf, rdf.withColumnRenamed("payload", "lid"),
                      by_col="k", ts_col="ts", right_cols=["lid"])

    def test_no_right_rows_yield_null(self, spark, data):
        ldf, rdf, left, _, _ = data
        out = asof_join(ldf, rdf, by_col="k", ts_col="ts", right_cols=["payload"])
        k11 = [r.payload for r in out.collect()
               if r.lid in {lid for k, _, lid in left if k == 11}]
        assert k11 and all(p is None for p in k11)

    def test_plan_has_one_shuffle_no_python(self, spark, data):
        """The union-sort as-of join must cost exactly the window's exchange
        (plus the union's trivial scans) — never a range/nested-loop join or
        a Python stage."""
        ldf, rdf, *_ = data
        out = asof_join(ldf, rdf, by_col="k", ts_col="ts", right_cols=["payload"])
        p = out._jdf.queryExecution().sparkPlan().toString()
        assert "Python" not in p
        assert "NestedLoop" not in p and "CartesianProduct" not in p
        assert p.count("Exchange hashpartitioning") <= 1  # the window shuffle
