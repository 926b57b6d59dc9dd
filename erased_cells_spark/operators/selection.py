"""Exact distributed selection (k-th smallest / median) by RANGE
BISECTION — order statistics without sorting.

`percentile()` / sort-based exact quantiles materialize and sort every
group's values (per-group memory at 100 TB is the failure mode; the
events_value_quantiles twin documents that tradeoff). Selection by
bisection never sorts and never moves values: binary-search the VALUE
RANGE, counting `v <= mid` per round —

    while lo < hi:  mid = (lo+hi) div 2
                    c = count(v <= mid)
                    if c >= k: hi = mid  else: lo = mid + 1

`lo` converges to the k-th smallest in ceil(log2(range)) rounds (~17
for integer cents, ~34 for arbitrary int64 ids). Each round is ONE
map-side-combined aggregation over a cached narrow projection; driver
state is (lo, hi, k) per group — metadata-scale. The classic
distributed-selection tradeoff: log(range) cheap scans instead of one
memory-hungry sort; right when groups are huge and the value domain is
bounded (money, timestamps, counts).

GROUPED form: every group binary-searches ITS OWN range concurrently —
each round broadcasts the per-group mid table, one conditional-count
aggregation serves every group, and groups that converge drop out of
the broadcast. Exact int64 end to end; ties need no special handling
(count(v <= mid) is monotone in mid regardless of duplicates)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kth_smallest_grouped(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k_col_or_frac: float | str = 0.5,
) -> DataFrame:
    """(group_cols..., n, k, kth_value): the exact k-th smallest integer
    value per group. `k_col_or_frac`: a float f picks k = (n-1)*f + 1
    lower-rounded ((n+1) div 2 for f=0.5 — the lower median), or the name
    of an existing per-group k column joined in by the caller."""
    vals = df.select(*group_cols, F.col(value_col).cast("long").alias("v"))
    vals = vals.persist()
    try:
        bounds = vals.groupBy(*group_cols).agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        rows = bounds.collect()  # one row per GROUP — metadata-scale
        if isinstance(k_col_or_frac, str):
            raise NotImplementedError("per-group k columns: join and pass a float")
        f = float(k_col_or_frac)
        if not 0.0 < f <= 1.0:
            raise ValueError("fraction must be in (0, 1]")
        state = {}
        for r in rows:
            key = tuple(r[c] for c in group_cols)
            n = r["n"]
            k = int((n - 1) * f) + 1
            state[key] = [r["lo"], r["hi"], k, n]
        spark = df.sparkSession
        while True:
            live = {key: s for key, s in state.items() if s[0] < s[1]}
            if not live:
                break
            mid_rows = [
                (*key, (s[0] + s[1]) // 2) for key, s in live.items()
            ]
            mids = spark.createDataFrame(
                mid_rows, vals.select(*group_cols).schema.add("mid", "long")
            )
            counts = (
                vals.join(F.broadcast(mids), group_cols)
                .groupBy(*group_cols)
                .agg(
                    F.sum((F.col("v") <= F.col("mid")).cast("long")).alias("c"),
                    F.first("mid").alias("mid"),
                )
                .collect()
            )
            for r in counts:
                key = tuple(r[c] for c in group_cols)
                lo, hi, k, n = state[key]
                if r["c"] >= k:
                    state[key][1] = r["mid"]
                else:
                    state[key][0] = r["mid"] + 1
        out_rows = [
            (*key, s[3], s[2], s[0]) for key, s in state.items()
        ]
        schema = (
            vals.select(*group_cols)
            .schema.add("n", "long")
            .add("k", "long")
            .add("kth_value", "long")
        )
        return spark.createDataFrame(out_rows, schema)
    finally:
        vals.unpersist()
