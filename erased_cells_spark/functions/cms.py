"""Deterministic cross-engine Count-Min sketch — mergeable frequency
estimates in O(d*w) state, the counting sibling of the HLL
(functions/cardinality.py) and KMV (functions/kmv.py) sketches.

A CMS answers "how often did key X occur" without keeping per-key
counters: d hash rows of w counters each; every occurrence increments
one counter per row; the estimate is the MIN across rows. Guarantees
(Cormode & Muthukrishnan 2005, public literature):

  * never undercounts: estimate >= true count, always;
  * overcount bounded: estimate <= true + e*N with probability
    1 - (1/2)^d for w = 2/e (N = total stream weight).

Engine neutrality: the row hash is the shared md5-60-bit idiom salted
with the row index (md5('cms<r>-' || key)), the column is hv % w, and
EVERYTHING is exact int64 — counts, increments, the min — so the sketch
table and every estimate are bit-identical on any engine with no float
discipline needed at all.

Scale shape (100 TB): one map-side-combined groupBy(key) collapses the
stream to (key, n) — the only data-proportional shuffle — then the
counter table is at most d*w rows (metadata scale) regardless of key
cardinality. Counter tables MERGE BY ADDITION: per-day/per-shard
sketches sum cell-wise, so a rolling heavy-hitter dashboard unions
counter tables and never rescans history (the same persistence pattern
as the HLL register table). The point-query side broadcasts: keys to
probe are always metadata-small."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_col(key: "F.Column", row: "F.Column", w: int) -> "F.Column":
    """Column index of `key` in hash row `row`: md5('cms<r>-'||key) % w."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("cms"), row.cast("string"), F.lit("-"), key.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return h % w


def _with_rows(df: DataFrame, d: int) -> DataFrame:
    return df.withColumn("row", F.explode(F.array([F.lit(r) for r in range(d)])))


def cms_build(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the counter table (row, col, cnt) from an occurrence stream.
    Occurrences collapse to exact per-key weights first (map-side
    combine), then each key lands in one cell per row; absent cells are
    implicit zeros. Merge sketches by union + groupBy(row, col).sum."""
    if d < 1 or w < 2:
        raise ValueError("need d >= 1 hash rows and w >= 2 columns")
    weight = F.sum(F.col(weight_col)) if weight_col else F.count(F.lit(1))
    counts = df.groupBy(F.col(key_col).alias("k")).agg(weight.cast("long").alias("n"))
    cells = _with_rows(counts, d).select(
        "row", _row_col(F.col("k"), F.col("row"), w).alias("col"), "n"
    )
    return cells.groupBy("row", "col").agg(F.sum("n").alias("cnt"))


def cms_query(
    counters: DataFrame, keys: DataFrame, key_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Point-query a counter table: (key_col, cms_est) with cms_est the
    min across the key's d cells (missing cell = 0 -> the key was never
    seen and the estimate is exactly 0)."""
    probes = _with_rows(keys.select(F.col(key_col)).distinct(), d).select(
        key_col, "row", _row_col(F.col(key_col), F.col("row"), w).alias("col")
    )
    hit = probes.join(F.broadcast(counters), ["row", "col"], "left").select(
        key_col, F.coalesce("cnt", F.lit(0)).alias("cell")
    )
    return hit.groupBy(key_col).agg(F.min("cell").alias("cms_est"))
