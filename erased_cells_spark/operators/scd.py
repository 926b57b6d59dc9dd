"""SCD Type 2 dimension build: turn a change-event stream into
validity-interval history rows — the standard warehouse shape for
"what was this entity's state at time T" (user plan/segment history,
page-language history, zone assignment history).

Input: one row per observed state (key, order, attributes). Output: one
row per STATE RUN with

    valid_from  — first observation of the run
    valid_to    — start of the next run (NULL for the current run;
                  half-open [valid_from, valid_to) intervals, so
                  as-of-T lookup is valid_from <= T < valid_to)
    version     — 1-based run index per key
    is_current  — valid_to IS NULL

Change compression: consecutive observations with identical attributes
collapse into one run (lag-compare), so re-observing an unchanged state
never mints a spurious version — the property that keeps the dimension
table O(changes), not O(observations).

Exactness: pure window functions over the caller's total order (include
a unique tie-break column!); timestamps and attributes pass through
untouched, so output is bit-identical cross-engine — proven by the
events_scd2_dim twin.

Scale shape (100 TB): one shuffle on the key, two window passes (the
second over the already-compressed runs). Mega-key skew has the same
remedy surface as sessionization. For INCREMENTAL maintenance compose
with SnapshotTable.changes(): re-derive only keys present in the
changelog window and MERGE the rebuilt slices (the matview.py pattern —
recompute affected groups absolutely; deltas would double-count)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    attr_cols: list[str],
    *,
    ts_col: str | None = None,
) -> DataFrame:
    """Build the type-2 dimension. `order_cols` must totally order each
    key's observations (e.g. [ts, event_id]); `ts_col` (default: first
    order col) supplies the validity-interval timestamps."""
    if not key_cols or not order_cols or not attr_cols:
        raise ValueError("key_cols, order_cols and attr_cols are all required")
    ts_col = ts_col or order_cols[0]
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w)
        # NULL-safe inequality: a run boundary is any non-equal transition,
        # including NULL <-> value; eqNullSafe treats NULL == NULL
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.row_number().over(w) == 1
    runs = df.withColumn("__is_change", first | changed).filter(F.col("__is_change"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        runs.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("version", F.row_number().over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "version", "is_current")
    )


def scd2_as_of(dim: DataFrame, ts) -> DataFrame:
    """Point-in-time slice of a type-2 dimension: the state of every key
    at timestamp `ts` (half-open interval semantics)."""
    return dim.filter(
        (F.col("valid_from") <= F.lit(ts))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(ts)))
    )
