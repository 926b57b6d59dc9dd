"""AS-OF join: for each left row, the latest right row of the same key with
right.ts <= left.ts — the canonical time-series enrichment (classic example
of an operator the reference ecosystem gets from kdb/QuestDB/DuckDB and
Spark lacks as a builtin; the builder brief names it explicitly).

Spark-first implementation: the UNION-SORT trick, not a range join —
tag both sides, sort each key's rows by (ts, side), and carry the right
side's values forward with last(..., ignorenulls) over a running window.
Cost profile: ONE shuffle on the key (the window partition), no candidate
explosion, no per-row Python — at 100 TB this is a single exchange of
(key, ts, payload) rows, the same shape as any groupBy, where a naive
range join would be quadratic per key and an interval-bucketed join would
shuffle every left row once per probed bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by_col: str,
    ts_col: str,
    right_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Left as-of join. Every left row is kept; `right_cols` are filled from
    the LATEST right row with right.ts <= left.ts (strict: <) for the same
    `by_col`, or NULL when no such row exists.

    Determinism: if the right side can hold several rows at the same
    (by, ts), pre-aggregate it to one row per (by, ts) first — ties inside
    the window ordering would otherwise be partition-order dependent (the
    registered query does exactly that; DuckDB's ASOF JOIN has the same
    uniqueness requirement for a deterministic answer)."""
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: right_cols {sorted(clash)} collide with left columns — "
            "the union-sort merge would silently mix the two; alias the right "
            "side first"
        )
    # a NULL-ts right row would sort FIRST (asc nulls-first) and leak its
    # payload to every left row as a "before everything" value — a null
    # timestamp matches nothing under as-of semantics, so drop it.
    # right_cols travel as ONE struct: a single last(ignorenulls) fill
    # guarantees every payload column comes from the SAME (latest) right row
    # and that a genuinely-NULL payload inside that row is preserved — a
    # per-column fill would skip a NULL payload in favor of an older row and
    # could mix columns from different right rows.
    r = right.filter(F.col(ts_col).isNotNull()).select(
        F.col(by_col),
        F.col(ts_col).alias("_ts"),
        F.lit(0 if not strict else 2).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rpay"),
    )
    l_cols = left.columns
    lt = left.withColumn("_ts", F.col(ts_col)).withColumn("_side", F.lit(1))
    u = lt.unionByName(r, allowMissingColumns=True)
    # inclusive: right (_side 0) sorts BEFORE left (1) at equal ts, so an
    # equal-timestamp right row is visible to the left row; strict: right
    # sorts AFTER (2) and is not
    w = (
        Window.partitionBy(by_col)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("_rpay", F.last("_rpay", ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).select(
        *l_cols, *[F.col(f"_rpay.{c}").alias(c) for c in right_cols]
    )


def asof_join_np(left_rows, right_rows, strict: bool = False):
    """Brute-force twin (pytest oracle): left_rows = [(key, ts, ...)],
    right_rows = [(key, ts, payload)]; returns {id(left index): payload or
    None} by scanning all right rows per left row."""
    out = []
    for lrow in left_rows:
        lk, lts = lrow[0], lrow[1]
        best = None
        for rk, rts, payload in right_rows:
            if rk != lk:
                continue
            if (rts < lts) if strict else (rts <= lts):
                if best is None or rts > best[0]:
                    best = (rts, payload)
        out.append(best[1] if best else None)
    return out
