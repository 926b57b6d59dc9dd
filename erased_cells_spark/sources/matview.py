"""Generic incremental materialized aggregate over a SnapshotTable — the
engine's incremental-view-maintenance (IVM) surface: a persisted
GROUP BY (count + sums) kept in sync with its source table by consuming
the snapshot changelog, never rescanning unchanged data wholesale.

Maintenance model (the TilePyramid discipline, generalized):
  - model.json stores the spec (group cols, sum cols, bucket count) and
    the source-snapshot CURSOR the view is synced to.
  - refresh(): `src.changes(cursor, now)` yields the appended/deleted
    rows; the AFFECTED group keys are their distinct keys (churn-bounded
    — the one driver-side list, same contract as the pyramid's affected
    tiles). Those groups are recomputed ABSOLUTELY from the source's
    current snapshot (filtered by key, so a source clustered/bucketed on
    the group key prunes; a crash mid-refresh replays to the identical
    state — delta-application would double-count on replay, recompute
    cannot). Groups that vanished merge as n=0 rows and are swept by one
    copy-on-write delete_where("n = 0"), preserving the invariant that
    the view never stores empty groups.
  - the cursor advances only after the data commits, so every failure
    window replays forward.

Aggregate scope: count + sum(cols) — the distributive aggregates that
are exactly recomputable per group from the source (avg derives
downstream as sum/n). min/max would need the same recompute anyway
(they are not self-maintainable under deletes), so they compose the
same way if ever added; count-distinct does not and is explicitly out.

The view is itself a SnapshotTable (hash-bucketed on the group key), so
it time-travels, tags, serves SQL views, and participates in its own
downstream changelogs like any other table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from erased_cells_spark.sources.snapshot import SnapshotTable

_SEP = "\x1f"


def _gkey(cols: list[str]):
    return F.concat_ws(_SEP, *[F.col(c).cast("string") for c in cols])


class MaterializedAggregate:
    def __init__(self, path: str):
        self.path = path
        self.table = SnapshotTable(os.path.join(path, "view"))
        self._model_path = os.path.join(path, "model.json")

    # ----- model ----------------------------------------------------------
    @property
    def model(self) -> dict:
        with open(self._model_path) as f:
            return json.load(f)

    def _save_model(self, m: dict) -> None:
        tmp = self._model_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._model_path)

    def exists(self) -> bool:
        return os.path.exists(self._model_path)

    # ----- aggregation kernel (shared by build and refresh) ---------------
    def _derive(self, df: DataFrame, m: dict) -> DataFrame:
        """Apply the model's derive_exprs (SQL-string projections computed
        BEFORE grouping — group columns may BE derived, e.g. a sketch
        bucket h % m or a time bin). SQL strings serialize into the JSON
        model, so the derivation replays identically on every refresh."""
        for name, sql in (m.get("derive_exprs") or {}).items():
            df = df.withColumn(name, F.expr(sql))
        return df

    def _aggregate(self, df: DataFrame, m: dict) -> DataFrame:
        aggs = (
            [F.count("*").alias("n")]
            + [
                F.sum(F.col(c).cast("double")).alias(f"sum_{c}")
                for c in m["sum_cols"]
            ]
            + [
                F.expr(sql).alias(name)
                for name, sql in (m.get("agg_exprs") or {}).items()
            ]
        )
        out = self._derive(df, m).groupBy(*m["group_cols"]).agg(*aggs)
        return out.withColumn("gkey", _gkey(m["group_cols"])).withColumn(
            "bucket", F.pmod(F.xxhash64("gkey"), F.lit(m["n_buckets"]))
        )

    # ----- build ----------------------------------------------------------
    def build(
        self,
        spark: SparkSession,
        src: SnapshotTable,
        group_cols: list[str],
        sum_cols: list[str] | None = None,
        n_buckets: int = 8,
        derive_exprs: dict[str, str] | None = None,
        agg_exprs: dict[str, str] | None = None,
    ) -> dict:
        """`agg_exprs` (name -> SQL aggregate string) generalizes the view
        beyond count/sum — because refresh recomputes affected groups
        ABSOLUTELY (never applies deltas), the aggregates need not be
        invertible: max-merged HLL registers, KMV bottom-k arrays, CMS
        cells, min/max, exact distincts all maintain correctly under
        append AND delete windows (the sketch modules' 'persist as a
        table and merge incrementally' promise, kept by this one path).
        `derive_exprs` (col -> SQL string) are projections computed before
        grouping — group columns may be derived (sketch bucket, time bin)."""
        if self.exists():
            raise ValueError(f"materialized aggregate already exists at {self.path}")
        if not group_cols:
            raise ValueError("group_cols must be non-empty")
        # "gkey"/"bucket" are the view's own key/partition columns and "n"
        # the tombstone marker: a user column by those names would be
        # silently overwritten — fail loud instead
        reserved = {"gkey", "bucket", "n"}
        clash = reserved & (
            set(group_cols) | set(derive_exprs or {}) | set(agg_exprs or {})
        )
        if clash:
            raise ValueError(f"reserved column names: {sorted(clash)}")
        m = {
            "group_cols": list(group_cols),
            "sum_cols": list(sum_cols or []),
            "n_buckets": int(n_buckets),
            "derive_exprs": dict(derive_exprs or {}),
            "agg_exprs": dict(agg_exprs or {}),
            "src_snapshot": src.metrics()["snapshot_id"],
        }
        agg = self._aggregate(src.read(spark), m)
        # every bucket partition must exist up front: merge() inserts into
        # named partitions only
        self.table.write_partitions(agg, "bucket", list(range(m["n_buckets"])))
        os.makedirs(self.path, exist_ok=True)
        self._save_model(m)
        return {"mode": "build", "groups": agg.count(), "src_snapshot": m["src_snapshot"]}

    # ----- refresh --------------------------------------------------------
    def refresh(self, spark: SparkSession, src: SnapshotTable) -> dict:
        m = self.model
        from_sid = m["src_snapshot"]
        to_sid = src.metrics()["snapshot_id"]
        if to_sid == from_sid:
            return {"mode": "noop", "src_snapshot": from_sid}
        ch = src.changes(spark, from_sid, to_sid)
        keys = (
            self._derive(ch["appended"], m).select(*m["group_cols"])
            .unionByName(self._derive(ch["deleted"], m).select(*m["group_cols"]))
            .select(_gkey(m["group_cols"]).alias("gkey"))
            .distinct()
        )
        affected = sorted(r["gkey"] for r in keys.collect())  # churn-bounded
        if not affected:
            self._save_model({**m, "src_snapshot": int(to_sid)})
            return {"mode": "noop-data", "from": from_sid, "to": to_sid}
        cur = self._derive(src.read(spark, snapshot_id=to_sid), m).withColumn(
            "__src_g", _gkey(m["group_cols"])
        )
        fresh = self._aggregate(
            cur.filter(F.col("__src_g").isin(affected)).drop("__src_g"), m
        ).cache()
        try:
            # groups with no surviving source rows merge as n=0 tombstones,
            # keeping their previous key/bucket/group columns
            gone = [g for g in {r["gkey"] for r in fresh.select("gkey").collect()}
                    .symmetric_difference(affected)]
            updates = fresh
            if gone:
                old = self.table.read(spark).filter(F.col("gkey").isin(gone))
                zeroed = old.withColumn("n", F.lit(0).cast("long"))
                for c in m["sum_cols"]:
                    zeroed = zeroed.withColumn(f"sum_{c}", F.lit(None).cast("double"))
                updates = fresh.unionByName(zeroed)
            self.table.merge(spark, updates, key_col="gkey", lineage_col="bucket")
            deleted = self.table.delete_where(spark, "n = 0")
            self._save_model({**m, "src_snapshot": int(to_sid)})
            return {
                "mode": "incremental",
                "from": from_sid,
                "to": to_sid,
                "affected_groups": len(affected),
                "vanished_groups": len(gone),
                "changes_scan": dict(src.last_scan or {}),
                "view_snapshot": deleted,
            }
        finally:
            fresh.unpersist()

    # ----- read -----------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        m = self.model
        return self.table.read(spark).select(
            *m["group_cols"],
            "n",
            *[f"sum_{c}" for c in m["sum_cols"]],
            *list(m.get("agg_exprs") or {}),
        )
