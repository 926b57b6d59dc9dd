"""Persisted, incrementally-maintained TILE PYRAMID table — the raster
counterpart of the persisted ANN index (operators/ann_index.py): overview
levels are TABLES maintained from the source's CDC changelog, not per-query
recomputes.

Layout: `path/model.json` (res, tile_shift, n_levels, lon/lat columns, and
the source snapshot cursor) + `path/tiles`, a SnapshotTable with one
partition per level (`L{res}` .. `L{res-n_levels}`) holding TILE rows
(level, tile_key, cell_type, cols, rows, data, mask) plus the composite
merge key `lk = part ':' tile_key` (tile keys repeat across levels, merge
needs table-unique keys).

refresh() is O(churn x levels), never O(table):

1. `src.changes(from, to)` yields the appended+deleted rows (partition-diff
   pruned — untouched source partitions are never scanned);
2. their points mark the AFFECTED base tiles (pure JVM cell/tile key
   arithmetic); the current source is re-read FILTERED to those tiles and
   re-rasterized — only geography someone touched recomputes. (The filter
   is a derived-key predicate: on a Morton-clustered source it prunes via
   zone maps, on an unclustered one it is a scan-side filter — the same
   trade plan_scan documents.)
3. upward, level by level: an affected parent's 4 child tiles are read
   back from the pyramid (IN-pushdown pruned), the stale affected children
   replaced by their recomputed versions, and downsample_tiles re-derives
   exactly the affected parents;
4. one copy-on-write delete removes tiles that became EMPTY, one MERGE
   upserts the recomputed tiles, the cursor advances. A crash between the
   two commits replays idempotently on the next refresh (the delete
   matches nothing, the merge rewrites identical content) because the
   cursor only advances after both.

Affected-key sets live on the driver: they are bounded by churn x levels
(metadata scale, same contract as polygon cover rows), never by table size.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from erased_cells_spark.operators.cells_expr import cell_key_expr
from erased_cells_spark.operators.raster import (
    _tile_key_expr,
    build_overviews,
    downsample_tiles,
    rasterize_points,
)
from erased_cells_spark.sources.snapshot import SnapshotTable

_TILE_COLS = ["tile_key", "cell_type", "cols", "rows", "data", "mask"]


def _parent_key(tkey: int, res: int, tile_shift: int) -> int:
    tn = 1 << (res - tile_shift)
    tiy, tix = divmod(tkey, tn)
    return (tiy >> 1) * (tn >> 1) + (tix >> 1)


def _child_keys(pkey: int, parent_res: int, tile_shift: int) -> list[int]:
    tn_p = 1 << (parent_res - tile_shift)
    tn_c = tn_p << 1
    piy, pix = divmod(pkey, tn_p)
    return [
        (piy * 2 + dy) * tn_c + (pix * 2 + dx) for dy in (0, 1) for dx in (0, 1)
    ]


class TilePyramid:
    """See module docstring."""

    def __init__(self, path: str):
        self.path = path
        self.table = SnapshotTable(os.path.join(path, "tiles"))
        self.model_path = os.path.join(path, "model.json")

    def exists(self) -> bool:
        return os.path.exists(self.model_path)

    @property
    def model(self) -> dict:
        with open(self.model_path) as f:
            return json.load(f)

    def _save_model(self, model: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self.model_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(model, f)
        os.replace(tmp, self.model_path)

    def _stamp(self, tiles: DataFrame, level: int) -> DataFrame:
        part = f"L{level}"
        return tiles.select(
            F.lit(part).alias("part"),
            F.lit(level).alias("level"),
            F.concat(F.lit(part + ":"), F.col("tile_key").cast("string")).alias("lk"),
            *_TILE_COLS,
        )

    # -------------------------------------------------------------- build --
    def build(
        self,
        spark: SparkSession,
        src: SnapshotTable,
        *,
        lon_col: str = "lon",
        lat_col: str = "lat",
        res: int = 8,
        tile_shift: int = 4,
        n_levels: int = 2,
    ) -> dict:
        if self.exists():
            raise ValueError(f"TilePyramid already built at {self.path}")
        pts = src.read(spark)
        base = rasterize_points(pts, res, tile_shift, lon_col=lon_col, lat_col=lat_col)
        stamped = self._stamp(base, res)
        for r, lv in build_overviews(base, res, tile_shift, n_levels):
            stamped = stamped.unionByName(self._stamp(lv, r))
        out = self.table.write_partitions(
            stamped, "part", [f"L{res - k}" for k in range(n_levels + 1)],
            commit_batch=0,
        )
        for part, m in out.items():
            if m.get("rows", 0) == 0:
                raise ValueError(f"pyramid build produced an empty level {part}")
        self._save_model(
            {
                "res": res, "tile_shift": tile_shift, "n_levels": n_levels,
                "lon_col": lon_col, "lat_col": lat_col,
                "src_snapshot": int(src.metrics()["snapshot_id"]),
            }
        )
        return {p: m["rows"] for p, m in out.items()}

    # ------------------------------------------------------------ refresh --
    def refresh(self, spark: SparkSession, src: SnapshotTable) -> dict:
        m = self.model
        res, ts, n_levels = m["res"], m["tile_shift"], m["n_levels"]
        lon_col, lat_col = m["lon_col"], m["lat_col"]
        from_sid = m["src_snapshot"]
        to_sid = src.metrics()["snapshot_id"]
        if to_sid == from_sid:
            return {"mode": "noop", "src_snapshot": from_sid}
        ch = src.changes(spark, from_sid, to_sid)
        changed_pts = ch["appended"].select(lon_col, lat_col).unionByName(
            ch["deleted"].select(lon_col, lat_col)
        )
        tkey = _tile_key_expr(
            cell_key_expr(F.col(lon_col), F.col(lat_col), res), res, ts
        )
        affected = sorted(
            r.tk for r in changed_pts.select(tkey.alias("tk")).distinct().collect()
        )
        if not affected:  # metadata-only window: just advance the cursor
            self._save_model({**m, "src_snapshot": int(to_sid)})
            return {"mode": "noop-data", "from": from_sid, "to": to_sid}

        cur = src.read(spark).filter(tkey.isin([int(t) for t in affected]))
        new_tiles = rasterize_points(cur, res, ts, lon_col=lon_col, lat_col=lat_col)
        updates = self._stamp(new_tiles, res)
        stats = {res: len(affected)}
        prev_new, prev_affected, r_child = new_tiles, set(affected), res
        for _ in range(n_levels):
            r_par = r_child - 1
            parents = sorted({_parent_key(t, r_child, ts) for t in prev_affected})
            need = sorted(
                {c for p in parents for c in _child_keys(p, r_par, ts)}
                - prev_affected
            )
            stale = None
            if need:
                stale = self.table.read(
                    spark,
                    where=[("level", "=", r_child), ("tile_key", "in", need)],
                ).select(*_TILE_COLS)
            children = prev_new if stale is None else prev_new.unionByName(stale)
            new_par = downsample_tiles(children, r_child, ts)
            updates = updates.unionByName(self._stamp(new_par, r_par))
            stats[r_par] = len(parents)
            prev_new, prev_affected, r_child = new_par, set(parents), r_par

        # recompute once; drive both the empty-tile delete and the merge
        # from the same materialized update set
        upd_rows = updates.localCheckpoint(eager=True)
        present = {
            (r.level, r.tile_key)
            for r in upd_rows.select("level", "tile_key").collect()
        }
        preds = []
        r_lvl = res
        all_affected = {res: set(affected)}
        lvl_aff = set(affected)
        for _ in range(n_levels):
            lvl_aff = {_parent_key(t, r_lvl, ts) for t in lvl_aff}
            r_lvl -= 1
            all_affected[r_lvl] = set(lvl_aff)
        for lvl, keys in all_affected.items():
            empty = sorted(k for k in keys if (lvl, k) not in present)
            if empty:
                preds.append(
                    f"(level = {lvl} AND tile_key IN ({', '.join(map(str, empty))}))"
                )
        n_deleted = 0
        if preds:
            self.table.delete_where(spark, " OR ".join(preds))
            n_deleted = sum(p.count(",") + 1 for p in preds)
        self.table.merge(spark, upd_rows, "lk", "part")
        self._save_model({**m, "src_snapshot": int(to_sid)})
        return {
            "mode": "incremental",
            "from": from_sid,
            "to": to_sid,
            "affected_per_level": {str(k): v for k, v in stats.items()},
            "emptied_tiles": n_deleted,
            "changes_scan": src.last_changes_scan,
        }

    # -------------------------------------------------------------- reads --
    def level(self, spark: SparkSession, level: int) -> DataFrame:
        """Tiles of one level (partition-pruned read)."""
        return self.table.read(spark, where=[("level", "=", level)]).select(
            *_TILE_COLS
        )
