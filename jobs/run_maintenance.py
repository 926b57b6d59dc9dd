"""spark-submit entry point for snapshot TABLE MAINTENANCE — the ops that
keep a 100 TB table healthy between ingest runs, each optional and
composable, reported as one JSON metrics line:

    ./jobs/submit.sh jobs/run_maintenance.py --table /path/to/snapshot \
        [--apply-deletes] [--compact N] [--bloom COL] [--expire KEEP]

  --apply-deletes  fold pending merge-on-read delete files into
                   copy-on-write rewrites of the affected partitions
  --compact N      rewrite partitions with more than N files down to N
                   (small-file compaction after streaming ingest)
  --bloom COL      (re)build per-partition Bloom filters on COL
                   (point-lookup pruning on unsorted keys)
  --expire KEEP    drop all but the newest KEEP snapshots and GC
                   unreferenced data dirs, group manifests, delete files
  --zorder LON,LAT[:RES[:KEY]]  declare a Z-order sort-order spec on the
                   table (r7): the NEXT --compact (this run or any later
                   one) re-clusters un-stamped partitions on the Morton
                   key and feeds its footer stats to the zone maps
  --sort-by C1,C2  declare a plain multi-column sort spec instead
  --clear-sort-order  remove the spec (data stays as last written)
  --pyramid DIR [--pyramid-res R --pyramid-levels N]  build (first run) or
                   incrementally refresh (later runs, O(churn) via the
                   table's CDC changelog) the persisted tile pyramid at
                   DIR over this table's lon/lat columns
                   (sources/pyramid.TilePyramid)

  --create-tag NAME[:SID] / --create-branch NAME[:SID] /
  --fast-forward NAME / --drop-ref NAME  (r7) named-ref lifecycle: pin
                   releases, fork/publish write-audit-publish staging
                   branches, release pins for GC

Order matters and is fixed: deletes fold first (so compaction and blooms
see final rows), then the sort-order spec (so this run's compaction
already honors it), then compaction, then blooms (over the compacted
files), then refs (so a fresh tag protects this run's state), then
expiry (reclaiming everything the earlier steps orphaned, except what
tags and live branches pin)."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="snapshot table dir")
    ap.add_argument("--apply-deletes", action="store_true")
    ap.add_argument("--compact", type=int, default=None, metavar="N")
    ap.add_argument("--bloom", default=None, metavar="COL")
    ap.add_argument(
        "--bloom-distributed",
        action="store_true",
        help="fold bloom bits executor-side (the 100 TB path: key sets "
        "never reach the driver; bit-identical output)",
    )
    ap.add_argument("--expire", type=int, default=None, metavar="KEEP")
    ap.add_argument(
        "--ndv", default=None, metavar="COL",
        help="ANALYZE: commit per-partition deterministic-HLL registers on "
        "COL (metadata-only) and report the merged table-level NDV estimate",
    )
    ap.add_argument("--zorder", default=None, metavar="LON,LAT[:RES[:KEY]]")
    ap.add_argument(
        "--zorder-curve", default="morton", choices=["morton", "hilbert"],
        help="clustering curve for --zorder (hilbert = unit-step locality)",
    )
    ap.add_argument("--pyramid", default=None, metavar="DIR")
    ap.add_argument(
        "--matview", default=None, metavar="DIR",
        help="build (first run) or incrementally refresh (later runs, "
        "recompute-affected-groups from the table changelog) a persisted "
        "GROUP BY view at DIR (sources/matview.MaterializedAggregate)",
    )
    ap.add_argument("--matview-group", default=None, metavar="C1,C2")
    ap.add_argument("--matview-sum", default=None, metavar="C1,C2")
    ap.add_argument("--pyramid-res", type=int, default=8)
    ap.add_argument("--pyramid-levels", type=int, default=2)
    ap.add_argument("--sort-by", default=None, metavar="C1,C2,...")
    ap.add_argument("--clear-sort-order", action="store_true")
    ap.add_argument(
        "--create-tag", default=None, metavar="NAME[:SID]",
        help="pin a main snapshot (CURRENT or :SID) under an immutable "
        "name; tagged snapshots are exempt from --expire",
    )
    ap.add_argument(
        "--create-branch", default=None, metavar="NAME[:SID]",
        help="fork a write-audit-publish staging branch from a main snapshot",
    )
    ap.add_argument(
        "--fast-forward", default=None, metavar="NAME",
        help="publish a branch head to main (fails loud if main moved "
        "since the fork)",
    )
    ap.add_argument(
        "--drop-ref", default=None, metavar="NAME",
        help="remove a tag/branch pointer; the next --expire sweeps a "
        "dropped branch's manifests and exclusive data dirs",
    )
    args = ap.parse_args()
    if sum(x is not None and x is not False
           for x in (args.zorder, args.sort_by, args.clear_sort_order)) > 1:
        ap.error("--zorder / --sort-by / --clear-sort-order are exclusive")

    from pyspark.sql import SparkSession

    from erased_cells_spark.plans.skew import apply_scale_conf
    from erased_cells_spark.sources.snapshot import SnapshotTable

    spark = apply_scale_conf(
        SparkSession.builder.appName("erased-cells-maintenance")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    table = SnapshotTable(args.table)
    before = table.metrics()
    out: dict = {
        "table": args.table,
        "snapshot_before": before["snapshot_id"],
        "n_partitions": before["n_partitions"],
        "steps": {},
    }
    if args.apply_deletes:
        pending = before["pending_delete_files"]
        sid = table.apply_deletes(spark)
        out["steps"]["apply_deletes"] = {"folded_files": pending, "snapshot": sid}
    if args.zorder:
        head, *rest = args.zorder.split(":")
        cols = head.split(",")
        spec = {"kind": "zorder", "cols": cols, "curve": args.zorder_curve}
        if rest:
            spec["res"] = int(rest[0])
        if len(rest) > 1:
            spec["key_col"] = rest[1]
        sid = table.set_sort_order(spec)
        out["steps"]["sort_order"] = {"spec": table.sort_order(), "snapshot": sid}
    elif args.sort_by:
        sid = table.set_sort_order({"kind": "sorted", "cols": args.sort_by.split(",")})
        out["steps"]["sort_order"] = {"spec": table.sort_order(), "snapshot": sid}
    elif args.clear_sort_order:
        sid = table.set_sort_order(None)
        out["steps"]["sort_order"] = {"spec": None, "snapshot": sid}
    if args.compact is not None:
        sid = table.compact(spark, max_files_per_partition=args.compact)
        man = table.current_manifest()["partitions"]
        fp = (
            SnapshotTable._sort_order_fp(table.sort_order())
            if table.sort_order() else None
        )
        out["steps"]["compact"] = {
            "snapshot": sid,
            "compacted_partitions": sum(1 for m in man.values() if "compacted_from" in m),
            "clustered_partitions": sum(
                1 for m in man.values() if fp and m.get("sorted_by") == fp
            ),
        }
    if args.bloom:
        sid = table.build_bloom(spark, args.bloom, distributed=args.bloom_distributed)
        out["steps"]["bloom"] = {"column": args.bloom, "snapshot": sid}
    if args.ndv:
        sid = table.build_ndv(spark, args.ndv)
        out["steps"]["ndv"] = {"column": args.ndv, "snapshot": sid, **table.ndv(args.ndv)}
    if args.pyramid:
        from erased_cells_spark.sources.pyramid import TilePyramid

        pyr = TilePyramid(args.pyramid)
        if pyr.exists():
            out["steps"]["pyramid"] = pyr.refresh(spark, table)
        else:
            rows = pyr.build(
                spark, table, res=args.pyramid_res, n_levels=args.pyramid_levels
            )
            out["steps"]["pyramid"] = {"mode": "build", "rows_per_level": rows}
    def _ref_arg(v: str):
        name, _, sid = v.partition(":")
        return name, (int(sid) if sid else None)

    if args.create_tag:
        name, sid = _ref_arg(args.create_tag)
        out["steps"]["create_tag"] = table.create_tag(name, snapshot_id=sid)
    if args.create_branch:
        name, sid = _ref_arg(args.create_branch)
        out["steps"]["create_branch"] = table.create_branch(name, snapshot_id=sid)
    if args.fast_forward:
        sid = table.fast_forward(args.fast_forward)
        out["steps"]["fast_forward"] = {"ref": args.fast_forward, "snapshot": sid}
    if args.drop_ref:
        table.drop_ref(args.drop_ref)
        out["steps"]["drop_ref"] = {"ref": args.drop_ref}
    if args.matview:
        from erased_cells_spark.sources.matview import MaterializedAggregate

        mv = MaterializedAggregate(args.matview)
        if mv.exists():
            out["steps"]["matview"] = mv.refresh(spark, table)
        else:
            if not args.matview_group:
                ap.error("--matview first build needs --matview-group")
            out["steps"]["matview"] = mv.build(
                spark, table,
                group_cols=args.matview_group.split(","),
                sum_cols=args.matview_sum.split(",") if args.matview_sum else [],
            )
    if args.expire is not None:
        res = table.expire_snapshots(keep_last=args.expire)
        out["steps"]["expire"] = {
            "expired_snapshots": len(res["expired_snapshots"]),
            "deleted_dirs": len(res["deleted_dirs"]),
            "deleted_manifests": len(res["deleted_manifests"]),
        }
    out["snapshot_after"] = table.metrics()["snapshot_id"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
