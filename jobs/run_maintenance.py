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

Order matters and is fixed: deletes fold first (so compaction and blooms
see final rows), then compaction, then blooms (over the compacted files),
then expiry (reclaiming everything the earlier steps orphaned)."""

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
    args = ap.parse_args()

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
    if args.compact is not None:
        sid = table.compact(spark, max_files_per_partition=args.compact)
        man = table.current_manifest()["partitions"]
        out["steps"]["compact"] = {
            "snapshot": sid,
            "compacted_partitions": sum(1 for m in man.values() if "compacted_from" in m),
        }
    if args.bloom:
        sid = table.build_bloom(spark, args.bloom, distributed=args.bloom_distributed)
        out["steps"]["bloom"] = {"column": args.bloom, "snapshot": sid}
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
