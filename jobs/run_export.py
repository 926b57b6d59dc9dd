"""spark-submit entry point for SORTED SHARD EXPORT — the training-data
handoff: read a snapshot table (optionally a tag/branch, optionally
filtered), write N globally-ordered parquet shards plus the
footer-verified `_manifest.json`, and print one JSON metrics line.

    ./jobs/submit.sh jobs/run_export.py --table /path/to/snapshot \
        --out /path/to/export --order-by doc_id [--shards 16] \
        [--ref v1] [--where "lang = 'en'"]

The ordering invariant is verified from the written parquet footers
BEFORE the manifest lands (operators/export.py) — a failed invariant
aborts the export rather than shipping an unordered corpus."""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="snapshot table dir")
    ap.add_argument("--out", required=True, help="export dir (must not exist)")
    ap.add_argument("--order-by", required=True, metavar="C1,C2")
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--ref", default=None, help="export a tag/branch instead of CURRENT")
    ap.add_argument("--where", default=None, help="SQL filter applied before export")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from erased_cells_spark.operators.export import export_sorted_shards
    from erased_cells_spark.plans.skew import apply_scale_conf
    from erased_cells_spark.sources.snapshot import SnapshotTable

    spark = apply_scale_conf(
        SparkSession.builder.appName("erased-cells-export")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    table = SnapshotTable(args.table)
    df = table.read(spark, ref=args.ref)
    if args.where:
        df = df.filter(args.where)
    manifest = export_sorted_shards(
        df, args.out, args.order_by.split(","), n_shards=args.shards
    )
    print(
        json.dumps(
            {
                "table": args.table,
                "ref": args.ref,
                "out": args.out,
                "order_by": manifest["order_cols"],
                "n_shards": manifest["n_shards"],
                "total_rows": manifest["total_rows"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
