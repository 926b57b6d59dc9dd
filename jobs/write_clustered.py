"""spark-submit entry point: rewrite a points table into the spatially-
clustered parquet layout and report the prunability gain from the footers.

Usage:
    ./jobs/submit.sh jobs/write_clustered.py --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/docs_clustered [--res 12] [--partitions 8]

The input is geocoded with the engine's deterministic geocoder (documents
carry no lon/lat), clustered on the res-level MORTON cell id (r6;
--curve rowmajor keeps the old 1-D layout for comparison), and the job
prints one JSON line with per-row-group key spans plus the fraction of row
groups a fixed set of box queries skips at the footer."""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--res", type=int, default=12)
    ap.add_argument("--partitions", type=int, default=8)
    ap.add_argument(
        "--curve", default="morton", choices=["morton", "rowmajor", "hilbert"]
    )
    args = ap.parse_args()

    from erased_cells_spark.functions.geocode import geocode_lat, geocode_lon
    from erased_cells_spark.plans.skew import apply_scale_conf
    from erased_cells_spark.sources.layout import (
        box_query_ranges,
        rowgroup_cell_spans,
        rowgroups_touched,
        write_spatially_clustered,
    )

    spark = apply_scale_conf(SparkSession.builder.appName("write-clustered")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    df = spark.read.parquet(args.input)
    if "lon" not in df.columns:
        key = F.concat(F.col("source"), F.lit("-"), F.col("doc_id").cast("string"))
        df = df.withColumn("lon", geocode_lon(key)).withColumn("lat", geocode_lat(key))

    write_spatially_clustered(
        df, args.out, res=args.res, n_partitions=args.partitions, curve=args.curve
    )
    key = "cell" if args.curve == "rowmajor" else "zcell"
    spans = rowgroup_cell_spans(args.out, key)
    full_range = (
        ((1 << (2 * args.res)) << 5) if args.curve == "morton" else (1 << (2 * args.res))
    )
    # box-scan prunability: fraction of row groups a fixed set of ~20°
    # box queries can SKIP at the footer (the operational number — the
    # Morton layout prunes in both axes, see sources/layout.py)
    boxes = [
        (-120.3, -45.7, -100.1, -25.9),
        (-29.7, -60.2, -9.4, -40.3),
        (10.7, 20.4, 30.2, 40.8),
        (100.2, 50.1, 120.9, 70.6),
    ]
    touched = total = 0
    for box in boxes:
        t, n = rowgroups_touched(
            args.out, key, box_query_ranges(*box, res=args.res, curve=args.curve)
        )
        touched += t
        total += n
    print(
        json.dumps(
            {
                "out": args.out,
                "curve": args.curve,
                "row_groups": len(spans),
                "median_cell_span": sorted(spans)[len(spans) // 2],
                "full_key_range": full_range,
                "prunability": 1 - (sorted(spans)[len(spans) // 2] / full_range),
                "box_rowgroups_touched": touched,
                "box_rowgroups_total": total,
                "box_prune_fraction": round(1 - touched / total, 4) if total else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
