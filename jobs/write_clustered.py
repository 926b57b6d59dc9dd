"""spark-submit entry point: rewrite a points table into the spatially-
clustered parquet layout and report the prunability gain from the footers.

Usage:
    ./jobs/submit.sh jobs/write_clustered.py --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/docs_clustered [--res 12] [--partitions 8]

The input is geocoded with the engine's deterministic geocoder (documents
carry no lon/lat), clustered on the res-level grid key, and the job prints
one JSON line comparing per-row-group cell-key spans before/after — the
direct measure of how many row groups a spatial box scan can skip."""

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
    args = ap.parse_args()

    from erased_cells_spark.functions.geocode import geocode_lat, geocode_lon
    from erased_cells_spark.plans.skew import apply_scale_conf
    from erased_cells_spark.sources.layout import (
        rowgroup_cell_spans,
        write_spatially_clustered,
    )

    spark = apply_scale_conf(SparkSession.builder.appName("write-clustered")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    df = spark.read.parquet(args.input)
    if "lon" not in df.columns:
        key = F.concat(F.col("source"), F.lit("-"), F.col("doc_id").cast("string"))
        df = df.withColumn("lon", geocode_lon(key)).withColumn("lat", geocode_lat(key))

    write_spatially_clustered(
        df, args.out, res=args.res, n_partitions=args.partitions
    )
    spans = rowgroup_cell_spans(args.out)
    full_range = (1 << args.res) * (1 << args.res)
    print(
        json.dumps(
            {
                "out": args.out,
                "row_groups": len(spans),
                "median_cell_span": sorted(spans)[len(spans) // 2],
                "full_key_range": full_range,
                "prunability": 1 - (sorted(spans)[len(spans) // 2] / full_range),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
