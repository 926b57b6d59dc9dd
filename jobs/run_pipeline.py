"""spark-submit entry point for the flagship pipeline with snapshot resume.

Usage:
    ./jobs/submit.sh jobs/run_pipeline.py --pages 1000000 --out /tmp/zc_snapshot
    ./jobs/submit.sh jobs/run_pipeline.py --warc /crawl/segment0 --out /tmp/zc_snapshot

Scans (or generates+materializes) the pages table, runs extract→geocode→
cell-encode→PIP→zonal counts, and commits results to an Iceberg-style
snapshot table with per-partition lineage + metrics. Re-running with the
same --out resumes: committed lineage partitions are skipped.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--input", default=None, help="existing pages parquet dir")
    ap.add_argument(
        "--warc",
        default=None,
        help=".warc/.warc.gz dir — Common-Crawl-style ingest: records parse "
        "per file (binaryFile scan), text/lang derive from html",
    )
    ap.add_argument("--out", required=True, help="snapshot table dir")
    ap.add_argument("--buckets", type=int, default=16, help="lineage partitions")
    args = ap.parse_args()

    from erased_cells_spark.pipeline import flagship_with_invariant
    from erased_cells_spark.plans.skew import apply_scale_conf
    from erased_cells_spark.sources.pages import generate_pages
    from erased_cells_spark.sources.snapshot import SnapshotTable

    builder = apply_scale_conf(SparkSession.builder.appName("erased-cells-flagship"))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.warc:
        from erased_cells_spark.functions.text import extract_text, lang_id
        from erased_cells_spark.sources.warc import read_warc

        raw = read_warc(spark, args.warc)
        # WARC records carry url/ts/html only; text and lang are DERIVED
        # here (the real ingest flow) — the pipeline's byte-identity
        # invariant then verifies extraction against exactly this column
        pages = raw.withColumn("text", extract_text(F.col("html"))).withColumn(
            "lang", lang_id(F.col("text"))
        )
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        pages = generate_pages(spark, args.pages, args.seed)

    # fused single scan: PIP aggregation + extraction byte-identity invariant
    out, obs = flagship_with_invariant(pages)
    result = out.withColumn("bucket", F.pmod(F.col("poly_id"), F.lit(args.buckets))).cache()
    result.count()  # materialize once; snapshot writes slice the cached result
    bad = obs.get["bad_extractions"]
    if bad:
        raise SystemExit(f"extraction invariant violated on {bad} rows")
    table = SnapshotTable(args.out)
    stats = table.write_partitions(result, "bucket", list(range(args.buckets)))
    print(json.dumps({"snapshot": table.metrics()["snapshot_id"], "partitions": stats}))
    spark.stop()


if __name__ == "__main__":
    main()
