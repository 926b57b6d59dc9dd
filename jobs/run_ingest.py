"""spark-submit entry point: WARC crawl segments → the PAGES snapshot table.

Usage:
    ./jobs/submit.sh jobs/run_ingest.py --warc /crawl/segment0 --out /tmp/pages_tbl \
        --batch 2025-08-17a [--buckets 8]

The upstream half of the CDC pipeline: each crawl drop lands as NEW
batch-keyed lineage partitions (`<batch>-<bucket>`), so downstream
consumers — `run_curation.py --src-table` and the `snapshot_cdc` stream —
see exactly one appended-partition delta per ingest and never rescan old
batches. text/lang are derived from html at ingest (extract_text +
lang_id), keeping the stored table in the input_hint shape. Re-running
the same --batch resumes (committed partitions skip); a new --batch
appends. Prints one JSON metrics line."""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def ingest_warc_batch(
    spark: SparkSession, warc_dir: str, out: str, batch: str, buckets: int = 8
) -> dict:
    """Parse the segment's WARC files, derive text/lang, and append as
    batch-keyed partitions. Callable from pytest and spark-submit."""
    from erased_cells_spark.functions.text import extract_text, lang_id
    from erased_cells_spark.sources.snapshot import SnapshotTable
    from erased_cells_spark.sources.warc import read_warc

    pages = (
        read_warc(spark, warc_dir)
        .withColumn("text", extract_text(F.col("html")))
        .withColumn("lang", lang_id(F.col("text")))
        # stable derived keys so the DOWNSTREAM curation/CDC consumers can
        # run unchanged over ingested crawls: doc_id = url hash (never
        # negative — it feeds md5-of-string sampling), source = host
        .withColumn(
            "doc_id", F.abs(F.xxhash64(F.col("url"))) % F.lit(1 << 62)
        )
        .withColumn(
            "source", F.regexp_extract(F.col("url"), r"https?://([^/]+)/", 1)
        )
        .withColumn(
            "part",
            F.concat(
                F.lit(f"{batch}-"),
                F.pmod(F.xxhash64(F.col("url")), F.lit(buckets)).cast("string"),
            ),
        )
    )
    table = SnapshotTable(out)
    stats = table.write_partitions(pages, "part", pages.select("part"))
    return {
        "out": out,
        "batch": batch,
        "snapshot": table.metrics()["snapshot_id"],
        "rows": sum(m["rows"] for m in stats.values()),
        "partitions": {k: m["rows"] for k, m in stats.items()},
        "skipped": sorted(k for k, m in stats.items() if m.get("skipped")),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warc", required=True, help=".warc/.warc.gz segment dir")
    ap.add_argument("--out", required=True, help="pages snapshot table dir")
    ap.add_argument("--batch", required=True, help="crawl batch name (lineage prefix)")
    ap.add_argument("--buckets", type=int, default=8)
    args = ap.parse_args()

    from erased_cells_spark.plans.skew import apply_scale_conf

    spark = apply_scale_conf(SparkSession.builder.appName("erased-cells-ingest")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    print(json.dumps(ingest_warc_batch(spark, args.warc, args.out, args.batch, args.buckets)))
    spark.stop()


if __name__ == "__main__":
    main()
