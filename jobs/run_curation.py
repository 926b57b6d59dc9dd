"""spark-submit entry point for the END-TO-END training-data curation run.

Usage:
    ./jobs/submit.sh jobs/run_curation.py --input /root/testdata/sf0.01/documents.parquet \
        --out /tmp/curated_snapshot [--eval-source src0] [--buckets 8]

The full keep-list pipeline over a documents table, committed to an
Iceberg-style snapshot table with per-partition lineage + metrics:

  1. language filter (lang_id == en)  ∧  quality floor  ∧  the STRUCTURAL
     C4/Gopher rules (symbol-to-word ratio, bullet/ellipsis line
     fractions, duplicate-line fraction)  ∧  deterministic md5 hash
     downsample — all scan-side per-row JVM predicates, zero shuffle;
  2. Gopher REPETITION rules (word-count bounds, duplicate-word fraction,
     top-word share, mean word length) — one explode + two combinable
     aggregations, semi-join back;
  3. eval-set DECONTAMINATION: docs sharing a 13-gram with the --eval-source
     slice are dropped (the benchmark-leak guard);
  4. MinHash-LSH near-dup clustering over the survivors (hot-bucket
     guarded); non-canonical cluster members dropped;
  5. keep list written to the snapshot sink (resumable: re-running with the
     same --out skips committed lineage partitions), with per-stage drop
     counts reported as job metrics.

Re-run with the same --out to verify resume (all partitions 'skipped').
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, source, text)")
    ap.add_argument("--out", required=True, help="snapshot table dir")
    ap.add_argument("--eval-source", default="src0", help="source treated as the eval corpus")
    ap.add_argument("--buckets", type=int, default=8, help="lineage partitions")
    ap.add_argument("--sample-pct", type=int, default=60)
    ap.add_argument("--quality-floor", type=float, default=0.35)
    ap.add_argument(
        "--bloom",
        action="store_true",
        help="build a per-partition doc_id Bloom index on the keep-list "
        "snapshot (point lookups then skip bloom-proven-absent partitions)",
    )
    args = ap.parse_args()

    from erased_cells_spark.functions import text as T
    from erased_cells_spark.operators.components import connected_components
    from erased_cells_spark.operators.decontam import ngram_overlap_flags
    from erased_cells_spark.operators.dedup import minhash_lsh_pairs
    from erased_cells_spark.plans.skew import apply_scale_conf
    from erased_cells_spark.sources.snapshot import SnapshotTable

    spark = apply_scale_conf(SparkSession.builder.appName("erased-cells-curation")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(args.input)
    n_total = docs.count()
    ev = docs.filter(F.col("source") == args.eval_source)
    train = docs.filter(F.col("source") != args.eval_source)

    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    # the structural C4/Gopher rules are pure per-row expressions — they
    # ride the same scan as lang/quality/sample (n_words denominator =
    # whitespace token count, so no aggregation is needed at this stage)
    structural_ok = (
        (T.symbol_count(F.col("text")) / T.token_count(F.col("text")) < 0.1)
        & (T.bullet_line_frac(F.col("text")) <= 0.9)
        & (T.ellipsis_line_frac(F.col("text")) <= 0.3)
        & (T.dup_line_frac(F.col("text")) < 0.3)
    )
    scan_pass = (
        train.filter(
            (T.lang_id(F.col("text")) == "en")
            & (T.quality_score(F.col("text")) >= args.quality_floor)
            & structural_ok
            & (h < args.sample_pct)
        )
        .select("doc_id", "text")
        .cache()
    )
    n_filtered = scan_pass.count()

    # Gopher repetition rules need per-doc word statistics: one explode +
    # two map-side-combinable aggregations, then a semi-join keep
    words = scan_pass.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    per = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("max_c"),
        (
            F.sum(F.length("w") * F.col("c")).cast("double") / F.sum("c").cast("double")
        ).alias("mean_wlen"),
    )
    rep_ok = per.filter(
        (F.col("n_words") >= 20)
        & (1.0 - F.col("n_distinct").cast("double") / F.col("n_words").cast("double") < 0.55)
        & (F.col("max_c").cast("double") / F.col("n_words").cast("double") < 0.10)
        & (F.col("mean_wlen") >= 3.0)
        & (F.col("mean_wlen") <= 8.0)
    ).select("doc_id")
    survivors = scan_pass.join(rep_ok, "doc_id", "semi").cache()
    n_gopher = survivors.count()

    flags = ngram_overlap_flags(survivors, ev, n=13).withColumnRenamed("train_id", "doc_id")
    clean = survivors.join(flags, "doc_id", "left_anti").cache()
    n_clean = clean.count()

    caches: list = []
    pairs = minhash_lsh_pairs(clean, 0.2, caches=caches)
    cc = connected_components(pairs, "id_a", "id_b")
    for c in caches:
        c.unpersist()
    drops = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    keep = (
        clean.join(drops, "doc_id", "left_anti")
        .select("doc_id")
        .withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(args.buckets)))
        .cache()
    )
    n_keep = keep.count()

    table = SnapshotTable(args.out)
    stats = table.write_partitions(keep, "bucket", list(range(args.buckets)))
    bloom_metrics = None
    if args.bloom:
        # point-lookup index: keep-list ids are hash-bucketed (unsorted per
        # partition), so zone maps can't answer "is doc X kept" without
        # opening every partition — the bloom can
        table.build_bloom(spark, "doc_id")
        probe = keep.select("doc_id").first()
        plan = table.plan_scan(where=[("doc_id", "=", probe.doc_id)]) if probe else None
        bloom_metrics = {
            "indexed": True,
            "probe_partitions_read": len(plan["read"]) if plan else None,
            "partitions_total": plan["partitions_total"] if plan else None,
        }
    scan_pass.unpersist()
    survivors.unpersist()
    clean.unpersist()
    keep.unpersist()
    print(
        json.dumps(
            {
                "snapshot": table.metrics()["snapshot_id"],
                "docs_total": n_total,
                "after_lang_quality_structural_sample": n_filtered,
                "after_gopher_repetition": n_gopher,
                "after_decontam": n_clean,
                "keep_list": n_keep,
                "bloom": bloom_metrics,
                "partitions": stats,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
