"""spark-submit entry point for the DATASET CARD — the one-page JSON
datasheet a curation pipeline publishes with every corpus release
(Datasheets-for-Datasets style, as a QUERY over the corpus rather than
hand-written prose):

    ./jobs/submit.sh jobs/run_datasheet.py --input docs.parquet
    ./jobs/submit.sh jobs/run_datasheet.py --table /path/snapshot [--ref v1]

One JSON line composing the engine's audit operators — all exact,
deterministic, and individually twin-/contract-verified elsewhere:

  counts/languages/sources   plain aggregations
  length profile             exact quartiles of n_chars (integer cents
                             discipline: chars ARE ints)
  quality                    quality_score >= 0.5 keep rate
                             (functions/text.py; the registered
                             doc_gopher_quality carries the full rules)
  duplication                exact-hash dup rate (md5 groupBy)
  pii                        email/phone/card/ipv4 hit counts + redaction
                             delta (functions/pii.py)
  k_anonymity                exposure below k over (source, lang,
                             n_chars-band) (functions/pii.py)
  diversity                  Simpson index over sources (sum-of-squares
                             exact int, one divide)

The card is METADATA-SIZED regardless of corpus scale: every section is
a map-side-combined aggregation; nothing data-proportional reaches the
driver. Pytest drives the module function; the submit surface is this
wrapper."""

from __future__ import annotations

import argparse
import json


def build_datasheet(spark, df) -> dict:
    from pyspark.sql import functions as F

    from erased_cells_spark.functions.pii import k_anonymity_audit, pii_counts
    from erased_cells_spark.functions.text import quality_score

    n = df.count()
    langs = {
        r.lang: r.c
        for r in df.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    sources = df.groupBy("source").agg(F.count("*").alias("c"))
    n_sources = sources.count()
    sumsq = sources.agg(F.sum(F.col("c") * F.col("c")).alias("s")).collect()[0].s
    simpson = round(1.0 - sumsq / (n * n), 6) if n else None

    qs = df.agg(
        F.expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D))").alias("q")
    ).collect()[0].q
    length_profile = {"q25": int(qs[0]), "q50": int(qs[1]), "q75": int(qs[2])}

    quality = df.select(
        (quality_score(F.col("text")) >= 0.5).alias("keep")
    ).agg(F.sum(F.col("keep").cast("long")).alias("kept")).collect()[0]
    dup = (
        df.groupBy(F.md5(F.col("text")).alias("h"))
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(F.col("c") - 1).alias("extra"),
            F.count(F.lit(1)).alias("distinct_texts"),
        )
        .collect()[0]
    )
    pii = df.select(
        *[v.alias(k) for k, v in pii_counts(F.col("text")).items()]
    ).agg(*[F.sum(k).alias(k) for k in pii_counts(F.col("text"))]).collect()[0]

    qi = df.select(
        "source", "lang", F.expr("n_chars div 100").alias("len_band")
    )
    _, exposure = k_anonymity_audit(qi, ["source", "lang", "len_band"], [5])
    exp = exposure.collect()[0]

    return {
        "n_docs": n,
        "languages": langs,
        "n_sources": n_sources,
        "source_simpson_diversity": simpson,
        "length_chars": length_profile,
        "quality_keep_rate": round(quality.kept / n, 6) if n else None,
        "exact_dup_rate": round(dup.extra / n, 6) if n else None,
        "distinct_texts": dup.distinct_texts,
        "pii_hits": {k: int(pii[k]) for k in pii.asDict()},
        "k_anonymity": {
            "qi": "source x lang x 100-char band",
            "k": 5,
            "rows_below": exp.rows_below,
            "frac_below": round(exp.frac_below, 6),
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="documents parquet path")
    ap.add_argument("--table", default=None, help="snapshot table dir")
    ap.add_argument("--ref", default=None, help="tag/branch when using --table")
    args = ap.parse_args()
    if bool(args.input) == bool(args.table):
        ap.error("exactly one of --input / --table")

    from pyspark.sql import SparkSession

    from erased_cells_spark.plans.skew import apply_scale_conf

    spark = apply_scale_conf(
        SparkSession.builder.appName("erased-cells-datasheet")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.input:
        df = spark.read.parquet(args.input)
    else:
        from erased_cells_spark.sources.snapshot import SnapshotTable

        df = SnapshotTable(args.table).read(spark, ref=args.ref)
    print(json.dumps(build_datasheet(spark, df), sort_keys=True))


if __name__ == "__main__":
    main()
