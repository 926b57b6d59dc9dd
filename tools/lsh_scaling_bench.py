"""Scaling-efficiency probe for the LSH dedup family (VERDICT r7 missing
item #6 / next-round #5): run the FULL MinHash-LSH near-dup pipeline
(shingles → 128-lane signatures → band buckets → guarded self-join →
exact-Jaccard verification) over a fixed 200k-document corpus at the
1-executor and 4-executor local-cluster levels (2 cores each — the same
N→4N separate-JVM protocol tools/scaling_bench.py uses for the flagship),
and report the efficiency t_N / (4 · t_4N).

Usage: python tools/lsh_scaling_bench.py [--runs 3]
Prints one JSON line; paste the numbers into BENCH.md's scaling section.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

PAGES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".data", "pages_200000")


def build_level(n_exec: int, cores_per_exec: int = 2):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local-cluster[{n_exec},{cores_per_exec},10240]"
        )
        .config("spark.driver.memory", "8g")
        .config("spark.executorEnv.PYTHONPATH", "/root/repo")
        .config("spark.sql.shuffle.partitions", str(n_exec * cores_per_exec * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run_once(spark) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from erased_cells_spark.operators.dedup import minhash_lsh_pairs

    base = spark.read.parquet(PAGES).select(
        F.xxhash64("url").alias("doc_id"), F.col("text")
    )
    # plant a deterministic 10% duplicate stratum (same text, new id) so the
    # candidate/verification stages process a REAL pair load, not just the
    # signature+band stages
    dups = base.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 0).select(
        (F.col("doc_id") + F.lit(1)).alias("doc_id"), "text"
    )
    docs = base.unionByName(dups)
    t0 = time.perf_counter()
    caches: list = []
    pairs = minhash_lsh_pairs(docs, 0.2, caches=caches)
    n = pairs.count()
    secs = time.perf_counter() - t0
    for c in caches:
        c.unpersist()
    return secs, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    out = {}
    for n_exec in (1, 4):
        spark = build_level(n_exec)
        spark.sparkContext.setLogLevel("ERROR")
        run_once(spark)  # warmup: JIT, python workers, file cache
        laps = []
        n_pairs = None
        for _ in range(args.runs):
            secs, n_pairs = run_once(spark)
            laps.append(round(secs, 3))
        out[f"exec{n_exec}"] = {
            "laps": laps,
            "median_s": round(statistics.median(laps), 3),
            "n_pairs": n_pairs,
        }
        spark.stop()
    eff = out["exec1"]["median_s"] / (4.0 * out["exec4"]["median_s"])
    out["efficiency_1to4"] = round(eff, 3)
    out["protocol"] = (
        "minhash_lsh_pairs end-to-end (shingle+sign+band join+exact verify) "
        "over .data/pages_200000, local-cluster[N,2,10240], warmup + median "
        f"of {args.runs}"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
