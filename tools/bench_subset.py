"""Quick per-query timing for a subset of registered queries, bench-identical
session confs. Usage:
  python tools/bench_subset.py q1,q2,... [laps] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def build_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("erased-cells-bench-subset")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    names = sys.argv[1].split(",")
    laps_n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from erased_cells_spark.queries import SPARK_QUERIES

    for name in names:
        SPARK_QUERIES[name](spark, "/root/testdata/sf0.001").count()
    for name in names:
        fn = SPARK_QUERIES[name]
        laps = []
        for _ in range(laps_n):
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            laps.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name:35s} median={statistics.median(laps):7.3f}  {laps} rows={n}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
