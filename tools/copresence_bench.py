"""Scaling probe for the interval-overlap (co-presence) join — the
radius_bench discipline applied to this session's exactly-once family:
same synthetic input, two parallelism levels, throughput + efficiency,
plus the brute-join gap at one level.

    python tools/copresence_bench.py [n_intervals] [cores_lo] [cores_hi]

Prints one JSON line. Input: n deterministic intervals over k cells and
a 30-day span (xxhash64 arithmetic — no python in the generate path);
the measured op is interval_overlap_pairs + a count (forces the full
join). Efficiency = (rows/s hi) / (rows/s lo * hi/lo)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _intervals(spark, n: int):
    from pyspark.sql import functions as F

    day_us = 86_400_000_000
    # cells scale with n so PAIR OUTPUT stays ~linear in n (constant
    # per-(cell, bucket) density) — otherwise the probe measures n^2
    # output materialization, not the join
    k_cells = max(64, n // 31_250)
    return spark.range(n).select(
        F.col("id").alias("iid"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(k_cells)).alias("cell"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(30 * day_us)).alias("s_us"),
        (
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(30 * day_us))
            + F.pmod(F.xxhash64("id", F.lit(3)), F.lit(3_600_000_000))
        ).alias("e_us"),
    )


def _run(master: str, n: int) -> tuple[float, int]:
    from pyspark.sql import SparkSession

    from erased_cells_spark.operators.interval import interval_overlap_pairs

    spark = (
        SparkSession.builder.master(master)
        .appName("copresence-bench")
        .config("spark.sql.shuffle.partitions", str(max(8, int(master[6:-1]) * 2)))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    try:
        iv = _intervals(spark, n).localCheckpoint(eager=True)  # untimed input
        t0 = time.time()
        pairs = interval_overlap_pairs(
            iv, ["cell"], "iid", "s_us", "e_us", bucket=3_600_000_000
        ).count()
        return time.time() - t0, pairs
    finally:
        spark.stop()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    t_lo, p_lo = _run(f"local[{lo}]", n)
    t_hi, p_hi = _run(f"local[{hi}]", n)
    assert p_lo == p_hi, (p_lo, p_hi)
    r_lo, r_hi = n / t_lo, n / t_hi
    eff = (r_hi / r_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "op": "interval_overlap_pairs",
                "n_intervals": n,
                "pairs": p_lo,
                "cores": [lo, hi],
                "secs": [round(t_lo, 2), round(t_hi, 2)],
                "rows_per_sec": [round(r_lo), round(r_hi)],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
