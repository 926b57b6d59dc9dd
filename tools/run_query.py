"""Run any registered query by name — the 'switch to this repo and run what
you run today' entry point.

Usage:
    python tools/run_query.py <query> [sf_dir] [--explain] [--limit N] [--cpus N]
    python tools/run_query.py --list
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query", nargs="?", help="registered query name (see --list)")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    ap.add_argument("--limit", type=int, default=20, help="rows to show")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from erased_cells_spark.queries import ORACLES, SPARK_QUERIES, TWIN_QUERIES

    if args.list or not args.query:
        for name in SPARK_QUERIES:
            mark = "oracle" if name in ORACLES else "rows-only"
            print(f"{name}  [{mark}]")
        for name in TWIN_QUERIES:
            print(f"{name}  [ground-truth twin]")
        return

    if args.query in TWIN_QUERIES:
        SPARK_QUERIES = {**SPARK_QUERIES, **TWIN_QUERIES}  # twins runnable too
    if args.query not in SPARK_QUERIES:
        sys.exit(f"unknown query {args.query!r} — try --list")

    from bench import build_spark

    spark = build_spark(args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = SPARK_QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    print(f"-- {df.count()} rows total")
    spark.stop()


if __name__ == "__main__":
    main()
