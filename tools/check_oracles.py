"""Local twin of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against its oracle_sql() via DuckDB (row count, column
names, order-insensitive value comparison).
Usage: python tools/check_oracles.py [sf_dir] [only_query1,only_query2,...]
       python tools/check_oracles.py [sf_dir] --twins   # ground-truth twins
"""

import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
from erased_cells_spark.queries import (  # noqa: E402
    ORACLES,
    SPARK_QUERIES,
    TWIN_ORACLES,
    TWIN_QUERIES,
)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main(sf_dir="/root/testdata/sf0.01", only=None):
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    con = duckdb.connect()
    for tb in TABLES:
        con.sql(f"CREATE VIEW {tb} AS SELECT * FROM '{sf_dir}/{tb}.parquet'")

    if only == "--twins":
        queries, oracles, wanted = TWIN_QUERIES, TWIN_ORACLES, None
    else:
        queries, oracles = SPARK_QUERIES, ORACLES
        wanted = set(only.split(",")) if only else None
    failures = []
    import time as _time

    for name, fn in queries.items():
        if wanted is not None and name not in wanted:
            continue
        _t0 = _time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?   {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            rel = con.sql(sql)
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            failures.append((name, f"cols {s_cols} vs {d_cols}"))
            print(f"FAIL  {name}: column mismatch {s_cols} vs {d_cols}")
            continue
        a, b = norm(s_rows, s_cols), norm(d_rows, d_cols)
        if len(a) != len(b):
            failures.append((name, f"rowcount {len(a)} vs {len(b)}"))
            print(f"FAIL  {name}: rowcount {len(a)} vs {len(b)}")
            continue
        bad = [(x, y) for x, y in zip(a, b) if x != y]
        if bad:
            failures.append((name, f"{len(bad)} value mismatches; first: {bad[0]}"))
            print(f"FAIL  {name}: {len(bad)} mismatches; first: {bad[0]}")
        else:
            print(f"PASS  {name} ({len(a)} rows, {_time.perf_counter() - _t0:.1f}s)")
    spark.stop()
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main(*sys.argv[1:])
