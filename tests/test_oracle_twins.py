"""Ground-truth twins (queries.TWIN_QUERIES) vs their DuckDB oracles at
sf0.001: the exact quadratic reference implementations demoted from the
registered surface in r5 (VERDICT r4 item 8 — the registered surface is
uniformly 100×-safe, the twins keep full oracle-grade verification here)."""

import duckdb
import pytest

from erased_cells_spark.queries import TWIN_ORACLES, TWIN_QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(rows, cols):
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


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for tb in TABLES:
        con.sql(f"CREATE VIEW {tb} AS SELECT * FROM '{SF_DIR}/{tb}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(TWIN_QUERIES))
def test_twin_matches_oracle(spark, duck, name):
    sdf = TWIN_QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(TWIN_ORACLES[name])
    d_cols, d_rows = rel.columns, rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    a, b = _norm(s_rows, s_cols), _norm(d_rows, d_cols)
    assert len(a) == len(b)
    assert a == b
