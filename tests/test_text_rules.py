"""Gopher/C4 structural quality rules (functions/text.py): each rule must
FIRE on a crafted violating document and stay quiet on clean prose — the
synthetic fixture corpus is single-line/punctuation-free, so rule behavior
is proven here on adversarial inputs (the registered doc_gopher_quality
query proves engine parity on the fixtures)."""

import pytest
from pyspark.sql import functions as F

import erased_cells_spark.functions.text as T

CLEAN = "this is a perfectly reasonable paragraph of prose that should pass " * 3
BULLETY = "\n".join(["- item one", "- item two", "* item three", "intro line"])
ELLIPSY = "\n".join(["teaser one...", "teaser two…", "full sentence here."])
DUPLINES = "\n".join(["same boilerplate line"] * 8 + ["unique line"])
SYMBOLY = "#tag #tag #tag more... and more... #tag ..."
STOPPY = "the cat sat with the dog and that was that"
NOSTOPPY = "cat sat dog mat rug bug"


@pytest.fixture(scope="module")
def metrics(spark):
    rows = [
        ("clean", CLEAN),
        ("bullety", BULLETY),
        ("ellipsy", ELLIPSY),
        ("duplines", DUPLINES),
        ("symboly", SYMBOLY),
        ("stoppy", STOPPY),
        ("nostoppy", NOSTOPPY),
    ]
    df = spark.createDataFrame(rows, "name STRING, text STRING").select(
        "name",
        T.symbol_count(F.col("text")).alias("sym"),
        T.bullet_line_frac(F.col("text")).alias("bullet"),
        T.ellipsis_line_frac(F.col("text")).alias("ellipsis"),
        T.dup_line_frac(F.col("text")).alias("dupline"),
        T.stop_word_hits(F.col("text")).alias("stops"),
    )
    return {r.name: r for r in df.collect()}


class TestStructuralRules:
    def test_clean_prose_is_quiet(self, metrics):
        c = metrics["clean"]
        assert c.sym == 0.0
        assert c.bullet == 0.0 and c.ellipsis == 0.0 and c.dupline == 0.0
        assert c.stops >= 2  # 'this/is/a' aren't stops but 'that/of'... 'is a' no

    def test_bullet_fraction(self, metrics):
        assert metrics["bullety"].bullet == pytest.approx(3 / 4)
        assert metrics["ellipsy"].bullet == 0.0

    def test_ellipsis_fraction(self, metrics):
        assert metrics["ellipsy"].ellipsis == pytest.approx(2 / 3)
        assert metrics["bullety"].ellipsis == 0.0

    def test_duplicate_line_fraction(self, metrics):
        # 9 lines, 2 distinct → 1 - 2/9
        assert metrics["duplines"].dupline == pytest.approx(1 - 2 / 9)
        assert metrics["clean"].dupline == 0.0

    def test_symbol_count(self, metrics):
        # 4 '#' + 3 '...' occurrences
        assert metrics["symboly"].sym == pytest.approx(4 + 3.0)

    def test_stop_word_hits(self, metrics):
        # distinct stops in STOPPY: the, with, and, that → 4
        assert metrics["stoppy"].stops == 4
        assert metrics["nostoppy"].stops == 0

    def test_sql_twins_match(self, spark):
        """The DuckDB twins compute identical values on the crafted docs."""
        import duckdb

        con = duckdb.connect()
        rows = [
            ("bullety", BULLETY),
            ("ellipsy", ELLIPSY),
            ("duplines", DUPLINES),
            ("symboly", SYMBOLY),
            ("stoppy", STOPPY),
        ]
        con.execute("CREATE TABLE docs (name VARCHAR, text VARCHAR)")
        con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
        got = con.sql(
            f"""SELECT name, {T.sql_symbol_count('text')} AS sym,
                {T.sql_bullet_line_frac('text')} AS bullet,
                {T.sql_ellipsis_line_frac('text')} AS ellipsis,
                {T.sql_dup_line_frac('text')} AS dupline,
                {T.sql_stop_word_hits('text')} AS stops
                FROM docs ORDER BY name"""
        ).fetchall()
        sdf = spark.createDataFrame(rows, "name STRING, text STRING").select(
            "name",
            T.symbol_count(F.col("text")).alias("sym"),
            T.bullet_line_frac(F.col("text")).alias("bullet"),
            T.ellipsis_line_frac(F.col("text")).alias("ellipsis"),
            T.dup_line_frac(F.col("text")).alias("dupline"),
            T.stop_word_hits(F.col("text")).alias("stops"),
        )
        want = sorted([tuple(r) for r in sdf.collect()])
        assert sorted(got) == want
