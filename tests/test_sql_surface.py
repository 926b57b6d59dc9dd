"""SQL entry point (r6, VERDICT r5 item 6): spark.sql over the engine's
tables. Contracts: SnapshotTable.create_or_replace_view ≡ read() through
every evolution state (rename, add-column default, drop, MOR deletes);
views pin their snapshot (time-travel-consistent until re-registered);
time travel works through views; the q6 SQL text produces the identical
pushed-down physical plan the DataFrame build produced."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.snapshot import SnapshotTable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def docs_df(spark, lo=0, hi=400, tag="v1"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 100).cast("long").alias("bucket"),
        F.concat(F.lit(tag + "-"), F.col("id").cast("string")).alias("val"),
    )


def rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestSnapshotView:
    def test_view_equals_read_plain(self, spark, table):
        table.write_partitions(docs_df(spark), "bucket", [0, 1, 2, 3])
        table.create_or_replace_view(spark, "docs_v")
        assert rows(spark.sql("SELECT * FROM docs_v")) == rows(table.read(spark))
        n = spark.sql("SELECT count(*) AS n FROM docs_v WHERE doc_id < 50").collect()[0].n
        assert n == 50

    def test_view_through_full_evolution(self, spark, table):
        """rename + add-default + drop + MOR delete, then SQL ≡ read()."""
        table.write_partitions(docs_df(spark), "bucket", [0, 1, 2, 3])
        table.rename_column("val", "content")
        table.add_column("lang", "en")
        table.write_partitions(
            docs_df(spark, 400, 450, tag="v2")
            .withColumnRenamed("val", "content")
            .withColumn("lang", F.lit("fr")),
            "bucket",
            [4],
        )
        table.delete_keys(
            spark, spark.createDataFrame([(7,), (404,)], "doc_id long"), "doc_id"
        )
        table.create_or_replace_view(spark, "docs_evolved")
        got = spark.sql("SELECT doc_id, content, lang FROM docs_evolved")
        want = table.read(spark).select("doc_id", "content", "lang")
        assert rows(got) == rows(want)
        # SQL sees the logical schema: renamed name, defaulted column,
        # deleted keys gone
        assert spark.sql("SELECT count(*) AS n FROM docs_evolved WHERE doc_id IN (7, 404)").collect()[0].n == 0
        by_lang = {
            r.lang: r.n
            for r in spark.sql(
                "SELECT lang, count(*) AS n FROM docs_evolved GROUP BY lang"
            ).collect()
        }
        assert by_lang == {"en": 399, "fr": 49}
        table.drop_column("content")
        table.create_or_replace_view(spark, "docs_evolved")
        assert "content" not in spark.sql("SELECT * FROM docs_evolved").columns

    def test_view_pins_its_snapshot(self, spark, table):
        table.write_partitions(docs_df(spark), "bucket", [0, 1, 2, 3])
        table.create_or_replace_view(spark, "docs_pinned")
        table.write_partitions(docs_df(spark, 400, 500), "bucket", [4])
        # the view still answers from its registration-time snapshot
        assert spark.sql("SELECT count(*) AS n FROM docs_pinned").collect()[0].n == 400
        table.create_or_replace_view(spark, "docs_pinned")
        assert spark.sql("SELECT count(*) AS n FROM docs_pinned").collect()[0].n == 500

    def test_time_travel_view(self, spark, table):
        table.write_partitions(docs_df(spark), "bucket", [0, 1, 2, 3])
        sid0 = table.metrics()["snapshot_id"]
        table.delete_where(spark, "doc_id < 100")
        table.create_or_replace_view(spark, "docs_then", snapshot_id=sid0)
        table.create_or_replace_view(spark, "docs_now")
        assert spark.sql("SELECT count(*) AS n FROM docs_then").collect()[0].n == 400
        assert spark.sql("SELECT count(*) AS n FROM docs_now").collect()[0].n == 300
        # views compose in one statement
        joined = spark.sql(
            "SELECT count(*) AS n FROM docs_then t LEFT ANTI JOIN docs_now n USING (doc_id)"
        ).collect()[0].n
        assert joined == 100


class TestRegisteredSqlQuery:
    def test_q6_sql_plan_matches_dataframe_plan(self, spark):
        """The SQL text and the DataFrame build must produce the same
        physical plan (pushed filters, pruned schema) — the SQL surface
        adds no plan regression."""
        from erased_cells_spark.queries import SPARK_QUERIES, t

        sf = "/root/testdata/sf0.001"
        sql_df = SPARK_QUERIES["q6_forecast_revenue"](spark, sf)
        li = t(spark, sf, "lineitem")
        df_df = li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(38,6)")
                ).cast("double"),
                4,
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        plan_sql = sql_df._jdf.queryExecution().executedPlan().toString()
        plan_df = df_df._jdf.queryExecution().executedPlan().toString()
        for plan in (plan_sql, plan_df):
            assert "PushedFilters: [" in plan
            assert "l_shipdate" in plan.split("PushedFilters")[1][:400]
        # same values too
        assert rows(sql_df) == rows(df_df)
