"""Bucketed co-located joins: same-key/same-count bucketing on both sides
must produce a join plan with ZERO Exchange (shuffle) operators, and the
join result must equal the plain shuffled join."""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.plans.bucketing import (
    read_table,
    shuffle_count,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the test proves BUCKET co-location, not
    broadcast avoidance (the tables are tiny enough to broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    a = spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("va")
    )
    b = spark.range(0, 20_000, 2).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("vb")
    )
    write_bucketed(a, "bkt_a", "k", 8, path=str(base / "a"))
    write_bucketed(b, "bkt_b", "k", 8, path=str(base / "b"))
    yield "bkt_a", "bkt_b", a, b
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")


class TestBucketing:
    def test_bucketed_join_has_no_shuffle(self, spark, bucketed, no_broadcast):
        ta, tb, _, _ = bucketed
        j = read_table(spark, ta).join(read_table(spark, tb), "k")
        n = j.count()
        assert n == 10_000
        assert shuffle_count(j) == 0  # co-located: no shuffle on either side

    def test_plain_join_does_shuffle(self, spark, bucketed, no_broadcast):
        _, _, a, b = bucketed
        j = a.join(b, "k")
        j.count()
        assert shuffle_count(j) > 0  # the baseline the bucketing removes

    def test_bucketed_equals_plain(self, spark, bucketed):
        ta, tb, a, b = bucketed
        got = sorted(
            tuple(r) for r in read_table(spark, ta).join(read_table(spark, tb), "k").collect()
        )
        want = sorted(tuple(r) for r in a.join(b, "k").collect())
        assert got == want

    def test_bucketed_groupby_has_no_shuffle(self, spark, bucketed):
        ta, _, _, _ = bucketed
        g = read_table(spark, ta).groupBy("k").agg(F.sum("va").alias("s"))
        g.count()
        assert shuffle_count(g) == 0  # agg on the bucket key reuses layout
