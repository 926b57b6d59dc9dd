"""Built-in F.session_window vs the engine's lag-window sessionizer: the
two algorithms must produce the same sessions on the events table, and
the boundary convention AGREES too — both merge a gap of exactly 30 min
(session_window's window is closed at the end) and both split one
microsecond beyond, pinned on synthetic fixtures."""

from pyspark.sql import functions as F

from erased_cells_spark.queries import SPARK_QUERIES, t

SF_DIR = "/root/testdata/sf0.001"


def builtin_sessions(spark, df, gap="30 minutes"):
    return (
        df.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("start_s"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("end_s"),
        )
        .select("user_id", "n_events", "start_s", "end_s")
    )


def test_builtin_matches_lag_sessionizer_on_events(spark):
    e = t(spark, SF_DIR, "events")
    got = {
        (r["user_id"], r["start_s"]): (r["n_events"], r["end_s"])
        for r in builtin_sessions(spark, e).collect()
    }
    want = {
        (r["user_id"], r["start_s"]): (r["n_events"], r["end_s"])
        for r in SPARK_QUERIES["events_sessionize"](spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 50


def _lag_session_count(spark, df):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.col("ts") <= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES"), F.lit(0)
    ).otherwise(F.lit(1))
    return (
        df.withColumn("s", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .select("s").distinct().count()
    )


def test_boundary_convention_agreement_pinned(spark):
    def mk(ts2):
        return spark.createDataFrame(
            [(1, 1, "2024-01-01 10:00:00"), (1, 2, ts2)],
            "user_id LONG, event_id LONG, ts_s STRING",
        ).select("user_id", "event_id", F.col("ts_s").cast("timestamp").alias("ts"))

    # exactly the gap: BOTH merge (session_window's end is inclusive here)
    at_gap = mk("2024-01-01 10:30:00")
    assert builtin_sessions(spark, at_gap).count() == 1
    assert _lag_session_count(spark, at_gap) == 1
    # one microsecond past the gap: BOTH split
    past = mk("2024-01-01 10:30:00.000001")
    assert builtin_sessions(spark, past).count() == 2
    assert _lag_session_count(spark, past) == 2
