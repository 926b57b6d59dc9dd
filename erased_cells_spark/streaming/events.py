"""Streaming operators: watermarked tumbling-window aggregation and custom
stateful sessionization (applyInPandasWithState) over the events table.

Batch twins of both live in queries.py (events_hourly / events_sessionize)
so streaming output is checked against the DuckDB-oracle-verified batch
results with availableNow triggers — the Spark-idiomatic replacement for the
reference's (nonexistent) streaming surface, per the north rule.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", StringType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str, max_files: int | None = 1) -> DataFrame:
    """File-source stream over the events parquet (schema pinned from the
    batch table; maxFilesPerTrigger simulates micro-batch arrival).

    The file stream source needs a directory; the driver tables are single
    files, so a file path is staged into a temp dir once."""
    import hashlib
    import os
    import shutil

    src = f"{sf_dir}/events.parquet"
    if os.path.isfile(src):
        stage = f"/tmp/events_stream_{hashlib.md5(src.encode()).hexdigest()[:8]}"
        dst = os.path.join(stage, "events.parquet")
        if not os.path.exists(dst):
            os.makedirs(stage, exist_ok=True)
            shutil.copy(src, dst)
        src = stage

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    reader = spark.readStream.schema(schema)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    df = reader.parquet(src)
    # watermarks require TIMESTAMP (tz-aware); the table stores NTZ — the cast
    # keeps the wall-clock value under the session time zone, so formatted
    # output matches the batch twin exactly
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling 1-hour counts per event type — late data beyond
    the watermark is dropped; state is bounded (north-rule scale: state size
    is O(open windows × types), independent of stream length)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH").alias("hour_s"),
            "event_type",
            "n",
            "sum_value",
        )
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_s", StringType()),
        StructField("n_events", LongType()),
    ]
)
_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
    ]
)

GAP_MS = 30 * 60 * 1000


def _sessionize(key, pdfs, state: GroupState):
    """Custom stateful operator: gap-based sessions (30 min), one state row
    per user; emits closed sessions on gap (in-data) or EVENT-time timeout
    (the watermark passing last_event + gap). Event-time — not wall-clock —
    timeouts make replayed/backfilled streams close sessions identically to
    live ones: a processing-time pause between micro-batches never splits a
    session (tested in tests/test_streaming.py)."""
    user_id = key[0]
    if state.hasTimedOut:
        start_ms, last_ms, n = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "session_start_s": _fmt(start_ms), "n_events": n}]
        )
        return

    ts_all = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
    ms = (ts_all.astype("int64") // 1_000_000).to_list()
    out = []
    if state.exists:
        start_ms, last_ms, n = state.get
    else:
        start_ms, last_ms, n = ms[0], ms[0], 0
    for t in ms:
        if t - last_ms > GAP_MS:
            out.append({"user_id": user_id, "session_start_s": _fmt(start_ms), "n_events": n})
            start_ms, n = t, 0
        last_ms = t
        n += 1
    state.update((start_ms, last_ms, n))
    # the timeout must sit strictly above the current watermark (Spark
    # rejects it otherwise); a session already expired relative to the
    # watermark times out at the next trigger
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(last_ms + GAP_MS, wm + 1))
    yield pd.DataFrame(out, columns=["user_id", "session_start_s", "n_events"])


def _fmt(ms: int) -> str:
    return pd.Timestamp(ms, unit="ms").strftime("%Y-%m-%d %H:%M:%S")


def stream_to_snapshot(
    stream: DataFrame, table_path: str, query_name: str = "to_snapshot", checkpoint: str | None = None
):
    """writeStream → Iceberg-style snapshot table: each micro-batch commits
    atomically under lineage key 'batch-{id}' via the manifest protocol, so
    downstream readers see only complete batches and a restarted query
    (Spark's own streaming checkpoint + our manifest) never double-commits —
    foreachBatch idempotence via lineage-skip."""
    from erased_cells_spark.sources.snapshot import SnapshotTable

    table = SnapshotTable(table_path)

    def sink(batch_df: DataFrame, batch_id: int):
        key = f"batch-{batch_id}"
        if key in table.committed_lineage():
            return  # replayed batch after restart: already committed, skip
        from pyspark.sql import functions as F

        table.write_partitions(
            batch_df.withColumn("_lineage", F.lit(key)), "_lineage", [key]
        )

    return (
        stream.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint or f"/tmp/ckpt_{query_name}")
        .trigger(availableNow=True)
        .start()
    )


def purchases_join_views_stream(
    stream: DataFrame, gap: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked STREAM-STREAM self-join: each purchase joins the same
    user's views in [purchase.ts − gap, purchase.ts]. Both sides carry
    watermarks and the join condition carries the event-time band, so
    Spark's join state is BOUNDED (views older than purchase-watermark −
    gap are evicted) — the attribution join of an event pipeline, safe on
    an unbounded stream. Batch twin: the identical join on the static
    table (tested equal under availableNow)."""
    p = (
        stream.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", watermark)
    )
    v = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("v_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    return p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {gap}"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "inner",
    ).select("user_id", "p_id", "v_id")


def purchases_left_join_views_stream(
    stream: DataFrame, gap: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """LEFT OUTER watermarked stream-stream join: like
    purchases_join_views_stream, but purchases with NO view in their
    attribution window still emit — with NULL view columns — once the
    watermark proves no matching view can ever arrive (Spark holds the
    unmatched left row in state until left-side eviction time passes).
    This is the attribution join a funnel actually needs: the
    'organic purchase' rows are the interesting ones, and an inner join
    silently drops them. Batch twin: the identical LEFT join on the
    static table — equality incl. the null rows is the test contract."""
    p = (
        stream.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", watermark)
    )
    v = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("v_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    return p.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {gap}"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "leftOuter",
    ).select("user_id", "p_id", "v_id")


def dedupe_stream(
    stream: DataFrame, key_cols: tuple[str, ...] = ("event_id",), watermark: str = "2 hours"
) -> DataFrame:
    """Streaming EXACT dedup for at-least-once sources (replayed Kafka
    offsets, retried file commits): dropDuplicatesWithinWatermark keeps a
    key in state only until the watermark passes its event time, so state
    is O(distinct keys within the watermark window) — bounded regardless of
    stream length — while duplicates arriving within the window are dropped
    exactly like the batch twin's dropDuplicates."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(key_cols))


def sessionize_stream(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """applyInPandasWithState gap-sessionization with EVENT-time timeouts
    (watermark-driven): sessions close when the event-time watermark passes
    last_event + gap, never on wall-clock — replay/backfill safe. State per
    user is O(1); the watermark bounds both state retention and late data."""
    return (
        stream.withWatermark("ts", watermark)
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
