"""Streaming flagship: a pages STREAM driven through the same extract →
geocode → cell-encode → PIP enrichment as the batch pipeline, landing in the
Iceberg-style snapshot sink with per-micro-batch lineage.

Plan shape per micro-batch is identical to the batch flagship's hot path —
JVM extraction/geocode/cell key, broadcast polygon-cover equi-join
(stream-static joins broadcast the STATIC side, so the stream is never
shuffled), one Arrow winding verify — which is exactly what the north rule's
"resumable tile/join state" wants: enrichment is append-only per batch;
aggregations run downstream on the committed snapshot (batch reads see only
complete batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from erased_cells_spark.functions.geocode import geocode_lat, geocode_lon, host_of
from erased_cells_spark.functions.text import extract_text
from erased_cells_spark.operators.cells_expr import cell_key_expr
from erased_cells_spark.operators.pip import DEFAULT_COVER_RES, pip_test_udf, polygon_cells_df


def pages_file_stream(spark: SparkSession, path: str, max_files: int | None = 1) -> DataFrame:
    """File-source stream over a pages parquet directory (schema pinned from
    a batch read; maxFilesPerTrigger simulates WARC-segment arrival)."""
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    return reader.parquet(path)


def enrich_pages_stream(
    stream: DataFrame, polygons: list[dict], res: int = DEFAULT_COVER_RES
) -> DataFrame:
    """stream(url, warc_ts, html, text, lang) → (url, host, extracted, lon,
    lat, cell, poly_id): extraction + geocode + cell key (all JVM builtins)
    then the PIP containment join against the static polygon set (broadcast
    cover cells + Arrow winding verify — same operators as batch pip_join,
    stream-compatible because the stream side never shuffles)."""
    spark = stream.sparkSession
    g = (
        stream.withColumn("host", host_of(F.col("url")))
        .withColumn("extracted", extract_text(F.col("html")))
        .withColumn("lon", geocode_lon(F.col("host")))
        .withColumn("lat", geocode_lat(F.col("host")))
        .withColumn("cell", cell_key_expr(F.col("lon"), F.col("lat"), res))
        .select("url", "host", "extracted", "lon", "lat", "cell")
    )
    cells = polygon_cells_df(spark, polygons, res)
    cand = g.join(F.broadcast(cells), "cell")
    inside = pip_test_udf(polygons)(F.col("lon"), F.col("lat"), F.col("poly_id"))
    return cand.filter(inside).drop("cell")


def stream_pages_to_snapshot(
    spark: SparkSession,
    src_path: str,
    table_path: str,
    polygons: list[dict],
    checkpoint: str,
    max_files: int | None = 1,
    query_name: str = "pages_to_snapshot",
):
    """End-to-end streaming flagship: file stream → enrichment → snapshot
    sink with lineage 'batch-{id}' per micro-batch (idempotent on restart —
    same protocol as streaming/events.stream_to_snapshot)."""
    from erased_cells_spark.streaming.events import stream_to_snapshot

    stream = pages_file_stream(spark, src_path, max_files)
    enriched = enrich_pages_stream(stream, polygons)
    return stream_to_snapshot(enriched, table_path, query_name, checkpoint=checkpoint)
