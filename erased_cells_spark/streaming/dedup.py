"""Streaming MinHash NEAR-dup guard — the last batch-only capability of the
training-data brief made streaming (VERDICT r3 item 8): drop stream docs
whose MinHash band bucket was already claimed within the watermark.

Exact dedup (streaming/events.dedupe_stream) only catches byte-identical
replays; a live crawl also re-ingests near-identical pages (boilerplate
edits, timestamps). Guard rule, chosen so per-bucket state machines stay
INDEPENDENT (each decidable without cross-bucket coordination):

    a doc is KEPT iff it is the first arrival — (ts, id) order — in EVERY
    one of its LSH band buckets still inside the watermark; it is DROPPED
    iff ANY of its buckets was claimed by an earlier doc.

Near-identical docs share most/all bands → later copies drop; unrelated
docs share a band with s-curve probability (the classic LSH envelope — the
pytest twin proves, not assumes, the planted behavior). A replayed copy of
the CLAIMER itself (at-least-once source) stays kept: the claim stores the
claimer id and `is_first` is id-equality, so the guard composes with exact
dedup in either order.

Scale shape: shingles → signatures → band explode are stateless narrow ops
(same JVM/Arrow path as batch minhash_lsh_pairs); the only state is ONE
(first_ts, first_id) row per live (band, bucket) key with an EVENT-time
timeout (watermark-bounded, replay-safe); the per-doc verdict fold is a
plain per-micro-batch aggregation (all band rows of a doc share its batch),
so no second stateful operator is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from erased_cells_spark.operators.dedup import LSH_BANDS, N_HASHES, minhash_udf, shingles_expr

_VERDICT_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("ts", TimestampType()),
        StructField("band", LongType()),
        StructField("is_first", BooleanType()),
    ]
)
_CLAIM_SCHEMA = StructType(
    [StructField("first_ms", LongType()), StructField("first_id", StringType())]
)


def _parse_duration_ms(s: str) -> int:
    n, unit = s.split()
    mult = {"second": 1_000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}[
        unit.rstrip("s")
    ]
    return int(n) * mult


def _make_claim(retention_ms: int):
    def _claim(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=["id", "ts", "band", "is_first"])
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "id"])
        ms = (rows["ts"].astype("int64") // 1_000_000).to_list()
        if state.exists:
            first_ms, first_id = state.get
        else:
            first_ms, first_id = ms[0], rows["id"].iloc[0]
        state.update((int(first_ms), first_id))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(int(first_ms) + retention_ms, wm + 1))
        yield pd.DataFrame(
            {
                "id": rows["id"],
                "ts": rows["ts"],
                "band": key[0],
                "is_first": (rows["id"] == first_id),
            }
        )

    return _claim


def band_verdicts_stream(
    stream: DataFrame,
    id_col: str = "url",
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "2 hours",
) -> DataFrame:
    """stream(id, ts, text) → (id, ts, band, is_first) per band: one row per
    (doc, band) saying whether the doc is the bucket's claimer. Docs too
    short to shingle (< n words) produce no bands and therefore no verdicts
    — compose `keep_list_batch`-style downstream logic accordingly."""
    # bound=False: the stateful-streaming plan collapses projections into
    # the minhash UDF's argument, and Spark cannot extract a Python UDF
    # whose input carries the bound-HOF wrapper (see shingles_expr)
    sig = stream.select(
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("ts"),
        shingles_expr(F.col(text_col), bound=False).alias("shs"),
    ).filter(F.size("shs") > 0)
    r = N_HASHES // LSH_BANDS
    # signature materialized ONCE per doc (a minhash_udf call inside the
    # band lambda would run the Arrow UDF 32×)
    sig = sig.select("id", "ts", minhash_udf(F.col("shs")).alias("sig"))
    bands = sig.select(
        "id",
        "ts",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
                lambda b: F.xxhash64(F.slice("sig", b * r + 1, r)),
            )
        ).alias("band", "bucket"),
    )
    return _claimed_verdicts(bands, watermark)


def _claimed_verdicts(bands: DataFrame, watermark: str) -> DataFrame:
    """Generic watermark-bounded bucket-claim stage over a (id, ts, band,
    bucket) stream — shared by the text (MinHash bands) and image (dHash
    blocks) guards: one (first_ts, first_id) state row per live (band,
    bucket), event-time timeout, one is_first verdict per input row."""
    return (
        bands.withWatermark("ts", watermark)
        .groupBy("band", "bucket")
        .applyInPandasWithState(
            _make_claim(_parse_duration_ms(watermark)),
            outputStructType=_VERDICT_SCHEMA,
            stateStructType=_CLAIM_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _dhash_blocks(sigs: DataFrame) -> DataFrame:
    """(id, ts, dhash) → (id, ts, dhash, band, bucket): the 4×16-bit chunk
    blocks of the 63-bit dHash, the same pigeonhole index
    hamming_block_pairs uses in batch (chunk plays band, chunk value plays
    bucket). The full dhash rides along: block claims VERIFY hamming
    against the claimer — a 16-bit block space saturates at corpus scale,
    so claim-collision alone must never drop (precision stays exact)."""
    return sigs.select(
        "id",
        "ts",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).cast("long").alias("band"),
                        F.shiftrightunsigned(F.col("dhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cb"),
    ).select("id", "ts", "dhash", "cb.band", "cb.bucket")


_IMG_VERDICT_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("ts", TimestampType()),
        StructField("band", LongType()),
        StructField("ok", BooleanType()),
    ]
)
_IMG_CLAIM_SCHEMA = StructType(
    [
        StructField("first_ms", LongType()),
        StructField("first_id", StringType()),
        StructField("first_dhash", LongType()),
    ]
)


def _make_image_claim(retention_ms: int, max_hamming: int):
    def _claim(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame([], columns=["id", "ts", "band", "ok"])
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "id"])
        ms = (rows["ts"].astype("int64") // 1_000_000).to_list()
        if state.exists:
            first_ms, first_id, first_dhash = state.get
        else:
            first_ms = ms[0]
            first_id = rows["id"].iloc[0]
            first_dhash = int(rows["dhash"].iloc[0])
        state.update((int(first_ms), first_id, int(first_dhash)))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(int(first_ms) + retention_ms, wm + 1))
        # a row is ok for this block iff it IS the claimer, or it is NOT a
        # true near-dup of the claimer (block collision alone never drops).
        # popcount is vectorized numpy (view the XOR as bytes → unpackbits
        # → row sums), not a per-row Python lambda (VERDICT r5 #7)
        x = (rows["dhash"].to_numpy(dtype="int64") ^ first_dhash).view(np.uint8)
        ham = np.unpackbits(x.reshape(-1, 8), axis=1).sum(axis=1)
        yield pd.DataFrame(
            {
                "id": rows["id"],
                "ts": rows["ts"],
                "band": key[0],
                "ok": (rows["id"] == first_id) | (ham > max_hamming),
            }
        )

    return _claim


def image_block_verdicts_stream(
    media_stream: DataFrame,
    id_col: str = "media_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    max_hamming: int = 3,
) -> DataFrame:
    """Streaming IMAGE near-dup guard (the multimodal twin of
    band_verdicts_stream): media stream → (stub) decode → 63-bit dHash
    (stateless Arrow mapInPandas) → 4×16-bit block claims within the
    watermark, with EXACT hamming verification against each block's
    claimer (the claimer's dhash lives in the state row): an image is
    dropped iff some block's earlier claimer is within hamming ≤
    max_hamming — full recall for ≤ 3 by pigeonhole, exact precision
    because a mere 16-bit block collision never drops. Replays of the
    claimer itself stay kept (id-equality), so the guard composes with
    exact dedup. Non-image rows produce no verdicts."""
    from erased_cells_spark.operators.multimodal import image_dhash

    sigs = image_dhash(media_stream, passthrough=(ts_col,)).filter(
        F.col("error").isNull()  # quarantined codec failures never claim
    ).select(
        F.col(id_col).cast("string").alias("id"),
        F.col(ts_col).alias("ts"),
        "dhash",
    )
    return (
        _dhash_blocks(sigs)
        .withWatermark("ts", watermark)
        .groupBy("band", "bucket")
        .applyInPandasWithState(
            _make_image_claim(_parse_duration_ms(watermark), max_hamming),
            outputStructType=_IMG_VERDICT_SCHEMA,
            stateStructType=_IMG_CLAIM_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def keep_verdicts_per_batch(verdict_batch: DataFrame) -> DataFrame:
    """Per-micro-batch doc fold: (id, ts, keep) — keep ⟺ first in ALL
    bands. Valid inside foreachBatch because every band row of a doc lands
    in the doc's own micro-batch (the band explode is stateless)."""
    return verdict_batch.groupBy("id", "ts").agg(
        F.min(F.col("is_first").cast("int")).cast("boolean").alias("keep")
    )


def guarded_keep_stream(
    spark,
    src_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "url",
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "2 hours",
    query_name: str = "neardup_guard",
):
    """End-to-end guard: file stream over `src_path` → band verdicts → per
    batch keep fold appended to `out_path` as parquet (idempotent restarts
    via the streaming checkpoint). Returns the StreamingQuery."""
    schema = spark.read.parquet(src_path).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_path)
    )
    verdicts = band_verdicts_stream(stream, id_col, ts_col, text_col, watermark)

    def sink(batch_df: DataFrame, batch_id: int):
        keep_verdicts_per_batch(batch_df).withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(out_path)

    return (
        verdicts.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def keep_list_batch(
    docs: DataFrame,
    id_col: str = "url",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """BATCH TWIN of the guard (the replay-equality oracle): claimer of each
    band bucket = the globally (ts, id)-first doc; keep ⟺ claimer of every
    own band. Equals the streaming result when arrival order respects event
    time (the replay test feeds files in ts order)."""
    from pyspark.sql import Window

    # bound=False for the same reason as the stream side: without a cache
    # boundary the projection collapses the bound-HOF shingles into the
    # minhash UDF's argument and UDF extraction fails
    sig = docs.select(
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("ts"),
        shingles_expr(F.col(text_col), bound=False).alias("shs"),
    ).filter(F.size("shs") > 0)
    r = N_HASHES // LSH_BANDS
    # signature materialized ONCE per doc (a minhash_udf call inside the
    # band lambda would run the Arrow UDF 32×)
    sig = sig.select("id", "ts", minhash_udf(F.col("shs")).alias("sig"))
    bands = sig.select(
        "id",
        "ts",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
                lambda b: F.xxhash64(F.slice("sig", b * r + 1, r)),
            )
        ).alias("band", "bucket"),
    )
    w = Window.partitionBy("band", "bucket").orderBy("ts", "id")
    v = bands.withColumn("first_id", F.first("id").over(w)).select(
        "id", "ts", (F.col("id") == F.col("first_id")).alias("is_first")
    )
    return v.groupBy("id", "ts").agg(
        F.min(F.col("is_first").cast("int")).cast("boolean").alias("keep")
    )


def guarded_media_keep_stream(
    spark,
    src_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "media_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    query_name: str = "media_neardup_guard",
):
    """End-to-end image guard: file stream over `src_path` (media rows +
    event ts) → dHash block verdicts → per-batch keep fold appended to
    `out_path` (idempotent restarts via the streaming checkpoint). Returns
    the StreamingQuery."""
    schema = spark.read.parquet(src_path).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_path)
    )
    verdicts = image_block_verdicts_stream(stream, id_col, ts_col, watermark)

    def sink(batch_df: DataFrame, batch_id: int):
        # keep ⟺ ok in EVERY block (same per-micro-batch fold contract as
        # keep_verdicts_per_batch: all block rows of an image share its batch)
        batch_df.groupBy("id", "ts").agg(
            F.min(F.col("ok").cast("int")).cast("boolean").alias("keep")
        ).withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_path)

    return (
        verdicts.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def media_keep_list_batch(
    media: DataFrame, id_col: str = "media_id", ts_col: str = "ts"
) -> DataFrame:
    """BATCH TWIN of the image guard (replay-equality oracle): claimer of
    each dHash block = the globally (ts, id)-first image; keep ⟺ claimer
    of every own block or farther than hamming 3 from its claimer (the
    same exact verification the stream applies)."""
    from erased_cells_spark.operators.multimodal import image_dhash

    sigs = image_dhash(media, passthrough=(ts_col,)).filter(
        F.col("error").isNull()
    ).select(
        F.col(id_col).cast("string").alias("id"), F.col(ts_col).alias("ts"), "dhash"
    )
    return _keep_from_sigs_batch(sigs)


def _keep_from_sigs_batch(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Batch keep fold over (id, ts, dhash): per block, ok ⟺ claimer or
    hamming(claimer) > max_hamming; keep ⟺ ok in every block."""
    from pyspark.sql import Window

    blocks = _dhash_blocks(sigs)
    w = Window.partitionBy("band", "bucket").orderBy("ts", "id")
    ham = F.bit_count(
        F.col("dhash").bitwiseXOR(F.first("dhash").over(w))
    ).cast("long")
    v = blocks.select(
        "id",
        "ts",
        (
            (F.col("id") == F.first("id").over(w)) | (ham > max_hamming)
        ).alias("ok"),
    )
    return v.groupBy("id", "ts").agg(
        F.min(F.col("ok").cast("int")).cast("boolean").alias("keep")
    )
