"""Hot-bucket guard for the LSH family's bucket self-joins.

Every LSH-style candidate generator in this repo (MinHash bands, SimHash
16-bit blocks, sign-LSH tables for embeddings) follows the same shape: a
narrow (id, key..., bucket) table self-joined on the bucket key. That join
emits O(m²) rows for a bucket holding m ids — and on real web corpora a
single boilerplate template or near-empty page class routinely puts 10⁵–10⁷
documents into ONE band bucket, which no skew-split can make cheap because
the *output itself* is quadratic. This is the #1 operational failure of
MinHash dedup at crawl scale (the DataTrove / BigQuery-MinHash pipelines all
ship a bucket cap for exactly this reason).

`salt_hot_buckets` bounds the blowup with a sub-split: one cheap count per
bucket key over the (already cached) triples, then ids inside any bucket
larger than `cap` are deterministically salted into ceil(m/cap) sub-buckets
(salt = xxhash64(id) mod nsplits; identical on both join sides, so the
self-join stays an equi-join). Candidates are then generated within
(key..., salt), so a degenerate bucket of m rows emits O(m·cap) candidate
rows instead of O(m²) — the bound the guard's pytest proves with a planted
degenerate bucket.

Semantics: healthy buckets (≤ cap — every bucket at the test scale factors)
get salt 0 on both sides and behave exactly as before, so all existing
oracles are unchanged. Inside an oversized bucket the sub-split trades
recall for boundedness: a pair whose two ids land in different sub-buckets
is not generated *by that bucket* — but in the multi-band / multi-table
schemes used here a genuine near-dup pair collides in several independent
buckets, so it gets ~1/nsplits · n_tables chances, and byte-identical
floods (the classic degenerate case) are caught wholesale by the exact
dedup path (md5 groupBy) regardless. Oversized buckets are additionally
*reported* (not silently eaten): pass `report=[]` to receive a DataFrame of
(key..., bucket_n, nsplits) for metrics/alerting, the cap+report convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Per-bucket cardinality cap before sub-splitting. At cap=1024 the worst
# bucket contributes ≤ 1024·m candidate rows (linear in m), while every
# bucket at sf0.001–0.1 stays far below the cap (guard provably inactive on
# the oracle fixtures — asserted in tests/test_bucket_guard.py).
LSH_BUCKET_CAP = 1024

# Hot buckets are pathological by definition, so the list is collected to
# the driver when small (one cheap agg job over the caller's cached
# triples): the healthy-corpus fast path then adds a LITERAL salt 0 — zero
# plan change, zero extra shuffles. Past this bound the guard falls back to
# a fully lazy broadcast-join plan (an adversarial corpus where >64k
# DISTINCT buckets each exceed the cap).
MAX_HOT_COLLECT = 65_536


def salt_hot_buckets(
    triples: DataFrame,
    keys: list[str],
    id_col: str = "id",
    cap: int = LSH_BUCKET_CAP,
    report: list | None = None,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Append a `salt` column bounding per-(keys) group size to ~cap.

    `triples` SHOULD be cached by the caller (the bucket-count job and the
    output both scan it). Buckets with ≤ cap ids get salt 0; buckets with
    m > cap ids are split into ceil(m/cap) deterministic sub-buckets
    (salt = xxhash64(id) mod nsplits — identical on both sides of a
    self-join). Join the result to itself on keys + ["salt"] instead of
    keys alone.

    EAGER by design: the hot-bucket list materializes here (it is the
    guard's decision input). When it is empty — every healthy corpus — the
    returned plan is the input plus a literal 0 column, so the self-join
    downstream keeps its original shape and cost.

    `counts` lets a caller hand in an equivalent per-(keys) cardinality
    DataFrame (columns: *keys, bucket_n) computed more cheaply than
    `triples.groupBy(*keys).count()` — e.g. hamming_block_pairs derives the
    per-chunk counts from its cached NARROW signature table instead of
    re-running the 4-way block explode for the count job (the r5 simhash
    bench regression). The guard's decision is identical as long as the
    handed-in counts match the triples' group sizes.
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    from erased_cells_spark.plans.tuning import tune_session

    # the caller's cached triples materialize during the count below — make
    # sure the session lets AQE right-size the cached partitioning first
    tune_session(triples.sparkSession)
    if counts is None:
        counts = triples.groupBy(*keys).agg(F.count(F.lit(1)).alias("bucket_n"))
    hot = counts.filter(F.col("bucket_n") > cap).withColumn(
        "nsplits", F.ceil(F.col("bucket_n") / F.lit(cap)).cast("int")
    )
    hot_rows = hot.limit(MAX_HOT_COLLECT + 1).collect()
    spark = triples.sparkSession
    if len(hot_rows) <= MAX_HOT_COLLECT:
        if not hot_rows:
            if report is not None:
                # hot.limit(0) optimizes to an EMPTY LocalRelation — a pure
                # JVM literal whose count() costs ~nothing. (The r7 form,
                # createDataFrame([], schema), builds a pickled Python RDD:
                # every report.count() then pays one Python-worker
                # round-trip per partition — ~0.3 s of scheduling per
                # guarded query for an empty list.)
                report.append(hot.limit(0))
            return triples.withColumn("salt", F.lit(0))
        # tiny hot list → JVM LocalRelation via the Arrow/pandas path (the
        # count plan never re-executes, and neither the report nor the
        # broadcast build involves Python workers at runtime)
        import pandas as pd

        local = spark.createDataFrame(
            pd.DataFrame([tuple(r) for r in hot_rows], columns=hot.schema.names),
            hot.schema,
        )
        if report is not None:
            report.append(local)
        hot_df = F.broadcast(local)
    else:  # adversarial bucket population (>64k distinct hot buckets):
        # stay fully distributed — a plain shuffle left join on the bucket
        # keys, NOT a broadcast of the unbounded hot list (broadcasting it
        # would recreate the exact driver/executor memory blowup this
        # branch exists to avoid).
        if report is not None:
            report.append(hot)
        hot_df = hot
    return (
        triples.join(hot_df.select(*keys, "nsplits"), keys, "left")
        .withColumn(
            "salt",
            F.coalesce(
                F.pmod(F.xxhash64(F.col(id_col)), F.col("nsplits")).cast("int"),
                F.lit(0),
            ),
        )
        .drop("nsplits")
    )
