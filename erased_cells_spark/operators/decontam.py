"""Eval-set DECONTAMINATION — the training-data op every LLM pipeline runs
before training: flag (and drop) training documents that share long word
n-grams with an evaluation/benchmark corpus, so benchmark answers don't
leak into the training set. The industry convention is 13-gram overlap
(GPT-3/PaLM-style); `n` is a parameter.

Spark-first shape: eval n-grams are hashed (the same pure-JVM
xxhash64-shingle expression the dedup family uses — collision-free at
corpus scale) and DISTINCT — at 100 TB the eval side is the tiny one
(benchmarks are MBs), so Catalyst broadcasts it and the train side is
touched by one explode + one broadcast hash join + a map-side-combinable
count. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from erased_cells_spark.operators.dedup import shingles_expr

DECONTAM_NGRAM = 13


def ngram_overlap_flags(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = DECONTAM_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(train_id, n_hits): every training doc that shares at least one word
    n-gram with the eval corpus, with the count of its DISTINCT overlapping
    n-grams (shingles are per-doc distinct). Docs shorter than n words can
    never be flagged (no n-grams — same convention as the dedup family).
    The keep-list is `train.join(flags, on=id, how='left_anti')`."""
    from erased_cells_spark.operators.dedup import _spread

    ev = (
        eval_df.select(F.explode(shingles_expr(F.col(text_col), n)).alias("g"))
        .distinct()
    )
    # _spread: a larger parquet train table can arrive as 1 split and would
    # serialize the gram explode on one core; 64 KB slices reflect the
    # 13-gram shingle expression's per-byte cost (~14x a plain scan — the
    # same compute-intensity tier as the MinHash signature UDF)
    tr = _spread(train, slice_bytes=64 << 10).select(
        F.col(id_col).alias("train_id"),
        F.explode(shingles_expr(F.col(text_col), n)).alias("g"),
    )
    return (
        tr.join(ev, "g")
        .groupBy("train_id")
        .agg(F.count("*").alias("n_hits"))
    )


def ngram_overlap_np(train_rows, eval_rows, n: int = DECONTAM_NGRAM):
    """Brute-force twin (pytest oracle): [(id, text)] × [(id, text)] →
    {train_id: n_distinct_overlapping_ngrams}."""
    def grams(text: str) -> set:
        w = text.split(" ")
        if len(w) < n:
            return set()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    ev = set()
    for _, text in eval_rows:
        ev |= grams(text)
    out = {}
    for tid, text in train_rows:
        hits = len(grams(text) & ev)
        if hits:
            out[tid] = hits
    return out
