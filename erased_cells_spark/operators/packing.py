"""Sequence packing for LLM pretraining (concat-and-chunk, r7).

Pretraining pipelines do not feed one document per sequence — they
CONCATENATE the token stream in a deterministic order and CHUNK it into
fixed-length sequences (GPT-style packing): zero padding waste, documents
may straddle a sequence boundary. The planning half of that job — which
sequence(s) each document lands in, how many sequences a shard yields,
which documents straddle — is pure relational arithmetic:

    offset  = cumulative tokens BEFORE the doc (window sum within shard)
    first   = floor(offset / budget)
    last    = floor((offset + tokens - 1) / budget)   (empty docs: first)
    straddles = last > first

At 100 TB the one design decision is the WINDOW SCOPE: a single global
cumsum would funnel the corpus through one sort/one partition. Real
pipelines pack per shard (source, date, hash bucket) — each shard's
window is independent, so Spark runs one shuffle on the shard key and
every shard packs in parallel. The deterministic order inside a shard
(doc_id here) is what makes the packing reproducible across runs and
engines — the same no-RNG discipline as the hash sampler.

Everything is JVM window/arithmetic expressions (whole-stage codegen,
no UDF); the DuckDB twin (`doc_pack_sequences`) replays the identical
window in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_spans(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    shard_col: str,
    order_col: str,
) -> DataFrame:
    """Per-document packing plan: adds `pack_offset` (tokens before the doc
    inside its shard), `seq_first`, `seq_last` (0-based sequence ids inside
    the shard) and `straddles`. `budget` = tokens per packed sequence."""
    if budget <= 0:
        raise ValueError(f"pack_spans: budget must be positive, got {budget}")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tokens = F.col(tokens_col).cast("long")
    offset = F.coalesce(F.sum(tokens).over(w), F.lit(0))
    first = F.floor(offset / budget)
    # empty documents occupy no tokens: they "land" at their offset's
    # sequence and can never straddle
    last = F.when(tokens > 0, F.floor((offset + tokens - 1) / budget)).otherwise(first)
    return df.select(
        "*",
        offset.alias("pack_offset"),
        first.alias("seq_first"),
        last.alias("seq_last"),
        (last > first).alias("straddles"),
    )


def shard_pack_stats(packed: DataFrame, shard_col: str, budget: int) -> DataFrame:
    """Per-shard packing audit: docs, tokens, full sequences produced
    (ceil(total/budget)), boundary-straddling docs."""
    del budget  # the plan already encodes it; kept for call-site clarity
    return packed.groupBy(shard_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("straddles").cast("long")).alias("n_straddling"),
        (F.max("seq_last") + 1).alias("n_seqs"),
        F.sum(F.col("seq_last") - F.col("seq_first")).alias("n_boundary_crossings"),
    )


def sql_pack_spans(
    table: str, tokens_expr: str, budget: int, shard_col: str, order_col: str
) -> str:
    """DuckDB twin of pack_spans: the identical window arithmetic as a
    subquery SELECT (compose into a WITH clause)."""
    off = (
        f"coalesce(sum({tokens_expr}) OVER (PARTITION BY {shard_col} "
        f"ORDER BY {order_col} ROWS BETWEEN UNBOUNDED PRECEDING AND "
        f"1 PRECEDING), 0)"
    )
    return f"""
SELECT {shard_col}, {order_col}, {tokens_expr} AS toks, {off} AS pack_offset,
       ({off}) // {budget} AS seq_first,
       CASE WHEN {tokens_expr} > 0
            THEN (({off}) + {tokens_expr} - 1) // {budget}
            ELSE ({off}) // {budget} END AS seq_last
FROM {table}
"""
