"""Temperature-based language/domain mixture resampling.

The standard multilingual-corpus rebalancing op (mT5/XLM-R style): a
training corpus dominated by head languages is downsampled so the
effective language distribution follows n_l^alpha instead of n_l, with
the rarest language kept in full. For alpha in (0, 1) this lifts tail
languages relative to the head without ever UPsampling (no duplication),
which keeps the op a pure scan-side filter.

Derivation: target effective counts e_l proportional to n_l^alpha with
e_lmin = n_lmin (rarest kept fully) gives per-language keep probability

    p_l = (n_l / n_min) ** (alpha - 1)      # p_lmin = 1, p_l <= 1

and effective counts n_l * p_l = n_min^(1-alpha) * n_l^alpha.

Determinism: membership is NOT an RNG draw — each row's "coin" is an md5
hash of its stable id mapped to a bucket in [0, modulus), kept when
bucket < floor(modulus * p_l). The sample is therefore reproducible
across engines, runs, partitionings, and cluster sizes, and composes
with incremental pipelines (a doc's fate never changes as the corpus
grows within a lang, only when thresholds are recomputed).

Cross-engine exactness: for the DuckDB-twinned surface alpha is pinned
at 0.5 so p_l = sqrt(n_min / n_l) — IEEE-754 division and sqrt are both
correctly rounded, so Spark and DuckDB compute bit-identical doubles and
floor() can never disagree. General alpha goes through pow(), whose
correct rounding is NOT guaranteed by either engine; it is offered for
pipeline use but the oracle twin never exercises it
(`doc_lang_temperature_sample` in queries.py).

Scale shape (100 TB): one groupBy(lang) over the corpus (a few hundred
groups at most — broadcast-small), a broadcast join of the threshold
table back onto the scan, and a per-row JVM md5 filter. Zero
data-proportional shuffles; the filter composes with predicate pushdown
on any upstream scan.

Reference anchor: the deterministic-sampling discipline mirrors the
repo's doc_hash_sample_by_source (queries.py:864) and the reference's
reproducibility contract for masked ingest (erased-cells
src/masked/mod.rs round-trip determinism) — same fixed-seed philosophy,
applied to corpus mixing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MODULUS = 1_000_000


def hash_bucket_expr(id_col: str, modulus: int = DEFAULT_MODULUS):
    """Deterministic bucket in [0, modulus) from a stable id: first 8 hex
    chars of md5(id) as an integer, mod modulus. Pure JVM expression."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
        % modulus
    )


def temperature_thresholds(
    df: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    modulus: int = DEFAULT_MODULUS,
) -> DataFrame:
    """Per-group keep thresholds: (group, n_docs, threshold) with
    threshold = floor(modulus * (n_docs/n_min)^(alpha-1)).

    alpha == 0.5 routes through sqrt (correctly-rounded IEEE op → exact
    cross-engine); other alphas use pow and are documented as
    approximately-reproducible only.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    joined = counts.crossJoin(F.broadcast(n_min))
    if alpha == 0.5:
        keep_p = F.sqrt(F.col("n_min").cast("double") / F.col("n_docs"))
    else:
        keep_p = F.pow(
            F.col("n_docs").cast("double") / F.col("n_min"), F.lit(alpha - 1.0)
        )
    return joined.select(
        group_col,
        "n_docs",
        F.floor(F.lit(modulus) * keep_p).cast("long").alias("threshold"),
    )


def temperature_sample(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    modulus: int = DEFAULT_MODULUS,
) -> DataFrame:
    """Downsample head groups so effective counts follow n^alpha; the
    rarest group is kept in full. Returns the kept rows with `bucket` and
    `threshold` columns appended (callers drop them or keep them for
    audit). Deterministic: same input ⇒ same kept set, any cluster size.
    """
    thr = temperature_thresholds(df, group_col=group_col, alpha=alpha, modulus=modulus)
    bucket = hash_bucket_expr(id_col, modulus)
    return (
        df.join(F.broadcast(thr.drop("n_docs")), group_col)
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < F.col("threshold"))
    )
