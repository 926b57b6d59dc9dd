"""Deduplication operators over a documents table.

- exact:         md5 fingerprint groupBy (pure builtins; map-side combine).
- n-gram Jaccard: exact pairwise similarity via shingle-explode + equi-join —
                  correct but shuffle-heavy; the ground truth the approximate
                  paths must agree with.
- MinHash + LSH: signature (vectorized numpy) → band buckets → bucket join →
                 EXACT Jaccard verification of the candidates. At scale, the
                 band join touches only same-bucket pairs, so the quadratic
                 blow-up of the exact path disappears; verification keeps the
                 output set exactly equal to {pairs ≥ threshold} (given LSH
                 recall, which the band parameters overshoot hard).
- SimHash:       64-bit signature → 4×16-bit block buckets (any pair with
                 hamming ≤ 3 shares ≥1 exact block) → popcount verify with
                 the builtin bit_count.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from erased_cells_spark.functions.text import doc_fingerprint
from erased_cells_spark.sources.pages import splitmix64

# ------------------------------------------------------------------- exact --
def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Duplicate groups by normalized-text fingerprint: (fp, n_docs, keep_id).
    keep_id = min id (canonical survivor)."""
    return (
        docs.select(F.col(id_col).alias("id"), doc_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("keep_id"))
        .filter(F.col("n_docs") >= 2)
        .orderBy("fp")
    )


# ---------------------------------------------------------------- shingling --
def shingle_hash(words: list[str], n: int = 3) -> np.ndarray:
    """Deterministic u64 hashes of word n-gram shingles (crc32 pair fold)."""
    if len(words) < n:
        shingles = [" ".join(words)] if words else []
    else:
        shingles = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        b = s.encode("utf-8")
        out[i] = (np.uint64(zlib.crc32(b)) << np.uint64(32)) | np.uint64(zlib.crc32(b[::-1]))
    return np.unique(out)


@pandas_udf(ArrayType(LongType()))
def shingles_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: shingle_hash(t.split()).astype(np.int64).tolist())


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """EXACT all-pairs n-gram Jaccard ≥ threshold: (id_a, id_b, jaccard).
    id_a < id_b. Shuffle profile: explode + equi-join on shingle hash."""
    sh = (
        docs.select(F.col(id_col).alias("id"), shingles_udf(F.col(text_col)).alias("shs"))
        .select("id", F.explode("shs").alias("sh"))
        .distinct()
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


# ------------------------------------------------------------------ MinHash --
N_HASHES = 128
LSH_BANDS = 32  # r = 4 rows/band → s-curve threshold ≈ (1/32)^(1/4) ≈ 0.42
_SEEDS = splitmix64(np.arange(1, N_HASHES + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))


def minhash_signature(sh_hashes: np.ndarray) -> np.ndarray:
    """128 min-values of splitmix64(x ^ seed_i) over the shingle set."""
    if len(sh_hashes) == 0:
        return np.full(N_HASHES, np.iinfo(np.int64).max, dtype=np.int64)
    m = splitmix64(sh_hashes[:, None] ^ _SEEDS[None, :])  # (n_sh, 128)
    return (m.min(axis=0) >> np.uint64(1)).astype(np.int64)  # >>1: fits signed


@pandas_udf(ArrayType(LongType()))
def minhash_udf(shs: pd.Series) -> pd.Series:
    return shs.map(
        lambda arr: minhash_signature(np.asarray(arr, dtype=np.int64).astype(np.uint64)).tolist()
    )


def minhash_lsh_pairs(
    docs: DataFrame, threshold: float, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """MinHash-LSH candidates → exact-Jaccard verification: returns the same
    (id_a, id_b, jaccard ≥ threshold) set as the exact operator, at a
    band-join cost profile instead of all-shingle-pairs."""
    r = N_HASHES // LSH_BANDS
    sh = docs.select(
        F.col(id_col).alias("id"), shingles_udf(F.col(text_col)).alias("shs")
    ).cache()
    sig = sh.select("id", "shs", minhash_udf(F.col("shs")).alias("sig"))
    bands = sig.select(
        "id",
        "shs",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[F.col("sig")[b * r + i] for i in range(r)]).alias("bucket"),
                )
                for b in range(LSH_BANDS)
            ])
        ).alias("bb"),
    ).select("id", "shs", "bb.band", "bb.bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.shs").alias("shs_a"), F.col("b.shs").alias("shs_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact verification with set arithmetic on the shingle arrays (builtin)
    inter = F.size(F.array_intersect("shs_a", "shs_b")).cast("double")
    union = F.size(F.array_union("shs_a", "shs_b")).cast("double")
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    )


# ------------------------------------------------------------------ SimHash --
@pandas_udf(LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    def sim(t: str) -> int:
        words = t.split()
        if not words:
            return 0
        hs = np.empty(len(words), dtype=np.uint64)
        for i, w in enumerate(words):
            b = w.encode("utf-8")
            hs[i] = (np.uint64(zlib.crc32(b)) << np.uint64(32)) | np.uint64(zlib.crc32(b[::-1]))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for j in range(64):
            if v[j] > 0:
                out |= np.uint64(1) << np.uint64(j)
        return int(out >> np.uint64(1))  # >>1 keeps it in signed-long range

    return text.map(sim)


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance ≤ max_hamming (≤ 15).
    Block index: 4×16-bit chunks — any pair within distance 3 shares a chunk."""
    sh = docs.select(F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("sim"))
    blocks = sh.select(
        "id",
        "sim",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftrightunsigned(F.col("sim"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
                )
                for c in range(4)
            ])
        ).alias("cb"),
    ).select("id", "sim", "cb.chunk", "cb.val")
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.sim").alias("sim_a"), F.col("b.sim").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


# -------------------------------------------------- numpy oracles (pytest) --
def jaccard_pairs_np(ids, texts, threshold: float):
    sets = [set(shingle_hash(t.split()).tolist()) for t in texts]
    out = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sets[i], sets[j]
            if not a and not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= threshold:
                lo, hi = sorted((ids[i], ids[j]))
                out.append((lo, hi, jac))
    return sorted(out)
