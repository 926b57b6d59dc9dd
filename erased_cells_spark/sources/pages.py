"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md F1).

Schema (input_hint shape): url STRING, warc_ts TIMESTAMP, html BINARY,
text STRING, lang STRING. Every field is a pure function of (seed, row id)
via counter-based splitmix64 hashing — no RNG state — so generation is
embarrassingly parallel (mapInPandas over spark.range) and the pytest
brute-force oracles regenerate identical rows locally from the same ids.

Hosts are zipfian (s=1.2 over 1000 hosts) so geocoded locations produce the
hot cells that exercise skew handling. `html = wrapper(text)` with text
guaranteed '<'-free, so extraction is byte-exact-verifiable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

N_HOSTS = 1000
ZIPF_S = 1.2
LANGS = ["en", "de", "fr", "es", "pt"]
EPOCH_2025 = 1735689600  # 2025-01-01T00:00:00Z
YEAR_SECONDS = 31_536_000

_U64 = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based 64-bit hash (public splitmix64 constants); wraps mod 2^64."""
    x = x.astype(_U64)
    x = (x + _U64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)
    return x ^ (x >> _U64(31))


def _make_words(n: int = 512) -> list[str]:
    onsets = ["b", "d", "f", "g", "k", "l", "m", "n", "p", "r", "s", "t", "v", "z", "ch", "st"]
    vowels = ["a", "e", "i", "o"]
    syl = [c + v for c in onsets for v in vowels]  # 64 syllables
    words = []
    i = 0
    while len(words) < n:
        a, b = divmod(i, 64)
        words.append(syl[a % 64] + syl[b])
        i += 1
    return words


WORDS = _make_words()
_WORDS_ARR = np.array(WORDS)

# Zipf CDF over host ranks 1..N_HOSTS (s = 1.2).
_zipf_w = 1.0 / np.arange(1, N_HOSTS + 1, dtype=np.float64) ** ZIPF_S
_ZIPF_CDF = np.cumsum(_zipf_w) / _zipf_w.sum()


def gen_batch(ids: np.ndarray, seed: int) -> pd.DataFrame:
    """Generate the page rows for an array of int64 row ids. Deterministic;
    shared verbatim by the Spark generator and the local pytest oracles."""
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    base = splitmix64(ids.astype(_U64) ^ _U64(seed * 1_000_003))

    # zipfian host
    u = (base >> _U64(11)).astype(np.float64) / float(1 << 53)
    rank = np.searchsorted(_ZIPF_CDF, u, side="right") + 1
    hosts = np.char.add(np.char.add("h", rank.astype(str)), ".example.org")
    urls = [f"https://{h}/p/{i}" for h, i in zip(hosts, ids)]

    # text: 20..200 words, word j = hash(base, j) % 512
    lengths = (splitmix64(base ^ _U64(1)) % _U64(181) + _U64(20)).astype(np.int64)
    max_len = int(lengths.max()) if n else 0
    j = np.arange(max_len, dtype=np.uint64)
    word_idx = (splitmix64(base[:, None] ^ (j[None, :] + _U64(2))) % _U64(512)).astype(
        np.int64
    )
    mat = _WORDS_ARR[word_idx]
    texts = [" ".join(mat[r, : lengths[r]]) for r in range(n)]

    htmls = [
        f"<html><head><title>{i}</title></head><body><p>{t}</p></body></html>".encode("utf-8")
        for i, t in zip(ids, texts)
    ]
    ts = pd.to_datetime(EPOCH_2025 + (ids * 137) % YEAR_SECONDS, unit="s")
    langs = np.array(LANGS)[ids % 5]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def generate_pages(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic generator: mapInPandas over spark.range —
    scales linearly with executors; no driver-side materialization."""
    if partitions is None:
        partitions = max(int(spark.sparkContext.defaultParallelism), 1)
    rng = spark.range(0, n, 1, partitions)

    def gen(batches):
        for pdf in batches:
            yield gen_batch(pdf["id"].to_numpy(), seed)

    return rng.mapInPandas(gen, PAGES_SCHEMA)


def materialize_pages(
    spark: SparkSession, n: int, seed: int, path: str, partitions: int | None = None
) -> str:
    """Write the generated pages as parquet once (bench input reuse)."""
    generate_pages(spark, n, seed, partitions).write.mode("overwrite").parquet(path)
    return path
