"""Prefix-filter exact set-similarity join (dedup.prefix_filter_jaccard
_pairs): output identity with the brute exact operator across thresholds
and random corpora (completeness is the whole claim), measured candidate
pruning on a hot-shingle corpus, boundary thresholds, validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
)


def corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def pairs(df):
    return sorted((r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect())


@pytest.fixture(scope="module")
def random_corpus(spark):
    """Mutated templates: pairs across the whole similarity spectrum."""
    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(40)]
    templates = [list(rng.choice(vocab, size=10)) for _ in range(15)]
    rows = []
    for i in range(120):
        words = list(templates[int(rng.integers(0, 15))])
        for _ in range(int(rng.integers(0, 4))):
            words[int(rng.integers(0, 10))] = str(rng.choice(vocab))
        rows.append((i, " ".join(words)))
    return corpus(spark, rows).cache()


@pytest.mark.parametrize("tau", [0.2, 0.3, 0.5, 0.8, 1.0])
def test_identical_to_brute_exact(spark, random_corpus, tau):
    brute = pairs(ngram_jaccard_pairs(random_corpus, tau))
    fast = pairs(prefix_filter_jaccard_pairs(random_corpus, tau))
    assert fast == brute
    if tau <= 0.3:
        assert len(brute) > 10  # non-vacuous at the loose thresholds


def test_integer_threshold_boundary(spark):
    # J exactly == tau must be INCLUDED (>=): two docs sharing 1 of their
    # 2 shingles each -> J = 1/3; tau = 1/3 keeps it, tau slightly above drops
    rows = [(0, "a b c d"), (1, "a b c e")]  # shingles {abc,bcd} vs {abc,bce}
    df = corpus(spark, rows)
    keep = pairs(prefix_filter_jaccard_pairs(df, 1.0 / 3.0))
    assert keep == pairs(ngram_jaccard_pairs(df, 1.0 / 3.0)) and len(keep) == 1
    assert pairs(prefix_filter_jaccard_pairs(df, 0.34)) == []


def test_pruning_beats_full_join_on_hot_shingles(spark):
    # every doc shares one boilerplate shingle; rarest-first prefixes
    # exclude it, so candidates << the m^2 the full join would emit
    rng = np.random.default_rng(8)
    rows = [
        (i, "common boiler plate " + " ".join(f"u{i}_{j}" for j in range(10)))
        for i in range(200)
    ]
    df = corpus(spark, rows)
    stats: dict = {}
    out = pairs(prefix_filter_jaccard_pairs(df, 0.5, stats=stats))
    assert out == pairs(ngram_jaccard_pairs(df, 0.5))
    # the hot 'common boiler plate' shingle alone would give 200*199/2 pairs
    assert stats["candidates"] < 200 * 199 / 2 / 10, stats


def test_validation(spark, random_corpus):
    with pytest.raises(ValueError):
        prefix_filter_jaccard_pairs(random_corpus, 0.0)
    with pytest.raises(ValueError):
        prefix_filter_jaccard_pairs(random_corpus, 1.5)
