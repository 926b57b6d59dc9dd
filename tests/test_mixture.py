"""Temperature-mixture resampling (operators/mixture.py).

Properties proven here (the cross-engine value identity is proven by the
doc_lang_temperature_sample twin in tests/test_oracle_twins.py):
- the rarest group is kept in FULL (threshold == modulus);
- kept counts track the n^alpha target within binomial noise;
- alpha=1 keeps everything, alpha=0 equalizes effective counts;
- determinism: same input ⇒ identical kept set across repartitionings;
- monotonicity: a doc kept at alpha stays kept at any higher alpha
  (thresholds are monotone in alpha, buckets fixed).
"""

import math

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.mixture import (
    DEFAULT_MODULUS,
    temperature_sample,
    temperature_thresholds,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # 4 langs with strongly skewed counts: 3200 / 800 / 200 / 50.
    rows = []
    i = 0
    for lang, n in [("en", 3200), ("zh", 800), ("es", 200), ("yo", 50)]:
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id LONG, lang STRING").cache()


def test_rarest_group_kept_in_full(spark, corpus):
    thr = {
        r["lang"]: r["threshold"]
        for r in temperature_thresholds(corpus, alpha=0.5).collect()
    }
    assert thr["yo"] == DEFAULT_MODULUS  # floor(M * sqrt(50/50))
    kept = temperature_sample(corpus, alpha=0.5)
    assert kept.filter(F.col("lang") == "yo").count() == 50


def test_effective_counts_track_sqrt(spark, corpus):
    kept = {
        r["lang"]: r["n"]
        for r in temperature_sample(corpus, alpha=0.5)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, n in [("en", 3200), ("zh", 800), ("es", 200), ("yo", 50)]:
        target = math.sqrt(50 * n)  # n_min^(1-a) * n^a with a=0.5
        # 5-sigma binomial tolerance around the target.
        sigma = math.sqrt(max(target * (1 - target / n), 1.0))
        assert abs(kept[lang] - target) <= 5 * sigma + 1, (lang, kept[lang], target)


def test_alpha_one_keeps_all_and_alpha_zero_equalizes(spark, corpus):
    assert temperature_sample(corpus, alpha=1.0).count() == corpus.count()
    kept0 = {
        r["lang"]: r["n"]
        for r in temperature_sample(corpus, alpha=0.0)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # alpha=0: every effective count targets n_min = 50.
    for lang in kept0:
        sigma = math.sqrt(50)
        assert abs(kept0[lang] - 50) <= 5 * sigma + 1, (lang, kept0[lang])


def test_deterministic_across_partitionings(spark, corpus):
    a = sorted(r["doc_id"] for r in temperature_sample(corpus).select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_sample(corpus.repartition(17, "doc_id")).select("doc_id").collect()
    )
    assert a == b and len(a) > 0


def test_monotone_in_alpha(spark, corpus):
    low = {r["doc_id"] for r in temperature_sample(corpus, alpha=0.25).select("doc_id").collect()}
    high = {r["doc_id"] for r in temperature_sample(corpus, alpha=0.75).select("doc_id").collect()}
    assert low <= high


def test_alpha_bounds(spark, corpus):
    with pytest.raises(ValueError):
        temperature_thresholds(corpus, alpha=1.5)
