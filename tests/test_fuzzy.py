"""Edit-distance-1 fuzzy join (operators/fuzzy.edit1_pairs): hand cases
for each mutation class, false-positive rejection (shared deletion at
distance 2), duplicate-variant strings, and brute-force Levenshtein
equivalence on random strings. Cross-engine identity is proven by the
doc_edit1_fuzzy_pairs twin."""

import numpy as np
import pytest

from erased_cells_spark.operators.fuzzy import edit1_pairs


def run(spark, strs):
    df = spark.createDataFrame(list(enumerate(strs)), "id LONG, s STRING")
    return sorted(
        (r["id_a"], r["id_b"], r["dist"]) for r in edit1_pairs(df).collect()
    )


def lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
    return d[n]


def brute(strs):
    return sorted(
        (i, j, lev(strs[i], strs[j]))
        for i in range(len(strs))
        for j in range(i + 1, len(strs))
        if lev(strs[i], strs[j]) <= 1
    )


def test_each_mutation_class(spark):
    strs = ["widget", "widgt", "wzdget", "qwidget", "widget", "gadget"]
    got = run(spark, strs)
    assert (0, 1, 1) in got  # deletion
    assert (0, 2, 1) in got  # substitution
    assert (0, 3, 1) in got  # insertion
    assert (0, 4, 0) in got  # exact duplicate
    assert not any({a, b} == {0, 5} for a, b, _ in got)  # distance 3


def test_shared_deletion_at_distance_two_rejected(spark):
    # 'ab' and 'ba' share deletion variant 'a' (and 'b') but lev = 2
    assert run(spark, ["ab", "ba"]) == []


def test_repeated_char_variants_dedup(spark):
    # 'aaa' deletions collapse to one variant 'aa'; pair must emit once
    got = run(spark, ["aaa", "aa"])
    assert got == [(0, 1, 1)]


def test_matches_brute_force_random(spark):
    rng = np.random.default_rng(31)
    alpha = "abc"  # tiny alphabet makes near-pairs common
    strs = [
        "".join(rng.choice(list(alpha), size=int(rng.integers(3, 7))))
        for _ in range(120)
    ]
    assert run(spark, strs) == brute(strs)
