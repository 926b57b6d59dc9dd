"""Phrase search contracts (operators/search.phrase_occurrences):
overlapping matches, single-word degenerate case, multi-doc counts, and
validation. Cross-engine parity is the doc_phrase_search twin."""

import pytest

from erased_cells_spark.operators.search import phrase_occurrences, positional_postings


def _df(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


def _counts(spark, texts, phrase):
    return {
        r.doc_id: r.n_hits
        for r in phrase_occurrences(_df(spark, texts), phrase).collect()
    }


def test_basic_and_absent(spark):
    texts = ["a b c a b", "b a b c", "c c c"]
    assert _counts(spark, texts, "a b") == {0: 2, 1: 1}
    assert _counts(spark, texts, "a b c") == {0: 1, 1: 1}
    assert _counts(spark, texts, "z q") == {}


def test_overlapping_matches_counted(spark):
    assert _counts(spark, ["x x x x"], "x x") == {0: 3}


def test_single_word_phrase_is_term_frequency(spark):
    assert _counts(spark, ["w v w", "v v"], "w") == {0: 2}


def test_postings_positions_zero_based(spark):
    rows = positional_postings(_df(spark, ["p q"])).collect()
    assert sorted((r.term, r.pos) for r in rows) == [("p", 0), ("q", 1)]


def test_validation(spark):
    with pytest.raises(ValueError):
        phrase_occurrences(_df(spark, ["a"]), "a  b")  # empty token
