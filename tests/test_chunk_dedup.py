"""Corpus-level chunk dedup (operators/dedup.chunk_dedup): keep-one-copy
semantics, claim ordering, reassembly fidelity, and chunk-boundary edges.
The cross-engine twin (doc_chunk_dedup) runs in test_oracle_twins; these
pin the operator's contract on hand-built corpora."""

from __future__ import annotations

import hashlib

from erased_cells_spark.operators.dedup import chunk_dedup


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _run(spark, rows, w=4):
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = chunk_dedup(df, words_per_chunk=w).collect()
    return {r.doc_id: (r.n_chunks, r.n_kept, r.kept_md5) for r in out}


def test_exact_duplicate_doc_fully_claimed(spark):
    text = "a b c d e f g h"  # two 4-word chunks
    got = _run(spark, [(1, text), (2, text)])
    assert got[1] == (2, 2, _md5(text))
    assert got[2] == (2, 0, _md5(""))


def test_smallest_doc_then_chunk_wins(spark):
    # the shared chunk sits at chunk_no 1 of doc 1 but chunk_no 0 of doc 2:
    # doc ordering beats chunk ordering (doc_id asc, then chunk_no asc)
    shared = "x y z w"
    got = _run(spark, [(1, "a b c d " + shared), (2, shared + " p q r s")])
    assert got[1] == (2, 2, _md5("a b c d " + shared))
    assert got[2] == (2, 1, _md5("p q r s"))


def test_within_doc_repeat_keeps_first(spark):
    got = _run(spark, [(5, "m n o p m n o p tail")])
    # chunks: "m n o p", "m n o p", "tail" -> second claimed by the first
    assert got[5] == (3, 2, _md5("m n o p tail"))


def test_partial_final_chunk_is_its_own_unit(spark):
    # "a b c d e" -> chunks "a b c d" and "e"; a doc that is just "e"
    # collides with the final partial chunk
    got = _run(spark, [(1, "a b c d e"), (2, "e")])
    assert got[1] == (2, 2, _md5("a b c d e"))
    assert got[2] == (1, 0, _md5(""))


def test_single_word_and_exact_boundary(spark):
    got = _run(spark, [(1, "solo"), (2, "p q r s")])  # 1 chunk each, no dups
    assert got[1] == (1, 1, _md5("solo"))
    assert got[2] == (1, 1, _md5("p q r s"))


def test_rejects_bad_chunk_width(spark):
    import pytest

    with pytest.raises(ValueError):
        chunk_dedup(None, words_per_chunk=0)
