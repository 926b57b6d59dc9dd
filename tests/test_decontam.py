"""Eval-set decontamination vs brute-force twin + plan hygiene."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.decontam import ngram_overlap_flags, ngram_overlap_np

VOCAB = [f"t{i:03d}" for i in range(150)]


@pytest.fixture(scope="module")
def corpora(spark):
    """30 train docs + 6 eval docs; 3 train docs contain verbatim 20-word
    spans lifted from eval docs (the leak), one leak shorter than n=13 words
    (must NOT flag), and one train doc shorter than 13 words."""
    rng = np.random.default_rng(3)
    ev = [(100 + i, " ".join(rng.choice(VOCAB, 40))) for i in range(6)]
    tr = [(i, " ".join(rng.choice(VOCAB, 60))) for i in range(30)]
    leaky = []
    for tid, src in [(0, 0), (7, 2), (21, 5)]:
        words = tr[tid][1].split(" ")
        span = ev[src][1].split(" ")[5:25]  # 20-word verbatim lift
        words[10:30] = span
        leaky.append(tid)
        tr[tid] = (tid, " ".join(words))
    # short lift (8 words < n): no 13-gram can match
    words = tr[3][1].split(" ")
    words[0:8] = ev[1][1].split(" ")[0:8]
    tr[3] = (3, " ".join(words))
    tr.append((99, "tiny doc under thirteen words here"))
    tdf = spark.createDataFrame(tr, "doc_id LONG, text STRING")
    edf = spark.createDataFrame(ev, "doc_id LONG, text STRING")
    return tdf, edf, tr, ev, set(leaky)


class TestDecontam:
    def test_matches_bruteforce(self, spark, corpora):
        tdf, edf, tr, ev, leaky = corpora
        got = {
            r.train_id: r.n_hits
            for r in ngram_overlap_flags(tdf, edf, n=13).collect()
        }
        want = ngram_overlap_np(tr, ev, n=13)
        assert got == want
        assert set(got) >= leaky  # every planted 20-word lift is flagged
        # a 20-word verbatim span yields exactly 8 distinct 13-grams
        for tid in leaky:
            assert got[tid] == 8
        assert 3 not in got  # 8-word lift can't contain a 13-gram
        assert 99 not in got  # short doc has no 13-grams at all

    def test_no_python_in_plan(self, spark, corpora):
        tdf, edf, *_ = corpora
        p = ngram_overlap_flags(tdf, edf)._jdf.queryExecution().sparkPlan().toString()
        assert "Python" not in p and "CartesianProduct" not in p

    def test_keep_list_composition(self, spark, corpora):
        tdf, edf, tr, ev, leaky = corpora
        flags = ngram_overlap_flags(tdf, edf, n=13).withColumnRenamed("train_id", "doc_id")
        kept = {r.doc_id for r in tdf.join(flags, "doc_id", "left_anti").collect()}
        assert kept == {tid for tid, _ in tr} - leaky
