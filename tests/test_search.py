"""BM25 retrieval sanity + plan hygiene (exact parity is the DuckDB oracle's
job — doc_bm25_search; here: ranking behavior on a controlled corpus)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.search import bm25_scores


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark spark spark fast"),          # high tf on a rare term
        (1, "spark data data data data data"),  # one hit, long doc
        (2, "data data data data"),             # no query terms
        (3, "spark vector"),                    # two distinct query terms
        (4, "the the the the the the the the"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


class TestBM25:
    def test_ranking_behavior(self, spark, corpus):
        out = {r.doc_id: r.score for r in bm25_scores(corpus, ["spark", "vector"]).collect()}
        assert set(out) == {0, 1, 3}  # only matching docs
        assert out[3] > out[0] > out[1]  # 2 terms > high-tf 1 term > long-doc 1 hit
        assert all(s > 0 for s in out.values())

    def test_idf_downweights_common_terms(self, spark, corpus):
        # 'the' appears in 1 doc here; craft a corpus where it's ubiquitous
        rows = [(i, "the spark") for i in range(10)] + [(10, "the"), (11, "spark vector the")]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
        out = {r.doc_id: r.score for r in bm25_scores(df, ["the", "vector"]).collect()}
        # 'vector' (df=1) must dominate 'the' (df=12): doc 11 wins by a lot
        assert out[11] == max(out.values())
        assert out[11] > 2 * out[0]

    def test_plan_is_pure_jvm(self, spark, corpus):
        p = bm25_scores(corpus, ["spark"])._jdf.queryExecution().sparkPlan().toString()
        assert "Python" not in p
