"""Hot-bucket guard (operators/buckets.py): the LSH family's bucket
self-joins must stay O(m·cap) — not O(m²) — when a degenerate bucket holds
m ids (the boilerplate-template failure mode of web-corpus dedup), while
remaining provably inactive (bit-identical output, empty hot report) on
healthy corpora — which is what keeps every existing oracle green."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.buckets import salt_hot_buckets
from erased_cells_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs
from erased_cells_spark.operators.similarity import ann_lsh_self_topk, cosine_dup_pairs_lsh
from erased_cells_spark.sources.pages import gen_batch

CAP = 100
M = 5000  # planted degenerate-bucket size


@pytest.fixture(scope="module")
def planted_triples(spark):
    """One degenerate (band=0, bucket=77) holding M ids + 50 healthy buckets
    of 8 ids each."""
    ids = np.arange(M)
    hot = pd.DataFrame({"id": ids, "band": 0, "bucket": 77})
    cold = pd.DataFrame(
        {
            "id": np.arange(400),
            "band": 1,
            "bucket": np.arange(400) % 50,
        }
    )
    return spark.createDataFrame(pd.concat([hot, cold], ignore_index=True))


class TestSaltHotBuckets:
    def test_degenerate_bucket_pair_count_is_linear_not_quadratic(self, spark, planted_triples):
        report = []
        g = salt_hot_buckets(planted_triples, ["band", "bucket"], cap=CAP, report=report).cache()
        a, b = g.alias("a"), g.alias("b")
        pairs = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.salt") == F.col("b.salt"))
            & (F.col("a.id") < F.col("b.id")),
        ).count()
        g.unpersist()
        # unguarded: M(M-1)/2 ≈ 12.5M pairs from the hot bucket alone.
        # guarded: ~nsplits · C(cap,2) ≈ M·cap/2 — assert the linear bound.
        assert pairs <= M * CAP
        assert pairs > 0  # sub-buckets still generate candidates inside
        hot = report[0].collect()
        assert len(hot) == 1
        assert hot[0].bucket_n == M and hot[0].nsplits == (M + CAP - 1) // CAP

    def test_salt_balances_and_is_deterministic(self, spark, planted_triples):
        g = salt_hot_buckets(planted_triples, ["band", "bucket"], cap=CAP)
        sizes = (
            g.groupBy("band", "bucket", "salt").count().orderBy("band", "bucket", "salt").collect()
        )
        hot_sizes = [r["count"] for r in sizes if r.band == 0]
        assert sum(hot_sizes) == M
        assert max(hot_sizes) <= 4 * CAP  # hash-balanced, not adversarial
        # deterministic: the same id gets the same salt on a second pass
        g2 = salt_hot_buckets(planted_triples, ["band", "bucket"], cap=CAP)
        assert (
            g.select("id", "band", "bucket", "salt")
            .exceptAll(g2.select("id", "band", "bucket", "salt"))
            .count()
            == 0
        )

    def test_inactive_on_healthy_buckets(self, spark, planted_triples):
        report = []
        g = salt_hot_buckets(
            planted_triples.filter(F.col("band") == 1),
            ["band", "bucket"],
            cap=CAP,
            report=report,
        )
        assert g.filter(F.col("salt") != 0).count() == 0
        assert report[0].count() == 0


@pytest.fixture(scope="module")
def flood_docs(spark):
    """60 distinct docs + a 300-doc byte-identical boilerplate flood: every
    band of every flood doc lands in ONE bucket (same signature)."""
    base = gen_batch(np.arange(60), seed=3)[["text"]].copy()
    base["doc_id"] = np.arange(60)
    flood = pd.DataFrame(
        {"text": ["cookie consent boilerplate page please accept our terms"] * 300}
    )
    flood["doc_id"] = np.arange(1000, 1300)
    return spark.createDataFrame(pd.concat([base, flood], ignore_index=True))


class TestGuardedOperatorsEndToEnd:
    def test_minhash_flood_detected_and_precision_kept(self, spark, flood_docs):
        report, caches = [], []
        out = minhash_lsh_pairs(
            flood_docs, 0.5, caches=caches, bucket_cap=20, hot_report=report
        ).collect()
        for c in caches:
            c.unpersist()
        # every emitted pair is exact-verified (precision stays exact under
        # the guard) and intra-flood pairs still surface from the sub-buckets
        assert all(r.jaccard >= 0.5 for r in out)
        flood_pairs = [r for r in out if r.id_a >= 1000 and r.id_b >= 1000]
        assert len(flood_pairs) > 0
        assert all(r.jaccard == pytest.approx(1.0) for r in flood_pairs)
        # the guard saw the degenerate buckets (one per band, 32 bands)
        hot = report[0].collect()
        assert len(hot) >= 1
        assert all(r.bucket_n >= 300 for r in hot)

    def test_minhash_guard_noop_below_cap(self, spark, flood_docs):
        """With the cap above every bucket size the guard must be a no-op:
        identical pairs to the guarded default on the same corpus."""
        report = []
        a = minhash_lsh_pairs(flood_docs, 0.5, bucket_cap=10**6, hot_report=report)
        b = minhash_lsh_pairs(flood_docs, 0.5)  # default cap; buckets ≤ 300
        got_a = {(r.id_a, r.id_b) for r in a.collect()}
        got_b = {(r.id_a, r.id_b) for r in b.collect()}
        assert got_a == got_b
        assert report[0].count() == 0
        spark.catalog.clearCache()

    def test_simhash_flood_bounded(self, spark, flood_docs):
        report, caches = [], []
        out = simhash_pairs(
            flood_docs, 3, caches=caches, bucket_cap=20, hot_report=report
        ).collect()
        for c in caches:
            c.unpersist()
        assert all(r.hamming <= 3 for r in out)
        flood_pairs = [r for r in out if r.id_a >= 1000 and r.id_b >= 1000]
        assert len(flood_pairs) > 0 and all(r.hamming == 0 for r in flood_pairs)
        assert report[0].count() >= 1

    def test_embedding_lsh_flood_bounded(self, spark):
        """120 near-identical vectors (one degenerate LSH bucket per table)
        + 40 spread vectors; guard caps the self-join and keeps precision."""
        rng = np.random.default_rng(11)
        base = rng.normal(size=64)
        flood = base[None, :] + rng.normal(scale=1e-4, size=(120, 64))
        spread = rng.normal(size=(40, 64))
        vecs = np.vstack([flood, spread])
        pdf = pd.DataFrame(
            {"vec_id": np.arange(160), "embedding": [v.astype(np.float32) for v in vecs]}
        )
        df = spark.createDataFrame(pdf)
        report, caches = [], []
        out = cosine_dup_pairs_lsh(
            df, 0.999, caches=caches, bucket_cap=16, hot_report=report
        ).collect()
        for c in caches:
            c.unpersist()
        assert all(r.cosine >= 0.999 for r in out)
        assert len([r for r in out if r.id_a < 120 and r.id_b < 120]) > 0
        assert report[0].count() >= 1

        report2, caches2 = [], []
        topk = ann_lsh_self_topk(
            df, k=3, caches=caches2, bucket_cap=16, hot_report=report2
        ).collect()
        for c in caches2:
            c.unpersist()
        assert len(topk) > 0
        assert report2[0].count() >= 1


class TestStopGramCap:
    def test_hot_shingles_dropped_dups_kept(self, spark):
        """Stop-gram removal (ngram_jaccard_pairs ground-truth twin's scale
        option): a boilerplate trigram shared by every doc is excluded from
        the shingle space, while genuine duplicate pairs still score 1.0 on
        the informative shingles."""
        import numpy as np

        from erased_cells_spark.operators.dedup import ngram_jaccard_pairs

        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(1000)]
        docs = []
        for i in range(50):
            body = " ".join(rng.choice(vocab, size=12, replace=False))
            docs.append((i, "common boilerplate header " + body))
        docs.append((100, docs[7][1]))  # exact dup of doc 7
        df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
        capped = ngram_jaccard_pairs(df, 0.5, stop_gram_df_cap=10)
        got = {(r.id_a, r.id_b): r.jaccard for r in capped.collect()}
        assert set(got) == {(7, 100)}
        assert got[(7, 100)] == 1.0
        # unguarded: the shared header trigrams alone connect no pair above
        # 0.5, so the exact twin agrees on THIS corpus (the cap's job is
        # the quadratic join blowup, not the final answer)
        exact = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(df, 0.5).collect()}
        assert exact == {(7, 100)}


class TestSaltHotBucketsProperties:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_populations_partition_exactly_and_bound_groups(self, spark, seed):
        """Random bucket populations (mixed healthy/hot): salting must be a
        PARTITION of each bucket (no row lost/duplicated, sub-buckets within
        the bucket) with every (bucket, salt) group ≲ cap, and rows of
        healthy buckets keep salt 0."""
        rng = np.random.default_rng(seed)
        cap = int(rng.integers(8, 64))
        rows = []
        sizes = {}
        next_id = 0
        for b in range(int(rng.integers(3, 10))):
            m = int(rng.integers(1, cap * 6))
            sizes[b] = m
            for _ in range(m):
                rows.append((next_id, 0, b))
                next_id += 1
        triples = spark.createDataFrame(rows, "id LONG, band LONG, bucket LONG")
        g = salt_hot_buckets(triples, ["band", "bucket"], cap=cap).collect()
        assert len(g) == len(rows)  # partition: nothing lost, nothing added
        assert {(r.id, r.bucket) for r in g} == {(i, b) for i, _, b in rows}
        from collections import Counter

        group_sizes = Counter((r.bucket, r.salt) for r in g)
        for (b, salt), n in group_sizes.items():
            if sizes[b] <= cap:
                assert salt == 0 and n == sizes[b]
            else:
                # hash-balanced around cap; 4x slack for small-sample skew
                assert n <= 4 * cap
