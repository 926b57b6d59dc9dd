"""Sequence packing (concat-and-chunk) unit contracts (r7): exact offsets,
sequence spans, straddle flags, empty-doc behavior, shard independence.
The cross-engine window twin is `doc_pack_sequences` (test_oracle_twins)."""

import pytest

from erased_cells_spark.operators.packing import pack_spans, shard_pack_stats


@pytest.fixture()
def packed(spark):
    rows = [
        # shard a: tokens 300, 300, 0, 500 at budget 256
        ("a", 1, 300), ("a", 2, 300), ("a", 3, 0), ("a", 4, 500),
        # shard b: independent offsets restart at 0
        ("b", 1, 256), ("b", 2, 1),
    ]
    df = spark.createDataFrame(rows, "shard string, doc_id long, toks long")
    return pack_spans(df, "toks", 256, "shard", "doc_id")


class TestPackSpans:
    def test_offsets_spans_straddles(self, packed):
        got = {
            (r.shard, r.doc_id): (r.pack_offset, r.seq_first, r.seq_last, r.straddles)
            for r in packed.collect()
        }
        assert got[("a", 1)] == (0, 0, 1, True)      # 0..299 spans seqs 0-1
        assert got[("a", 2)] == (300, 1, 2, True)    # 300..599 spans 1-2
        assert got[("a", 3)] == (600, 2, 2, False)   # empty doc: lands, never straddles
        assert got[("a", 4)] == (600, 2, 4, True)    # 600..1099 spans 2-4
        # shard b restarts: exact-budget doc fills seq 0 exactly
        assert got[("b", 1)] == (0, 0, 0, False)
        assert got[("b", 2)] == (256, 1, 1, False)

    def test_shard_stats(self, packed):
        stats = {r.shard: r for r in shard_pack_stats(packed, "shard", 256).collect()}
        a, b = stats["a"], stats["b"]
        assert (a.n_docs, a.n_straddling, a.n_seqs, a.n_boundary_crossings) == (4, 3, 5, 4)
        assert (b.n_docs, b.n_straddling, b.n_seqs, b.n_boundary_crossings) == (2, 0, 2, 0)

    def test_bad_budget(self, spark):
        df = spark.createDataFrame([("a", 1, 1)], "shard string, doc_id long, toks long")
        with pytest.raises(ValueError, match="budget"):
            pack_spans(df, "toks", 0, "shard", "doc_id")
