"""Per-partition Bloom filters (r5): point lookups on a high-cardinality
UNSORTED key — where zone maps span everything and prune nothing — must
skip every partition whose bloom proves absence, with zero false negatives
by construction and conservative behavior everywhere else."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.sources.snapshot import (
    SnapshotTable,
    _bloom_build,
    _bloom_might_contain,
)


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def shuffled_df(spark, n=400, buckets=4, seed=13):
    """Keys SHUFFLED across partitions: every partition's [min,max] spans
    ~the full key range, so zone maps cannot prune a point lookup."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    rows = [(int(k), i % buckets, f"u-{k}") for i, k in enumerate(perm)]
    return spark.createDataFrame(rows, "doc_id LONG, bucket LONG, url STRING")


class TestBloomUnit:
    def test_no_false_negatives_and_plausible_fpp(self):
        keys = list(range(0, 10_000, 2))
        b = _bloom_build(keys, fpp=0.01)
        assert all(_bloom_might_contain(b, k) for k in keys)  # NEVER false-neg
        fp = sum(_bloom_might_contain(b, k) for k in range(1, 10_000, 2))
        assert fp / 5_000 < 0.05  # ~1% target, generous bound

    def test_unindexable_values_refuse_or_pass(self):
        assert _bloom_build([1.5, 2.5]) is None  # floats refused (build)
        b = _bloom_build([1, 2, 3])
        assert _bloom_might_contain(b, 2.0)  # unindexable probe → no prune
        assert _bloom_might_contain(b, None)

    def test_string_keys(self):
        b = _bloom_build([f"url-{i}" for i in range(100)])
        assert _bloom_might_contain(b, "url-7")
        assert not _bloom_might_contain(b, "url-1000")


class TestBloomPruning:
    def test_point_lookup_prunes_where_zone_maps_cannot(self, spark, table):
        table.write_partitions(shuffled_df(spark), "bucket", [0, 1, 2, 3])
        # zone maps alone: full-range spans admit every partition
        before = table.plan_scan(where=[("doc_id", "=", 123)])
        assert before["pruned_n"] == 0
        table.build_bloom(spark, "doc_id")
        plan = table.plan_scan(where=[("doc_id", "=", 123)])
        assert len(plan["read"]) < 4  # bloom pruned non-owning partitions
        out = table.read(spark, where=[("doc_id", "=", 123)])
        assert [r.doc_id for r in out.collect()] == [123]
        # an absent key prunes everything (all-pruned empty result)
        assert table.read(spark, where=[("doc_id", "=", 999_999)]).count() == 0

    def test_string_bloom_and_range_predicates_untouched(self, spark, table):
        table.write_partitions(shuffled_df(spark), "bucket", [0, 1, 2, 3])
        table.build_bloom(spark, "url")
        plan = table.plan_scan(where=[("url", "=", "u-55")])
        assert len(plan["read"]) < 4
        assert table.read(spark, where=[("url", "=", "u-55")]).count() == 1
        # blooms never affect range predicates
        assert table.read(spark, where=[("doc_id", "<", 100)]).count() == 100

    def test_bloom_survives_rename_and_appends_stay_conservative(self, spark, table):
        table.write_partitions(shuffled_df(spark), "bucket", [0, 1, 2, 3])
        table.build_bloom(spark, "doc_id")
        table.rename_column("doc_id", "page_id")
        plan = table.plan_scan(where=[("page_id", "=", 123)])
        assert len(plan["read"]) < 4  # probe resolves the written alias
        assert table.read(spark, where=[("page_id", "=", 123)]).count() == 1
        # a NEW partition without a bloom is never pruned by one
        extra = spark.createDataFrame(
            [(10_000, 4, "u-10000")], "page_id LONG, bucket LONG, url STRING"
        )
        table.write_partitions(extra, "bucket", [4])
        out = table.read(spark, where=[("page_id", "=", 10_000)])
        assert out.count() == 1

    def test_build_is_a_commit_with_history(self, spark, table):
        table.write_partitions(shuffled_df(spark), "bucket", [0, 1, 2, 3])
        sid0 = table.metrics()["snapshot_id"]
        sid1 = table.build_bloom(spark, "doc_id")
        assert sid1 == sid0 + 1
        # time travel to the pre-index snapshot: no blooms, no prune
        plan = table.plan_scan(where=[("doc_id", "=", 123)], snapshot_id=sid0)
        assert plan["pruned_n"] == 0
        with pytest.raises(ValueError, match="no column"):
            table.build_bloom(spark, "nope")


class TestDistributedBuild:
    def test_distributed_blooms_bit_identical_to_driver(self, spark, tmp_path):
        """The 100 TB build path (key sets never reach the driver) must
        produce BYTE-identical manifest blooms to the driver path — the
        plan-time probe cannot know which strategy built the index."""
        from pyspark.sql import functions as F

        from erased_cells_spark.sources.snapshot import SnapshotTable

        def df(spark):
            base = spark.range(600).select(
                F.col("id").alias("doc_id"),
                (F.col("id") % 4).alias("bucket"),
                F.concat(F.lit("u-"), (F.col("id") * 7 % 997).cast("string")).alias("url"),
            )
            # bucket 3 becomes all-NULL on url; bucket 4 is empty
            return base.withColumn(
                "url", F.when(F.col("bucket") == 3, F.lit(None)).otherwise(F.col("url"))
            )

        a = SnapshotTable(str(tmp_path / "driver"))
        b = SnapshotTable(str(tmp_path / "dist"))
        for t in (a, b):
            t.write_partitions(df(spark), "bucket", [0, 1, 2, 3, 4])
        a.build_bloom(spark, "url")
        b.build_bloom(spark, "url", distributed=True)
        ba = {k: m.get("blooms") for k, m in a.current_manifest()["partitions"].items()}
        bb = {k: m.get("blooms") for k, m in b.current_manifest()["partitions"].items()}
        assert ba == bb
        assert all(v and "url" in v for v in ba.values())
        # and both prune identically on a point probe
        probe = [("url", "=", "u-7")]
        assert a.plan_scan(probe)["read"] == b.plan_scan(probe)["read"]
        # int column too
        a.build_bloom(spark, "doc_id")
        b.build_bloom(spark, "doc_id", distributed=True)
        ia = {k: m["blooms"]["doc_id"] for k, m in a.current_manifest()["partitions"].items()}
        ib = {k: m["blooms"]["doc_id"] for k, m in b.current_manifest()["partitions"].items()}
        assert ia == ib

    def test_distributed_refuses_nothing_but_matches_type_rules(self, spark, tmp_path):
        """A float column gets no blooms on either path (representation
        equality risks false negatives)."""
        from pyspark.sql import functions as F

        from erased_cells_spark.sources.snapshot import SnapshotTable

        t = SnapshotTable(str(tmp_path / "f"))
        d = spark.range(50).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 2).alias("bucket"),
            (F.col("id") * 1.5).alias("score"),
        )
        t.write_partitions(d, "bucket", [0, 1])
        t.build_bloom(spark, "score", distributed=True)
        assert all(
            not (m.get("blooms") or {}).get("score")
            for m in t.current_manifest()["partitions"].values()
        )
