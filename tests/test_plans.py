"""Plan-shape regression tests: the scale discipline the engine promises is
asserted on ACTUAL physical plans, so a refactor that silently introduces a
row-at-a-time Python stage, loses filter pushdown, or swaps a broadcast join
for a shuffled one fails CI — not a 100 TB run.

(Plan strings come from queryExecution; AQE-finalized where an action ran.)
"""

import pytest
from pyspark.sql import functions as F

from erased_cells_spark.queries import SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df, executed=False) -> str:
    qe = df._jdf.queryExecution()
    return (qe.executedPlan() if executed else qe.sparkPlan()).toString()


class TestPlanShapes:
    def test_flagship_has_no_row_python_and_one_arrow_stage(self, spark):
        from erased_cells_spark.pipeline import flagship_with_invariant
        from erased_cells_spark.sources.pages import generate_pages

        out, _ = flagship_with_invariant(generate_pages(spark, 200))
        p = plan_of(out)
        assert p.count("BatchEvalPython") == 0  # never row-at-a-time Python
        assert p.count("ArrowEvalPython") == 1  # exactly the winding verify

    def test_q1_pushdown_and_pruning(self, spark):
        df = SPARK_QUERIES["q1_pricing_summary"](spark, SF_DIR)
        p = plan_of(df)
        scan = next(line for line in p.split("\n") if "FileScan parquet" in line)
        # the shipdate filter reaches the scan (plan toString truncates the
        # PushedFilters field, so assert on the scan's DataFilters)
        assert "DataFilters: [isnotnull(l_shipdate" in scan
        # pruned scan: the 16-column lineitem table is read with 7 columns
        cols = scan.split("FileScan parquet [")[1].split("]")[0].split(",")
        assert len(cols) == 7, cols
        assert not any("l_comment" in c for c in cols)

    def test_q5_joins_are_all_broadcast(self, spark):
        df = SPARK_QUERIES["q5_region_revenue"](spark, SF_DIR)
        p = plan_of(df)
        assert "SortMergeJoin" not in p
        assert p.count("BroadcastHashJoin") >= 4

    def test_pip_join_broadcasts_cover_and_stays_narrow(self, spark):
        df = SPARK_QUERIES["pip_zone_counts"](spark, SF_DIR)
        p = plan_of(df)
        assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
        assert p.count("ArrowEvalPython") == 1
        assert p.count("BatchEvalPython") == 0

    def test_minhash_band_join_payload_is_id_band_bucket(self, spark):
        """The LSH band self-join must not carry shingle arrays: no `shs`
        column may appear below the band join."""
        from erased_cells_spark.operators.dedup import minhash_lsh_pairs

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        df = minhash_lsh_pairs(docs, 0.2)
        p = plan_of(df)
        # the cached band table feeds both join sides with EXACTLY
        # (id, band, bucket) — any shingle array there means the r01
        # 32×-shuffle regression is back
        band_scans = [
            seg.split("\n")[0]
            for seg in p.split("InMemoryTableScan")[1:]
            if "band" in seg.split("\n")[0]
        ]
        assert len(band_scans) >= 2, p  # both sides of the self-join
        for head in band_scans:
            assert "shs" not in head, head
        assert "shs_a" in p and "shs_b" in p  # verification re-attach exists

    def test_exact_dedup_is_pure_builtin(self, spark):
        df = SPARK_QUERIES["exact_dup_groups"](spark, SF_DIR)
        p = plan_of(df)
        assert "Python" not in p  # md5 fingerprint groupBy is all JVM

    def test_simhash_is_pure_builtin(self, spark):
        df = SPARK_QUERIES["simhash_dups"](spark, SF_DIR)
        p = plan_of(df)
        assert "Python" not in p  # md5/shift/sum signature algebra is all JVM

    def test_doc_gopher_quality_is_pure_builtin(self, spark):
        df = SPARK_QUERIES["doc_gopher_quality"](spark, SF_DIR)
        assert "Python" not in plan_of(df)

    def test_q21_exists_shapes_are_semi_anti_equi_joins(self, spark):
        """The EXISTS/NOT-EXISTS pair must plan as hash-partitioned
        semi/anti EQUI-joins on l_orderkey (the supplier inequality rides
        as a residual condition) — never a nested-loop/cartesian, which a
        naive correlated-subquery translation can produce."""
        df = SPARK_QUERIES["q21_blamed_suppliers"](spark, SF_DIR)
        p = plan_of(df)
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
        assert "LeftSemi" in p and "LeftAnti" in p

    def test_q13_outer_join_preserved(self, spark):
        """q13's right-side filter must stay INSIDE the outer join (a filter
        pulled above it would silently drop zero-order customers)."""
        df = SPARK_QUERIES["q13_customer_distribution"](spark, SF_DIR)
        p = plan_of(df)
        assert "LeftOuter" in p
        zero_bucket = df.filter(F.col("c_count") == 0).collect()
        assert len(zero_bucket) == 1 and zero_bucket[0].custdist > 0

    def test_q18_semi_join_on_aggregate(self, spark):
        df = SPARK_QUERIES["q18_large_volume_customers"](spark, SF_DIR)
        assert "LeftSemi" in plan_of(df)

    def test_media_phash_block_join_has_no_row_python(self, spark):
        """The dHash pipeline's only Python is the Arrow-batched decode
        (mapInPandas); the block join + hamming verify stay JVM."""
        from erased_cells_spark.operators.dedup import hamming_block_pairs
        from erased_cells_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            image_dhash,
            phash_fixture_rows,
        )

        rows = [
            {**r, "payload": bytearray(r["payload"])} for r in phash_fixture_rows(64, 5)
        ]
        sigs = image_dhash(spark.createDataFrame(rows, MEDIA_SCHEMA))
        caches: list = []
        pairs = hamming_block_pairs(
            sigs, max_hamming=3, id_col="media_id", sig_col="dhash", caches=caches
        )
        p = plan_of(pairs)
        for c in caches:
            c.unpersist()
        assert "BatchEvalPython" not in p
        assert "CartesianProduct" not in p

    def test_q6_all_predicates_pushed_schema_pruned(self, spark):
        """q6 is the canonical pushdown probe: every filter must reach the
        parquet scan and the ReadSchema must carry only the needed columns
        (a scan reading all 11 lineitem columns for a 4-column query is
        wrong)."""
        df = SPARK_QUERIES["q6_forecast_revenue"](spark, SF_DIR)
        p = plan_of(df)
        assert "PushedFilters: [" in p
        for col in ("l_shipdate", "l_discount", "l_quantity"):
            assert p.count(col) >= 1
        rs = p[p.index("ReadSchema:"):].splitlines()[0]
        assert "l_extendedprice" in rs and "l_returnflag" not in rs and "l_orderkey" not in rs

    def test_focal_mean_is_pure_builtin(self, spark):
        df = SPARK_QUERIES["raster_focal_mean"](spark, SF_DIR)
        p = plan_of(df)
        assert "Python" not in p and "CartesianProduct" not in p

    def test_radius_join_has_no_cartesian(self, spark):
        df = SPARK_QUERIES["radius_join_docs"](spark, SF_DIR)
        p = plan_of(df)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_bucketed_query_join_is_shuffle_free(self, spark):
        """The registered bucketed query's join must add ZERO shuffle
        Exchanges (the only shuffle in the full query is the final tiny
        aggregation) — forced to SortMergeJoin so bucket co-location, not
        broadcast, is what's proven."""
        from erased_cells_spark.plans.bucketing import ensure_bucketed_tpch, shuffle_count

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            li, od = ensure_bucketed_tpch(spark, SF_DIR)
            j = li.filter(F.col("l_returnflag") == "R").join(
                od, F.col("l_orderkey") == F.col("o_orderkey")
            )
            j.count()
            assert shuffle_count(j) == 0
            full = SPARK_QUERIES["bucketed_returns_revenue"](spark, SF_DIR)
            full.count()
            # join contributes nothing; agg + orderBy are the only exchanges
            assert shuffle_count(full) <= 2
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_embedding_neardup_lsh_is_bucketed(self, spark):
        """The REGISTERED near-dup query must be the bucketed scale path: an
        equi-join on (table, bucket) — never the exact twin's full-table
        broadcast with an `<`-only (nested-loop) condition."""
        df = SPARK_QUERIES["embedding_cosine_dups_lsh"](spark, SF_DIR)
        p = plan_of(df)
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p

    def test_radius_pairs_is_equi_join_no_python(self, spark):
        """The data-scaled radius SELF-join must plan as an equi-join on the
        (band, bucket) int keys — never a cartesian/NLJ pair space — with
        zero Python stages (candidates + haversine are all JVM)."""
        from erased_cells_spark.queries import TWIN_QUERIES

        df = TWIN_QUERIES["geo_radius_pairs"](spark, SF_DIR)
        p = plan_of(df)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "Python" not in p  # no Arrow stage either: pure JVM

    def test_idw_surface_is_equi_join_no_python(self, spark):
        """IDW rides the same radius_join: generated centers table, equi-join
        keys, JVM haversine + weight arithmetic — no Python anywhere."""
        from erased_cells_spark.queries import TWIN_QUERIES

        df = TWIN_QUERIES["geo_idw_surface"](spark, SF_DIR)
        p = plan_of(df)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "Python" not in p

    def test_chunk_dedup_and_quadkey_are_pure_builtin(self, spark):
        from erased_cells_spark.queries import TWIN_QUERIES

        for name in ("doc_chunk_dedup", "doc_quadkey_rollup"):
            p = plan_of(TWIN_QUERIES[name](spark, SF_DIR))
            assert "Python" not in p, name
            assert "CartesianProduct" not in p, name


class TestR7cPlanShapes:
    """Plan discipline for the second r7 continuation session's operators."""

    def test_segment_crossings_is_equi_join_no_python(self, spark):
        # assert on the OPERATOR plan: the registered twin wraps it in the
        # scale-invariant sampling whose 1-row count crossJoin is the
        # repo's documented allowed pattern and would read as a BNLJ here
        from erased_cells_spark.operators.crossings import segment_crossing_pairs

        segs = spark.createDataFrame(
            [(0, 0, 0, 10, 10), (1, 5, 0, 5, 10)],
            "seg_id LONG, ax LONG, ay LONG, bx LONG, by LONG",
        )
        p = plan_of(segment_crossing_pairs(segs, grid=8))
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        # exactly-once first-shared-cell rule: no distinct/dedup aggregate
        assert "HashAggregate" not in p and "SortAggregate" not in p

    def test_prefix_filter_join_is_pure_builtin(self, spark):
        from erased_cells_spark.queries import TWIN_QUERIES

        p = plan_of(TWIN_QUERIES["doc_prefix_jaccard_dups"](spark, SF_DIR))
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    def test_fuzzy_edit1_is_equi_join_no_python(self, spark):
        from erased_cells_spark.queries import TWIN_QUERIES

        p = plan_of(TWIN_QUERIES["doc_edit1_fuzzy_pairs"](spark, SF_DIR))
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p

    def test_d8_and_resample_and_coverage_are_pure_builtin(self, spark):
        from erased_cells_spark.queries import TWIN_QUERIES

        for name in ("raster_d8_flow", "user_track_resample", "user_interval_coverage",
                     "events_cohort_retention", "user_od_matrix",
                     "doc_lang_temperature_sample", "doc_hll_cardinality",
                     "events_value_quantiles"):
            p = plan_of(TWIN_QUERIES[name](spark, SF_DIR))
            assert "BatchEvalPython" not in p, name
            assert "ArrowEvalPython" not in p, name
            assert "CartesianProduct" not in p, name

    def test_kmeans_assign_is_broadcast_no_python(self, spark):
        from erased_cells_spark.queries import TWIN_QUERIES

        p = plan_of(TWIN_QUERIES["emb_kmeans_assign"](spark, SF_DIR))
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        # the k-row centroid side must broadcast, never shuffle-join
        assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p or "Broadcast" in p
        assert "SortMergeJoin" not in p

    def test_skyline_is_two_arrow_stages_no_shuffle_join(self, spark):
        from erased_cells_spark.queries import TWIN_QUERIES

        p = plan_of(TWIN_QUERIES["doc_skyline_frontier"](spark, SF_DIR))
        # two mapInPandas phases by design; absolutely no join anywhere
        assert p.count("MapInPandas") == 2
        assert "Join" not in p and "CartesianProduct" not in p
