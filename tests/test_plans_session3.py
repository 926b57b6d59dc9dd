"""Plan-shape regressions for the third-session operator families — the
scale promises each docstring makes, asserted on actual physical plans
(the tests/test_plans.py discipline): exactly-once joins carry no
dedup aggregate, sketch pipelines and statistic twins stay pure-JVM
builtin (zero Python stages), nothing grows a cartesian product."""

from pyspark.sql import functions as F

from erased_cells_spark.queries import TWIN_QUERIES

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().sparkPlan().toString()


def _twin_plan(spark, name) -> str:
    return plan_of(TWIN_QUERIES[name](spark, SF_DIR))


def test_bbox_and_interval_overlap_have_no_dedup_or_python(spark):
    for name in ("geo_bbox_overlaps", "user_copresence_pairs"):
        p = _twin_plan(spark, name)
        assert "CartesianProduct" not in p, name
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name
    # the pair join itself has no distinct: assert on the raw operator
    from erased_cells_spark.operators.overlap import bbox_overlap_pairs

    rects = spark.createDataFrame(
        [(0, 0, 0, 10, 10), (1, 5, 5, 15, 15)],
        "rect_id long, x0 long, y0 long, x1 long, y1 long",
    )
    p = plan_of(bbox_overlap_pairs(rects, grid=8))
    assert "HashAggregate" not in p and "CartesianProduct" not in p


def test_sketches_are_pure_builtin(spark):
    for name in ("doc_kmv_overlap", "events_cms_counts", "doc_hll_cardinality"):
        p = _twin_plan(spark, name)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name
        assert "CartesianProduct" not in p, name


def test_statistics_twins_are_pure_builtin(spark):
    for name in (
        "events_cusum_alarms",
        "events_trend_cells",
        "events_scd2_dim",
        "geo_quadrat_test",
        "events_conversion_ab",
        "user_activity_gini",
        "doc_cell_diversity",
        "events_interarrival_ks",
        "orders_benford_audit",
        "doc_route_navigation",
        "doc_destination_points",
        "events_kanon_audit",
        "doc_phrase_search",
        "graph_clustering_top",
        "raster_viewshed",
        "raster_polygon_fill",
        "geo_traversal_heatmap",
        "geo_ripley_k",
        "doc_location_quotient",
    ):
        p = _twin_plan(spark, name)
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, name


def test_hilbert_twin_is_single_arrow_stage(spark):
    # the one deliberate Arrow stage in the session's twins (codegen form
    # capped at res 6 by janino's 64 KB method limit — documented)
    p = _twin_plan(spark, "doc_hilbert_density")
    assert p.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in p


def test_phrase_search_joins_are_filtered_before_join(spark):
    from erased_cells_spark.operators.search import phrase_occurrences

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    p = plan_of(phrase_occurrences(docs, "a b"))
    # per-term equality filters exist (posting lists join, not the corpus)
    assert p.count("= a)") >= 1 and p.count("= b)") >= 1, p
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p
