"""End-to-end pages pipeline tests: byte-identical extraction (the north-rule
per-row invariant), geocode parity, and PIP join vs brute-force oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.functions.geocode import geocode_np
from erased_cells_spark.functions.text import extract_text_bytes
from erased_cells_spark.operators.cells_expr import cell_key_expr, cell_key_np
from erased_cells_spark.operators.pip import pip_join, pip_join_np, polygon_cover_keys
from erased_cells_spark.pipeline import flagship_zone_counts, geocoded_pages
from erased_cells_spark.sources.pages import gen_batch, generate_pages
from erased_cells_spark.spatial.geom import make_polygon_fixtures, points_in_ring

N = 5000
SEED = 42


@pytest.fixture(scope="module")
def pages(spark):
    return generate_pages(spark, N, SEED).cache()


class TestGenerator:
    def test_deterministic_and_distributed_consistent(self, spark, pages):
        # same rows regardless of partitioning
        a = {r.url: r.text for r in pages.collect()}
        b = generate_pages(spark, N, SEED, partitions=3).collect()
        assert len(a) == N == len(b)
        for r in b:
            assert a[r.url] == r.text
        # matches the local twin
        local = gen_batch(np.arange(N), SEED)
        for i in (0, 17, 4999):
            assert local.url[i] in a and a[local.url[i]] == local.text[i]

    def test_zipfian_hosts(self, pages):
        counts = pages.groupBy(F.regexp_extract("url", "^https?://([^/]+)", 1)).count()
        top = counts.orderBy(F.desc("count")).first()["count"]
        assert top > N / 1000 * 20  # hot host ≫ uniform share → skew exists

    def test_extraction_byte_identity(self, pages):
        # north-rule invariant: extract(html) == text, byte-identical per url
        mism = (
            geocoded_pages(pages)
            .filter(F.col("extracted") != F.col("text"))
            .count()
        )
        assert mism == 0
        # and the local function agrees byte-for-byte too
        local = gen_batch(np.arange(50), SEED)
        for h, t in zip(local.html, local.text):
            assert extract_text_bytes(h) == t

    def test_builtin_extraction_equals_pandas_udf(self, spark, pages):
        # hot path (JVM builtins) ≡ Arrow pandas UDF twin, incl. edge cases
        from erased_cells_spark.functions.text import extract_text, extract_text_pandas

        edge = spark.createDataFrame(
            [(b"<html><p>hello</p></html>",), (b"no markers",), (b"<p>unclosed",), (b"",)],
            "html binary",
        )
        both = pages.select("html").unionByName(edge)
        mism = both.filter(
            extract_text(F.col("html")) != extract_text_pandas(F.col("html"))
        ).count()
        assert mism == 0


class TestGeocode:
    def test_builtin_matches_numpy(self, spark, pages):
        rows = geocoded_pages(pages, use_extracted_text=False).select(
            "host", "lon", "lat"
        ).limit(500).collect()
        lons, lats = geocode_np([r.host for r in rows])
        for r, lo, la in zip(rows, lons, lats):
            assert r.lon == pytest.approx(lo, abs=1e-12)
            assert r.lat == pytest.approx(la, abs=1e-12)
        for r in rows:
            assert -180 <= r.lon < 180 and -85 <= r.lat < 85

    def test_cell_key_expr_matches_numpy(self, spark):
        import pandas as pd

        rng = np.random.default_rng(5)
        pdf = pd.DataFrame({"lon": rng.uniform(-180, 180, 2000), "lat": rng.uniform(-90, 90, 2000)})
        df = spark.createDataFrame(pdf)
        got = df.select(cell_key_expr(F.col("lon"), F.col("lat"), 8).alias("c")).toPandas()["c"]
        want = cell_key_np(pdf.lon.to_numpy(), pdf.lat.to_numpy(), 8)
        assert (got.to_numpy() == want).all()


class TestPIPJoin:
    def test_cover_is_superset_of_member_cells(self):
        polys = make_polygon_fixtures(16, seed=7)
        rng = np.random.default_rng(1)
        for p in polys:
            cover = set(polygon_cover_keys(p["ring"], 8).tolist())
            # random points inside the polygon must land in covered cells
            x0, y0, x1, y1 = (
                p["ring"][:, 0].min(), p["ring"][:, 1].min(),
                p["ring"][:, 0].max(), p["ring"][:, 1].max(),
            )
            lon = rng.uniform(x0, x1, 300)
            lat = rng.uniform(y0, y1, 300)
            inside = points_in_ring(lon, lat, p["ring"])
            keys = cell_key_np(lon[inside], lat[inside], 8)
            assert set(keys.tolist()) <= cover

    def test_pip_join_matches_bruteforce(self, spark, pages):
        polys = make_polygon_fixtures(64, seed=42)
        pts = geocoded_pages(pages, use_extracted_text=False).select("url", "lon", "lat")
        got = {(r.url, r.poly_id) for r in pip_join(pts, polys).collect()}

        local = pts.toPandas()
        pairs = pip_join_np(local.lon.to_numpy(), local.lat.to_numpy(), polys)
        want = {(local.url[i], pid) for i, pid in pairs}
        assert got == want
        assert len(want) > 0  # fixture sanity: some pages actually fall in zones

    def test_flagship_counts_match_oracle(self, spark, pages):
        polys = make_polygon_fixtures(64, seed=42)
        got = {r.poly_id: (r.n_pages, r.n_hosts) for r in flagship_zone_counts(pages, polys).collect()}

        pts = geocoded_pages(pages, use_extracted_text=False).select("url", "host", "lon", "lat").toPandas()
        want = {}
        for p in polys:
            hit = points_in_ring(pts.lon.to_numpy(), pts.lat.to_numpy(), p["ring"])
            if hit.any():
                want[p["poly_id"]] = (int(hit.sum()), int(pts.host[hit].nunique()))
        assert got == want


class TestExtractionEdgeCases:
    """Marker-pair edge cases: the builtin path must mirror the byte twin's
    FIRST-'<p>' → LAST-'</p>' semantics on real-HTML-ish bodies (multiple
    pairs, nested/stray markers, closes before opens, unicode)."""

    CASES = [
        b"<html><p>plain body</p></html>",
        b"<html><p>first</p> middle <p>second</p></html>",      # multi-pair
        b"<p>a</p><p>b</p><p>c</p>",
        b"</p>stray close first<p>body</p>",
        b"<p>open only, no close",
        b"close only</p>",
        b"no markers at all",
        b"",
        b"<p></p>",
        b"<p>unicode \xc3\xa9\xc3\xa0\xe2\x82\xac</p>",
        b"</p><p>",                                             # close before open, empty body
        b"<p>outer <p>inner</p> tail</p>",                      # nested opens
    ]

    def test_builtin_matches_byte_twin_on_marker_edge_cases(self, spark):
        from erased_cells_spark.functions.text import (
            extract_text,
            extract_text_bytes,
        )

        df = spark.createDataFrame([(bytearray(h),) for h in self.CASES], "html binary")
        got = [r.t for r in df.select(extract_text(F.col("html")).alias("t")).collect()]
        want = [extract_text_bytes(h) for h in self.CASES]
        assert got == want
