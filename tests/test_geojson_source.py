"""GeoJSON polygon source contracts (r7): winding normalization, holes,
MultiPolygon explode, id plumbing, fail-loud malformed documents, the
distributed ndjson path ≡ the driver path, and end-to-end containment
through pip_join_df matching the numpy winding oracle."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from erased_cells_spark.operators.pip import pip_join_df, pip_join_np
from erased_cells_spark.sources.geojson import (
    GeoJsonFormatError,
    geojson_polygon_rows,
    geojson_polygons,
    geojson_seq_polygons,
)

SQUARE = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0], [0.0, 0.0]]
HOLE = [[3.0, 3.0], [7.0, 3.0], [7.0, 7.0], [3.0, 7.0], [3.0, 3.0]]  # CCW as given


def _fc(features):
    return json.dumps({"type": "FeatureCollection", "features": features})


def _feat(pid, geom, props=None):
    return {"type": "Feature", "id": pid, "geometry": geom, "properties": props}


class TestParse:
    def test_winding_normalized_outer_ccw_hole_cw(self):
        # outer given CW (spec violation), hole given CCW (also wrong)
        doc = _fc([_feat(7, {"type": "Polygon", "coordinates": [SQUARE[::-1], HOLE]})])
        rows = geojson_polygon_rows(doc)
        assert [r["is_hole"] for r in rows] == [False, True]
        outer = np.asarray(rows[0]["ring"])
        hole = np.asarray(rows[1]["ring"])
        shoelace = lambda r: 0.5 * np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])
        assert shoelace(outer) > 0  # CCW
        assert shoelace(hole) < 0   # CW
        assert (outer[0] == outer[-1]).all()

    def test_unclosed_ring_closed_multipolygon_explodes(self):
        mp = {
            "type": "MultiPolygon",
            "coordinates": [[SQUARE[:-1]], [[[20.0, 20.0], [25.0, 20.0], [25.0, 25.0]]]],
        }
        rows = geojson_polygon_rows(_fc([_feat(3, mp)]))
        assert len(rows) == 2 and all(r["poly_id"] == 3 for r in rows)
        for r in rows:
            ring = np.asarray(r["ring"])
            assert (ring[0] == ring[-1]).all()

    def test_properties_and_id_property(self):
        doc = _fc(
            [_feat(0, {"type": "Polygon", "coordinates": [SQUARE]}, {"zone": "A", "code": "41"})]
        )
        rows = geojson_polygon_rows(doc, id_property="code")
        assert rows[0]["poly_id"] == 41
        assert rows[0]["properties"] == {"zone": "A", "code": "41"}

    @pytest.mark.parametrize(
        "doc, msg",
        [
            ("{not json", "not JSON"),
            (json.dumps({"type": "FeatureCollection"}), "features array"),
            (_fc([{"type": "Feature", "id": 0, "geometry": None}]), "geometry"),
            (
                _fc([_feat(0, {"type": "LineString", "coordinates": SQUARE})]),
                "out of scope",
            ),
            (
                _fc([_feat(0, {"type": "Polygon", "coordinates": [[[0, 0], [1, 1]]]})]),
                "3 distinct",
            ),
            (
                _fc([_feat(0, {"type": "Polygon",
                               "coordinates": [[[0, 0], [5, 5], [10, 10], [0, 0]]]})]),
                "zero area",
            ),
            (
                _fc([_feat("ab", {"type": "Polygon", "coordinates": [SQUARE]})]),
                "not an integer",
            ),
        ],
    )
    def test_malformed_fail_loud(self, doc, msg):
        with pytest.raises(GeoJsonFormatError, match=msg):
            geojson_polygon_rows(doc)


class TestSparkPaths:
    def _doc(self):
        tri = [[30.0, -5.0], [40.0, -5.0], [35.0, 5.0], [30.0, -5.0]]
        return _fc(
            [
                _feat(1, {"type": "Polygon", "coordinates": [SQUARE, HOLE]}, {"zone": "sq"}),
                _feat(2, {"type": "Polygon", "coordinates": [tri]}, {"zone": "tri"}),
            ]
        )

    def test_containment_matches_numpy_oracle(self, spark):
        polys = geojson_polygons(spark, self._doc())
        rng = np.random.default_rng(13)
        lon = rng.uniform(-10, 45, 400)
        lat = rng.uniform(-10, 15, 400)
        pts = spark.createDataFrame(
            [(int(i), float(lon[i]), float(lat[i])) for i in range(400)],
            "pt_id long, lon double, lat double",
        )
        got = {
            (r.pt_id, r.poly_id)
            for r in pip_join_df(pts, polys, id_col="pt_id").collect()
        }
        # numpy oracle: winding over ALL rings of a poly_id (hole cancels)
        ref = []
        rows = geojson_polygon_rows(self._doc())
        for pid in {r["poly_id"] for r in rows}:
            rings = [np.asarray(r["ring"]) for r in rows if r["poly_id"] == pid]
            ref.append((pid, rings))
        want = set()
        from erased_cells_spark.spatial.geom import points_in_ring

        for pid, rings in ref:
            w = np.zeros(400, dtype=bool)
            inside_outer = points_in_ring(lon, lat, rings[0])
            w |= inside_outer
            for hole_ring in rings[1:]:
                w &= ~points_in_ring(lon, lat, hole_ring[::-1])  # CCW for the test
            want |= {(i, pid) for i in np.nonzero(w)[0]}
        assert got == want
        # the hole actually excluded something, or this test is vacuous
        in_hole = [(i, 1) for i in range(400) if 3 < lon[i] < 7 and 3 < lat[i] < 7]
        assert in_hole and not (set(in_hole) & got)

    def test_ndjson_distributed_equals_driver(self, spark):
        doc = json.loads(self._doc())
        lines = [json.dumps(f) for f in doc["features"]] + ["", "\x1e"]
        ldf = spark.createDataFrame([(s,) for s in lines], "value string").repartition(4)
        dist = geojson_seq_polygons(ldf).collect()
        drv = geojson_polygons(spark, self._doc()).collect()
        key = lambda r: (r.poly_id, tuple(map(tuple, r.ring)))
        assert sorted(map(key, dist)) == sorted(map(key, drv))
        # partition-preserving: the parse itself introduces no shuffle (the
        # test's repartition(4) above is the only Exchange in THAT plan)
        flat = spark.createDataFrame([(s,) for s in lines], "value string")
        plan = geojson_seq_polygons(flat)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_ndjson_requires_data_borne_ids(self, spark):
        ldf = spark.createDataFrame(
            [(json.dumps({"type": "Feature", "geometry": {"type": "Polygon", "coordinates": [SQUARE]}, "properties": {}}),)],
            "value string",
        )
        with pytest.raises(Exception, match="not an integer"):
            geojson_seq_polygons(ldf).collect()
