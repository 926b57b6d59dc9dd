"""GeoJSON polygon source (RFC 7946, public spec) → the engine's polygon
DataFrame contract.

The PIP machinery (operators/pip.pip_join_df) wants (poly_id, ring) rows:
CLOSED rings, outer rings CCW and holes CW so the nonzero-winding sum
handles holes for free. Real-world GeoJSON routinely violates the spec's
right-hand rule, so this source NORMALIZES winding from the signed area
(shoelace) — outer rings forced CCW, holes forced CW — and closes rings
that merely forgot to repeat the first vertex (the one leniency GDAL's
reader also applies). Everything else malformed fails loud with a
GeoJsonFormatError naming the feature index and reason, matching the
repo's codec convention (png/jpeg/wav/avi/warc).

Two entry points for two scales:
- `geojson_polygons(spark, text)`: one FeatureCollection / Feature /
  bare (Multi)Polygon document, parsed driver-side — the broadcast-small
  zone-set path (country/admin boundaries: thousands of rings).
- `geojson_seq_polygons(lines_df)`: newline-delimited GeoJSON (GeoJSONSeq
  / ndjson, one Feature per line — the format big cadastres actually ship
  as, because it splits): a mapInPandas over the lines DataFrame, so a
  10^6-feature parcel file parses in parallel with no driver state; each
  partition emits its ring rows directly. poly_ids come from a feature's
  `id` member (or an `id_property`) and must be integers — at this scale
  a sequential driver-side counter would be the bottleneck AND
  nondeterministic under re-partitioning, so the id must live in the data.

Ring rows carry (poly_id, ring, is_hole, properties<map>) — `is_hole` is
informational (winding already encodes it); properties ride along for
downstream grouping.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

POLYGON_SCHEMA = StructType(
    [
        StructField("poly_id", LongType(), False),
        StructField("ring", ArrayType(ArrayType(DoubleType())), False),
        StructField("is_hole", BooleanType(), False),
        StructField("properties", MapType(StringType(), StringType()), True),
    ]
)


class GeoJsonFormatError(ValueError):
    """Malformed or out-of-scope GeoJSON (feature index + reason)."""


def _signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _normalize_ring(coords, want_ccw: bool, where: str) -> list[list[float]]:
    try:
        ring = np.asarray(coords, dtype=np.float64)
    except (TypeError, ValueError) as e:
        raise GeoJsonFormatError(f"{where}: ring coordinates not numeric: {e}") from None
    if ring.ndim != 2 or ring.shape[1] < 2:
        raise GeoJsonFormatError(
            f"{where}: ring must be an array of [lon, lat] positions, got shape {ring.shape}"
        )
    ring = ring[:, :2]  # drop altitude per RFC 7946 §3.1.1 leniency
    if not np.isfinite(ring).all():
        raise GeoJsonFormatError(f"{where}: non-finite coordinate")
    if (ring[0] != ring[-1]).any():
        ring = np.vstack([ring, ring[:1]])  # close an unclosed ring (GDAL leniency)
    if len(ring) < 4:
        raise GeoJsonFormatError(
            f"{where}: ring needs >= 3 distinct vertices, got {len(ring) - 1}"
        )
    area = _signed_area(ring)
    if area == 0.0:
        raise GeoJsonFormatError(f"{where}: degenerate ring (zero area)")
    if (area > 0) != want_ccw:
        ring = ring[::-1]
    return [[float(a), float(b)] for a, b in ring]


def _polygon_rings(geom: dict, where: str) -> list[tuple[list[list[float]], bool]]:
    """(ring, is_hole) list for one Polygon/MultiPolygon geometry, winding
    normalized (outer CCW, holes CW)."""
    gtype = geom.get("type")
    if gtype == "Polygon":
        polys = [geom.get("coordinates")]
    elif gtype == "MultiPolygon":
        polys = geom.get("coordinates")
    else:
        raise GeoJsonFormatError(
            f"{where}: geometry type {gtype!r} out of scope (Polygon/MultiPolygon only)"
        )
    if not isinstance(polys, list) or not polys:
        raise GeoJsonFormatError(f"{where}: missing/empty coordinates")
    out = []
    for pi, rings in enumerate(polys):
        if not isinstance(rings, list) or not rings:
            raise GeoJsonFormatError(f"{where}: polygon {pi} has no rings")
        for ri, coords in enumerate(rings):
            is_hole = ri > 0
            out.append(
                (_normalize_ring(coords, want_ccw=not is_hole, where=f"{where} poly {pi} ring {ri}"), is_hole)
            )
    return out


def _props_map(feature: dict) -> dict | None:
    props = feature.get("properties")
    if props is None:
        return None
    if not isinstance(props, dict):
        raise GeoJsonFormatError("feature properties must be an object")
    return {str(k): None if v is None else str(v) for k, v in props.items()}


def _feature_rows(feature: dict, poly_id: int, where: str) -> list[dict]:
    if feature.get("type") != "Feature":
        raise GeoJsonFormatError(f"{where}: expected a Feature, got {feature.get('type')!r}")
    geom = feature.get("geometry")
    if not isinstance(geom, dict):
        raise GeoJsonFormatError(f"{where}: null/missing geometry")
    props = _props_map(feature)
    return [
        {"poly_id": int(poly_id), "ring": ring, "is_hole": hole, "properties": props}
        for ring, hole in _polygon_rings(geom, where)
    ]


def _feature_id(feature: dict, idx, id_property: str | None, where: str) -> int:
    raw = (
        (feature.get("properties") or {}).get(id_property)
        if id_property
        else feature.get("id", idx)
    )
    try:
        return int(raw)
    except (TypeError, ValueError):
        raise GeoJsonFormatError(
            f"{where}: feature id {raw!r} is not an integer "
            f"({'property ' + id_property if id_property else 'id member'})"
        ) from None


def geojson_polygon_rows(text: str, id_property: str | None = None) -> list[dict]:
    """Driver-side parse of one GeoJSON document (FeatureCollection,
    Feature, or bare (Multi)Polygon) to polygon-DataFrame rows."""
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise GeoJsonFormatError(f"not JSON: {e}") from None
    if not isinstance(doc, dict):
        raise GeoJsonFormatError(f"top-level GeoJSON must be an object, got {type(doc).__name__}")
    dtype = doc.get("type")
    if dtype == "FeatureCollection":
        feats = doc.get("features")
        if not isinstance(feats, list):
            raise GeoJsonFormatError("FeatureCollection without a features array")
        rows = []
        for i, f in enumerate(feats):
            pid = _feature_id(f, i, id_property, f"feature {i}")
            rows.extend(_feature_rows(f, pid, f"feature {i}"))
        return rows
    if dtype == "Feature":
        return _feature_rows(doc, _feature_id(doc, 0, id_property, "feature 0"), "feature 0")
    if dtype in ("Polygon", "MultiPolygon"):
        return [
            {"poly_id": 0, "ring": ring, "is_hole": hole, "properties": None}
            for ring, hole in _polygon_rings(doc, "geometry 0")
        ]
    raise GeoJsonFormatError(f"unsupported top-level type {dtype!r}")


def geojson_polygons(
    spark: SparkSession, text: str, id_property: str | None = None
) -> DataFrame:
    """One document → polygon DataFrame (the broadcast-small zone path)."""
    return spark.createDataFrame(geojson_polygon_rows(text, id_property), POLYGON_SCHEMA)


def geojson_seq_polygons(
    lines: DataFrame, line_col: str = "value", id_property: str | None = None
) -> DataFrame:
    """Newline-delimited GeoJSON (one Feature per line) → polygon DataFrame,
    parsed in parallel: a partition-preserving mapInPandas over the lines —
    no driver state, no shuffle; ids must come from the features (see module
    docstring). Blank lines and RFC 8142 record separators are skipped."""

    def run(batches):
        for pdf in batches:
            rows = []
            for raw in pdf[line_col]:
                if raw is None:
                    continue
                line = raw.strip().lstrip("\x1e")
                if not line:
                    continue
                try:
                    feat = json.loads(line)
                except json.JSONDecodeError as e:
                    raise GeoJsonFormatError(f"not JSON: {line[:60]!r}: {e}") from None
                pid = _feature_id(feat, None, id_property, f"line {line[:40]!r}")
                rows.extend(_feature_rows(feat, pid, f"feature id {pid}"))
            yield pd.DataFrame(
                rows, columns=["poly_id", "ring", "is_hole", "properties"]
            )

    return lines.mapInPandas(run, POLYGON_SCHEMA)
