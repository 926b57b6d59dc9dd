"""Geometry kernels: winding-number point-in-polygon + polygon fixtures.

Pure numpy, vectorized over points. One fixed convention everywhere (engine,
pytest oracle, fixtures): nonzero winding rule with the half-open edge
convention of the classic crossing test — a point exactly on a horizontal
lower edge counts as inside, on an upper edge as outside — so results are
deterministic and identical between the Spark path and the brute-force
oracle by construction.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(lon: np.ndarray, lat: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized winding-number test.

    lon/lat: (N,) point coords. ring: (M, 2) closed or open CCW vertex list
    (closure is implied). Returns (N,) bool.
    """
    px = np.asarray(lon, dtype=np.float64)
    py = np.asarray(lat, dtype=np.float64)
    v = np.asarray(ring, dtype=np.float64)
    if len(v) and (v[0] != v[-1]).any():
        v = np.vstack([v, v[:1]])
    x0, y0 = v[:-1, 0], v[:-1, 1]  # edge starts (M,)
    x1, y1 = v[1:, 0], v[1:, 1]  # edge ends

    # broadcast points (N,1) against edges (M,)
    pxc = px[:, None]
    pyc = py[:, None]
    # upward crossing: y0 <= p < y1 and point strictly left of edge
    cross = (x1 - x0) * (pyc - y0) - (pxc - x0) * (y1 - y0)
    up = (y0 <= pyc) & (y1 > pyc) & (cross > 0)
    down = (y0 > pyc) & (y1 <= pyc) & (cross < 0)
    wn = up.sum(axis=1).astype(np.int64) - down.sum(axis=1).astype(np.int64)
    return wn != 0


def polygon_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    v = np.asarray(ring, dtype=np.float64)
    return float(v[:, 0].min()), float(v[:, 1].min()), float(v[:, 0].max()), float(v[:, 1].max())


def regular_polygon(cx: float, cy: float, radius: float, k: int, jitter: float = 0.0, seed: int = 0) -> np.ndarray:
    """Closed CCW ring of a regular k-gon, optionally jittered ±jitter·radius
    per vertex (deterministic from seed). Fixture generator (FIXTURES.md F2)."""
    rng = np.random.default_rng(seed)
    ang = np.linspace(0.0, 2.0 * np.pi, k, endpoint=False)
    r = radius * (1.0 + jitter * (rng.random(k) * 2.0 - 1.0))
    xs = cx + r * np.cos(ang)
    ys = cy + r * np.sin(ang)
    ring = np.stack([xs, ys], axis=1)
    return np.vstack([ring, ring[:1]])


def make_polygon_fixtures(n: int = 64, seed: int = 42) -> list[dict]:
    """FIXTURES.md F2: regular k-gons (k ∈ 3..12) jittered ±20%, centers on a
    seeded grid, radii 0.5°–8°; includes a pole-adjacent polygon, two
    overlapping polygons, and a degenerate-thin sliver."""
    rng = np.random.default_rng(seed)
    polys = []
    grid = int(np.ceil(np.sqrt(n)))
    for pid in range(n):
        gx, gy = pid % grid, pid // grid
        cx = -160.0 + gx * (320.0 / grid) + rng.uniform(-3, 3)
        cy = -70.0 + gy * (140.0 / grid) + rng.uniform(-3, 3)
        k = int(rng.integers(3, 13))
        radius = float(rng.uniform(0.5, 8.0))
        if pid == n - 1:  # pole-adjacent
            cy = 84.0
            radius = 3.0
        if pid == n - 2:  # duplicate-overlap partner of pid n-3
            prev = polys[-1]
            cx, cy = prev["cx"] + 0.5, prev["cy"] + 0.5
            radius = prev["radius"]
        if pid == n - 4:  # degenerate-thin sliver
            ring = np.array(
                [[cx, cy], [cx + 6.0, cy + 0.01], [cx + 6.0, cy - 0.01], [cx, cy]]
            )
            polys.append(dict(poly_id=pid, name=f"zone{pid}", ring=ring, cx=cx, cy=cy, radius=6.0))
            continue
        ring = regular_polygon(cx, cy, radius, k, jitter=0.2, seed=seed * 1000 + pid)
        # clamp to valid lat range; antimeridian crossing excluded by domain
        ring[:, 1] = np.clip(ring[:, 1], -89.9, 89.9)
        ring[:, 0] = np.clip(ring[:, 0], -179.9, 179.9)
        polys.append(dict(poly_id=pid, name=f"zone{pid}", ring=ring, cx=cx, cy=cy, radius=radius))
    return polys


def simplify_ring(ring: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker ring simplification (the public algorithm, 1973):
    drop vertices whose perpendicular deviation from the simplified chain
    is <= tolerance. CLOSED-ring aware: the ring is split at its two
    mutually-farthest vertices (a closed curve has no natural endpoints, so
    anchoring the recursion on the diameter keeps both halves stable and
    orientation-preserving), each open chain simplifies independently, and
    the result is re-closed. Guarantees: first==last, >= 3 distinct
    vertices (falls back to the anchor triangle rather than collapsing),
    winding orientation preserved, every dropped vertex within `tolerance`
    of the kept chain (asserted by the property test).

    Iterative stack (no recursion-depth limit at coastline sizes); output
    keeps original vertex objects — no coordinates are invented, so PIP
    results on the simplified ring differ only within `tolerance` of the
    boundary. The named consumer: pip_join_df's edge join is
    |edges/polygon| per candidate; a 10^4-vertex coastline pre-simplified
    to ~10^2 makes the edge-join expansion tractable (operators/pip.py
    docstring)."""
    v = np.asarray(ring, dtype=np.float64)
    if len(v) and (v[0] == v[-1]).all():
        v = v[:-1]
    n = len(v)
    if n < 4:
        return np.vstack([v, v[:1]])
    if tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")

    # anchor pair: 2-pass farthest-point (O(n), deterministic) — the
    # standard diameter approximation; exactness is irrelevant here, the
    # anchors only need to be far apart so both half-chains are stable
    best_i = int(np.argmax(((v - v[0]) ** 2).sum(-1)))
    best_j = int(np.argmax(((v - v[best_i]) ** 2).sum(-1)))
    a, b = sorted((best_i, best_j))

    def dp_open(idx: np.ndarray) -> list[int]:
        """Indices kept by DP over the open chain v[idx]."""
        keep = np.zeros(len(idx), dtype=bool)
        keep[0] = keep[-1] = True
        stack = [(0, len(idx) - 1)]
        while stack:
            lo, hi = stack.pop()
            if hi - lo < 2:
                continue
            p0, p1 = v[idx[lo]], v[idx[hi]]
            seg = p1 - p0
            pts = v[idx[lo + 1 : hi]] - p0
            L2 = float(seg @ seg)
            if L2 == 0.0:
                d = np.sqrt((pts**2).sum(-1))
            else:
                t = np.clip((pts @ seg) / L2, 0.0, 1.0)
                d = np.sqrt(((pts - t[:, None] * seg) ** 2).sum(-1))
            k = int(np.argmax(d))
            if d[k] > tolerance:
                mid = lo + 1 + k
                keep[mid] = True
                stack.append((lo, mid))
                stack.append((mid, hi))
        return [int(idx[i]) for i in np.nonzero(keep)[0]]

    half1 = dp_open(np.arange(a, b + 1))
    half2 = dp_open(np.concatenate([np.arange(b, n), np.arange(0, a + 1)]))
    kept = half1 + half2[1:-1]  # drop duplicated anchors
    kept_sorted = sorted(set(kept), key=lambda i: (i < a, i))  # ring order from a
    out = v[np.array(kept_sorted)]
    if len(out) < 3:
        # degenerate tolerance: keep the anchor triangle (diameter + the
        # farthest remaining vertex) so the ring stays a polygon
        rest = [i for i in range(n) if i not in (a, b)]
        far = max(
            rest,
            key=lambda i: float(((v[i] - v[a]) ** 2).sum() + ((v[i] - v[b]) ** 2).sum()),
        )
        out = v[np.array(sorted({a, b, far}))]
    return np.vstack([out, out[:1]])


EARTH_R_KM = 6371.0088  # shared with operators/knn.py


def spherical_area_km2(ring: np.ndarray, radius_km: float = EARTH_R_KM) -> float:
    """GEODESIC polygon area (km^2) on the sphere — the honest-metric
    companion of the planar shoelace (operators/pip.polygon_stats_df):
    Chamberlain & Duquette's per-edge signed spherical excess,

        E_i = 2 atan2( tan(dlam/2) (tan(phi1/2) + tan(phi2/2)),
                       1 + tan(phi1/2) tan(phi2/2) )
        area = |sum E_i| * R^2

    exact for great-circle edges (the lune octant reproduces pi R^2 / 2 to
    the ulp — tests/test_geodesic_area.py), orientation-independent via the
    abs. dlam is wrapped to (-pi, pi], so antimeridian-crossing edges
    measure the short way; polygons LARGER than a hemisphere are outside
    the contract (the formula returns the complement)."""
    v = np.asarray(ring, np.float64)
    lon = np.radians(v[:, 0])
    lat = np.radians(v[:, 1])
    dl = lon[1:] - lon[:-1]
    dl = (dl + np.pi) % (2.0 * np.pi) - np.pi
    t1 = np.tan(lat[:-1] / 2.0)
    t2 = np.tan(lat[1:] / 2.0)
    e = 2.0 * np.arctan2(np.tan(dl / 2.0) * (t1 + t2), 1.0 + t1 * t2)
    return float(abs(e.sum()) * radius_km * radius_km)


def ring_self_intersections(ring: np.ndarray) -> int:
    """Number of PROPER crossings between non-adjacent edges of a closed
    ring — the geometry-validity audit of a vector ingest (a "simple"
    polygon has zero; a bowtie has one). Strict sign tests only: edges that
    merely TOUCH (shared vertex, collinear overlap, T-joints) do not count
    — the same strict predicate pip.py's cover refinement uses, so
    "invalid here" means "winding results are genuinely ill-defined".

    Vectorized O(E^2) over edge pairs (rings are polygon-sized, not
    corpus-sized; the corpus scales by polygon COUNT through
    polygon_validity_df)."""
    v = np.asarray(ring, np.float64)
    a0 = v[:-1]
    a1 = v[1:]
    n = len(a0)
    if n < 4:
        return 0
    i, j = np.triu_indices(n, k=2)
    # adjacent via ring closure: first edge vs last edge share a vertex
    keep = ~((i == 0) & (j == n - 1))
    i, j = i[keep], j[keep]

    def _cross(p0, p1, q):
        return (p1[:, 0] - p0[:, 0]) * (q[:, 1] - p0[:, 1]) - (
            p1[:, 1] - p0[:, 1]
        ) * (q[:, 0] - p0[:, 0])

    d1 = _cross(a0[i], a1[i], a0[j])
    d2 = _cross(a0[i], a1[i], a1[j])
    d3 = _cross(a0[j], a1[j], a0[i])
    d4 = _cross(a0[j], a1[j], a1[i])
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
    # strictness: a zero cross product is a touch, never a crossing
    proper &= (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    return int(proper.sum())
