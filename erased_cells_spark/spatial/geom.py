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
