"""Spatial layer: engine-own hierarchical cell index + geometry kernels.

No h3/s2/shapely in the environment (and none needed): cells are a
Morton-interleaved quad-tree over equirectangular lon/lat, packed into a
single int64 with 5 resolution bits — fully vectorizable with numpy, and
plain LongType shuffle keys on the Spark side.
"""

from erased_cells_spark.spatial.cellid import (
    MAX_RES,
    cell_bounds,
    cell_res,
    cell_xy,
    children,
    cover_bbox,
    encode_cell,
    neighbors,
    parent,
    ring,
)
from erased_cells_spark.spatial.geom import (
    points_in_ring,
    polygon_bbox,
    regular_polygon,
)

__all__ = [
    "MAX_RES",
    "encode_cell",
    "cell_res",
    "cell_xy",
    "cell_bounds",
    "parent",
    "children",
    "neighbors",
    "ring",
    "cover_bbox",
    "points_in_ring",
    "polygon_bbox",
    "regular_polygon",
]
