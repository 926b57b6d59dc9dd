"""Tile layer: CellBuffer/MaskedCellBuffer as Spark rows.

One DataFrame row per tile:
``STRUCT<cell_type: STRING, cols: INT, rows: INT, data: BINARY, mask: BINARY>``
— ``data`` is little-endian packed primitives (the Arrow-side analog of the
reference's zero-copy Vec transmute), ``mask`` is 1 byte/cell or NULL ⇒
all-valid. All per-tile math runs as vectorized numpy inside Arrow-batched
pandas UDFs — never per-row Python over cells.
"""

from erased_cells_spark.tiles.schema import (
    TILE_FIELDS,
    TILE_SCHEMA,
    tile_row,
    tile_to_masked_buffer,
)
from erased_cells_spark.tiles.udfs import (
    tile_binop,
    tile_convert,
    tile_neg,
    tile_scalar_op,
    tile_stats,
)

__all__ = [
    "TILE_FIELDS",
    "TILE_SCHEMA",
    "tile_row",
    "tile_to_masked_buffer",
    "tile_stats",
    "tile_convert",
    "tile_binop",
    "tile_scalar_op",
    "tile_neg",
]
