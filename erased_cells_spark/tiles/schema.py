"""Tile struct schema and numpy ↔ row bridging."""

from __future__ import annotations

import numpy as np
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from erased_cells_spark.cells import CellBuffer, CellType, Mask, MaskedCellBuffer

TILE_FIELDS = [
    StructField("cell_type", StringType(), False),
    StructField("cols", IntegerType(), False),
    StructField("rows", IntegerType(), False),
    StructField("data", BinaryType(), False),
    StructField("mask", BinaryType(), True),  # NULL ⇒ all-valid
]
TILE_SCHEMA = StructType(TILE_FIELDS)


def tile_row(arr: np.ndarray, mask: np.ndarray | None = None) -> dict:
    """Pack a 2-D (rows, cols) numpy array (+ optional bool mask) into a tile
    row dict. Little-endian layout, row-major."""
    arr = np.ascontiguousarray(arr)
    ct = CellType.from_dtype(arr.dtype)
    rows, cols = (arr.shape if arr.ndim == 2 else (1, arr.shape[0]))
    out = {
        "cell_type": str(ct),
        "cols": int(cols),
        "rows": int(rows),
        "data": arr.astype(arr.dtype.newbyteorder("<"), copy=False).tobytes(),
        "mask": None,
    }
    if mask is not None:
        out["mask"] = np.ascontiguousarray(mask, dtype=np.uint8).tobytes()
    return out


def tile_to_masked_buffer(
    cell_type: str, data: bytes, mask: bytes | None
) -> MaskedCellBuffer:
    """Unpack a tile row into a MaskedCellBuffer (NULL mask ⇒ all-valid,
    matching the reference's From<CellBuffer> all-true default)."""
    ct = CellType.parse(cell_type)
    buf = CellBuffer.from_bytes(data, ct)
    m = Mask.from_bytes(mask) if mask is not None else Mask.fill(len(buf), True)
    return MaskedCellBuffer(buf, m)
