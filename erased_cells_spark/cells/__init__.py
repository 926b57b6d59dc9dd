"""Pure-numpy cell kernel with reference-parity semantics.

Re-creates (from observed behavior, not code) the type-erased buffer
semantics of the erased-cells crate: the 10-type promotion lattice,
Float64-result arithmetic, widening negation, NODATA sentinel masking,
total-order float comparison, and mask-aware reductions.
"""

from erased_cells_spark.cells.errors import (
    CellsError,
    ExpectedError,
    NarrowingError,
    NoDataConversionError,
    ParseError,
    UnsupportedCellTypeError,
)
from erased_cells_spark.cells.celltype import CellType
from erased_cells_spark.cells.value import CellValue
from erased_cells_spark.cells.buffer import CellBuffer
from erased_cells_spark.cells.mask import Mask
from erased_cells_spark.cells.nodata import NoData
from erased_cells_spark.cells.masked import MaskedCellBuffer

__all__ = [
    "CellType",
    "CellValue",
    "CellBuffer",
    "Mask",
    "NoData",
    "MaskedCellBuffer",
    "CellsError",
    "NarrowingError",
    "ParseError",
    "ExpectedError",
    "UnsupportedCellTypeError",
    "NoDataConversionError",
]
