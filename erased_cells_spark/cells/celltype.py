"""CellType: the 10-variant runtime type tag and its promotion lattice.

Reference parity: src/ctype.rs (enum order :11-20, Display/FromStr :23-43,
is_integral :55-68, is_signed :71-84, size_of :87-96, union :99-126,
can_fit_into :129-131, zero/one :134-155, min/max :158-179).
"""

from __future__ import annotations

import enum

import numpy as np

from erased_cells_spark.cells.errors import ParseError


class CellType(enum.IntEnum):
    """Runtime cell-type tag. Declaration order IS the total order used for
    cross-type buffer comparison (reference derives Ord from variant order)."""

    UInt8 = 0
    UInt16 = 1
    UInt32 = 2
    UInt64 = 3
    Int8 = 4
    Int16 = 5
    Int32 = 6
    Int64 = 7
    Float32 = 8
    Float64 = 9

    # ---- string round-trip (Display / FromStr) --------------------------
    def __str__(self) -> str:
        return self.name

    @classmethod
    def parse(cls, s: str) -> "CellType":
        try:
            return cls[s]
        except KeyError:
            raise ParseError(s, "CellType") from None

    # ---- numpy dtype bridge ---------------------------------------------
    @property
    def dtype(self) -> np.dtype:
        return _DTYPES[self]

    @classmethod
    def from_dtype(cls, dt) -> "CellType":
        dt = np.dtype(dt)
        try:
            return _FROM_DTYPE[dt]
        except KeyError:
            raise ParseError(str(dt), "CellType") from None

    # ---- predicates -------------------------------------------------------
    @property
    def is_integral(self) -> bool:
        return self <= CellType.Int64

    @property
    def is_signed(self) -> bool:
        # Floats count as signed (src/ctype.rs:71-84).
        return self >= CellType.Int8

    @property
    def size_of(self) -> int:
        return self.dtype.itemsize

    # ---- promotion lattice --------------------------------------------------
    def union(self, other: "CellType") -> "CellType":
        """Smallest type that can numerically contain both operands.

        Algorithm matches src/ctype.rs:99-126: compute the minimum byte width
        (doubling across integral/float and signed/unsigned boundaries), then
        look up (width, signed, integral); misses fall through to Float64.
        """
        a, b = self, other
        if a.is_integral and not b.is_integral:
            min_bytes = max(b.size_of, 2 * a.size_of)
        elif not a.is_integral and b.is_integral:
            min_bytes = max(a.size_of, 2 * b.size_of)
        elif a.is_signed and not b.is_signed:
            min_bytes = max(a.size_of, 2 * b.size_of)
        elif not a.is_signed and b.is_signed:
            min_bytes = max(b.size_of, 2 * a.size_of)
        else:
            min_bytes = max(a.size_of, b.size_of)
        signed = a.is_signed or b.is_signed
        integral = a.is_integral and b.is_integral
        return _UNION_LOOKUP.get((min_bytes, signed, integral), CellType.Float64)

    def can_fit_into(self, other: "CellType") -> bool:
        return self.union(other) == other

    # ---- typed constants ---------------------------------------------------
    def zero(self):
        from erased_cells_spark.cells.value import CellValue

        return CellValue(self.dtype.type(0))

    def one(self):
        from erased_cells_spark.cells.value import CellValue

        return CellValue(self.dtype.type(1))

    def min_value(self):
        from erased_cells_spark.cells.value import CellValue

        return CellValue(_MINMAX[self][0])

    def max_value(self):
        from erased_cells_spark.cells.value import CellValue

        return CellValue(_MINMAX[self][1])


_DTYPES = {
    CellType.UInt8: np.dtype(np.uint8),
    CellType.UInt16: np.dtype(np.uint16),
    CellType.UInt32: np.dtype(np.uint32),
    CellType.UInt64: np.dtype(np.uint64),
    CellType.Int8: np.dtype(np.int8),
    CellType.Int16: np.dtype(np.int16),
    CellType.Int32: np.dtype(np.int32),
    CellType.Int64: np.dtype(np.int64),
    CellType.Float32: np.dtype(np.float32),
    CellType.Float64: np.dtype(np.float64),
}
_FROM_DTYPE = {v: k for k, v in _DTYPES.items()}

_UNION_LOOKUP = {
    (1, False, True): CellType.UInt8,
    (1, True, True): CellType.Int8,
    (2, False, True): CellType.UInt16,
    (2, True, True): CellType.Int16,
    (4, False, True): CellType.UInt32,
    (4, True, True): CellType.Int32,
    (4, True, False): CellType.Float32,
    (4, False, False): CellType.Float32,
    (8, False, True): CellType.UInt64,
    (8, True, True): CellType.Int64,
}

# min_value/max_value: integer extremes from iinfo; float extremes are the
# *finite* extremes (f32::MIN = -3.4028235e38, not the denormal tiny).
_MINMAX = {}
for _ct, _dt in _DTYPES.items():
    if _ct.is_integral:
        _info = np.iinfo(_dt)
    else:
        _info = np.finfo(_dt)
    _MINMAX[_ct] = (_dt.type(_info.min), _dt.type(_info.max))
