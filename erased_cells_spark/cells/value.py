"""CellValue: a typed numeric scalar (numpy scalar + CellType tag).

Reference parity: src/value.rs (ctor :24-33, get :51-67, convert :74-98,
unify :103-107, binops :199-222 — unify then compute in f64, result is ALWAYS
Float64 — widening neg :224-240, total-order compare :242-273).
"""

from __future__ import annotations

import functools

import numpy as np

from erased_cells_spark.cells.celltype import CellType
from erased_cells_spark.cells.errors import NarrowingError


def total_order_key(v) -> int:
    """IEEE-754 total-order sort key for a float scalar (f32 or f64).

    Matches Rust's f64::total_cmp bit trick: reinterpret as signed int, then
    flip the magnitude bits of negative values. NaN sorts above +inf (positive
    NaN bit patterns) — which makes NaN == NaN, the property the NODATA
    sentinel relies on (src/value.rs:260-261, src/masked/nodata.rs:93-95).
    """
    dt = np.dtype(type(v)) if not isinstance(v, np.generic) else v.dtype
    if dt == np.float32:
        bits = int(np.float32(v).view(np.int32))
        if bits < 0:
            bits ^= 0x7FFFFFFF
    else:
        bits = int(np.float64(v).view(np.int64))
        if bits < 0:
            bits ^= 0x7FFFFFFFFFFFFFFF
    return bits


@functools.total_ordering
class CellValue:
    """Tagged numeric scalar. Arithmetic unifies operand types through the
    CellType lattice, computes in float64, and always yields Float64."""

    __slots__ = ("v",)

    def __init__(self, v):
        if isinstance(v, CellValue):
            v = v.v
        if isinstance(v, bool) or not isinstance(v, np.generic):
            if isinstance(v, int):
                # Plain Python ints land on the narrowest fitting reference
                # behavior is explicit typing; here callers should pass numpy
                # scalars. Default plain ints to int64, floats to float64 —
                # mirroring Rust literal inference in the examples.
                v = np.int64(v)
            elif isinstance(v, float):
                v = np.float64(v)
            else:
                raise TypeError(f"unsupported CellValue payload: {type(v)}")
        CellType.from_dtype(v.dtype)  # validates the dtype is one of the 10
        self.v = v

    # ---- introspection ---------------------------------------------------
    @property
    def cell_type(self) -> CellType:
        return CellType.from_dtype(self.v.dtype)

    def __repr__(self) -> str:
        return f"{self.cell_type}({self.v})"

    # ---- conversion --------------------------------------------------------
    def convert(self, ct: CellType) -> "CellValue":
        """Widening-only conversion: rejected by the lattice, not by value —
        e.g. Float64(1.0) → Float32 errors even though representable
        (src/value.rs:74-98)."""
        if not self.cell_type.can_fit_into(ct):
            raise NarrowingError(self.cell_type, ct)
        return CellValue(ct.dtype.type(self.v))

    def get(self, ct: CellType):
        """Typed extraction with widening check; returns the numpy scalar."""
        return self.convert(ct).v

    def unify(self, other: "CellValue"):
        u = self.cell_type.union(other.cell_type)
        return self.convert(u), other.convert(u)

    def to_f64(self) -> float:
        return float(self.v)

    # ---- arithmetic: unify → f64 math → Float64 ---------------------------
    def _bin(self, other, op):
        if not isinstance(other, CellValue):
            other = CellValue(other)
        lhs, rhs = self.unify(other)
        return CellValue(np.float64(op(np.float64(lhs.v), np.float64(rhs.v))))

    def __add__(self, other):
        return self._bin(other, lambda a, b: a + b)

    def __sub__(self, other):
        return self._bin(other, lambda a, b: a - b)

    def __mul__(self, other):
        return self._bin(other, lambda a, b: a * b)

    def __truediv__(self, other):
        with np.errstate(divide="ignore", invalid="ignore"):
            return self._bin(other, lambda a, b: a / b)

    def __neg__(self) -> "CellValue":
        """Widening negation (src/value.rs:224-240): u8→i16, u16→i32,
        u32→f64, u64→f64, signed/float → same type."""
        ct = self.cell_type
        target = NEG_TABLE[ct]
        return CellValue(target.dtype.type(-target.dtype.type(self.v)))

    # ---- total-order comparison (unify first; floats total_cmp) -----------
    def _cmp_key(self):
        return self.v

    def _compare(self, other) -> int:
        if not isinstance(other, CellValue):
            other = CellValue(other)
        lhs, rhs = self.unify(other)
        if lhs.cell_type.is_integral:
            a, b = int(lhs.v), int(rhs.v)
        else:
            a, b = total_order_key(lhs.v), total_order_key(rhs.v)
        return (a > b) - (a < b)

    def __eq__(self, other):
        if not isinstance(other, (CellValue, int, float, np.generic)):
            return NotImplemented
        return self._compare(other) == 0

    def __lt__(self, other):
        return self._compare(other) < 0

    def __hash__(self):
        # Hash through the unified f64 bit pattern so cross-type equal values
        # collide; NaN hashes consistently via its bits.
        return hash(np.float64(self.v).tobytes())


# Widening negation targets (src/value.rs:224-240).
NEG_TABLE = {
    CellType.UInt8: CellType.Int16,
    CellType.UInt16: CellType.Int32,
    CellType.UInt32: CellType.Float64,
    CellType.UInt64: CellType.Float64,
    CellType.Int8: CellType.Int8,
    CellType.Int16: CellType.Int16,
    CellType.Int32: CellType.Int32,
    CellType.Int64: CellType.Int64,
    CellType.Float32: CellType.Float32,
    CellType.Float64: CellType.Float64,
}
