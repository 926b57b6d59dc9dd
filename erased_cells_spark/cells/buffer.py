"""CellBuffer: a type-erased, densely-packed 1-D buffer of numeric cells.

numpy ndarray + CellType tag — the Arrow-friendly analog of the reference's
tagged-union-of-Vec (src/buffer.rs:52). All operators are whole-buffer
vectorized numpy (the reference's per-element interpreted loop, src/buffer.rs
:278-305, is a mechanical detail we deliberately improve on while matching
results exactly).

Reference parity: src/buffer.rs (ctors :58-97, get/put :125-148,
convert :150-167, min_max :169-173, binops :321-358 — each element op yields
Float64 so the result buffer is Float64; zips truncate to the shorter length —
neg :360-371, Ord :373-436 — type ordinal first, then lexicographic with
total_cmp for floats and a length tie-break).
"""

from __future__ import annotations

import numpy as np

from erased_cells_spark.cells.celltype import CellType
from erased_cells_spark.cells.errors import NarrowingError
from erased_cells_spark.cells.value import NEG_TABLE, CellValue


def total_order_keys(arr: np.ndarray) -> np.ndarray:
    """Vectorized IEEE-754 total-order keys for a float array (f32/f64).

    Same bit trick as value.total_order_key; integer arrays pass through.
    """
    if arr.dtype == np.float32:
        bits = arr.view(np.int32).copy()
        bits[bits < 0] ^= 0x7FFFFFFF
        return bits
    if arr.dtype == np.float64:
        bits = arr.view(np.int64).copy()
        bits[bits < 0] ^= 0x7FFFFFFFFFFFFFFF
        return bits
    return arr


class CellBuffer:
    """Type-erased cell buffer. ``data`` is a contiguous 1-D numpy array whose
    dtype is one of the 10 supported cell types."""

    __slots__ = ("data",)

    def __init__(self, data: np.ndarray):
        data = np.ascontiguousarray(data)
        if data.ndim != 1:
            data = data.reshape(-1)
        CellType.from_dtype(data.dtype)  # validate
        self.data = data

    # ---- constructors ----------------------------------------------------
    @classmethod
    def from_vec(cls, values, cell_type: CellType | None = None) -> "CellBuffer":
        if cell_type is not None:
            return cls(np.asarray(values, dtype=cell_type.dtype))
        arr = np.asarray(values)
        if arr.dtype == np.dtype(int) and not isinstance(values, np.ndarray):
            # Python-int literals: keep as int64 (Rust literal inference analog)
            arr = arr.astype(np.int64)
        return cls(arr)

    @classmethod
    def from_bytes(cls, raw: bytes, cell_type: CellType) -> "CellBuffer":
        """Zero-copy wrap of a little-endian packed byte payload — the
        engine analog of the reference's pointer transmute (src/buffer.rs
        :439-451). This is how tile BINARY columns become buffers."""
        return cls(np.frombuffer(raw, dtype=cell_type.dtype))

    def to_bytes(self) -> bytes:
        return self.data.tobytes()

    @classmethod
    def with_defaults(cls, n: int, ct: CellType) -> "CellBuffer":
        return cls(np.zeros(n, dtype=ct.dtype))

    @classmethod
    def fill(cls, n: int, value: CellValue) -> "CellBuffer":
        return cls(np.full(n, value.v, dtype=value.cell_type.dtype))

    @classmethod
    def fill_via(cls, n: int, ct: CellType, fn) -> "CellBuffer":
        return cls(np.array([fn(i) for i in range(n)], dtype=ct.dtype))

    @classmethod
    def from_cell_values(cls, values) -> "CellBuffer":
        """FromIterator<CellValue>: empty ⇒ UInt8 buffer; otherwise adopt the
        FIRST element's type and widen-extract every element (narrowing
        raises, matching the reference's unwrap panic; src/buffer.rs:229-250)."""
        values = list(values)
        if not values:
            return cls.with_defaults(0, CellType.UInt8)
        ct = values[0].cell_type
        return cls(np.array([v.get(ct) for v in values], dtype=ct.dtype))

    # ---- introspection ------------------------------------------------------
    def __len__(self) -> int:
        return len(self.data)

    @property
    def is_empty(self) -> bool:
        return len(self.data) == 0

    @property
    def cell_type(self) -> CellType:
        return CellType.from_dtype(self.data.dtype)

    def __repr__(self) -> str:
        # "UInt8CellBuffer([...])" with >10-element elision (src/lib.rs:166-194)
        vals = self.data
        if len(vals) > 10:
            shown = ", ".join(str(v) for v in vals[:10])
            body = f"{shown}, ... ({len(vals) - 10} more)"
        else:
            body = ", ".join(str(v) for v in vals)
        return f"{self.cell_type}CellBuffer([{body}])"

    # ---- element access ----------------------------------------------------
    def get(self, i: int) -> CellValue:
        return CellValue(self.data[i])

    def put(self, i: int, value: CellValue) -> None:
        """Converts the value to the buffer's type first; NarrowingError if
        the lattice forbids it (src/buffer.rs:136-148). Copy-on-write when
        the backing array is read-only (np.frombuffer views from
        from_bytes), matching the reference's mutable transmuted Vec."""
        if not self.data.flags.writeable:
            self.data = self.data.copy()
        self.data[i] = value.get(self.cell_type)

    def __iter__(self):
        return (CellValue(v) for v in self.data)

    # ---- conversion --------------------------------------------------------
    def convert(self, ct: CellType) -> "CellBuffer":
        """Widening-only whole-buffer cast; type-level check so Float64 →
        Float32 always errors even for representable values
        (src/buffer.rs:150-167)."""
        if not self.cell_type.can_fit_into(ct):
            raise NarrowingError(self.cell_type, ct)
        return CellBuffer(self.data.astype(ct.dtype))

    def to_vec(self, ct: CellType) -> np.ndarray:
        return self.convert(ct).data

    def extend(self, values) -> None:
        """Append with value-level checked conversion; out-of-range raises
        (the reference's to_<p>().unwrap() panic, src/buffer.rs:205-221)."""
        ct = self.cell_type
        extra = np.array([_checked_to(v, ct) for v in values], dtype=ct.dtype)
        self.data = np.concatenate([self.data, extra])

    # ---- reductions ----------------------------------------------------------
    def min_max(self) -> tuple[CellValue, CellValue]:
        """Total-order fold seeded with (max_value, min_value) — so an EMPTY
        buffer returns inverted extremes (src/buffer.rs:169-173). The seed
        participates in the fold, which also pins NaN behavior: a positive
        NaN sorts above +inf, so it can win max but never min."""
        ct = self.cell_type
        lo, hi = ct.max_value(), ct.min_value()
        if len(self.data) == 0:
            return lo, hi
        keys = total_order_keys(self.data)
        vmin = CellValue(self.data[np.argmin(keys)])
        vmax = CellValue(self.data[np.argmax(keys)])
        # Seeds take part in the fold (relevant only for NaN-only buffers).
        if not (vmin < lo):
            vmin = lo
        if not (vmax > hi):
            vmax = hi
        return vmin, vmax

    # ---- arithmetic: element ops yield Float64 ⇒ result buffer is Float64 --
    def _bin(self, other, op) -> "CellBuffer":
        if isinstance(other, CellBuffer):
            n = min(len(self.data), len(other.data))  # zips truncate
            lhs = self.data[:n].astype(np.float64)
            rhs = other.data[:n].astype(np.float64)
        elif isinstance(other, CellValue):
            lhs = self.data.astype(np.float64)
            rhs = np.float64(other.v)
        else:
            lhs = self.data.astype(np.float64)
            rhs = np.float64(other)
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            return CellBuffer(op(lhs, rhs))

    def __add__(self, other):
        return self._bin(other, np.add)

    def __sub__(self, other):
        return self._bin(other, np.subtract)

    def __mul__(self, other):
        return self._bin(other, np.multiply)

    def __truediv__(self, other):
        return self._bin(other, np.true_divide)

    def __neg__(self) -> "CellBuffer":
        target = NEG_TABLE[self.cell_type]
        with np.errstate(over="ignore"):
            return CellBuffer(-(self.data.astype(target.dtype)))

    # ---- ordering ------------------------------------------------------------
    def compare(self, other: "CellBuffer") -> int:
        """Type ordinal first; then per-element (total_cmp for floats);
        then length (src/buffer.rs:389-436)."""
        lct, rct = self.cell_type, other.cell_type
        if lct != rct:
            return -1 if lct < rct else 1
        n = min(len(self.data), len(other.data))
        lk = total_order_keys(self.data[:n])
        rk = total_order_keys(other.data[:n])
        neq = np.nonzero(lk != rk)[0]
        if len(neq):
            i = neq[0]
            return -1 if lk[i] < rk[i] else 1
        return (len(self.data) > len(other.data)) - (len(self.data) < len(other.data))

    def __eq__(self, other):
        if not isinstance(other, CellBuffer):
            return NotImplemented
        return self.compare(other) == 0

    def __lt__(self, other):
        return self.compare(other) < 0

    def __le__(self, other):
        return self.compare(other) <= 0

    def __gt__(self, other):
        return self.compare(other) > 0

    def __ge__(self, other):
        return self.compare(other) >= 0

    def __hash__(self):
        return hash((self.cell_type, self.data.tobytes()))


def _checked_to(v, ct: CellType):
    """Value-level checked conversion (num-traits ToPrimitive analog):
    floats truncate toward zero; out-of-range raises."""
    if isinstance(v, CellValue):
        v = v.v
    info = np.iinfo(ct.dtype) if ct.is_integral else np.finfo(ct.dtype)
    f = float(v)
    if ct.is_integral:
        t = np.trunc(f)
        if np.isnan(f) or t < info.min or t > info.max:
            raise NarrowingError(CellValue(v).cell_type, ct)
        return ct.dtype.type(t)
    return ct.dtype.type(f)
