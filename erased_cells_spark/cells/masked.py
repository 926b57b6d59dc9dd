"""MaskedCellBuffer: CellBuffer ⊗ Mask with NODATA semantics.

Reference parity: src/masked/masked_buffer.rs (length-asserted pair :48-55,
sentinel ingest :62-71, sentinel egress :137-152, mask-aware min_max
:208-217, binops :323-370 — values computed on RAW buffers regardless of
mask, garbage allowed in invalid lanes; new mask = lmask & rmask; scalar ops
and neg preserve the mask).
"""

from __future__ import annotations

import numpy as np

from erased_cells_spark.cells.buffer import CellBuffer, total_order_keys
from erased_cells_spark.cells.celltype import CellType
from erased_cells_spark.cells.mask import Mask
from erased_cells_spark.cells.nodata import NoData
from erased_cells_spark.cells.value import CellValue


class MaskedCellBuffer:
    __slots__ = ("buffer", "mask")

    def __init__(self, buffer: CellBuffer, mask: Mask):
        if len(buffer) != len(mask):
            raise ValueError(
                f"buffer and mask must have equal length: {len(buffer)} != {len(mask)}"
            )
        self.buffer = buffer
        self.mask = mask

    # ---- constructors ----------------------------------------------------
    @classmethod
    def from_buffer(cls, buffer: CellBuffer) -> "MaskedCellBuffer":
        return cls(buffer, Mask.fill(len(buffer), True))

    @classmethod
    def from_vec_with_nodata(cls, values, nodata: NoData) -> "MaskedCellBuffer":
        """mask[i] = NOT (v[i] is the sentinel); NaN sentinels work because
        the test is NaN-safe (src/masked/masked_buffer.rs:62-71)."""
        arr = np.asarray(values, dtype=nodata.cell_type.dtype)
        mask = ~nodata.is_nodata(arr)
        return cls(CellBuffer(arr), Mask(mask))

    @classmethod
    def fill_with_mask_via(cls, n: int, ct: CellType, fn) -> "MaskedCellBuffer":
        pairs = [fn(i) for i in range(n)]
        data = np.array([p[0] for p in pairs], dtype=ct.dtype)
        mask = np.array([bool(p[1]) for p in pairs], dtype=bool)
        return cls(CellBuffer(data), Mask(mask))

    @classmethod
    def with_defaults(cls, n: int, ct: CellType) -> "MaskedCellBuffer":
        return cls.from_buffer(CellBuffer.with_defaults(n, ct))

    @classmethod
    def fill(cls, n: int, value: CellValue) -> "MaskedCellBuffer":
        return cls.from_buffer(CellBuffer.fill(n, value))

    @classmethod
    def from_pairs(cls, pairs, ct: CellType) -> "MaskedCellBuffer":
        """FromIterator<(value, bool)>."""
        pairs = list(pairs)
        data = np.array([p[0] for p in pairs], dtype=ct.dtype)
        mask = np.array([bool(p[1]) for p in pairs], dtype=bool)
        return cls(CellBuffer(data), Mask(mask))

    # ---- introspection / access -------------------------------------------
    def __len__(self) -> int:
        return len(self.buffer)

    @property
    def cell_type(self) -> CellType:
        return self.buffer.cell_type

    def get(self, i: int) -> CellValue:
        return self.buffer.get(i)

    def put(self, i: int, v: CellValue) -> None:
        self.buffer.put(i, v)

    def get_masked(self, i: int) -> CellValue | None:
        """None when the lane is NODATA (src/masked/masked_buffer.rs:100-106)."""
        return self.buffer.get(i) if self.mask.get(i) else None

    def get_with_mask(self, i: int) -> tuple[CellValue, bool]:
        return self.buffer.get(i), self.mask.get(i)

    def put_with_mask(self, i: int, v: CellValue, valid: bool) -> None:
        self.buffer.put(i, v)
        self.mask.put(i, valid)

    def counts(self) -> tuple[int, int]:
        return self.mask.counts()

    def extend(self, pairs) -> None:
        pairs = list(pairs)
        self.buffer.extend([p[0] for p in pairs])
        self.mask = Mask(
            np.concatenate([self.mask.data, np.array([bool(p[1]) for p in pairs], bool)])
        )

    def __iter__(self):
        return zip(iter(self.buffer), iter(self.mask))

    # ---- conversion / egress --------------------------------------------------
    def convert(self, ct: CellType) -> "MaskedCellBuffer":
        return MaskedCellBuffer(self.buffer.convert(ct), Mask(self.mask.data.copy()))

    def to_vec(self, ct: CellType) -> np.ndarray:
        # Ignores the mask (src/masked/masked_buffer.rs:219-224).
        return self.buffer.to_vec(ct)

    def to_vec_with_nodata(self, ct: CellType, nodata: NoData) -> np.ndarray:
        """Convert, then overwrite masked lanes with the sentinel;
        NoData::None ⇒ raw values (src/masked/masked_buffer.rs:137-152)."""
        out = self.buffer.convert(ct).data.copy()
        s = nodata.sentinel()
        if s is not None:
            out[~self.mask.data] = s
        return out

    # ---- reductions -------------------------------------------------------------
    def min_max(self) -> tuple[CellValue, CellValue]:
        """Mask-aware total-order fold; all-masked/empty ⇒ inverted extremes
        (src/masked/masked_buffer.rs:208-217)."""
        ct = self.cell_type
        lo, hi = ct.max_value(), ct.min_value()
        valid = self.buffer.data[self.mask.data]
        if len(valid) == 0:
            return lo, hi
        keys = total_order_keys(valid)
        vmin = CellValue(valid[np.argmin(keys)])
        vmax = CellValue(valid[np.argmax(keys)])
        if not (vmin < lo):
            vmin = lo
        if not (vmax > hi):
            vmax = hi
        return vmin, vmax

    # ---- arithmetic ---------------------------------------------------------
    def _bin(self, other, op) -> "MaskedCellBuffer":
        if isinstance(other, MaskedCellBuffer):
            buf = op(self.buffer, other.buffer)
            n = len(buf)
            mask = Mask(self.mask.data[:n] & other.mask.data[:n])
        else:  # scalar: mask unchanged (src/masked/masked_buffer.rs:353-364)
            buf = op(self.buffer, other)
            mask = Mask(self.mask.data.copy())
        return MaskedCellBuffer(buf, mask)

    def __add__(self, other):
        return self._bin(other, lambda a, b: a + b)

    def __sub__(self, other):
        return self._bin(other, lambda a, b: a - b)

    def __mul__(self, other):
        return self._bin(other, lambda a, b: a * b)

    def __truediv__(self, other):
        return self._bin(other, lambda a, b: a / b)

    def __neg__(self) -> "MaskedCellBuffer":
        return MaskedCellBuffer(-self.buffer, Mask(self.mask.data.copy()))

    # ---- equality: buffer AND mask (derived field-wise, :39) ------------------
    def __eq__(self, other):
        if not isinstance(other, MaskedCellBuffer):
            return NotImplemented
        return self.buffer == other.buffer and self.mask == other.mask

    def __hash__(self):
        return hash((self.buffer, self.mask))

    def __repr__(self) -> str:
        return f"Masked{self.buffer!r} ∘ {self.mask!r}"
