"""NoData: NODATA sentinel specification.

Reference parity: src/masked/nodata.rs — three cases (None / Default /
Value); Default = type MIN for integers (0 for unsigned, e.g. -32768 for
Int16), NaN for floats (:27-38); sentinel test is NaN-safe because value
equality uses the total order (:42-68).
"""

from __future__ import annotations

import numpy as np

from erased_cells_spark.cells.celltype import CellType


class NoData:
    """Sentinel spec: mode ∈ {'none','default','value'} (+ typed value)."""

    __slots__ = ("mode", "_value", "cell_type")

    def __init__(self, mode: str, cell_type: CellType, value=None):
        assert mode in ("none", "default", "value")
        self.mode = mode
        self.cell_type = cell_type
        self._value = None if value is None else cell_type.dtype.type(value)

    @classmethod
    def none(cls, ct: CellType) -> "NoData":
        return cls("none", ct)

    @classmethod
    def default(cls, ct: CellType) -> "NoData":
        return cls("default", ct)

    @classmethod
    def value(cls, ct: CellType, v) -> "NoData":
        return cls("value", ct, v)

    @classmethod
    def from_float(cls, ct: CellType, nd: float | None) -> "NoData":
        """Checked band-nodata ingestion (reference GdalND→NoData conversion,
        src/gdal/mod.rs:47-70): None ⇒ NoData.none; a float cell type takes
        the value as-is (NaN included — `as`-cast semantics); an integral
        cell type range-checks then truncates toward zero (num-traits
        ToPrimitive), raising NoDataConversionError on NaN/±inf/out-of-range."""
        import math

        from erased_cells_spark.cells.errors import NoDataConversionError

        if nd is None:
            return cls.none(ct)
        nd = float(nd)
        if not ct.is_integral:
            return cls.value(ct, ct.dtype.type(nd))
        if math.isnan(nd) or math.isinf(nd):
            raise NoDataConversionError(nd, ct)
        t = math.trunc(nd)
        info = np.iinfo(ct.dtype)
        if t < info.min or t > info.max:
            raise NoDataConversionError(nd, ct)
        return cls.value(ct, t)

    def sentinel(self):
        """The sentinel as a numpy scalar, or None (NoData::value(), :23-40)."""
        if self.mode == "none":
            return None
        if self.mode == "value":
            return self._value
        dt = self.cell_type.dtype
        if self.cell_type.is_integral:
            return dt.type(np.iinfo(dt).min)
        return dt.type(np.nan)

    def is_nodata(self, arr: np.ndarray) -> np.ndarray:
        """Vectorized sentinel test; NaN-safe (NaN == NaN under total order)."""
        s = self.sentinel()
        if s is None:
            return np.zeros(len(arr), dtype=bool)
        if not self.cell_type.is_integral and np.isnan(float(s)):
            return np.isnan(arr)
        return arr == s
