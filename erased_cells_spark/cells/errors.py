"""Typed errors mirroring the reference error surface (src/error.rs:12-27)."""


class CellsError(Exception):
    """Base class for all cell-kernel errors."""


class NarrowingError(CellsError):
    """Lossy conversion rejected (reference: Error::NarrowingError{src,dst},
    src/error.rs:14-16). Carries the source and destination cell types."""

    def __init__(self, src, dst):
        self.src = src
        self.dst = dst
        super().__init__(f"unable to convert from {src} to {dst}")


class UnsupportedCellTypeError(CellsError):
    """Unknown/unsupported cell type (src/error.rs:18)."""


class ParseError(CellsError):
    """String → CellType parse failure (src/error.rs:22-24)."""

    def __init__(self, value, target="CellType"):
        self.value = value
        self.target = target
        super().__init__(f"unable to parse {value!r} as {target}")


class ExpectedError(CellsError):
    """Generic expectation failure (src/error.rs:20)."""


class NoDataConversionError(CellsError):
    """NODATA sentinel not representable in target type (src/error.rs:26,
    raised from the GdalND→NoData conversion, src/gdal/mod.rs:47-70).
    Carries the offending f64 and the destination cell type."""

    def __init__(self, value=None, dst=None):
        self.value = value
        self.dst = dst
        super().__init__(f"unable to convert NODATA value {value!r} to {dst}")
