"""Mask: per-cell validity vector. True = valid data, False = NODATA.

Reference parity: src/masked/mask.rs (ctors :16-33, counts :72-80,
all :67-69, Not/BitAnd/BitOr :103-164 — AND is the NODATA propagation rule).
"""

from __future__ import annotations

import numpy as np


class Mask:
    __slots__ = ("data",)

    def __init__(self, data):
        self.data = np.ascontiguousarray(np.asarray(data, dtype=bool).reshape(-1))

    @classmethod
    def fill(cls, n: int, value: bool) -> "Mask":
        return cls(np.full(n, value, dtype=bool))

    @classmethod
    def fill_via(cls, n: int, fn) -> "Mask":
        return cls(np.array([bool(fn(i)) for i in range(n)], dtype=bool))

    @classmethod
    def from_bytes(cls, raw: bytes) -> "Mask":
        return cls(np.frombuffer(raw, dtype=np.uint8).astype(bool))

    def to_bytes(self) -> bytes:
        # 1 byte per cell, matching the reference's Vec<bool> layout.
        return self.data.astype(np.uint8).tobytes()

    def __len__(self) -> int:
        return len(self.data)

    @property
    def is_empty(self) -> bool:
        return len(self.data) == 0

    def get(self, i: int) -> bool:
        return bool(self.data[i])

    def put(self, i: int, v: bool) -> None:
        self.data[i] = v

    def __getitem__(self, i):
        return bool(self.data[i])

    def __setitem__(self, i, v):
        self.data[i] = v

    def all(self, value: bool) -> bool:
        return bool(np.all(self.data == value))

    def counts(self) -> tuple[int, int]:
        """(data, nodata) counts (src/masked/mask.rs:72-80)."""
        d = int(np.count_nonzero(self.data))
        return d, len(self.data) - d

    def __invert__(self) -> "Mask":
        return Mask(~self.data)

    def __and__(self, other: "Mask") -> "Mask":
        return Mask(self.data & other.data)

    def __or__(self, other: "Mask") -> "Mask":
        return Mask(self.data | other.data)

    def __eq__(self, other):
        if not isinstance(other, Mask):
            return NotImplemented
        return len(self.data) == len(other.data) and bool(
            np.all(self.data == other.data)
        )

    def __hash__(self):
        return hash(self.data.tobytes())

    def __repr__(self) -> str:
        return f"Mask({self.data.tolist()})"

    def __iter__(self):
        return (bool(v) for v in self.data)
