"""HyperLogLog — mergeable distinct-count sketch (Flajolet et al. 2007,
with the HLL++ small-range bias alternative of linear counting).

Built from scratch as the north rule's mergeable-UDAF shape (the same shape
as the bloom bitsets in ``bloom.py``): a dense ``m = 2**p`` uint8 register
array whose merge is ELEMENTWISE MAX — associative, commutative and
idempotent, so per-partition partials from checkpointed/retried stages
recombine identically in any order.

Published error bound: relative standard error 1.04 / sqrt(m).

Spark pipeline (``hll_partials`` -> ``hll_merged`` / ``approx_distinct``):
one ``mapInArrow`` pass computes a partial sketch per (task, group) —
map-side combine, no data shuffle — then a manifest-sized groupBy merges
the KB-scale register arrays.  Hashing + register updates are pure numpy
over the whole Arrow batch (no per-row Python).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

_U64 = np.uint64

# SWAR popcount constants
_M1 = _U64(0x5555555555555555)
_M2 = _U64(0x3333333333333333)
_M4 = _U64(0x0F0F0F0F0F0F0F0F)
_H01 = _U64(0x0101010101010101)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit population count (SWAR — exact, no float tricks)."""
    x = x - ((x >> _U64(1)) & _M1)
    x = (x & _M2) + ((x >> _U64(2)) & _M2)
    x = (x + (x >> _U64(4))) & _M4
    return ((x * _H01) >> _U64(56)).astype(np.uint8)


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros via MSB-fill + popcount."""
    for s in (1, 2, 4, 8, 16, 32):
        x = x | (x >> _U64(s))
    return (np.uint8(64) - _popcount64(x)).astype(np.uint8)


def hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes of an array-like of values (strings or
    numbers), vectorized via pandas' siphash-based hash_array."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False).astype(_U64)


_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


class HLL:
    """Dense HyperLogLog with precision ``p`` (m = 2**p uint8 registers)."""

    __slots__ = ("p", "m", "registers")

    MAGIC = b"HLL1"

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        if not (4 <= p <= 18):
            raise ValueError(f"p must be in [4, 18], got {p}")
        self.p = p
        self.m = 1 << p
        self.registers = (
            registers if registers is not None else np.zeros(self.m, dtype=np.uint8)
        )

    # -- update ------------------------------------------------------------
    def add_hashes(self, h: np.ndarray) -> None:
        p = _U64(self.p)
        idx = (h >> (_U64(64) - p)).astype(np.int64)
        rest = (h << p) & _U64(0xFFFFFFFFFFFFFFFF)
        rho = np.minimum(_clz64(rest), np.uint8(64 - self.p)) + np.uint8(1)
        np.maximum.at(self.registers, idx, rho)

    def add_values(self, values) -> None:
        if len(values):
            self.add_hashes(hash64(values))

    # -- merge (associative + commutative + idempotent) ---------------------
    def merge(self, other: "HLL") -> "HLL":
        if other.p != self.p:
            raise ValueError(f"precision mismatch: {self.p} vs {other.p}")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    # -- estimate ------------------------------------------------------------
    def estimate(self) -> float:
        m = self.m
        regs = self.registers.astype(np.float64)
        raw = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.registers == 0))
        if raw <= 2.5 * m and zeros > 0:
            return m * float(np.log(m / zeros))  # linear counting
        return float(raw)

    @property
    def rse(self) -> float:
        """Published relative standard error 1.04/sqrt(m)."""
        return 1.04 / (self.m**0.5)

    # -- serialization (checkpointable partials) ----------------------------
    def to_bytes(self) -> bytes:
        return self.MAGIC + struct.pack("<B", self.p) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "HLL":
        if raw[:4] != cls.MAGIC:
            raise ValueError("not an HLL1 blob")
        p = struct.unpack("<B", raw[4:5])[0]
        regs = np.frombuffer(raw[5 : 5 + (1 << p)], dtype=np.uint8).copy()
        return cls(p, regs)


# shared fold (sketches/pipeline.py) — one implementation for all four
# sketch modules
from .pipeline import fold_serialized

merge_serialized = fold_serialized(HLL)


# ---------------------------------------------------------------------------
# Spark convenience (two-stage pipeline from .pipeline)
# ---------------------------------------------------------------------------


def hll_partials(df, value_col: str, key_cols=(), p: int = 12):
    """Per-(task, group) serialized HLL partials — checkpointable."""
    from .pipeline import sketch_partials

    return sketch_partials(df, value_col, key_cols, lambda: HLL(p))


def hll_merged(partials, key_cols=()):
    from .pipeline import sketch_merged

    return sketch_merged(partials, key_cols, merge_serialized)


def approx_distinct(df, value_col: str, key_cols=(), p: int = 12):
    """(keys..., estimate double, rse double) per group."""
    from pyspark.sql import functions as F

    from .pipeline import estimate_col

    merged = hll_merged(hll_partials(df, value_col, key_cols, p), key_cols)
    return merged.select(
        *key_cols,
        estimate_col(F.col("sketch"), lambda b: HLL.from_bytes(b).estimate()).alias(
            "estimate"
        ),
        F.lit(1.04 / ((1 << p) ** 0.5)).alias("rse"),
    )
