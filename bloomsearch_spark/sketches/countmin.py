"""Count-Min sketch — mergeable frequency sketch (Cormode & Muthukrishnan
2005).

``d`` hash rows x ``w`` counters of int64; update = +1 at one cell per row,
point query = min over the d cells.  Published guarantee with
``w = ceil(e / eps)`` and ``d = ceil(ln(1 / delta))``:

    true <= estimate <= true + eps * N      with probability >= 1 - delta

(N = total items inserted; the lower bound always holds).

Merge = elementwise ADD — associative and commutative but NOT idempotent:
the same partial must be combined exactly once.  That is safe under
Spark's recompute model (a retried task REPLACES its output, nothing
re-adds), and under the checkpoint-resume contract of
``pipeline.sketch_partials`` (each partial blob enters one merge); it is
called out here because max-merge sketches (bloom, HLL) tolerate double
merging and this one does not.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .hll import _U64, hash64

_SEED_MIX = _U64(0x9E3779B97F4A7C15)


def _row_hashes(h: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, n) column indices: splitmix-style remix of one base hash per row
    — avoids d full hash passes over the raw values."""
    out = np.empty((d, len(h)), dtype=np.int64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        for r in range(d):
            x = h + _U64(((r + 1) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1))
            x ^= x >> _U64(30)
            x = x * _U64(0xBF58476D1CE4E5B9)
            x ^= x >> _U64(27)
            x = x * _U64(0x94D049BB133111EB)
            x ^= x >> _U64(31)
            out[r] = (x % _U64(w)).astype(np.int64)
    return out


class CountMin:
    """Count-Min with eps/delta sizing (w = ceil(e/eps), d = ceil(ln 1/δ))."""

    __slots__ = ("d", "w", "table", "n_items")

    MAGIC = b"CMS1"

    def __init__(
        self,
        eps: float = 0.001,
        delta: float = 0.01,
        d: int | None = None,
        w: int | None = None,
        table: np.ndarray | None = None,
        n_items: int = 0,
    ):
        self.w = w if w is not None else int(math.ceil(math.e / eps))
        self.d = d if d is not None else int(math.ceil(math.log(1.0 / delta)))
        self.table = (
            table if table is not None else np.zeros((self.d, self.w), dtype=np.int64)
        )
        self.n_items = n_items

    @property
    def eps(self) -> float:
        return math.e / self.w

    @property
    def delta(self) -> float:
        return math.exp(-self.d)

    def add_values(self, values, counts: np.ndarray | None = None) -> None:
        if not len(values):
            return
        idx = _row_hashes(hash64(values), self.d, self.w)
        add = np.ones(idx.shape[1], dtype=np.int64) if counts is None else counts
        for r in range(self.d):
            np.add.at(self.table[r], idx[r], add)
        self.n_items += int(add.sum())

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError(f"shape mismatch: {(self.d, self.w)} vs {(other.d, other.w)}")
        self.table += other.table
        self.n_items += other.n_items
        return self

    def point(self, values) -> np.ndarray:
        """Estimated counts for an array of query values (vectorized)."""
        if not len(values):
            return np.zeros(0, dtype=np.int64)
        idx = _row_hashes(hash64(values), self.d, self.w)
        ests = np.stack([self.table[r][idx[r]] for r in range(self.d)])
        return ests.min(axis=0)

    def to_bytes(self) -> bytes:
        return (
            self.MAGIC
            + struct.pack("<IIq", self.d, self.w, self.n_items)
            + self.table.tobytes()
        )

    @classmethod
    def from_bytes(cls, raw: bytes) -> "CountMin":
        if raw[:4] != cls.MAGIC:
            raise ValueError("not a CMS1 blob")
        d, w, n = struct.unpack("<IIq", raw[4:20])
        table = np.frombuffer(raw[20 : 20 + d * w * 8], dtype=np.int64).reshape(d, w).copy()
        return cls(d=d, w=w, table=table, n_items=n)


# shared fold (sketches/pipeline.py) — one implementation for all four
# sketch modules
from .pipeline import fold_serialized

merge_serialized = fold_serialized(CountMin)


# ---------------------------------------------------------------------------
# Spark convenience
# ---------------------------------------------------------------------------


def cms_partials(df, value_col: str, key_cols=(), eps: float = 0.001, delta: float = 0.01):
    from .pipeline import sketch_partials

    return sketch_partials(df, value_col, key_cols, lambda: CountMin(eps, delta))


def cms_merged(partials, key_cols=()):
    from .pipeline import sketch_merged

    return sketch_merged(partials, key_cols, merge_serialized)


def cms_sketch(df, value_col: str, eps: float = 0.001, delta: float = 0.01) -> "CountMin":
    """Build one global CountMin over a column and return it to the driver
    (the merged sketch is a single eps/delta-sized blob)."""
    merged = cms_merged(cms_partials(df, value_col, (), eps, delta), ())
    [row] = merged.collect()
    return CountMin.from_bytes(row.sketch)
