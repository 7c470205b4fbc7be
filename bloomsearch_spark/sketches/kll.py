"""KLL — mergeable quantile sketch (Karnin, Lang & Liberty, FOCS 2016).

A stack of compactors: level ``h`` holds items of weight ``2**h``; when a
level overflows its capacity ``max(2, ceil(k * c**(H-h)))`` (c = 2/3) it
sorts itself and promotes every other item to level h+1 (a "compaction").
Published guarantee: rank error eps = O(1/k) with high probability — we
assert an empirical floor in tests (k=200 -> observed rank error << 0.01).

The compaction offset (keep odd vs even positions) is drawn from a
deterministic splitmix stream seeded by (level, compaction count) rather
than a true random coin: bitwise-reproducible runs and resume-stable
checkpoints, at the cost of the formal adversarial-input argument (the
randomized analysis assumes independent coins; for non-adversarial data
the behavior is the same).

Merge = concatenate levels pairwise, then re-compact overflowing levels —
associative in the rank-error-bound sense (like t-digest, not bitwise).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution

_C = 2.0 / 3.0


def _coin(level: int, count: int) -> int:
    x = (level * 0x9E3779B97F4A7C15 + count * 0xBF58476D1CE4E5B9 + 0x1234) & (
        (1 << 64) - 1
    )
    x ^= x >> 31
    x = (x * 0x94D049BB133111EB) & ((1 << 64) - 1)
    return (x >> 13) & 1


class KLL:
    __slots__ = ("k", "levels", "_compactions", "n")

    MAGIC = b"KLL1"

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k too small")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.zeros(0, dtype=np.float64)]
        self._compactions: list[int] = [0]
        self.n = 0

    def _cap(self, h: int) -> int:
        height = len(self.levels)
        return max(2, int(np.ceil(self.k * _C ** (height - 1 - h))))

    def _compact_level(self, h: int) -> None:
        items = np.sort(self.levels[h], kind="stable")
        off = _coin(h, self._compactions[h])
        self._compactions[h] += 1
        keep = items[off::2]
        self.levels[h] = np.zeros(0, dtype=np.float64)
        if h + 1 == len(self.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
            self._compactions.append(0)
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], keep])

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self._cap(h):
                self._compact_level(h)
            h += 1

    def add_values(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.n += len(v)
        # bulk insert: append the WHOLE batch to level 0, then one compress
        # cascade.  Compaction semantics are insertion-time-independent
        # (sort + keep-every-other), and the rank-error bound is monotone
        # in the NUMBER of compactions per level — fewer, larger
        # compactions only tighten it.  The old level-0-capacity stepping
        # degraded to 8-item chunks once the stack grew (cap(0) shrinks
        # toward 2 with height), costing a full O(height) python cascade
        # every 8 rows — ~4x the whole sk_kll bench stage (r05 profile).
        self.levels[0] = np.concatenate([self.levels[0], v])
        if len(self.levels[0]) > self._cap(0):
            self._compress()

    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k:
            raise ValueError("k mismatch")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
            self._compactions.append(0)
        for h, items in enumerate(other.levels):
            if len(items):
                self.levels[h] = np.concatenate([self.levels[h], items])
        self.n += other.n
        self._compress()
        return self

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, items in enumerate(self.levels):
            if len(items):
                vals.append(items)
                wts.append(np.full(len(items), 2.0**h))
        if not vals:
            return np.zeros(0), np.zeros(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        v, w = self._weighted()
        if not len(v):
            return float("nan")
        cum = np.cumsum(w) - w / 2.0
        return float(np.interp(q * w.sum(), cum, v))

    def rank(self, x: float) -> float:
        """Estimated fraction of items <= x."""
        v, w = self._weighted()
        if not len(v):
            return float("nan")
        return float(w[v <= x].sum() / w.sum())

    def to_bytes(self) -> bytes:
        parts = [self.MAGIC, struct.pack("<IqI", self.k, self.n, len(self.levels))]
        for h, items in enumerate(self.levels):
            parts.append(struct.pack("<II", len(items), self._compactions[h]))
            parts.append(items.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, raw: bytes) -> "KLL":
        if raw[:4] != cls.MAGIC:
            raise ValueError("not a KLL1 blob")
        k, n, n_levels = struct.unpack("<IqI", raw[4:20])
        out = cls(k)
        out.n = n
        out.levels, out._compactions = [], []
        off = 20
        for _ in range(n_levels):
            ln, comp = struct.unpack("<II", raw[off : off + 8])
            off += 8
            out.levels.append(np.frombuffer(raw[off : off + 8 * ln], dtype=np.float64).copy())
            out._compactions.append(comp)
            off += 8 * ln
        return out


# shared fold (sketches/pipeline.py) — one implementation for all four
# sketch modules
from .pipeline import fold_serialized

merge_serialized = fold_serialized(KLL)


# ---------------------------------------------------------------------------
# Spark convenience
# ---------------------------------------------------------------------------


def kll_partials(df, value_col: str, key_cols=(), k: int = 200):
    from .pipeline import sketch_partials

    return sketch_partials(df, value_col, key_cols, lambda: KLL(k))


def kll_merged(partials, key_cols=()):
    from .pipeline import sketch_merged

    return sketch_merged(partials, key_cols, merge_serialized)


def kll_sketch(df, value_col: str, k: int = 200) -> "KLL":
    """One global KLL over a numeric column, returned to the driver."""
    [row] = kll_merged(kll_partials(df, value_col, (), k), ()).collect()
    return KLL.from_bytes(row.sketch)


def kll_group_quantiles(df, value_col: str, key_cols, qs, k: int = 200):
    """Per-group quantile estimates: (keys..., q double, value double)."""
    from .pipeline import sketch_group_quantiles

    merged = kll_merged(kll_partials(df, value_col, key_cols, k), key_cols)
    return sketch_group_quantiles(merged, key_cols, qs, KLL.from_bytes)
