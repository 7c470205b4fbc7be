"""t-digest — mergeable quantile sketch (Dunning & Ertl 2019, the MERGING
variant: no tree, just sorted-centroid recompression, which is the form
that distributes).

State = centroids (mean, weight) sorted by mean, bounded by the k1 scale
function  k(q) = (delta / 2π) * asin(2q - 1): a centroid may span
[q_left, q_right] only while k(q_right) - k(q_left) <= 1, which caps
centroid count at ~delta and concentrates resolution at the tails.

Accuracy: relative rank error ~ O(1/delta) mid-range and far tighter at
the tails (the published behavior; we assert empirical rank-error floors
in tests rather than a closed-form constant).  Merging is associative in
the SKETCH-GUARANTEE sense — any merge order preserves the rank-error
bound — but not bitwise (centroid boundaries depend on merge order); the
tests pin determinism for a FIXED fold order and bound-preservation for
shuffled orders.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution

_BUF = 4096


class TDigest:
    __slots__ = ("delta", "means", "weights", "_buf")

    MAGIC = b"TDG1"

    def __init__(
        self,
        delta: float = 200.0,
        means: np.ndarray | None = None,
        weights: np.ndarray | None = None,
    ):
        if delta < 10:
            raise ValueError("delta too small")
        self.delta = float(delta)
        self.means = means if means is not None else np.zeros(0, dtype=np.float64)
        self.weights = weights if weights is not None else np.zeros(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []

    # -- scale function k1 ---------------------------------------------------
    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.delta / (2.0 * math.pi)) * np.arcsin(np.clip(2.0 * q - 1.0, -1, 1))

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Recompress (mean, weight) points (already concatenated) into a
        k1-bounded centroid list.  Vectorized boundary scan + segment
        reduction via np.add.reduceat."""
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        if total == 0:
            self.means = np.zeros(0, dtype=np.float64)
            self.weights = np.zeros(0, dtype=np.float64)
            return
        # greedy left-to-right: close the current centroid when adding the
        # next point would exceed one unit of k.  The Python loop runs only
        # over segment STARTS (one searchsorted jump per output centroid,
        # ~delta iterations per flush) — the old per-point loop was ~1
        # interpreter iteration per ingested row in the map-side hot path.
        # k_right is nondecreasing, so the first index whose inclusion
        # exceeds the budget is searchsorted(k_right, k_left[start]+1,
        # 'right') — identical boundaries to the per-point scan.
        cum = np.cumsum(weights)
        q_right = cum / total
        q_left = (cum - weights) / total
        k_left = self._k(q_left)
        k_right = self._k(q_right)
        n = len(means)
        starts = [0]
        while True:
            nxt = int(np.searchsorted(k_right, k_left[starts[-1]] + 1.0, side="right"))
            if nxt >= n:
                break
            # a single over-budget point still forms its own segment
            nxt = max(nxt, starts[-1] + 1)
            starts.append(nxt)
        starts = np.asarray(starts, dtype=np.int64)
        w = np.add.reduceat(weights, starts)
        m = np.add.reduceat(weights * means, starts) / w
        self.means, self.weights = m, w

    def _flush(self) -> None:
        if not self._buf:
            return
        pts = np.concatenate(self._buf)
        self._buf = []
        self._compress(
            np.concatenate([self.means, pts]),
            np.concatenate([self.weights, np.ones(len(pts), dtype=np.float64)]),
        )

    def add_values(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self._buf.append(v)
        if sum(len(b) for b in self._buf) >= _BUF:
            self._flush()

    def merge(self, other: "TDigest") -> "TDigest":
        if other.delta != self.delta:
            raise ValueError("delta mismatch")
        other._flush()
        self._flush()
        self._compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
        )
        return self

    @property
    def n(self) -> float:
        self._flush()
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        self._flush()
        if not len(self.means):
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def to_bytes(self) -> bytes:
        self._flush()
        n = len(self.means)
        return (
            self.MAGIC
            + struct.pack("<dI", self.delta, n)
            + self.means.tobytes()
            + self.weights.tobytes()
        )

    @classmethod
    def from_bytes(cls, raw: bytes) -> "TDigest":
        if raw[:4] != cls.MAGIC:
            raise ValueError("not a TDG1 blob")
        delta, n = struct.unpack("<dI", raw[4:16])
        off = 16
        means = np.frombuffer(raw[off : off + 8 * n], dtype=np.float64).copy()
        off += 8 * n
        weights = np.frombuffer(raw[off : off + 8 * n], dtype=np.float64).copy()
        return cls(delta, means, weights)


# shared fold (sketches/pipeline.py) — one implementation for all four
# sketch modules
from .pipeline import fold_serialized

merge_serialized = fold_serialized(TDigest)


# ---------------------------------------------------------------------------
# Spark convenience
# ---------------------------------------------------------------------------


def td_partials(df, value_col: str, key_cols=(), delta: float = 200.0):
    from .pipeline import sketch_partials

    return sketch_partials(df, value_col, key_cols, lambda: TDigest(delta))


def td_merged(partials, key_cols=()):
    from .pipeline import sketch_merged

    return sketch_merged(partials, key_cols, merge_serialized)


def td_sketch(df, value_col: str, delta: float = 200.0) -> "TDigest":
    """One global t-digest over a numeric column, returned to the driver
    (centroid list is ~delta entries)."""
    [row] = td_merged(td_partials(df, value_col, (), delta), ()).collect()
    return TDigest.from_bytes(row.sketch)


def td_group_quantiles(df, value_col: str, key_cols, qs, delta: float = 200.0):
    """Per-group quantile estimates: (keys..., q double, value double) —
    one row per (group, q).  Sketches stay distributed until the final
    manifest-sized merge; extraction rides the shared pipeline helper."""
    from .pipeline import sketch_group_quantiles

    merged = td_merged(td_partials(df, value_col, key_cols, delta), key_cols)
    return sketch_group_quantiles(merged, key_cols, qs, TDigest.from_bytes)
