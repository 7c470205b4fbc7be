"""Bloom filter as a first-class member of the mergeable-sketch family.

The engine already uses bloom bitsets as its index (``bloomsearch_spark.
bloom`` — sizing, double hashing, OR-merge mirror the reference's
bits-and-blooms usage, /root/reference/bloom_tree_engine.go:518-565).  This
module exposes the SAME kernel through the shared sketch-UDAF pipeline
(``sketches/pipeline.py``: one mapInPandas pass of per-(task, group)
partials, then a manifest-sized associative merge) so Bloom sits alongside
HLL / Count-Min / t-digest / KLL with the identical checkpointable-partials
contract the north rule asks for:

- state: a fixed ``(m, k)`` bitset (sized from ``(expected_items, fpr)``)
- merge: bitwise OR — associative, commutative, idempotent (retry-safe)
- guarantees: NO false negatives ever; expected false-positive rate for a
  realized bitset with fill ratio ``f`` is ``f**k`` (the classical bound
  ``(1 - e^{-kn/m})^k`` with the fill standing in for the unknown merged
  distinct count — the standard estimator ``n̂ = -(m/k)·ln(1-f)`` inverts
  the same identity).

Everything is vectorized: hashing via ``pandas.util.hash_array`` over whole
object arrays, bit twiddling in numpy — no per-row Python.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .. import bloom as bl


def _render_tokens(values) -> np.ndarray:
    """Canonical string rendering for bloom keys — BUILD and PROBE must
    agree for any batch null-composition.  A nullable int64 column arrives
    as float64 in batches containing any null (pandas promotion) but int64
    in null-free ones, so a bare ``str()`` would insert '42.0' and probe
    '42' — a FALSE NEGATIVE violating the no-false-negatives guarantee.
    Integral floats therefore render as ints (42.0 -> '42'), matching the
    engine tokenizer's Go-%v convention (tokenizer.go / go_format_value)."""
    arr = np.asarray(values, dtype=object)
    out = np.empty(len(arr), dtype=object)
    for i, v in enumerate(arr):
        if isinstance(v, float) and not (math.isnan(v) or math.isinf(v)) and v.is_integer():
            out[i] = str(int(v))
        else:
            out[i] = str(v)
    return out


class BloomSketch:
    """Mergeable Bloom membership sketch over arbitrary values.

    Values are rendered canonically (``_render_tokens``: str(), integral
    floats as ints) before hashing so numeric and string inputs are stable
    across arrow batches regardless of null composition."""

    __slots__ = ("params", "bitset")

    MAGIC = b"BSK1"

    def __init__(
        self,
        expected_items: int = 1 << 14,
        fpr: float = 0.01,
        bitset: np.ndarray | None = None,
    ):
        self.params = bl.BloomParams(int(expected_items), float(fpr))
        self.bitset = bl.new_bitset(self.params) if bitset is None else bitset

    # -- update --------------------------------------------------------------
    def add_values(self, values) -> None:
        if len(values) == 0:
            return
        bl.insert(self.bitset, _render_tokens(values), self.params)

    # -- probe ---------------------------------------------------------------
    def contains(self, values) -> np.ndarray:
        """bool array aligned with ``values``: True = maybe present,
        False = DEFINITELY absent (blooms only disqualify)."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        return bl.probe(self.bitset, _render_tokens(values), self.params)

    # -- merge (associative + commutative + idempotent) -----------------------
    def merge(self, other: "BloomSketch") -> "BloomSketch":
        if other.params != self.params:
            raise ValueError(
                f"cannot merge bloom sketches with different params: "
                f"{self.params} vs {other.params}"
            )
        np.bitwise_or(self.bitset, other.bitset, out=self.bitset)
        return self

    # -- published bounds ------------------------------------------------------
    @property
    def fill(self) -> float:
        return bl.fill_ratio(self.bitset)

    def fp_rate_bound(self) -> float:
        """Expected false-positive probability of THIS realized bitset:
        ``fill**k`` (each of the k probed bits is set independently with
        probability = fill)."""
        return float(self.fill ** self.params.k)

    def approx_items(self) -> float:
        """Standard bloom cardinality estimate ``-(m/k)·ln(1 - fill)``
        (Swamidass & Baldi 2007) — works across merges where exact distinct
        counts cannot be summed."""
        m, k = self.params.mk
        f = min(self.fill, 1.0 - 1e-12)
        return -(m / k) * math.log(1.0 - f)

    # -- serialization (checkpointable partials) -------------------------------
    def to_bytes(self) -> bytes:
        return (
            self.MAGIC
            + struct.pack("<qd", self.params.expected_items, self.params.fpr)
            + self.bitset.tobytes()
        )

    @classmethod
    def from_bytes(cls, raw: bytes) -> "BloomSketch":
        if raw[:4] != cls.MAGIC:
            raise ValueError("not a BSK1 blob")
        n, p = struct.unpack("<qd", raw[4:20])
        bits = np.frombuffer(raw[20:], dtype=np.uint8).copy()
        sk = cls(n, p, bits)
        if bits.size != sk.params.nbytes:
            raise ValueError(
                f"bitset size {bits.size} does not match params {sk.params}"
            )
        return sk


from .pipeline import fold_serialized

merge_serialized = fold_serialized(BloomSketch)


# ---------------------------------------------------------------------------
# Spark convenience (two-stage pipeline from .pipeline)
# ---------------------------------------------------------------------------


def bloom_partials(df, value_col: str, key_cols=(), expected_items: int = 1 << 14, fpr: float = 0.01):
    """Per-(task, group) serialized Bloom partials — checkpointable, same
    contract as ``hll_partials``."""
    from .pipeline import sketch_partials

    return sketch_partials(
        df, value_col, key_cols, lambda: BloomSketch(expected_items, fpr)
    )


def bloom_merged(partials, key_cols=()):
    from .pipeline import sketch_merged

    return sketch_merged(partials, key_cols, merge_serialized)


def bloom_sketch_df(df, value_col: str, key_cols=(), expected_items: int = 1 << 14, fpr: float = 0.01):
    """(keys..., sketch binary) — one merged bloom per group."""
    return bloom_merged(
        bloom_partials(df, value_col, key_cols, expected_items, fpr), key_cols
    )


def bloom_contains(probes, probe_col: str, merged, key_cols=()):
    """Probe a DataFrame of values against per-group merged blooms.

    ``merged`` is a ``(keys..., sketch binary)`` frame from
    :func:`bloom_merged` — manifest-sized (one KB-scale blob per group), so
    it is collected and BROADCAST to executors; the probe itself is one
    vectorized ``mapInPandas`` pass over ``probes`` (no shuffle, no join of
    the big side).  Output = ``probes`` columns + ``maybe_present boolean``
    (False = definitely absent; groups with no bloom probe as absent).
    """
    import pandas as pd

    keys = list(key_cols)
    rows = merged.select(*keys, "sketch").collect()
    blobs = {tuple(r[k] for k in keys): bytes(r["sketch"]) for r in rows}
    spark = probes.sparkSession
    bblobs = spark.sparkContext.broadcast(blobs)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in probes.schema.fields
    ) + ", maybe_present boolean"

    def _norm_key(kt) -> tuple:
        # pandas groupby(dropna=False) renders a null key as NaN/NaT while
        # the Spark-collected blob dict holds None — normalize so the
        # null-keyed group finds its sketch (a miss probed the whole group
        # as definitely-absent: false negatives)
        out = []
        for v in kt:
            if v is None or v is pd.NaT or (
                isinstance(v, float) and math.isnan(v)
            ):
                out.append(None)
            else:
                out.append(v)
        return tuple(out)

    def fn(batches):
        sketches: dict[tuple, BloomSketch] = {}
        for kt, raw in bblobs.value.items():
            sketches[kt] = BloomSketch.from_bytes(raw)
        for pdf in batches:
            res = np.zeros(len(pdf), dtype=bool)
            if keys:
                for kt, grp in pdf.groupby(keys, dropna=False, sort=False):
                    kt = _norm_key(kt if isinstance(kt, tuple) else (kt,))
                    sk = sketches.get(kt)
                    if sk is not None:
                        res[grp.index.to_numpy()] = sk.contains(
                            grp[probe_col].to_numpy()
                        )
            else:
                sk = sketches.get(())
                if sk is not None:
                    res = sk.contains(pdf[probe_col].to_numpy())
            out = pdf.copy()
            out["maybe_present"] = res
            yield out

    return probes.mapInPandas(fn, out_schema)
