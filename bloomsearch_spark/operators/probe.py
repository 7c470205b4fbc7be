"""Bloom probe over manifest rows — the hierarchical prune operator.

Compiles a ``BloomExpr`` tree to a vectorized pandas UDF that evaluates the
tree against every manifest row's three serialized bitsets at once
(file-level rows for Q9, block-level rows for Q10;
bloom_tree_engine.go:876-1007).  Semantics preserved:

- a leaf probes exactly one of the three filters (field / token /
  field::token, evaluateBloomCondition :876-908);
- a null/empty bitset cannot disqualify -> True (:885-907);
- AND/OR combine leaf results; bloom filters only *disqualify*, the final
  truth comes from the exact scan (Q12).

Rows may carry different (expected_items, fpr) after merges of
heterogeneous files; the UDF groups rows by params and hashes once per
(m, k) — still fully vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import bloom
from ..query import BloomExpr

_FILTER_COL = {"field": 0, "token": 1, "fieldtoken": 2}


def _eval_tree(
    expr: BloomExpr,
    bitset_cols: list[pd.Series],
    params: bloom.BloomParams,
    idx: np.ndarray,
) -> np.ndarray:
    """Evaluate the tree for the manifest rows selected by ``idx`` under one
    (m,k); returns a bool array aligned with ``idx``."""
    if expr.kind == "AND":
        out = np.ones(len(idx), dtype=bool)
        for ch in expr.children:
            out &= _eval_tree(ch, bitset_cols, params, idx)
        return out  # empty AND -> true
    if expr.kind == "OR":
        out = np.zeros(len(idx), dtype=bool)
        for ch in expr.children:
            out |= _eval_tree(ch, bitset_cols, params, idx)
        return out  # empty OR -> false
    which, key = expr.probe_key()
    col = bitset_cols[_FILTER_COL[which]]
    return bloom.probe_many(col.iloc[idx], key, params)


def bloom_probe_udf(expr: BloomExpr):
    """Pandas UDF (expected_items, fpr, field_bloom, token_bloom,
    fieldtoken_bloom) -> boolean "might match"."""

    @F.pandas_udf("boolean")
    def probe(
        expected_items: pd.Series,
        fpr: pd.Series,
        field_bloom: pd.Series,
        token_bloom: pd.Series,
        fieldtoken_bloom: pd.Series,
    ) -> pd.Series:
        n = len(expected_items)
        out = np.ones(n, dtype=bool)
        cols = [field_bloom, token_bloom, fieldtoken_bloom]
        key = pd.DataFrame({"n": expected_items.values, "p": fpr.values})
        for (ni, pi), grp in key.groupby(["n", "p"], sort=False):
            params = bloom.BloomParams(int(ni), float(pi))
            idx = grp.index.to_numpy()
            out[idx] = _eval_tree(expr, cols, params, idx)
        return pd.Series(out)

    return probe


_FILTER_NAME = {"field": "field_bloom", "token": "token_bloom", "fieldtoken": "fieldtoken_bloom"}


def _jvm_leaf_sql(col_name: str, key, params: bloom.BloomParams) -> str:
    """Pure-Catalyst bitset probe for one leaf: the query key's k bit
    positions are plan-time constants, so membership is an AND of k
    single-byte tests — ``cast(conv(hex(substring(bloom, off, 1)), 16, 10)
    as int) & mask != 0`` — all inside whole-stage codegen.  A null/empty
    bitset cannot disqualify -> True (nil-filter semantics,
    bloom_tree_engine.go:885-907).

    Emitted as a SQL STRING (the whole tree becomes ONE ``F.expr`` call):
    building the same expression op-by-op through the Column API costs
    ~50 blocking py4j round-trips per leaf plus a Python stack capture per
    op (PySpark 4 error context), measured at ~0.6 s of DRIVER time per
    query at k=7 — pure plan-construction overhead that the single parse
    eliminates.

    The k positions are carried as ONE array literal probed by a
    ``forall`` lambda, not k inlined int comparisons: constant-folded
    complex-type literals reach generated code as reference objects, so
    the Java source text is IDENTICAL for every query token and Spark's
    codegen cache hits — inlined ints changed the source per token and
    forced a fresh janino compile (~0.3-0.5 s) on every new query."""
    positions = bloom.leaf_positions(key, params).reshape(-1)
    arr = ",".join(str(int(p)) for p in positions.tolist())
    return (
        f"(CASE WHEN {col_name} IS NULL OR length({col_name}) = 0 THEN true "
        f"ELSE forall(array({arr}), p -> "
        f"(cast(conv(hex(substring({col_name}, p div 8 + 1, 1)), 16, 10) as int)"
        f" & shiftleft(1, p % 8)) != 0) END)"
    )


def _jvm_tree_sql(expr: BloomExpr, params: bloom.BloomParams) -> str:
    if expr.kind == "AND":
        if not expr.children:
            return "true"
        return "(" + " AND ".join(_jvm_tree_sql(ch, params) for ch in expr.children) + ")"
    if expr.kind == "OR":
        if not expr.children:
            return "false"
        return "(" + " OR ".join(_jvm_tree_sql(ch, params) for ch in expr.children) + ")"
    which, key = expr.probe_key()
    return _jvm_leaf_sql(_FILTER_NAME[which], key, params)


def _jvm_tree(expr: BloomExpr, params: bloom.BloomParams) -> Column:
    return F.expr(_jvm_tree_sql(expr, params))


def needed_bloom_cols(expr: BloomExpr | None) -> frozenset:
    """The manifest bitset columns a prune tree actually tests — drives
    column-pruned manifest caching (BloomIndex.probe_view)."""
    if expr is None:
        return frozenset()
    if expr.kind in ("AND", "OR"):
        out: frozenset = frozenset()
        for ch in expr.children:
            out |= needed_bloom_cols(ch)
        return out
    return frozenset({_FILTER_NAME[expr.probe_key()[0]]})


def probe_filter(expr: BloomExpr | None, params: bloom.BloomParams | None = None) -> Column:
    """Filter Column for a manifest DataFrame (blocks or files level).

    ``None`` (no bloom query) prunes nothing — bloom only disqualifies
    (bloom_tree_engine.go:830-835).

    ``params``: when the caller knows the manifest is PARAM-HOMOGENEOUS
    (one (expected_items, fpr) across all rows — the common case;
    ``BloomIndex.uniform_params`` checks and caches it), the probe compiles
    to pure Catalyst byte tests: the bloom bytes never leave the JVM, where
    the generic pandas-UDF path ships every bitset through Arrow per query
    (measured 0.75 s for 192 file rows x 350 KB vs ~job-overhead-only for
    the JVM path).  Mixed-param manifests fall back to the UDF, which
    groups rows by (m, k) at runtime.
    """
    if expr is None:
        return F.lit(True)
    if params is not None:
        return _jvm_tree(expr, params)
    udf = bloom_probe_udf(expr)
    return udf(
        F.col("expected_items"),
        F.col("fpr"),
        F.col("field_bloom"),
        F.col("token_bloom"),
        F.col("fieldtoken_bloom"),
    )
