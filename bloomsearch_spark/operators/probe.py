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


def probe_filter(expr: BloomExpr | None) -> Column:
    """Filter Column for a manifest DataFrame (blocks or files level).

    ``None`` (no bloom query) prunes nothing — bloom only disqualifies
    (bloom_tree_engine.go:830-835).
    """
    if expr is None:
        return F.lit(True)
    udf = bloom_probe_udf(expr)
    return udf(
        F.col("expected_items"),
        F.col("fpr"),
        F.col("field_bloom"),
        F.col("token_bloom"),
        F.col("fieldtoken_bloom"),
    )
