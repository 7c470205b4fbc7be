"""Exact row verification (Q12/Q13) — the final truth stage.

Bloom filters only disqualify; rows from surviving blocks are re-checked
against actual content (bloom_tree_engine.go:831, 1182-1185).  Two paths:

- **Fixed-schema** (the hot path): the bloom tree compiles to a pure
  Catalyst Column — ``array_contains(split(lower(col), '\\s+'), token)``
  for token tests, ``isNotNull`` for field-exists, ``rlike`` for the
  final-stage regex.  Whole-stage-codegen-friendly, no Python at scan time.
- **Schemaless JSON** (compatibility path): an Arrow-batched pandas UDF
  that replays the reference walkers (field-exists / token / field:token
  with arrays descended and indices ignored, tokenizer.go:107-298; regex on
  full field value strings, :300-409).

Dialect note: fixed-schema regex uses Java regex (`rlike`), JSON path uses
Python `re`; both cover the Go RE2 subset exercised by the reference tests
(anchors, alternation, literals).  Numeric columns are matched via string
CAST on the fixed path (bigint casts identically to Go %v; float columns
would render "30.0" vs Go "30" — index floats via the JSON path if that
distinction matters).
"""

from __future__ import annotations

import json
import re
from typing import Optional, Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..query import BloomExpr, RegexExpr
from ..tokenizer import (
    WHITESPACE_LOWER,
    Tokenizer,
    doc_field_values,
    doc_has_field,
    doc_has_field_token,
    doc_has_token,
    go_format_value,
    tokens_udf,
)


def _token_in_col(col: str, token: str, tokenizer: Tokenizer) -> Column:
    """token-membership test using the INDEX's configured tokenizer — the
    verify stage must re-derive tokens exactly as the build inserted them
    (the reference stores one ValueTokenizerFunc on the engine config).
    Prefers the tokenizer's Catalyst face (whole-stage codegen); falls back
    to an Arrow-batched pandas UDF over value_fn for python-only custom
    tokenizers."""
    c = F.col(col).cast("string")
    toks = (
        tokenizer.sql_tokens(c)
        if tokenizer.sql_tokens is not None
        else tokens_udf(tokenizer)(c)
    )
    return F.coalesce(F.array_contains(toks, token), F.lit(False))


def compile_bloom_verify(
    expr: Optional[BloomExpr],
    indexed_fields: Sequence[str],
    columns: Sequence[str],
    tokenizer: Tokenizer = WHITESPACE_LOWER,
) -> Column:
    """Bloom tree -> exact Catalyst predicate over fixed-schema rows.

    - FIELD f: column exists and is non-null for the row
    - TOKEN t: t appears in the tokenization of ANY indexed column
      (the reference indexes every field; our fixed-schema equivalent of
      "anywhere in the document" is "any indexed column")
    - FIELD_TOKEN f t: t appears in the tokenization of column f

    FIELD / FIELD_TOKEN leaves naming a column OUTSIDE ``indexed_fields``
    compile to constant False: the build never inserted that field, so
    only bloom FALSE-POSITIVE blocks could reach verify — gating on the
    raw data columns instead would make results an FPR-dependent random
    subset.  "Not indexed" deterministically means "cannot match" (the
    reference indexes every field, so the case has no Go analog).
    """
    if expr is None:
        return F.lit(True)
    cols = set(columns)
    indexed = set(indexed_fields) & cols
    if expr.kind == "AND":
        out = F.lit(True)
        for ch in expr.children:
            out = out & compile_bloom_verify(ch, indexed_fields, columns, tokenizer)
        return out
    if expr.kind == "OR":
        out = F.lit(False)
        for ch in expr.children:
            out = out | compile_bloom_verify(ch, indexed_fields, columns, tokenizer)
        return out
    if expr.kind == "FIELD":
        return F.col(expr.field).isNotNull() if expr.field in indexed else F.lit(False)
    if expr.kind == "TOKEN":
        out = F.lit(False)
        for c in indexed_fields:
            if c in cols:
                out = out | _token_in_col(c, expr.token, tokenizer)
        return out
    if expr.kind == "FIELD_TOKEN":
        if expr.field not in indexed:
            return F.lit(False)
        return _token_in_col(expr.field, expr.token, tokenizer)
    raise AssertionError(expr.kind)


def compile_regex_verify(expr: Optional[RegexExpr], columns: Sequence[str]) -> Column:
    """Regex tree -> Catalyst predicate on full field value strings
    (final-stage AND after bloom verification, README.md:140-166)."""
    if expr is None:
        return F.lit(True)
    cols = set(columns)
    if expr.kind == "AND":
        out = F.lit(True)
        for ch in expr.children:
            out = out & compile_regex_verify(ch, columns)
        return out
    if expr.kind == "OR":
        out = F.lit(False)
        for ch in expr.children:
            out = out | compile_regex_verify(ch, columns)
        return out
    if expr.field not in cols:
        return F.lit(False)
    return F.coalesce(F.col(expr.field).cast("string").rlike(expr.pattern), F.lit(False))


# ---------------------------------------------------------------------------
# JSON-document path
# ---------------------------------------------------------------------------


def _doc_matches_bloom(doc, expr: Optional[BloomExpr], value_fn) -> bool:
    if expr is None:
        return True
    if expr.kind == "AND":
        return all(_doc_matches_bloom(doc, ch, value_fn) for ch in expr.children)
    if expr.kind == "OR":
        return any(_doc_matches_bloom(doc, ch, value_fn) for ch in expr.children)
    if expr.kind == "FIELD":
        return doc_has_field(doc, expr.field)
    if expr.kind == "TOKEN":
        return doc_has_token(doc, expr.token, value_fn)
    if expr.kind == "FIELD_TOKEN":
        return doc_has_field_token(doc, expr.field, expr.token, value_fn=value_fn)
    raise AssertionError(expr.kind)


def _doc_matches_regex(doc, expr: Optional[RegexExpr], cache: dict) -> bool:
    if expr is None:
        return True
    if expr.kind == "AND":
        return all(_doc_matches_regex(doc, ch, cache) for ch in expr.children)
    if expr.kind == "OR":
        return any(_doc_matches_regex(doc, ch, cache) for ch in expr.children)
    pat = cache.get(expr.pattern)
    if pat is None:
        pat = cache[expr.pattern] = re.compile(expr.pattern)
    # evaluated on full (stringified) field values, not tokens
    return any(pat.search(go_format_value(v)) for v in doc_field_values(doc, expr.field))


def json_verify_udf(
    bloom_expr: Optional[BloomExpr],
    regex_expr: Optional[RegexExpr],
    tokenizer: Tokenizer = WHITESPACE_LOWER,
):
    """Pandas UDF over the JSON column: exact structural verification."""
    value_fn = tokenizer.value_fn

    @F.pandas_udf("boolean")
    def verify(raw: pd.Series) -> pd.Series:
        cache: dict = {}

        def one(r) -> bool:
            if r is None:
                return False
            doc = json.loads(r) if isinstance(r, str) else r
            return _doc_matches_bloom(doc, bloom_expr, value_fn) and _doc_matches_regex(
                doc, regex_expr, cache
            )

        return raw.map(one)

    return verify
