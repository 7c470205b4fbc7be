"""Tokenization + field-path extraction with reference-exact semantics.

Mirrors the reference's ``BasicWhitespaceLowerTokenizer`` (tokenizer.go:89-99):
lowercase, split on any whitespace run, punctuation kept inside tokens; and
``UniqueFields`` (tokenizer.go:29-83): dot-joined nested paths with array
indices discarded and per-row value dedup.  Non-string primitives are
stringified like Go ``fmt.Sprintf("%v", v)`` — notably ``30.0`` -> ``"30"``,
``True`` -> ``"true"`` (tokenizer_test.go:99-173).

Two ingest shapes:

- **Fixed-schema table** (the BASELINE input): field names are just the
  column names; ``tokenize_series`` is fully pandas-vectorized
  (``str.lower().str.split()``), no per-row Python.
- **Schemaless JSON docs** (reference-compat path): ``unique_fields`` walks
  one parsed document; applied per-row inside an Arrow-batched pandas UDF
  (inherently per-doc recursion — the dynamic-shape compatibility path only).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np
import pandas as pd

FIELD_TOKEN_SEP = "::"  # makeFieldTokenKey, bloom_tree_engine.go:34-36


def go_format_value(v: Any) -> str:
    """Stringify a JSON primitive the way Go ``fmt.Sprintf("%v", v)`` does
    after a JSON round-trip (all numbers are float64): integral floats print
    without a decimal point (tokenizer.go:79,98; tokenizer_test.go "30" case).
    """
    if v is None:
        return "<nil>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isinf(v) or math.isnan(v):
            return repr(v)
        if v == int(v) and abs(v) < 1e21:
            return str(int(v))
        return f"{v:g}"
    return str(v)


def tokenize_value(v: Any) -> list[str]:
    """Reference tokenizer on one primitive: stringify, lowercase,
    whitespace-split (tokenizer.go:86-99)."""
    return go_format_value(v).lower().split()


def stringify_series(s: pd.Series) -> pd.Series:
    """Vectorized Go-``%v``-style stringification of a column (nulls -> "").

    Integers/bools/integral floats render without decoration so numeric
    columns tokenize identically to the reference's JSON round-trip
    (``30.0`` -> ``"30"``, ``True`` -> ``"true"``).
    """
    if pd.api.types.is_bool_dtype(s):
        return s.map({True: "true", False: "false"}).fillna("")
    if pd.api.types.is_integer_dtype(s):
        return s.astype("Int64").astype(str).replace("<NA>", "")
    if pd.api.types.is_float_dtype(s):
        notna = s.notna()
        integral = notna & (s % 1 == 0) & (s.abs() < 1e21)
        out = pd.Series("", index=s.index, dtype=object)
        out[integral] = s[integral].astype("int64").astype(str)
        rest = notna & ~integral
        if rest.any():
            out[rest] = s[rest].map(lambda v: f"{v:g}")
        return out
    return s.fillna("").astype(str)


def tokenize_series(s: pd.Series) -> pd.Series:
    """Vectorized tokenizer for a string column: lowercase + whitespace split.

    Identical token semantics to ``tokenize_value`` for string inputs;
    this is the hot path for the fixed-schema source-code table.
    """
    return stringify_series(s).str.lower().str.split()


def explode_tokens(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Flatten a string column into (row_index, token) parallel arrays.

    Vectorized: one ``str.split`` + ``np.repeat``/``concatenate``; returns
    object-dtype token array ready for the bloom kernel.
    """
    lists = tokenize_series(s)
    lengths = lists.str.len().fillna(0).astype(np.int64).to_numpy()
    if lengths.sum() == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=object)
    row_idx = np.repeat(np.arange(len(s), dtype=np.int64), lengths)
    flat = np.concatenate([np.asarray(x, dtype=object) for x in lists[lengths > 0]])
    return row_idx, flat


def unique_fields(doc: dict, delimiter: str = ".") -> dict[str, list[Any]]:
    """Flatten one nested document to {path: [unique primitive values]}.

    Array indices are discarded from paths, values are deduplicated per
    path per row (tokenizer.go:29-83): ``{"user":{"tags":[{"type":"user"},
    {"role":"admin"}]}}`` -> {"user.tags.type": ["user"],
    "user.tags.role": ["admin"]}.
    """
    out: dict[str, dict[str, Any]] = {}

    def walk(v: Any, path: str) -> None:
        if isinstance(v, dict):
            for kk, vv in v.items():
                walk(vv, f"{path}{delimiter}{kk}" if path else str(kk))
        elif isinstance(v, (list, tuple)):
            for item in v:
                walk(item, path)  # indices dropped (tokenizer.go:45-83)
        else:
            if path:
                # dedup by stringified form, preserve first-seen order
                bucket = out.setdefault(path, {})
                key = go_format_value(v)
                if key not in bucket:
                    bucket[key] = v

    walk(doc, "")
    return {p: list(vals.values()) for p, vals in out.items()}


def doc_index_entries(doc: dict) -> tuple[list[str], list[str], list[str]]:
    """One document -> (field paths, tokens, field::token keys) for indexing.

    The three search domains of README.md:113-166.
    """
    fields: list[str] = []
    tokens: set[str] = set()
    pairs: set[str] = set()
    for path, values in unique_fields(doc).items():
        fields.append(path)
        for v in values:
            for tok in tokenize_value(v):
                tokens.add(tok)
                pairs.add(f"{path}{FIELD_TOKEN_SEP}{tok}")
    return fields, sorted(tokens), sorted(pairs)


# ---------------------------------------------------------------------------
# Exact-verification walkers (Q12): bloom filters only disqualify; survivors
# are re-checked against the actual document structure
# (tokenizer.go:107-298, 411-425).
# ---------------------------------------------------------------------------


def doc_has_field(doc: dict, path: str, delimiter: str = ".") -> bool:
    """Field-exists walk: does ``path`` exist structurally (arrays descended,
    indices ignored)? tokenizer.go:107-150."""
    parts = path.split(delimiter)

    def walk(v: Any, i: int) -> bool:
        if i == len(parts):
            return True
        if isinstance(v, dict):
            return parts[i] in v and walk(v[parts[i]], i + 1)
        if isinstance(v, (list, tuple)):
            return any(walk(item, i) for item in v)
        return False

    return walk(doc, 0)


def doc_has_token(doc: Any, token: str) -> bool:
    """Token-equality walk over every primitive anywhere in the doc
    (tokenizer.go:152-194)."""
    if isinstance(doc, dict):
        return any(doc_has_token(v, token) for v in doc.values())
    if isinstance(doc, (list, tuple)):
        return any(doc_has_token(v, token) for v in doc)
    return token in tokenize_value(doc)


def doc_has_field_token(doc: dict, path: str, token: str, delimiter: str = ".") -> bool:
    """field::token walk: token under that specific path (arrays descended,
    indices ignored — the documented "information loss" semantics,
    tokenizer_test.go:238-277)."""
    parts = path.split(delimiter)

    def walk(v: Any, i: int) -> bool:
        if isinstance(v, (list, tuple)):
            return any(walk(item, i) for item in v)
        if i == len(parts):
            return not isinstance(v, dict) and token in tokenize_value(v)
        if isinstance(v, dict):
            return parts[i] in v and walk(v[parts[i]], i + 1)
        return False

    return walk(doc, 0)


def doc_field_values(doc: Any, path: str, delimiter: str = ".") -> list[Any]:
    """All primitive values reachable at ``path`` (for regex evaluation on
    full field value strings, tokenizer.go:300-409)."""
    parts = path.split(delimiter)
    out: list[Any] = []

    def walk(v: Any, i: int) -> None:
        if isinstance(v, (list, tuple)):
            for item in v:
                walk(item, i)
        elif i == len(parts):
            if not isinstance(v, dict):
                out.append(v)
        elif isinstance(v, dict) and parts[i] in v:
            walk(v[parts[i]], i + 1)

    walk(doc, 0)
    return out
