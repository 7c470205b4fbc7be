"""Query model: expression trees, fluent builder, and Catalyst compilers.

Re-expresses the reference's query surface (query.go:6-778) as Python
dataclasses that compile to ``pyspark.sql.Column`` predicates:

- **Prefilter** trees over {partition string ops, minmax numeric ops} with
  the 10 operators EQ NE GT GTE LT LTE IN NOT_IN BETWEEN NOT_BETWEEN
  (query.go:6-24), evaluated with *strict* semantics (missing partition or
  minmax metadata excludes the block, query.go:403-422) and *overlap*
  semantics for minmax (query.go:319-360).
- **Bloom** trees over {field, token, field:token} with AND/OR
  (query.go:449-545); empty OR -> false, empty AND -> true; absent
  expression -> match-all (bloom only disqualifies).
- **Regex** trees over full field-value strings (final-stage filter,
  tokenizer.go:300-409) plus the regex -> field-existence bloom guard
  rewrite (RegexFieldGuardBloomQuery, query.go:596-663).

Same-type nested AND/OR children are flattened at construction
(query.go:115-125, 548-558) — Catalyst would simplify anyway, but the tree
shape is part of the public API surface.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .tokenizer import FIELD_TOKEN_SEP

# ---------------------------------------------------------------------------
# Operators (query.go:6-24)
# ---------------------------------------------------------------------------

OP_EQ = "EQ"
OP_NE = "NE"
OP_GT = "GT"
OP_GTE = "GTE"
OP_LT = "LT"
OP_LTE = "LTE"
OP_IN = "IN"
OP_NOT_IN = "NOT_IN"
OP_BETWEEN = "BETWEEN"
OP_NOT_BETWEEN = "NOT_BETWEEN"

_SCALAR_OPS = {OP_EQ, OP_NE, OP_GT, OP_GTE, OP_LT, OP_LTE}
_SET_OPS = {OP_IN, OP_NOT_IN}
_RANGE_OPS = {OP_BETWEEN, OP_NOT_BETWEEN}


@dataclass(frozen=True)
class Condition:
    """One comparison; covers both StringCondition and NumericCondition
    (query.go:27-42)."""

    op: str
    value: object = None
    values: tuple = ()
    lo: object = None
    hi: object = None

    def __post_init__(self):
        if self.op not in _SCALAR_OPS | _SET_OPS | _RANGE_OPS:
            raise ValueError(f"unknown operator {self.op!r}")


def Eq(v) -> Condition:
    return Condition(OP_EQ, value=v)


def Ne(v) -> Condition:
    return Condition(OP_NE, value=v)


def Gt(v) -> Condition:
    return Condition(OP_GT, value=v)


def Gte(v) -> Condition:
    return Condition(OP_GTE, value=v)


def Lt(v) -> Condition:
    return Condition(OP_LT, value=v)


def Lte(v) -> Condition:
    return Condition(OP_LTE, value=v)


def In(*vs) -> Condition:
    return Condition(OP_IN, values=tuple(vs))


def NotIn(*vs) -> Condition:
    return Condition(OP_NOT_IN, values=tuple(vs))


def Between(lo, hi) -> Condition:
    return Condition(OP_BETWEEN, lo=lo, hi=hi)


def NotBetween(lo, hi) -> Condition:
    return Condition(OP_NOT_BETWEEN, lo=lo, hi=hi)


def _exact_condition_column(col: Column, c: Condition) -> Column:
    """Point-value evaluation (EvaluateStringCondition /
    EvaluateNumericCondition, query.go:242-314) as a Catalyst Column."""
    if c.op == OP_EQ:
        return col == F.lit(c.value)
    if c.op == OP_NE:
        return col != F.lit(c.value)
    if c.op == OP_GT:
        return col > F.lit(c.value)
    if c.op == OP_GTE:
        return col >= F.lit(c.value)
    if c.op == OP_LT:
        return col < F.lit(c.value)
    if c.op == OP_LTE:
        return col <= F.lit(c.value)
    if c.op == OP_IN:
        return col.isin(list(c.values)) if c.values else F.lit(False)
    if c.op == OP_NOT_IN:
        return ~col.isin(list(c.values)) if c.values else F.lit(True)
    if c.op == OP_BETWEEN:
        return (col >= F.lit(c.lo)) & (col <= F.lit(c.hi))
    if c.op == OP_NOT_BETWEEN:
        return (col < F.lit(c.lo)) | (col > F.lit(c.hi))
    raise AssertionError(c.op)


def _minmax_condition_column(mn: Column, mx: Column, c: Condition) -> Column:
    """Overlap evaluation over a [min,max] zone map: include the block if
    it MIGHT contain matches (EvaluateMinMaxCondition, query.go:319-360).
    This is exactly Parquet/Iceberg zone-map pruning re-expressed as a
    manifest filter."""
    if c.op == OP_EQ:
        return (mn <= F.lit(c.value)) & (F.lit(c.value) <= mx)
    if c.op == OP_NE:
        return (mn != F.lit(c.value)) | (mx != F.lit(c.value))
    if c.op == OP_GT:
        return mx > F.lit(c.value)
    if c.op == OP_GTE:
        return mx >= F.lit(c.value)
    if c.op == OP_LT:
        return mn < F.lit(c.value)
    if c.op == OP_LTE:
        return mn <= F.lit(c.value)
    if c.op == OP_IN:
        if not c.values:
            return F.lit(False)
        out = F.lit(False)
        for v in c.values:
            out = out | ((mn <= F.lit(v)) & (F.lit(v) <= mx))
        return out
    if c.op == OP_NOT_IN:
        # Conservative: the range might contain values outside the set
        # (query.go:347-350) — let bloom/exact stages refine.
        return F.lit(True)
    if c.op == OP_BETWEEN:
        return (mn <= F.lit(c.hi)) & (F.lit(c.lo) <= mx)
    if c.op == OP_NOT_BETWEEN:
        return (mn < F.lit(c.lo)) | (mx > F.lit(c.hi))
    raise AssertionError(c.op)


# ---------------------------------------------------------------------------
# Prefilter expression tree (query.go:66-125)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class PrefilterExpr:
    kind: str  # "PARTITION" | "MINMAX" | "AND" | "OR"
    condition: Optional[Condition] = None
    field: str = ""
    children: tuple["PrefilterExpr", ...] = ()


def Partition(condition: Condition) -> PrefilterExpr:
    return PrefilterExpr("PARTITION", condition=condition)


def MinMax(field: str, condition: Condition) -> PrefilterExpr:
    return PrefilterExpr("MINMAX", condition=condition, field=field)


def _flatten(kind: str, exprs: Sequence[PrefilterExpr]) -> tuple:
    out: list[PrefilterExpr] = []
    for e in exprs:
        if e.kind == kind and e.condition is None:
            out.extend(e.children)
        else:
            out.append(e)
    return tuple(out)


def PrefilterAnd(*exprs: PrefilterExpr) -> PrefilterExpr:
    return PrefilterExpr("AND", children=_flatten("AND", exprs))


def PrefilterOr(*exprs: PrefilterExpr) -> PrefilterExpr:
    return PrefilterExpr("OR", children=_flatten("OR", exprs))


def compile_prefilter(
    expr: Optional[PrefilterExpr],
    partition_col: str = "partition_id",
    minmax_min_col: str = "minmax_min",
    minmax_max_col: str = "minmax_max",
) -> Column:
    """Compile a prefilter tree to one Catalyst Column over manifest rows.

    Manifest block rows carry ``partition_id: string`` and two
    ``map<string,long>`` zone-map columns.  Strict semantics
    (query.go:403-422): a block with empty partition_id fails any partition
    condition; a block whose minmax map lacks the queried field fails that
    minmax condition.
    """
    if expr is None:
        return F.lit(True)
    if expr.kind == "PARTITION":
        pc = F.col(partition_col)
        has = pc.isNotNull() & (pc != F.lit(""))
        return has & _exact_condition_column(pc, expr.condition)
    if expr.kind == "MINMAX":
        mn = F.col(minmax_min_col).getItem(expr.field)
        mx = F.col(minmax_max_col).getItem(expr.field)
        has = mn.isNotNull() & mx.isNotNull()
        return has & _minmax_condition_column(mn, mx, expr.condition)
    if expr.kind == "AND":
        out = F.lit(True)  # empty AND -> true (query.go:394-397)
        for ch in expr.children:
            out = out & compile_prefilter(ch, partition_col, minmax_min_col, minmax_max_col)
        return out
    if expr.kind == "OR":
        out = F.lit(False)  # empty OR -> false (query.go:381-392)
        for ch in expr.children:
            out = out | compile_prefilter(ch, partition_col, minmax_min_col, minmax_max_col)
        return out
    raise AssertionError(expr.kind)


# ---------------------------------------------------------------------------
# Bloom expression tree (query.go:449-545)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BloomExpr:
    kind: str  # "FIELD" | "TOKEN" | "FIELD_TOKEN" | "AND" | "OR"
    field: str = ""
    token: str = ""
    children: tuple["BloomExpr", ...] = ()

    def conditions(self) -> list["BloomExpr"]:
        """All leaf conditions in the tree (for probe planning)."""
        if self.kind in ("AND", "OR"):
            out: list[BloomExpr] = []
            for ch in self.children:
                out.extend(ch.conditions())
            return out
        return [self]

    def probe_key(self) -> tuple[str, str]:
        """(which bloom filter, token string) for this leaf condition
        (evaluateBloomCondition, bloom_tree_engine.go:876-908)."""
        if self.kind == "FIELD":
            return ("field", self.field)
        if self.kind == "TOKEN":
            return ("token", self.token)
        if self.kind == "FIELD_TOKEN":
            return ("fieldtoken", f"{self.field}{FIELD_TOKEN_SEP}{self.token}")
        raise ValueError(f"not a leaf: {self.kind}")


def Field(name: str) -> BloomExpr:
    return BloomExpr("FIELD", field=name)


def Token(token: str) -> BloomExpr:
    return BloomExpr("TOKEN", token=token)


def FieldToken(name: str, token: str) -> BloomExpr:
    return BloomExpr("FIELD_TOKEN", field=name, token=token)


def _flatten_bloom(kind: str, exprs: Sequence[BloomExpr]) -> tuple:
    out: list[BloomExpr] = []
    for e in exprs:
        if e.kind == kind:
            out.extend(e.children)
        else:
            out.append(e)
    return tuple(out)


def And(*exprs: BloomExpr) -> BloomExpr:
    return BloomExpr("AND", children=_flatten_bloom("AND", exprs))


def Or(*exprs: BloomExpr) -> BloomExpr:
    return BloomExpr("OR", children=_flatten_bloom("OR", exprs))


# ---------------------------------------------------------------------------
# Regex expression tree + field-guard rewrite (query.go:547-663)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RegexExpr:
    kind: str  # "CONDITION" | "AND" | "OR"
    field: str = ""
    pattern: str = ""
    children: tuple["RegexExpr", ...] = ()


def FieldRegex(name: str, pattern: str) -> RegexExpr:
    return RegexExpr("CONDITION", field=name, pattern=pattern)


def _flatten_regex(kind: str, exprs: Sequence[RegexExpr]) -> tuple:
    out: list[RegexExpr] = []
    for e in exprs:
        if e.kind == kind:
            out.extend(e.children)
        else:
            out.append(e)
    return tuple(out)


def RegexAnd(*exprs: RegexExpr) -> RegexExpr:
    return RegexExpr("AND", children=_flatten_regex("AND", exprs))


def RegexOr(*exprs: RegexExpr) -> RegexExpr:
    return RegexExpr("OR", children=_flatten_regex("OR", exprs))


def regex_field_guard(expr: Optional[RegexExpr]) -> Optional[BloomExpr]:
    """Rewrite a regex tree to a same-shape bloom *field-existence* tree so
    the prune stages skip files/blocks lacking the regex'd fields
    (RegexFieldGuardBloomQuery, query.go:596-663; applied
    bloom_tree_engine.go:949, proven by bloom_tree_engine_test.go:1944-2028).
    """
    if expr is None:
        return None
    if expr.kind == "CONDITION":
        return Field(expr.field)
    children = tuple(
        g for g in (regex_field_guard(ch) for ch in expr.children) if g is not None
    )
    return BloomExpr(expr.kind, children=children)


def and_bloom(left: Optional[BloomExpr], right: Optional[BloomExpr]) -> Optional[BloomExpr]:
    """AND two optional bloom trees (AndBloomQueries, query.go:654-663)."""
    if left is None:
        return right
    if right is None:
        return left
    return And(left, right)


def validate_regexes(expr: Optional[RegexExpr]) -> None:
    """Compile every pattern once; invalid regex is a query error
    (bloom_tree_engine.go:944-947)."""
    import re

    if expr is None:
        return
    if expr.kind == "CONDITION":
        re.compile(expr.pattern)
        return
    for ch in expr.children:
        validate_regexes(ch)


# ---------------------------------------------------------------------------
# Query + fluent builder (query.go:666-778)
# ---------------------------------------------------------------------------


@dataclass
class Query:
    prefilter: Optional[PrefilterExpr] = None
    bloom: Optional[BloomExpr] = None
    regex: Optional[RegexExpr] = None

    def prune_bloom(self) -> Optional[BloomExpr]:
        """Bloom tree used for pruning = user bloom AND regex field guard
        (bloom_tree_engine.go:949)."""
        return and_bloom(self.bloom, regex_field_guard(self.regex))


class QueryBuilder:
    """Fluent builder: chained ``.field/.token/.field_token/.field_regex``
    are implicit-AND; ``.match(...)`` / ``.match_regex(...)`` set explicit
    trees and further chained calls AND onto them (query.go:692-778)."""

    def __init__(self) -> None:
        self._bloom_explicit = False
        self._implicit_bloom: list[BloomExpr] = []
        self._bloom: Optional[BloomExpr] = None
        self._regex_explicit = False
        self._implicit_regex: list[RegexExpr] = []
        self._regex: Optional[RegexExpr] = None
        self._prefilter: Optional[PrefilterExpr] = None

    def field(self, name: str) -> "QueryBuilder":
        return self._add_bloom(Field(name))

    def token(self, token: str) -> "QueryBuilder":
        return self._add_bloom(Token(token))

    def field_token(self, name: str, token: str) -> "QueryBuilder":
        return self._add_bloom(FieldToken(name, token))

    def match(self, expr: BloomExpr) -> "QueryBuilder":
        self._bloom_explicit = True
        self._implicit_bloom.clear()
        self._bloom = expr
        return self

    def field_regex(self, name: str, pattern: str) -> "QueryBuilder":
        return self._add_regex(FieldRegex(name, pattern))

    def match_regex(self, expr: RegexExpr) -> "QueryBuilder":
        self._regex_explicit = True
        self._implicit_regex.clear()
        self._regex = expr
        return self

    def match_prefilter(self, expr: PrefilterExpr) -> "QueryBuilder":
        self._prefilter = expr
        return self

    def _add_bloom(self, expr: BloomExpr) -> "QueryBuilder":
        if self._bloom_explicit:
            self._bloom = expr if self._bloom is None else And(self._bloom, expr)
        else:
            self._implicit_bloom.append(expr)
        return self

    def _add_regex(self, expr: RegexExpr) -> "QueryBuilder":
        if self._regex_explicit:
            self._regex = expr if self._regex is None else RegexAnd(self._regex, expr)
        else:
            self._implicit_regex.append(expr)
        return self

    def build(self) -> Query:
        bloom = self._bloom
        if not self._bloom_explicit and self._implicit_bloom:
            bloom = And(*self._implicit_bloom)
        regex = self._regex
        if not self._regex_explicit and self._implicit_regex:
            regex = RegexAnd(*self._implicit_regex)
        validate_regexes(regex)
        return Query(prefilter=self._prefilter, bloom=bloom, regex=regex)


def new_query() -> QueryBuilder:
    return QueryBuilder()
