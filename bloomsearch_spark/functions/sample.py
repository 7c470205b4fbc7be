"""Deterministic sampling / dataset-split operators for training-data
pipelines (r06 late).

The training-pipeline problem with ``rand()``/``TABLESAMPLE``: the sample
depends on the run (seed), the partitioning, and the engine — re-running
the pipeline, adding an executor, or auditing the split in another engine
all produce a DIFFERENT sample.  At 100 TB you want *content-addressed*
membership: a row's split/sample fate is a pure function of its KEY and a
salt string, so

- re-runs (and checkpoint resumes) reproduce the sample bit-for-bit,
- late-arriving rows of an incremental pipeline land in the same split
  their key always maps to (no train/test leakage across increments),
- any engine can audit membership (the oracle recomputes it in DuckDB).

Mechanics: ``md5(salt || '|' || key)`` is uniform over the 2^128 hex
space; a fraction ``f`` becomes the 32-digit hex threshold
``floor(f * 16^32)`` and membership is a plain LEXICOGRAPHIC string
compare — one Catalyst expression, zero shuffles, zero Python, identical
semantics in Spark and DuckDB (both emit lowercase-hex md5).  Weighted
splits are consecutive hex intervals (CASE over cumulative thresholds).

Scale shape: a narrow map over the corpus — no shuffle, no state, no
driver traffic; survives any repartitioning because membership never
looks at partition ids.  Stratified sampling salts the hash with the
stratum value, so each stratum is sampled from an independent hash space
(fraction applies per-stratum without a per-stratum count pass).

No reference analog (bloomsearch is an index, not a pipeline); the shape
follows the brief's training-data operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_DIGITS = 32  # md5 output length; the hash space is 16^32


def _threshold_hex(fraction: float) -> str:
    """The 32-digit lowercase-hex threshold t with
    P[md5 < t] == fraction (up to float's 53-bit resolution, ~1e-16
    relative — negligible against sampling variance at any corpus size)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    t = int(fraction * (16**HEX_DIGITS))
    t = min(t, 16**HEX_DIGITS)  # fraction == 1.0 admits everything
    if t >= 16**HEX_DIGITS:
        return "g"  # > every hex digit: lexicographically admits all
    return format(t, f"0{HEX_DIGITS}x")


def sample_hash(key: Column, salt: str = "") -> Column:
    """The membership hash: lowercase-hex md5 over ``salt|key`` (key cast
    to string).  NULL keys hash to NULL and are excluded by every
    comparison below — surface them upstream if they matter."""
    return F.md5(F.concat(F.lit(f"{salt}|"), key.cast("string")))


def sample_predicate(
    key: Column, fraction: float, salt: str = "", stratify_by: Column | None = None
) -> Column:
    """Boolean membership column for a deterministic ``fraction`` sample.

    ``stratify_by`` folds the stratum value into the salt, giving each
    stratum an independent hash space: the fraction applies within every
    stratum (balanced sampling) instead of merely in expectation over the
    whole corpus.
    """
    h = (
        sample_hash(key, salt)
        if stratify_by is None
        else F.md5(
            F.concat(
                F.lit(f"{salt}|"),
                stratify_by.cast("string"),
                F.lit("|"),
                key.cast("string"),
            )
        )
    )
    return h < F.lit(_threshold_hex(fraction))


def det_sample(
    df: DataFrame,
    key: str,
    fraction: float,
    salt: str = "",
    stratify_by: str | None = None,
) -> DataFrame:
    """Deterministic (reproducible, engine-portable) sample of ``df``:
    keeps every row whose key-hash falls below the fraction threshold.
    A pure Catalyst filter — pushes into the scan, never shuffles."""
    return df.filter(
        sample_predicate(
            F.col(key),
            fraction,
            salt,
            F.col(stratify_by) if stratify_by else None,
        )
    )


def split_column(
    key: Column, weights: dict[str, float], salt: str = ""
) -> Column:
    """CASE expression assigning each key one split label.

    ``weights`` maps label -> nonnegative weight (normalized to sum 1;
    insertion order fixes the hex intervals, so the same dict reproduces
    the same assignment forever).  The LAST label takes the ELSE branch,
    absorbing the sub-ULP rounding tail.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    if any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be nonnegative: {weights}")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError(f"weights must sum > 0: {weights}")
    labels = list(weights)
    h = sample_hash(key, salt)
    expr: Column | None = None
    cum = 0.0
    for label in labels[:-1]:
        cum += weights[label] / total
        cond = h < F.lit(_threshold_hex(cum))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(
            cond, F.lit(label)
        )
    last = F.lit(labels[-1])
    return last if expr is None else expr.otherwise(last)


def split_corpus(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Adds a deterministic train/val/test-style ``split_col`` label.

    Membership is a pure function of (salt, key): re-runs, resumes,
    repartitions and other engines all agree, and incremental appends
    can never leak a key across splits.
    """
    if split_col in df.columns:
        raise ValueError(
            f"column {split_col!r} already exists — pass split_col="
        )
    return df.withColumn(split_col, split_column(F.col(key), weights, salt))


def split_sql(key_sql: str, weights: dict[str, float], salt: str = "") -> str:
    """The ANSI-SQL twin of :func:`split_column` (same CASE over the same
    hex thresholds) — the audit/oracle form any engine with md5() runs."""
    if not weights:
        raise ValueError("weights must name at least one split")
    total = float(sum(weights.values()))
    labels = list(weights)
    parts = ["CASE"]
    cum = 0.0
    h = f"md5('{salt}|' || CAST({key_sql} AS VARCHAR))"
    for label in labels[:-1]:
        cum += weights[label] / total
        parts.append(f"WHEN {h} < '{_threshold_hex(cum)}' THEN '{label}'")
    parts.append(f"ELSE '{labels[-1]}' END")
    return " ".join(parts)


def sample_sql(
    key_sql: str, fraction: float, salt: str = "", stratify_sql: str | None = None
) -> str:
    """The ANSI-SQL twin of :func:`sample_predicate`."""
    if stratify_sql is None:
        h = f"md5('{salt}|' || CAST({key_sql} AS VARCHAR))"
    else:
        h = (
            f"md5('{salt}|' || CAST({stratify_sql} AS VARCHAR) || '|' || "
            f"CAST({key_sql} AS VARCHAR))"
        )
    return f"{h} < '{_threshold_hex(fraction)}'"
