"""CHECK constraints / expectations — write-path data quality gates.

The Delta ``ALTER TABLE ADD CONSTRAINT`` + DLT-expectations analog, the
data-quality surface a training-data pipeline needs: every ingest path
(``build_index`` overwrite/append, ``upsert_keys`` / CDC apply, the
streaming sinks built on them) evaluates the table's constraints against
the incoming rows in the SAME pass that stages them.

Semantics (SQL CHECK): a row VIOLATES a constraint only when its
expression evaluates to FALSE — NULL passes (unknown is not a violation;
pair with an explicit ``x IS NOT NULL`` to require presence).  Actions:

- ``fail``  — any violating row aborts the whole write BEFORE commit
  (Delta CHECK): the staged scratch is deleted, nothing becomes visible.
- ``drop``  — violating rows are filtered out and the count is recorded
  in the commit's meta (``constraint_violations``) — the DLT
  ``expect_or_drop`` expectation.
- ``warn``  — rows pass through; the count is recorded (DLT ``expect``).

Cost shape: enforcement is a Catalyst filter + an ``Observation`` of
per-constraint violation counts piggybacked on the build's own staging
job — ZERO extra scans of the source at any size.  Constraints live in
the manifest meta (``constraints`` key) and are carried by every commit;
appends inherit and enforce them automatically.

Zero-copy EXTERNAL indexes are not gated: their rows are pre-existing
source files the engine never writes — ``add_constraint`` still works
(and validates) there, but it documents an invariant rather than
enforcing new ingest (external overlays have no engine ingest path).

Reference analog: none (the Go engine ingests whatever it is handed);
this is the Delta-shaped quality gate its pipeline users expect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

VALID_ACTIONS = ("fail", "drop", "warn")


class ConstraintViolation(ValueError):
    """A ``fail``-action CHECK constraint matched violating rows: the
    write was aborted before commit (nothing became visible)."""


def normalize_constraints(constraints: dict | None) -> dict:
    """Canonical stored form: ``{name: {"expr": str, "action": str}}``.
    Accepts the shorthand ``{name: "sql expr"}`` (action=fail, the Delta
    CHECK default)."""
    out: dict = {}
    for name, c in (constraints or {}).items():
        if isinstance(c, str):
            c = {"expr": c, "action": "fail"}
        expr = c.get("expr")
        action = c.get("action", "fail")
        if not expr or not isinstance(expr, str):
            raise ValueError(f"constraint {name!r} needs a SQL 'expr'")
        if action not in VALID_ACTIONS:
            raise ValueError(
                f"constraint {name!r}: action {action!r} not in "
                f"{VALID_ACTIONS}"
            )
        out[str(name)] = {"expr": expr, "action": action}
    return out


def violation_pred(expr: str):
    """Violation = expression IS FALSE (NULL passes, SQL CHECK)."""
    e = F.expr(expr)
    return ~(e.isNull() | e.cast("boolean"))


def enforce_constraints(
    df: DataFrame, constraints: dict, observe: bool = True
) -> tuple[DataFrame, Observation | None]:
    """Attach per-constraint violation counters (one ``Observation`` on
    the frame — collected for free by whatever action consumes it) and
    filter out rows violating ``drop``/``fail`` constraints.  ``fail``
    rows are filtered too: the caller raises after the job, and the
    doomed staging should not waste bytes on them.

    ``observe=False`` returns the filtered frame WITHOUT counters — for
    side branches (e.g. a bounded key collect) whose partial action must
    not consume the Observation the staging job owns."""
    cons = normalize_constraints(constraints)
    if not cons:
        return df, None
    obs = None
    if observe:
        obs = Observation("bs_constraints")
        df = df.observe(
            obs,
            *[
                F.sum(F.when(violation_pred(c["expr"]), 1).otherwise(0))
                .cast("long")
                .alias(name)
                for name, c in cons.items()
            ],
        )
    keep = None
    for name, c in cons.items():
        if c["action"] in ("fail", "drop"):
            k = ~violation_pred(c["expr"])
            keep = k if keep is None else (keep & k)
    if keep is not None:
        df = df.filter(keep)
    return df, obs


def collect_violations(
    obs: Observation | None, constraints: dict
) -> dict[str, int]:
    """Per-constraint violation counts after the staging action ran.
    Returns only non-zero entries."""
    if obs is None:
        return {}
    got = obs.get
    return {k: int(v) for k, v in got.items() if v}


def raise_on_failures(violations: dict[str, int], constraints: dict) -> None:
    cons = normalize_constraints(constraints)
    failed = {
        n: c for n, c in violations.items()
        if cons.get(n, {}).get("action") == "fail"
    }
    if failed:
        detail = ", ".join(
            f"{n!r} ({c} rows; CHECK {cons[n]['expr']!r})"
            for n, c in sorted(failed.items())
        )
        raise ConstraintViolation(
            f"write aborted before commit — CHECK constraint(s) violated: "
            f"{detail}.  Nothing became visible; fix the rows or relax the "
            "constraint (drop_constraint / action='drop')"
        )
