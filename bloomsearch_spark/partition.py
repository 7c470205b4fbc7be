"""Hidden partitioning — Iceberg-style partition TRANSFORMS.

The reference's partition function is opaque user code
(``PartitionFunc``, bloom_tree_engine.go:101); our ``partition_expr``
is an arbitrary SQL expression — both put the burden of matching the
write-side layout on the QUERY author.  Declared transforms lift that:
``IndexConfig(partition_transform="bucket:16:repo")`` derives the
write-side ``partition_expr`` automatically AND lets read paths derive
partition pruning from ordinary predicates on the SOURCE column —
``WHERE repo = 'x'`` prunes to one bucket without the user ever naming a
partition (Iceberg's hidden-partitioning contract).

Each transform has two faces that MUST render identically:

- ``transform_sql``: the Catalyst expression the build evaluates per row;
- ``transform_value``: the Python twin applied to a pushed query literal.

Pruning is sound only when the two agree for the literal's type, so
``transform_value`` returns None (= do not prune, still exact: Spark /
the verify stage re-applies the predicate) for any value whose rendering
could diverge — floats (Catalyst scientific-notation casts), None, and
timezone-carrying instants under the time transforms.  Time transforms
bind timestamps to the SESSION TIMEZONE at build time; run queries under
the same timezone (DATE columns are timezone-free and always safe).

Transform spec grammar (one string, stored in the config / manifest):

    identity:<col>        partition id = cast(col as string)
    bucket:<N>:<col>      pmod(crc32(cast(col as string)), N)
    truncate:<W>:<col>    substring(cast(col as string), 1, W)
    years:<col> | months:<col> | days:<col> | hours:<col>
                          date_format(col, 'yyyy'[-MM[-dd[ HH]]])
"""

from __future__ import annotations

import datetime
import zlib

_TIME_FMT = {
    "years": ("yyyy", "%Y"),
    "months": ("yyyy-MM", "%Y-%m"),
    "days": ("yyyy-MM-dd", "%Y-%m-%d"),
    "hours": ("yyyy-MM-dd HH", "%Y-%m-%d %H"),
}


def parse_transform(spec: str) -> tuple[str, int | None, str]:
    """``spec`` -> (kind, param, source_column); raises on malformed specs."""
    parts = spec.split(":")
    kind = parts[0]
    if kind in ("identity", *_TIME_FMT) and len(parts) == 2 and parts[1]:
        return kind, None, parts[1]
    if kind in ("bucket", "truncate") and len(parts) == 3 and parts[2]:
        n = int(parts[1])
        if n <= 0:
            raise ValueError(f"partition_transform {spec!r}: param must be > 0")
        return kind, n, parts[2]
    raise ValueError(
        f"malformed partition_transform {spec!r} — expected identity:<col>, "
        "bucket:<N>:<col>, truncate:<W>:<col>, or years|months|days|hours:<col>"
    )


def transform_sql(spec: str) -> str:
    """Write-side Catalyst expression producing the partition id string."""
    kind, n, col = parse_transform(spec)
    if kind == "identity":
        return f"cast(`{col}` as string)"
    if kind == "bucket":
        return f"cast(pmod(crc32(cast(`{col}` as string)), {n}) as string)"
    if kind == "truncate":
        return f"substring(cast(`{col}` as string), 1, {n})"
    return f"date_format(`{col}`, '{_TIME_FMT[kind][0]}')"


def _render(v) -> str | None:
    """Python twin of Catalyst ``cast(v as string)`` for PROVABLY matching
    types only: str passes through, bool is true/false, ints render
    decimal.  Floats return None — Catalyst's double→string goes
    scientific where Python may not (the same reason the bloom pushdown
    whitelists types)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    if isinstance(v, int):
        return str(v)
    return None


def _time_id(kind: str, v) -> str:
    """Explicitly zero-padded time-partition id — the python twin of the
    write-side ``date_format(col, 'yyyy-...')``.  ``strftime('%Y')`` is NOT
    that twin: it renders year 999 as '999' where Catalyst emits '0999', so
    a pre-1000 date would derive a nonexistent partition id and the Eq
    prefilter would silently MISS matching rows (ADVICE r06)."""
    y = f"{v.year:04d}"
    if kind == "years":
        return y
    if kind == "months":
        return f"{y}-{v.month:02d}"
    if kind == "days":
        return f"{y}-{v.month:02d}-{v.day:02d}"
    # hours; plain dates render hour 00 like date_format on a date col
    return f"{y}-{v.month:02d}-{v.day:02d} {getattr(v, 'hour', 0):02d}"


def transform_value(spec: str, v) -> str | None:
    """Partition id the build assigned a row whose source column equals
    ``v`` — or None when not derivable for this value's type (caller must
    then skip pruning; exactness is preserved by the verify stage)."""
    if v is None:
        return None
    kind, n, _col = parse_transform(spec)
    if kind in _TIME_FMT:
        if isinstance(v, datetime.datetime):
            if v.tzinfo is not None:
                return None  # session-tz rendering not reproducible here
            return _time_id(kind, v)
        if isinstance(v, datetime.date):
            return _time_id(kind, v)
        return None
    s = _render(v)
    if s is None:
        return None
    if kind == "identity":
        return s
    if kind == "bucket":
        return str(zlib.crc32(s.encode("utf-8")) % n)
    return s[:n]  # truncate


def transform_range_value(spec: str, v) -> str | None:
    """Partition-id BOUND for range predicates — only for (transform, type)
    pairs where the rendering is ORDER-PRESERVING, i.e. source order implies
    lexicographic id order, so ``col > v`` soundly prunes to
    ``partition_id >= T(v)`` (and ``<`` to ``<= T(v)``):

    - identity / truncate over str (prefixing is monotone; ids compare as
      the strings themselves);
    - the time transforms over date / naive datetime (fixed-length
      zero-padded renderings, lexicographic == chronological).

    Everything else (bucket always; numeric identity/truncate — '10' < '9'
    lexicographically) returns None: no range pruning, still exact."""
    kind, _n, _col = parse_transform(spec)
    if kind in _TIME_FMT:
        return transform_value(spec, v)
    if kind in ("identity", "truncate") and isinstance(v, str):
        return transform_value(spec, v)
    return None


def partition_value(config_or_spec, v) -> str | None:
    """Public helper: the partition id for source-column value ``v`` under
    an index's declared transform — for building explicit ``Partition``
    prefilters in the library query API.  Accepts an IndexConfig or a raw
    spec string; returns None when the index has no declared transform or
    the value's type is not derivable."""
    spec = getattr(config_or_spec, "partition_transform", config_or_spec)
    if not spec:
        return None
    return transform_value(spec, v)
