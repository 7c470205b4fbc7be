"""Metadata-only aggregation — answer COUNT-shaped queries from the
manifest alone, ZERO data bytes read (the Delta Lake "metadata-only
query" analog; no reference counterpart — bloomsearch always scans the
surviving blocks, query.go only prunes).

Exactness model
---------------
A block-manifest row carries the block's EXACT ``row_count`` and its
EXACT ``partition_id`` (every row in the block has that partition value
by construction, plans/build.py W2).  A prefilter tree made only of
PARTITION conditions therefore decides every block *exactly*: either all
of its rows satisfy the partition predicate or none do.  Summing
``row_count`` over the surviving blocks — minus each block's
deletion-vector count (DV deltas are disjoint by construction,
sources/manifest.py DVS_SCHEMA, so the live deleted total per block is a
plain SUM) — is the exact answer to

    SELECT count(*) FROM <source> WHERE <partition predicate>

MINMAX conditions are *conservative* (zone-map overlap, Q4): a block can
overlap the range while holding zero matching rows, so they can prune
but never count.  ``metadata_count`` REFUSES trees containing a MINMAX
node rather than returning an upper bound that looks exact.  Bloom
conditions never appear in prefilter trees at all.

Strictness caveat (documented, matches search): a block with an empty
``partition_id`` (index built without ``partition_expr``) fails every
partition condition — the count equals what :func:`plans.search.search`
with the same prefilter would return, which for an unpartitioned index
under a partition predicate is zero.

100 TB shape: both functions are one pass over the (cached,
column-pruned) block manifest — O(blocks) manifest rows, never a data
byte; the DV join is manifest-sized on both sides.  At 10^7 blocks that
is a few hundred MB of manifest vs ~100 TB of data: the whole point.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..query import PrefilterExpr, compile_prefilter
from ..sources.manifest import BloomIndex


def _refuse_inexact(expr: Optional[PrefilterExpr]) -> None:
    """MINMAX nodes are conservative (overlap, not membership) — a count
    through one would silently be an upper bound.  Refuse loudly."""
    if expr is None:
        return
    if expr.kind == "MINMAX":
        raise ValueError(
            f"metadata_count is exact only for PARTITION prefilters; the "
            f"tree contains a MINMAX condition on {expr.field!r} — zone "
            "maps are conservative (a block can overlap the range with "
            "zero matching rows), so a metadata-only count through one "
            "would be an upper bound, not an answer.  Run search() and "
            "count the result, or drop the MINMAX condition"
        )
    for ch in expr.children:
        _refuse_inexact(ch)


def _net_rows(index: BloomIndex, blocks: DataFrame) -> DataFrame:
    """(block rows) -> per-block live row counts, netting DV deletions."""
    live = blocks.select("block_id", "row_count")
    dvs = index.dvs()
    if dvs is None:
        return live.select("block_id", F.col("row_count").alias("live_rows"))
    per_block = dvs.groupBy("block_id").agg(F.sum("dv_count").alias("_dv"))
    return live.join(per_block, "block_id", "left").select(
        "block_id",
        (F.col("row_count") - F.coalesce(F.col("_dv"), F.lit(0))).alias(
            "live_rows"
        ),
    )


def metadata_count(
    index: BloomIndex, prefilter: Optional[PrefilterExpr] = None
) -> DataFrame:
    """Exact ``SELECT count(*) WHERE <partition predicate>`` from the
    manifest alone — one row ``(cnt long)``, zero data reads.

    ``prefilter=None`` counts the whole index (net of deletion vectors) —
    the ``SELECT count(*) FROM t`` fast path.
    """
    _refuse_inexact(prefilter)
    surviving = index.blocks().filter(compile_prefilter(prefilter))
    return _net_rows(index, surviving).agg(
        F.coalesce(F.sum("live_rows"), F.lit(0)).cast("long").alias("cnt")
    )


def partition_stats(
    index: BloomIndex, prefilter: Optional[PrefilterExpr] = None
) -> DataFrame:
    """``SHOW PARTITIONS`` with teeth: per-partition exact live row count
    and block count, from the manifest alone — ``(partition_id string,
    n_blocks long, n_rows long)``.  Same exactness rules as
    :func:`metadata_count` (PARTITION-only prefilter, DV-netted)."""
    _refuse_inexact(prefilter)
    surviving = index.blocks().filter(compile_prefilter(prefilter))
    net = _net_rows(index, surviving)
    return (
        surviving.select("block_id", "partition_id")
        .join(net, "block_id")
        .groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum("live_rows").cast("long").alias("n_rows"),
        )
    )


def describe_detail(index: BloomIndex) -> DataFrame:
    """``DESCRIBE DETAIL`` analog: one row of table-level metadata from the
    manifest alone — zero data bytes read.

    Columns mirror Delta's detail surface where meaningful: format /
    location / version / created_at, exact num_files / num_blocks /
    num_rows (DV-netted) / size_bytes, the layout declaration
    (partition_expr + declared transform, indexed/minmax fields), and the
    health counters operators page on (manifest segment count per table,
    DV segment count + masked-row total, analyzed-column list, constraint
    names, schema-evolution/external/clone flags).
    """
    meta = index.meta()
    cfg = meta.get("config") or {}
    agg = (
        index.blocks()
        .agg(
            F.countDistinct("file_id").alias("nf"),
            F.count(F.lit(1)).alias("nb"),
            F.coalesce(F.sum("byte_size"), F.lit(0)).alias("bytes"),
        )
        .first()
    )
    n_rows = metadata_count(index).first().cnt
    dvs = index.dvs()
    dv_rows = (
        int(dvs.agg(F.coalesce(F.sum("dv_count"), F.lit(0))).first()[0])
        if dvs is not None
        else 0
    )
    refs = index.table_refs()
    constraints = sorted((meta.get("constraints") or {}).keys())
    # analyzed columns come from the colstats TABLE, not a meta key — the
    # stats survive later commits via ref carry, so this stays truthful
    # (emitted under logical names when a column mapping is active)
    cs = index.colstats()
    if cs is None:
        analyzed = []
    else:
        inv = {p: l for l, p in index.column_mapping().items()}
        analyzed = sorted(
            inv.get(r.column, r.column)
            for r in cs.select("column").distinct().collect()
        )
    row = {
        "format": "bloomsearch",
        "location": index.root,
        "version": int(index.version[1:]),
        "created_at": float(meta.get("created_at") or 0.0),
        "num_files": int(agg.nf),
        "num_blocks": int(agg.nb),
        "num_rows": int(n_rows),
        "size_bytes": int(agg.bytes),
        "partition_expr": cfg.get("partition_expr") or "",
        "partition_transform": cfg.get("partition_transform"),
        "indexed_fields": list(cfg.get("indexed_fields") or ()),
        "minmax_fields": list(cfg.get("minmax_fields") or ()),
        "n_segments": sum(len(v) for v in refs.values()),
        "n_dv_segments": len(index.dvs_refs()),
        "dv_masked_rows": dv_rows,
        "analyzed_columns": analyzed,
        "constraints": constraints,
        "external": bool(meta.get("external", False)),
        "shallow_clone": bool(meta.get("data_dir_override")),
        "last_stream_batch": (
            int(meta["last_stream_batch"])
            if meta.get("last_stream_batch") is not None
            else None
        ),
    }
    schema = (
        "format string, location string, version long, created_at double, "
        "num_files long, num_blocks long, num_rows long, size_bytes long, "
        "partition_expr string, partition_transform string, "
        "indexed_fields array<string>, minmax_fields array<string>, "
        "n_segments long, n_dv_segments long, dv_masked_rows long, "
        "analyzed_columns array<string>, constraints array<string>, "
        "external boolean, shallow_clone boolean, last_stream_batch long"
    )
    return index.spark.createDataFrame([tuple(row.values())], schema).withColumn(
        "created_at", F.timestamp_seconds(F.col("created_at"))
    )


def metadata_bounds(
    index: BloomIndex,
    columns: list[str] | None = None,
    prefilter: Optional[PrefilterExpr] = None,
) -> DataFrame:
    """Column value BOUNDS from the zone maps alone — zero data bytes:
    ``(column, lower_bound long, upper_bound long, n_blocks long)`` with
    the guarantee ``lower_bound <= min(col) AND max(col) <= upper_bound``
    over the live rows of the surviving blocks.

    These are conservative OUTER bounds, not exact answers, and the op
    says so in its name: zone maps floor/ceil float values, survive
    row-deleting rewrites un-tightened (delete_where keeps the old maps —
    re-tightened only by a zorder/rebuild), and include DV-masked rows.
    On a freshly built index over integer columns they ARE the exact
    min/max (asserted by the oracle entry); after mutations they remain
    sound for planning (range sizing, partition layout checks) — the
    exact answer needs a scan.

    ``columns`` default to every minmax-indexed column; logical names in,
    logical names out (zone-map keys are physical).  PARTITION-only
    prefilters scope the block set exactly (same rule as
    :func:`metadata_count`); blocks without a map entry for a column
    (all-null or pre-evolution) contribute nothing, matching SQL MIN/MAX
    null-skipping.
    """
    _refuse_inexact(prefilter)
    cfg_fields = list(index.config.minmax_fields or ())
    m = index.column_mapping()
    inv = {p: l for l, p in m.items()}
    if columns is None:
        phys = cfg_fields
    else:
        phys = []
        for c in columns:
            pc_ = m.get(c, c) if m else c
            if pc_ not in cfg_fields:
                raise ValueError(
                    f"metadata_bounds: {c!r} is not a minmax-indexed column "
                    f"(minmax_fields = {cfg_fields})"
                )
            phys.append(pc_)
    surviving = index.blocks().filter(compile_prefilter(prefilter))
    per_col = None
    for pc_ in phys:
        one = surviving.select(
            F.lit(pc_).alias("column"),
            F.element_at(F.col("minmax_min"), pc_).alias("_mn"),
            F.element_at(F.col("minmax_max"), pc_).alias("_mx"),
        ).filter(F.col("_mn").isNotNull())
        per_col = one if per_col is None else per_col.unionByName(one)
    if per_col is None:
        raise ValueError("metadata_bounds: no minmax-indexed columns")
    out = per_col.groupBy("column").agg(
        F.min("_mn").cast("long").alias("lower_bound"),
        F.max("_mx").cast("long").alias("upper_bound"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
    )
    if inv:
        mapdf = index.spark.createDataFrame(
            [(p, l) for p, l in inv.items()], "column string, logical string"
        )
        out = (
            out.join(F.broadcast(mapdf), "column", "left")
            .withColumn("column", F.coalesce("logical", "column"))
            .drop("logical")
        )
    return out
