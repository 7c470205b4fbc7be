"""Merge / compaction plan — M1-M9 of SURVEY.md §2.3, Spark-first.

The reference merge (``merge``, bloom_tree_engine.go:1206-1372) compacts
many small files into fewer large ones: group files with identical bloom
params (identifyFileMergeGroups :1490-1588), OR their file-level blooms
(:1401-1423), merge compatible data blocks by streaming row copy
(:1830-1917), then atomically swap the metastore and tombstone old blobs
(:1341-1352).

Our rebuild splits that into two independently-usable operators, both of
which commit a new manifest version atomically (readers never see a
partial state):

- **metadata-only file merge** (the common case): file-level blooms with
  equal (m, k) OR together distributively — ``groupBy(new_file_id).
  applyInPandas`` over the *files manifest* (1 row per file, so this
  touches no row data at all).  Block rows are re-pointed to the merged
  file_id; their ``data_path`` keeps referencing the original block
  directory, so **zero bytes of row data move** — strictly cheaper than
  the reference's byte-copy (copyDataBlock :1762-1786).
- **block consolidation** (``compact_blocks``): small blocks of the same
  (partition, bloom params) whose combined rows fit ``max_block_rows``
  are rewritten into one block directory; their block blooms merge by
  bitwise OR (M4) and minmax maps union-widen (M5) — no re-tokenization,
  unlike the reference's row-streaming re-index.

Plus ``expire_blocks`` (M9, TTL/prefilter-based expiry), ``vacuum`` (M8
tombstoning: delete block dirs no longer referenced by CURRENT), and the
manifest's own maintenance: ``fold_manifest`` (compact the delta-segment
lists appends accumulate) and ``vacuum_manifest`` (reclaim unreachable
version/segment/staging dirs).

Scale notes: merge *planning* runs per param-group on executors
(``_plan_mapping_df`` — the driver never materializes the manifest);
merge *execution* is distributed grouped-maps over manifest rows and,
for consolidation only, over the affected block data.  Both paths
shuffle manifest rows, never the indexed dataset.  Maintenance commits
publish with ``expected=`` their snapshot version: a concurrent commit
(e.g. a streaming append) surfaces as ``CommitConflict`` — reload and
re-run the op; never retry blindly (the plan was computed from a
superseded manifest).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import bloom
from ..sources import fs as fsx
from ..sources import manifest as mf
from ..sources.manifest import BloomIndex

# restore's pre-flight existence sweep runs driver-side (threaded stats,
# zero Spark jobs) up to this many block dirs; bigger manifests keep the
# distributed mapInPandas check
RESTORE_DRIVER_CHECK_MAX = 20_000


@dataclass
class MergeStats:
    """Counters mirroring the reference MergeStats (bloom_tree_engine.go:1355-1371)."""

    files_before: int = 0
    files_after: int = 0
    groups_merged: int = 0
    blocks_before: int = 0
    blocks_after: int = 0
    blocks_rewritten: int = 0


# ---------------------------------------------------------------------------
# M2: merge-group selection (driver-side over the small files manifest)
# ---------------------------------------------------------------------------


def plan_file_merge(
    files_pdf: pd.DataFrame,
    max_blocks_per_file: int,
    max_files_per_merge: int = 10,
    max_file_bytes: int | None = None,
) -> dict[str, str]:
    """Greedy packing of mergeable files -> {old_file_id: merged_file_id}.

    Mergeable = identical (partition_id, expected_items, fpr) — the bloom
    param equality gate of identifyFileMergeGroups
    (bloom_tree_engine.go:1490-1588); smallest files first (file_id
    tiebreak, so the plan is deterministic for any input row order); a
    group closes at ``max_blocks_per_file`` blocks, ``max_files_per_merge``
    members, or ``max_file_bytes`` combined data bytes (MaxFileSize,
    :1520-1533).  Only groups with >= 2 members merge.

    Pure pandas: ``merge_files`` runs it PER PARAM-GROUP inside an
    applyInPandas (driver never holds the manifest); unit/property tests
    call it whole-frame.  Merged ids are prefixed by the group's first
    member (unique across groups), so per-call counters need no global
    coordination.
    """
    mapping: dict[str, str] = {}
    if files_pdf.empty:
        return mapping
    has_bytes = "byte_size" in files_pdf.columns
    # ONE sort + ONE pass with group-change detection (no per-group pandas
    # slicing — 15k tiny groups cost ~2-3 ms each through groupby/itertuples
    # machinery, dominating 10^6-row frames)
    srt = files_pdf.sort_values(
        ["partition_id", "expected_items", "fpr", "block_count", "file_id"]
    )
    members: list[str] = []
    blocks = nbytes = gi = 0
    prev_key = object()

    def _close():
        nonlocal gi
        if len(members) >= 2:
            gi += 1
            tgt = f"{members[0]}-m{gi}"
            for m in members:
                mapping[m] = tgt
        members.clear()

    for row in srt.itertuples(index=False):
        key = (row.partition_id, row.expected_items, row.fpr)
        if key != prev_key:
            # per-GROUP counter: merged ids stay unique via the members[0]
            # prefix, and the plan is independent of group order
            _close()
            blocks = nbytes = gi = 0
            prev_key = key
        row_bytes = int(row.byte_size) if has_bytes else 0
        if members and (
            blocks + row.block_count > max_blocks_per_file
            or len(members) >= max_files_per_merge
            or (max_file_bytes is not None and nbytes + row_bytes > max_file_bytes)
        ):
            _close()
            blocks = nbytes = 0
        members.append(row.file_id)
        blocks += int(row.block_count)
        nbytes += row_bytes
    _close()
    return mapping


def _merge_file_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map: OR one merged file's member file-rows together (M4/M5)."""
    (file_id,) = key
    mn_map: dict[str, int] = {}
    mx_map: dict[str, int] = {}
    for m in pdf["minmax_min"]:
        for f, v in (m or {}).items():
            mn_map[f] = min(mn_map.get(f, v), v)
    for m in pdf["minmax_max"]:
        for f, v in (m or {}).items():
            mx_map[f] = max(mx_map.get(f, v), v)
    return pd.DataFrame(
        [
            {
                "file_id": file_id,
                "partition_id": pdf["partition_id"].iloc[0],
                "block_count": int(pdf["block_count"].sum()),
                "row_count": int(pdf["row_count"].sum()),
                "token_count": int(pdf["token_count"].sum()),
                "byte_size": int(pdf["byte_size"].sum()),
                "minmax_min": mn_map,
                "minmax_max": mx_map,
                "expected_items": int(pdf["expected_items"].iloc[0]),
                "fpr": float(pdf["fpr"].iloc[0]),
                "field_bloom": bloom.merge_serialized(list(pdf["field_bloom"])),
                "token_bloom": bloom.merge_serialized(list(pdf["token_bloom"])),
                "fieldtoken_bloom": bloom.merge_serialized(list(pdf["fieldtoken_bloom"])),
            }
        ]
    )


def _plan_mapping_df(
    df: DataFrame, group_cols: list[str], plan_fn, out_cols: str, **kwargs
) -> DataFrame:
    """Run a greedy packing planner PER merge-candidate group on executors
    (applyInPandas) and return the (old_id -> new_id) mapping as a
    DataFrame.  Groups are independent by construction (a file/block is
    mergeable only within its param group), so distributing the planning
    preserves the exact whole-frame output while bounding memory to the
    largest single group's SCALAR columns — the driver never materializes
    the manifest (VERDICT r02 item 6; at 10^8 blocks the old whole-manifest
    toPandas was ~10 GB on the driver)."""
    old_c, new_c = [c.strip() for c in out_cols.split(",")]

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        m = plan_fn(pdf, **kwargs)
        return pd.DataFrame({old_c: list(m.keys()), new_c: list(m.values())})

    return df.groupBy(*group_cols).applyInPandas(
        fn, f"{old_c} string, {new_c} string"
    )


# ---------------------------------------------------------------------------
# M1: merge driver
# ---------------------------------------------------------------------------


def _retry_conflicts(spark, index: BloomIndex, conflict_retries: int, run):
    """Optimistic-concurrency loop for maintenance ops: ``run(index)``
    plans AND commits from its snapshot; on CommitConflict (something —
    e.g. a streaming append — committed meanwhile) the op is RE-PLANNED
    from the freshly loaded version, never blindly re-published.  Bounded
    retries; the last conflict propagates."""
    while True:
        try:
            return run(index)
        except mf.CommitConflict:
            if conflict_retries <= 0:
                raise
            conflict_retries -= 1
            index = BloomIndex.load(spark, index.root)


def merge_files(
    spark: SparkSession,
    index: BloomIndex,
    max_blocks_per_file: int = 64,
    max_files_per_merge: int = 10,
    max_file_bytes: int | None = None,
    conflict_retries: int = 0,
) -> tuple[BloomIndex, MergeStats]:
    """Metadata-only file compaction: fewer, larger logical files; zero
    data movement.  Commits and returns a new manifest version.

    Files with differing bloom params are left untouched (the reference's
    unmergeable case, bloom_tree_engine_test.go:986-1246).

    ``conflict_retries``: re-plan + retry this many times when a
    concurrent commit (streaming append, another maintenance op) wins the
    race (CommitConflict)."""
    if conflict_retries:
        return _retry_conflicts(
            spark, index, conflict_retries,
            lambda ix: merge_files(
                spark, ix, max_blocks_per_file, max_files_per_merge,
                max_file_bytes, conflict_retries=0,
            ),
        )
    stats = MergeStats()
    files = index.files()
    blocks = index.blocks()
    stats.files_before = _manifest_count(index, "files")
    stats.blocks_before = stats.blocks_after = _manifest_count(index, "blocks")

    # plan per param-group on executors; the mapping (scalar pairs, already
    # far smaller than the manifest) is reused by two joins + two counts
    map_df = _plan_mapping_df(
        files.select(
            "file_id", "partition_id", "block_count", "byte_size",
            "expected_items", "fpr",
        ),
        ["partition_id", "expected_items", "fpr"],
        plan_file_merge,
        "file_id, new_file_id",
        max_blocks_per_file=max_blocks_per_file,
        max_files_per_merge=max_files_per_merge,
        max_file_bytes=max_file_bytes,
    ).persist()
    n_mapped = map_df.count()
    if n_mapped == 0:
        map_df.unpersist()
        stats.files_after = stats.files_before
        return index, stats
    stats.groups_merged = map_df.select("new_file_id").distinct().count()

    # the repoint joins the bitset-heavy manifest against the (id -> id)
    # mapping: broadcast the mapping when it is small (the common case) so
    # the multi-MB bloom columns never shuffle; above the threshold fall
    # back to a shuffle join (an unconditional broadcast would be
    # driver-unbounded — ADVICE r03)
    map_side = F.broadcast(map_df) if n_mapped <= 1_000_000 else map_df

    def repoint(df: DataFrame) -> DataFrame:
        return (
            df.join(map_side, "file_id", "left")
            .withColumn("file_id", F.coalesce("new_file_id", "file_id"))
            .drop("new_file_id")
        )

    new_blocks = repoint(blocks)
    new_files = repoint(files).groupBy("file_id").applyInPandas(
        _merge_file_group, mf.FILES_SCHEMA
    )
    out = _commit(
        spark, index, new_blocks, new_files, op="merge", stats=stats
    )
    map_df.unpersist()
    return out


# ---------------------------------------------------------------------------
# Block consolidation (data rewrite; M3/M7 analog)
# ---------------------------------------------------------------------------


def plan_block_merge(
    blocks_pdf: pd.DataFrame, max_block_rows: int
) -> dict[str, str]:
    """Greedy per-(file, partition, params) packing of small blocks whose
    combined rows fit ``max_block_rows`` (dataBlocksAreMergeable,
    bloom_tree_engine.go:1374-1399) -> {old_block_id: merged_block_id}."""
    mapping: dict[str, str] = {}
    if blocks_pdf.empty:
        return mapping
    # one sort + one pass (see plan_file_merge)
    srt = blocks_pdf.sort_values(
        ["file_id", "partition_id", "expected_items", "fpr", "row_count", "block_id"]
    )
    members: list[str] = []
    rows = gi = 0
    prev_key = object()

    def _close():
        nonlocal gi
        if len(members) >= 2:
            gi += 1
            tgt = f"{members[0]}-c{gi}"
            for m in members:
                mapping[m] = tgt
        members.clear()

    for row in srt.itertuples(index=False):
        key = (row.file_id, row.partition_id, row.expected_items, row.fpr)
        if key != prev_key:
            _close()
            rows = gi = 0
            prev_key = key
        if members and rows + row.row_count > max_block_rows:
            _close()
            rows = 0
        members.append(row.block_id)
        rows += int(row.row_count)
    _close()
    return mapping


def _make_consolidate_fn(data_dir: str, codec_kw: dict):
    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        block_id = key[0]
        if len(pdf) == 1:  # singleton group: pass the manifest row through
            # (its deletion vector, if any, still applies — the commit
            # carries the dvs refs and the block keeps its id/data_path)
            return pdf.drop(columns=["merge_block_id", "dv_positions"])
        file_id = pdf["file_id"].iloc[0]
        rel = fsx.join(f"file_id={file_id}", f"block_id={block_id}")
        import numpy as np
        import pyarrow as pa

        def _read_masked(p, pos):
            t = fsx.read_parquet_dir(fsx.join(data_dir, p))
            # deletion-vector purge: a consolidated block materializes
            # only LIVE rows (merge-on-read becomes copy-on-write here),
            # and its fresh block_id detaches the old mask
            if pos is not None and len(pos):
                m = np.ones(len(t), dtype=bool)
                m[np.asarray(pos, dtype=np.int64)] = False
                t = t.filter(pa.array(m))
            return t

        tbl = pa.concat_tables(
            [
                _read_masked(p, pos)
                for p, pos in zip(pdf["data_path"], pdf["dv_positions"])
            ],
            promote_options="default",
        )
        if len(tbl) == 0:  # every member row was DV-deleted: drop the block
            return pdf.iloc[0:0].drop(columns=["merge_block_id", "dv_positions"])
        byte_size = fsx.write_parquet_atomic(
            fsx.join(data_dir, rel), tbl, "part-0.parquet", **codec_kw
        )

        mn_map: dict[str, int] = {}
        mx_map: dict[str, int] = {}
        for m in pdf["minmax_min"]:
            for f, v in (m or {}).items():
                mn_map[f] = min(mn_map.get(f, v), v)
        for m in pdf["minmax_max"]:
            for f, v in (m or {}).items():
                mx_map[f] = max(mx_map.get(f, v), v)
        return pd.DataFrame(
            [
                {
                    "file_id": file_id,
                    "block_id": block_id,
                    "partition_id": pdf["partition_id"].iloc[0],
                    "data_path": rel,
                    "row_count": int(len(tbl)),
                    "token_count": int(pdf["token_count"].sum()),
                    "byte_size": byte_size,
                    "minmax_min": mn_map,
                    "minmax_max": mx_map,
                    "expected_items": int(pdf["expected_items"].iloc[0]),
                    "fpr": float(pdf["fpr"].iloc[0]),
                    "field_bloom": bloom.merge_serialized(list(pdf["field_bloom"])),
                    "token_bloom": bloom.merge_serialized(list(pdf["token_bloom"])),
                    "fieldtoken_bloom": bloom.merge_serialized(
                        list(pdf["fieldtoken_bloom"])
                    ),
                }
            ]
        )

    return fn


def compact_blocks(
    spark: SparkSession,
    index: BloomIndex,
    max_block_rows: int | None = None,
    conflict_retries: int = 0,
    where=None,
) -> tuple[BloomIndex, MergeStats]:
    """Rewrite undersized sibling blocks into consolidated block dirs.

    Block blooms OR together (M4) and minmax maps widen (M5) — no
    re-tokenization; only the affected blocks' row data is read/written.
    File-level rows are unchanged (their blooms already cover the union).

    ``where`` (a :class:`PrefilterExpr` — Partition/MinMax trees, the
    same objects queries prune with) SCOPES the candidate set (the
    ``OPTIMIZE ... WHERE`` analog): only matching blocks may join a
    merge group, everything else passes through verbatim — at 100 TB
    maintenance targets the hot partitions, never the whole table.
    """
    if conflict_retries:
        return _retry_conflicts(
            spark, index, conflict_retries,
            lambda ix: compact_blocks(spark, ix, max_block_rows, 0, where),
        )
    cfg = index.config
    if index.meta().get("external", False):
        raise ValueError(
            "compact_blocks rewrites block data and is not applicable to a "
            "zero-copy external index; use merge_files (metadata-only)"
        )
    _refuse_shallow_clone(index, "compact_blocks")
    target = max_block_rows or cfg.max_block_rows
    stats = MergeStats()
    blocks = index.blocks()
    stats.blocks_before = _manifest_count(index, "blocks")
    stats.files_before = stats.files_after = _manifest_count(index, "files")

    cand = blocks
    if where is not None:
        from ..query import compile_prefilter
        from .colmap import _map_prefilter

        if index.column_mapping():
            where = _map_prefilter(where, index.to_physical)
        cand = blocks.filter(compile_prefilter(where))
    # plan per (file, partition, params) group on executors — driver never
    # holds the block manifest (bounded at any block count)
    map_df = _plan_mapping_df(
        cand.select(
            "file_id", "block_id", "partition_id", "row_count",
            "expected_items", "fpr",
        ),
        ["file_id", "partition_id", "expected_items", "fpr"],
        plan_block_merge,
        "block_id, merged",
        max_block_rows=target,
    ).persist()
    stats.blocks_rewritten = map_df.count()
    if stats.blocks_rewritten == 0:
        map_df.unpersist()
        stats.blocks_after = stats.blocks_before
        return index, stats
    stats.groups_merged = map_df.select("merged").distinct().count()

    # small mapping (common): broadcast so block bitsets don't shuffle
    map_side = (
        F.broadcast(map_df) if stats.blocks_rewritten <= 1_000_000 else map_df
    )
    staged = (
        blocks.join(map_side, "block_id", "left")
        .withColumn("merge_block_id", F.coalesce("merged", "block_id"))
        .drop("merged")
    )
    # deletion-vector masks ride the plan as a per-block positions array:
    # consolidation purges DV'd rows physically (and the merged block's
    # fresh id detaches the old mask); singletons keep their carried ref
    dv_agg = index.dv_agg()
    if dv_agg is not None:
        staged = staged.join(dv_agg, "data_path", "left")
    else:
        staged = staged.withColumn(
            "dv_positions", F.lit(None).cast("array<long>")
        )
    from .build import codec_kwargs

    new_blocks = staged.groupBy("merge_block_id").applyInPandas(
        _make_consolidate_fn(index.data_dir, codec_kwargs(cfg)), mf.BLOCKS_SCHEMA
    )
    out = _commit(spark, index, new_blocks, index.files(), op="compact", stats=stats)
    map_df.unpersist()
    return out


# ---------------------------------------------------------------------------
# M9: TTL / predicate expiry
# ---------------------------------------------------------------------------


def expire_blocks(
    spark: SparkSession, index: BloomIndex, expired: Column,
    conflict_retries: int = 0,
) -> tuple[BloomIndex, MergeStats]:
    """Drop blocks matching ``expired`` (a Column over block-manifest rows,
    e.g. a minmax/partition predicate — README.md:283-287).  File rows with
    no remaining blocks are dropped; partially-expired files keep their
    (now conservative, still sound) blooms — bloom filters only disqualify.
    """
    if conflict_retries:
        return _retry_conflicts(
            spark, index, conflict_retries,
            lambda ix: expire_blocks(spark, ix, expired, 0),
        )
    stats = MergeStats()
    blocks = index.blocks()
    stats.blocks_before = _manifest_count(index, "blocks")
    stats.files_before = _manifest_count(index, "files")
    # null predicate result (e.g. a minmax key the block lacks) must NOT
    # expire the block — expiry is opt-in, pruning is conservative
    new_blocks = blocks.filter(~F.coalesce(expired, F.lit(False)))
    live_files = new_blocks.select("file_id").distinct()
    new_files = index.files().join(F.broadcast(live_files), "file_id", "left_semi")
    return _commit(spark, index, new_blocks, new_files, op="expire", stats=stats)




def _refuse_shallow_clone(index: BloomIndex, op: str) -> None:
    if index.meta().get("data_dir_override"):
        raise ValueError(
            f"{op} writes or deletes block data and is not applicable to a "
            "SHALLOW CLONE — its block dirs belong to the source root "
            "(mutating them would corrupt the source; writing new ones "
            "would orphan on the source's vacuum).  Deep-clone first "
            "(clone(..., shallow=False)) or run the op on the source.  "
            "Metadata-only ops (merge_files, expire_blocks, fold_manifest, "
            "vacuum_manifest, restore) remain available."
        )


# ---------------------------------------------------------------------------
# OPTIMIZE ZORDER (r06): layout rewrite for tight zone maps
# ---------------------------------------------------------------------------


def zorder_column(df: DataFrame, cols: list[str], bits: int = 8):
    """Z-order (Morton) key over ``cols`` as a pure-Catalyst Column.

    Each column is bucketed into 2^bits rank buckets via
    ``width_bucket`` against its approxQuantile boundaries (KB-scale
    driver work, one pass over the data), then the bucket ids' bits are
    interleaved — standard Morton encoding, whole-stage-codegen all the
    way (shiftleft/bitwiseOR over int64; bits × len(cols) must fit 63).
    NULLs land in bucket 0 (co-located, never scattered)."""
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed int64")
    n_b = (1 << bits) - 1
    bucket_cols = []
    for c in cols:
        qs = [i / n_b for i in range(1, n_b + 1)]
        bounds = df.select(F.col(c).cast("double").alias("v")).approxQuantile(
            "v", qs, 0.001
        )
        # strictly increasing boundaries (width_bucket requires it);
        # collapse duplicates from low-cardinality columns
        uniq: list[float] = []
        for b in bounds:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        # bucket = #boundaries below the value: one JVM-side lambda pass
        # over the literal boundary array (Spark's width_bucket is the
        # 4-arg UNIFORM version — useless for rank buckets).  The cast
        # re-evaluates per element (Catalyst lambda semantics) but it is
        # a scalar numeric cast, not the shingles-bug class of cost.
        # NULL values compare null -> excluded -> bucket 0 (co-located).
        bounds_arr = F.array(*[F.lit(float(b)) for b in uniq])

        def _below(col_name):
            # factory, NOT a default-arg closure: a 2-arity lambda would
            # make pyspark pass the (element, index) pair
            return lambda t: F.col(col_name).cast("double") > t

        bucket_cols.append(
            F.coalesce(
                F.size(F.filter(bounds_arr, _below(c))),
                F.lit(0),
            ).cast("long")
        )
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for ci, bc in enumerate(bucket_cols):
            pos = bit * len(cols) + ci
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bc, bit).bitwiseAND(F.lit(1)), pos
                )
            )
    return z


def optimize_zorder(
    spark: SparkSession,
    index: BloomIndex,
    cols: list[str],
    bits: int = 8,
    conflict_retries: int = 0,
    where=None,
) -> tuple[BloomIndex, DeleteStats]:
    """Rewrite the index's physical layout Z-ORDERED by ``cols`` (the
    ``OPTIMIZE ... ZORDER BY`` analog): same rows, new blocks whose zone
    maps are TIGHT on every z-ordered column, so minmax prefilters on
    any of them prune to ~the matching block range instead of scanning
    blocks whose [min,max] spans the whole domain (the multi-column
    generalization of sorting; a plain sort would tighten only its
    leading column).

    Mechanics: one pass computes per-column rank-bucket boundaries
    (approxQuantile, KB-scale driver state), the Morton key is a pure
    Catalyst expression, and the rows flow ``repartitionByRange(z) →
    sortWithinPartitions(z) →`` the SAME zero-shuffle flush kernel as
    build_index — exactly ONE data shuffle for the whole rewrite, the
    theoretical minimum for a global re-clustering.  Commits through the
    maintenance protocol (op="zorder"); to the changefeed it is a
    reorganization like merge/compact — rows unchanged, nothing emitted.
    Blooms and row contents are rebuilt from the rows themselves, so
    queries are bit-identical before and after (hash-proven by the
    ``bs_zorder`` oracle).  ``cols`` should be (a subset of) the
    config's ``minmax_fields`` — tightening zone maps nobody probes
    buys nothing.

    ``where`` (a :class:`PrefilterExpr`) SCOPES the rewrite (the
    ``OPTIMIZE ... WHERE ... ZORDER BY`` analog): only matching blocks
    are re-clustered — their rows shuffle, everything else passes
    through verbatim with zero writes.  At 100 TB re-clustering runs
    per hot partition on a schedule, never the whole table; the
    z-boundaries are computed from the SCOPED rows, so each partition
    gets its own tight bucketing.  Scoped rewrites CARRY the
    deletion-vector refs (untouched blocks may be masked; the rewritten
    blocks' refs orphan harmlessly) — only the full rewrite drops them.
    """
    if conflict_retries:
        return _retry_conflicts(
            spark, index, conflict_retries,
            lambda ix: optimize_zorder(spark, ix, cols, bits, 0, where),
        )
    if index.meta().get("external", False):
        raise ValueError("optimize_zorder rewrites block data; external "
                         "indexes are zero-copy — rebuild instead")
    _refuse_shallow_clone(index, "optimize_zorder")
    from .build import STAGING_SCHEMA, _make_map_build_fn
    from .colmap import _map_prefilter
    from .search import scan_blocks

    if index.column_mapping():
        cols = [index.to_physical(c) for c in cols]
        where = _map_prefilter(where, index.to_physical)

    cfg = index.config
    stats = DeleteStats()
    blocks = index.blocks()
    stats.blocks_before = _manifest_count(index, "blocks")
    stats.files_before = _manifest_count(index, "files")

    scoped, untouched = blocks, None
    if where is not None:
        from ..query import compile_prefilter

        scoped = blocks.filter(compile_prefilter(where)).persist()
        n_scoped = scoped.count()
        if n_scoped == 0:  # nothing in scope: no empty commit
            scoped.unpersist()
            stats.blocks_after = stats.blocks_before
            stats.files_after = stats.files_before
            return index, stats
        untouched = blocks.join(
            scoped.select("block_id"), "block_id", "left_anti"
        )
    source_columns = index.meta().get("source_columns") or []
    rows = scan_blocks(index, scoped).select(*source_columns)
    n_rows = int(
        scoped.agg(F.sum("row_count").alias("n")).collect()[0]["n"] or 0
    )
    per_task = max(1, cfg.max_block_rows * cfg.blocks_per_file)
    n_parts = max(1, -(-n_rows // per_task))
    z = zorder_column(rows, cols, bits=bits)
    ordered = (
        rows.withColumn("_bs_z", z)
        .repartitionByRange(n_parts, "_bs_z")
        .sortWithinPartitions("_bs_z")
        .drop("_bs_z")
    )
    d = ordered.withColumn(
        "partition_id",
        F.coalesce(F.expr(cfg.partition_expr).cast("string"), F.lit("")),
    )
    if cfg.sha_col:
        d = d.withColumn(
            "content_sha", F.sha2(F.col(cfg.sha_col).cast("string"), 256)
        )
    version_guess, _ = mf.next_version_dir(index.root)
    tag = f"{version_guess}-z{uuid.uuid4().hex[:8]}"
    scratch = mf.staging_root(index.root, tag)
    staging = fsx.join(scratch, "staging.parquet")
    (
        d.mapInArrow(
            _make_map_build_fn(cfg, fsx.join(index.root, "data"), tag),
            STAGING_SCHEMA,
        )
        .write.mode("overwrite")
        .parquet(staging)
    )
    st = spark.read.parquet(staging)
    new_blocks = st.filter(F.col("block_id").isNotNull()).select(
        "file_id", "block_id", "partition_id", "data_path", "row_count",
        "token_count", "byte_size", "minmax_min", "minmax_max",
        "expected_items", "fpr", "field_bloom", "token_bloom",
        "fieldtoken_bloom",
    )
    new_files = st.filter(F.col("block_id").isNull()).select(
        "file_id", "partition_id", "block_count", "row_count", "token_count",
        "byte_size", "minmax_min", "minmax_max",
        F.col("file_expected_items").alias("expected_items"),
        F.col("file_fpr").alias("fpr"),
        F.col("file_field_bloom").alias("field_bloom"),
        F.col("file_token_bloom").alias("token_bloom"),
        F.col("file_fieldtoken_bloom").alias("fieldtoken_bloom"),
    )
    if untouched is not None:
        # scoped rewrite: out-of-scope blocks pass through verbatim; a
        # file row survives while ANY of its blocks does (its bloom
        # over-covers the rewritten-away blocks — conservative, sound)
        cols14 = [f.name for f in new_blocks.schema.fields]
        new_blocks = new_blocks.unionByName(untouched.select(*cols14))
        live_files = untouched.select("file_id").distinct()
        new_files = new_files.unionByName(
            index.files().join(F.broadcast(live_files), "file_id", "left_semi")
        )
        stats.blocks_rewritten = n_scoped
    else:
        stats.blocks_rewritten = stats.blocks_before
    # a FULL rewrite rebuilds every block from a DV-MASKED scan: deleted
    # rows are physically gone, so the DV refs must NOT carry (they index
    # positions of the dead layout).  A SCOPED rewrite keeps out-of-scope
    # blocks alive — their masks must carry (the rewritten blocks' refs
    # orphan harmlessly; fold cleans them).
    out = _commit(
        spark, index, new_blocks, new_files, op="zorder", stats=stats,
        carry_dvs=untouched is not None,
    )
    if untouched is not None:
        scoped.unpersist()
    fsx.delete_dir(scratch)
    return out


# ---------------------------------------------------------------------------
# Row-level predicate DELETE (Delta DELETE analog, r06)
# ---------------------------------------------------------------------------


@dataclass
class DeleteStats:
    """Counters for :func:`delete_where` (``numDeletedRows`` /
    ``numRemovedFiles`` / ``numAddedFiles`` in Delta's DELETE metrics)."""

    files_before: int = 0
    files_after: int = 0
    blocks_before: int = 0
    blocks_after: int = 0
    candidate_blocks: int = 0
    blocks_rewritten: int = 0
    blocks_dropped: int = 0
    rows_deleted: int = 0
    dv_blocks: int = 0  # blocks that gained a deletion-vector delta


_DELETE_PLAN_SCHEMA = (
    "file_id string, block_id string, new_block_id string, "
    "new_data_path string, new_rows long, new_bytes long, n_deleted long"
)


def _manifest_count(index: BloomIndex, name: str) -> int:
    """Manifest-table row count WITHOUT a Spark job: parquet footer sums
    (exact — segments are immutable, one row per block/file).  Falls back
    to a ``count()`` job only when the driver cannot read the root through
    pyarrow.  The mutation ops (delete/upsert/restore/dv) take their
    before/after stats through this, shaving 2-4 manifest-scan jobs per
    commit off the driver-latency path (guide §5: the driver should do
    almost no data work — these counts are O(segment footers))."""
    n = index.table_rows(name)
    if n is not None:
        return n
    df = index.files() if name == "files" else index.blocks()
    return df.count()


def _make_delete_fn(data_dir: str, codec_kw: dict, nonce: str, drop_cols: tuple):
    import pyarrow as _pa

    plan_pa_schema = _pa.schema(
        [
            ("file_id", _pa.string()), ("block_id", _pa.string()),
            ("new_block_id", _pa.string()), ("new_data_path", _pa.string()),
            ("new_rows", _pa.int64()), ("new_bytes", _pa.int64()),
            ("n_deleted", _pa.int64()),
        ]
    )

    def fn(key, tbl):
        import pyarrow as pa
        import pyarrow.compute as pc

        fid, bid = key[0], key[1]
        mask = pc.fill_null(tbl.column("_bs_del"), False)
        n_del = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
        row = {
            "file_id": fid, "block_id": bid, "new_block_id": None,
            "new_data_path": None, "new_rows": None, "new_bytes": None,
            "n_deleted": int(n_del),
        }
        if n_del:
            kept = tbl.filter(pc.invert(mask)).drop_columns(list(drop_cols))
            if len(kept):
                # the dir MUST follow file_id=<fid>/block_id=<bid> with
                # the MANIFEST ids — scan_blocks' huge-survivor path
                # reconstructs data_path from the hive dirs
                new_bid = f"{bid}-{nonce}"
                rel = fsx.join(f"file_id={fid}", f"block_id={new_bid}")
                size = fsx.write_parquet_atomic(
                    fsx.join(data_dir, rel), kept, "part-0.parquet", **codec_kw
                )
                row.update(
                    new_block_id=new_bid, new_data_path=rel,
                    new_rows=len(kept), new_bytes=int(size),
                )
            else:
                row.update(new_rows=0)  # fully deleted: drop the block
        return pa.Table.from_pylist([row], schema=plan_pa_schema)

    return fn


def delete_where(
    spark: SparkSession,
    index: BloomIndex,
    query,
    conflict_retries: int = 0,
    use_deletion_vectors: bool = False,
) -> tuple[BloomIndex, DeleteStats]:
    """Delete every row matching ``query`` (the same :class:`Query` object
    ``search`` takes — the ``DELETE FROM ... WHERE`` analog), by rewriting
    only the blocks that actually contain matches.

    Scale shape: the bloom hierarchy prunes to candidate blocks first, so
    only data proportional to the match surface is read; one shuffle
    groups CANDIDATE rows by block (each group bounded by
    ``max_block_rows``); blocks where the exact verify matches nothing
    pass through untouched (original dir, zero writes), fully-matched
    blocks are dropped from the manifest, and partially-matched blocks
    are rewritten under a fresh block dir (immutable dirs — time travel
    and lagging changefeed consumers keep reading the old one until
    vacuum).  Rewritten blocks KEEP their blooms/zone maps: both only
    ever over-approximate (blooms disqualify, minmax widens), so pruning
    stays sound and deletion costs no re-tokenization; a later
    ``compact_blocks``/rebuild re-tightens them.

    Commits via the maintenance protocol (``expected=`` snapshot,
    ``CommitConflict`` on interleaved commits, ``conflict_retries`` to
    re-plan).  A match-nothing delete commits NOTHING and returns the
    input handle.  To a changefeed the commit is delete-the-old-block +
    insert-the-rewritten-block events (``change_events`` required
    mid-feed — apply deletes first); plain feeds refuse, same as
    expire/overwrite.  Reference analog: the Go engine has TTL/partition
    expiry only (bloom_tree_engine.go:1374+); row-level predicate delete
    is the Delta-shaped surface its training-pipeline users expect.

    ``use_deletion_vectors=True`` switches to MERGE-ON-READ (the Delta
    deletion-vector analog): instead of rewriting matched blocks, the
    commit records the matched row POSITIONS as an inline manifest delta
    (``dvs`` table, ``sources/manifest.py::DVS_SCHEMA``) that every read
    path masks out.  Cost shape: the commit writes O(matched positions)
    manifest bytes and ZERO data bytes — at 100 TB a selective delete is
    metadata-speed instead of match-surface-rewrite-speed; reads pay one
    small anti-join until a later ``compact_blocks`` /
    ``optimize_zorder`` purges the masks physically.  DV deletes also
    work on SHALLOW CLONES (the mask lives in the clone's manifest;
    source bytes untouched) — the one row-level mutation a zero-copy
    fork supports.
    """
    if conflict_retries:
        return _retry_conflicts(
            spark, index, conflict_retries,
            lambda ix: delete_where(spark, ix, query, 0, use_deletion_vectors),
        )
    if index.meta().get("external", False):
        raise ValueError(
            "delete_where rewrites block data and is not applicable to a "
            "zero-copy external index (the source files are not ours to "
            "rewrite); use expire_blocks for block-granular expiry"
        )
    from .colmap import translate_query

    query = translate_query(index, query)  # logical -> physical names
    if use_deletion_vectors:
        return _delete_where_dv(spark, index, query)
    _refuse_shallow_clone(index, "delete_where")
    from .search import prune_blocks, scan_blocks

    stats = DeleteStats()
    blocks = index.blocks()
    stats.blocks_before = _manifest_count(index, "blocks")
    stats.files_before = _manifest_count(index, "files")

    surviving = prune_blocks(index, query)
    data = scan_blocks(index, surviving)
    pred = _delete_pred(index, data, query)

    marked = data.select(
        *[c for c in data.columns if c != "data_path"]
    ).withColumn("_bs_del", pred)
    plan = _rewrite_plan(index, marked).persist()
    _rewrite_stats(plan, stats)
    if stats.rows_deleted == 0:
        plan.unpersist()
        stats.blocks_after = stats.blocks_before
        stats.files_after = stats.files_before
        return index, stats
    new_blocks = _apply_rewrites(blocks, plan, stats.candidate_blocks)
    live_files = new_blocks.select("file_id").distinct()
    new_files = index.files().join(F.broadcast(live_files), "file_id", "left_semi")
    out = _commit(spark, index, new_blocks, new_files, op="delete", stats=stats)
    plan.unpersist()
    return out


def _delete_pred(index: BloomIndex, data: DataFrame, query) -> Column:
    """EXACT row-match predicate for ``query`` over a candidate scan — the
    same truth stage search uses (Catalyst expressions; the pandas twin
    for schemaless json_col indexes)."""
    from ..operators.verify import (
        compile_bloom_verify,
        compile_regex_verify,
        json_verify_udf,
    )
    from ..tokenizer import get_tokenizer

    cfg = index.config
    tok = get_tokenizer(cfg.tokenizer)
    if cfg.json_col is not None:
        return json_verify_udf(query.bloom, query.regex, tok)(F.col(cfg.json_col))
    cols = data.columns
    return compile_bloom_verify(query.bloom, cfg.indexed_fields, cols, tok) & (
        compile_regex_verify(query.regex, cols)
    )


def _delete_where_dv(
    spark: SparkSession, index: BloomIndex, query
) -> tuple[BloomIndex, DeleteStats]:
    """Merge-on-read DELETE (``delete_where(use_deletion_vectors=True)``):
    record matched row POSITIONS as a disjoint ``dvs`` manifest delta
    instead of rewriting blocks.

    Plan shape: the same bloom-pruned candidate scan as the rewrite path,
    read WITH file positions (``_metadata.row_index``) and with existing
    DV masks applied — so an already-deleted position can never re-match,
    which is what makes the deltas disjoint and their union the live
    mask.  One manifest-sized aggregation groups matched positions per
    block; the commit references the parent's blocks/files segments
    verbatim and appends ONE dvs segment + a lineage delta — zero data
    bytes move at any table size."""
    from .search import prune_blocks, scan_blocks

    stats = DeleteStats()
    blocks = index.blocks()
    stats.blocks_before = stats.blocks_after = _manifest_count(index, "blocks")
    stats.files_before = stats.files_after = _manifest_count(index, "files")

    surviving = prune_blocks(index, query)
    data = scan_blocks(index, surviving, with_pos=True)
    if "block_id" not in data.columns:
        return index, stats  # fully-empty index: nothing can match
    pred = _delete_pred(index, data, query)
    matched = data.filter(pred).select("block_id", "_bs_pos", "_bs_fname")

    version_guess, _ = mf.next_version_dir(index.root)
    seg_name = f"{version_guess}-delete_dv-{uuid.uuid4().hex[:8]}"
    seg_dir = mf.segment_dir(index.root, seg_name)
    nd, nb = _mint_dv_delta(
        index, matched, version_guess, seg_dir, op="delete_dv"
    )
    stats.rows_deleted = nd
    stats.dv_blocks = stats.candidate_blocks = nb
    if nd == 0:
        return index, stats

    # commit-with-REBASE loop: a dv delta is pure metadata, so most races
    # don't require the full CommitConflict re-plan (re-prune + re-scan) —
    # see _rebase_dv_delta for the soundness rule.  An un-rebasable race
    # (a rewrite moved our rows) re-raises for the caller's
    # conflict_retries re-plan.
    base, cur_seg = index, seg_name
    for _ in range(6):
        meta = base.meta()
        refs = base.table_refs()
        prev_dvs = base.dvs_refs()

        def finalize(
            prev_version: str | None,
            _refs=refs, _dvs=prev_dvs, _meta=meta, _seg=cur_seg, _base=base,
        ) -> str:
            version = mf.version_after(prev_version)
            tables = {
                "blocks": list(_refs["blocks"]),
                "files": list(_refs["files"]),
                "lineage": list(_refs["lineage"])
                + [mf.segment_ref(_seg, "lineage")],
                "dvs": list(_dvs) + [mf.segment_ref(_seg, "dvs")],
            }
            if _base.colstats_refs():
                tables["colstats"] = _base.colstats_refs()
            mf.write_meta(
                fsx.join(index.root, "manifest", version),
                index.config,
                extra={
                    "build_id": version,
                    "source_desc": f"delete_dv of {_base.version}",
                    "parent_version": _base.version,
                    "tables": tables,
                    **mf.carried_meta(_meta),
                },
            )
            return version

        try:
            v = mf.publish_commit(
                index.root, finalize, expected=base.version
            )
            return mf.BloomIndex(spark, index.root, v), stats
        except mf.CommitConflict:
            fresh = mf.BloomIndex.load(spark, index.root)
            rb = _rebase_dv_delta(spark, base, fresh, cur_seg)
            if rb is None:
                raise  # un-rebasable: outer conflict_retries re-plans
            cur_seg, nd2, nb2 = rb
            stats.rows_deleted, stats.dv_blocks = nd2, nb2
            stats.candidate_blocks = nb2
            if nd2 == 0:
                # every position we matched was deleted by the racers:
                # our delete's effect is already present
                return fresh, stats
            base = fresh
    raise mf.CommitConflict(
        f"dv delete at {index.root} lost {6} consecutive commit races; "
        "re-plan from CURRENT (conflict_retries) or reduce writer fan-in"
    )


def _rebase_dv_delta(
    spark: SparkSession, base: BloomIndex, fresh: BloomIndex, seg_name: str
):
    """Re-target an already-minted dv delta (planned against ``base``) at
    ``fresh`` after losing a commit race — WITHOUT re-scanning data.

    Sound iff every masked block is still live in ``fresh`` under the
    SAME data dir: then the matched rows still sit at the same
    file-relative positions, and the race was an append / a disjoint or
    overlapping dv delete / a metadata-only merge.  Overlap with dvs
    segments the racers added is SUBTRACTED (serializing our delete
    after theirs), preserving the disjoint-deltas invariant.  Any
    rewrite/expire/restore/fold that touched our blocks (dir moved, ref
    list rewritten) returns None — positions may have been remapped, the
    caller must re-plan from scratch.  This is snapshot-isolation
    serialization: rows appended by the racers are NOT re-matched (our
    delete serializes before the append), exactly the rewrite path's
    re-plan-free contract under Delta-style WriteSerializable.

    Returns ``(new_seg_name, rows_deleted, dv_blocks)`` with a fresh
    segment written (the old one becomes vacuum-reclaimable garbage), or
    None when un-rebasable."""
    base_dvs = set(base.dvs_refs())
    fresh_dvs = fresh.dvs_refs()
    if base_dvs - set(fresh_dvs):
        return None  # fold/restore rewrote the dvs ref list wholesale
    mdir = fsx.join(base.root, "manifest")
    delta = spark.read.schema(mf.DVS_SCHEMA).parquet(
        fsx.join(mf.segment_dir(base.root, seg_name), "dvs.parquet")
    )
    live = fresh.blocks().select("block_id", F.col("data_path").alias("_dp"))
    moved = (
        delta.join(live, "block_id", "left")
        .filter(F.col("_dp").isNull() | (F.col("_dp") != F.col("data_path")))
        .limit(1)
        .count()
    )
    if moved:
        return None
    added = [r for r in fresh_dvs if r not in base_dvs]
    mine = delta.select(
        "block_id", "data_path", F.explode("positions").alias("_bs_pos")
    )
    if added:
        theirs = (
            spark.read.schema(mf.DVS_SCHEMA)
            .parquet(*[fsx.join(mdir, r) for r in added])
            .select("block_id", F.explode("positions").alias("_bs_pos"))
        )
        mine = mine.join(theirs, ["block_id", "_bs_pos"], "left_anti")
    matched = mine.select(
        "block_id", "_bs_pos", F.lit(None).cast("string").alias("_bs_fname")
    )
    version_guess, _ = mf.next_version_dir(base.root)
    new_seg = f"{version_guess}-delete_dv-{uuid.uuid4().hex[:8]}"
    nd, nb = _mint_dv_delta(
        fresh, matched, version_guess,
        mf.segment_dir(base.root, new_seg), op="delete_dv",
    )
    return new_seg, nd, nb


def _mint_dv_delta(
    index: BloomIndex,
    matched: DataFrame,
    version_guess: str,
    seg_dir: str,
    op: str,
) -> tuple[int, int]:
    """Aggregate matched ``(block_id, _bs_pos, _bs_fname)`` rows into ONE
    deletion-vector delta segment (``dvs.parquet`` + the op's
    ``lineage.parquet`` rows under ``seg_dir``) — shared by the dv delete
    and the dv upsert.  Returns ``(rows_deleted, dv_blocks)``; writes
    nothing when no row matched.

    ``matched`` must come from a MASKED scan (``scan_blocks(...,
    with_pos=True)``), which is what makes deltas disjoint: an
    already-deleted position can never re-match, so a block's live mask
    is the plain union of its rows across segments."""
    blocks = index.blocks()
    plan = (
        matched.groupBy("block_id")
        .agg(
            F.sort_array(F.collect_list("_bs_pos")).alias("positions"),
            F.count(F.lit(1)).cast("long").alias("dv_count"),
            F.count_distinct("_bs_fname").alias("n_files"),
        )
        # true data_path from the manifest — NOT reconstructed from the
        # hive ids: after a metadata-only merge a block's dir keeps its
        # ORIGINAL file_id in the path
        .join(blocks.select("block_id", "file_id", "partition_id", "data_path"),
              "block_id")
        .persist()
    )
    try:
        agg = plan.agg(
            F.sum("dv_count").alias("nd"),
            F.count(F.lit(1)).alias("nb"),
            F.max("n_files").alias("nf"),
        ).collect()[0]
        nd, nb = int(agg["nd"] or 0), int(agg["nb"] or 0)
        if nd == 0:
            return 0, 0
        if int(agg["nf"] or 0) > 1:
            raise RuntimeError(
                "deletion vectors index file-relative row positions and "
                "require single-part block dirs; a block dir with multiple "
                "parquet parts was found — engine-written blocks are always "
                "single-part, so this index was modified out-of-band.  Use "
                "the rewrite path (use_deletion_vectors=False)"
            )
        # both segment tables project the PERSISTED plan — two independent
        # manifest-sized jobs, submitted concurrently (guide §2.6), same
        # discipline as _commit's blocks∥files writes
        from concurrent.futures import ThreadPoolExecutor

        def _w_dvs():
            plan.select(
                "block_id", "data_path", "positions", "dv_count"
            ).write.mode("overwrite").parquet(fsx.join(seg_dir, "dvs.parquet"))

        def _w_lin():
            plan.select(
                F.lit(version_guess).alias("build_id"),
                "file_id",
                "block_id",
                "partition_id",
                F.lit(op).alias("source_desc"),
                (-F.col("dv_count")).cast("long").alias("rows_indexed"),
                F.lit(0).cast("long").alias("tokens_inserted"),
                F.lit(op).alias("op"),
                F.lit(time.time()).alias("committed_at"),
            ).write.mode("overwrite").parquet(fsx.join(seg_dir, "lineage.parquet"))

        with ThreadPoolExecutor(max_workers=2) as ex:
            fd, fl = ex.submit(_w_dvs), ex.submit(_w_lin)
            fd.result(), fl.result()
        return nd, nb
    finally:
        plan.unpersist()


def _commit_table_property(
    spark: SparkSession, index: BloomIndex, updates: dict, op: str
) -> BloomIndex:
    """Metadata-only table-property commit: every parent segment is
    referenced verbatim (zero data/manifest-row bytes), only the named
    meta keys change.  A falsy update value REMOVES the key."""
    meta = index.meta()
    refs = index.table_refs()

    def finalize(prev_version: str | None) -> str:
        version = mf.version_after(prev_version)
        extra = {
            "build_id": version,
            "source_desc": f"{op} of {index.version}",
            "parent_version": index.version,
            "tables": {t: list(rs) for t, rs in refs.items()},
            **{
                k: meta[k]
                for k in (
                    "source_columns", "source_schema", "uniform_params",
                    "external", "data_dir_override",
                )
                if meta.get(k) is not None
            },
            **mf.carried_meta(meta, for_append=True),
        }
        for k, v in updates.items():
            if v:
                extra[k] = v
            else:
                extra.pop(k, None)
        mf.write_meta(
            fsx.join(index.root, "manifest", version), index.config,
            extra=extra,
        )
        return version

    v = mf.publish_commit(index.root, finalize, expected=index.version)
    return mf.BloomIndex(spark, index.root, v)


def add_constraint(
    spark: SparkSession,
    index: BloomIndex,
    name: str,
    expr: str,
    action: str = "fail",
    validate: bool = True,
    conflict_retries: int = 0,
) -> BloomIndex:
    """Add a CHECK constraint (``ALTER TABLE ADD CONSTRAINT`` analog —
    see ``operators/constraints.py`` for semantics/actions).  Every later
    ingest (append, upsert, CDC apply, streaming) enforces it in the
    staging pass.  ``validate=True`` (fail-action only, the Delta
    contract) first proves the EXISTING rows satisfy the expression —
    one bounded scan (``limit(1)`` on violations; Catalyst stops early) —
    so a committed fail constraint is a table-wide invariant, not just a
    forward gate.  Metadata-only commit; works on shallow clones."""
    from ..operators.constraints import (
        ConstraintViolation,
        normalize_constraints,
        violation_pred,
    )

    if conflict_retries:
        return _retry_conflicts(
            spark, index, conflict_retries,
            lambda ix: add_constraint(spark, ix, name, expr, action,
                                      validate, 0),
        )
    cons = dict(normalize_constraints(index.meta().get("constraints")))
    if name in cons:
        raise ValueError(
            f"constraint {name!r} already exists (CHECK "
            f"{cons[name]['expr']!r}); drop_constraint first"
        )
    new = normalize_constraints({name: {"expr": expr, "action": action}})
    if validate and new[name]["action"] == "fail":
        from .search import scan_blocks

        bad = (
            scan_blocks(index, index.blocks())
            .filter(violation_pred(expr))
            .limit(1)
            .count()
        )
        if bad:
            raise ConstraintViolation(
                f"cannot add CHECK constraint {name!r}: existing rows "
                f"violate {expr!r} — delete/fix them first, or add it "
                "with action='drop'/'warn' (forward-only gate)"
            )
    cons.update(new)
    return _commit_table_property(
        spark, index, {"constraints": cons}, f"add_constraint {name}"
    )


def drop_constraint(
    spark: SparkSession,
    index: BloomIndex,
    name: str,
    conflict_retries: int = 0,
) -> BloomIndex:
    """Remove a CHECK constraint (``ALTER TABLE DROP CONSTRAINT``
    analog).  Metadata-only commit."""
    from ..operators.constraints import normalize_constraints

    if conflict_retries:
        return _retry_conflicts(
            spark, index, conflict_retries,
            lambda ix: drop_constraint(spark, ix, name, 0),
        )
    cons = dict(normalize_constraints(index.meta().get("constraints")))
    if name not in cons:
        raise ValueError(
            f"no constraint named {name!r}; have {sorted(cons)}"
        )
    cons.pop(name)
    return _commit_table_property(
        spark, index, {"constraints": cons}, f"drop_constraint {name}"
    )


def purge_deletion_vectors(
    spark: SparkSession,
    index: BloomIndex,
    conflict_retries: int = 0,
) -> tuple[BloomIndex, DeleteStats]:
    """Rewrite ONLY the blocks that carry deletion vectors, materializing
    their live rows under fresh immutable dirs and dropping every ``dvs``
    ref (the Delta ``REORG TABLE ... APPLY (PURGE)`` analog) — targeted
    merge-on-read -> copy-on-write conversion.

    Why a dedicated op: ``compact_blocks`` purges only blocks small
    enough to join a merge group and ``optimize_zorder`` rewrites the
    WHOLE table — a full-sized block whose mask has grown heavy is
    reached by neither.  Cost shape: reads/writes exactly the DV'd
    blocks' bytes (bounded by mask spread, never table size); untouched
    blocks pass through verbatim.  Blooms/zone maps are carried
    (conservative supersets — pruning stays sound); a fully-masked block
    drops from the manifest.  To the changefeed the commit is a
    reorganization (rows unchanged — the purged rows were already dead
    at the previous version): nothing is emitted, plain feeds pass.
    Shallow clones refuse (their block dirs belong to the source); run
    the purge on the source or deep-clone first."""
    from .search import scan_blocks

    if conflict_retries:
        return _retry_conflicts(
            spark, index, conflict_retries,
            lambda ix: purge_deletion_vectors(spark, ix, 0),
        )
    stats = DeleteStats()
    blocks = index.blocks()
    stats.blocks_before = _manifest_count(index, "blocks")
    stats.files_before = stats.files_after = _manifest_count(index, "files")
    dv = index.dv_positions()
    if dv is None:
        stats.blocks_after = stats.blocks_before
        return index, stats
    _refuse_shallow_clone(index, "purge_deletion_vectors")

    surviving = blocks.join(
        dv.select("data_path").distinct(), "data_path", "left_semi"
    )
    # UNMASKED scan with positions: the rewrite kernel subtracts the dead
    # rows itself (``_bs_del`` = position is in the block's mask), so the
    # written block = live rows exactly — same kernel, same dir-nonce
    # race-safety as delete_where's rewrite path
    data = scan_blocks(index, surviving, with_pos=True, mask=False)
    dead = dv.select("block_id", "_bs_pos").withColumn("_bs_del", F.lit(True))
    marked = (
        data.join(dead, ["block_id", "_bs_pos"], "left")
        .withColumn("_bs_del", F.coalesce("_bs_del", F.lit(False)))
        .drop("_bs_pos", "_bs_fname", "data_path")
    )
    plan = _rewrite_plan(index, marked).persist()
    _rewrite_stats(plan, stats)
    if stats.rows_deleted == 0:  # orphan-only masks: nothing to purge
        plan.unpersist()
        stats.blocks_after = stats.blocks_before
        return index, stats
    new_blocks = _apply_rewrites(blocks, plan, stats.candidate_blocks)
    live_files = new_blocks.select("file_id").distinct()
    new_files = index.files().join(F.broadcast(live_files), "file_id", "left_semi")
    out = _commit(
        spark, index, new_blocks, new_files, op="purge_dv", stats=stats,
        carry_dvs=False,
    )
    plan.unpersist()
    return out


def _rewrite_plan(index: BloomIndex, marked: DataFrame) -> DataFrame:
    """Shared block-rewrite kernel (delete_where / upsert_keys):
    ``marked`` = candidate scan rows + a boolean ``_bs_del`` column (+ the
    hive file_id/block_id); groups by block and rewrites blocks with
    matches under fresh immutable dirs (per-attempt nonce: racing
    committers never write the same dir — the loser's dirs are
    vacuum-reclaimable orphans)."""
    from .build import codec_kwargs

    nonce = f"d{uuid.uuid4().hex[:8]}"
    return marked.groupBy("file_id", "block_id").applyInArrow(
        _make_delete_fn(
            index.data_dir, codec_kwargs(index.config), nonce,
            ("_bs_del", "file_id", "block_id"),
        ),
        _DELETE_PLAN_SCHEMA,
    )


def _rewrite_stats(plan: DataFrame, stats: "DeleteStats") -> None:
    agg = plan.agg(
        F.count("*").alias("cand"),
        F.sum("n_deleted").alias("deleted"),
        F.sum((F.col("n_deleted") > 0).cast("long")).alias("touched"),
        F.sum(
            ((F.col("n_deleted") > 0) & F.col("new_data_path").isNotNull()).cast("long")
        ).alias("rewritten"),
    ).collect()[0]
    stats.candidate_blocks = int(agg["cand"] or 0)
    stats.rows_deleted = int(agg["deleted"] or 0)
    stats.blocks_rewritten = int(agg["rewritten"] or 0)
    stats.blocks_dropped = int((agg["touched"] or 0) - (agg["rewritten"] or 0))


def _apply_rewrites(blocks: DataFrame, plan: DataFrame, n_candidates: int) -> DataFrame:
    """Old blocks manifest -> post-rewrite manifest: untouched rows pass
    through verbatim, rewritten blocks re-point (id/path/rows/bytes;
    blooms and zone maps carried — conservative supersets), fully-deleted
    blocks leave."""
    changed = plan.filter(F.col("n_deleted") > 0).select(
        "block_id", "new_block_id", "new_data_path", "new_rows", "new_bytes"
    )
    side = F.broadcast(changed) if n_candidates <= 1_000_000 else changed
    joined = blocks.join(side, "block_id", "left")
    kept = joined.filter(F.col("new_rows").isNull() | (F.col("new_rows") > 0))
    return kept.select(
        "file_id",
        F.coalesce("new_block_id", "block_id").alias("block_id"),
        "partition_id",
        F.coalesce("new_data_path", "data_path").alias("data_path"),
        F.coalesce("new_rows", "row_count").alias("row_count"),
        "token_count",  # carried upper bound (blooms stay conservative)
        F.coalesce("new_bytes", "byte_size").alias("byte_size"),
        "minmax_min", "minmax_max", "expected_items", "fpr",
        "field_bloom", "token_bloom", "fieldtoken_bloom",
    )


def _key_prune_query(index: BloomIndex, key_field: str, values: list):
    """Bloom prune tree for an exact key-IN-set match, or None when the
    blooms cannot cover it.  Sound because a block containing a row with
    ``row[key] == v`` indexed EVERY token of v's rendered form — prune =
    OR over keys of AND over each key's tokens.  Requires the key field
    indexed, every value non-null, and every value to yield >= 1 token
    under the index's tokenizer (an un-tokenizable value could hide in
    any block)."""
    from ..query import And as qAnd
    from ..query import FieldToken as qFieldToken
    from ..query import Or as qOr
    from ..query import Query as qQuery
    from ..tokenizer import get_tokenizer

    from ..tokenizer import go_format_value

    cfg = index.config
    if cfg.json_col is not None or key_field not in (cfg.indexed_fields or ()):
        return None
    tok = get_tokenizer(cfg.tokenizer)
    terms = []
    for v in values:
        # only types whose BUILD-side rendering we can reproduce exactly
        # may prune (go_format_value is the scalar twin of the build's
        # stringify: 30.0 -> "30", True -> "true"); anything else — dates,
        # decimals, None — falls back to the always-sound full scan.  A
        # wrong rendering here would wrongly DISQUALIFY blocks and
        # silently skip matching rows.
        if v is None or not isinstance(v, (str, bool, int, float)):
            return None
        stxt = v if isinstance(v, str) else go_format_value(v)
        toks = list(tok.value_fn(stxt))
        if not toks:
            return None
        terms.append(qAnd(*[qFieldToken(key_field, t) for t in toks]))
    return qQuery(bloom=qOr(*terms))


def upsert_keys(
    spark: SparkSession,
    index: BloomIndex,
    source_df: DataFrame,
    key_field: str,
    conflict_retries: int = 0,
    max_pruned_keys: int = 256,
    delete_keys_df: DataFrame | None = None,
    meta_extra: dict | None = None,
    use_deletion_vectors: bool = False,
) -> tuple[BloomIndex, DeleteStats]:
    """Key-based upsert in ONE commit (the ``MERGE INTO ... WHEN MATCHED
    THEN UPDATE/DELETE+INSERT`` analog, full-row replacement semantics):
    every index row whose ``key_field`` equals some source row's key is
    deleted, then every source row is inserted — atomically, as a single
    manifest version (no window where the keys are missing).

    Scale shape: when the key batch is small (``max_pruned_keys``) and
    the key field is bloom-indexed, candidate blocks come from the bloom
    hierarchy — a CDC-apply upsert of K keys reads only the blocks whose
    blooms admit one of them, which Delta's MERGE (file-stats pruning
    only) cannot do for high-cardinality keys.  Larger batches fall back
    to a full candidate scan with the key match as a distributed join —
    Delta-MERGE-equivalent cost.  Matching is EXACT column equality
    (null-safe: a NULL key never matches); blooms only prune.  The
    rewrite kernel, immutability, bloom/zone-map conservatism, commit
    protocol, and CDC contract (delete-the-removed + insert-the-added,
    ``change_events`` required mid-feed) are shared with ``delete_where``.
    Returns ``(index, DeleteStats)`` — ``rows_deleted`` counts replaced
    rows; the insert count is ``source_df``'s row count.

    ``delete_keys_df`` (one ``key_field`` column) names extra keys to
    delete WITHOUT re-inserting — the CDC-apply primitive: one commit
    carries a micro-batch's upserts AND deletes.  A batch that matches
    nothing and inserts nothing commits NOTHING.  ``meta_extra`` keys
    land in the commit's meta.json (e.g. a streaming replay watermark).

    ``use_deletion_vectors=True`` makes the DELETE half merge-on-read
    (the Delta ``MERGE ... WITH DVs`` analog): matched rows become a
    ``dvs`` position delta instead of block rewrites, and the commit is
    APPEND-SHAPED — parent blocks/files segments referenced verbatim plus
    ONE new segment (staged inserts + dv delta + lineage), so a CDC-apply
    stream of small batches costs O(batch) manifest bytes per commit
    instead of O(manifest) folded rewrites, and ZERO old-block data bytes.
    Reads pay the mask anti-join until compact/zorder/
    ``purge_deletion_vectors`` purges.  The changefeed classifies the
    commit as dv-deletes + inserts (``change_events`` required when keys
    matched)."""
    if conflict_retries:
        return _retry_conflicts(
            spark, index, conflict_retries,
            lambda ix: upsert_keys(spark, ix, source_df, key_field, 0,
                                   max_pruned_keys, delete_keys_df,
                                   meta_extra, use_deletion_vectors),
        )
    # MATERIALIZE the merge source: its plan is otherwise executed twice
    # (the key collect, then the insert staging pass) — for a CDC source
    # that is itself a query, twice the cost; for a non-deterministic one,
    # a delete/insert key mismatch.  Delta MERGE materializes its source
    # for the same two reasons.  MEMORY_AND_DISK: batches are
    # CDC-apply-sized by contract, and spill keeps big ones correct.
    from pyspark.storagelevel import StorageLevel

    if source_df.storageLevel == StorageLevel.NONE:
        source_df = source_df.persist(StorageLevel.MEMORY_AND_DISK)
        _persisted = source_df
    else:
        _persisted = None  # caller already persisted: leave lifecycle alone
    try:
        return _upsert_keys_impl(
            spark, index, source_df, key_field, max_pruned_keys,
            delete_keys_df, meta_extra, use_deletion_vectors,
        )
    finally:
        if _persisted is not None:
            _persisted.unpersist()


def _upsert_keys_impl(
    spark: SparkSession,
    index: BloomIndex,
    source_df: DataFrame,
    key_field: str,
    max_pruned_keys: int,
    delete_keys_df: DataFrame | None,
    meta_extra: dict | None,
    use_deletion_vectors: bool,
) -> tuple[BloomIndex, DeleteStats]:
    if index.meta().get("external", False):
        raise ValueError(
            "upsert_keys rewrites block data and is not applicable to a "
            "zero-copy external index"
        )
    _refuse_shallow_clone(index, "upsert_keys")
    cfg = index.config
    mapping = index.column_mapping()
    if mapping:
        # MERGE sources speak LOGICAL names; everything staged/compared is
        # physical.  Same discipline as append (plans/build.py): whole-row
        # replacement means the logical sets must match exactly, so
        # unknown logicals get the append's guidance message.
        unknown = sorted(c for c in source_df.columns if c not in mapping)
        absent = sorted(l for l in mapping if l not in source_df.columns)
        if unknown or absent:
            raise ValueError(
                "upsert source columns do not match the index's logical "
                f"schema {sorted(mapping)} (missing: {absent}, unknown: "
                f"{unknown}) — renamed columns must use their CURRENT "
                "logical names; upsert replaces whole rows"
            )
        source_df = source_df.select(
            *[F.col(c).alias(mapping[c]) for c in source_df.columns]
        )
        if key_field not in mapping:
            raise ValueError(
                f"key field {key_field!r} is not a logical column; have "
                f"{sorted(mapping)}"
            )
        if delete_keys_df is not None:
            delete_keys_df = delete_keys_df.select(
                F.col(key_field).alias(mapping[key_field])
            )
        key_field = mapping[key_field]
    src_cols = list(source_df.columns)
    idx_cols = index.meta().get("source_columns")
    if idx_cols is not None and set(idx_cols) != set(src_cols):
        raise ValueError(
            "upsert source columns do not match the index's "
            f"(missing: {sorted(set(idx_cols) - set(src_cols))}, new: "
            f"{sorted(set(src_cols) - set(idx_cols))}) — upsert replaces "
            "whole rows; align the columns (for add-column evolution use "
            "delete_where + a merge_schema append)"
        )
    if key_field not in src_cols:
        raise ValueError(f"key field {key_field!r} not in source columns")
    from ..operators.constraints import (
        ConstraintViolation,
        collect_violations,
        enforce_constraints,
        normalize_constraints,
        raise_on_failures,
    )
    from .build import STAGING_SCHEMA, _make_map_build_fn
    from .search import prune_blocks, scan_blocks

    # the table's CHECK constraints gate the inserts; a drop-action
    # violating row also loses its DELETE (its key comes from the
    # filtered frame — a garbage row must not take out the good row it
    # would have replaced).  The keys branch is filter-only: its bounded
    # collect must not consume the staging job's Observation.
    cons = normalize_constraints(index.meta().get("constraints"))
    cons_obs = None
    keys_src = source_df
    if cons:
        keys_src, _ = enforce_constraints(source_df, cons, observe=False)
        source_df, cons_obs = enforce_constraints(source_df, cons)

    stats = DeleteStats()
    blocks = index.blocks()
    stats.blocks_before = _manifest_count(index, "blocks")
    stats.files_before = _manifest_count(index, "files")

    keys = keys_src.select(F.col(key_field).alias("_bs_key"))
    if delete_keys_df is not None:
        if list(delete_keys_df.columns) != [key_field]:
            raise ValueError(
                f"delete_keys_df must have exactly one column {key_field!r}"
            )
        keys = keys.unionByName(
            delete_keys_df.select(F.col(key_field).alias("_bs_key"))
        )
    keys = keys.distinct()
    collected = keys.limit(max_pruned_keys + 1).collect()
    prune_q = (
        _key_prune_query(index, key_field, [r._bs_key for r in collected])
        if len(collected) <= max_pruned_keys
        else None
    )
    surviving = (
        prune_blocks(index, prune_q) if prune_q is not None else blocks
    )
    data = scan_blocks(index, surviving, with_pos=use_deletion_vectors)
    version_guess, _ = mf.next_version_dir(index.root)
    plan = None
    seg_name = seg_dir = None
    if use_deletion_vectors:
        # merge-on-read delete half: matched positions -> ONE dvs delta
        # (shared minting kernel with delete_where's dv path)
        seg_name = f"{version_guess}-upsert_dv-{uuid.uuid4().hex[:8]}"
        seg_dir = mf.segment_dir(index.root, seg_name)
        nd = nb = 0
        if "block_id" in data.columns:  # empty index scans have no blocks
            kj = (
                F.broadcast(keys)
                if len(collected) <= max_pruned_keys
                else keys
            )
            matched = data.join(
                kj, data[key_field] == kj["_bs_key"], "left_semi"
            ).select("block_id", "_bs_pos", "_bs_fname")
            nd, nb = _mint_dv_delta(
                index, matched, version_guess, seg_dir, op="upsert_dv"
            )
        stats.rows_deleted = nd
        stats.dv_blocks = stats.candidate_blocks = nb
    else:
        # exact key match as a distributed join marker (broadcast for small
        # key batches); NULL keys never match (join semantics)
        selected = data.select(*[c for c in data.columns if c != "data_path"])
        kmark = keys.withColumn("_bs_del", F.lit(True))
        if len(collected) <= max_pruned_keys:
            kmark = F.broadcast(kmark)
        marked = (
            selected.join(kmark, selected[key_field] == kmark["_bs_key"], "left")
            .drop("_bs_key")
            .withColumn("_bs_del", F.coalesce("_bs_del", F.lit(False)))
        )
        plan = _rewrite_plan(index, marked).persist()
        _rewrite_stats(plan, stats)

    # stage the source rows through the SAME zero-shuffle flush kernel as
    # build_index (new block dirs + completed per-task file rows), into a
    # scratch dir so downstream actions never re-run the side-effecting map
    tag = f"{version_guess}-u{uuid.uuid4().hex[:8]}"
    d = source_df.withColumn(
        "partition_id",
        F.coalesce(F.expr(cfg.partition_expr).cast("string"), F.lit("")),
    )
    if cfg.sha_col:
        d = d.withColumn(
            "content_sha", F.sha2(F.col(cfg.sha_col).cast("string"), 256)
        )
    scratch = mf.staging_root(index.root, tag)
    staging = fsx.join(scratch, "staging.parquet")
    (
        d.mapInArrow(
            _make_map_build_fn(cfg, fsx.join(index.root, "data"), tag),
            STAGING_SCHEMA,
        )
        .write.mode("overwrite")
        .parquet(staging)
    )
    if cons:
        # counters rode the staging job; fail-action violations abort
        # BEFORE commit (scratch + any minted dv segment stay unreachable)
        viol = collect_violations(cons_obs, cons)
        try:
            raise_on_failures(viol, cons)
        except ConstraintViolation:
            if plan is not None:
                plan.unpersist()
            fsx.delete_dir(scratch)
            raise
        if viol:
            meta_extra = {**(meta_extra or {}), "constraint_violations": viol}
    st = spark.read.parquet(staging)
    staged_blocks = st.filter(F.col("block_id").isNotNull()).select(
        "file_id", "block_id", "partition_id", "data_path", "row_count",
        "token_count", "byte_size", "minmax_min", "minmax_max",
        "expected_items", "fpr", "field_bloom", "token_bloom",
        "fieldtoken_bloom",
    )
    staged_files = st.filter(F.col("block_id").isNull()).select(
        "file_id", "partition_id", "block_count", "row_count", "token_count",
        "byte_size", "minmax_min", "minmax_max",
        F.col("file_expected_items").alias("expected_items"),
        F.col("file_fpr").alias("fpr"),
        F.col("file_field_bloom").alias("field_bloom"),
        F.col("file_token_bloom").alias("token_bloom"),
        F.col("file_fieldtoken_bloom").alias("fieldtoken_bloom"),
    )

    try:
        # staging footer rows: file rows only ever accompany block rows,
        # so zero total rows ⟺ zero staged blocks — no Spark job needed
        staged_empty = fsx.parquet_dir_rows(staging) == 0
    except Exception:
        staged_empty = staged_blocks.limit(1).count() == 0
    if stats.rows_deleted == 0 and staged_empty:
        # nothing matched, nothing to insert: commit NOTHING (a CDC
        # stream's empty/irrelevant micro-batch must not churn versions)
        if plan is not None:
            plan.unpersist()
        fsx.delete_dir(scratch)
        stats.blocks_after = stats.blocks_before
        stats.files_after = stats.files_before
        return index, stats

    if use_deletion_vectors:
        # APPEND-SHAPED commit: parent blocks/files referenced verbatim +
        # this one segment (staged inserts, the dv delta, both lineages) —
        # O(batch) manifest bytes, zero old-block data bytes
        staged_blocks.write.mode("overwrite").parquet(
            fsx.join(seg_dir, "blocks.parquet")
        )
        staged_files.write.mode("overwrite").parquet(
            fsx.join(seg_dir, "files.parquet")
        )
        # insert-lineage rows APPEND to the dv delta's (created if absent)
        staged_blocks.select(
            F.lit(version_guess).alias("build_id"),
            "file_id",
            "block_id",
            "partition_id",
            F.lit("upsert_dv").alias("source_desc"),
            F.col("row_count").alias("rows_indexed"),
            F.col("token_count").alias("tokens_inserted"),
            F.lit("upsert_dv").alias("op"),
            F.lit(time.time()).alias("committed_at"),
        ).write.mode("append").parquet(fsx.join(seg_dir, "lineage.parquet"))
        meta = index.meta()
        refs = index.table_refs()
        prev_dvs = index.dvs_refs()
        nd = stats.rows_deleted

        def finalize(prev_version: str | None) -> str:
            version = mf.version_after(prev_version)
            tables = {
                "blocks": list(refs["blocks"])
                + [mf.segment_ref(seg_name, "blocks")],
                "files": list(refs["files"])
                + [mf.segment_ref(seg_name, "files")],
                "lineage": list(refs["lineage"])
                + [mf.segment_ref(seg_name, "lineage")],
            }
            if prev_dvs or nd:
                tables["dvs"] = list(prev_dvs) + (
                    [mf.segment_ref(seg_name, "dvs")] if nd else []
                )
            if index.colstats_refs():
                tables["colstats"] = index.colstats_refs()
            mf.write_meta(
                fsx.join(index.root, "manifest", version),
                index.config,
                extra={
                    "build_id": version,
                    "source_desc": f"upsert_dv of {index.version}",
                    "parent_version": index.version,
                    "tables": tables,
                    **mf.carried_meta(meta),
                    **(meta_extra or {}),
                },
            )
            return version

        v = mf.publish_commit(index.root, finalize, expected=index.version)
        out_ix = mf.BloomIndex(spark, index.root, v)
        stats.blocks_after = _manifest_count(out_ix, "blocks")
        stats.files_after = _manifest_count(out_ix, "files")
        fsx.delete_dir(scratch)
        return out_ix, stats

    new_blocks = _apply_rewrites(blocks, plan, stats.candidate_blocks).unionByName(
        staged_blocks
    )
    live_files = new_blocks.select("file_id").distinct()
    new_files = (
        index.files()
        .join(F.broadcast(live_files), "file_id", "left_semi")
        .unionByName(staged_files)
    )
    out = _commit(
        spark, index, new_blocks, new_files, op="upsert", stats=stats,
        meta_extra=meta_extra,
    )
    plan.unpersist()
    fsx.delete_dir(scratch)
    return out


def apply_changes_batch(
    spark: SparkSession,
    index: BloomIndex,
    changes_df: DataFrame,
    key_field: str,
    change_col: str = "_change_type",
    order_col: str | None = "_commit_version",
    conflict_retries: int = 0,
    max_pruned_keys: int = 256,
    meta_extra: dict | None = None,
    use_deletion_vectors: bool = False,
) -> tuple[BloomIndex, DeleteStats]:
    """Apply one CDC micro-batch as ONE commit (the ``APPLY CHANGES
    INTO`` analog, and the inverse of the changefeed's ``change_events``
    output): resolve each key's FINAL state within the batch, then
    upsert the final inserts and delete the final-deleted keys through
    :func:`upsert_keys`'s single-commit machinery.

    Resolution: when ``order_col`` is present in the batch (the feed's
    ``_commit_version`` by default), only each key's events at its MAX
    order value count; within one order value, any insert wins over a
    delete (the CDC apply convention — a deleting commit emits
    delete-old + insert-kept for the same key, and delete-then-insert is
    the correct composition).  So a key inserted at v3 and deleted at v5
    ends deleted; deleted at v3, re-inserted at v5 ends at the v5 row.
    With ``order_col=None`` (or absent from the frame) the whole batch
    counts as one commit's events.

    Composes with the changefeed into exact replication INCLUDING
    row-set changes: ``readStream(A, change_events+commit_metadata)`` →
    ``stream_apply_changes(B)`` keeps B row-equal to A across appends,
    overwrites, expiry, delete_where, upsert and restore — the plain
    sink replication (DS4) only carries appends.

    ``use_deletion_vectors=True`` passes through to :func:`upsert_keys`:
    each applied batch is an APPEND-SHAPED commit (inserts + a dv
    position delta, O(batch) manifest bytes, zero old-block rewrites) —
    the right shape for a long-running CDC stream; schedule
    compact/``purge_deletion_vectors`` to re-tighten reads."""
    inserts, delete_keys = resolve_changes(
        changes_df, key_field, change_col, order_col
    )
    return upsert_keys(
        spark, index, inserts, key_field,
        conflict_retries=conflict_retries,
        max_pruned_keys=max_pruned_keys,
        delete_keys_df=delete_keys,
        meta_extra=meta_extra,
        use_deletion_vectors=use_deletion_vectors,
    )


def resolve_changes(
    changes_df: DataFrame,
    key_field: str,
    change_col: str = "_change_type",
    order_col: str | None = "_commit_version",
) -> tuple[DataFrame, DataFrame]:
    """CDC batch -> (final insert rows, final delete-only keys) under the
    apply convention documented on :func:`apply_changes_batch`."""
    meta_cols = {change_col}
    if order_col is not None and order_col in changes_df.columns:
        ranked = changes_df.withColumn(
            "_bs_maxo", F.max(order_col).over(Window.partitionBy(key_field))
        ).filter(F.col(order_col) == F.col("_bs_maxo")).drop("_bs_maxo")
        meta_cols.add(order_col)
    else:
        ranked = changes_df
    meta_cols |= {"_commit_version", "_commit_timestamp"} & set(
        changes_df.columns
    )
    inserts = ranked.filter(F.col(change_col) != "delete").drop(
        *sorted(meta_cols)
    )
    insert_keys = inserts.select(key_field).distinct()
    delete_keys = (
        ranked.filter(F.col(change_col) == "delete")
        .select(key_field)
        .distinct()
        .join(insert_keys, key_field, "left_anti")  # insert wins in-order
    )
    return inserts, delete_keys


# ---------------------------------------------------------------------------
# RESTORE (Delta RESTORE analog, r06)
# ---------------------------------------------------------------------------


def restore(
    spark: SparkSession,
    index: BloomIndex,
    version: str | None = None,
    timestamp=None,
    verify_data: bool = True,
    conflict_retries: int = 0,
) -> BloomIndex:
    """Roll the index back to a retained historical version as a NEW
    commit (``RESTORE TABLE ... TO VERSION AS OF`` analog) — zero-copy:
    the restore version re-references the target's blocks/files segments
    verbatim, no data or manifest rows are rewritten.

    History keeps moving FORWARD: the restored state lands as a fresh
    version (CURRENT+1) with full lineage retained, so the restore itself
    is time-travelable and shows in ``history()``.  Identity metadata
    (``source_columns``/``source_schema``/``uniform_params``) travels
    back with the target — restoring to a pre-``merge_schema`` version
    narrows the read schema again — while the streaming replay watermark
    (``last_stream_batch``) is carried from CURRENT, never rewound: a
    restored root must not let a restarted stream re-append its last
    batch.

    ``verify_data=True`` (default) runs a distributed existence check
    over the target's block data dirs first and refuses when any were
    vacuumed away (same failure contract as Delta RESTORE after VACUUM)
    — size ``vacuum(retain_versions/retain_time)`` to the window you
    want restorable.  To a changefeed, a restore is a DELETING commit
    (the rolled-back versions' blocks disappear), so mid-feed consumers
    need ``change_events`` — identical to overwrite/expire semantics.
    """
    if conflict_retries:
        return _retry_conflicts(
            spark, index, conflict_retries,
            lambda ix: restore(spark, ix, version, timestamp, verify_data, 0),
        )
    target = BloomIndex.load(spark, index.root, version=version, timestamp=timestamp)
    if target.version == index.version:
        return index  # restoring to CURRENT: nothing to commit
    if verify_data:
        ext = bool(target.meta().get("external", False))
        data_dir = target.data_dir
        n_blk = target.table_rows("blocks")
        missing: list[str] | None = None
        if n_blk is not None and n_blk <= RESTORE_DRIVER_CHECK_MAX:
            # small manifest: the existence sweep is driver-side — the
            # data_path column comes straight from the segment parquet
            # (KBs) and a 32-thread pool covers object-store HEAD latency;
            # zero Spark jobs where the distributed path paid a shuffle +
            # a Python-worker stage just to stat a few dozen dirs
            try:
                paths = sorted(
                    {
                        p
                        for seg in target.table_paths("blocks")
                        for p in fsx.read_parquet_dir(
                            seg, columns=["data_path"]
                        )["data_path"].to_pylist()
                    }
                )
                from concurrent.futures import ThreadPoolExecutor

                def _gone(rel):
                    p = rel if ext else fsx.join(data_dir, rel)
                    return None if fsx.exists(p) else rel

                with ThreadPoolExecutor(max_workers=32) as ex2:
                    missing = [m for m in ex2.map(_gone, paths) if m]
            except Exception:
                missing = None  # driver cannot read the root: go distributed
        if missing is None:

            def _check(it):
                from ..sources import fs as _fsx

                for pdf in it:
                    miss = []
                    for rel in pdf["data_path"]:
                        p = rel if ext else _fsx.join(data_dir, rel)
                        if not _fsx.exists(p):
                            miss.append(rel)
                    yield pd.DataFrame({"data_path": miss})

            gone = (
                target.blocks()
                .select("data_path")
                .repartition(32)
                .mapInPandas(_check, "data_path string")
            )
            # bounded: a fully-vacuumed huge manifest must not collect
            # every missing path to the driver — 4 examples + a count
            missing = [r.data_path for r in gone.limit(4).collect()]
            n_gone = gone.count() if len(missing) > 3 else len(missing)
        else:
            n_gone = len(missing)
        if missing:
            raise ValueError(
                f"cannot restore to {target.version}: {n_gone} of its "
                f"block data dirs were vacuumed (e.g. {sorted(missing)[:3]}) "
                "— keep a retain_versions/retain_time vacuum window covering "
                "every version you want restorable"
            )

    root = index.root
    t_refs = target.table_refs()
    t_meta = target.meta()
    cur_meta = index.meta()

    def finalize(prev_version: str | None) -> str:
        v = mf.version_after(prev_version)
        extra = {
            "build_id": v,
            "source_desc": f"restore of {target.version}",
            "parent_version": index.version,
            "restored_version": target.version,
            "tables": {
                "blocks": list(t_refs["blocks"]),
                "files": list(t_refs["files"]),
                # FULL lineage: history is never truncated by a rollback
                "lineage": list(index.table_refs()["lineage"]),
                # the TARGET's deletion vectors travel back with it —
                # restoring to a pre-DV version drops the mask (rows
                # were live then), restoring to a post-DV version keeps
                # exactly its mask; carrying CURRENT's refs instead
                # would delete rows the restored snapshot never deleted
                **(
                    {"dvs": list(t_refs["dvs"])} if t_refs.get("dvs") else {}
                ),
                # the TARGET's ANALYZE stats travel back with its block set
                **(
                    {"colstats": list(t_refs["colstats"])}
                    if t_refs.get("colstats")
                    else {}
                ),
            },
            # target identity: the restored state answers queries exactly
            # as the target version did
            **{
                k: t_meta[k]
                for k in (
                    "source_columns", "source_schema", "uniform_params",
                    "external", "data_dir_override",
                )
                if k in t_meta
            },
            # CURRENT's replay watermark only — never rewound
            **mf.carried_meta(cur_meta, for_append=True),
        }
        # CHECK constraints are table identity too: the TARGET's travel
        # back (a restore to a pre-constraint version drops the gate) —
        # carried_meta above would otherwise keep CURRENT's
        extra.pop("constraints", None)
        if "constraints" in t_meta:
            extra["constraints"] = t_meta["constraints"]
        # column mapping identity travels with the target the same way: a
        # restore to a pre-rename version answers with the old logical
        # names, and a pre-drop restore re-activates the column (the
        # physical bytes never left)
        for k in ("column_mapping", "retired_columns"):
            extra.pop(k, None)
            if k in t_meta:
                extra[k] = t_meta[k]
        mf.write_meta(fsx.join(root, "manifest", v), target.config, extra=extra)
        return v

    new_v = mf.publish_commit(root, finalize, expected=index.version)
    return BloomIndex(spark, root, new_v)


# ---------------------------------------------------------------------------
# CLONE (Delta CLONE analog, r06)
# ---------------------------------------------------------------------------


def clone(
    spark: SparkSession,
    index: BloomIndex,
    new_root: str,
    shallow: bool = True,
    version: str | None = None,
    timestamp=None,
) -> BloomIndex:
    """Clone the index (optionally a historical version) to ``new_root``
    as a fresh v1 commit — the ``CREATE TABLE ... CLONE`` analog.

    ``shallow=True`` (default) copies ONLY the manifest (referenced
    segments + meta; manifest-sized bytes): the clone's meta carries a
    ``data_dir_override`` pointing at the source's data dir, every read
    path resolves block dirs through it, and — like Delta shallow clones
    — the clone depends on the source's retention: vacuum the SOURCE
    only while no clone still references the removed blocks.  Shallow
    clones are read-only for block DATA: appends and data-rewriting ops
    (compact/delete/upsert/zorder/vacuum) refuse with guidance, while
    metadata-only ops (merge_files, expire_blocks, fold/vacuum_manifest,
    restore within the clone) work — so a clone is a cheap fork for
    experiments like "expire half the table and measure".

    ``shallow=False`` additionally copies every referenced block dir
    (DISTRIBUTED — one task batch per block dir, bytes through the fs
    layer) and yields a fully independent root.

    External (zero-copy) indexes clone shallow-only by nature: their
    data_path values are already absolute source URIs; the manifest copy
    preserves them verbatim.
    """
    target = (
        index  # clone the HANDLE's (possibly time-traveled) version
        if version is None and timestamp is None
        else BloomIndex.load(spark, index.root, version=version, timestamp=timestamp)
    )
    if mf.current_version(new_root) is not None:
        raise ValueError(f"{new_root!r} already holds a committed index")
    t_meta = target.meta()
    external = bool(t_meta.get("external", False))
    if external and not shallow:
        raise ValueError(
            "deep-cloning an external index would copy caller-owned source "
            "files; clone shallow, or build a managed index from the source"
        )

    # copy the referenced manifest tables byte-for-byte, path-preserving
    # (segment refs and pre-segment version-local refs alike)
    refs = target.table_refs()
    rel_paths = sorted({r for rs in refs.values() for r in rs})
    src_mdir = fsx.join(index.root, "manifest")
    dst_mdir = fsx.join(new_root, "manifest")
    for rel in rel_paths:
        for f in fsx.list_parquet_files(fsx.join(src_mdir, rel)):
            name = f.rsplit("/", 1)[-1]
            fsx.write_bytes_atomic(
                fsx.join(dst_mdir, rel, name), fsx.read_bytes(f)
            )

    if not shallow:
        src_data = target.data_dir
        dst_data = fsx.join(new_root, "data")

        def _copy(pdfs):
            from ..sources import fs as _fsx

            for pdf in pdfs:
                n = 0
                for rel in pdf["data_path"]:
                    for f in _fsx.list_parquet_files(_fsx.join(src_data, rel)):
                        name = f.rsplit("/", 1)[-1]
                        _fsx.write_bytes_atomic(
                            _fsx.join(dst_data, rel, name), _fsx.read_bytes(f)
                        )
                        n += 1
                yield pd.DataFrame({"n": [n]})

        copied = (
            target.blocks()
            .select("data_path")
            .repartition(32)
            .mapInPandas(_copy, "n long")
            .agg(F.sum("n"))
            .collect()[0][0]
        )
        if not copied:
            raise RuntimeError("deep clone copied zero block files")

    def finalize(prev_version):
        v = mf.version_after(prev_version)  # v1 — fresh root
        extra = {
            "build_id": v,
            "source_desc": f"clone of {index.root}@{target.version}",
            "cloned_from": {"root": index.root, "version": target.version},
            "tables": {
                t: list(refs[t])
                for t in (
                    *mf.TABLES,
                    *(["dvs"] if refs.get("dvs") else []),
                    *(["colstats"] if refs.get("colstats") else []),
                )
            },
            **{
                k: t_meta[k]
                for k in (
                    "source_columns", "source_schema", "uniform_params",
                    "external", "last_stream_batch", "constraints",
                    "column_mapping", "retired_columns",
                )
                if k in t_meta
            },
        }
        if shallow and not external:
            # target.data_dir already resolves a clone-of-a-clone's
            # override to the ORIGINAL source data dir
            extra["data_dir_override"] = target.data_dir
        mf.write_meta(fsx.join(new_root, "manifest", v), target.config, extra=extra)
        return v

    new_v = mf.publish_commit(new_root, finalize)
    return BloomIndex(spark, new_root, new_v)


# ---------------------------------------------------------------------------
# Commit + M8 tombstone/vacuum
# ---------------------------------------------------------------------------


def _commit(
    spark: SparkSession,
    index: BloomIndex,
    new_blocks: DataFrame,
    new_files: DataFrame,
    op: str,
    stats: MergeStats,
    meta_extra: dict | None = None,
    carry_dvs: bool = True,
) -> tuple[BloomIndex, MergeStats]:
    """Commit a maintenance op's output as a new manifest version.

    ``carry_dvs``: deletion-vector segment refs carry to the new version
    by default — maintenance ops that keep any UN-rewritten block alive
    (merge_files, compact, expire, delete/upsert rewrites) must keep its
    mask or silently resurrect DV-deleted rows; refs for rewritten blocks
    are orphan-but-harmless (keyed by the dead block_id) and fold cleans
    them.  Pass False only when the op rewrote EVERY block from a
    DV-masked scan (zorder) — the output contains no masked positions.

    Writes ONE segment: the transformed blocks/files (a maintenance op's
    output IS the folded manifest — its segment replaces every prior
    blocks/files segment) plus a lineage DELTA holding only this op's
    provenance rows; the new version references the parent's lineage
    segments unchanged, so history is never recopied (the r03 unbounded
    lineage-rewrite fix).  Published through ``publish_commit`` with
    ``expected=parent``: if anything (a streaming append, another
    maintenance op) committed since this op's snapshot, folding from the
    stale snapshot would silently DROP that commit — CommitConflict is
    raised instead and the caller re-plans from the fresh version."""
    root = index.root
    version_guess, _ = mf.next_version_dir(root)
    # per-attempt nonce: two racing maintenance committers (e.g. a
    # double-fired cron merge on two hosts) share the version guess, and a
    # deterministic name would let the LOSER overwrite the winner's
    # already-committed immutable segment before its CommitConflict fires.
    # A crashed/lost attempt's segment is unreachable garbage for
    # vacuum_manifest, never corruption.
    seg_name = f"{version_guess}-{op}-{uuid.uuid4().hex[:8]}"
    seg_dir = mf.segment_dir(root, seg_name)
    # blocks/files segments are independent manifest-sized jobs: submit
    # them from driver threads so the commit's fixed cost is max(job)
    # instead of sum(jobs) — same discipline as the build's segment writes
    # (plans/build.py; guide §2.6 overlap-independent-jobs)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as ex:
        fb = ex.submit(
            lambda: new_blocks.write.mode("overwrite").parquet(
                fsx.join(seg_dir, "blocks.parquet")
            )
        )
        ff = ex.submit(
            lambda: new_files.write.mode("overwrite").parquet(
                fsx.join(seg_dir, "files.parquet")
            )
        )
        fb.result(), ff.result()
    # lineage DELTA: this op's rows only — parent segments are referenced.
    # Derived from the already-committed blocks segment; for segments
    # under the driver byte gate that is one pyarrow read + one atomic
    # write (zero Spark jobs), else one Spark job over the read-back.
    if _write_lineage_driver(seg_dir, version_guess, op):
        version = _finalize_commit(
            spark, index, seg_name, op, meta_extra, carry_dvs
        )
        out = mf.BloomIndex(spark, root, version)
        stats.files_after = _manifest_count(out, "files")
        stats.blocks_after = _manifest_count(out, "blocks")
        return out, stats
    committed_blocks = spark.read.schema(mf.BLOCKS_SCHEMA).parquet(
        fsx.join(seg_dir, "blocks.parquet")
    )

    committed_blocks.select(
        F.lit(version_guess).alias("build_id"),
        "file_id",
        "block_id",
        "partition_id",
        F.lit(op).alias("source_desc"),
        F.col("row_count").alias("rows_indexed"),
        F.col("token_count").alias("tokens_inserted"),
        F.lit(op).alias("op"),
        F.lit(time.time()).alias("committed_at"),
    ).write.mode("overwrite").parquet(fsx.join(seg_dir, "lineage.parquet"))

    version = _finalize_commit(spark, index, seg_name, op, meta_extra, carry_dvs)
    out = mf.BloomIndex(spark, root, version)
    stats.files_after = _manifest_count(out, "files")
    stats.blocks_after = _manifest_count(out, "blocks")
    return out, stats


def _write_lineage_driver(seg_dir: str, build_id: str, op: str) -> bool:
    """Derive the commit's lineage DELTA driver-side from the
    just-written blocks segment: one pyarrow column read + one atomic
    write, zero Spark jobs.  Applies under the same byte gate as the
    build's driver-side segment writes; returns False (caller runs the
    Spark read-back + write) for big segments or driver-unreadable
    roots."""
    import pyarrow as pa

    from .build import DRIVER_SEGMENT_MAX_BYTES, _SEG_WRITE_KW

    blocks_dir = fsx.join(seg_dir, "blocks.parquet")
    try:
        files = fsx.list_parquet_files(blocks_dir)
        if not files:
            return False
        fs0, _ = fsx.resolve(blocks_dir)
        total = 0
        for f in files:
            _, p = fsx.resolve(f)
            total += fs0.get_file_info([p])[0].size or 0
        if total > DRIVER_SEGMENT_MAX_BYTES:
            return False
        btbl = fsx.read_parquet_dir(
            blocks_dir,
            columns=["file_id", "block_id", "partition_id",
                     "row_count", "token_count"],
        )
        n = btbl.num_rows
        lineage = pa.table(
            {
                "build_id": pa.array([build_id] * n, pa.string()),
                "file_id": btbl["file_id"],
                "block_id": btbl["block_id"],
                "partition_id": btbl["partition_id"],
                "source_desc": pa.array([op] * n, pa.string()),
                "rows_indexed": btbl["row_count"],
                "tokens_inserted": btbl["token_count"],
                "op": pa.array([op] * n, pa.string()),
                "committed_at": pa.array([time.time()] * n, pa.float64()),
            }
        )
        out = fsx.join(seg_dir, "lineage.parquet")
        fsx.delete_dir(out)
        fsx.write_parquet_atomic(out, lineage, "part-0.parquet", **_SEG_WRITE_KW)
        fsx.write_bytes_atomic(fsx.join(out, "_SUCCESS"), b"")
        return True
    except Exception:
        return False


def _finalize_commit(
    spark: SparkSession,
    index: BloomIndex,
    seg_name: str,
    op: str,
    meta_extra: dict | None,
    carry_dvs: bool,
) -> str:
    """Publish a maintenance op's segment as the new version (shared by
    the driver-side and Spark lineage paths of ``_commit``)."""
    root = index.root
    meta = index.meta()

    def finalize(prev_version: str | None) -> str:
        version = mf.version_after(prev_version)
        vdir = fsx.join(root, "manifest", version)
        tables = {
            "blocks": [mf.segment_ref(seg_name, "blocks")],
            "files": [mf.segment_ref(seg_name, "files")],
            "lineage": index.table_refs()["lineage"]
            + [mf.segment_ref(seg_name, "lineage")],
        }
        if carry_dvs and index.dvs_refs():
            tables["dvs"] = index.dvs_refs()
        # ANALYZE stats carry like DVs: rows key by (block_id, data_path),
        # so survivors stay covered; rows for rewritten blocks are
        # orphan-but-harmless (they join nothing) and fold prunes them
        if index.colstats_refs():
            tables["colstats"] = index.colstats_refs()
        mf.write_meta(
            vdir,
            index.config,
            extra={
                "build_id": version,
                "source_desc": f"{op} of {index.version}",
                "parent_version": index.version,
                "tables": tables,
                **mf.carried_meta(meta),
                **(meta_extra or {}),
            },
        )
        return version

    return mf.publish_commit(root, finalize, expected=index.version)


def vacuum(
    index: BloomIndex,
    retain_versions: int = 0,
    retain_time: float = 0.0,
    retain_names: list[str] | None = None,
    dry_run: bool = False,
) -> int:
    """Delete block data dirs not referenced by the CURRENT manifest
    (TombstoneFile analog, data_store.go:19-21).  Safe only once no reader
    resolves a version outside the retained window.  Returns dirs removed.

    ``dry_run=True`` (``VACUUM ... DRY RUN`` analog) runs the identical
    distributed listing + anti-join and returns the count of dirs that
    WOULD be removed, deleting nothing — size the retention window against
    it before a destructive run.

    ``retain_versions`` / ``retain_time`` additionally keep every block
    dir referenced by the newest K superseded versions and/or versions
    committed within the last S seconds (Delta ``VACUUM ... RETAIN``
    analog) — the DATA half of the time-travel window; pair with the
    same knobs on :func:`vacuum_manifest` so the version metadata
    survives too.  Cost: the anti-join's right side unions each retained
    version's manifest-sized block list (distributed, never collected).

    DISTRIBUTED end to end (bounded driver memory at ANY file/block
    count): even the top-level ``file_id=`` listing runs in a task
    (r03 left it on the driver — fine to ~10^7 files, but no reason to be
    bounded at all); executors then list each file dir's block dirs, the
    listing anti-joins the blocks manifest (never collected), and the dead
    dirs are deleted on executors through the fs layer.  Requires the data
    root to be shared storage — already true for any multi-executor
    deployment; a registered custom scheme must also be registered in the
    executor interpreters (fs.register_scheme docstring)."""
    # a shallow clone's data_dir IS the source's: vacuuming through the
    # clone would anti-join the SOURCE's dirs against the CLONE's manifest
    # and delete every source block the clone doesn't reference
    _refuse_shallow_clone(index, "vacuum")
    spark = index.spark
    data_dir = index.data_dir

    def list_file_dirs(pdfs):
        for pdf in pdfs:
            rows = [fd for r in pdf["root"] for fd in fsx.list_subdirs(r)]
            yield pd.DataFrame({"file_dir": rows})

    fd_df = (
        spark.createDataFrame([(data_dir,)], "root string")
        .mapInPandas(list_file_dirs, "file_dir string")
        # spread the per-file-dir block listing across the cluster
        .repartition(64)
    )

    def list_blocks(pdfs):
        for pdf in pdfs:
            rows = [
                fsx.join(fd, bd)
                for fd in pdf["file_dir"]
                for bd in fsx.list_subdirs(fsx.join(data_dir, fd))
            ]
            yield pd.DataFrame({"data_path": rows})

    listed = fd_df.mapInPandas(list_blocks, "data_path string")
    live_blocks = index.blocks().select("data_path")
    if retain_names is None:
        retain_names = mf.travel_retained(
            index.root, retain_versions, retain_time
        )
    for v in retain_names:
        live_blocks = live_blocks.unionByName(
            mf.BloomIndex(spark, index.root, v)
            .blocks(cache=False)
            .select("data_path")
        )
    dead = listed.join(live_blocks.distinct(), "data_path", "left_anti")

    def delete(pdfs):
        n = 0
        for pdf in pdfs:
            for p in pdf["data_path"]:
                if not dry_run:
                    fsx.delete_dir(fsx.join(data_dir, p))
                n += 1
        yield pd.DataFrame({"n": [n]})

    removed = (
        dead.mapInPandas(delete, "n long").agg(F.sum("n")).collect()[0][0] or 0
    )
    if dry_run:
        return int(removed)

    # empty-parent sweep over ALL file dirs (distributed, one stat+list per
    # FILE): covers dirs emptied by THIS run and dirs a previous crashed
    # vacuum emptied but never removed (sweeping only this run's dead
    # parents would leak those forever).  fd_df re-lists lazily, so fully
    # removed dirs are already gone from the sweep's input.
    def sweep(pdfs):
        n = 0
        for pdf in pdfs:
            for fd in pdf["file_dir"]:
                if fsx.delete_dir_if_empty(fsx.join(data_dir, fd)):
                    n += 1
        yield pd.DataFrame({"n": [n]})

    fd_df.mapInPandas(sweep, "n long").agg(F.sum("n")).collect()
    return int(removed)


def fsck(
    spark: SparkSession,
    index: BloomIndex,
    repair: bool = False,
    conflict_retries: int = 0,
) -> tuple[BloomIndex, DataFrame]:
    """``FSCK REPAIR TABLE`` analog: find manifest block entries whose DATA
    DIRECTORIES are gone from storage (out-of-band deletion, a partial
    out-of-band restore, an over-eager external cleanup) and, with
    ``repair=True``, commit a manifest version that drops them so reads
    stop failing on missing files.

    Returns ``(index, missing)`` — ``missing`` is a DataFrame of the
    absent ``data_path`` values (empty = healthy); with ``repair=True``
    and any damage, ``index`` is the repaired version.  The existence
    check is DISTRIBUTED (one stat per block dir on executors, manifest
    paths never collected), the same shape as restore()'s vacuum guard.

    Semantics of a repair commit: it is a maintenance DELETE of the dead
    blocks — file-level rows for partially-dead files survive with their
    (now conservative) blooms/counters, exactly like delete_where's
    rewrites; deletion-vector refs for dropped blocks become
    orphan-but-harmless and fold prunes them; ANALYZE stats drop out of
    coverage with the blocks.  To a changefeed this is a deleting commit
    whose rows CANNOT be replayed (the data is gone): plain feeds refuse
    it as usual, and a ``change_events`` feed fails loudly reading the
    removed dirs — consumers must re-seed, the honest outcome of data
    loss.  Works on external overlays and shallow clones (the commit is
    pure metadata; no data dir is touched)."""
    if conflict_retries:
        return _retry_conflicts(
            spark, index, conflict_retries,
            lambda ix: fsck(spark, ix, repair, 0),
        )
    ext = bool(index.meta().get("external", False))
    data_dir = index.data_dir

    def _check(it):
        from ..sources import fs as _fsx

        for pdf in it:
            gone = [
                rel
                for rel in pdf["data_path"]
                if not _fsx.exists(rel if ext else _fsx.join(data_dir, rel))
            ]
            yield pd.DataFrame({"data_path": gone})

    missing = (
        index.blocks(cache=False)
        .select("data_path")
        .repartition(32)
        .mapInPandas(_check, "data_path string")
        .persist()
    )
    if not repair or missing.count() == 0:
        return index, missing

    blocks = index.blocks(cache=False)
    stats = DeleteStats()
    stats.blocks_before = _manifest_count(index, "blocks")
    stats.files_before = _manifest_count(index, "files")
    new_blocks = blocks.join(missing, "data_path", "left_anti")
    live_files = new_blocks.select("file_id").distinct()
    new_files = index.files(cache=False).join(
        F.broadcast(live_files), "file_id", "left_semi"
    )
    out, _ = _commit(spark, index, new_blocks, new_files, op="fsck", stats=stats)
    return out, missing


# ---------------------------------------------------------------------------
# Manifest-level maintenance: fold segments, vacuum unreachable metadata
# ---------------------------------------------------------------------------


def fold_manifest(
    spark: SparkSession, index: BloomIndex, conflict_retries: int = 0
) -> BloomIndex:
    """Compact the manifest's segment lists into ONE segment per table.

    Appends (and every streaming micro-batch) write O(batch) delta
    segments; a long-running stream accumulates one per commit.  Folding
    unions each table's segments into a single segment — a manifest-sized
    Spark job, zero data-file I/O — and commits a version referencing only
    it: the "compaction folds segments" half of the manifest-list design
    (readers union; folds reset the union width).  Run at the same cadence
    as merge_files; raises CommitConflict if anything commits concurrently
    (``conflict_retries`` re-plans from the fresh version automatically).
    The superseded segments become unreachable — reclaim with
    vacuum_manifest()."""
    if conflict_retries:
        return _retry_conflicts(
            spark, index, conflict_retries,
            lambda ix: fold_manifest(spark, ix, 0),
        )
    root = index.root
    version_guess, _ = mf.next_version_dir(root)
    seg_name = f"{version_guess}-fold-{uuid.uuid4().hex[:8]}"  # see _commit
    seg_dir = mf.segment_dir(root, seg_name)
    (
        index.blocks(cache=False)
        .repartition("partition_id")
        .sortWithinPartitions("partition_id")
        .write.mode("overwrite")
        .parquet(fsx.join(seg_dir, "blocks.parquet"))
    )
    index.files(cache=False).write.mode("overwrite").parquet(
        fsx.join(seg_dir, "files.parquet")
    )
    index.lineage().write.mode("overwrite").parquet(
        fsx.join(seg_dir, "lineage.parquet")
    )
    # deletion vectors fold too: per-block UNION of the delta positions
    # (deltas are disjoint — see DVS_SCHEMA), orphan rows for blocks a
    # rewrite/expire already dropped are semi-joined away.  An all-orphan
    # result folds back to the clean no-DV state (no ref at all).
    fold_dvs = False
    dvs = index.dvs(cache=False)
    if dvs is not None:
        (
            dvs.join(
                index.blocks(cache=False).select("data_path"),
                "data_path",
                "left_semi",
            )
            .groupBy("block_id", "data_path")
            .agg(F.flatten(F.collect_list("positions")).alias("positions"))
            .select(
                "block_id",
                "data_path",
                "positions",
                F.size("positions").cast("long").alias("dv_count"),
            )
            .write.mode("overwrite")
            .parquet(fsx.join(seg_dir, "dvs.parquet"))
        )
        fold_dvs = fsx.parquet_dir_rows(fsx.join(seg_dir, "dvs.parquet")) > 0
    # ANALYZE column stats fold the same way: rows for live (block_id,
    # data_path) pairs re-segment; orphans from rewritten blocks drop.
    fold_cs = False
    cs = index.colstats(cache=False)
    if cs is not None:
        (
            cs.join(
                index.blocks(cache=False).select("block_id", "data_path"),
                ["block_id", "data_path"],
                "left_semi",
            )
            .write.mode("overwrite")
            .parquet(fsx.join(seg_dir, "colstats.parquet"))
        )
        fold_cs = fsx.parquet_dir_rows(fsx.join(seg_dir, "colstats.parquet")) > 0
    meta = index.meta()

    def finalize(prev_version: str | None) -> str:
        version = mf.version_after(prev_version)
        tables = {t: [mf.segment_ref(seg_name, t)] for t in mf.TABLES}
        if fold_dvs:
            tables["dvs"] = [mf.segment_ref(seg_name, "dvs")]
        if fold_cs:
            tables["colstats"] = [mf.segment_ref(seg_name, "colstats")]
        mf.write_meta(
            fsx.join(root, "manifest", version),
            index.config,
            extra={
                "build_id": version,
                "source_desc": f"fold of {index.version}",
                "parent_version": index.version,
                "tables": tables,
                **mf.carried_meta(meta),
            },
        )
        return version

    version = mf.publish_commit(root, finalize, expected=index.version)
    return mf.BloomIndex(spark, root, version)


def vacuum_manifest(
    index: BloomIndex,
    staging_ttl: float = 24 * 3600.0,
    retain_versions: int = 0,
    retain_time: float = 0.0,
    retain_names: list[str] | None = None,
    dry_run: bool = False,
) -> int:
    """Delete manifest metadata unreachable from CURRENT: superseded
    version dirs, segment dirs no version references (failed or folded-away
    commits), and STALE build staging scratch.  Returns dirs removed.

    ``retain_versions`` / ``retain_time`` keep a TIME-TRAVEL window
    (Delta ``logRetentionDuration`` analog): the newest K superseded
    versions and/or every version committed within the last S seconds
    stay readable — their version dirs AND every segment they reference
    survive.  Pair with the same knobs on :func:`vacuum`, which guards
    the underlying block DATA; a version whose metadata survives but
    whose data was vacuumed reads as missing files, same failure mode as
    Delta time travel past VACUUM retention.  When running BOTH vacuums,
    resolve the window ONCE (``mf.travel_retained``) and pass the same
    list via ``retain_names`` — evaluating a ``retain_time`` window at
    two instants (or ``retain_versions`` across a racing commit) can
    retain a version's metadata while deleting its data
    (:func:`maintain` does this, and runs the data vacuum FIRST so any
    skew leaves harmless orphan data, never a broken snapshot).

    Staging scratch is special: a build is exposed for its whole
    multi-minute (at scale multi-hour) staging window, not just the brief
    commit window the "no commit in flight" contract covers — deleting a
    live build's scratch would silently restart its heavy stages.  A
    staging tree is therefore only reclaimed when NOTHING under it was
    modified for ``staging_ttl`` seconds (default 24 h — older than any
    live build attempt; pass 0 to force, e.g. in tests or after verifying
    no build runs).

    Driver listings here are one level deep and bounded by VERSION/SEGMENT
    count (kept small by fold_manifest) — never by blocks or files.  Same
    safety contract as vacuum(): run only when no commit is in flight and
    no reader still resolves an older version."""
    root = index.root
    cur = mf.current_version(root)
    if cur is None:
        return 0
    if retain_names is None:
        retain_names = mf.travel_retained(root, retain_versions, retain_time)
    live_handles = [mf.BloomIndex(index.spark, root, cur)] + [
        mf.BloomIndex(index.spark, root, v) for v in retain_names
    ]
    all_refs = [
        rel
        for h in live_handles
        for refs in h.table_refs().values()
        for rel in refs
    ]
    referenced = {
        rel.split("/", 2)[1] for rel in all_refs if rel.startswith("segments/")
    }
    # a post-upgrade append can still reference a PRE-segment version dir's
    # tables (back-compat refs like "v00000001/blocks.parquet") — those
    # version dirs stay live even though CURRENT moved past them
    live_vdirs = {h.version for h in live_handles} | {
        rel.split("/", 1)[0] for rel in all_refs if not rel.startswith("segments/")
    }
    mdir = fsx.join(root, "manifest")
    removed = 0
    for d in fsx.list_subdirs(mdir):
        if d.startswith("v") and d not in live_vdirs:
            if not dry_run:
                fsx.delete_dir(fsx.join(mdir, d))
            removed += 1
        elif d == "staging":
            import time as _time

            sdir = fsx.join(mdir, d)
            for tag in fsx.list_subdirs(sdir):
                tdir = fsx.join(sdir, tag)
                ts = fsx.newest_mtime(tdir)
                if ts is None or _time.time() - ts >= staging_ttl:
                    if not dry_run:
                        fsx.delete_dir(tdir)
                    removed += 1
            if not dry_run:
                fsx.delete_dir_if_empty(sdir)
    for s in fsx.list_subdirs(mf.segments_dir(root)):
        if s not in referenced:
            if not dry_run:
                fsx.delete_dir(mf.segment_dir(root, s))
            removed += 1
    return removed


def maintain(
    spark: SparkSession,
    root: str,
    *,
    max_blocks_per_file: int = 64,
    max_files_per_merge: int = 10,
    compact_rows: int | None = None,
    zorder_by: list[str] | None = None,
    where=None,
    purge_dvs: bool = False,
    analyze_columns: list[str] | None = None,
    fold_threshold: int = 8,
    run_vacuum: bool = False,
    retain_versions: int = 0,
    retain_time: float = 0.0,
    staging_ttl: float = 24 * 3600.0,
    conflict_retries: int = 3,
) -> dict:
    """One-call housekeeping — the ``OPTIMIZE`` analog: merge small
    files, optionally compact undersized blocks (``compact_rows``), fold
    the manifest once its segment list exceeds ``fold_threshold``, and
    (opt-in) vacuum metadata + data honoring the time-travel retention
    window.  Each step re-resolves CURRENT and retries on
    :class:`CommitConflict` up to ``conflict_retries`` times — racing
    appends are allowed to win; callers no longer hand-roll the re-plan
    loop the commit protocol requires.

    ``run_vacuum`` defaults to False because vacuum's safety contract is
    the caller's to assert: no commit in flight and no reader (or
    lagging changefeed) resolving versions outside the retained window —
    size ``retain_versions``/``retain_time`` to cover reader/feed lag
    before enabling it in a schedule.

    ``zorder_by`` runs :func:`optimize_zorder` on those columns as part
    of the pass (the ``OPTIMIZE ... ZORDER BY`` spelling) — it rewrites
    every block, so ``compact_rows`` is redundant with it; skipped on
    external/shallow-clone roots like compact.

    ``where`` (a :class:`PrefilterExpr`) scopes ``compact_rows`` and
    ``zorder_by`` to the matching blocks (``OPTIMIZE ... WHERE``) —
    schedule per-partition maintenance instead of whole-table rewrites.

    ``purge_dvs`` runs :func:`purge_deletion_vectors` (the ``REORG ...
    APPLY (PURGE)`` spelling) — rewrite only the deletion-vector-masked
    blocks so reads drop the mask anti-join; redundant after
    ``zorder_by`` (which already rebuilt everything).  Skipped on
    shallow clones (their block dirs belong to the source) — the one
    root where DV masks can accumulate without a local purge path.

    ``analyze_columns`` re-runs :func:`plans.analyze.analyze` AFTER the
    rewrites (the scheduled ``ANALYZE`` leg): compaction/zorder mint
    fresh block ids, which drops those blocks from stats coverage — this
    restores full metadata-only answers in the same housekeeping pass.

    Returns a stats dict: ``files_merged``, ``blocks_rewritten``,
    ``compact_skipped`` (True when ``compact_rows`` was requested on a
    zero-copy external index — nothing engine-owned to rewrite),
    ``zordered``, ``folded``, ``meta_dirs_removed``,
    ``data_dirs_removed``."""
    out = {
        "files_merged": 0,
        "blocks_rewritten": 0,
        "compact_skipped": False,
        "zordered": False,
        "folded": False,
        "meta_dirs_removed": 0,
        "data_dirs_removed": 0,
    }
    idx = BloomIndex.load(spark, root)
    idx, stats = merge_files(
        spark, idx, max_blocks_per_file, max_files_per_merge,
        conflict_retries=conflict_retries,
    )
    out["files_merged"] = stats.files_before - stats.files_after
    if compact_rows is not None:
        if idx.meta().get("external"):
            # zero-copy external index: there are no engine-owned block
            # files to rewrite — skip rather than abort the remaining
            # housekeeping steps mid-sequence
            out["compact_skipped"] = True
        else:
            idx, cstats = compact_blocks(
                spark, idx, compact_rows, conflict_retries=conflict_retries,
                where=where,
            )
            out["blocks_rewritten"] = cstats.blocks_rewritten
    if zorder_by:
        if idx.meta().get("external") or idx.meta().get("data_dir_override"):
            out["compact_skipped"] = True  # nothing engine-owned to rewrite
        else:
            idx, zstats = optimize_zorder(
                spark, idx, list(zorder_by), conflict_retries=conflict_retries,
                where=where,
            )
            out["zordered"] = True
            out["blocks_rewritten"] += zstats.blocks_rewritten
    if purge_dvs:
        if idx.meta().get("data_dir_override"):
            out["purge_skipped"] = True  # shallow clone: dirs not ours
        else:
            idx, pstats = purge_deletion_vectors(
                spark, idx, conflict_retries=conflict_retries
            )
            out["dv_purged_rows"] = pstats.rows_deleted
            out["blocks_rewritten"] += pstats.blocks_rewritten
    if analyze_columns:
        # recompute ANALYZE stats AFTER the rewrites (the ``ANALYZE`` leg
        # of a scheduled OPTIMIZE): compaction/zorder minted fresh block
        # ids, so pre-existing stats just lost coverage — re-analyzing
        # here restores full metadata-only answers in the same pass.
        # External overlays have no analyze (refused there by design).
        if idx.meta().get("external"):
            out["analyze_skipped"] = True
        else:
            from .analyze import analyze as _analyze

            _analyze(
                spark, root, list(analyze_columns),
                conflict_retries=conflict_retries,
            )
            out["analyzed"] = True
    idx = BloomIndex.load(spark, root)  # racing commits may have landed
    if len(idx.table_refs()["blocks"]) > fold_threshold:
        fold_manifest(spark, idx, conflict_retries=conflict_retries)
        out["folded"] = True
    if run_vacuum:
        # ONE retained-window resolution shared by both vacuums: a
        # retain_time window evaluated at two instants (or retain_versions
        # across a racing commit) could retain a version's metadata while
        # deleting its data.  Data vacuum runs FIRST so any remaining skew
        # (CURRENT advancing between the calls) leaves orphan data for the
        # next pass, never a retained snapshot with missing files.
        retained = mf.travel_retained(root, retain_versions, retain_time)
        out["data_dirs_removed"] = vacuum(
            BloomIndex.load(spark, root), retain_names=retained
        )
        out["meta_dirs_removed"] = vacuum_manifest(
            BloomIndex.load(spark, root),
            staging_ttl=staging_ttl,
            retain_names=retained,
        )
    return out
