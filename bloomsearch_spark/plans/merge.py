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

Plus ``expire_blocks`` (M9, TTL/prefilter-based expiry) and ``vacuum``
(M8 tombstoning: delete block dirs no longer referenced by CURRENT).

Scale notes: merge *planning* is driver-side pandas over the files
manifest (1 row per file — the reference does the same single-threaded,
:1490); merge *execution* is distributed grouped-maps over manifest rows
and, for consolidation only, over the affected block data.  Both paths
shuffle manifest rows, never the indexed dataset.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import bloom
from ..sources import fs as fsx
from ..sources import manifest as mf
from ..sources.manifest import BloomIndex


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
    (bloom_tree_engine.go:1490-1588); smallest files first; a group closes
    at ``max_blocks_per_file`` blocks, ``max_files_per_merge`` members, or
    ``max_file_bytes`` combined data bytes (MaxFileSize, :1520-1533).
    Only groups with >= 2 members merge.
    """
    mapping: dict[str, str] = {}
    gi = 0
    has_bytes = "byte_size" in files_pdf.columns
    for (pid, n, p), grp in files_pdf.groupby(
        ["partition_id", "expected_items", "fpr"], sort=False
    ):
        grp = grp.sort_values("block_count")
        members: list[str] = []
        blocks = 0
        nbytes = 0
        for _, row in grp.iterrows():
            row_bytes = int(row.byte_size) if has_bytes else 0
            if members and (
                blocks + row.block_count > max_blocks_per_file
                or len(members) >= max_files_per_merge
                or (max_file_bytes is not None and nbytes + row_bytes > max_file_bytes)
            ):
                if len(members) >= 2:
                    gi += 1
                    tgt = f"{members[0]}-m{gi}"
                    for m in members:
                        mapping[m] = tgt
                members, blocks, nbytes = [], 0, 0
            members.append(row.file_id)
            blocks += int(row.block_count)
            nbytes += row_bytes
        if len(members) >= 2:
            gi += 1
            tgt = f"{members[0]}-m{gi}"
            for m in members:
                mapping[m] = tgt
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


# ---------------------------------------------------------------------------
# M1: merge driver
# ---------------------------------------------------------------------------


def merge_files(
    spark: SparkSession,
    index: BloomIndex,
    max_blocks_per_file: int = 64,
    max_files_per_merge: int = 10,
    max_file_bytes: int | None = None,
) -> tuple[BloomIndex, MergeStats]:
    """Metadata-only file compaction: fewer, larger logical files; zero
    data movement.  Commits and returns a new manifest version.

    Files with differing bloom params are left untouched (the reference's
    unmergeable case, bloom_tree_engine_test.go:986-1246)."""
    stats = MergeStats()
    files = index.files()
    blocks = index.blocks()
    files_pdf = files.select(
        "file_id", "partition_id", "block_count", "byte_size", "expected_items", "fpr"
    ).toPandas()
    stats.files_before = len(files_pdf)
    stats.blocks_before = stats.blocks_after = blocks.count()

    mapping = plan_file_merge(
        files_pdf, max_blocks_per_file, max_files_per_merge, max_file_bytes
    )
    if not mapping:
        stats.files_after = stats.files_before
        return index, stats
    stats.groups_merged = len(set(mapping.values()))

    map_df = F.broadcast(
        spark.createDataFrame(
            [(k, v) for k, v in mapping.items()], "file_id string, new_file_id string"
        )
    )

    def repoint(df: DataFrame) -> DataFrame:
        return (
            df.join(map_df, "file_id", "left")
            .withColumn("file_id", F.coalesce("new_file_id", "file_id"))
            .drop("new_file_id")
        )

    new_blocks = repoint(blocks)
    new_files = repoint(files).groupBy("file_id").applyInPandas(
        _merge_file_group, mf.FILES_SCHEMA
    )
    return _commit(
        spark, index, new_blocks, new_files, op="merge", stats=stats
    )


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
    gi = 0
    for _, grp in blocks_pdf.groupby(
        ["file_id", "partition_id", "expected_items", "fpr"], sort=False
    ):
        grp = grp.sort_values("row_count")
        members: list[str] = []
        rows = 0
        for _, row in grp.iterrows():
            if members and rows + row.row_count > max_block_rows:
                if len(members) >= 2:
                    gi += 1
                    for m in members:
                        mapping[m] = f"{members[0]}-c{gi}"
                members, rows = [], 0
            members.append(row.block_id)
            rows += int(row.row_count)
        if len(members) >= 2:
            gi += 1
            for m in members:
                mapping[m] = f"{members[0]}-c{gi}"
    return mapping


def _make_consolidate_fn(data_dir: str, codec_kw: dict):
    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        block_id = key[0]
        if len(pdf) == 1:  # singleton group: pass the manifest row through
            return pdf.drop(columns=["merge_block_id"])
        file_id = pdf["file_id"].iloc[0]
        rel = fsx.join(f"file_id={file_id}", f"block_id={block_id}")
        import pyarrow as pa

        tbl = pa.concat_tables(
            [fsx.read_parquet_dir(fsx.join(data_dir, p)) for p in pdf["data_path"]],
            promote_options="default",
        )
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
                    "row_count": int(pdf["row_count"].sum()),
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
) -> tuple[BloomIndex, MergeStats]:
    """Rewrite undersized sibling blocks into consolidated block dirs.

    Block blooms OR together (M4) and minmax maps widen (M5) — no
    re-tokenization; only the affected blocks' row data is read/written.
    File-level rows are unchanged (their blooms already cover the union).
    """
    cfg = index.config
    if index.meta().get("external", False):
        raise ValueError(
            "compact_blocks rewrites block data and is not applicable to a "
            "zero-copy external index; use merge_files (metadata-only)"
        )
    target = max_block_rows or cfg.max_block_rows
    stats = MergeStats()
    blocks = index.blocks()
    stats.blocks_before = blocks.count()
    stats.files_before = stats.files_after = index.files().count()

    plan_pdf = blocks.select(
        "file_id", "block_id", "partition_id", "row_count", "expected_items", "fpr"
    ).toPandas()
    mapping = plan_block_merge(plan_pdf, target)
    if not mapping:
        stats.blocks_after = stats.blocks_before
        return index, stats
    stats.blocks_rewritten = len(mapping)
    stats.groups_merged = len(set(mapping.values()))

    map_df = F.broadcast(
        spark.createDataFrame(
            [(k, v) for k, v in mapping.items()], "block_id string, merged string"
        )
    )
    staged = (
        blocks.join(map_df, "block_id", "left")
        .withColumn("merge_block_id", F.coalesce("merged", "block_id"))
        .drop("merged")
    )
    from .build import codec_kwargs

    new_blocks = staged.groupBy("merge_block_id").applyInPandas(
        _make_consolidate_fn(index.data_dir, codec_kwargs(cfg)), mf.BLOCKS_SCHEMA
    )
    return _commit(spark, index, new_blocks, index.files(), op="compact", stats=stats)


# ---------------------------------------------------------------------------
# M9: TTL / predicate expiry
# ---------------------------------------------------------------------------


def expire_blocks(
    spark: SparkSession, index: BloomIndex, expired: Column
) -> tuple[BloomIndex, MergeStats]:
    """Drop blocks matching ``expired`` (a Column over block-manifest rows,
    e.g. a minmax/partition predicate — README.md:283-287).  File rows with
    no remaining blocks are dropped; partially-expired files keep their
    (now conservative, still sound) blooms — bloom filters only disqualify.
    """
    stats = MergeStats()
    blocks = index.blocks()
    stats.blocks_before = blocks.count()
    stats.files_before = index.files().count()
    # null predicate result (e.g. a minmax key the block lacks) must NOT
    # expire the block — expiry is opt-in, pruning is conservative
    new_blocks = blocks.filter(~F.coalesce(expired, F.lit(False)))
    live_files = new_blocks.select("file_id").distinct()
    new_files = index.files().join(F.broadcast(live_files), "file_id", "left_semi")
    return _commit(spark, index, new_blocks, new_files, op="expire", stats=stats)


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
) -> tuple[BloomIndex, MergeStats]:
    """Write a new manifest version (blocks/files/lineage) and atomically
    advance CURRENT — the MetaStore.Update contract (meta_store.go:21)."""
    version, vdir = mf.next_version_dir(index.root)
    fsx.mkdirs(vdir)
    new_blocks.write.mode("overwrite").parquet(fsx.join(vdir, "blocks.parquet"))
    committed_blocks = spark.read.schema(mf.BLOCKS_SCHEMA).parquet(
        fsx.join(vdir, "blocks.parquet")
    )
    new_files.write.mode("overwrite").parquet(fsx.join(vdir, "files.parquet"))

    lineage_new = committed_blocks.select(
        F.lit(version).alias("build_id"),
        "file_id",
        "block_id",
        "partition_id",
        F.lit(op).alias("source_desc"),
        F.col("row_count").alias("rows_indexed"),
        F.col("token_count").alias("tokens_inserted"),
        F.lit(op).alias("op"),
        F.lit(time.time()).alias("committed_at"),
    )
    index.lineage().unionByName(lineage_new).write.mode("overwrite").parquet(
        fsx.join(vdir, "lineage.parquet")
    )
    meta = index.meta()
    mf.write_meta(
        vdir,
        index.config,
        extra={
            "build_id": version,
            "source_desc": f"{op} of {index.version}",
            "source_columns": meta.get("source_columns"),
            "parent_version": index.version,
            # merges only combine equal-param blooms (M2/M3 gates), so the
            # parent's uniformity carries over unchanged
            "uniform_params": meta.get("uniform_params"),
            **({"external": True} if meta.get("external") else {}),
        },
    )
    mf.commit_version(index.root, version)
    out = mf.BloomIndex(spark, index.root, version)
    stats.files_after = out.files().count()
    stats.blocks_after = out.blocks().count()
    return out, stats


def vacuum(index: BloomIndex) -> int:
    """Delete block data dirs not referenced by the CURRENT manifest
    (TombstoneFile analog, data_store.go:19-21).  Safe only once no reader
    resolves an older manifest version.  Returns dirs removed.

    DISTRIBUTED end to end (bounded driver memory at any block count): the
    driver lists only the top-level ``file_id=`` dirs (one per FILE, ~2
    orders fewer than blocks); executors list each file dir's block dirs,
    the listing anti-joins the blocks manifest (never collected), and the
    dead dirs are deleted on executors through the fs layer.  Requires the
    data root to be shared storage — already true for any multi-executor
    deployment."""
    spark = index.spark
    data_dir = index.data_dir
    file_dirs = fsx.list_subdirs(data_dir)
    if not file_dirs:
        return 0
    fd_df = spark.createDataFrame([(d,) for d in file_dirs], "file_dir string")
    # spread the per-file-dir listing work across the cluster
    fd_df = fd_df.repartition(min(len(file_dirs), 64))

    def list_blocks(pdfs):
        for pdf in pdfs:
            rows = [
                fsx.join(fd, bd)
                for fd in pdf["file_dir"]
                for bd in fsx.list_subdirs(fsx.join(data_dir, fd))
            ]
            yield pd.DataFrame({"data_path": rows})

    listed = fd_df.mapInPandas(list_blocks, "data_path string")
    dead = listed.join(
        index.blocks().select("data_path"), "data_path", "left_anti"
    )

    def delete(pdfs):
        n = 0
        for pdf in pdfs:
            for p in pdf["data_path"]:
                fsx.delete_dir(fsx.join(data_dir, p))
                n += 1
        yield pd.DataFrame({"n": [n]})

    removed = (
        dead.mapInPandas(delete, "n long").agg(F.sum("n")).collect()[0][0] or 0
    )
    if removed:
        for fd in file_dirs:  # drop now-empty file dirs (one stat per FILE)
            fsx.delete_dir_if_empty(fsx.join(data_dir, fd))
    return int(removed)
