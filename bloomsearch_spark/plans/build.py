"""Index build plan — one shuffle, one source pass, atomic manifest commit.

Shape (SURVEY.md §3.1 "Spark rebuild lifecycle"):

    source_df
      -> withColumn(partition_id = <user partition expr>)         (W2)
      -> withColumn(content_sha = sha2(sha_col, 256))             (W11 invariant)
      -> deterministic block/file assignment WITHOUT windows:
           counts = groupBy(partition_id).count()                 (tiny agg)
           n_blocks = ceil(count / max_block_rows)                (broadcast join)
           block_seq = pmod(xxhash64(*cols), n_blocks)            (salted, skew-proof)
           file_seq  = block_seq // blocks_per_file
      -> groupBy(file_id, block_id, partition_id).applyInPandas:  (ONE shuffle)
           - build 3 block blooms + 3 file-partial blooms + minmax (W3-W6)
           - write the block's own Parquet file (temp + atomic rename) (W7/W9)
           - return one manifest row
      -> rollup groupBy(file_id): OR file partials -> files.parquet (M4-shaped)
      -> write blocks/files/lineage parquet into an uncommitted version dir
      -> atomically swap manifest/CURRENT                          (W12)

Scale notes (100 TB / 1000 executors):
- exactly one full-data shuffle (the grouped map); everything after operates
  on manifest rows (1 row per ~10k-row block).
- skew-proof by construction: blocks are hash-assigned, so a partition with
  30% of all rows simply owns proportionally many ~equal-size blocks — the
  explicit salting the north rule asks for (no hot reducer).
- data files are invisible until the manifest pointer swap, so task retries
  / speculative duplicates leave only unreferenced temp files (same
  atomicity contract as MetaStore.Update, meta_store.go:21).
- resumable: every stage is deterministic (seeded hashing, no timestamps in
  ids); completed stages are detected via _SUCCESS markers and skipped, and
  re-executed stages produce bit-identical bitsets (OR-merge idempotence).
"""

from __future__ import annotations

import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..operators.blockindex import build_block_entry, rollup_file_entry
from ..sources import manifest as mf

STAGING_SCHEMA = (
    "file_id string, block_id string, partition_id string, "
    "data_path string, "
    "row_count long, token_count long, byte_size long, "
    "minmax_min map<string,long>, minmax_max map<string,long>, "
    "expected_items long, fpr double, "
    "field_bloom binary, token_bloom binary, fieldtoken_bloom binary, "
    "file_expected_items long, file_fpr double, "
    "file_field_bloom binary, file_token_bloom binary, file_fieldtoken_bloom binary"
)

_CODEC = {"none": None, "snappy": "snappy", "zstd": "zstd"}

INTERNAL_COLS = ("partition_id", "content_sha", "file_id", "block_id", "_block_seq")


def _arrow_schema(df: DataFrame, drop: tuple[str, ...]) -> pa.Schema:
    """Fixed Arrow schema for block data files so every block writes
    identical types even when a column is all-null in some block."""
    from pyspark.sql.pandas.types import to_arrow_schema

    kept = [f for f in df.schema.fields if f.name not in drop]
    from pyspark.sql.types import StructType

    return to_arrow_schema(StructType(kept))


def assign_blocks(df: DataFrame, cfg: IndexConfig, build_tag: str) -> DataFrame:
    """Deterministic, window-free block/file assignment.

    A tiny per-partition count + broadcast join sizes the block count, then
    a row hash scatters rows uniformly across that partition's blocks.
    Deterministic => identical assignment on re-run (resume safety).
    """
    d = df.withColumn("partition_id", F.expr(cfg.partition_expr).cast("string"))
    if cfg.sha_col:
        d = d.withColumn("content_sha", F.sha2(F.col(cfg.sha_col).cast("string"), 256))

    if cfg.block_expr is not None:
        d = d.withColumn("_block_seq", F.expr(cfg.block_expr).cast("long"))
    else:
        counts = (
            d.groupBy("partition_id")
            .agg(F.ceil(F.count("*") / cfg.max_block_rows).cast("long").alias("_n_blocks"))
            .withColumn("_n_blocks", F.greatest(F.lit(1), F.col("_n_blocks")))
        )
        src_cols = [c for c in df.columns]
        d = d.join(F.broadcast(counts), "partition_id")
        d = d.withColumn(
            "_block_seq",
            F.pmod(F.xxhash64(*[F.col(c) for c in src_cols]), F.col("_n_blocks")),
        ).drop("_n_blocks")
    # slug keeps dir names filesystem-safe; short hash disambiguates slugs
    slug = F.concat(
        F.regexp_replace(F.substring(F.col("partition_id"), 1, 32), "[^A-Za-z0-9_.-]", "_"),
        F.lit("-"),
        F.lpad(F.hex(F.pmod(F.xxhash64("partition_id"), F.lit(1 << 32))), 8, "0"),
    )
    file_seq = (F.col("_block_seq") / cfg.blocks_per_file).cast("long")
    d = d.withColumn("file_id", F.concat(slug, F.lit(f"-{build_tag}-f"), file_seq))
    d = d.withColumn(
        "block_id", F.concat(F.col("file_id"), F.lit("-b"), F.col("_block_seq"))
    ).drop("_block_seq")
    return d


def _make_block_fn(cfg: IndexConfig, data_dir: str, arrow_schema_bytes: bytes):
    """Grouped-map closure: index the block AND write its data file.

    Writing inside the task mirrors the reference's flush worker
    (handleFlush, bloom_tree_engine.go:726-821): data blob + metadata row
    are produced together, and neither is visible until the manifest
    commit.  temp-file + atomic rename makes retried/speculative attempts
    harmless.  ``data_dir`` must be shared storage on a real cluster.
    """
    codec = _CODEC[cfg.compression]

    def fn(key, pdf):
        entry = build_block_entry(key, pdf, cfg)
        file_id, block_id, _ = key
        rel = os.path.join(f"file_id={file_id}", f"block_id={block_id}")
        entry["data_path"] = rel
        d = os.path.join(data_dir, rel)
        os.makedirs(d, exist_ok=True)
        schema = pa.ipc.read_schema(pa.BufferReader(arrow_schema_bytes))
        body = pdf[[n for n in schema.names]]
        tbl = pa.Table.from_pandas(body, schema=schema, preserve_index=False)
        final = os.path.join(d, "part-0.parquet")
        tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(tbl, tmp, compression=codec or "NONE")
        os.replace(tmp, final)
        entry["byte_size"] = os.path.getsize(final)
        return entry

    return fn


def _stage_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def build_index(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    cfg: IndexConfig,
    source_desc: str = "",
    mode: str = "overwrite",
) -> mf.BloomIndex:
    """Build (or append to) a bloom index over ``df`` and commit it.

    ``mode='append'`` adds new files alongside the current manifest's
    (incremental ingest); ``mode='overwrite'`` starts a fresh index.
    Returns a handle to the committed version.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(mode)
    version, vdir = mf.next_version_dir(root)
    build_id = version
    data_dir = os.path.join(root, "data")
    os.makedirs(vdir, exist_ok=True)

    assigned = assign_blocks(df, cfg, build_tag=build_id)

    arrow_schema = _arrow_schema(assigned, drop=("file_id", "block_id"))
    schema_bytes = bytes(arrow_schema.serialize())

    staging = os.path.join(vdir, "staging.parquet")
    if not _stage_done(staging):
        (
            assigned.groupBy("file_id", "block_id", "partition_id")
            .applyInPandas(_make_block_fn(cfg, data_dir, schema_bytes), STAGING_SCHEMA)
            .write.mode("overwrite")
            .parquet(staging)
        )

    st = spark.read.parquet(staging)

    new_blocks = st.select(
        "file_id", "block_id", "partition_id", "data_path", "row_count", "token_count",
        "byte_size", "minmax_min", "minmax_max", "expected_items", "fpr",
        "field_bloom", "token_bloom", "fieldtoken_bloom",
    )
    new_files = st.groupBy("file_id").applyInPandas(rollup_file_entry, mf.FILES_SCHEMA)
    new_lineage = st.select(
        F.lit(build_id).alias("build_id"),
        "file_id", "block_id", "partition_id",
        F.lit(source_desc).alias("source_desc"),
        F.col("row_count").alias("rows_indexed"),
        F.col("token_count").alias("tokens_inserted"),
        F.lit("build").alias("op"),
        F.lit(time.time()).alias("committed_at"),
    )

    if mode == "append" and mf.current_version(root) is not None:
        prev = mf.BloomIndex.load(spark, root)
        new_blocks = prev.blocks().unionByName(new_blocks)
        new_files = prev.files().unionByName(new_files)
        new_lineage = prev.lineage().unionByName(new_lineage)

    for name, d in (("blocks", new_blocks), ("files", new_files), ("lineage", new_lineage)):
        out = os.path.join(vdir, f"{name}.parquet")
        if not _stage_done(out):
            d.write.mode("overwrite").parquet(out)

    mf.write_meta(
        vdir,
        cfg,
        extra={
            "build_id": build_id,
            "source_desc": source_desc,
            "source_columns": list(df.columns),
        },
    )
    mf.commit_version(root, version)
    return mf.BloomIndex(spark, root, version)
