"""Query execution plan — top-down hierarchical pruning, then exact scan.

Mirrors the reference read path (SURVEY.md §3.2; bloom_tree_engine.go:910-1204)
as one declarative pipeline:

    manifest blocks --(prefilter: partition/minmax Columns)-->   Q3-Q6
    manifest files  --(file-level bloom probe UDF)------------>  Q9
    blocks ∩ surviving files --(block-level probe UDF)-------->  Q10
    pruned Parquet scan of surviving (file_id, block_id) dirs -> Q11
    exact verify predicate ∧ final regex filter --------------->  Q12-Q13

The regex field-guard rewrite (Q14) is applied when building the prune
tree (Query.prune_bloom).  The surviving-block list is collected to the
driver when small (the reference's MetaStore "MaybeFile" contract,
meta_store.go:33-41) and turned into an explicit path-list scan — zero
wasted I/O; above a threshold it falls back to a broadcast semi-join
against the full data root so the plan never materializes an unbounded
driver list.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.probe import probe_filter
from ..operators.verify import compile_bloom_verify, compile_regex_verify, json_verify_udf
from ..query import Query, compile_prefilter
from ..sources.manifest import BloomIndex

# above this many surviving blocks, switch from an explicit path-list scan
# to a broadcast semi-join (keeps the driver list bounded at huge scale)
MAX_COLLECTED_BLOCKS = 100_000


@dataclass
class QueryStats:
    """Prune-funnel counters (the reference's BlockStats / BloomFilterSkipped,
    bloom_tree_engine.go:137-147, 1078-1095)."""

    total_files: int = 0
    total_blocks: int = 0
    blocks_after_prefilter: int = 0
    files_after_file_bloom: int = 0
    blocks_after_block_bloom: int = 0
    extra: dict = field(default_factory=dict)

    @property
    def prune_ratio(self) -> float:
        """Fraction of all blocks eliminated before any data was read."""
        if self.total_blocks == 0:
            return 0.0
        return 1.0 - self.blocks_after_block_bloom / self.total_blocks


def prune_blocks(
    index: BloomIndex, query: Query, stats: QueryStats | None = None
) -> DataFrame:
    """Manifest-level pruning: prefilter -> file blooms -> block blooms.

    Returns the surviving slice of the block manifest (still lazy unless
    stats are requested).
    """
    blocks = index.blocks()
    files = index.files()

    pre = compile_prefilter(query.prefilter)
    blocks_f = blocks.filter(pre)

    prune_tree = query.prune_bloom()
    if prune_tree is not None:
        files_f = files.filter(probe_filter(prune_tree)).select("file_id")
        # file manifest << block manifest: broadcast the survivors
        blocks_f = blocks_f.join(F.broadcast(files_f), "file_id", "left_semi")
        blocks_f = blocks_f.filter(probe_filter(prune_tree))

    if stats is not None:
        stats.total_files = files.count()
        stats.total_blocks = blocks.count()
        stats.blocks_after_prefilter = blocks.filter(pre).count()
        if prune_tree is not None:
            stats.files_after_file_bloom = files.filter(probe_filter(prune_tree)).count()
        else:
            stats.files_after_file_bloom = stats.total_files
    return blocks_f


def scan_blocks(index: BloomIndex, surviving: DataFrame) -> DataFrame:
    """Read only the surviving blocks' data directories (via ``data_path``,
    which stays valid across metadata-only merges)."""
    spark = index.spark
    if index.meta().get("external", False):
        return _scan_external(index, surviving)
    keys_df = surviving.select("data_path")
    keys = keys_df.limit(MAX_COLLECTED_BLOCKS + 1).collect()
    if len(keys) > MAX_COLLECTED_BLOCKS:
        # huge survivor set: scan the data root, prune via broadcast semi-join
        # on the relative path reconstructed from the hive partition dirs
        data = spark.read.option("basePath", index.data_dir).parquet(index.data_dir)
        data = data.withColumn(
            "data_path",
            F.concat(F.lit("file_id="), "file_id", F.lit("/block_id="), "block_id"),
        )
        return data.join(F.broadcast(keys_df), ["data_path"], "left_semi")
    if not keys:
        data = spark.read.option("basePath", index.data_dir).parquet(index.data_dir)
        return data.limit(0)
    paths = index.block_paths([r.data_path for r in keys])
    return spark.read.option("basePath", index.data_dir).parquet(*paths)


def _scan_external(index: BloomIndex, surviving: DataFrame) -> DataFrame:
    """Pruned scan for a zero-copy external index: read the surviving
    SOURCE files; since several partition-blocks can share one physical
    file, re-derive (data_path, partition_id) per row and semi-join against
    the surviving pairs — row-exact block semantics
    (plans/external.py module docstring)."""
    spark = index.spark
    cfg = index.config
    pairs = surviving.select("data_path", "partition_id")
    keys = pairs.limit(MAX_COLLECTED_BLOCKS + 1).collect()
    if len(keys) > MAX_COLLECTED_BLOCKS:
        paths = [
            r.data_path
            for r in index.blocks().select("data_path").distinct().collect()
        ]
    else:
        paths = sorted({r.data_path for r in keys})
    if not paths:
        all_paths = [
            r.data_path for r in index.blocks().select("data_path").distinct().limit(1).collect()
        ]
        if not all_paths:
            raise ValueError("external index has no blocks")
        return spark.read.parquet(all_paths[0]).limit(0)
    data = (
        spark.read.parquet(*paths)
        .withColumn("data_path", F.input_file_name())
        .withColumn(
            "partition_id",
            F.coalesce(F.expr(cfg.partition_expr).cast("string"), F.lit("")),
        )
    )
    return data.join(F.broadcast(pairs), ["data_path", "partition_id"], "left_semi").drop(
        "data_path", "partition_id"
    )


def search(
    spark: SparkSession,
    index: BloomIndex,
    query: Query,
    with_stats: bool = False,
):
    """Run a query against a committed index.

    Returns the matching source rows as a DataFrame (original columns
    only), optionally with a QueryStats prune funnel.
    """
    cfg = index.config
    stats = QueryStats() if with_stats else None
    surviving = prune_blocks(index, query, stats)
    data = scan_blocks(index, surviving)

    if cfg.json_col is not None:
        pred = json_verify_udf(query.bloom, query.regex)(F.col(cfg.json_col))
    else:
        cols = data.columns
        pred = compile_bloom_verify(query.bloom, cfg.indexed_fields, cols) & (
            compile_regex_verify(query.regex, cols)
        )
    out = data.filter(pred)

    source_columns = index.meta().get("source_columns")
    if source_columns:
        out = out.select(*[c for c in source_columns if c in out.columns])

    if with_stats:
        stats.blocks_after_block_bloom = surviving.count()
        return out, stats
    return out


def verify_integrity(spark: SparkSession, index: BloomIndex) -> int:
    """Per-row content-sha256 invariant check (W11 analog): recompute
    sha2(sha_col) over every stored row and count mismatches (0 = intact)."""
    cfg = index.config
    if index.meta().get("external", False):
        # external data is never copied -> per-row sha equality holds by
        # construction; the integrity check is a per-block row re-count
        from .external import verify_external_integrity

        return verify_external_integrity(spark, index)
    if not cfg.sha_col:
        raise ValueError("index was built without sha_col")
    # scan only manifest-referenced block dirs (the data root may also hold
    # superseded pre-merge dirs until vacuum runs)
    data = scan_blocks(index, index.blocks())
    bad = data.filter(
        F.sha2(F.col(cfg.sha_col).cast("string"), 256) != F.col("content_sha")
    )
    return bad.count()
