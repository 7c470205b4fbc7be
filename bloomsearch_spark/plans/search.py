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
from ..tokenizer import get_tokenizer

# above this many surviving blocks, switch from an explicit path-list scan
# to a broadcast semi-join (keeps the driver list bounded at huge scale)
MAX_COLLECTED_BLOCKS = 100_000

_AQE_EMPTY_RULE = "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"


class _keep_observations:
    """Context manager: exclude AQE empty-relation propagation for the
    duration of a stats-mode collect, so fully-pruned funnels still execute
    their CollectMetrics nodes (otherwise AQE folds the plan to an empty
    relation and the Observations never fill)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        conf = self.spark.conf
        self.prev = conf.get("spark.sql.adaptive.optimizer.excludedRules", None)
        rules = [r for r in (self.prev or "").split(",") if r]
        if _AQE_EMPTY_RULE not in rules:
            rules.append(_AQE_EMPTY_RULE)
        conf.set("spark.sql.adaptive.optimizer.excludedRules", ",".join(rules))

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset("spark.sql.adaptive.optimizer.excludedRules")
        else:
            self.spark.conf.set("spark.sql.adaptive.optimizer.excludedRules", self.prev)


@dataclass
class QueryStats:
    """Prune-funnel counters (the reference's BlockStats / BloomFilterSkipped,
    bloom_tree_engine.go:137-147, 1078-1095).

    ONE-PASS collection: the counters ride the query's own manifest probe
    job as ``Observation`` metrics (CollectMetrics plan nodes over the
    blocks/files manifests) plus the length of the surviving-path list the
    scan collects anyway — zero extra Spark jobs, matching the reference's
    stats-streamed-during-scan design (bloom_tree_engine.go:1078-1095).
    The r01 implementation re-derived each funnel stage with 4-5 separate
    count() jobs per stats-enabled query."""

    total_files: int = 0
    total_blocks: int = 0
    blocks_after_prefilter: int = 0
    files_after_file_bloom: int = 0
    blocks_after_block_bloom: int = 0
    extra: dict = field(default_factory=dict)
    _obs_blocks: object | None = field(default=None, repr=False)
    _obs_files: object | None = field(default=None, repr=False)
    _fallback: tuple | None = field(default=None, repr=False)

    def _finalize(self) -> None:
        """Pull the observed metrics (the triggering action has already run
        by the time search() returns).  When the whole funnel pruned to
        empty, AQE's empty-relation propagation removes the CollectMetrics
        nodes from the executed plan and ``Observation.get`` raises — fall
        back to recomputing those counters with count() jobs (rare, and the
        manifests are cached + no data scan happened for such queries)."""
        blocks, pre, files, fpred = self._fallback or (None, None, None, None)
        if self._obs_blocks is not None:
            try:
                m = self._obs_blocks.get
                self.total_blocks = int(m["total_blocks"])
                self.blocks_after_prefilter = int(m["blocks_after_prefilter"])
            except Exception:
                if blocks is not None:
                    self.total_blocks = blocks.count()
                    self.blocks_after_prefilter = blocks.filter(pre).count()
            self._obs_blocks = None
        if self._obs_files is not None:
            try:
                m = self._obs_files.get
                self.total_files = int(m["total_files"])
                self.files_after_file_bloom = int(m["files_after_file_bloom"])
            except Exception:
                if files is not None:
                    self.total_files = files.count()
                    self.files_after_file_bloom = files.filter(fpred).count()
            self._obs_files = None
        self._fallback = None

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
    prune_tree = query.prune_bloom()

    if stats is not None:
        # funnel counters as CollectMetrics nodes: filled by whatever action
        # executes this plan (the scan's path collect) — no extra jobs
        from pyspark.sql import Observation

        obs_b = Observation()
        blocks_f = (
            blocks.withColumn("_pre", pre)
            .observe(
                obs_b,
                F.count(F.lit(1)).alias("total_blocks"),
                F.coalesce(F.sum(F.col("_pre").cast("long")), F.lit(0)).alias(
                    "blocks_after_prefilter"
                ),
            )
            .filter(F.col("_pre"))
            .drop("_pre")
        )
        stats._obs_blocks = obs_b
    else:
        blocks_f = blocks.filter(pre)

    if prune_tree is not None:
        # param-homogeneous manifests (the common case) compile the bloom
        # probe to pure-JVM byte tests — no bitset bytes reach Python
        fpred = probe_filter(prune_tree, index.uniform_params("files"))
        bparams = index.uniform_params("blocks")
        if stats is not None:
            obs_f = Observation()
            files_f = (
                files.withColumn("_fok", fpred)
                .observe(
                    obs_f,
                    F.count(F.lit(1)).alias("total_files"),
                    F.coalesce(F.sum(F.col("_fok").cast("long")), F.lit(0)).alias(
                        "files_after_file_bloom"
                    ),
                )
                .filter(F.col("_fok"))
                .select("file_id")
            )
            stats._obs_files = obs_f
        else:
            files_f = files.filter(fpred).select("file_id")
        # file manifest << block manifest: broadcast the survivors
        blocks_f = blocks_f.join(F.broadcast(files_f), "file_id", "left_semi")
        blocks_f = blocks_f.filter(probe_filter(prune_tree, bparams))
    elif stats is not None:
        # match-all: the files manifest is not part of the plan; one cheap
        # count over the (cached, manifest-sized) files df
        stats.total_files = files.count()
        stats.files_after_file_bloom = stats.total_files
    if stats is not None:
        stats._fallback = (
            blocks,
            pre,
            files,
            probe_filter(prune_tree) if prune_tree is not None else None,
        )
    return blocks_f


def scan_blocks(
    index: BloomIndex, surviving: DataFrame, stats: QueryStats | None = None
) -> DataFrame:
    """Read only the surviving blocks' data directories (via ``data_path``,
    which stays valid across metadata-only merges).

    With ``stats``, the path collect is unlimited (stats mode must see every
    survivor to count them — and its collect is the action that fills the
    upstream funnel Observations; a LIMIT would short-circuit them)."""
    spark = index.spark
    if index.meta().get("external", False):
        return _scan_external(index, surviving, stats)
    keys_df = surviving.select("data_path")
    if stats is not None:
        with _keep_observations(spark):
            keys = keys_df.collect()
        stats.blocks_after_block_bloom = len(keys)
        stats._finalize()
    else:
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
        # empty survivor set: derive the scan schema from ONE block dir —
        # listing the whole data root for a limit(0) costs seconds at 10^3+
        # blocks (measured 3.2 s for a miss query over 960 blocks)
        some = index.blocks().select("data_path").limit(1).collect()
        if some:
            one = index.block_paths([some[0].data_path])[0]
            return (
                spark.read.option("basePath", index.data_dir).parquet(one).limit(0)
            )
        data = spark.read.option("basePath", index.data_dir).parquet(index.data_dir)
        return data.limit(0)
    paths = index.block_paths([r.data_path for r in keys])
    return spark.read.option("basePath", index.data_dir).parquet(*paths)


def _scan_external(
    index: BloomIndex, surviving: DataFrame, stats: QueryStats | None = None
) -> DataFrame:
    """Pruned scan for a zero-copy external index: read the surviving
    SOURCE files; since several partition-blocks can share one physical
    file, re-derive (data_path, partition_id) per row and semi-join against
    the surviving pairs — row-exact block semantics
    (plans/external.py module docstring)."""
    spark = index.spark
    cfg = index.config
    pairs = surviving.select("data_path", "partition_id")
    if stats is not None:
        with _keep_observations(spark):
            keys = pairs.collect()
        stats.blocks_after_block_bloom = len(keys)
        stats._finalize()
    else:
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
    data = scan_blocks(index, surviving, stats)

    tok = get_tokenizer(cfg.tokenizer)
    if cfg.json_col is not None:
        pred = json_verify_udf(query.bloom, query.regex, tok)(F.col(cfg.json_col))
    else:
        cols = data.columns
        pred = compile_bloom_verify(query.bloom, cfg.indexed_fields, cols, tok) & (
            compile_regex_verify(query.regex, cols)
        )
    out = data.filter(pred)

    source_columns = index.meta().get("source_columns")
    if source_columns:
        out = out.select(*[c for c in source_columns if c in out.columns])

    if with_stats:
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
