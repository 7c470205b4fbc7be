"""bloomsearch_spark — a PySpark-native hierarchical bloom-filter keyword
index (field / token / field:token existence search with AND/OR combinators,
partition + minmax prefilters, final-stage field regex), built from scratch
as mergeable bitset sketches over an Iceberg-style table of source-code
repositories.  See SURVEY.md for the structural analysis of the reference
(danthegoodman1/bloomsearch) this re-expresses Spark-first.
"""

from .bloom import BloomParams, sizing
from .config import IndexConfig
from .query import (
    And,
    Between,
    BloomExpr,
    Condition,
    Eq,
    Field,
    FieldRegex,
    FieldToken,
    Gt,
    Gte,
    In,
    Lt,
    Lte,
    MinMax,
    Ne,
    NotBetween,
    NotIn,
    Or,
    Partition,
    PrefilterAnd,
    PrefilterOr,
    Query,
    QueryBuilder,
    RegexAnd,
    RegexOr,
    Token,
    new_query,
)
from .plans.build import build_index
from .plans.external import build_external_index
from .operators.constraints import ConstraintViolation
from .plans.merge import (
    DeleteStats,
    add_constraint,
    apply_changes_batch,
    clone,
    drop_constraint,
    MergeStats,
    compact_blocks,
    expire_blocks,
    fold_manifest,
    fsck,
    delete_where,
    maintain,
    merge_files,
    optimize_zorder,
    purge_deletion_vectors,
    restore,
    upsert_keys,
    vacuum,
    vacuum_manifest,
)
from .partition import partition_value
from .plans.analyze import analyze, approx_distinct_meta
from .plans.colmap import drop_column, rename_column
from .plans.metaquery import (
    describe_detail,
    metadata_bounds,
    metadata_count,
    partition_stats,
)
from .plans.needles import search_needles
from .plans.search import (
    QueryStats,
    enable_read_checksum_verification,
    search,
    verify_integrity,
)
from .sources.datasource import BloomSearchDataSource
from .sources.manifest import BloomIndex, CommitConflict
from .tokenizer import Tokenizer, get_tokenizer, register_tokenizer

__all__ = [
    "And", "Between", "BloomExpr", "BloomIndex", "BloomParams", "Condition",
    "Eq", "Field", "FieldRegex", "FieldToken", "Gt", "Gte", "In", "IndexConfig",
    "DeleteStats", "Lt", "Lte", "MergeStats", "MinMax", "Ne", "NotBetween", "NotIn", "Or",
    "Partition", "PrefilterAnd", "PrefilterOr", "Query", "QueryBuilder",
    "QueryStats", "RegexAnd", "RegexOr", "Token", "Tokenizer",
    "apply_changes_batch", "build_external_index", "clone", "build_index", "compact_blocks", "delete_where", "expire_blocks",
    "get_tokenizer", "merge_files", "new_query", "optimize_zorder", "register_tokenizer", "restore",
    "ConstraintViolation", "add_constraint", "drop_constraint",
    "purge_deletion_vectors", "search", "sizing", "upsert_keys", "vacuum",
    "verify_integrity",
    "enable_read_checksum_verification",
    "CommitConflict", "fold_manifest", "maintain", "vacuum_manifest",
    "BloomSearchDataSource", "metadata_count", "partition_stats",
    "search_needles", "rename_column", "drop_column",
    "analyze", "approx_distinct_meta", "partition_value", "fsck",
    "describe_detail", "metadata_bounds",
]
