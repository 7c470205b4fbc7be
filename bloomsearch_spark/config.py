"""Index configuration.

Mirrors the knobs of the reference ``DefaultBloomSearchEngineConfig``
(bloom_tree_engine.go:204-229): block/file bloom sizing, row-group row cap,
compression codec, partition function, minmax-indexed fields — re-expressed
for a Spark build where the "partition function" is a SQL expression and
tokenized fields are declared columns of a fixed-schema table (or a single
JSON document column for the schemaless compatibility path).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .bloom import BloomParams

DEFAULT_BLOCK_ROWS = 10_000  # MaxRowGroupRows default, bloom_tree_engine.go:208
DEFAULT_FILE_EXPECTED_ITEMS = 100_000  # FileBloomExpectedItems, :220
DEFAULT_FPR = 0.001  # BloomFalsePositiveRate, :221


@dataclass(frozen=True)
class IndexConfig:
    """Configuration for one index build.

    - ``indexed_fields``: columns whose values are tokenized into the
      token / field:token blooms (fixed-schema path).  Field names go into
      the field bloom for blocks where the column is non-null.
    - ``json_col``: if set, rows are schemaless JSON documents in this
      column and fields are discovered per row by structural walking
      (reference ingest semantics, tokenizer.go:29-83); ``indexed_fields``
      is ignored.
    - ``partition_expr``: SQL expression producing the partition_id string
      (the reference's user ``PartitionFunc``, bloom_tree_engine.go:101).
    - ``minmax_fields``: numeric columns (or top-level JSON fields) that get
      per-block int64 zone maps (floor for min / ceil for max on floats,
      min_max.go:16-28).
    - ``max_block_rows``: target rows per data block. Block assignment is
      deterministic hashing, so this is a *target*, not a hard cap (sizes
      concentrate within a few percent of target at scale).
    - ``blocks_per_file``: data blocks grouped into one logical file.
    """

    indexed_fields: tuple[str, ...] = ()
    json_col: str | None = None
    partition_expr: str = "''"
    # optional SQL expression overriding hash block assignment (long-valued
    # block sequence within the partition) — user-controlled clustering,
    # e.g. "doc_id" for row-exact zone maps or a date bucket for TTL expiry
    block_expr: str | None = None
    minmax_fields: tuple[str, ...] = ()
    max_block_rows: int = DEFAULT_BLOCK_ROWS
    max_block_bytes: int | None = None  # MaxRowGroupBytes (10 MB default there)
    blocks_per_file: int = 10
    block_fpr: float = DEFAULT_FPR
    file_fpr: float = DEFAULT_FPR
    file_expected_items: int = DEFAULT_FILE_EXPECTED_ITEMS
    compression: str = "snappy"  # none | snappy | zstd (file_format.go:147-151)
    # zstd compression level for block data files (reference
    # ZstdCompressionLevel, bloom_tree_engine.go:46-80); None = pyarrow
    # default.  Only meaningful with compression="zstd".
    zstd_level: int | None = None
    # Named value tokenizer (the reference's ValueTokenizerFunc,
    # tokenizer.go:86-99): must be registered via
    # tokenizer.register_tokenizer on build AND query sides; the name is
    # persisted in meta.json so verify re-derives tokens identically.
    tokenizer: str = "whitespace_lower"
    sha_col: str | None = None  # column to sha256 for the per-row invariant
    # External-data mode (build_external_index): the index OVERLAYS the
    # source parquet files in place — a "block" is one (source file,
    # partition value) and data_path points at the source file itself.
    # Zero bytes of row data are copied; the build is a single read pass.
    # Set automatically by build_external_index.
    external_data: bool = False
    # If True, the build does ONE salted repartition by (partition_id, salt)
    # where salt = row-hash mod task count: a dominant partition spreads
    # over every task (no hot task on skew) and large partitions produce
    # full blocks.  The scatter is global, so the tail cost is at most one
    # partial block per (partition, task) pair touched — many tiny
    # partitions fragment rather than co-locate.  If False (default),
    # the build is map-only with ZERO data shuffle; block fill then depends
    # on how the input is clustered (ideal when the source table is already
    # partitioned by the same key, e.g. an Iceberg table partitioned by lang).
    cluster_input: bool = False
    # Hidden partitioning (Iceberg transform analog, partition.py): a
    # declared transform spec — "identity:<col>", "bucket:<N>:<col>",
    # "truncate:<W>:<col>", "years|months|days|hours:<col>".  Setting it
    # DERIVES partition_expr (leave partition_expr default) and lets read
    # paths (DataSource pushdown, partition_value helper) prune partitions
    # from ordinary predicates on the source column.
    partition_transform: str | None = None

    def __post_init__(self):
        if self.partition_transform:
            from .partition import transform_sql

            derived = transform_sql(self.partition_transform)
            if self.partition_expr not in ("''", derived):
                raise ValueError(
                    "partition_transform derives partition_expr — set one "
                    "or the other, not both"
                )
            object.__setattr__(self, "partition_expr", derived)
        if self.compression not in ("none", "snappy", "zstd"):
            raise ValueError(
                f"compression must be none|snappy|zstd, got {self.compression!r}"
            )
        if self.zstd_level is not None:
            if self.compression != "zstd":
                raise ValueError("zstd_level requires compression='zstd'")
            if not (1 <= self.zstd_level <= 22):
                raise ValueError(f"zstd_level must be in [1, 22], got {self.zstd_level}")
        from .tokenizer import get_tokenizer

        get_tokenizer(self.tokenizer)  # raises KeyError if unregistered
        if self.max_block_rows <= 0 or self.blocks_per_file <= 0:
            raise ValueError("max_block_rows and blocks_per_file must be > 0")
        for p in (self.block_fpr, self.file_fpr):
            if not (0.0 < p < 1.0):
                raise ValueError(f"false positive rate must be in (0,1), got {p}")
        if self.json_col is not None and self.indexed_fields:
            raise ValueError(
                "json_col (schemaless) and indexed_fields (fixed schema) are "
                "mutually exclusive"
            )

    @property
    def block_params(self) -> BloomParams:
        return BloomParams(self.max_block_rows, self.block_fpr)

    @property
    def file_params(self) -> BloomParams:
        return BloomParams(self.file_expected_items, self.file_fpr)

    def to_dict(self) -> dict:
        return {
            "indexed_fields": list(self.indexed_fields),
            "json_col": self.json_col,
            "partition_expr": self.partition_expr,
            "block_expr": self.block_expr,
            "minmax_fields": list(self.minmax_fields),
            "max_block_rows": self.max_block_rows,
            "max_block_bytes": self.max_block_bytes,
            "blocks_per_file": self.blocks_per_file,
            "block_fpr": self.block_fpr,
            "file_fpr": self.file_fpr,
            "file_expected_items": self.file_expected_items,
            "compression": self.compression,
            "zstd_level": self.zstd_level,
            "tokenizer": self.tokenizer,
            "sha_col": self.sha_col,
            "external_data": self.external_data,
            "cluster_input": self.cluster_input,
            "partition_transform": self.partition_transform,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "IndexConfig":
        return cls(
            indexed_fields=tuple(d.get("indexed_fields", ())),
            json_col=d.get("json_col"),
            partition_expr=d.get("partition_expr", "''"),
            block_expr=d.get("block_expr"),
            minmax_fields=tuple(d.get("minmax_fields", ())),
            max_block_rows=d.get("max_block_rows", DEFAULT_BLOCK_ROWS),
            max_block_bytes=d.get("max_block_bytes"),
            blocks_per_file=d.get("blocks_per_file", 10),
            block_fpr=d.get("block_fpr", DEFAULT_FPR),
            file_fpr=d.get("file_fpr", DEFAULT_FPR),
            file_expected_items=d.get("file_expected_items", DEFAULT_FILE_EXPECTED_ITEMS),
            compression=d.get("compression", "snappy"),
            zstd_level=d.get("zstd_level"),
            tokenizer=d.get("tokenizer", "whitespace_lower"),
            sha_col=d.get("sha_col"),
            external_data=d.get("external_data", False),
            cluster_input=d.get("cluster_input", False),
            partition_transform=d.get("partition_transform"),
        )
