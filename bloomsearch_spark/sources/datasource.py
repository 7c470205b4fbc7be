"""Transparent integration: the bloom index as a Spark DataSource.

SURVEY §4.1 deferred "a plain ``df.filter`` gets bloom-pruned
automatically" because a Catalyst ``SparkSessionExtensions`` rule needs
JVM code.  Spark 4's **Python DataSource API** (with filter pushdown,
``pyspark.sql.datasource``) closes that gap Spark-first:

    spark.dataSource.register(BloomSearchDataSource)
    df = (spark.read.format("bloomsearch")
          .option("root", "/path/to/index")
          .option("token", "needle")          # bloom-pruned existence query
          .load())
    df.filter("lang = 'de' AND n_chars >= 100").show()   # WHERE prunes too
    df.createOrReplaceTempView("docs"); spark.sql("SELECT ... FROM docs")

How the pieces map:

- ``pushFilters`` receives the query's WHERE conditions: equality/IN on
  the partition source column and comparisons on ``minmax_fields`` become
  partition/zone-map PREFILTERS (Q2-Q5).  Every filter is returned as
  "unsupported" so **Spark re-applies it after the scan** — the pushed
  form is used purely to prune, which is always sound (blooms and zone
  maps only disqualify; prefilter semantics are conservative supersets).
- ``partitions()`` runs the hierarchical prune (Q6-Q10) ON THE DRIVER
  over the manifest via pyarrow — structurally the reference's
  single-node read path (``MetaStore.GetMaybeFilesForQuery`` + file/block
  bloom walk, bloom_tree_engine.go:910-1118): stream the files manifest,
  probe file blooms, stream only surviving files' block rows, apply
  prefilter + block blooms; each surviving block becomes an
  ``InputPartition``.
- ``read()`` runs on executors: CRC-verified block read through the fs
  layer + the EXACT verify stage (Q12) re-derived with the index's
  tokenizer — so the DataFrame contains exactly the query's matches, not
  a candidate superset.

Scope/limits (use :func:`bloomsearch_spark.search` beyond them — it is
the scale path; this is the convenience/compatibility surface):

- driver-side pruning streams the manifest in batches (bounded memory)
  but the surviving-block LIST is driver-held — capped at
  ``MAX_DRIVER_BLOCKS``;
- regex queries and external (zero-copy) indexes are not exposed here;
- a custom tokenizer must be registered in the executor interpreters
  (same contract as the build, fs.register_scheme docstring).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from .. import bloom
from ..query import (
    And,
    BloomExpr,
    Condition,
    Eq,
    Field,
    FieldToken,
    Gt,
    Gte,
    In as QIn,
    Lt,
    Lte,
    MinMax,
    Partition,
    PrefilterAnd,
    PrefilterExpr,
    Query,
    Token,
)
from . import fs as fsx
from . import manifest as mf

# driver-held surviving-block list bound; past this the convenience layer
# refuses (the distributed search() has no such bound)
MAX_DRIVER_BLOCKS = 1_000_000

_BLOOM_COLS = ("field_bloom", "token_bloom", "fieldtoken_bloom")


# ---------------------------------------------------------------------------
# pandas twins of the Catalyst prefilter / verify compilers.  Semantics are
# pinned 1:1 to query.compile_prefilter and verify.compile_bloom_verify
# (strict missing-metadata exclusion, conservative NOT_IN, minmax overlap,
# not-indexed-field => False) and proven equivalent against the Spark path
# by tests/test_datasource.py's randomized equivalence sweep.
# ---------------------------------------------------------------------------


def _cond_exact(s: pd.Series, c: Condition) -> np.ndarray:
    if c.op == "EQ":
        return (s == c.value).to_numpy()
    if c.op == "NE":
        return (s != c.value).to_numpy()
    if c.op == "GT":
        return (s > c.value).to_numpy()
    if c.op == "GTE":
        return (s >= c.value).to_numpy()
    if c.op == "LT":
        return (s < c.value).to_numpy()
    if c.op == "LTE":
        return (s <= c.value).to_numpy()
    if c.op == "IN":
        return s.isin(list(c.values)).to_numpy() if c.values else np.zeros(len(s), bool)
    if c.op == "NOT_IN":
        return (~s.isin(list(c.values))).to_numpy() if c.values else np.ones(len(s), bool)
    if c.op == "BETWEEN":
        return ((s >= c.lo) & (s <= c.hi)).to_numpy()
    if c.op == "NOT_BETWEEN":
        return ((s < c.lo) | (s > c.hi)).to_numpy()
    raise AssertionError(c.op)


def _cond_minmax(mn: pd.Series, mx: pd.Series, c: Condition) -> np.ndarray:
    if c.op == "EQ":
        return ((mn <= c.value) & (c.value <= mx)).to_numpy()
    if c.op == "NE":
        return ((mn != c.value) | (mx != c.value)).to_numpy()
    if c.op == "GT":
        return (mx > c.value).to_numpy()
    if c.op == "GTE":
        return (mx >= c.value).to_numpy()
    if c.op == "LT":
        return (mn < c.value).to_numpy()
    if c.op == "LTE":
        return (mn <= c.value).to_numpy()
    if c.op == "IN":
        out = np.zeros(len(mn), bool)
        for v in c.values:
            out |= ((mn <= v) & (v <= mx)).to_numpy()
        return out
    if c.op == "NOT_IN":
        return np.ones(len(mn), bool)  # conservative (query.go:347-350)
    if c.op == "BETWEEN":
        return ((mn <= c.hi) & (c.lo <= mx)).to_numpy()
    if c.op == "NOT_BETWEEN":
        return ((mn < c.lo) | (mx > c.hi)).to_numpy()
    raise AssertionError(c.op)


def eval_prefilter_pdf(expr: PrefilterExpr | None, pdf: pd.DataFrame) -> np.ndarray:
    """compile_prefilter's semantics over a pandas manifest batch
    (``minmax_min``/``minmax_max`` as per-row dicts)."""
    n = len(pdf)
    if expr is None:
        return np.ones(n, bool)
    if expr.kind == "AND":
        out = np.ones(n, bool)
        for ch in expr.children:
            out &= eval_prefilter_pdf(ch, pdf)
        return out
    if expr.kind == "OR":
        out = np.zeros(n, bool)
        for ch in expr.children:
            out |= eval_prefilter_pdf(ch, pdf)
        return out
    if expr.kind == "PARTITION":
        pc = pdf["partition_id"]
        has = (pc.notna() & (pc != "")).to_numpy()
        return has & _cond_exact(pc, expr.condition)
    if expr.kind == "MINMAX":
        f = expr.field
        mn = pdf["minmax_min"].map(lambda d: (d or {}).get(f))
        mx = pdf["minmax_max"].map(lambda d: (d or {}).get(f))
        has = (mn.notna() & mx.notna()).to_numpy()
        out = np.zeros(n, bool)
        if has.any():
            out[has] = _cond_minmax(
                mn[has].astype("float64"), mx[has].astype("float64"), expr.condition
            )
        return out
    raise AssertionError(expr.kind)


def _probe_pdf(expr: BloomExpr | None, pdf: pd.DataFrame) -> np.ndarray:
    """Bloom-tree probe over a pandas manifest batch, grouped by (m,k) —
    the driver-side twin of operators.probe.bloom_probe_udf."""
    n = len(pdf)
    if expr is None:
        return np.ones(n, bool)
    from ..operators.probe import _eval_tree

    cols = [
        pdf[c] if c in pdf.columns else pd.Series([None] * n)
        for c in _BLOOM_COLS
    ]
    out = np.ones(n, bool)
    key = pd.DataFrame(
        {"n": pdf["expected_items"].values, "p": pdf["fpr"].values}
    )
    for (ni, pi), grp in key.groupby(["n", "p"], sort=False):
        params = bloom.BloomParams(int(ni), float(pi))
        idx = grp.index.to_numpy()
        out[idx] = _eval_tree(expr, cols, params, idx)
    return out


def verify_pdf(
    expr: BloomExpr | None,
    pdf: pd.DataFrame,
    indexed_fields: Sequence[str],
    tokenizer,
) -> np.ndarray:
    """EXACT verify (Q12) over candidate rows — verify.compile_bloom_verify
    re-expressed in pandas with the index's tokenizer."""
    from ..tokenizer import tokenize_series

    n = len(pdf)
    cols = set(pdf.columns)
    indexed = set(indexed_fields) & cols
    tok_cache: dict[str, pd.Series] = {}

    def _cast_value(v):
        # mirror the Spark verify path's F.col(c).cast("string") before the
        # tokenizer sees the value: value_fn's contract is a string input
        if v is None or (isinstance(v, float) and np.isnan(v)):
            return None
        if isinstance(v, str):
            return v
        if isinstance(v, (bool, np.bool_)):
            return "true" if v else "false"
        return str(v)

    def tokens_of(col: str) -> pd.Series:
        if col not in tok_cache:
            if tokenizer.name == "whitespace_lower":
                tok_cache[col] = tokenize_series(pdf[col])
            else:
                tok_cache[col] = pdf[col].map(
                    lambda v: None
                    if _cast_value(v) is None
                    else tokenizer.value_fn(_cast_value(v))
                )
        return tok_cache[col]

    def tok_in(col: str, t: str) -> np.ndarray:
        lists = tokens_of(col)
        return lists.map(
            lambda xs: t in xs if xs is not None else False
        ).to_numpy(dtype=bool)

    def ev(e: BloomExpr | None) -> np.ndarray:
        if e is None:
            return np.ones(n, bool)
        if e.kind == "AND":
            out = np.ones(n, bool)
            for ch in e.children:
                out &= ev(ch)
            return out
        if e.kind == "OR":
            out = np.zeros(n, bool)
            for ch in e.children:
                out |= ev(ch)
            return out
        if e.kind == "FIELD":
            if e.field not in indexed:
                return np.zeros(n, bool)
            return pdf[e.field].notna().to_numpy()
        if e.kind == "TOKEN":
            out = np.zeros(n, bool)
            for c in indexed_fields:
                if c in cols:
                    out |= tok_in(c, e.token)
            return out
        if e.kind == "FIELD_TOKEN":
            if e.field not in indexed:
                return np.zeros(n, bool)
            return tok_in(e.field, e.token)
        raise AssertionError(e.kind)

    return ev(expr)


# ---------------------------------------------------------------------------
# driver-side hierarchical prune over the manifest (pyarrow, no Spark jobs)
# ---------------------------------------------------------------------------


def _manifest_batches(paths: list[str], columns: list[str]) -> Iterator[pd.DataFrame]:
    import pyarrow.dataset as pads

    for p in paths:
        fs, local = fsx.resolve(p)
        ds = pads.dataset(local, format="parquet", filesystem=fs)
        avail = [c for c in columns if c in ds.schema.names]
        for batch in ds.to_batches(columns=avail):
            yield batch.to_pandas(maps_as_pydicts="strict")


def prune_blocks_driver(
    spark_unused,
    root: str,
    version: str,
    query: Query,
    table_refs: dict[str, list[str]],
) -> list[str]:
    """Hierarchical prune entirely on the driver: surviving block
    ``data_path`` values.  Streams the manifest in arrow batches (memory
    bounded by batch size), file level first — the reference's read walk
    (bloom_tree_engine.go:910-1118) without a cluster."""
    mdir = fsx.join(root, "manifest")
    tree = query.prune_bloom()
    from ..operators.probe import needed_bloom_cols

    needed = list(needed_bloom_cols(tree))

    surviving_files: set | None = None
    if tree is not None:
        surviving_files = set()
        for pdf in _manifest_batches(
            [fsx.join(mdir, rel) for rel in table_refs["files"]],
            ["file_id", "expected_items", "fpr", *needed],
        ):
            keep = _probe_pdf(tree, pdf)
            surviving_files.update(pdf["file_id"].to_numpy()[keep])
        if not surviving_files:
            return []

    out: list[str] = []
    for pdf in _manifest_batches(
        [fsx.join(mdir, rel) for rel in table_refs["blocks"]],
        [
            "file_id", "block_id", "partition_id", "data_path",
            "minmax_min", "minmax_max", "expected_items", "fpr", *needed,
        ],
    ):
        if surviving_files is not None:
            pdf = pdf[pdf["file_id"].isin(surviving_files)]
            if pdf.empty:
                continue
            pdf = pdf.reset_index(drop=True)
        keep = eval_prefilter_pdf(query.prefilter, pdf)
        if tree is not None:
            keep &= _probe_pdf(tree, pdf)
        out.extend(pdf["data_path"].to_numpy()[keep])
        if len(out) > MAX_DRIVER_BLOCKS:
            raise RuntimeError(
                f"query survives > {MAX_DRIVER_BLOCKS} blocks — beyond the "
                "convenience DataSource's driver bound; use "
                "bloomsearch_spark.search() (distributed prune, no bound)"
            )
    return out


# ---------------------------------------------------------------------------
# the DataSource
# ---------------------------------------------------------------------------


@dataclass
class _BlockChunk(InputPartition):
    rel_paths: list


class BloomSearchReader(DataSourceReader):
    def __init__(self, options: dict, schema) -> None:
        self.root = options.get("root")
        if not self.root:
            raise ValueError("bloomsearch datasource requires .option('root', ...)")
        self.out_schema = schema
        self.blocks_per_task = int(options.get("blocks_per_task", "4"))
        version = mf.current_version(self.root)
        if version is None:
            raise FileNotFoundError(f"no committed manifest under {self.root}")
        self.version = version
        meta = self._meta()
        if meta.get("external"):
            raise NotImplementedError(
                "external (zero-copy) indexes are not exposed through the "
                "DataSource — use bloomsearch_spark.search()"
            )
        cfg = meta["config"]
        self.indexed_fields = tuple(cfg.get("indexed_fields") or ())
        self.tokenizer_name = cfg.get("tokenizer", "whitespace_lower")
        self.minmax_fields = set(cfg.get("minmax_fields") or ())
        pe = cfg.get("partition_expr") or ""
        # filters on the partition SOURCE column map to partition prefilters
        # only when the expr is a bare column name (the common case)
        self.partition_src = pe if pe.isidentifier() else None
        self.source_columns = meta.get("source_columns") or []
        self._bloom = self._parse_bloom_options(options)
        self._pushed_prefilter: list[PrefilterExpr] = []

    def _meta(self) -> dict:
        # cached: a version is immutable, and one load() otherwise pays
        # several meta.json fetch+parse round-trips (schema, __init__,
        # partitions) — real latency on an object-store root
        m = getattr(self, "_meta_cache", None)
        if m is None:
            import json

            m = self._meta_cache = json.loads(
                fsx.read_bytes(
                    fsx.join(self.root, "manifest", self.version, "meta.json")
                )
            )
        return m

    def _table_refs(self) -> dict:
        refs = self._meta().get("tables")
        if refs is None:
            refs = {t: [f"{self.version}/{t}.parquet"] for t in mf.TABLES}
        return refs

    @staticmethod
    def _parse_bloom_options(options: dict) -> BloomExpr | None:
        """token= / tokens= / field= / field_token=f:t options, implicit-AND
        (the QueryBuilder's chaining semantics)."""
        leaves: list[BloomExpr] = []
        if options.get("token"):
            leaves.append(Token(options["token"]))
        if options.get("tokens"):
            leaves.extend(Token(t) for t in options["tokens"].split(",") if t)
        if options.get("field"):
            leaves.append(Field(options["field"]))
        if options.get("field_token"):
            f, _, t = options["field_token"].partition(":")
            if not t:
                raise ValueError("field_token option must be 'field:token'")
            leaves.append(FieldToken(f, t))
        if not leaves:
            return None
        return leaves[0] if len(leaves) == 1 else And(*leaves)

    def pushFilters(self, filters: list["Filter"]) -> Iterator["Filter"]:
        """Harvest prunable WHERE conditions.  EVERY filter is returned
        back (reported unsupported) so Spark re-applies it after the scan:
        the harvested form only PRUNES, which is sound — partition/zone-map
        prefilters are conservative supersets by construction.  Eager (not
        a generator): the harvest must happen even if the caller never
        drains the returned iterable."""
        for f in filters:
            cond = self._prefilter_of(f)
            if cond is not None:
                self._pushed_prefilter.append(cond)
        return list(filters)

    @staticmethod
    def _partition_str(v):
        """The pushed value compared against the STRING partition_id must
        use Spark's cast-to-string spelling, or a typed WHERE value (int
        year, bool flag) would never equal the stored id and the "prune
        only" contract would silently drop every matching block."""
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    def _prefilter_of(self, f: "Filter") -> PrefilterExpr | None:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            return None
        col = attr[0]
        if col == self.partition_src:
            # the library's prefilter is STRICT: empty partition_id fails
            # every condition.  A WHERE clause genuinely matching ''
            # (or NULL) rows must therefore NOT be harvested — pruning on
            # it would exclude the very blocks holding those rows
            if isinstance(f, EqualTo):
                if f.value is None or self._partition_str(f.value) == "":
                    return None
                return Partition(Eq(self._partition_str(f.value)))
            if isinstance(f, In):
                vals = [self._partition_str(v) for v in f.value if v is not None]
                if len(vals) != len(f.value) or "" in vals:
                    return None  # NULL/'' member -> unprunable, stay sound
                return Partition(QIn(*vals))
            return None
        if col in self.minmax_fields:
            if isinstance(f, EqualTo):
                return MinMax(col, Eq(f.value))
            if isinstance(f, GreaterThan):
                return MinMax(col, Gt(f.value))
            if isinstance(f, GreaterThanOrEqual):
                return MinMax(col, Gte(f.value))
            if isinstance(f, LessThan):
                return MinMax(col, Lt(f.value))
            if isinstance(f, LessThanOrEqual):
                return MinMax(col, Lte(f.value))
            if isinstance(f, In):
                return MinMax(col, QIn(*f.value))
            return None
        return None

    def _query(self) -> Query:
        pre = None
        if self._pushed_prefilter:
            pre = (
                self._pushed_prefilter[0]
                if len(self._pushed_prefilter) == 1
                else PrefilterAnd(*self._pushed_prefilter)
            )
        return Query(prefilter=pre, bloom=self._bloom)

    def partitions(self) -> list[InputPartition]:
        # Spark's planning worker treats NotImplementedError as "reader has
        # no partitions" and silently substitutes [None] — re-wrap so a
        # real failure inside the prune can never be masked as that
        try:
            paths = prune_blocks_driver(
                None, self.root, self.version, self._query(), self._table_refs()
            )
        except NotImplementedError as e:
            raise RuntimeError(f"bloomsearch partition planning failed: {e}") from e
        k = max(1, self.blocks_per_task)
        return [
            _BlockChunk(rel_paths=paths[i : i + k]) for i in range(0, len(paths), k)
        ]

    def read(self, partition: _BlockChunk):
        """Executor-side: CRC-verified block read + EXACT verify (Q12)."""
        if partition is None:  # zero surviving blocks -> Spark sends [None]
            return
        import pyarrow as pa

        from ..tokenizer import get_tokenizer

        tok = get_tokenizer(self.tokenizer_name)
        names = [f.name for f in self.out_schema.fields]
        data_dir = fsx.join(self.root, "data")
        for rel in partition.rel_paths:
            tbl = fsx.read_parquet_dir(fsx.join(data_dir, rel))
            pdf = tbl.to_pandas()
            if self._bloom is not None:
                keep = verify_pdf(self._bloom, pdf, self.indexed_fields, tok)
                pdf = pdf[keep]
            if len(pdf):
                out = pa.Table.from_pandas(
                    pdf[names], preserve_index=False
                ).cast(self._arrow_schema())
                yield from out.to_batches()

    def _arrow_schema(self):
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(self.out_schema)


class BloomSearchDataSource(DataSource):
    """``spark.read.format("bloomsearch")`` over a committed index root.

    Options: ``root`` (required), ``token`` / ``tokens`` (comma list) /
    ``field`` / ``field_token`` ("f:t") — implicit-AND existence query;
    ``blocks_per_task``.  WHERE-clause equality/range conditions on the
    partition source column and ``minmax_fields`` prune automatically when
    ``spark.sql.python.filterPushdown.enabled`` is true."""

    @classmethod
    def name(cls) -> str:
        return "bloomsearch"

    def schema(self):
        root = self.options.get("root")
        if not root:
            raise ValueError("bloomsearch datasource requires .option('root', ...)")
        import json

        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import StructType

        version = mf.current_version(root)
        if version is None:
            raise FileNotFoundError(f"no committed manifest under {root}")
        meta = json.loads(
            fsx.read_bytes(fsx.join(root, "manifest", version, "meta.json"))
        )
        refs = meta.get("tables") or {
            t: [f"{version}/{t}.parquet"] for t in mf.TABLES
        }
        # the stored source schema (r04 builds) answers without touching
        # any parquet — and is the ONLY answer for a fully-empty index
        sj = meta.get("source_schema")
        if sj:
            full = StructType.fromJson(json.loads(sj))
            keep = meta.get("source_columns") or [f.name for f in full.fields]
            return StructType([f for f in full.fields if f.name in keep])
        # pre-r04 manifest: one block's parquet schema gives the stored
        # dtypes; project to the meta's source_columns (order preserved).
        # Scan segments until a block row is found — a zero-row segment
        # (empty append, full expiry) must not break reads
        import pyarrow.dataset as pads

        rel = None
        for seg in refs["blocks"]:
            fs, local = fsx.resolve(fsx.join(root, "manifest", seg))
            ds = pads.dataset(local, format="parquet", filesystem=fs)
            for batch in ds.to_batches(columns=["data_path"], batch_size=1):
                if len(batch):
                    rel = batch.column("data_path")[0].as_py()
                    break
            if rel is not None:
                break
        if rel is None:
            raise ValueError(
                f"index at {root} has no blocks — cannot infer a schema; "
                "pass one explicitly via spark.read.schema(...)"
            )
        dfs, dlocal = fsx.resolve(fsx.join(root, "data", rel))
        dset = pads.dataset(dlocal, format="parquet", filesystem=dfs)
        full = from_arrow_schema(dset.schema)
        keep = meta.get("source_columns") or [f.name for f in full.fields]
        return StructType([f for f in full.fields if f.name in keep])

    def reader(self, schema) -> BloomSearchReader:
        return BloomSearchReader(dict(self.options), schema)

    def writer(self, schema, overwrite: bool):
        return BloomSearchArrowWriter(dict(self.options), schema, overwrite)


# ---------------------------------------------------------------------------
# the write path: df.write.format("bloomsearch")
# ---------------------------------------------------------------------------


@dataclass
class _TaskStaging(WriterCommitMessage):
    """One task's staging rows (block + completed-file entries) as Arrow
    IPC bytes — the per-task half of the delta-segment commit protocol."""

    ipc: bytes


def _cfg_from_options(options: dict, root: str, overwrite: bool):
    """Writer config: start from the committed index's config when
    appending (the natural 'same index, more data' case), overlay any
    explicitly passed options; a fresh/overwritten root must pass at least
    ``indexed_fields``."""
    import json as _json

    from ..config import IndexConfig

    # an existing index's config is the default even for overwrite —
    # "rebuild the same index" shouldn't force re-passing every option
    base: dict = {}
    cur = mf.current_version(root)
    if cur is not None:
        base = _json.loads(
            fsx.read_bytes(fsx.join(root, "manifest", cur, "meta.json"))
        )["config"]
    o = {k: v for k, v in options.items()}
    if "indexed_fields" in o:
        base["indexed_fields"] = tuple(
            f for f in o["indexed_fields"].split(",") if f
        )
    if "minmax_fields" in o:
        base["minmax_fields"] = tuple(f for f in o["minmax_fields"].split(",") if f)
    if "partition_col" in o:
        base["partition_expr"] = o["partition_col"]
    for k, cast in (
        ("max_block_rows", int), ("blocks_per_file", int),
        ("block_fpr", float), ("file_fpr", float),
        ("file_expected_items", int), ("compression", str),
        ("sha_col", str), ("tokenizer", str),
    ):
        if k in o:
            base[k] = cast(o[k])
    if not base.get("indexed_fields"):
        raise ValueError(
            "bloomsearch writer on a fresh root needs "
            ".option('indexed_fields', 'col1,col2,...')"
        )
    cfg = IndexConfig.from_dict(base)
    pe = cfg.partition_expr or ""
    # the writer evaluates the partition expr OUTSIDE Catalyst, so it must
    # be a bare column (or the constant '' default) — anything richer
    # belongs to build_index, which runs the expr through Spark
    if pe not in ("", "''") and not pe.isidentifier():
        raise ValueError(
            f"bloomsearch writer needs partition_expr to be a bare column "
            f"(got {pe!r}); pre-compute the column or use build_index()"
        )
    return cfg


class BloomSearchArrowWriter(DataSourceArrowWriter):
    """``df.write.format("bloomsearch").mode("append"|"overwrite")``.

    The DSv2 write protocol maps 1:1 onto the delta-segment commit:

    - ``write`` (per task): the SAME partition-buffer flush kernel as the
      batch build (`plans.build._make_map_build_fn` — blooms + minmax +
      the block's own parquet file, written through the fs layer, invisible
      until commit); returns the task's staging rows as the commit message.
    - ``commit`` (driver, exactly once): assemble blocks/files/lineage
      from the messages, write ONE manifest segment, publish through
      ``publish_commit`` (append unions the fresh predecessor — a racing
      committer cannot be lost; overwrite starts clean).
    - ``abort``: nothing to undo — uncommitted data files are unreachable
      (never referenced by any manifest) and ``vacuum()`` reclaims them.

    Constraints (use ``build_index()`` beyond them): partition_expr must
    be a bare column; a ``sha_col`` must be a string column (the writer
    computes ``content_sha`` with hashlib to match ``F.sha2``).
    """

    def __init__(self, options: dict, schema, overwrite: bool) -> None:
        import uuid as _uuid

        self.root = options.get("root")
        if not self.root:
            raise ValueError("bloomsearch writer requires .option('root', ...)")
        self.overwrite = overwrite
        self.cfg = _cfg_from_options(options, self.root, overwrite)
        self.schema = schema
        names = [f.name for f in schema.fields]
        if self.cfg.sha_col:
            if self.cfg.sha_col not in names:
                raise ValueError(f"sha_col {self.cfg.sha_col!r} not in written columns")
            from pyspark.sql.types import StringType

            if not isinstance(schema[self.cfg.sha_col].dataType, StringType):
                raise ValueError(
                    "bloomsearch writer computes content_sha outside Catalyst "
                    "and only matches F.sha2 for STRING sha_col columns; "
                    "cast it or use build_index()"
                )
        pe = self.cfg.partition_expr
        if pe.isidentifier():
            if pe not in names:
                raise ValueError(f"partition column {pe!r} not in written columns")
            # the writer stringifies partition values with a pyarrow cast,
            # which must agree with build_index's Spark cast or one logical
            # partition splits into two ids (e.g. double 2020.0 -> Spark
            # '2020.0' vs pyarrow '2020').  string/integer/boolean casts
            # agree; reject the rest
            from pyspark.sql.types import (
                BooleanType,
                ByteType,
                IntegerType,
                LongType,
                ShortType,
                StringType,
            )

            ok = (StringType, ByteType, ShortType, IntegerType, LongType, BooleanType)
            if not isinstance(schema[pe].dataType, ok):
                raise ValueError(
                    f"bloomsearch writer supports string/integer/boolean "
                    f"partition columns (got {schema[pe].dataType}); cast it "
                    "or use build_index()"
                )
        version_guess, _ = mf.next_version_dir(self.root)
        # one nonce per WRITE JOB, minted on the driver and shipped in the
        # pickled writer: all tasks share it (stable file-id prefix), no
        # two jobs collide
        self.build_id = f"{version_guess}-w{_uuid.uuid4().hex[:8]}"
        self.source_columns = names

    # -- executor side ------------------------------------------------------

    def _prepare(self, batch):
        import hashlib

        import pyarrow as pa
        import pyarrow.compute as pc

        cols = dict(zip(batch.schema.names, batch.columns))
        pe = self.cfg.partition_expr
        if pe.isidentifier():
            pid = pc.fill_null(pc.cast(cols[pe], pa.string()), "")
        else:
            pid = pa.array([""] * len(batch), pa.string())
        arrays = list(batch.columns) + [pid]
        names = list(batch.schema.names) + ["partition_id"]
        if self.cfg.sha_col:
            vals = cols[self.cfg.sha_col].to_pylist()
            sha = pa.array(
                [
                    hashlib.sha256((v or "").encode()).hexdigest() if v is not None else None
                    for v in vals
                ],
                pa.string(),
            )
            arrays.append(sha)
            names.append("content_sha")
        return pa.RecordBatch.from_arrays(arrays, names=names)

    def write(self, iterator) -> _TaskStaging:
        import pyarrow as pa

        from ..plans.build import STAGING_PA_SCHEMA, _make_map_build_fn

        try:
            from pyspark import TaskContext

            ctx = TaskContext.get()
            tid = ctx.partitionId() if ctx is not None else None
        except Exception:
            tid = None
        if tid is None:
            import uuid as _uuid

            tid = _uuid.uuid4().int % (1 << 31)
        fn = _make_map_build_fn(
            self.cfg, fsx.join(self.root, "data"), self.build_id, task_id=tid
        )
        out = list(fn(self._prepare(b) for b in iterator))
        tbl = (
            pa.Table.from_batches(out, schema=STAGING_PA_SCHEMA)
            if out
            else STAGING_PA_SCHEMA.empty_table()
        )
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, STAGING_PA_SCHEMA) as w:
            w.write_table(tbl)
        return _TaskStaging(ipc=sink.getvalue().to_pybytes())

    # -- driver side --------------------------------------------------------

    def commit(self, messages) -> None:
        import time

        import pyarrow as pa

        from ..plans.build import STAGING_PA_SCHEMA

        tables = [
            pa.ipc.open_stream(pa.BufferReader(m.ipc)).read_all()
            for m in messages
            if m is not None
        ]
        st = (
            pa.concat_tables(tables) if tables else STAGING_PA_SCHEMA.empty_table()
        )
        is_block = pa.compute.is_valid(st.column("block_id"))
        blocks = st.filter(is_block).select(
            [
                "file_id", "block_id", "partition_id", "data_path", "row_count",
                "token_count", "byte_size", "minmax_min", "minmax_max",
                "expected_items", "fpr", "field_bloom", "token_bloom",
                "fieldtoken_bloom",
            ]
        ).sort_by("partition_id")
        frows = st.filter(pa.compute.invert(is_block))
        files = pa.table(
            {
                "file_id": frows.column("file_id"),
                "partition_id": frows.column("partition_id"),
                "block_count": frows.column("block_count"),
                "row_count": frows.column("row_count"),
                "token_count": frows.column("token_count"),
                "byte_size": frows.column("byte_size"),
                "minmax_min": frows.column("minmax_min"),
                "minmax_max": frows.column("minmax_max"),
                "expected_items": frows.column("file_expected_items"),
                "fpr": frows.column("file_fpr"),
                "field_bloom": frows.column("file_field_bloom"),
                "token_bloom": frows.column("file_token_bloom"),
                "fieldtoken_bloom": frows.column("file_fieldtoken_bloom"),
            }
        )
        now = time.time()
        nb = len(blocks)
        lineage = pa.table(
            {
                "build_id": pa.array([self.build_id] * nb, pa.string()),
                "file_id": blocks.column("file_id"),
                "block_id": blocks.column("block_id"),
                "partition_id": blocks.column("partition_id"),
                "source_desc": pa.array(["datasource-write"] * nb, pa.string()),
                "rows_indexed": blocks.column("row_count"),
                "tokens_inserted": blocks.column("token_count"),
                "op": pa.array(["build"] * nb, pa.string()),
                "committed_at": pa.array([now] * nb, pa.float64()),
            }
        )
        seg_name = f"{self.build_id}-dswrite"
        seg_dir = mf.segment_dir(self.root, seg_name)
        for name, tbl in (("blocks", blocks), ("files", files), ("lineage", lineage)):
            fsx.write_parquet_atomic(
                fsx.join(seg_dir, f"{name}.parquet"), tbl, "part-0.parquet"
            )
        mode = "overwrite" if self.overwrite else "append"
        mf.publish_commit(
            self.root,
            mf.build_commit_finalize(
                self.root, self.cfg, mode, seg_name, "datasource-write",
                self.source_columns, self.build_id,
                {"source_schema": self.schema.json()},
            ),
        )

    def abort(self, messages) -> None:
        """Nothing to undo: no manifest was published, so every file the
        tasks wrote is unreachable; ``vacuum()`` reclaims the orphans."""
