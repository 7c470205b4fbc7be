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
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
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

    def tokens_of(col: str) -> pd.Series:
        if col not in tok_cache:
            if tokenizer.name == "whitespace_lower":
                tok_cache[col] = tokenize_series(pdf[col])
            else:
                tok_cache[col] = pdf[col].map(tokenizer.value_fn)
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
        import json

        return json.loads(
            fsx.read_bytes(fsx.join(self.root, "manifest", self.version, "meta.json"))
        )

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

    def _prefilter_of(self, f: "Filter") -> PrefilterExpr | None:
        attr = getattr(f, "attribute", None)
        if not attr or len(attr) != 1:
            return None
        col = attr[0]
        if col == self.partition_src:
            if isinstance(f, EqualTo):
                return Partition(Eq(f.value))
            if isinstance(f, In):
                return Partition(QIn(*f.value))
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
        # one block's parquet schema gives the stored dtypes; project to
        # the meta's source_columns (order preserved)
        import pyarrow.dataset as pads

        first_blocks = fsx.join(root, "manifest", refs["blocks"][0])
        fs, local = fsx.resolve(first_blocks)
        ds = pads.dataset(local, format="parquet", filesystem=fs)
        one = next(iter(ds.to_batches(columns=["data_path"], batch_size=1)))
        rel = one.column("data_path")[0].as_py()
        dfs, dlocal = fsx.resolve(fsx.join(root, "data", rel))
        dset = pads.dataset(dlocal, format="parquet", filesystem=dfs)
        full = from_arrow_schema(dset.schema)
        keep = meta.get("source_columns") or [f.name for f in full.fields]
        return StructType([f for f in full.fields if f.name in keep])

    def reader(self, schema) -> BloomSearchReader:
        return BloomSearchReader(dict(self.options), schema)
