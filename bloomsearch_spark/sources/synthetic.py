"""Deterministic synthetic source-code table (BASELINE.json input_hint).

Columns ``(repo, path, commit, lang, content)``; generation is seeded and
*chunked* — chunk ``i`` is produced by an RNG seeded from ``(seed, i)`` —
so the local and the distributed (mapInPandas) paths produce bit-identical
tables for any row count (FIXTURES.md F1).  Skew is built in: one
"monorepo" holds ~30% of rows to exercise salted block assignment.
Needle tokens are planted at known absolute rows so hit/miss golden tests
have exact expected answers; one needle is mixed-case to exercise the
lowercasing tokenizer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["go", "py", "js", "rs", "java", "md"]

_WORDS = [
    "func", "return", "import", "Class", "def", "SELECT", "from", "WHERE",
    "parse", "Handler", "buffer", "Index", "token", "bloom", "filter",
    "merge", "partition", "shuffle", "executor", "Query", "commit", "branch",
    "vector", "hash", "encode", "decode", "stream", "batch", "arrow",
    "column", "schema", "manifest", "block", "file.go", "x+=1", "err!=nil",
]

# token -> (step, offset): planted at absolute rows r where r % step == offset
NEEDLES = {
    "needle_alpha": (101, 7),
    "needle_beta": (499, 11),
    "Needle_Gamma": (997, 13),  # stored mixed-case; queries use lowercase
}

CHUNK = 100_000
SCHEMA = "repo string, path string, commit string, lang string, content string"


def needle_rows(token: str, n_rows: int) -> list[int]:
    """Absolute rows where ``token`` was planted (oracle for golden tests)."""
    step, offset = NEEDLES[token]
    return list(range(offset, n_rows, step))


def generate_chunk(chunk_idx: int, n_rows_total: int, seed: int = 42) -> pd.DataFrame:
    lo = chunk_idx * CHUNK
    size = min(CHUNK, n_rows_total - lo)
    rng = np.random.RandomState((seed * 1_000_003 + chunk_idx) % (2**31 - 1))
    row = np.arange(lo, lo + size)

    is_mono = rng.rand(size) < 0.30
    repo_idx = rng.randint(1, 41, size=size)
    repo = np.where(
        is_mono,
        "org0/monorepo",
        np.char.add(
            "org",
            np.char.add((repo_idx % 8).astype(str), np.char.add("/repo", repo_idx.astype(str))),
        ),
    )
    lang = np.array(LANGS, dtype=object)[rng.randint(0, len(LANGS), size=size)]
    path = np.array(
        [f"src/pkg{r % 13}/mod{r % 7}/file{r}.{l}" for r, l in zip(row, lang)],
        dtype=object,
    )
    commit = np.array(
        [hashlib.sha1(f"commit-{seed}-{r}".encode()).hexdigest() for r in row],
        dtype=object,
    )
    n_tok = rng.randint(5, 120, size=size)
    words = np.array(_WORDS, dtype=object)
    content: list[str] = []
    for j, r in enumerate(row):
        toks = list(words[rng.randint(0, len(words), size=n_tok[j])])
        for needle, (step, offset) in NEEDLES.items():
            if r % step == offset:
                toks.insert(int(rng.randint(0, len(toks) + 1)), needle)
        content.append(" ".join(toks))

    return pd.DataFrame(
        {
            "repo": repo.astype(object),
            "path": path,
            "commit": commit,
            "lang": lang,
            "content": np.array(content, dtype=object),
        }
    )


def generate_pdf(n_rows: int, seed: int = 42) -> pd.DataFrame:
    chunks = [
        generate_chunk(i, n_rows, seed) for i in range((n_rows + CHUNK - 1) // CHUNK)
    ]
    return pd.concat(chunks, ignore_index=True)


def synthesize_probe_manifest(
    spark: SparkSession,
    root: str,
    n_blocks: int,
    blocks_per_file: int = 1_000,
    match_every: int = 100_000,
    token: str = "needle",
    block_expected: int = 100,
    file_expected: int = 1_000,
    fpr: float = 0.01,
):
    """Manifest-ONLY synthetic index (no data files) for probe-path
    benchmarking: ``n_blocks`` block rows with real serialized bitsets.
    Every ``match_every``-th block carries ``token`` in its token bloom
    (and its file's file bloom); every other bitset is zeroed, so the
    probe prunes it exactly.  Small bloom params keep a 10^6-block
    manifest to a few hundred MB.  Committed as a normal manifest version
    — used by scripts/probe_scale_bench.py and tests/test_probe_scale.py
    to measure the flat-vs-hierarchical probe crossover
    (plans/search.py FLAT_PROBE_MAX_BLOCKS) at manifest scales the
    data-backed tests cannot reach.  Returns the committed BloomIndex."""
    import pyarrow as pa

    from .. import bloom
    from ..config import IndexConfig
    from . import fs as fsx
    from . import manifest as mf

    bp = bloom.BloomParams(block_expected, fpr)
    fp = bloom.BloomParams(file_expected, fpr)
    tok = np.asarray([token], dtype=object)
    b_hit = bloom.new_bitset(bp)
    bloom.insert(b_hit, tok, bp)
    b_hit, b_miss = b_hit.tobytes(), bloom.new_bitset(bp).tobytes()
    f_hit = bloom.new_bitset(fp)
    bloom.insert(f_hit, tok, fp)
    f_hit, f_miss = f_hit.tobytes(), bloom.new_bitset(fp).tobytes()

    empty_map = pa.array([[]], type=pa.map_(pa.string(), pa.int64()))
    bpf, me = blocks_per_file, match_every

    def gen_blocks(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            n = len(ids)
            hit = (ids % me) == 0
            cols = {
                "file_id": pa.array([f"f{int(i) // bpf:08d}" for i in ids]),
                "block_id": pa.array([f"b{int(i):09d}" for i in ids]),
                "partition_id": pa.array(["p"] * n),
                "data_path": pa.array(
                    [f"file_id=f{int(i) // bpf:08d}/block_id=b{int(i):09d}" for i in ids]
                ),
                "row_count": pa.array([block_expected] * n, pa.int64()),
                "token_count": pa.array([block_expected] * n, pa.int64()),
                "byte_size": pa.array([4096] * n, pa.int64()),
                "minmax_min": pa.concat_arrays([empty_map] * n),
                "minmax_max": pa.concat_arrays([empty_map] * n),
                "expected_items": pa.array([block_expected] * n, pa.int64()),
                "fpr": pa.array([fpr] * n, pa.float64()),
                "field_bloom": pa.array([b_miss] * n, pa.binary()),
                "token_bloom": pa.array(
                    [b_hit if h else b_miss for h in hit], pa.binary()
                ),
                "fieldtoken_bloom": pa.array([b_miss] * n, pa.binary()),
            }
            yield pa.RecordBatch.from_pydict(cols)

    n_files = (n_blocks + bpf - 1) // bpf

    def gen_files(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            n = len(ids)
            # file i holds blocks [i*bpf, (i+1)*bpf): it matches when any
            # multiple of match_every falls in that range
            hit = [(-(int(i) * bpf) % me) < bpf for i in ids]
            cols = {
                "file_id": pa.array([f"f{int(i):08d}" for i in ids]),
                "partition_id": pa.array(["p"] * n),
                "block_count": pa.array([bpf] * n, pa.int64()),
                "row_count": pa.array([block_expected * bpf] * n, pa.int64()),
                "token_count": pa.array([block_expected * bpf] * n, pa.int64()),
                "byte_size": pa.array([4096 * bpf] * n, pa.int64()),
                "minmax_min": pa.concat_arrays([empty_map] * n),
                "minmax_max": pa.concat_arrays([empty_map] * n),
                "expected_items": pa.array([file_expected] * n, pa.int64()),
                "fpr": pa.array([fpr] * n, pa.float64()),
                "field_bloom": pa.array([f_miss] * n, pa.binary()),
                "token_bloom": pa.array(
                    [f_hit if h else f_miss for h in hit], pa.binary()
                ),
                "fieldtoken_bloom": pa.array([f_miss] * n, pa.binary()),
            }
            yield pa.RecordBatch.from_pydict(cols)

    seg = "v00000001-synth"
    seg_dir = mf.segment_dir(root, seg)
    tasks = max(1, min(64, n_blocks // 50_000 + 1))
    (
        spark.range(n_blocks).repartition(tasks)
        .mapInArrow(gen_blocks, mf.BLOCKS_SCHEMA)
        .write.mode("overwrite").parquet(fsx.join(seg_dir, "blocks.parquet"))
    )
    (
        spark.range(n_files).coalesce(1)
        .mapInArrow(gen_files, mf.FILES_SCHEMA)
        .write.mode("overwrite").parquet(fsx.join(seg_dir, "files.parquet"))
    )
    spark.createDataFrame([], mf.LINEAGE_SCHEMA).write.mode("overwrite").parquet(
        fsx.join(seg_dir, "lineage.parquet")
    )
    cfg = IndexConfig(
        indexed_fields=("text",),
        partition_expr="'p'",
        max_block_rows=block_expected,
        blocks_per_file=blocks_per_file,
        block_fpr=fpr,
        file_fpr=fpr,
        file_expected_items=file_expected,
    )

    def finalize(prev):
        v = mf.version_after(prev)
        mf.write_meta(
            fsx.join(root, "manifest", v),
            cfg,
            extra={
                "build_id": v,
                "source_desc": "synthetic-probe-manifest",
                "source_columns": ["text"],
                "uniform_params": {
                    "blocks": [block_expected, fpr],
                    "files": [file_expected, fpr],
                },
                "tables": {t: [mf.segment_ref(seg, t)] for t in mf.TABLES},
            },
        )
        return v

    v = mf.publish_commit(root, finalize)
    return mf.BloomIndex(spark, root, v)


def generate_df(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Distributed deterministic generation: one task per chunk."""
    n_chunks = (n_rows + CHUNK - 1) // CHUNK
    if n_chunks == 1:
        return spark.createDataFrame(generate_pdf(n_rows, seed), schema=SCHEMA)

    def gen(it):
        for pdf in it:
            for i in pdf["id"]:
                yield generate_chunk(int(i), n_rows, seed)

    idx = spark.range(n_chunks).repartition(min(n_chunks, 64))
    return idx.mapInPandas(gen, schema=SCHEMA)
