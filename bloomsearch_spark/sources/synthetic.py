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
