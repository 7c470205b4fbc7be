"""Isolated per-stage benchmarks (guide §1.4) — NOT the driver metric.

`bench.py` is frozen for the driver and runs heavy stages single-shot, so
its build/mutation walls absorb the documented 2-8x host-stall drift
(BENCH.md §3).  This harness re-measures the noisy heavy stages in
isolation with INTERLEAVED repetitions and reports per-stage minima —
the numbers OPTIMIZATION_r07.md cites as drift-free evidence.

Stages (all fixtures prepared outside the timed regions; every timed
build/mutation starts from a fresh root so reps are i.i.d., nothing is
cached across reps):

- build_ref:   reference-scale default (zero-shuffle) build
               (`BENCH_EXTRA_REF_ROWS`, default 2M — build_ref_scale's
               shape at a wall short enough to repeat)
- build_docs:  the sf documents build (bench.py stage 1 fixture)
- mut_delete / mut_upsert / mut_restore / mut_delete_dv: bench.py's
               mutation stages, re-run on a fresh clone-by-rebuild root
               per rep
- analyze:     ANALYZE over the docs index

Usage: python bench_extra.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
BENCH_EXTRA_REPS default 3, BENCH_EXTRA_REF_ROWS default 2000000).
Output: one JSON line {"stages": {name: {"min": s, "runs": [...]}}}.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from bloomsearch_spark import (
    BloomIndex,
    IndexConfig,
    analyze,
    build_index,
    delete_where,
    new_query,
    restore,
    upsert_keys,
)
from bloomsearch_spark.sources.synthetic import generate_df

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
REF_ROWS = int(os.environ.get("BENCH_EXTRA_REF_ROWS", "2000000"))


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bloomsearch-bench-extra")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    roots: list[str] = []

    def tmp(prefix: str) -> str:
        d = tempfile.mkdtemp(prefix=prefix)
        roots.append(d)
        return d

    runs: dict[str, list[float]] = {}

    def timed(name: str, fn):
        sc.setJobDescription(f"bench_extra:{name}")
        t0 = time.perf_counter()
        fn()
        runs.setdefault(name, []).append(round(time.perf_counter() - t0, 4))
        sc.setJobDescription(None)

    # ---- fixtures (untimed) ---------------------------------------------
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    doc_cfg = IndexConfig(
        indexed_fields=("text", "lang", "source"),
        partition_expr="lang",
        minmax_fields=("n_chars", "doc_id"),
        max_block_rows=64,
        blocks_per_file=4,
        block_fpr=0.01,
        file_fpr=0.01,
        file_expected_items=50_000,
        compression="snappy",
        sha_col="text",
    )
    code_cfg = IndexConfig(
        indexed_fields=("repo", "path", "lang", "content"),
        partition_expr="lang",
        max_block_rows=10_000,
        blocks_per_file=4,
        block_fpr=0.01,
        file_fpr=0.01,
        file_expected_items=100_000,
        compression="snappy",
        sha_col="content",
        cluster_input=True,
    )
    ref_cfg = dataclasses.replace(code_cfg, cluster_input=False)

    ref_src = tmp("bx-refsrc-")
    ref_path = os.path.join(ref_src, "code.parquet")
    generate_df(spark, REF_ROWS).repartition(64).write.mode("overwrite").parquet(
        ref_path
    )
    ref = spark.read.parquet(ref_path)

    code_src = tmp("bx-codesrc-")
    code_path = os.path.join(code_src, "code.parquet")
    generate_df(spark, 200_000).repartition(64).write.mode("overwrite").parquet(
        code_path
    )
    code = spark.read.parquet(code_path)
    one_path = (
        code.select("path").orderBy(F.xxhash64("path")).limit(1).collect()[0].path
    )
    upsrc = code.orderBy(F.xxhash64("commit")).limit(64).withColumn(
        "content", F.concat(F.lit("bx upserted "), F.col("path"))
    )

    # mutation fixture root, built ONCE (untimed); each mutation rep runs
    # against its own fresh commit chain via restore-to-v1 between reps
    mut_root = tmp("bx-mut-")
    mut_idx = build_index(spark, code, mut_root, code_cfg)
    base_version = mut_idx.version

    # ---- interleaved reps ------------------------------------------------
    for _ in range(REPS):
        d_root = tmp("bx-docs-")
        timed("build_docs", lambda: build_index(spark, docs, d_root, doc_cfg))

        r_root = tmp("bx-ref-")
        timed("build_ref", lambda: build_index(spark, ref, r_root, ref_cfg))
        shutil.rmtree(r_root, ignore_errors=True)  # bound disk across reps

        timed(
            "mut_delete",
            lambda: delete_where(
                spark,
                BloomIndex.load(spark, mut_root),
                new_query().field_token("path", one_path.lower()).build(),
            ),
        )
        timed(
            "mut_upsert",
            lambda: upsert_keys(
                spark, BloomIndex.load(spark, mut_root), upsrc, key_field="path"
            ),
        )
        timed(
            "mut_restore",
            lambda: restore(
                spark, BloomIndex.load(spark, mut_root), version=base_version
            ),
        )
        timed(
            "mut_delete_dv",
            lambda: delete_where(
                spark,
                BloomIndex.load(spark, mut_root),
                new_query().field_token("path", one_path.lower()).build(),
                use_deletion_vectors=True,
            ),
        )
        # back to the base state for the next rep (untimed)
        restore(spark, BloomIndex.load(spark, mut_root), version=base_version)

        timed(
            "analyze",
            lambda: analyze(spark, d_root, ["lang", "source", "doc_id"]).version,
        )
        shutil.rmtree(d_root, ignore_errors=True)

    out = {
        "metric": "bloomsearch_bench_extra",
        "reps": REPS,
        "ref_rows": REF_ROWS,
        "sf_dir": SF_DIR,
        "stages": {
            k: {"min": min(v), "runs": v} for k, v in runs.items()
        },
    }
    try:
        print(json.dumps(out))
    finally:
        for r in roots:
            shutil.rmtree(r, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
