"""Distributed manifest-slice fallback vs driver prune — latency + equality.

The DataSource's ``partitions()`` holds the surviving-block list on the
driver up to ``max_driver_blocks`` and hands manifest part-file SLICES to
executors past it (r05).  This script builds a many-block index and runs
the same token query through BOTH paths, asserting identical rows and
reporting per-path latency — the honest cost of the unbounded fallback
(one Spark task per manifest part-file, flat probe per slice).

    python scripts/fallback_scale_bench.py [--rows 500000] [--block-rows 50]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--block-rows", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("fallback-scale")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bloomsearch_spark import IndexConfig, build_index
    from bloomsearch_spark.sources.datasource import BloomSearchDataSource
    from bloomsearch_spark.sources.manifest import BloomIndex
    from bloomsearch_spark.sources.synthetic import generate_df

    spark.dataSource.register(BloomSearchDataSource)
    root = tempfile.mkdtemp(prefix="bs-fallback-")
    out: dict = {"rows": args.rows, "block_rows": args.block_rows}
    try:
        t0 = time.perf_counter()
        # indexed fields chosen so ~1 unique token/row: block blooms are
        # sized for max_block_rows items (reference semantics), and tiny
        # blocks over the token-dense `content` column would saturate them
        # (measured: 16% FP admit rate vs the configured 1% — the bench
        # would then time saturated-bloom FP reads, not the fallback)
        build_index(
            spark,
            generate_df(spark, args.rows),
            root,
            IndexConfig(
                indexed_fields=("repo", "path", "lang"),
                partition_expr="lang",
                max_block_rows=args.block_rows,
                blocks_per_file=32,
                block_fpr=0.01,
                file_fpr=0.01,
                file_expected_items=50_000,
            ),
        )
        out["build_sec"] = round(time.perf_counter() - t0, 2)
        idx = BloomIndex.load(spark, root)
        out["n_blocks"] = idx.blocks().count()
        tok = (
            generate_df(spark, args.rows).select("path").limit(1).collect()[0]
            .path.lower()
        )

        def run(cap: str | None):
            rd = spark.read.format("bloomsearch").option("root", root).option(
                "field_token", f"path:{tok}"
            )
            if cap is not None:
                rd = rd.option("max_driver_blocks", cap)
            df = rd.load().filter("lang IS NOT NULL")
            return {r.commit for r in df.collect()}

        for name, cap in (("driver_prune", None), ("slice_fallback", "1")):
            rows = None
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                rows = run(cap)
                best = min(best, time.perf_counter() - t0)
            out[f"{name}_sec"] = round(best, 3)
            out[f"{name}_rows"] = len(rows)
            out.setdefault("_rowsets", []).append(rows)
        a, b = out.pop("_rowsets")
        assert a == b, "fallback rows != driver-prune rows"
        out["rows_equal"] = True
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
