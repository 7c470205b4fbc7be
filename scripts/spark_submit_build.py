"""spark-submit entry point: build a bloom index over a parquet table.

The north rule's required run mode:

    zip -qr /tmp/bloomsearch_spark.zip bloomsearch_spark
    spark-submit --master local[8] --py-files /tmp/bloomsearch_spark.zip \
        scripts/spark_submit_build.py <input_parquet> <index_root> \
        [--partition-expr lang] [--indexed-fields repo,path,lang,content] \
        [--sha-col content] [--query-token needle_alpha]

On a real cluster the same command takes ``--master yarn``/k8s and 4N
executors; the job itself is unchanged (the scaling evidence for N vs 4N
lives in scaling_bench.py / BENCH.md).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("root")
    ap.add_argument("--partition-expr", default="lang")
    ap.add_argument("--indexed-fields", default="repo,path,lang,content")
    ap.add_argument("--sha-col", default="content")
    ap.add_argument("--max-block-rows", type=int, default=10_000)
    ap.add_argument("--blocks-per-file", type=int, default=8)
    ap.add_argument("--fpr", type=float, default=0.01)
    ap.add_argument("--cluster-input", action="store_true")
    ap.add_argument("--query-token", default=None, help="smoke query after build")
    a = ap.parse_args()

    from pyspark.sql import SparkSession

    from bloomsearch_spark import IndexConfig, build_index, new_query, search

    spark = SparkSession.builder.appName("bloomsearch-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cfg = IndexConfig(
        indexed_fields=tuple(a.indexed_fields.split(",")),
        partition_expr=a.partition_expr,
        max_block_rows=a.max_block_rows,
        blocks_per_file=a.blocks_per_file,
        block_fpr=a.fpr,
        file_fpr=a.fpr,
        sha_col=a.sha_col or None,
        cluster_input=a.cluster_input,
    )
    df = spark.read.parquet(a.input)
    t0 = time.perf_counter()
    idx = build_index(spark, df, a.root, cfg, source_desc=a.input)
    wall = time.perf_counter() - t0
    out = {
        "version": idx.version,
        "files": idx.files().count(),
        "blocks": idx.blocks().count(),
        "build_sec": round(wall, 2),
    }
    if a.query_token:
        hits = search(spark, idx, new_query().token(a.query_token).build()).count()
        out["query_token"] = a.query_token
        out["hits"] = hits
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
