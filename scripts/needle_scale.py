"""Batched needle search scale evidence (r06).

Measures search_needles (N needles, ONE probe pass + ONE scan) against the
naive alternative (N independent single-token search() calls) on the
cold_probe 8M-row / ~960-block index, min-of-reps interleaved per the
sandbox timing discipline.  Emits one JSON line:

    {"rows": ..., "blocks": ..., "reps": R,
     "ks": {"16": {"one_pass_s": ..., "singles_s": ..., "speedup": ...,
                   "rows_one_pass": ..., "rows_singles": ...}, ...}}

rows_one_pass must equal rows_singles (exactness cross-check: the join
verify and the per-query Catalyst verify are two independent truth
stages).

Usage: python scripts/needle_scale.py [--rows 8000000] [--cores 32]
       [--reps 3] [--ks 16,64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import cold_probe  # noqa: E402  (sibling script: session/prepare reuse)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ks", default="16,64")
    args = ap.parse_args()
    ks = sorted({int(k) for k in args.ks.split(",")})

    root = cold_probe.prepare(args.rows, args.cores)
    from pyspark.sql import functions as F

    from bloomsearch_spark import new_query, search, search_needles
    from bloomsearch_spark.sources.manifest import BloomIndex

    spark = cold_probe._session(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    idx = BloomIndex.load(spark, root)
    inp = spark.read.parquet(f"/tmp/bs-cold-input-{args.rows}")
    toks = [
        r.path.lower()
        for r in inp.select("path")
        .distinct()
        .orderBy(F.xxhash64("path"))
        .limit(max(ks))
        .collect()
    ]
    # warm: manifests cached, codegen loaded — steady-state comparison
    search(spark, idx, new_query().field_token("path", toks[0]).build()).count()
    search_needles(spark, idx, toks[:2], field="path").count()

    res = {
        str(k): {"one_pass_s": float("inf"), "singles_s": float("inf")}
        for k in ks
    }
    for _ in range(args.reps):
        for k in ks:
            t0 = time.perf_counter()
            n_one = search_needles(spark, idx, toks[:k], field="path").count()
            res[str(k)]["one_pass_s"] = min(
                res[str(k)]["one_pass_s"], time.perf_counter() - t0
            )
            t0 = time.perf_counter()
            n_single = 0
            for t in toks[:k]:
                n_single += search(
                    spark, idx, new_query().field_token("path", t).build()
                ).count()
            res[str(k)]["singles_s"] = min(
                res[str(k)]["singles_s"], time.perf_counter() - t0
            )
            res[str(k)]["rows_one_pass"] = n_one
            res[str(k)]["rows_singles"] = n_single

    for k in ks:
        d = res[str(k)]
        d["one_pass_s"] = round(d["one_pass_s"], 4)
        d["singles_s"] = round(d["singles_s"], 4)
        d["speedup"] = round(d["singles_s"] / d["one_pass_s"], 2)
    out = {
        "rows": args.rows,
        "blocks": idx.blocks().count(),
        "reps": args.reps,
        "cores": args.cores,
        "ks": res,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
