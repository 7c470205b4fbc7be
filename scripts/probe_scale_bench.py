"""Flat-vs-hierarchical probe crossover at manifest scale (r04, VERDICT
item 3).

The query path picks a flat block-bloom probe on small manifests and the
file->block hierarchy above FLAT_PROBE_MAX_BLOCKS (plans/search.py).  The
threshold was reasoned in r03, not measured — data-backed tests top out at
a few thousand blocks.  This script synthesizes manifest-only indexes
(sources/synthetic.synthesize_probe_manifest: real serialized bitsets,
token planted every `--match-every` blocks, no data files) at 10^4..10^6
blocks and measures WARM probe latency for both strategies (min of
interleaved reps — this VM's host drift is 2-8x, BENCH.md §3), verifying
the survivor sets are identical.

Usage: python scripts/probe_scale_bench.py [--sizes 10000,50000,200000,1000000]
       [--reps 5] [--out PROBE_SCALE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="10000,50000,200000,1000000")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--out", default="PROBE_SCALE.json")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("probe-scale-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bloomsearch_spark import new_query
    from bloomsearch_spark.plans import search as search_mod
    from bloomsearch_spark.plans.search import prune_blocks
    from bloomsearch_spark.sources.synthetic import synthesize_probe_manifest

    q = new_query().token("needle").build()
    results = []
    default_threshold = search_mod.FLAT_PROBE_MAX_BLOCKS
    for n in sizes:
        work = tempfile.mkdtemp(prefix=f"bs-probe-{n}-")
        t0 = time.monotonic()
        idx = synthesize_probe_manifest(spark, work, n_blocks=n)
        gen_s = time.monotonic() - t0

        def probe_count(flat: bool) -> int:
            search_mod.FLAT_PROBE_MAX_BLOCKS = 2**62 if flat else 0
            try:
                return prune_blocks(idx, q).count()
            finally:
                search_mod.FLAT_PROBE_MAX_BLOCKS = default_threshold

        def survivors(flat: bool) -> list[str]:
            search_mod.FLAT_PROBE_MAX_BLOCKS = 2**62 if flat else 0
            try:
                return sorted(
                    r.data_path for r in prune_blocks(idx, q).select("data_path").collect()
                )
            finally:
                search_mod.FLAT_PROBE_MAX_BLOCKS = default_threshold

        # correctness first (also warms the manifest caches for both paths)
        s_flat, s_hier = survivors(True), survivors(False)
        assert s_flat == s_hier, f"survivor mismatch at n={n}"
        expected = len(range(0, n, 100_000))
        assert len(s_flat) >= expected  # planted hits (+ bloom FPs)

        times = {"flat": [], "hier": []}
        for _ in range(args.reps):  # interleaved min-of-reps
            for mode, flat in (("flat", True), ("hier", False)):
                t0 = time.monotonic()
                probe_count(flat)
                times[mode].append(time.monotonic() - t0)
        row = {
            "n_blocks": n,
            "flat_warm_s": round(min(times["flat"]), 4),
            "hier_warm_s": round(min(times["hier"]), 4),
            "survivors": len(s_flat),
            "planted": expected,
            "gen_s": round(gen_s, 1),
            "reps": args.reps,
        }
        row["winner"] = "flat" if row["flat_warm_s"] <= row["hier_warm_s"] else "hier"
        print(json.dumps(row))
        results.append(row)
        idx.unpersist()
        shutil.rmtree(work, ignore_errors=True)

    with open(args.out, "w") as f:
        json.dump(
            {
                "threshold_default": default_threshold,
                "cpus": args.cpus,
                "note": "warm probe latency, min of interleaved reps; "
                "survivor sets verified identical per size",
                "results": results,
            },
            f,
            indent=2,
        )
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
