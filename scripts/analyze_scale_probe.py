"""ANALYZE scale evidence (r06 late).

Times, over a multi-million-row index (same shape as cold_probe /
dv_scale_probe):

- ``analyze()`` — ONE masked scan computing per-(block, column) HLL +
  null/row counts for 3 columns (cost independent of column count beyond
  the hash work) + the metadata commit;
- ``approx_distinct_meta()`` — the manifest-only read (zero data bytes);
- the exact ``countDistinct`` over the raw data for the same columns —
  the query ANALYZE amortizes away.

The 100 TB story: the stats scan is paid once per analyze (and rides the
same zero-shuffle partials→merge rollup as the index build), after which
every distinct-count question is a manifest-sized read.  Accuracy is
asserted against the published 4σ HLL bound per column.

Usage:
    python scripts/analyze_scale_probe.py [--rows 8000000] [--cores 8]
Emits one JSON line on stdout (written to ANALYZE_SCALE_r06.json by hand).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from cold_probe import BLOCK_ROWS, _session, build_cfg  # noqa: E402

COLS = ["repo", "lang", "content"]


def prepare(rows: int, cores: int) -> tuple[str, str]:
    inp = f"/tmp/bs-cold-input-{rows}"  # shared with cold_probe
    root = f"/tmp/bs-anscale-idx-{rows}"
    done = os.path.join(root, "_PREPARED")
    if os.path.exists(done):
        return root, inp
    from bloomsearch_spark import build_index
    from bloomsearch_spark.sources.synthetic import generate_df

    spark = _session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(inp, "_SUCCESS")):
        generate_df(spark, rows).write.mode("overwrite").parquet(inp)
    df = spark.read.parquet(inp)
    t0 = time.perf_counter()
    idx = build_index(spark, df, root, build_cfg(), source_desc=f"anscale@{rows}")
    print(
        f"build: {time.perf_counter() - t0:.1f}s "
        f"({idx.blocks().count()} blocks)",
        file=sys.stderr,
    )
    spark.stop()
    open(done, "w").close()
    return root, inp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    root, inp = prepare(args.rows, args.cores)

    from pyspark.sql import functions as F

    from bloomsearch_spark import BloomIndex, analyze, approx_distinct_meta

    spark = _session(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    idx = BloomIndex.load(spark, root)
    out = {
        "rows": args.rows,
        "cores": args.cores,
        "blocks": idx.blocks().count(),
        "block_rows": BLOCK_ROWS,
        "columns": COLS,
    }

    def timed(key, fn):
        t0 = time.perf_counter()
        r = fn()
        out[key] = round(time.perf_counter() - t0, 3)
        return r

    timed("analyze_s", lambda: analyze(spark, root, COLS))
    out["analyze_rows_per_s"] = round(args.rows / out["analyze_s"])

    est = timed(
        "meta_distinct_s",
        lambda: {
            r.column: r for r in approx_distinct_meta(spark, root).collect()
        },
    )
    # min of 3 for the warm manifest-only read
    for _ in range(2):
        t0 = time.perf_counter()
        approx_distinct_meta(spark, root).collect()
        out["meta_distinct_s"] = min(
            out["meta_distinct_s"], round(time.perf_counter() - t0, 3)
        )

    df = spark.read.parquet(inp)
    exact = timed(
        "exact_distinct_s",
        lambda: df.agg(
            *[F.countDistinct(c).alias(c) for c in COLS]
        ).first(),
    )
    errs = {}
    for c in COLS:
        e, x = est[c], exact[c]
        errs[c] = round(abs(e.n_distinct - x) / max(x, 1), 5)
        assert abs(e.n_distinct - x) <= 4 * e.rse * max(x, 1), (c, e, x)
        assert e.blocks_covered == e.blocks_live
    out["rel_err"] = errs
    out["speedup_meta_vs_exact"] = round(
        out["exact_distinct_s"] / out["meta_distinct_s"], 1
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
