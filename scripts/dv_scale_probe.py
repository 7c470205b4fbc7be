"""Deletion-vector scale evidence (r06).

Times the SAME selective delete (~1.75% of rows, one repo's token surface)
three ways over a multi-million-row index — REWRITE delete_where,
deletion-vector delete_where, and the follow-up REORG PURGE — plus the
read-side mask overhead (a 1/6-table scan query before/after the mask
exists).  This is the 100 TB story in miniature: the dv delete's cost is
bounded by matched positions (manifest bytes), the rewrite's by the match
SURFACE (every candidate block's data bytes), so the gap widens linearly
with block size x match spread.

The index root is cached under /tmp keyed by row count (the input parquet
is shared with cold_probe's cache when present).  Mutations always end
with a RESTORE to the pristine version, so re-runs start clean.

Usage:
    python scripts/dv_scale_probe.py [--rows 8000000] [--cores 8]
Emits one JSON line on stdout (written to DV_SCALE_r06.json by hand).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (bloomsearch_spark)
sys.path.insert(0, _HERE)  # scripts/ (cold_probe)

from cold_probe import BLOCK_ROWS, _session, build_cfg  # noqa: E402


def prepare(rows: int, cores: int) -> str:
    inp = f"/tmp/bs-cold-input-{rows}"  # shared with cold_probe
    root = f"/tmp/bs-dvscale-idx-{rows}"
    done = os.path.join(root, "_PREPARED")
    if os.path.exists(done):
        return root
    from bloomsearch_spark import build_index
    from bloomsearch_spark.sources.synthetic import generate_df

    spark = _session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(inp, "_SUCCESS")):
        generate_df(spark, rows).write.mode("overwrite").parquet(inp)
    df = spark.read.parquet(inp)
    t0 = time.perf_counter()
    idx = build_index(spark, df, root, build_cfg(), source_desc=f"dvscale@{rows}")
    print(
        f"build: {time.perf_counter() - t0:.1f}s "
        f"({idx.files().count()} files / {idx.blocks().count()} blocks)",
        file=sys.stderr,
    )
    spark.stop()
    open(done, "w").close()
    return root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    root = prepare(args.rows, args.cores)

    from pyspark.sql import functions as F  # noqa: F401

    from bloomsearch_spark import (
        BloomIndex,
        delete_where,
        new_query,
        purge_deletion_vectors,
        restore,
        search,
    )

    spark = _session(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    idx = BloomIndex.load(spark, root)
    v0 = idx.version
    out = {
        "rows": args.rows,
        "cores": args.cores,
        "blocks": idx.blocks().count(),
        "block_rows": BLOCK_ROWS,
    }

    # ~1.75% surface: one repo's rows (whitespace tokenizer -> the full
    # "k/repoK" string is the token); spread across ~every lang partition
    def q_repo(k: int):
        return new_query().field_token("repo", f"org{k % 8}/repo{k}").build()

    scan_q = new_query().field_token("lang", "go").build()  # ~1/6 scan

    def timed(key, fn):
        t0 = time.perf_counter()
        r = fn()
        out[key] = round(time.perf_counter() - t0, 3)
        return r

    # read baseline (no DVs): warm once, then measure
    search(spark, idx, scan_q).count()
    n_scan = timed("read_scan_nodv_s", lambda: search(spark, idx, scan_q).count())

    # 1) REWRITE delete
    _, st = timed(
        "delete_rewrite_s", lambda: delete_where(spark, idx, q_repo(1))
    )
    out["delete_rewrite_rows"] = st.rows_deleted
    out["delete_rewrite_blocks_rewritten"] = st.blocks_rewritten
    timed(
        "restore_s",
        lambda: restore(spark, BloomIndex.load(spark, root), version=v0),
    )

    # 2) DV delete of the SAME surface
    cur = BloomIndex.load(spark, root)
    dvix, st2 = timed(
        "delete_dv_s",
        lambda: delete_where(spark, cur, q_repo(1), use_deletion_vectors=True),
    )
    out["delete_dv_rows"] = st2.rows_deleted
    out["delete_dv_blocks_masked"] = st2.dv_blocks
    assert st2.rows_deleted == st.rows_deleted, (st2.rows_deleted, st.rows_deleted)

    # read overhead with the mask in place (same scan query)
    search(spark, dvix, scan_q).count()
    n_scan_dv = timed(
        "read_scan_dv_s", lambda: search(spark, dvix, scan_q).count()
    )
    out["read_rows_nodv"] = n_scan
    out["read_rows_dv"] = n_scan_dv

    # 3) a SECOND dv delete (cumulative mask, different repo) — the
    # steady-state CDC shape
    cur = BloomIndex.load(spark, root)
    _, st3 = timed(
        "delete_dv2_s",
        lambda: delete_where(spark, cur, q_repo(2), use_deletion_vectors=True),
    )
    out["delete_dv2_rows"] = st3.rows_deleted

    # 4) REORG PURGE: rewrite only the masked blocks
    cur = BloomIndex.load(spark, root)
    _, st4 = timed("purge_s", lambda: purge_deletion_vectors(spark, cur))
    out["purge_rows"] = st4.rows_deleted
    out["purge_blocks_rewritten"] = st4.blocks_rewritten

    # leave the cached root pristine
    restore(spark, BloomIndex.load(spark, root), version=v0)

    out["speedup_dv_vs_rewrite"] = round(
        out["delete_rewrite_s"] / out["delete_dv_s"], 2
    )
    out["read_mask_overhead_pct"] = round(
        100.0 * (out["read_scan_dv_s"] / out["read_scan_nodv_s"] - 1.0), 1
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
