"""Benchmark harness — one JSON line for the driver.

Runs the headline workload at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]``:

1. ``build_docs``    — hierarchical bloom index build over ``documents``.
2. ``bs_*``          — pruned existence queries through the index
                       (token hit, field:token, AND, OR, guaranteed miss).
3. ``build_code``    — index build over the deterministic synthetic
                       source-code table (BASELINE.json input_hint shape),
                       sized ~2M rows/sf — the build-throughput (files/sec)
                       headline metric.
4. ``code_*``        — needle search + miss query over that index; the miss
                       query's prune funnel yields the prune-ratio metric at
                       the configured FPR p=0.01.
5. ``mut_*``        — row-set mutations (r06): bloom-pruned point
                       DELETE, CDC-style key upsert, zero-copy RESTORE.
6. ``dd_/sim_/txt_`` — training-data pipeline operators at the sf tables.

Output: one JSON line
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., plus informative extras}.

Scaling-efficiency evidence (local[8] vs local[32]) lives in
``scaling_bench.py`` / BENCH.md — it needs two JVMs, so it is not part of
the per-round loop.
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
    IndexConfig,
    build_index,
    new_query,
    search,
    search_needles,
)
from bloomsearch_spark.functions.dedup import exact_duplicates, minhash_lsh_pairs
from bloomsearch_spark.functions.similarity import brute_force_topk, ivf_topk, lsh_topk
from bloomsearch_spark.functions.text import text_stats
from bloomsearch_spark.sources.synthetic import generate_df

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# synthetic source-code table: ~2M rows at sf=1.0
CODE_ROWS_PER_SF = int(os.environ.get("BENCH_CODE_ROWS_PER_SF", "2000000"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def main() -> None:
    sf = _sf_from_dir(SF_DIR)
    code_rows = max(10_000, int(CODE_ROWS_PER_SF * sf))

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("bloomsearch-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, object] = {}
    roots: list[str] = []
    # stages re-run for min-of-reps (read-only stages only; builds and
    # cold-path stages are single-shot by nature).  The extra passes are
    # INTERLEAVED across stages (whole-cycle repeats), so a host stall
    # (documented 2-8x drift, BENCH.md §3) hits each stage at most once —
    # per-stage minima stop chasing drift ghosts round over round.
    REPS = int(os.environ.get("BENCH_REPS", "3"))
    # read-only stages re-run min-of-REPS; excluded: builds (mutate state,
    # and their cost IS the cold cost) and bs_token (the one-shot
    # session-cold query number — bs_token_warm is its repeatable twin)
    _REPEATABLE = {
        "bs_token_warm", "bs_field_token", "bs_and", "bs_or", "bs_miss",
        "code_needle", "code_miss", "prune_funnel", "dd_exact", "dd_minhash",
        "sim_topk", "sim_lsh_topk", "sim_ivf_topk", "txt_stats",
        "sim_neardup_lsh", "sim_neardup_oracle",
        "sk_hll", "sk_cms", "sk_tdigest", "sk_kll", "sk_bloom",
        "analyze_meta_read", "fsck_check",
        "bs_datasource", "ref_scale_token", "ref_scale_miss",
        "code_needles64", "ref_scale_needles64",
    }
    repeat: list[tuple[str, object]] = []

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 4)
        if name in _REPEATABLE:
            repeat.append((name, fn))
        return out

    try:
        # ---- 1. documents index build + engine queries --------------------
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        doc_root = tempfile.mkdtemp(prefix="bench-docs-")
        roots.append(doc_root)
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
        doc_idx = timed("build_docs", lambda: build_index(spark, docs, doc_root, doc_cfg))

        def run_q(q):
            return search(spark, doc_idx, q).count()

        timed("bs_token", lambda: run_q(new_query().token("spark").build()))
        # same query warm (cached manifests, reused workers) — the
        # steady-state per-query latency
        timed("bs_token_warm", lambda: run_q(new_query().token("spark").build()))
        timed(
            "bs_field_token",
            lambda: run_q(new_query().field_token("text", "vector").build()),
        )
        from bloomsearch_spark import And, FieldToken, Or

        timed(
            "bs_and",
            lambda: run_q(
                new_query()
                .match(And(FieldToken("text", "spark"), FieldToken("text", "vector")))
                .build()
            ),
        )
        timed(
            "bs_or",
            lambda: run_q(
                new_query()
                .match(Or(FieldToken("source", "src3"), FieldToken("source", "src7")))
                .build()
            ),
        )
        timed("bs_miss", lambda: run_q(new_query().token("qqqzzz_absent").build()))

        # ---- 2. source-code table: build throughput + prune ratio ---------
        # materialize the synthetic input first so build_code times the
        # INDEX BUILD, not row generation (generation would otherwise run
        # twice inside the build's count + staging jobs)
        code_dir = tempfile.mkdtemp(prefix="bench-codesrc-")
        roots.append(code_dir)
        code_path = os.path.join(code_dir, "code.parquet")
        generate_df(spark, code_rows).repartition(64).write.mode("overwrite").parquet(
            code_path
        )
        code = spark.read.parquet(code_path)
        code_root = tempfile.mkdtemp(prefix="bench-code-")
        roots.append(code_root)
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
            cluster_input=True,  # salted repartition -> full blocks
        )
        code_idx = timed(
            "build_code", lambda: build_index(spark, code, code_root, code_cfg)
        )
        n_files = code_idx.files().count()
        n_blocks = code_idx.blocks().count()
        extras["code_rows"] = code_rows
        extras["code_files"] = n_files
        extras["code_blocks"] = n_blocks
        extras["build_files_per_sec"] = round(n_files / timings["build_code"], 4)
        extras["build_rows_per_sec"] = round(code_rows / timings["build_code"], 1)

        def needle():
            return search(
                spark, code_idx, new_query().field_token("content", "needle_beta").build()
            ).count()

        extras["code_needle_hits"] = timed("code_needle", needle)

        def miss():
            out, st = search(
                spark,
                code_idx,
                new_query().token("tok_definitely_absent_xyzzy").build(),
                with_stats=True,
            )
            c = out.count()
            extras["prune_ratio"] = round(st.prune_ratio, 6)
            return c

        timed("code_miss", miss)

        # prune-ratio funnel over a query set at p=0.01 (BASELINE metric):
        # point lookups on unique path tokens + misses
        def prune_funnel():
            targets = [
                r.path.lower()
                for r in code.select("path").orderBy(F.xxhash64("path")).limit(3).collect()
            ]
            ratios = []
            for t in targets:
                _, st = search(
                    spark, code_idx,
                    new_query().field_token("path", t).build(), with_stats=True,
                )
                ratios.append(st.prune_ratio)
            for t in ("zz_m1", "zz_m2", "zz_m3"):
                _, st = search(
                    spark, code_idx, new_query().token(t).build(), with_stats=True
                )
                ratios.append(st.prune_ratio)
            extras["prune_ratio_avg"] = round(sum(ratios) / len(ratios), 6)
            extras["prune_ratio_min"] = round(min(ratios), 6)
            return len(ratios)

        timed("prune_funnel", prune_funnel)

        # batched needle search (r06): 64 needles (60 rare path tokens +
        # 4 misses) through ONE probe pass + ONE scan — the
        # decontamination shape.  Fixture prep (token pick) outside the
        # timed stage.
        needle_toks = [
            r.path.lower()
            for r in code.select("path")
            .distinct()
            .orderBy(F.xxhash64("path"))
            .limit(60)
            .collect()
        ] + ["zz_nm1", "zz_nm2", "zz_nm3", "zz_nm4"]

        def needles64():
            return search_needles(
                spark, code_idx, needle_toks, field="path"
            ).count()

        extras["code_needles64_hits"] = timed("code_needles64", needles64)

        # ---- 2c. row-set mutations (r06) -----------------------------------
        # one-shot stages on the code index: a bloom-pruned point DELETE,
        # a CDC-style key upsert, and a zero-copy RESTORE back to the
        # pre-mutation version.  The query stages above hold a handle
        # PINNED to the pre-mutation version (immutable dirs, no vacuum
        # here), so their repeated reps are unaffected.
        from bloomsearch_spark import BloomIndex, delete_where, restore, upsert_keys

        pre_mut_version = code_idx.version
        one_path = code.select("path").orderBy(F.xxhash64("path")).limit(1).collect()[0].path

        def mut_delete():
            out, st = delete_where(
                spark, BloomIndex.load(spark, code_root),
                new_query().field_token("path", one_path.lower()).build(),
            )
            extras["mut_delete_candidate_blocks"] = st.candidate_blocks
            extras["mut_delete_rows"] = st.rows_deleted
            return st.rows_deleted

        timed("mut_delete_point", mut_delete)

        def mut_upsert():
            src = code.orderBy(F.xxhash64("commit")).limit(64).withColumn(
                "content", F.concat(F.lit("bench upserted "), F.col("path"))
            )
            out, st = upsert_keys(
                spark, BloomIndex.load(spark, code_root), src, key_field="path"
            )
            extras["mut_upsert_candidate_blocks"] = st.candidate_blocks
            return st.rows_deleted

        timed("mut_upsert_cdc", mut_upsert)
        timed(
            "mut_restore",
            lambda: restore(
                spark, BloomIndex.load(spark, code_root), version=pre_mut_version
            ).version,
        )

        # deletion-vector delete of the SAME match surface as
        # mut_delete_point, run on the restored pre-mutation state: the
        # two timings compare rewrite-speed vs metadata-speed directly
        # (same bloom prune, same exact verify; zero data bytes written)
        def mut_delete_dv():
            out, st = delete_where(
                spark, BloomIndex.load(spark, code_root),
                new_query().field_token("path", one_path.lower()).build(),
                use_deletion_vectors=True,
            )
            extras["mut_delete_dv_blocks"] = st.dv_blocks
            extras["mut_delete_dv_rows"] = st.rows_deleted
            return st.rows_deleted

        timed("mut_delete_dv", mut_delete_dv)
        # leave the bench root at the pre-mutation state (untimed)
        restore(spark, BloomIndex.load(spark, code_root), version=pre_mut_version)

        # ---- 3. pipeline operators ----------------------------------------
        embs = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        timed("dd_exact", lambda: exact_duplicates(docs, "text", "doc_id").count())
        timed(
            "dd_minhash",
            lambda: minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.8, n=3).count(),
        )
        queries_df = embs.filter(F.col("vec_id") < 5)
        bf = timed(
            "sim_topk",
            lambda: {
                (r.query_id, r.neighbor_id)
                for r in brute_force_topk(embs, queries_df, k=10).collect()
            },
        )
        # approximate-op quality: recall vs the exact top-k (these ops have
        # rows-only driver checks; recall quantifies them)
        lsh = timed(
            "sim_lsh_topk",
            lambda: {
                (r.query_id, r.neighbor_id)
                for r in lsh_topk(embs, queries_df, k=10).collect()
            },
        )
        ivf = timed(
            "sim_ivf_topk",
            lambda: {
                (r.query_id, r.neighbor_id)
                for r in ivf_topk(embs, queries_df, k=10).collect()
            },
        )
        extras["lsh_recall"] = round(len(lsh & bf) / len(bf), 4) if bf else None
        extras["ivf_recall"] = round(len(ivf & bf) / len(bf), 4) if bf else None
        timed("txt_stats", lambda: text_stats(docs, "text").count())

        # transparent-read DataSource over the docs index (r04): pushed
        # WHERE + token option + exact verify, through the DSv2 scan path
        from bloomsearch_spark import BloomSearchDataSource

        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        spark.dataSource.register(BloomSearchDataSource)

        def ds_query():
            return (
                spark.read.format("bloomsearch")
                .option("root", doc_root)
                .option("token", "stream")
                .load()
                .filter(F.col("lang").isin("de", "es"))
                .count()
            )

        timed("bs_datasource", ds_query)

        # LSH near-dup pair join: candidate funnel vs the N^2/2 crossJoin
        # it replaced (VERDICT r01 item 1) — planted twins, recall vs exact.
        # TWO stages (VERDICT r02): `sim_neardup_lsh` times ONLY the
        # production bucketed join; `sim_neardup_oracle` times the
        # recall/candidate oracle machinery (incl. its brute-force-shaped
        # candidate count) so the engine isn't charged for its own audit.
        from bloomsearch_spark.functions.similarity import (
            embedding_neardup_pairs,
            neardup_candidates,
        )

        nd_base = embs.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        nd_dup = nd_base.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.concat(
                F.array(F.element_at("embedding", 1) + F.lit(0.02)),
                F.slice("embedding", 2, F.size("embedding") - 1),
            ).alias("embedding"),
        )
        nd_aug = nd_base.unionByName(nd_dup).persist()
        nd_n = nd_aug.count()  # materialize the fixture outside both stages

        def neardup():
            return {
                (r.id_a, r.id_b)
                for r in embedding_neardup_pairs(nd_aug, 0.9).collect()
            }

        nd_pairs = timed("sim_neardup_lsh", neardup)

        def neardup_oracle():
            cand = neardup_candidates(nd_aug).count()
            extras["neardup_candidates"] = cand
            extras["neardup_vs_n2_ratio"] = round(cand / (nd_n * (nd_n - 1) / 2), 6)
            # ground truth is analytic: organic pair sims top out ~0.6, so
            # the >=0.9 set is exactly the planted twins
            planted = {
                (r.vec_id, r.vec_id + 1_000_000)
                for r in nd_base.filter(F.col("vec_id") % 10 == 0)
                .select("vec_id")
                .collect()
            }
            extras["neardup_recall"] = (
                round(len(nd_pairs & planted) / len(planted), 4) if planted else None
            )
            return cand

        timed("sim_neardup_oracle", neardup_oracle)
        # unpersisted AFTER the min-of-reps passes (the neardup stages
        # re-run against the persisted fixture)

        # ---- 4. mergeable sketches (HLL / CMS / t-digest / KLL) ------------
        from bloomsearch_spark.sketches.countmin import cms_sketch
        from bloomsearch_spark.sketches.hll import approx_distinct
        from bloomsearch_spark.sketches.kll import kll_sketch
        from bloomsearch_spark.sketches.tdigest import td_sketch

        toks = docs.select(
            "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
        ).filter(F.col("tok") != "")

        def hll_bench():
            est = {r.lang: r.estimate for r in approx_distinct(toks, "tok", ("lang",)).collect()}
            exact = {
                r.lang: r.n
                for r in toks.groupBy("lang").agg(F.countDistinct("tok").alias("n")).collect()
            }
            errs = [abs(est[k] - v) / v for k, v in exact.items() if v]
            extras["hll_max_rel_err"] = round(max(errs), 5)
            return len(est)

        timed("sk_hll", hll_bench)
        timed("sk_cms", lambda: cms_sketch(toks, "tok", eps=0.001, delta=0.01).n_items)

        li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
            "l_extendedprice"
        )
        timed("sk_tdigest", lambda: td_sketch(li, "l_extendedprice").quantile(0.5))
        timed("sk_kll", lambda: kll_sketch(li, "l_extendedprice").quantile(0.5))

        # Bloom as a sketch UDAF (r06): per-lang merged blooms + one
        # vectorized membership pass over the distinct tokens
        from bloomsearch_spark.sketches.bloomsketch import (
            bloom_contains,
            bloom_sketch_df,
        )

        def bloom_bench():
            dtoks = toks.distinct()
            merged = bloom_sketch_df(
                dtoks, "tok", ("lang",), expected_items=1 << 14, fpr=0.01
            )
            probed = bloom_contains(dtoks, "tok", merged, ("lang",))
            n, hits = probed.agg(
                F.count("*"), F.sum(F.col("maybe_present").cast("long"))
            ).first()
            extras["bloom_sketch_fn"] = int(n - hits)  # must stay 0
            return int(n)

        timed("sk_bloom", bloom_bench)

        # ANALYZE + manifest-only distinct (r06): one masked stats scan,
        # then the metadata-only read (zero data bytes)
        from bloomsearch_spark import analyze, approx_distinct_meta

        timed(
            "analyze_build",
            lambda: analyze(spark, doc_root, ["lang", "source", "doc_id"]).version,
        )
        timed(
            "analyze_meta_read",
            lambda: approx_distinct_meta(spark, doc_root).count(),
        )

        # FSCK report mode (r06): distributed block-dir existence check
        from bloomsearch_spark import fsck
        from bloomsearch_spark.sources.manifest import BloomIndex as _BI

        timed(
            "fsck_check",
            lambda: fsck(spark, _BI.load(spark, doc_root), repair=False)[1].count(),
        )

        # ---- 5. reference-scale pair (r05, verdict item 8) -----------------
        # The BASELINE headline compares against the reference at 11.2M rows
        # (PERFORMANCE.md); bench.py's own stages run at ~200k.  This stage
        # carries an at-reference-scale build + warm point query + miss in
        # the per-round BENCH_rN.json directly (previously only the manual
        # cold_probe.py run had it).  Row generation is NOT timed; the
        # build is single-shot (its cost IS the cold cost), the queries are
        # min-of-reps like every read stage.  Skipped below sf0.1 so tiny-sf
        # local iteration stays fast (BENCH_REF_ROWS=0 also disables).
        ref_rows = int(os.environ.get("BENCH_REF_ROWS", "8000000"))
        if ref_rows > 0 and sf >= 0.1:
            ref_src = tempfile.mkdtemp(prefix="bench-refsrc-")
            roots.append(ref_src)
            ref_path = os.path.join(ref_src, "code.parquet")
            generate_df(spark, ref_rows).repartition(64).write.mode(
                "overwrite"
            ).parquet(ref_path)
            ref = spark.read.parquet(ref_path)
            ref_root = tempfile.mkdtemp(prefix="bench-ref-")
            roots.append(ref_root)
            # the engine's DEFAULT zero-shuffle path: at this shape (64
            # input partitions x 125k rows, a handful of langs) per-task
            # buffers fill 10k-row blocks naturally — measured 960 blocks
            # / 80% full vs the salted repartition's 1148 / 34% full, at
            # 2-6x the throughput and none of the 8 GB shuffle's
            # bandwidth-window variance (adjacent clustered runs swung
            # 23 -> 51 s).  cluster_input stays on for build_code, whose
            # small-sf shape (~3k rows per task-partition) genuinely
            # needs consolidation to reach full blocks.
            ref_cfg = dataclasses.replace(code_cfg, cluster_input=False)
            ref_idx = timed(
                "build_ref_scale",
                lambda: build_index(spark, ref, ref_root, ref_cfg),
            )
            extras["ref_rows"] = ref_rows
            extras["ref_blocks"] = ref_idx.blocks().count()
            extras["ref_build_rows_per_sec"] = round(
                ref_rows / timings["build_ref_scale"], 1
            )
            # point lookup on a (near-)unique path token — the reference
            # headline's shape (rare-token search; a planted common needle
            # appears in EVERY 10k-row block and would time a full verify
            # scan instead of the pruned read path)
            ref_tok = (
                ref.select("path").orderBy(F.xxhash64("path")).limit(1)
                .collect()[0].path.lower()
            )
            timed(
                "ref_scale_token",
                lambda: search(
                    spark, ref_idx,
                    new_query().field_token("path", ref_tok).build(),
                ).count(),
            )
            timed(
                "ref_scale_miss",
                lambda: search(
                    spark, ref_idx, new_query().token("zz_absent_ref").build()
                ).count(),
            )
            # 64 needles at reference scale, one pass — amortizes the
            # probe + scan across the whole needle batch (vs 64 repeats
            # of ref_scale_token's single-query wall)
            ref_needle_toks = [
                r.path.lower()
                for r in ref.select("path")
                .distinct()
                .orderBy(F.xxhash64("path"))
                .limit(64)
                .collect()
            ]
            timed(
                "ref_scale_needles64",
                lambda: search_needles(
                    spark, ref_idx, ref_needle_toks, field="path"
                ).count(),
            )

        # extra interleaved passes: per-stage min over REPS total runs
        for _ in range(max(0, REPS - 1)):
            for name, fn in repeat:
                t0 = time.perf_counter()
                fn()
                timings[name] = round(
                    min(timings[name], time.perf_counter() - t0), 4
                )
        nd_aug.unpersist()
        extras["stage_reps"] = {
            name: (REPS if name in _REPEATABLE else 1) for name in timings
        }

        total = round(sum(timings.values()), 4)
        # like-for-like comparability across rounds: the round-1 suite was
        # these 17 stages; round 2 added 5 more (sketches + neardup funnel),
        # so the raw total is not a regression signal by itself
        _R01_STAGES = (
            "build_docs", "bs_token", "bs_token_warm", "bs_field_token",
            "bs_and", "bs_or", "bs_miss", "build_code", "code_needle",
            "code_miss", "prune_funnel", "dd_exact", "dd_minhash",
            "sim_topk", "sim_lsh_topk", "sim_ivf_topk", "txt_stats",
        )
        extras["suite_wall_r01_stages"] = round(
            sum(timings[s] for s in _R01_STAGES if s in timings), 4
        )
        print(
            json.dumps(
                {
                    "metric": "bloomsearch_suite_wall",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf,
                    **extras,
                }
            )
        )
    finally:
        for r in roots:
            shutil.rmtree(r, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
