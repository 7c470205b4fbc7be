"""ANALYZE column statistics (plans/analyze.py): manifest-only
approx-distinct, coverage/staleness refusals, carry through every commit
class (append, maintenance, fold, restore), column-mapping translation."""

import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import (
    IndexConfig,
    analyze,
    approx_distinct_meta,
    build_index,
    delete_where,
    fold_manifest,
    merge_files,
    new_query,
    rename_column,
    restore,
)
from bloomsearch_spark.sources.manifest import BloomIndex
from bloomsearch_spark.sources.synthetic import generate_df

CFG = IndexConfig(
    indexed_fields=("repo", "path", "lang", "content"),
    partition_expr="lang",
    max_block_rows=100,
    blocks_per_file=4,
)

COLS = ["lang", "repo", "content"]


def _est(spark, root, **kw):
    return {
        r.column: r
        for r in approx_distinct_meta(spark, root, **kw).collect()
    }


def _assert_exact(df, est, cols=COLS, n_rows=None):
    n_rows = n_rows if n_rows is not None else df.count()
    for c in cols:
        exact = df.select(F.countDistinct(c)).first()[0]
        r = est[c]
        assert abs(r.n_distinct - exact) <= 4 * r.rse * max(exact, 1), (c, r)
        assert r.null_count == df.filter(F.col(c).isNull()).count()
        assert r.row_count == n_rows, (c, r.row_count, n_rows)
        assert r.blocks_covered == r.blocks_live, (c, r)


def test_analyze_meta_only_distinct(spark, tmp_root):
    """approx_distinct_meta answers from the manifest alone: estimates
    within the 4σ HLL bound, null/row counts EXACT, full coverage — and the
    read touches zero block data (deleting the data dir doesn't change the
    answer)."""
    df = generate_df(spark, 900)
    build_index(spark, df, tmp_root, CFG)
    idx = analyze(spark, tmp_root, COLS)
    assert idx.version == "v00000002"
    _assert_exact(df, _est(spark, tmp_root), n_rows=900)

    # zero-data-read proof: nuke the block data, the metadata answer stands
    import shutil

    shutil.rmtree(f"{tmp_root}/data")
    _assert_exact(df, _est(spark, tmp_root), n_rows=900)


def test_analyze_refusals(spark, tmp_root):
    df = generate_df(spark, 200)
    build_index(spark, df, tmp_root, CFG)
    with pytest.raises(ValueError, match="no column statistics"):
        approx_distinct_meta(spark, tmp_root)
    with pytest.raises(ValueError, match="unknown columns"):
        analyze(spark, tmp_root, ["nope"])
    with pytest.raises(ValueError, match="at least one column"):
        analyze(spark, tmp_root, [])


def test_coverage_refusal_and_partial(spark, tmp_root):
    """Blocks appended after analyze() have no stats: the read refuses,
    allow_partial reports the covered subset, re-analyze restores full
    coverage."""
    df = generate_df(spark, 400)
    build_index(spark, df.filter(F.crc32("path") % 2 == 0), tmp_root, CFG)
    analyze(spark, tmp_root, COLS)
    build_index(
        spark, df.filter(F.crc32("path") % 2 == 1), tmp_root, CFG, mode="append"
    )
    with pytest.raises(ValueError, match="cover .*live blocks"):
        approx_distinct_meta(spark, tmp_root)
    part = _est(spark, tmp_root, allow_partial=True)
    even = df.filter(F.crc32("path") % 2 == 0)
    for c in COLS:
        r = part[c]
        assert r.blocks_covered < r.blocks_live
        assert r.row_count == even.count()
    analyze(spark, tmp_root, COLS)
    _assert_exact(df, _est(spark, tmp_root), n_rows=400)


def test_dv_staleness_refusal(spark, tmp_root):
    """Merge-on-read DV deletes newer than the stats: refuse (sketches
    cannot subtract) unless stale_ok; a fresh analyze() scans MASKED and is
    exact again."""
    df = generate_df(spark, 300)
    build_index(spark, df, tmp_root, CFG)
    analyze(spark, tmp_root, COLS)
    idx = BloomIndex.load(spark, tmp_root)
    lang = df.select("lang").first()[0]
    idx, _ = delete_where(
        spark, idx, new_query().field_token("lang", lang).build(),
        use_deletion_vectors=True,
    )
    with pytest.raises(ValueError, match="deletion vectors"):
        approx_distinct_meta(spark, tmp_root)
    stale = _est(spark, tmp_root, stale_ok=True)
    live = df.filter(F.col("lang") != lang)
    assert stale["lang"].row_count == 300  # as-of-analyze (upper bound)
    analyze(spark, tmp_root, COLS)
    _assert_exact(live, _est(spark, tmp_root), n_rows=live.count())


def test_stats_survive_maintenance_and_fold(spark, tmp_root):
    """Metadata-only merges keep (block_id, data_path) so coverage holds;
    fold re-segments the colstats table to ONE segment and answers are
    unchanged."""
    df = generate_df(spark, 600)
    build_index(spark, df, tmp_root, CFG)
    analyze(spark, tmp_root, COLS)
    idx = BloomIndex.load(spark, tmp_root)
    idx, _ = merge_files(
        spark, idx, max_blocks_per_file=1000, max_files_per_merge=1000
    )
    _assert_exact(df, _est(spark, tmp_root), n_rows=600)
    folded = fold_manifest(spark, BloomIndex.load(spark, tmp_root))
    assert len(folded.colstats_refs()) == 1
    _assert_exact(df, _est(spark, tmp_root), n_rows=600)


def test_restore_travels_stats(spark, tmp_root):
    """Restore re-references the TARGET's colstats: the rolled-back state
    answers with its own (full-coverage) stats."""
    df = generate_df(spark, 400)
    build_index(spark, df.filter(F.crc32("path") % 2 == 0), tmp_root, CFG)
    v_analyzed = analyze(spark, tmp_root, COLS)
    build_index(
        spark, df.filter(F.crc32("path") % 2 == 1), tmp_root, CFG, mode="append"
    )
    restored = restore(
        spark, BloomIndex.load(spark, tmp_root), version=v_analyzed.version
    )
    assert restored.colstats_refs() == v_analyzed.colstats_refs()
    even = df.filter(F.crc32("path") % 2 == 0)
    _assert_exact(even, _est(spark, tmp_root), n_rows=even.count())


def test_column_mapping_translation(spark, tmp_root):
    """analyze/approx speak LOGICAL names across a rename: stats rows store
    the frozen physical name, reads translate at plan time and emit the
    logical name."""
    df = generate_df(spark, 300)
    built = build_index(spark, df, tmp_root, CFG)
    renamed = rename_column(spark, built, "repo", "repository")
    analyze(spark, tmp_root, ["repository", "lang"])
    est = _est(spark, tmp_root)
    assert set(est) == {"repository", "lang"}
    exact = df.select(F.countDistinct("repo")).first()[0]
    r = est["repository"]
    assert abs(r.n_distinct - exact) <= 4 * r.rse * max(exact, 1)
    with pytest.raises(ValueError, match="unknown columns"):
        analyze(spark, tmp_root, ["repo"])  # old logical name is gone


def test_maintain_analyze_leg(spark, tmp_root):
    """maintain(analyze_columns=...) restores full stats coverage after
    its rewrites — one scheduled pass keeps metadata-only answers live."""
    from bloomsearch_spark import maintain

    df = generate_df(spark, 500)
    build_index(spark, df, tmp_root, CFG)
    analyze(spark, tmp_root, COLS)
    # a compaction mints fresh block ids -> coverage would drop...
    out = maintain(
        spark, tmp_root, compact_rows=500, analyze_columns=COLS,
    )
    assert out["analyzed"] and out["blocks_rewritten"] >= 0
    # ...but the analyze leg re-covered everything, post-rewrite layout
    _assert_exact(df, _est(spark, tmp_root), n_rows=500)


def test_analyze_and_clone_interaction(spark, tmp_root):
    """Shallow clones: the source's stats travel with the fork (refs point
    at the source's immutable segments), an in-clone re-analyze commits to
    the CLONE's manifest only, and deep clones answer independently."""
    from bloomsearch_spark import clone

    df = generate_df(spark, 300)
    build_index(spark, df, tmp_root, CFG)
    analyze(spark, tmp_root, ["repo"])
    src = BloomIndex.load(spark, tmp_root)

    sh = clone(spark, src, tmp_root + "-shallow")
    est = _est(spark, sh.root)
    assert set(est) == {"repo"}
    assert est["repo"].blocks_covered == est["repo"].blocks_live

    # in-clone re-analyze (reads source data via data_dir_override,
    # commits to the clone): source's version history untouched
    v_src_before = BloomIndex.load(spark, tmp_root).version
    analyze(spark, sh.root, ["repo", "lang"])
    assert BloomIndex.load(spark, tmp_root).version == v_src_before
    assert set(_est(spark, sh.root)) == {"repo", "lang"}
    assert set(_est(spark, tmp_root)) == {"repo"}  # source unchanged

    dp = clone(spark, src, tmp_root + "-deep", shallow=False)
    est_d = _est(spark, dp.root)
    assert est_d["repo"].blocks_covered == est_d["repo"].blocks_live


def test_analyze_nullable_int_hll_identity(spark, tmp_root):
    """HLL value identity across batch null-composition: a nullable int
    column arrives float64 in batches with nulls and int64 in null-free
    ones; hashing must land 42 and 42.0 in the SAME register or
    n_distinct inflates past the published bound (ADVICE r06).  Nulls are
    confined to the second half so some BLOCK FILES (and hence some scan
    batches) are null-free int64 while others are float64-promoted."""
    rows = [
        (i, None if (i >= 300 and i % 3 == 0) else (i % 7)) for i in range(600)
    ]
    df = spark.createDataFrame(rows, "id long, k long")
    cfg = IndexConfig(indexed_fields=("id",), max_block_rows=50)
    build_index(spark, df, tmp_root, cfg)
    analyze(spark, tmp_root, ["k"])
    r = _est(spark, tmp_root)["k"]
    exact = df.select(F.countDistinct("k")).first()[0]  # 6 (k=0 kept, None not)
    assert abs(r.n_distinct - exact) <= 4 * r.rse * max(exact, 1), (r, exact)
    assert r.null_count == df.filter(F.col("k").isNull()).count()


def test_analyze_refuses_interval_like_prefix(spark, tmp_root):
    """The atomic-type gate matches base types EXACTLY: 'interval day to
    second' must not slip past via the 'int' prefix (ADVICE r06)."""
    df = generate_df(spark, 60).withColumn(
        "iv", F.expr("INTERVAL '3' DAY")
    )
    cfg = IndexConfig(indexed_fields=("repo",), max_block_rows=50)
    build_index(spark, df, tmp_root, cfg)
    with pytest.raises(ValueError, match="non-atomic"):
        analyze(spark, tmp_root, ["iv"])
