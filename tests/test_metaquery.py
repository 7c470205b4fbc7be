"""Metadata-only COUNT / partition stats (r06) — exact answers from the
manifest alone, zero data reads.

Exactness ground truth is the generator pandas frame; DV-netting is
proven by running a deletion-vector delete first (the manifest row_count
is then stale by design — merge-on-read — and only the DV subtraction
makes the count right).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import (
    Between,
    Eq,
    In,
    IndexConfig,
    MinMax,
    Ne,
    Partition,
    PrefilterAnd,
    PrefilterOr,
    build_index,
    delete_where,
    metadata_count,
    new_query,
    partition_stats,
)
from bloomsearch_spark.sources.synthetic import generate_df, generate_pdf

CFG = IndexConfig(
    indexed_fields=("repo", "path", "lang", "content"),
    partition_expr="lang",
    max_block_rows=100,
    blocks_per_file=4,
    sha_col="content",
)


def _cnt(df) -> int:
    rows = df.collect()
    assert len(rows) == 1 and df.columns == ["cnt"]
    return rows[0].cnt


def test_metadata_count_partition_exact(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 900), tmp_root, CFG)
    pdf = generate_pdf(900)

    assert _cnt(metadata_count(idx)) == 900
    for expr, mask in [
        (Partition(Eq("go")), pdf["lang"] == "go"),
        (Partition(In("go", "rust")), pdf["lang"].isin(["go", "rust"])),
        (Partition(Ne("go")), pdf["lang"] != "go"),
        (
            PrefilterOr(Partition(Eq("go")), Partition(Eq("zzz"))),
            pdf["lang"] == "go",
        ),
        (PrefilterAnd(Partition(Eq("go")), Partition(Ne("go"))), pdf["lang"] != pdf["lang"]),
    ]:
        assert _cnt(metadata_count(idx, expr)) == int(mask.sum())


def test_metadata_count_refuses_minmax(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 200), tmp_root, CFG)
    with pytest.raises(ValueError, match="MINMAX"):
        metadata_count(idx, MinMax("size", Between(0, 10)))
    with pytest.raises(ValueError, match="MINMAX"):
        partition_stats(
            idx, PrefilterAnd(Partition(Eq("go")), MinMax("size", Eq(3)))
        )


def test_metadata_count_nets_deletion_vectors(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 800), tmp_root, CFG)
    pdf = generate_pdf(800)
    hit = (
        pdf["content"].str.lower().str.split().map(lambda t: "needle_alpha" in t)
    )
    out, stats = delete_where(
        spark,
        idx,
        new_query().token("needle_alpha").build(),
        use_deletion_vectors=True,
    )
    assert stats.rows_deleted == int(hit.sum()) > 0
    # manifest row_count is unchanged (merge-on-read) — only DV netting
    # makes the metadata count exact
    assert _cnt(metadata_count(out)) == 800 - int(hit.sum())
    langs = pdf[~hit].groupby("lang").size()
    for lang, n in langs.items():
        assert _cnt(metadata_count(out, Partition(Eq(lang)))) == int(n)
    # the pre-delete snapshot still counts 800 (counts travel)
    assert _cnt(metadata_count(idx)) == 800


def test_metadata_count_after_rewrite_delete(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 600), tmp_root, CFG)
    pdf = generate_pdf(600)
    hit = (
        pdf["content"].str.lower().str.split().map(lambda t: "needle_alpha" in t)
    )
    out, _ = delete_where(spark, idx, new_query().token("needle_alpha").build())
    assert _cnt(metadata_count(out)) == 600 - int(hit.sum())


def test_partition_stats_matches_groupby(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 900), tmp_root, CFG)
    pdf = generate_pdf(900)
    got = partition_stats(idx).toPandas().set_index("partition_id")
    exp = pdf.groupby("lang").size()
    assert sorted(got.index) == sorted(exp.index)
    for lang, n in exp.items():
        assert int(got.loc[lang, "n_rows"]) == int(n)
    assert int(got["n_blocks"].sum()) == idx.n_blocks()
    # prefiltered variant
    one = partition_stats(idx, Partition(Eq("go"))).toPandas()
    assert list(one["partition_id"]) == ["go"]
    assert int(one["n_rows"][0]) == int(exp["go"])


def test_unpartitioned_index_strict_semantics(spark, tmp_root):
    cfg = IndexConfig(
        indexed_fields=("repo", "content"),
        max_block_rows=100,
        sha_col="content",
    )
    idx = build_index(spark, generate_df(spark, 200), tmp_root, cfg)
    assert _cnt(metadata_count(idx)) == 200
    # strict partition eval: empty partition_id fails every condition —
    # same rows search() would return
    assert _cnt(metadata_count(idx, Partition(Eq("go")))) == 0
    assert _cnt(metadata_count(idx, Partition(Ne("go")))) == 0


def test_describe_detail(spark, tmp_root):
    """DESCRIBE DETAIL analog: exact table-level metadata from the
    manifest alone — counts match the manifest, DV/analyze/constraint
    surfaces reflected, num_rows DV-netted."""
    from bloomsearch_spark import analyze, delete_where, describe_detail
    from bloomsearch_spark.sources.manifest import BloomIndex

    idx = build_index(spark, generate_df(spark, 400), tmp_root, CFG)
    d = describe_detail(idx).first()
    assert d.format == "bloomsearch" and d.location == tmp_root
    assert d.version == 1 and d.num_rows == 400
    assert d.num_blocks == idx.blocks().count()
    assert d.num_files == idx.files().count()
    assert d.size_bytes > 0 and d.partition_expr == "lang"
    assert d.indexed_fields == ["repo", "path", "lang", "content"]
    assert not d.external and not d.shallow_clone
    assert d.n_dv_segments == 0 and d.analyzed_columns == []

    analyze(spark, tmp_root, ["repo"])
    idx = BloomIndex.load(spark, tmp_root)
    lang = generate_df(spark, 400).select("lang").first()[0]
    idx, st = delete_where(
        spark, idx, new_query().field_token("lang", lang).build(),
        use_deletion_vectors=True,
    )
    d2 = describe_detail(idx).first()
    assert d2.version == 3
    assert d2.num_rows == 400 - st.rows_deleted  # DV-netted
    assert d2.dv_masked_rows == st.rows_deleted and d2.n_dv_segments == 1
    assert d2.analyzed_columns == ["repo"]


def test_vacuum_dry_run(spark, tmp_root):
    """VACUUM DRY RUN: both vacuums report the would-remove counts without
    deleting anything; the real run then removes exactly that many."""
    from bloomsearch_spark import search, vacuum, vacuum_manifest
    from bloomsearch_spark.sources.manifest import BloomIndex

    idx = build_index(spark, generate_df(spark, 400), tmp_root, CFG)
    n_before = idx.blocks().count()
    # OVERWRITE orphans every v1 block dir (v2 references fresh ones)
    idx = build_index(
        spark, generate_df(spark, 400), tmp_root, CFG, mode="overwrite"
    )
    would = vacuum(idx, dry_run=True)
    assert would > 0
    # nothing deleted: queries over the PREVIOUS version still read data
    old = BloomIndex(spark, tmp_root, "v00000001")
    assert old.blocks().count() == n_before
    assert search(spark, old, new_query().build()).count() == 400

    wouldm = vacuum_manifest(idx, staging_ttl=0.0, dry_run=True)
    assert wouldm > 0
    assert BloomIndex.load(spark, tmp_root, version="v00000001") is not None

    assert vacuum(idx) == would
    assert vacuum_manifest(idx, staging_ttl=0.0) == wouldm


def test_metadata_bounds(spark, tmp_root):
    """Zone-map bounds: exact on a fresh build over an integer column;
    partition prefilter scopes exactly; bounds stay SOUND (outer) after a
    row-deleting rewrite; unknown columns refuse."""
    from bloomsearch_spark import delete_where, metadata_bounds
    from bloomsearch_spark.sources.manifest import BloomIndex

    cfg = IndexConfig(
        indexed_fields=("repo", "path", "lang", "content"),
        partition_expr="lang",
        minmax_fields=("size_hint",),
        max_block_rows=50,
        blocks_per_file=4,
    )
    df = generate_df(spark, 400).withColumn(
        "size_hint", (F.crc32("path") % 100000).cast("long")
    )
    build_index(spark, df, tmp_root, cfg)
    idx = BloomIndex.load(spark, tmp_root)

    b = {r.column: r for r in metadata_bounds(idx).collect()}
    mn, mx = df.agg(F.min("size_hint"), F.max("size_hint")).first()
    assert b["size_hint"].lower_bound == mn  # fresh build: exact
    assert b["size_hint"].upper_bound == mx

    lang = df.select("lang").first()[0]
    scoped = {
        r.column: r
        for r in metadata_bounds(
            idx, prefilter=Partition(Eq(lang))
        ).collect()
    }
    smn, smx = (
        df.filter(F.col("lang") == lang)
        .agg(F.min("size_hint"), F.max("size_hint"))
        .first()
    )
    assert scoped["size_hint"].lower_bound == smn
    assert scoped["size_hint"].upper_bound == smx

    with pytest.raises(ValueError, match="not a minmax-indexed column"):
        metadata_bounds(idx, columns=["repo"])

    # delete the rows holding the maximum: bounds stay sound (outer) —
    # they may not tighten, and the live max is <= the reported upper
    top_paths = [
        r.path
        for r in df.filter(F.col("size_hint") == mx).select("path").collect()
    ]
    q = new_query().field_token("path", top_paths[0].lower()).build()
    idx2, st = delete_where(spark, idx, q)
    if st.rows_deleted:
        b2 = {r.column: r for r in metadata_bounds(idx2).collect()}
        live = df.join(
            spark.createDataFrame([(p,) for p in top_paths[:1]], "path string"),
            "path",
            "left_anti",
        )
        lmn, lmx = live.agg(F.min("size_hint"), F.max("size_hint")).first()
        assert b2["size_hint"].lower_bound <= lmn
        assert lmx <= b2["size_hint"].upper_bound
