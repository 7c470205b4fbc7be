"""Column mapping (r06) — metadata-only RENAME / DROP (Delta
column-mapping analog).  Physical names (parquet columns, bloom keys,
zone-map keys) are frozen at first write; the logical->physical map is
the only thing these commits touch."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import (
    Between,
    IndexConfig,
    MinMax,
    build_index,
    clone,
    drop_column,
    new_query,
    rename_column,
    restore,
    search,
)
from bloomsearch_spark.sources.manifest import BloomIndex
from bloomsearch_spark.sources.synthetic import generate_df, generate_pdf

CFG = IndexConfig(
    indexed_fields=("repo", "lang", "content"),
    partition_expr="lang",
    minmax_fields=("size",),
    max_block_rows=100,
    blocks_per_file=4,
    sha_col="content",
)


def _df(spark, n):
    return generate_df(spark, n).withColumn("size", F.length("content"))


def _pdf(n):
    pdf = generate_pdf(n)
    pdf["size"] = pdf["content"].str.len()
    return pdf


def _hits(pdf, token, col="content"):
    return pdf[pdf[col].str.lower().str.split().map(lambda t: token in t)]


def test_rename_is_metadata_only_and_queries_translate(spark, tmp_root):
    idx = build_index(spark, _df(spark, 400), tmp_root, CFG)
    refs_before = idx.table_refs()
    out = rename_column(spark, idx, "content", "body")
    # zero data / manifest-row movement: blocks+files refs identical
    assert out.table_refs()["blocks"] == refs_before["blocks"]
    assert out.table_refs()["files"] == refs_before["files"]

    pdf = _pdf(400)
    exp = _hits(pdf, "needle_alpha")
    got = search(
        spark, out, new_query().field_token("body", "needle_alpha").build()
    ).toPandas()
    assert len(got) == len(exp) > 0
    # output speaks the logical schema, order preserved
    assert list(got.columns) == ["repo", "path", "commit", "lang", "body", "size"]
    assert sorted(got["body"]) == sorted(exp["content"])
    # the old name deterministically matches nothing
    assert (
        search(
            spark, out,
            new_query().field_token("content", "needle_alpha").build(),
        ).count()
        == 0
    )
    # any-field TOKEN queries are name-free: unchanged
    assert (
        search(spark, out, new_query().token("needle_alpha").build()).count()
        == len(exp)
    )
    assert out.logical_columns() == ["repo", "path", "commit", "lang", "body", "size"]


def test_minmax_translates_after_rename(spark, tmp_root):
    idx = build_index(spark, _df(spark, 300), tmp_root, CFG)
    out = rename_column(spark, idx, "size", "nbytes")

    def q(field):
        return (
            new_query()
            .field_token("lang", "go")
            .match_prefilter(MinMax(field, Between(100, 200)))
            .build()
        )

    # the renamed zone-map query behaves EXACTLY like the physical-named
    # query on the pre-rename version (MinMax prunes blocks, not rows)
    got = search(spark, out, q("nbytes")).toPandas()
    ref = search(spark, idx, q("size")).toPandas()
    assert len(got) == len(ref) > 0
    assert sorted(got["commit"]) == sorted(ref["commit"])
    # the retired logical name fails every zone-map test (strict eval)
    q_old = (
        new_query()
        .field_token("lang", "go")
        .match_prefilter(MinMax("size", Between(0, 10**9)))
        .build()
    )
    assert search(spark, out, q_old).count() == 0


def test_append_after_rename_uses_logical_names(spark, tmp_root):
    idx = build_index(spark, _df(spark, 200), tmp_root, CFG)
    out = rename_column(spark, idx, "content", "body")
    # append speaks LOGICAL names: rename content->body on the input
    df2 = (
        _df(spark, 300)
        .withColumnRenamed("content", "body")
        .where(F.xxhash64("commit") % 3 == 0)
    )
    n2 = df2.count()
    appended = build_index(
        spark, df2, tmp_root, CFG, mode="append", source_desc="second"
    )
    assert (
        search(spark, appended, new_query().field("body").build()).count()
        == 200 + n2
    )
    # appending with the OLD physical name refuses with mapping guidance
    with pytest.raises(ValueError, match="not logical columns"):
        build_index(spark, _df(spark, 100), tmp_root, CFG, mode="append")


def test_drop_column_and_restore(spark, tmp_root):
    idx = build_index(spark, _df(spark, 300), tmp_root, CFG)
    pre = idx.version
    out = drop_column(spark, idx, "commit")
    assert out.logical_columns() == ["repo", "path", "lang", "content", "size"]
    got = search(spark, out, new_query().token("needle_alpha").build())
    assert "commit" not in got.columns
    assert got.count() == len(_hits(_pdf(300), "needle_alpha"))
    # restore to the pre-drop version: the column is back, values intact
    back = restore(spark, out, version=pre)
    got2 = search(spark, back, new_query().token("needle_alpha").build()).toPandas()
    assert sorted(got2["commit"]) == sorted(
        _hits(_pdf(300), "needle_alpha")["commit"]
    )


def test_merge_schema_readd_never_resurrects(spark, tmp_root):
    idx = build_index(spark, _df(spark, 200), tmp_root, CFG)
    out = drop_column(spark, idx, "commit")
    # re-add a column with the SAME logical name via a widening append —
    # it must get a fresh physical name, so the dropped values stay dead
    df2 = (
        _df(spark, 400)
        .where(F.xxhash64("path") % 7 == 0)
        .withColumn("commit", F.lit("fresh_commit_tag"))
    )
    n2 = df2.count()
    assert n2 > 0
    widened = build_index(
        spark, df2, tmp_root, CFG, mode="append", merge_schema=True,
        source_desc="readd",
    )
    mapping = widened.column_mapping()
    assert mapping["commit"] != "commit"  # fresh physical name
    rows = search(
        spark, widened, new_query().field("content").build()
    ).toPandas()
    assert len(rows) == 200 + n2
    new_rows = rows[rows["commit"] == "fresh_commit_tag"]
    assert len(new_rows) == n2
    # the 200 original rows read NULL commit — never the retired values
    assert rows["commit"].isna().sum() == 200


def test_refusals(spark, tmp_root):
    idx = build_index(
        spark, _df(spark, 200), tmp_root, CFG,
        constraints={"sane_size": "size < 10000000"},
    )
    with pytest.raises(ValueError, match="IndexConfig"):
        drop_column(spark, idx, "content")  # indexed + sha
    with pytest.raises(ValueError, match="IndexConfig"):
        drop_column(spark, idx, "size")  # minmax
    with pytest.raises(ValueError, match="constraint"):
        rename_column(spark, idx, "size", "nbytes")
    with pytest.raises(ValueError, match="already exists"):
        rename_column(spark, idx, "content", "path")
    with pytest.raises(ValueError, match="no logical column"):
        rename_column(spark, idx, "nope", "x")
    with pytest.raises(ValueError, match="identifier"):
        rename_column(spark, idx, "content", "bad name!")
    with pytest.raises(ValueError, match="no logical column"):
        drop_column(spark, idx, "nope")


def test_json_index_refuses_mapping(spark, tmp_root):
    cfg = IndexConfig(json_col="doc", max_block_rows=4, sha_col="doc")
    df = spark.createDataFrame(
        [(json.dumps({"a": i}),) for i in range(6)], "doc string"
    )
    idx = build_index(spark, df, tmp_root, cfg)
    with pytest.raises(ValueError, match="json_col"):
        rename_column(spark, idx, "doc", "d")
    with pytest.raises(ValueError, match="json_col"):
        drop_column(spark, idx, "doc")


def test_time_travel_speaks_each_versions_names(spark, tmp_root):
    idx = build_index(spark, _df(spark, 200), tmp_root, CFG)
    pre = idx.version
    out = rename_column(spark, idx, "content", "body")
    old = BloomIndex.load(spark, tmp_root, version=pre)
    got = search(
        spark, old, new_query().field_token("content", "needle_alpha").build()
    )
    assert "content" in got.columns and got.count() > 0
    assert (
        search(
            spark, out,
            new_query().field_token("body", "needle_alpha").build(),
        ).count()
        == got.count()
    )


def test_clone_carries_mapping(spark, tmp_root):
    idx = build_index(spark, _df(spark, 200), tmp_root, CFG)
    out = rename_column(spark, idx, "content", "body")
    c = clone(spark, out, tmp_root + "-clone")
    got = search(
        spark, c, new_query().field_token("body", "needle_alpha").build()
    )
    assert got.count() == len(_hits(_pdf(200), "needle_alpha"))
    assert "body" in got.columns


# ---------------------------------------------------------------------------
# Phase 2: DataSource / changefeed / mutations / needles under a mapping


def test_datasource_speaks_logical_names(spark, tmp_root):
    from bloomsearch_spark import BloomSearchDataSource

    idx = build_index(spark, _df(spark, 400), tmp_root, CFG)
    out = rename_column(spark, idx, "content", "body")
    out = rename_column(spark, out, "lang", "language")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(BloomSearchDataSource)
    df = spark.read.format("bloomsearch").option("root", tmp_root).load()
    assert df.columns == ["repo", "path", "commit", "body", "language", "size"] or \
        sorted(df.columns) == sorted(["repo", "path", "commit", "body", "language", "size"])
    pdf = _pdf(400)
    # WHERE on the renamed partition column: pushdown translates to the
    # physical partition_id and the result is exact
    got = df.filter(F.col("language") == "go").count()
    assert got == int((pdf["lang"] == "go").sum())
    # option query on the renamed indexed column
    hits = (
        spark.read.format("bloomsearch").option("root", tmp_root)
        .option("field_token", "body:needle_alpha").load()
    )
    exp = _hits(pdf, "needle_alpha")
    assert {r.commit for r in hits.select("commit").collect()} == set(exp["commit"])
    # exact pushdown on a renamed column (string equality reaches the scan)
    one = exp["content"].iloc[0]
    assert df.filter(F.col("body") == one).count() == int(
        (pdf["content"] == one).sum()
    )


def test_dsv2_writer_refuses_mapped_tables(spark, tmp_root):
    from bloomsearch_spark import BloomSearchDataSource

    idx = build_index(spark, _df(spark, 120), tmp_root, CFG)
    rename_column(spark, idx, "content", "body")
    spark.dataSource.register(BloomSearchDataSource)
    with pytest.raises(Exception, match="column mapping"):
        (
            _df(spark, 50).write.format("bloomsearch")
            .option("root", tmp_root).mode("append").save()
        )


def test_changes_batch_renders_logical_names(spark, tmp_root):
    from bloomsearch_spark import BloomSearchDataSource

    idx = build_index(spark, _df(spark, 150), tmp_root, CFG)  # v1
    out = rename_column(spark, idx, "content", "body")  # v2 (no rows)
    df2 = _df(spark, 220).withColumnRenamed("content", "body").where(
        F.xxhash64("commit") % 4 == 0
    )
    n2 = df2.count()
    build_index(spark, df2, tmp_root, CFG, mode="append", source_desc="more")
    spark.dataSource.register(BloomSearchDataSource)
    ch = (
        spark.read.format("bloomsearch").option("root", tmp_root)
        .option("changes_from", 0).option("commit_metadata", "true").load()
    )
    assert "body" in ch.columns and "content" not in ch.columns
    per_v = {
        r._commit_version: r["count"]
        for r in ch.groupBy("_commit_version").count().collect()
    }
    # v1 inserts, v2 (rename) emits nothing, v3 appends
    assert per_v == {1: 150, 3: n2}
    assert ch.filter(F.col("body").isNull()).count() == 0


def test_mutations_translate_after_rename(spark, tmp_root):
    from bloomsearch_spark import optimize_zorder, upsert_keys

    idx = build_index(spark, _df(spark, 300), tmp_root, CFG)
    out = rename_column(spark, idx, "content", "body")
    out = rename_column(spark, out, "size", "nbytes")
    pdf = _pdf(300)
    # DELETE with a logical-named query
    from bloomsearch_spark import delete_where

    out, stats = delete_where(
        spark, out, new_query().field_token("body", "needle_alpha").build()
    )
    n_del = len(_hits(pdf, "needle_alpha"))
    assert stats.rows_deleted == n_del > 0
    # MERGE with logical-named source + key
    repl = (
        _df(spark, 300).withColumnRenamed("content", "body")
        .withColumnRenamed("size", "nbytes")
        .orderBy("commit").limit(5)
        .withColumn("body", F.lit("upserted body row"))
    )
    out, ustats = upsert_keys(spark, out, repl, "commit")
    got = search(
        spark, out, new_query().field_token("body", "upserted").build()
    ).toPandas()
    assert len(got) == 5 and list(got.columns)[4] == "body"
    # OPTIMIZE ZORDER BY a renamed minmax column: rows bit-identical
    before = search(spark, out, new_query().field("body").build()).toPandas()
    z, _ = optimize_zorder(spark, out, ["nbytes"], bits=8)
    after = search(spark, z, new_query().field("body").build()).toPandas()
    assert sorted(before["commit"]) == sorted(after["commit"])


def test_needles_after_rename(spark, tmp_root):
    from bloomsearch_spark import search_needles

    idx = build_index(spark, _df(spark, 300), tmp_root, CFG)
    out = rename_column(spark, idx, "content", "body")
    pdf = _pdf(300)
    got = search_needles(
        spark, out, ["needle_alpha", "needle_beta"], field="body"
    )
    assert "body" in got.columns
    exp = set()
    for n in ("needle_alpha", "needle_beta"):
        exp |= {(n, c) for c in _hits(pdf, n)["commit"]}
    assert {(r.needle, r.commit) for r in got.collect()} == exp
    # dropped/unknown logical field -> deterministically empty
    assert search_needles(spark, out, ["needle_alpha"], field="content").count() == 0
