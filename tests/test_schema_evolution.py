"""Opt-in schema evolution (r06, VERDICT r05 item 5).

``merge_schema=True`` on an append (library ``build_index`` / the
DataSource writer's ``merge_schema`` option) widens the committed column
set — ADD-COLUMN only, the Delta ``mergeSchema`` analog.  Every read path
resolves the committed UNION schema (meta ``source_schema``) and
null-fills narrower historical blocks:

- ``search()`` passes the union schema explicitly to the pruned parquet
  scan (schema-on-read null-fill; no mergeSchema footer sweep),
- the DataSource's arrow block read appends typed null columns before
  projecting to the output schema,
- the changefeed already null-filled arrow-side (r05).

Refused, with or without merge_schema: dropping columns (silent data
loss on read) and re-typing a shared column (corrupts the union read and
the zone maps).  Reference analog: the Go engine is schemaless JSON
(bloomsearch.go ingest path) so drift never arises there; this is the
Delta/Iceberg-shaped surface the brief's training pipeline expects.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import (
    BloomIndex,
    IndexConfig,
    build_index,
    new_query,
    search,
)
from bloomsearch_spark.plans.merge import maintain
from bloomsearch_spark.sources.synthetic import generate_df, generate_pdf

CFG = IndexConfig(
    indexed_fields=("lang", "content", "tag"),
    partition_expr="lang",
    max_block_rows=100,
    blocks_per_file=4,
    sha_col="content",
)


def _base(spark, n=400, seed=42):
    return generate_df(spark, n, seed=seed)


def _widened(spark, n=400, seed=7):
    # deterministic new column: tokenizable + regexable
    return generate_df(spark, n, seed=seed).withColumn(
        "tag", F.concat(F.lit("tg_"), F.col("lang"))
    )


def _expected(pdfs_tags, token):
    """(pdf, tag_or_None) list -> expected matching rows as a pandas frame."""
    frames = []
    for pdf, tag in pdfs_tags:
        p = pdf.copy()
        p["tag"] = "tg_" + p["lang"] if tag else None
        frames.append(p)
    allp = pd.concat(frames, ignore_index=True)
    mask = allp["content"].str.lower().str.split().map(lambda t: token in t)
    return allp[mask]


# ---------------------------------------------------------------------------
# refusals


def test_append_extra_column_refused_without_merge_schema(spark, tmp_root):
    build_index(spark, _base(spark, 200), tmp_root, CFG, mode="overwrite")
    with pytest.raises(ValueError, match="merge_schema"):
        build_index(spark, _widened(spark, 100), tmp_root, CFG, mode="append")


def test_merge_schema_never_drops_columns(spark, tmp_root):
    build_index(spark, _base(spark, 200), tmp_root, CFG, mode="overwrite")
    with pytest.raises(ValueError, match="missing existing columns"):
        build_index(
            spark,
            _base(spark, 100).drop("commit"),
            tmp_root,
            CFG,
            mode="append",
            merge_schema=True,
        )


def test_type_drift_refused_even_with_merge_schema(spark, tmp_root):
    build_index(spark, _base(spark, 200), tmp_root, CFG, mode="overwrite")
    retyped = _base(spark, 100).withColumn("commit", F.lit(1).cast("long"))
    for ms in (False, True):
        with pytest.raises(ValueError, match="type"):
            build_index(
                spark, retyped, tmp_root, CFG, mode="append", merge_schema=ms
            )


# ---------------------------------------------------------------------------
# widening append + every read path


def test_widened_append_search_null_fills_old_blocks(spark, tmp_root):
    build_index(spark, _base(spark), tmp_root, CFG, mode="overwrite")
    idx = build_index(
        spark, _widened(spark), tmp_root, CFG, mode="append", merge_schema=True
    )
    assert set(idx.meta()["source_columns"]) == {
        "repo", "path", "commit", "lang", "content", "tag"
    }

    got = (
        search(spark, idx, new_query().token("needle_alpha").build())
        .toPandas()
        .sort_values(["commit"])
        .reset_index(drop=True)
    )
    exp = (
        _expected(
            [(generate_pdf(400, seed=42), False), (generate_pdf(400, seed=7), True)],
            "needle_alpha",
        )
        .sort_values(["commit"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(idx.meta()["source_columns"])
    assert len(got) == len(exp) > 0
    # old-block rows surface with NULL tag, new-block rows with the value
    pd.testing.assert_series_equal(
        got["tag"].where(got["tag"].notna(), None).astype(object),
        exp["tag"].astype(object),
        check_names=False,
    )
    assert (got["content"].to_numpy() == exp["content"].to_numpy()).all()

    # query ON the evolved column: blooms cover it in new blocks only and
    # old rows are null -> exactly the widened half matches
    some_lang = exp[exp["tag"].notna()]["lang"].iloc[0]
    got_tag = search(
        spark, idx, new_query().field_token("tag", f"tg_{some_lang}").build()
    ).toPandas()
    exp_tag = generate_pdf(400, seed=7)
    exp_tag = exp_tag[exp_tag["lang"] == some_lang]
    assert len(got_tag) == len(exp_tag)
    assert (got_tag["tag"] == f"tg_{some_lang}").all()


def test_widened_index_survives_maintenance(spark, tmp_root):
    build_index(spark, _base(spark), tmp_root, CFG, mode="overwrite")
    idx = build_index(
        spark, _widened(spark), tmp_root, CFG, mode="append", merge_schema=True
    )
    n_before = search(
        spark, idx, new_query().token("needle_alpha").build()
    ).count()
    maintain(spark, tmp_root, compact_rows=CFG.max_block_rows)
    idx2 = BloomIndex.load(spark, tmp_root)
    got = search(spark, idx2, new_query().token("needle_alpha").build()).toPandas()
    assert len(got) == n_before
    assert got["tag"].notna().any() and got["tag"].isna().any()


def test_datasource_read_and_writer_merge_schema(spark, tmp_root):
    from bloomsearch_spark.sources.datasource import BloomSearchDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(BloomSearchDataSource)
    (
        _base(spark).write.format("bloomsearch")
        .option("root", tmp_root)
        .option("indexed_fields", "lang,content,tag")
        .option("partition_col", "lang")
        .option("max_block_rows", "100")
        .option("sha_col", "content")
        .mode("overwrite").save()
    )
    # widened append REFUSES without the option...
    with pytest.raises(Exception, match="merge_schema"):
        (
            _widened(spark, 200).write.format("bloomsearch")
            .option("root", tmp_root).mode("append").save()
        )
    # ...and widens with it
    (
        _widened(spark, 200).write.format("bloomsearch")
        .option("root", tmp_root).option("merge_schema", "true")
        .mode("append").save()
    )

    df = spark.read.format("bloomsearch").option("root", tmp_root).load()
    assert "tag" in df.columns
    assert df.count() == 600
    assert df.filter(F.col("tag").isNull()).count() == 400
    got = (
        spark.read.format("bloomsearch").option("root", tmp_root)
        .option("token", "needle_alpha").load().toPandas()
    )
    exp = _expected(
        [(generate_pdf(400, seed=42), False), (generate_pdf(200, seed=7), True)],
        "needle_alpha",
    )
    assert len(got) == len(exp)
    assert sorted(got["commit"]) == sorted(exp["commit"])
    assert got["tag"].isna().sum() == exp["tag"].isna().sum()


def test_delete_where_over_two_schema_index(spark, tmp_root):
    """delete_where over an evolved index: the rewrite scan reads the
    UNION schema (old blocks null-filled), so rewritten old blocks
    materialize the evolved column as typed nulls and every read after
    the delete stays union-schema consistent."""
    from bloomsearch_spark import delete_where

    build_index(spark, _base(spark), tmp_root, CFG, mode="overwrite")
    idx = build_index(
        spark, _widened(spark), tmp_root, CFG, mode="append", merge_schema=True
    )
    out, stats = delete_where(
        spark, idx, new_query().token("needle_alpha").build()
    )
    old_pdf, new_pdf = generate_pdf(400, seed=42), generate_pdf(400, seed=7)
    hit_old = old_pdf["content"].str.lower().str.split().map(
        lambda t: "needle_alpha" in t
    )
    hit_new = new_pdf["content"].str.lower().str.split().map(
        lambda t: "needle_alpha" in t
    )
    assert stats.rows_deleted == int(hit_old.sum() + hit_new.sum()) > 0
    got = search(spark, out, new_query().field("content").build()).toPandas()
    assert list(got.columns) == list(out.meta()["source_columns"])
    assert len(got) == int((~hit_old).sum() + (~hit_new).sum())
    # survivors from rewritten OLD blocks still surface NULL tag
    assert got["tag"].isna().sum() == int((~hit_old).sum())


def test_changefeed_across_widening_append(spark, tmp_root, tmp_path):
    """A consumer whose schema was fixed before the widening keeps
    streaming (evolved column projected out); a feed started after sees
    the union schema with old commits null-filled."""
    from bloomsearch_spark.sources.datasource import BloomSearchDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(BloomSearchDataSource)
    build_index(spark, _base(spark, 200), tmp_root, CFG, mode="overwrite")

    q = (
        spark.readStream.format("bloomsearch").option("root", tmp_root)
        .option("starting_version", "earliest").load()
        .writeStream.format("memory").queryName("evo_feed")
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("evo_feed").count() == 200
        build_index(
            spark, _widened(spark, 100), tmp_root, CFG,
            mode="append", merge_schema=True,
        )
        q.processAllAvailable()
        assert q.exception() is None
        got = spark.table("evo_feed")
        assert got.count() == 300
        assert "tag" not in got.columns  # pre-widening consumer schema
    finally:
        q.stop()

    # fresh batch changes read AFTER the widening: union schema, old
    # commit null-filled
    ev = (
        spark.read.format("bloomsearch").option("root", tmp_root)
        .option("changes_from", "0").option("commit_metadata", "true").load()
    )
    assert "tag" in ev.columns
    assert ev.count() == 300
    assert ev.filter("_commit_version = 1 AND tag IS NULL").count() == 200
    assert ev.filter("_commit_version = 2 AND tag IS NOT NULL").count() == 100
