"""merge_schema TYPE WIDENING (r06 late, Delta type-widening analog).

``merge_schema=True`` appends may re-type a shared column along the
lossless promotion chains byte→short→int→long and float→double.  The
committed union schema carries the WIDEST type ever seen per column;
every read path casts historical narrow blocks up:

- ``search()`` passes the union schema to the parquet scan (Spark 4's
  vectorized reader reads int32 under a bigint read-schema natively),
- the DataSource / changefeed arrow faces end in ``.cast()`` to the
  committed schema.

Token identity holds across the chains — the tokenizer renders every
integer width identically and treats all floats as float64 (float32→
float64 is value-exact) — so blooms written under the narrow type verify
under the wide one.  Cross-chain drift (int→double, string→anything)
stays refused with or without merge_schema.
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

CFG = IndexConfig(
    indexed_fields=("lang", "content", "n"),
    partition_expr="lang",
    minmax_fields=("n",),
    max_block_rows=50,
    blocks_per_file=4,
)

SCHEMA_INT = "doc_id long, lang string, content string, n int, x float"
SCHEMA_LONG = "doc_id long, lang string, content string, n long, x double"


def _rows(lo, hi, nscale=1):
    return [
        (
            i,
            ["en", "de", "fr"][i % 3],
            f"tok{i} alpha beta",
            i * nscale,
            float(i) + 0.5,
        )
        for i in range(lo, hi)
    ]


def _narrow(spark, lo=0, hi=120):
    return spark.createDataFrame(_rows(lo, hi), SCHEMA_INT)


def _wide(spark, lo=120, hi=240):
    # n gets values past int32 on the wide side to prove the range
    return spark.createDataFrame(
        [(i, l, c, n + (5 << 32 if i >= 200 else 0), x)
         for (i, l, c, n, x) in _rows(lo, hi)],
        SCHEMA_LONG,
    )


def _search_pdf(spark, root, q):
    idx = BloomIndex.load(spark, root)
    return (
        search(spark, idx, q)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_widening_append_commits_widest_and_reads_exact(spark, tmp_root):
    build_index(spark, _narrow(spark), tmp_root, CFG, mode="overwrite")
    build_index(
        spark, _wide(spark), tmp_root, CFG, mode="append", merge_schema=True
    )
    idx = BloomIndex.load(spark, tmp_root)
    import json

    types = {
        f["name"]: f["type"]
        for f in json.loads(idx.meta()["source_schema"])["fields"]
    }
    assert types["n"] == "long" and types["x"] == "double"

    out = _search_pdf(spark, tmp_root, new_query().token("alpha").build())
    assert len(out) == 240
    assert str(out["n"].dtype) == "int64" and str(out["x"].dtype) == "float64"
    # values from the NARROW historical blocks are exact under the cast
    assert list(out["n"][:5]) == [0, 1, 2, 3, 4]
    assert out["x"][3] == 3.5
    # and the wide side's past-int32 values survive
    assert out.loc[out.doc_id == 200, "n"].iloc[0] == 200 + (5 << 32)


def test_narrow_append_onto_wide_keeps_wide(spark, tmp_root):
    build_index(
        spark,
        _wide(spark, 0, 100),
        tmp_root,
        CFG,
        mode="overwrite",
    )
    build_index(
        spark,
        _narrow(spark, 100, 160),
        tmp_root,
        CFG,
        mode="append",
        merge_schema=True,
    )
    import json

    idx = BloomIndex.load(spark, tmp_root)
    types = {
        f["name"]: f["type"]
        for f in json.loads(idx.meta()["source_schema"])["fields"]
    }
    assert types["n"] == "long" and types["x"] == "double"
    out = _search_pdf(spark, tmp_root, new_query().token("alpha").build())
    assert len(out) == 160


def test_tokens_written_narrow_verify_wide(spark, tmp_root):
    """field:token blooms inserted under int32 must hit after widening —
    integer tokens are width-independent."""
    build_index(spark, _narrow(spark), tmp_root, CFG, mode="overwrite")
    build_index(
        spark, _wide(spark), tmp_root, CFG, mode="append", merge_schema=True
    )
    out = _search_pdf(
        spark, tmp_root, new_query().field_token("n", "42").build()
    )
    assert list(out["doc_id"]) == [42]
    # minmax zone maps from the narrow int32 blocks still admit the
    # covering blocks and PRUNE the wide side (block-granular: every
    # match returned, strictly fewer than all rows scanned through)
    from bloomsearch_spark.query import Between, MinMax

    out = _search_pdf(
        spark,
        tmp_root,
        new_query()
        .token("alpha")
        .match_prefilter(MinMax("n", Between(10, 12)))
        .build(),
    )
    assert {10, 11, 12} <= set(out["doc_id"])
    assert len(out) < 240


def test_cross_chain_and_default_refusals(spark, tmp_root):
    build_index(spark, _narrow(spark), tmp_root, CFG, mode="overwrite")
    # widening without merge_schema: refused with guidance
    with pytest.raises(ValueError, match="merge_schema=True to widen"):
        build_index(spark, _wide(spark), tmp_root, CFG, mode="append")
    # int -> double: off-chain, refused even with merge_schema
    bad = _narrow(spark, 300, 310).withColumn(
        "n", F.col("n").cast("double")
    )
    with pytest.raises(ValueError, match="widens types along"):
        build_index(
            spark, bad, tmp_root, CFG, mode="append", merge_schema=True
        )
    # long -> int on a column committed long is fine (narrow side casts
    # up), but string -> long stays refused
    worse = _narrow(spark, 300, 310).withColumn(
        "content", F.lit(7).cast("long")
    )
    with pytest.raises(ValueError, match="widens types along"):
        build_index(
            spark, worse, tmp_root, CFG, mode="append", merge_schema=True
        )


def test_datasource_reads_widened_index(spark, tmp_root):
    from bloomsearch_spark import BloomSearchDataSource

    spark.dataSource.register(BloomSearchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    build_index(spark, _narrow(spark), tmp_root, CFG, mode="overwrite")
    build_index(
        spark, _wide(spark), tmp_root, CFG, mode="append", merge_schema=True
    )
    df = spark.read.format("bloomsearch").load(tmp_root)
    assert dict(df.dtypes)["n"] == "bigint"
    assert dict(df.dtypes)["x"] == "double"
    got = df.filter(F.col("n") == 42).toPandas()
    assert list(got["doc_id"]) == [42]
    # fresh load per query shape (Spark 4.1 relation cache, see CLAUDE.md)
    df = spark.read.format("bloomsearch").load(tmp_root)
    assert df.count() == 240
    total = df.agg(F.sum("n")).collect()[0][0]
    want = sum(r[3] for r in _rows(0, 240)) + 40 * (5 << 32)
    assert total == want


def test_widening_survives_compaction(spark, tmp_root):
    from bloomsearch_spark.plans.merge import maintain

    build_index(spark, _narrow(spark), tmp_root, CFG, mode="overwrite")
    build_index(
        spark, _wide(spark), tmp_root, CFG, mode="append", merge_schema=True
    )
    maintain(spark, tmp_root)
    out = _search_pdf(spark, tmp_root, new_query().token("alpha").build())
    assert len(out) == 240 and str(out["n"].dtype) == "int64"
    assert out.loc[out.doc_id == 200, "n"].iloc[0] == 200 + (5 << 32)
