"""CLONE (r06): shallow (zero-copy, manifest-only) and deep clones.

A shallow clone's meta carries ``data_dir_override`` pointing at the
source's data dir; every read path resolves block dirs through
``BloomIndex.data_dir``, so queries work transparently.  Shallow clones
are READ-ONLY for block data — appends and data-rewriting ops refuse
with guidance — while metadata-only ops (expire, merge, restore within
the clone) work, making a clone a cheap experimental fork.  Deep clones
copy every referenced block dir (distributed) and are fully independent.
"""

import os

import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import (
    BloomIndex,
    IndexConfig,
    build_index,
    clone,
    compact_blocks,
    delete_where,
    expire_blocks,
    new_query,
    restore,
    search,
    upsert_keys,
    vacuum,
)
from bloomsearch_spark.sources import manifest as mf
from bloomsearch_spark.sources.synthetic import generate_df, generate_pdf

CFG = IndexConfig(
    indexed_fields=("repo", "path", "lang", "content"),
    partition_expr="lang",
    max_block_rows=100,
    blocks_per_file=4,
    sha_col="content",
)


def _hits(spark, root_or_idx, token="needle_alpha"):
    idx = (
        root_or_idx
        if isinstance(root_or_idx, BloomIndex)
        else BloomIndex.load(
            root_or_idx.sparkSession
            if hasattr(root_or_idx, "sparkSession")
            else None,
            root_or_idx,
        )
    )
    return search(spark, idx, new_query().token(token).build())


def test_shallow_clone_reads_and_refuses_data_mutations(
    spark, tmp_root, tmp_path
):
    idx = build_index(spark, generate_df(spark, 400), tmp_root, CFG)
    croot = str(tmp_path / "clone")
    cl = clone(spark, idx, croot)  # shallow

    assert cl.version == "v00000001"
    assert cl.is_shallow_clone
    assert cl.data_dir == idx.data_dir  # zero-copy: SOURCE data dir
    assert not os.path.exists(os.path.join(croot, "data"))
    # reads are exact through the clone
    pdf = generate_pdf(400)
    hit = pdf["content"].str.lower().str.split().map(
        lambda t: "needle_alpha" in t
    )
    got = search(spark, cl, new_query().token("needle_alpha").build())
    assert got.count() == int(hit.sum()) > 0

    # data mutations refuse with guidance
    extra = generate_df(spark, 50, seed=7)
    with pytest.raises(ValueError, match="SHALLOW CLONE"):
        build_index(spark, extra, croot, CFG, mode="append")
    for op in (
        lambda: delete_where(
            spark, cl, new_query().token("needle_alpha").build()
        ),
        lambda: upsert_keys(spark, cl, extra, key_field="path"),
        lambda: compact_blocks(spark, cl),
        lambda: vacuum(cl),
    ):
        with pytest.raises(ValueError, match="SHALLOW CLONE"):
            op()

    # metadata-only ops WORK on the clone and never touch source data:
    # expire one partition on the clone, source keeps answering fully
    lang = pdf["lang"].iloc[0]
    cl2, _ = expire_blocks(
        spark, cl, F.col("partition_id") == lang
    )
    assert cl2.is_shallow_clone  # override carried by the commit
    assert (
        search(spark, cl2, new_query().field("content").build()).count()
        == int((pdf["lang"] != lang).sum())
    )
    src_count = search(
        spark, BloomIndex.load(spark, tmp_root),
        new_query().field("content").build(),
    ).count()
    assert src_count == 400  # the experiment never touched the source
    # restore WITHIN the clone rolls the experiment back
    cl3 = restore(spark, BloomIndex.load(spark, croot), version="v00000001")
    assert cl3.is_shallow_clone
    assert (
        search(spark, cl3, new_query().field("content").build()).count() == 400
    )


def test_clone_refuses_occupied_root(spark, tmp_root, tmp_path):
    idx = build_index(spark, generate_df(spark, 100), tmp_root, CFG)
    other = str(tmp_path / "occupied")
    build_index(spark, generate_df(spark, 50, seed=3), other, CFG)
    with pytest.raises(ValueError, match="already holds"):
        clone(spark, idx, other)


def test_deep_clone_is_independent(spark, tmp_root, tmp_path):
    idx = build_index(spark, generate_df(spark, 300), tmp_root, CFG)
    croot = str(tmp_path / "deep")
    cl = clone(spark, idx, croot, shallow=False)
    assert not cl.is_shallow_clone
    assert cl.data_dir == os.path.join(croot, "data")

    pdf = generate_pdf(300)
    hit = pdf["content"].str.lower().str.split().map(
        lambda t: "needle_alpha" in t
    )
    assert (
        search(spark, cl, new_query().token("needle_alpha").build()).count()
        == int(hit.sum())
    )
    # fully independent: mutate + vacuum the clone, source unaffected
    out, stats = delete_where(
        spark, cl, new_query().token("needle_alpha").build()
    )
    assert stats.rows_deleted == int(hit.sum())
    vacuum(out)
    assert (
        search(
            spark, BloomIndex.load(spark, tmp_root),
            new_query().token("needle_alpha").build(),
        ).count()
        == int(hit.sum())
    )
    # and vice versa: vacuuming the SOURCE doesn't break the deep clone
    vacuum(BloomIndex.load(spark, tmp_root))
    assert (
        search(spark, out, new_query().field("content").build()).count()
        == int((~hit).sum())
    )


def test_clone_of_historical_version(spark, tmp_root, tmp_path):
    idx1 = build_index(spark, generate_df(spark, 200), tmp_root, CFG)
    build_index(
        spark, generate_df(spark, 100, seed=7), tmp_root, CFG, mode="append"
    )
    cl = clone(
        spark, BloomIndex.load(spark, tmp_root),
        str(tmp_path / "hist"), version=idx1.version,
    )
    assert (
        search(spark, cl, new_query().field("content").build()).count() == 200
    )
    assert cl.meta()["cloned_from"]["version"] == idx1.version
