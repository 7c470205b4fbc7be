"""Index changefeed (r05): the index as a Structured Streaming SOURCE.

Each committed BUILD version's added rows arrive as one micro-batch;
maintenance commits (merge/fold) emit nothing; offsets are manifest
version numbers, so restart-from-checkpoint replays exactly."""

import os

import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import (
    IndexConfig,
    build_index,
    fold_manifest,
    merge_files,
)
from bloomsearch_spark.sources.datasource import BloomSearchDataSource
from bloomsearch_spark.sources.manifest import BloomIndex
from bloomsearch_spark.sources.synthetic import generate_df, generate_pdf

CFG = IndexConfig(
    indexed_fields=("repo", "path", "lang", "content"),
    partition_expr="lang",
    max_block_rows=100,
    blocks_per_file=4,
    sha_col="content",
)


def _drain(q):
    q.processAllAvailable()


def test_changefeed_emits_appends_not_maintenance(spark, tmp_root, tmp_path):
    spark.dataSource.register(BloomSearchDataSource)
    build_index(spark, generate_df(spark, 400), tmp_root, CFG)
    build_index(
        spark, generate_df(spark, 150, seed=7).coalesce(1), tmp_root, CFG,
        mode="append", source_desc="a1",
    )

    stream = (
        spark.readStream.format("bloomsearch")
        .option("root", tmp_root)
        .option("starting_version", "earliest")
        .load()
    )
    q = (
        stream.writeStream.format("memory").queryName("feed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        _drain(q)
        got = spark.table("feed")
        assert got.count() == 550
        # exact rows, not just counts
        exp = set(generate_pdf(400)["commit"]) | set(generate_pdf(150, seed=7)["commit"])
        assert {r.commit for r in got.select("commit").collect()} == exp

        # maintenance commits emit NOTHING
        idx = BloomIndex.load(spark, tmp_root)
        merged, _ = merge_files(spark, idx, max_blocks_per_file=1000,
                                max_files_per_merge=1000)
        fold_manifest(spark, BloomIndex.load(spark, tmp_root))
        _drain(q)
        assert spark.table("feed").count() == 550

        # a new append after maintenance arrives as its own batch
        build_index(
            spark, generate_df(spark, 60, seed=9).coalesce(1), tmp_root, CFG,
            mode="append", source_desc="a2",
        )
        _drain(q)
        assert spark.table("feed").count() == 610
    finally:
        q.stop()


def test_changefeed_checkpoint_restart_exactly_once(spark, tmp_root, tmp_path):
    """Offsets are manifest versions: a restarted query resumes from its
    checkpoint and emits only post-checkpoint commits (no duplicates)."""
    spark.dataSource.register(BloomSearchDataSource)
    build_index(spark, generate_df(spark, 300), tmp_root, CFG)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_until_drained():
        q = (
            spark.readStream.format("bloomsearch").option("root", tmp_root)
            .option("starting_version", "earliest").load()
            .writeStream.format("parquet").option("path", out_dir)
            .option("checkpointLocation", ckpt).start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_until_drained()
    assert spark.read.parquet(out_dir).count() == 300
    build_index(
        spark, generate_df(spark, 120, seed=3).coalesce(1), tmp_root, CFG,
        mode="append", source_desc="a1",
    )
    run_until_drained()
    got = spark.read.parquet(out_dir)
    assert got.count() == 420  # 300 + 120, nothing re-emitted
    exp = set(generate_pdf(300)["commit"]) | set(generate_pdf(120, seed=3)["commit"])
    assert {r.commit for r in got.select("commit").collect()} == exp


def test_changefeed_latest_skips_history(spark, tmp_root, tmp_path):
    spark.dataSource.register(BloomSearchDataSource)
    build_index(spark, generate_df(spark, 200), tmp_root, CFG)
    stream = (
        spark.readStream.format("bloomsearch").option("root", tmp_root)
        .option("starting_version", "latest").load()
    )
    q = (
        stream.writeStream.format("memory").queryName("feed_latest")
        .option("checkpointLocation", str(tmp_path / "ckpt2")).start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("feed_latest").count() == 0  # history skipped
        build_index(
            spark, generate_df(spark, 80, seed=5).coalesce(1), tmp_root, CFG,
            mode="append", source_desc="new",
        )
        q.processAllAvailable()
        assert spark.table("feed_latest").count() == 80
    finally:
        q.stop()


def test_changefeed_rejects_external(spark, tmp_path):
    from bloomsearch_spark import build_external_index

    spark.dataSource.register(BloomSearchDataSource)
    src = str(tmp_path / "src.parquet")
    generate_df(spark, 100).coalesce(1).write.mode("overwrite").parquet(src)
    root = str(tmp_path / "xroot")
    build_external_index(
        spark, src, root, IndexConfig(indexed_fields=("content",))
    )
    # the refusal may fire at planning (start) or on the first trigger
    with pytest.raises(Exception, match="changefeed|external"):
        q = (
            spark.readStream.format("bloomsearch").option("root", root)
            .load().writeStream.format("memory").queryName("nope")
            .option("checkpointLocation", str(tmp_path / "c3")).start()
        )
        try:
            q.processAllAvailable()
            if q.exception() is not None:
                raise q.exception()
        finally:
            q.stop()


def test_changefeed_refuses_presegment_versions(tmp_root):
    """r05 review: a pre-segment (legacy) version's blocks.parquet is a
    FULL SNAPSHOT — treating it as a delta would re-emit the whole index
    per legacy version; the reader refuses loudly instead."""
    from pyspark.sql.types import StructType, StructField, StringType

    from bloomsearch_spark.sources import manifest as mf
    from bloomsearch_spark.streaming.changefeed import BloomSearchStreamReader

    mf.write_meta(
        os.path.join(tmp_root, "manifest", "v00000001"), CFG,
        extra={"source_schema": StructType(
            [StructField("content", StringType())]
        ).json()},  # NO "tables" key = legacy snapshot manifest
    )
    mf.commit_version(tmp_root, "v00000001")
    r = BloomSearchStreamReader(
        {"root": tmp_root},
        StructType([StructField("content", StringType())]),
    )
    with pytest.raises(RuntimeError, match="segmented manifest"):
        r.partitions({"version": 0}, {"version": 1})
