"""Streaming ingest e2e — micro-batch appends mirror the reference's
flush-per-trigger semantics (rows visible only after flush + manifest
commit, bloom_tree_engine_test.go:123-292); replayed batches are no-ops
(exactly-once watermark)."""

import os

import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import IndexConfig, new_query, search, verify_integrity
from bloomsearch_spark.sources.manifest import BloomIndex
from bloomsearch_spark.sources.synthetic import generate_pdf
from bloomsearch_spark.streaming.ingest import append_batch, stream_build

CFG = IndexConfig(
    indexed_fields=("repo", "path", "lang", "content"),
    partition_expr="lang",
    max_block_rows=200,
    blocks_per_file=4,
    block_fpr=0.01,
    file_fpr=0.01,
    file_expected_items=20_000,
    compression="snappy",
    sha_col="content",
)

SCHEMA = "repo string, path string, commit string, lang string, content string"


def test_stream_build_file_source(spark, tmp_root, tmp_path):
    """Files land -> stream drains -> index holds exactly those rows;
    a second drain picks up only new files (incremental append)."""
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    pdf = generate_pdf(1_200)

    spark.createDataFrame(pdf.iloc[:700], schema=SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "f1"))

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        src + "/*"
    )
    q = stream_build(stream, tmp_root, CFG, ckpt, trigger={"availableNow": True})
    q.awaitTermination(120)

    idx = BloomIndex.load(spark, tmp_root)
    assert idx.blocks().agg(F.sum("row_count")).collect()[0][0] == 700
    assert search(spark, idx, new_query().build()).count() == 700

    # second wave of files
    spark.createDataFrame(pdf.iloc[700:], schema=SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(src, "f2"))
    q2 = stream_build(stream, tmp_root, CFG, ckpt, trigger={"availableNow": True})
    q2.awaitTermination(120)

    idx2 = BloomIndex.load(spark, tmp_root)
    assert idx2.version != idx.version
    assert idx2.blocks().agg(F.sum("row_count")).collect()[0][0] == 1_200
    got = search(spark, idx2, new_query().token("needle_alpha").build())
    expect = sum(
        "needle_alpha" in c.lower().split() for c in pdf["content"]
    )
    assert got.count() == expect
    assert verify_integrity(spark, idx2) == 0
    # lineage records every streamed batch
    descs = {r.source_desc for r in idx2.lineage().select("source_desc").distinct().collect()}
    assert any(d.startswith("stream-batch-") for d in descs)


def test_stream_fold_every_bounds_segments(spark, tmp_root, tmp_path):
    """r04: every micro-batch appends one delta manifest segment;
    ``fold_every`` folds + vacuums inside the sink so an indefinitely
    running stream's segment count (and metadata garbage) stays bounded.
    The replay watermark must survive the folds, and results stay exact."""
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    pdf = generate_pdf(1_000)
    for i in range(5):  # 5 files -> 5 micro-batches
        spark.createDataFrame(
            pdf.iloc[i * 200 : (i + 1) * 200], schema=SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, f"f{i}"))

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        src + "/*"
    )
    q = stream_build(
        stream, tmp_root, CFG, ckpt, trigger={"availableNow": True}, fold_every=2
    )
    q.awaitTermination(180)

    idx = BloomIndex.load(spark, tmp_root)
    # folds kept the union width under the threshold
    assert len(idx.table_refs()["blocks"]) <= 2
    assert idx.blocks().agg(F.sum("row_count")).collect()[0][0] == 1_000
    # watermark survived the folds: all 5 batches committed exactly once
    assert idx.meta()["last_stream_batch"] == 4
    got = search(spark, idx, new_query().token("needle_alpha").build())
    expect = sum("needle_alpha" in c.lower().split() for c in pdf["content"])
    assert got.count() == expect
    # the sink deliberately does NOT vacuum (unsafe with concurrent
    # committers/readers); once the stream is drained, the explicit
    # maintenance call reclaims superseded versions/segments
    from bloomsearch_spark import vacuum_manifest

    assert vacuum_manifest(idx) > 0
    mdir = os.path.join(tmp_root, "manifest")
    vdirs = [d for d in os.listdir(mdir) if d.startswith("v")]
    assert vdirs == [idx.version]
    got2 = search(spark, BloomIndex.load(spark, tmp_root),
                  new_query().token("needle_alpha").build())
    assert got2.count() == expect


def test_replayed_batch_is_noop(spark, tmp_root):
    """foreachBatch replay (same batch_id) must not double-ingest."""
    pdf = generate_pdf(300)
    df = spark.createDataFrame(pdf, schema=SCHEMA)
    assert append_batch(spark, df, tmp_root, CFG, batch_id=0) is True
    assert append_batch(spark, df, tmp_root, CFG, batch_id=0) is False  # replay
    idx = BloomIndex.load(spark, tmp_root)
    assert idx.blocks().agg(F.sum("row_count")).collect()[0][0] == 300
    # a NEW batch id appends
    assert append_batch(spark, df, tmp_root, CFG, batch_id=1) is True
    idx2 = BloomIndex.load(spark, tmp_root)
    assert idx2.blocks().agg(F.sum("row_count")).collect()[0][0] == 600
    # the watermark is part of the committed meta (written BEFORE the
    # CURRENT swap, so a crash can never commit rows without it)
    assert idx2.meta()["last_stream_batch"] == 1
    assert idx.meta()["last_stream_batch"] == 0


def test_streaming_approx_distinct_stateful(spark, tmp_path):
    """applyInPandasWithState custom operator: per-key running distinct via
    HLL state.  The final streaming estimate must equal a batch HLL over
    the same values EXACTLY (same registers, max-merge idempotence) and sit
    within the published bound of the true distinct count."""
    import numpy as np

    from bloomsearch_spark.sketches.hll import HLL
    from bloomsearch_spark.streaming.stateful import streaming_approx_distinct

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        F.col("event_type").cast("string").alias("k"),
        F.col("user_id").cast("string").alias("v"),
    )
    src = str(tmp_path / "src")
    # several files -> several micro-batches (maxFilesPerTrigger=1)
    events.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("k string, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_approx_distinct(stream, "k", "v", p=12)
    q = (
        out.writeStream.format("memory")
        .queryName("sad")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.sql(
        "SELECT k, estimate, n_seen FROM sad ORDER BY n_seen"
    ).toPandas()
    # last emission per key = final state
    final = res.groupby("k").last()

    pdf = events.toPandas()
    for k, grp in pdf.groupby("k"):
        vals = grp["v"].dropna().to_numpy()
        batch = HLL(12)
        batch.add_values(vals.astype(object))
        assert final.loc[k, "n_seen"] == len(vals)
        # bitwise-identical accumulation -> identical estimate
        assert final.loc[k, "estimate"] == batch.estimate()
        exact = len(np.unique(vals))
        assert abs(final.loc[k, "estimate"] - exact) <= 4 * batch.rse * exact
    # multiple micro-batches actually happened (update mode re-emits keys)
    assert len(res) > final.shape[0]


def test_watermark_survives_maintenance_and_plain_appends(spark, tmp_path):
    """r03 review fix: the exactly-once replay watermark
    (last_stream_batch) must survive merge commits AND plain batch
    appends, or a restarted stream re-appends its last batch."""
    from bloomsearch_spark import build_index
    from bloomsearch_spark.plans.merge import merge_files

    root = str(tmp_path / "widx")
    pdf = generate_pdf(400)
    b0 = spark.createDataFrame(pdf.iloc[:200], schema=SCHEMA)
    b1 = spark.createDataFrame(pdf.iloc[200:300], schema=SCHEMA)
    extra = spark.createDataFrame(pdf.iloc[300:], schema=SCHEMA)

    assert append_batch(spark, b0, root, CFG, batch_id=0) is True
    # maintenance commit between stream batches
    idx = BloomIndex.load(spark, root)
    merge_files(spark, idx, max_blocks_per_file=1000, max_files_per_merge=1000)
    assert append_batch(spark, b0, root, CFG, batch_id=0) is False  # replay no-op
    # a NON-stream append between batches must also carry the watermark
    build_index(spark, extra, root, CFG, mode="append", source_desc="side-load")
    assert append_batch(spark, b0, root, CFG, batch_id=0) is False
    # and the stream continues normally
    assert append_batch(spark, b1, root, CFG, batch_id=1) is True
    idx2 = BloomIndex.load(spark, root)
    assert idx2.meta()["last_stream_batch"] == 1
    assert idx2.blocks().agg(F.sum("row_count")).collect()[0][0] == 400


def test_stateful_approx_distinct_bigint_key(spark, tmp_path):
    """r03 review fix: the key column keeps its real type in the output
    schema (hardcoded 'string' broke bigint keys at Arrow conversion)."""
    from bloomsearch_spark.streaming.stateful import streaming_approx_distinct

    src = str(tmp_path / "src")
    spark.range(0, 300).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v").cast("string")
    ).repartition(2).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("k bigint, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_approx_distinct(stream, "k", "v", p=10)
    q = (
        out.writeStream.format("memory")
        .queryName("sad_bigint")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.sql("SELECT * FROM sad_bigint").toPandas()
    assert set(res["k"]) == {0, 1, 2}
    final = res.groupby("k")["n_seen"].max()
    assert int(final.sum()) == 300


def test_stream_sink_caches_segment_count(spark, tmp_root, tmp_path, monkeypatch):
    """r05 (verdict item 6): the sink counts segments across micro-batches
    instead of re-fetching meta.json every trigger — one manifest load to
    prime the cache plus one per fold cycle, not one per batch."""
    from bloomsearch_spark.sources import manifest as mf

    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    pdf = generate_pdf(1_000)
    for i in range(5):  # 5 files -> 5 micro-batches
        spark.createDataFrame(
            pdf.iloc[i * 200 : (i + 1) * 200], schema=SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(src, f"f{i}"))

    calls = {"n": 0}
    real_load = mf.BloomIndex.load.__func__

    def counting_load(cls, spark_, root_):
        calls["n"] += 1
        return real_load(cls, spark_, root_)

    monkeypatch.setattr(mf.BloomIndex, "load", classmethod(counting_load))

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(
        src + "/*"
    )
    q = stream_build(
        stream, tmp_root, CFG, ckpt, trigger={"availableNow": True}, fold_every=4
    )
    q.awaitTermination(180)

    # 5 batches: 1 priming load + 1 at the single fold threshold = 2
    # (the old per-trigger re-read would be 5)
    assert calls["n"] <= 2, calls["n"]
    idx = BloomIndex.load(spark, tmp_root)
    assert idx.blocks().agg(F.sum("row_count")).collect()[0][0] == 1_000
    assert idx.meta()["last_stream_batch"] == 4
