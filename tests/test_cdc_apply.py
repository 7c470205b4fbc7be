"""CDC apply (r06): ``apply_changes_batch`` + ``stream_apply_changes`` —
the ``APPLY CHANGES INTO`` analog and the inverse of the changefeed's
``change_events`` output.

The headline composition: readStream(A, change_events+commit_metadata) →
stream_apply_changes(B) keeps replica B row-equal to source A across
appends, row deletes, and upserts — the plain sink replication (DS4)
carries appends only.  Keys act as primary keys (Delta APPLY CHANGES
convention): each key's final state within a batch is its max-version
event, insert winning over delete within one version (a rewriting commit
emits delete-old + insert-kept for the same key).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import (
    BloomIndex,
    IndexConfig,
    apply_changes_batch,
    build_index,
    delete_where,
    new_query,
    search,
    upsert_keys,
)
from bloomsearch_spark.sources import manifest as mf
from bloomsearch_spark.streaming.ingest import stream_apply_changes
from bloomsearch_spark.sources.synthetic import generate_df, generate_pdf

CFG = IndexConfig(
    indexed_fields=("repo", "path", "lang", "content", "commit"),
    partition_expr="lang",
    max_block_rows=100,
    blocks_per_file=4,
    sha_col="content",
)


def _snapshot(spark, root) -> pd.DataFrame:
    idx = BloomIndex.load(spark, root)
    return (
        search(spark, idx, new_query().field("content").build())
        .toPandas()
        .sort_values(["commit", "path"])
        .reset_index(drop=True)
    )


def test_apply_changes_batch_resolution(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 200), tmp_root, CFG)
    pdf = generate_pdf(200)
    k_del, k_upd = pdf["commit"].iloc[0], pdf["commit"].iloc[1]
    upd = pdf.iloc[[1]].copy()
    upd["content"] = "resolved_update_marker"

    rows = []
    # k_del: inserted at v3, deleted at v5 -> final = deleted
    r = pdf.iloc[[0]].copy(); r["_change_type"] = "insert"; r["_commit_version"] = 3
    rows.append(r)
    r = pdf.iloc[[0]].copy(); r["_change_type"] = "delete"; r["_commit_version"] = 5
    rows.append(r)
    # k_upd: delete + insert at the SAME version (a rewrite) -> insert wins
    r = pdf.iloc[[1]].copy(); r["_change_type"] = "delete"; r["_commit_version"] = 5
    rows.append(r)
    u = upd.copy(); u["_change_type"] = "insert"; u["_commit_version"] = 5
    rows.append(u)
    changes = spark.createDataFrame(pd.concat(rows, ignore_index=True))

    out, stats = apply_changes_batch(
        spark, idx, changes, key_field="commit"
    )
    assert int(out.version[1:]) == int(idx.version[1:]) + 1  # ONE commit
    snap = _snapshot(spark, tmp_root)
    assert k_del not in set(snap["commit"])
    assert (
        snap.loc[snap["commit"] == k_upd, "content"].iloc[0]
        == "resolved_update_marker"
    )
    assert len(snap) == 200 - 1  # one key deleted, one replaced in place


def test_stream_apply_changes_replicates_deletes_and_upserts(
    spark, tmp_root, tmp_path
):
    from bloomsearch_spark.sources.datasource import BloomSearchDataSource

    spark.dataSource.register(BloomSearchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    src_root = tmp_root
    dst_root = str(tmp_path / "replica")
    ckpt = str(tmp_path / "ckpt")

    # source history: build + append + row-level delete + key upsert
    build_index(spark, generate_df(spark, 200), src_root, CFG)
    build_index(
        spark, generate_df(spark, 100, seed=9), src_root, CFG, mode="append"
    )
    idx = BloomIndex.load(spark, src_root)
    delete_where(
        spark, idx, new_query().token("needle_alpha").build()
    )
    upd = generate_pdf(200).iloc[:10].copy()
    upd["content"] = [f"replica_upsert_marker row{i}" for i in range(10)]
    upsert_keys(
        spark, BloomIndex.load(spark, src_root),
        spark.createDataFrame(upd), key_field="commit",
    )

    def drain():
        feed = (
            spark.readStream.format("bloomsearch").option("root", src_root)
            .option("starting_version", "earliest")
            .option("change_events", "true")
            .option("commit_metadata", "true")
            .load()
        )
        q = stream_apply_changes(
            feed, dst_root, CFG, key_field="commit", checkpoint_dir=ckpt
        )
        q.awaitTermination(300)
        assert q.exception() is None

    drain()
    a, b = _snapshot(spark, src_root), _snapshot(spark, dst_root)
    pd.testing.assert_frame_equal(a, b)
    assert "replica_upsert_marker" in " ".join(b["content"].iloc[:50].tolist()) or (
        b["content"].str.contains("replica_upsert_marker").any()
    )
    assert not b["content"].str.lower().str.split().map(
        lambda t: "needle_alpha" in t
    ).any()

    # more source commits, same checkpoint: exactly-once catch-up
    build_index(
        spark, generate_df(spark, 50, seed=21), src_root, CFG, mode="append"
    )
    delete_where(
        spark, BloomIndex.load(spark, src_root),
        new_query().token("needle_beta").build(),
    )
    drain()
    a2, b2 = _snapshot(spark, src_root), _snapshot(spark, dst_root)
    pd.testing.assert_frame_equal(a2, b2)
    # replays committed nothing extra: replica versions advance only with
    # real change batches
    assert len(a2) != len(a)  # the history actually changed


def test_stream_apply_changes_replay_is_noop(spark, tmp_root, tmp_path):
    from bloomsearch_spark.sources.datasource import BloomSearchDataSource

    spark.dataSource.register(BloomSearchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    dst_root = str(tmp_path / "replica")
    build_index(spark, generate_df(spark, 100), tmp_root, CFG)

    def drain(ck):
        feed = (
            spark.readStream.format("bloomsearch").option("root", tmp_root)
            .option("starting_version", "earliest")
            .option("change_events", "true").option("commit_metadata", "true")
            .load()
        )
        q = stream_apply_changes(
            feed, dst_root, CFG, key_field="commit", checkpoint_dir=ck
        )
        q.awaitTermination(300)
        assert q.exception() is None

    drain(str(tmp_path / "ck1"))
    v_after = mf.current_version(dst_root)
    # a FRESH checkpoint replays the whole feed; the watermark makes the
    # replayed batch a no-op (no duplicate rows, no version churn)
    drain(str(tmp_path / "ck2"))
    assert mf.current_version(dst_root) == v_after
    assert _snapshot(spark, dst_root).shape[0] == 100
