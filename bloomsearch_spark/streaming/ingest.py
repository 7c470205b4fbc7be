"""Streaming ingest — Structured Streaming over the index build.

The reference's "streaming" is an async ingest actor with row/byte/time
flush triggers (ingestWorker, bloom_tree_engine.go:348-414; flush decision
:615-650).  The Spark-native equivalent is a Structured Streaming query:
each micro-batch IS a flush — ``foreachBatch`` appends a new set of files
to the index and commits the manifest atomically, so readers get the same
"rows visible only after flush+commit" semantics as MetaStore.Update
(meta_store.go:21).  Trigger cadence plays the role of
``MaxBufferedTime``; ``maxFilesPerTrigger``/rate limits play the role of
row/byte caps.

Exactly-once: foreachBatch may replay a batch after a failure.  Every
commit records its ``batch_id`` in the manifest meta; a replayed batch id
<= the last committed one is skipped, making the sink idempotent (the
same guarantee the reference gets from single-threaded apply).

Each micro-batch commit writes one O(batch) DELTA manifest segment (the
r04 segmented manifest — sources/manifest.py): a long-running stream never
rewrites the accumulated index metadata per trigger.  Segment-list growth
is bounded by running ``fold_manifest`` (and ``vacuum_manifest``) at the
same cadence as file merges; a maintenance commit racing a stream batch is
serialized by the commit lock and, if it lost the race, surfaces
``CommitConflict`` for a clean re-plan instead of dropping the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import IndexConfig
from ..plans.build import build_index
from ..sources import manifest as mf


def append_batch(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    cfg: IndexConfig,
    batch_id: int,
    source_desc: str = "stream",
) -> bool:
    """Idempotently append one micro-batch to the index.

    Returns False (no-op) when ``batch_id`` was already committed — the
    foreachBatch replay guard.
    """
    cur = mf.current_version(root)
    mode = "append"
    if cur is None:
        mode = "overwrite"
    else:
        prev = mf.BloomIndex(spark, root, cur)
        last = prev.meta().get("last_stream_batch", -1)
        if batch_id <= last:
            return False
    # the batch-id watermark is threaded INTO the build so it is persisted
    # in meta.json before commit_version swaps CURRENT — a crash anywhere
    # leaves either no new version (replay rebuilds it) or a committed
    # version that already carries the watermark (replay is a no-op).
    # Stamping after commit would open a window where a replayed batch
    # appends duplicate rows.
    build_index(
        spark,
        df,
        root,
        cfg,
        source_desc=f"{source_desc}-batch-{batch_id}",
        mode=mode,
        meta_extra={"last_stream_batch": batch_id},
    )
    return True


def stream_build(
    stream_df: DataFrame,
    root: str,
    cfg: IndexConfig,
    checkpoint_dir: str,
    trigger: dict | None = None,
    source_desc: str = "stream",
    fold_every: int | None = 64,
):
    """Start a streaming index build over ``stream_df`` (a streaming
    DataFrame).  Returns the StreamingQuery handle.

    ``trigger``: kwargs for ``DataStreamWriter.trigger`` — e.g.
    ``{"availableNow": True}`` (drain-and-stop, the reference's forced
    flush) or ``{"processingTime": "10 seconds"}`` (MaxBufferedTime
    analog).

    ``fold_every``: each micro-batch appends one delta manifest segment;
    when the blocks table reaches this many segments, the sink folds the
    manifest (one segment per table) and vacuums unreachable metadata —
    bounding reader union width AND metadata garbage for indefinitely
    running streams.  The fold is the same single-committer, so it cannot
    conflict with the stream's own appends; ``None`` disables (run
    ``fold_manifest`` on your own maintenance cadence, e.g. alongside
    ``merge_files``).  Folding costs O(manifest) every ``fold_every``
    batches — amortized O(manifest/fold_every) per batch, vs O(manifest)
    EVERY batch in the pre-segment design.
    """
    spark = stream_df.sparkSession

    def _batch(df: DataFrame, batch_id: int) -> None:
        if df.isEmpty():
            return
        if not append_batch(spark, df, root, cfg, batch_id, source_desc):
            return
        if fold_every is not None:
            idx = mf.BloomIndex.load(spark, root)
            if len(idx.table_refs()["blocks"]) >= fold_every:
                from ..plans.merge import fold_manifest, vacuum_manifest

                folded = fold_manifest(spark, idx)
                vacuum_manifest(folded)

    writer = stream_df.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
