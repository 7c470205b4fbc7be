"""Cross-PROCESS commit atomicity (r05, verdict item 4).

The in-process tests (test_manifest_segments) prove the flock commit lock
and CommitConflict detection across threads; the reference's contract is
cross-process atomicity (``MetaStore.Update``, meta_store.go:21).  Here
several OS processes hammer one index root concurrently:

- N appender processes each publish K delta-segment commits (the real
  ``publish_commit`` + ``build_commit_finalize`` protocol — segment
  parquet via the fs layer, meta finalize under the flock);
- one maintenance process repeatedly publishes snapshot-pinned commits
  (``expected=``) that must either land cleanly or raise CommitConflict —
  never corrupt or drop an interleaved append.

Afterwards: every append's segment is referenced by CURRENT (no lost
update under 100+ racing commits), the version history is strictly linear
(v1..vN, no gaps, one meta.json each), and Spark reads the unioned blocks
manifest to the exact expected row count.

No SparkSession in the workers — commits are metadata-only by design
(O(batch) segments); Spark validates the final state from the parent.
"""

import json
import multiprocessing as mp
import os

import pyarrow as pa

from bloomsearch_spark import BloomIndex, CommitConflict, IndexConfig
from bloomsearch_spark.sources import fs as fsx
from bloomsearch_spark.sources import manifest as mf

N_APPENDERS = 4
COMMITS_PER_APPENDER = 26
MAINT_ATTEMPTS = 30

_CFG_DICT = {"indexed_fields": ("content",)}

_MAP = pa.map_(pa.string(), pa.int64())


def _seg_tables(tag: str) -> dict[str, pa.Table]:
    """Schema-exact one-row manifest tables for a synthetic commit."""
    blocks = pa.table(
        {
            "file_id": pa.array([f"f-{tag}"], pa.string()),
            "block_id": pa.array([f"b-{tag}"], pa.string()),
            "partition_id": pa.array([""], pa.string()),
            "data_path": pa.array([f"file_id=f-{tag}/block_id=b-{tag}"], pa.string()),
            "row_count": pa.array([1], pa.int64()),
            "token_count": pa.array([1], pa.int64()),
            "byte_size": pa.array([0], pa.int64()),
            "minmax_min": pa.array([[]], _MAP),
            "minmax_max": pa.array([[]], _MAP),
            "expected_items": pa.array([10_000], pa.int64()),
            "fpr": pa.array([0.01], pa.float64()),
            "field_bloom": pa.array([None], pa.binary()),
            "token_bloom": pa.array([None], pa.binary()),
            "fieldtoken_bloom": pa.array([None], pa.binary()),
        }
    )
    files = pa.table(
        {
            "file_id": pa.array([f"f-{tag}"], pa.string()),
            "partition_id": pa.array([""], pa.string()),
            "block_count": pa.array([1], pa.int64()),
            "row_count": pa.array([1], pa.int64()),
            "token_count": pa.array([1], pa.int64()),
            "byte_size": pa.array([0], pa.int64()),
            "minmax_min": pa.array([[]], _MAP),
            "minmax_max": pa.array([[]], _MAP),
            "expected_items": pa.array([10_000], pa.int64()),
            "fpr": pa.array([0.01], pa.float64()),
            "field_bloom": pa.array([None], pa.binary()),
            "token_bloom": pa.array([None], pa.binary()),
            "fieldtoken_bloom": pa.array([None], pa.binary()),
        }
    )
    lineage = pa.table(
        {
            "build_id": pa.array([tag], pa.string()),
            "file_id": pa.array([f"f-{tag}"], pa.string()),
            "block_id": pa.array([f"b-{tag}"], pa.string()),
            "partition_id": pa.array([""], pa.string()),
            "source_desc": pa.array(["race-test"], pa.string()),
            "rows_indexed": pa.array([1], pa.int64()),
            "tokens_inserted": pa.array([1], pa.int64()),
            "op": pa.array(["build"], pa.string()),
            "committed_at": pa.array([0.0], pa.float64()),
        }
    )
    return {"blocks": blocks, "files": files, "lineage": lineage}


def _append_worker(root: str, wid: int, n: int, result_path: str) -> None:
    cfg = IndexConfig(**_CFG_DICT)
    committed = []
    for i in range(n):
        seg = f"race-w{wid}-{i}"
        seg_dir = mf.segment_dir(root, seg)
        for name, tbl in _seg_tables(f"w{wid}c{i}").items():
            fsx.write_parquet_atomic(
                fsx.join(seg_dir, f"{name}.parquet"), tbl, "part-0.parquet"
            )
        v = mf.publish_commit(
            root,
            mf.build_commit_finalize(
                root, cfg, "append", seg, f"race-w{wid}", ["content"], seg
            ),
        )
        committed.append((seg, v))
    with open(result_path, "w") as f:
        json.dump(committed, f)


def _maintenance_worker(root: str, attempts: int, result_path: str) -> None:
    """Snapshot-pinned no-op maintenance commits racing the appenders:
    each attempt must land linearly (advancing the version, refs copied
    from the pinned snapshot) or fail with CommitConflict — never drop an
    interleaved append."""
    cfg = IndexConfig(**_CFG_DICT)
    landed, conflicts = 0, 0
    for _ in range(attempts):
        cur = mf.current_version(root)
        if cur is None:
            continue
        refs = mf.BloomIndex(None, root, cur).table_refs()

        def finalize(prev, refs=refs):
            v = mf.version_after(prev)
            mf.write_meta(
                fsx.join(root, "manifest", v), cfg,
                extra={"tables": refs, "source_desc": "maintenance-touch"},
            )
            return v

        try:
            mf.publish_commit(root, finalize, expected=cur)
            landed += 1
        except CommitConflict:
            conflicts += 1
    with open(result_path, "w") as f:
        json.dump({"landed": landed, "conflicts": conflicts}, f)


def test_multiprocess_commit_race(spark, tmp_root, tmp_path):
    ctx = mp.get_context("spawn")
    procs = []
    results = []
    for w in range(N_APPENDERS):
        rp = str(tmp_path / f"w{w}.json")
        results.append(rp)
        procs.append(
            ctx.Process(
                target=_append_worker,
                args=(tmp_root, w, COMMITS_PER_APPENDER, rp),
            )
        )
    maint_rp = str(tmp_path / "maint.json")
    procs.append(
        ctx.Process(
            target=_maintenance_worker, args=(tmp_root, MAINT_ATTEMPTS, maint_rp)
        )
    )
    for p in procs:
        p.start()
    for p in procs:
        p.join(timeout=600)
    assert all(p.exitcode == 0 for p in procs), [p.exitcode for p in procs]

    appended = []
    for rp in results:
        with open(rp) as f:
            appended.extend(json.load(f))
    assert len(appended) == N_APPENDERS * COMMITS_PER_APPENDER
    with open(maint_rp) as f:
        maint = json.load(f)

    # linear history: one commit per version, no gaps, no double-use
    cur = mf.current_version(tmp_root)
    total = len(appended) + maint["landed"]
    assert cur == f"v{total:08d}"
    mdir = os.path.join(tmp_root, "manifest")
    vdirs = sorted(d for d in os.listdir(mdir) if d.startswith("v"))
    assert vdirs == [f"v{i:08d}" for i in range(1, total + 1)]
    assert all(
        os.path.exists(os.path.join(mdir, d, "meta.json")) for d in vdirs
    )

    # NO LOST UPDATE: every append's segment is referenced by CURRENT
    idx = BloomIndex(spark, tmp_root, cur)
    refs = set(idx.table_refs()["blocks"])
    expected_refs = {mf.segment_ref(seg, "blocks") for seg, _ in appended}
    assert refs == expected_refs

    # and Spark reads the unioned manifest to the exact row count
    assert idx.blocks().count() == len(appended)
    assert idx.lineage().count() == len(appended)
