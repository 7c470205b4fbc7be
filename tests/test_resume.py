"""Resumability: a build killed after its heavy stages but before the
manifest commit resumes without recomputing them (_SUCCESS stage markers +
deterministic ids + OR-merge idempotence — the north rule's
"resumable from checkpoint" requirement)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import build_index, new_query, search, verify_integrity
from bloomsearch_spark.sources import manifest as mf
from bloomsearch_spark.sources.synthetic import generate_df, generate_pdf

from tests.test_streaming import CFG


def _mtimes(pattern: str) -> dict[str, float]:
    return {p: os.path.getmtime(p) for p in glob.glob(pattern)}


def test_crash_before_commit_resumes_without_recompute(spark, tmp_root, monkeypatch):
    df = generate_df(spark, 1_000)

    # simulate a driver crash AFTER all stage writes but BEFORE the atomic
    # CURRENT swap
    real_commit = mf.commit_version

    def boom(root, version):
        raise RuntimeError("simulated crash before manifest commit")

    monkeypatch.setattr(mf, "commit_version", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_index(spark, df, tmp_root, CFG)
    monkeypatch.setattr(mf, "commit_version", real_commit)

    # nothing is visible to readers yet (atomicity contract)
    assert mf.current_version(tmp_root) is None

    # heavy stages completed before the crash: staging scratch + the
    # commit's manifest segment (delta layout)
    staging = glob.glob(
        os.path.join(tmp_root, "manifest", "staging", "*", "staging.parquet")
    )
    assert staging, "staging stage should have completed before the crash"
    seg_glob = os.path.join(
        tmp_root, "manifest", "segments", "*-build", "*.parquet", "*.parquet"
    )
    before = _mtimes(seg_glob)
    assert before, "segment writes should have completed before the crash"

    # resume: same deterministic build -> completed stages are skipped
    idx = build_index(spark, df, tmp_root, CFG)
    after = _mtimes(seg_glob)
    assert after == before, "resume must NOT recompute the completed stages"
    assert idx.version == "v00000001"
    # scratch is deleted once the commit owns the data
    assert not glob.glob(os.path.join(tmp_root, "manifest", "staging", "*"))

    # and the resumed index is fully correct
    assert idx.blocks().agg(F.sum("row_count")).collect()[0][0] == 1_000
    pdf = generate_pdf(1_000)
    expect = sum("needle_alpha" in c.lower().split() for c in pdf["content"])
    assert search(spark, idx, new_query().token("needle_alpha").build()).count() == expect
    assert verify_integrity(spark, idx) == 0


def test_rerun_after_commit_is_new_version(spark, tmp_root):
    """A re-run AFTER a successful commit is a fresh overwrite version,
    not a resume (CURRENT advanced, so v2 starts clean)."""
    df = generate_df(spark, 500)
    i1 = build_index(spark, df, tmp_root, CFG)
    i2 = build_index(spark, df, tmp_root, CFG)
    assert (i1.version, i2.version) == ("v00000001", "v00000002")
    assert i2.blocks().agg(F.sum("row_count")).collect()[0][0] == 500
