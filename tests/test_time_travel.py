"""Timestamp-based time travel (r05): pin snapshot reads, start the
changefeed, and bound batch table-changes reads by COMMIT INSTANT.

Version metas stamp ``created_at`` inside the commit lock, so commit
times are monotonic per root; resolution is an O(log n_versions) bisect
over retained metas (Delta/Iceberg ``TIMESTAMP AS OF`` analog).
Semantics under test:
- ``version_as_of``: latest version committed at-or-before ts; refuses a
  ts older than the earliest retained commit (silent clamp would hand
  back rows that did not exist then).
- ``first_version_at_or_after``: changefeed/changes-from resolution;
  None past the latest commit.
- ISO-8601 and epoch-seconds inputs are equivalent; naive ISO = UTC.
"""

import shutil
import tempfile
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import IndexConfig, build_index
from bloomsearch_spark.sources import manifest as mf
from bloomsearch_spark.sources.datasource import BloomSearchDataSource
from bloomsearch_spark.sources.manifest import BloomIndex
from bloomsearch_spark.sources.synthetic import generate_df, generate_pdf

CFG = IndexConfig(
    indexed_fields=("repo", "path", "lang", "content"),
    partition_expr="lang",
    max_block_rows=100,
    blocks_per_file=4,
)

V1_ROWS, V2_ROWS, V3_ROWS = 200, 70, 50


@pytest.fixture(scope="module")
def history(spark):
    """A 3-commit index + each version's commit instant."""
    root = tempfile.mkdtemp(prefix="bs-tt-")
    spark.dataSource.register(BloomSearchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    build_index(spark, generate_df(spark, V1_ROWS), root, CFG)
    build_index(
        spark, generate_df(spark, V2_ROWS, seed=4).coalesce(1), root, CFG,
        mode="append", source_desc="a1",
    )
    build_index(
        spark, generate_df(spark, V3_ROWS, seed=9).coalesce(1), root, CFG,
        mode="append", source_desc="a2",
    )
    t = {n: mf.commit_time(root, f"v{n:08d}") for n in (1, 2, 3)}
    assert t[1] < t[2] < t[3]  # stamped inside the commit lock
    yield root, t
    shutil.rmtree(root, ignore_errors=True)


def test_version_as_of_resolution(history):
    root, t = history
    assert mf.retained_versions(root) == ["v00000001", "v00000002", "v00000003"]
    # exactly at a commit instant = that commit (at-or-before is inclusive)
    assert mf.version_as_of(root, t[2]) == "v00000002"
    # between commits = the earlier one
    assert mf.version_as_of(root, (t[2] + t[3]) / 2) == "v00000002"
    # past the latest = the latest
    assert mf.version_as_of(root, t[3] + 3600) == "v00000003"
    # before the earliest retained commit: refuse, never clamp
    with pytest.raises(ValueError, match="predates the earliest"):
        mf.version_as_of(root, t[1] - 10)

    # first_version_at_or_after is the changefeed-side dual
    assert mf.first_version_at_or_after(root, t[1] - 10) == "v00000001"
    assert mf.first_version_at_or_after(root, t[2]) == "v00000002"
    assert mf.first_version_at_or_after(root, (t[2] + t[3]) / 2) == "v00000003"
    assert mf.first_version_at_or_after(root, t[3] + 3600) is None


def test_version_as_of_iso_input(history):
    root, t = history
    # a mid-gap instant (datetime truncates to microseconds, so an
    # exactly-at-commit ISO string could round below the commit time)
    mid = (t[2] + t[3]) / 2
    # aware ISO string == the epoch instant it denotes
    iso = datetime.fromtimestamp(mid, tz=timezone.utc).isoformat()
    assert mf.version_as_of(root, iso) == "v00000002"
    # naive ISO is interpreted as UTC (commit clocks are epoch clocks)
    naive = datetime.fromtimestamp(mid, tz=timezone.utc).replace(
        tzinfo=None
    ).isoformat()
    assert mf.version_as_of(root, naive) == "v00000002"


def test_bloomindex_load_time_travel(spark, history):
    root, t = history

    def total_rows(idx):
        return idx.blocks().agg(F.sum("row_count")).collect()[0][0]

    pinned = BloomIndex.load(spark, root, timestamp=t[2])
    assert pinned.version == "v00000002"
    assert total_rows(pinned) == V1_ROWS + V2_ROWS
    assert total_rows(BloomIndex.load(spark, root)) == V1_ROWS + V2_ROWS + V3_ROWS
    assert BloomIndex.load(spark, root, version="v00000001").version == "v00000001"

    with pytest.raises(ValueError, match="not both"):
        BloomIndex.load(spark, root, version="v00000001", timestamp=t[2])
    with pytest.raises(FileNotFoundError, match="v00000099"):
        BloomIndex.load(spark, root, version="v00000099")


def test_datasource_timestamp_as_of(spark, history):
    """.option('timestamp_as_of', ts) pins the DataSource snapshot —
    versions are immutable, so the read is exactly the table as it was
    CURRENT at that instant.  One load() per query shape (plan-cache
    sharp edge), so each assertion gets a fresh load."""
    root, t = history

    def count_at(**opts):
        r = spark.read.format("bloomsearch").option("root", root)
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load().count()

    assert count_at(timestamp_as_of=str(t[2])) == V1_ROWS + V2_ROWS
    assert count_at(timestamp_as_of=str(t[3] + 3600)) == V1_ROWS + V2_ROWS + V3_ROWS
    # ISO-8601 input resolves identically (mid-gap: isoformat truncates
    # to microseconds, so exactly-at-commit could round below it)
    iso = datetime.fromtimestamp(
        (t[1] + t[2]) / 2, tz=timezone.utc
    ).isoformat()
    assert count_at(timestamp_as_of=iso) == V1_ROWS
    # version rows are the exact v1+v2 commits, not just the right count
    got = (
        spark.read.format("bloomsearch").option("root", root)
        .option("timestamp_as_of", str(t[2])).load()
        .select("commit").collect()
    )
    exp = set(generate_pdf(V1_ROWS)["commit"]) | set(
        generate_pdf(V2_ROWS, seed=4)["commit"]
    )
    assert {r.commit for r in got} == exp

    with pytest.raises(Exception, match="predates the earliest"):
        count_at(timestamp_as_of=str(t[1] - 10))
    with pytest.raises(Exception, match="not both"):
        count_at(version="v00000001", timestamp_as_of=str(t[2]))


def test_batch_changes_timestamp_bounds(spark, history):
    root, t = history

    def changes(**opts):
        r = spark.read.format("bloomsearch").option("root", root)
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    # from a commit instant: that commit and everything after (Delta
    # startingTimestamp convention), despite exclusive-from offsets
    assert changes(changes_from_timestamp=str(t[2])).count() == V2_ROWS + V3_ROWS
    # to-bound: last commit at-or-before the instant
    assert changes(changes_to_timestamp=str(t[2])).count() == V1_ROWS + V2_ROWS
    mid = str((t[2] + t[3]) / 2)
    assert changes(
        changes_from_timestamp=str(t[2]), changes_to_timestamp=mid
    ).count() == V2_ROWS

    with pytest.raises(Exception, match="after the latest"):
        changes(changes_from_timestamp=str(t[3] + 3600)).count()
    with pytest.raises(Exception, match="not both"):
        changes(changes_from="1", changes_from_timestamp=str(t[2])).count()
    with pytest.raises(Exception, match="do not apply to a changes read"):
        changes(changes_from="0", timestamp_as_of=str(t[2])).count()


def test_changefeed_starting_timestamp(spark, history, tmp_path):
    """starting_timestamp on the streaming source: the feed begins at the
    first commit at-or-after the instant."""
    root, t = history
    stream = (
        spark.readStream.format("bloomsearch").option("root", root)
        .option("starting_timestamp", str(t[2])).load()
    )
    q = (
        stream.writeStream.format("memory").queryName("tt_feed")
        .option("checkpointLocation", str(tmp_path / "ckpt")).start()
    )
    try:
        q.processAllAvailable()
        got = spark.table("tt_feed")
        assert got.count() == V2_ROWS + V3_ROWS
        exp = set(generate_pdf(V2_ROWS, seed=4)["commit"]) | set(
            generate_pdf(V3_ROWS, seed=9)["commit"]
        )
        assert {r.commit for r in got.select("commit").collect()} == exp
    finally:
        q.stop()


def test_vacuum_manifest_retention_window(spark, tmp_root):
    """retain_versions on vacuum_manifest keeps a readable time-travel
    window: retained superseded versions' dirs AND the segments only they
    reference (folded away from CURRENT) survive; older versions are
    reclaimed and travel to them refuses."""
    from bloomsearch_spark import fold_manifest, new_query, search, vacuum_manifest

    build_index(spark, generate_df(spark, 200), tmp_root, CFG)           # v1
    build_index(
        spark, generate_df(spark, 70, seed=4).coalesce(1), tmp_root, CFG,
        mode="append", source_desc="a1",
    )                                                                    # v2
    fold_manifest(spark, BloomIndex.load(spark, tmp_root))               # v3
    t1 = mf.commit_time(tmp_root, "v00000001")

    removed = vacuum_manifest(
        BloomIndex.load(spark, tmp_root), staging_ttl=0, retain_versions=1
    )
    assert removed >= 1  # v1's dir went; v2 + its pre-fold segments stay
    assert mf.retained_versions(tmp_root) == ["v00000002", "v00000003"]

    # the retained superseded version still reads EXACTLY (its segments
    # were folded away from CURRENT, so only retention kept them)
    pinned = BloomIndex.load(spark, tmp_root, version="v00000002")
    assert pinned.blocks(cache=False).agg(
        F.sum("row_count")
    ).collect()[0][0] == 270
    qy = new_query().token("needle_alpha").build()
    cur_hits = {r.commit for r in
                search(spark, BloomIndex.load(spark, tmp_root), qy).collect()}
    assert {r.commit for r in search(spark, pinned, qy).collect()} == cur_hits

    # the DataSource's pinned read shares the window: exact rows at the
    # retained version, loud refusal past it
    spark.dataSource.register(BloomSearchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    t2 = mf.commit_time(tmp_root, "v00000002")
    got = (
        spark.read.format("bloomsearch").option("root", tmp_root)
        .option("timestamp_as_of", str(t2)).load().count()
    )
    assert got == 270
    with pytest.raises(Exception, match="predates the earliest"):
        (
            spark.read.format("bloomsearch").option("root", tmp_root)
            .option("timestamp_as_of", str(t1)).load().count()
        )

    # past the window: loud refusal, not a clamp
    with pytest.raises(FileNotFoundError):
        BloomIndex.load(spark, tmp_root, version="v00000001")
    with pytest.raises(ValueError, match="predates the earliest"):
        mf.version_as_of(tmp_root, t1)

    # retain_time keeps everything committed within the window
    before = set(mf.retained_versions(tmp_root))
    vacuum_manifest(
        BloomIndex.load(spark, tmp_root), staging_ttl=0, retain_time=3600
    )
    assert set(mf.retained_versions(tmp_root)) == before


def test_vacuum_data_retention_window(spark, tmp_root):
    """retain_versions on the DATA vacuum keeps block dirs only superseded
    versions reference (e.g. pre-merge small files), so a pinned read
    within the window returns exact rows; without retention they are
    reclaimed."""
    from bloomsearch_spark import compact_blocks, merge_files, new_query, search, vacuum

    build_index(spark, generate_df(spark, 400), tmp_root, CFG)
    merge_files(spark, BloomIndex.load(spark, tmp_root),
                max_blocks_per_file=1000, max_files_per_merge=1000)      # v2
    idx1 = BloomIndex.load(spark, tmp_root)  # pre-compaction snapshot (v2)
    _, stats = compact_blocks(spark, idx1, max_block_rows=500)           # v3
    assert stats.blocks_rewritten > 0
    qy = new_query().token("needle_alpha").build()
    exp = {r.commit for r in search(spark, idx1, qy).collect()}
    assert exp  # the probe token actually hits

    # retention keeps the pre-compaction block dirs (still referenced by
    # the retained version): nothing dead, pinned search still exact
    assert vacuum(BloomIndex.load(spark, tmp_root), retain_versions=1) == 0
    pinned = BloomIndex.load(spark, tmp_root, version="v00000002")
    assert {r.commit for r in search(spark, pinned, qy).collect()} == exp

    # without retention the superseded data goes; CURRENT is unaffected
    removed = vacuum(BloomIndex.load(spark, tmp_root))
    assert removed == stats.blocks_rewritten
    cur = BloomIndex.load(spark, tmp_root)
    assert {r.commit for r in search(spark, cur, qy).collect()} == exp


def test_history_describe(spark, history):
    """BloomIndex.history(): DESCRIBE HISTORY analog, newest-first, with
    operation attribution and commit instants that round-trip into
    timestamp_as_of."""
    root, t = history
    h = BloomIndex.load(spark, root).history()
    rows = h.collect()
    assert [r.version for r in rows] == [3, 2, 1]
    assert [r.operation for r in rows] == ["build"] * 3
    assert all(not r.is_maintenance and r.parent_version is None for r in rows)
    assert [r.n_segments for r in rows] == [3, 2, 1]
    # operation metrics (Delta operationMetrics analog): each commit's
    # added rows/blocks/files/bytes, computed from the segments it added
    assert [r.rows_written for r in rows] == [V3_ROWS, V2_ROWS, V1_ROWS]
    for r in rows:
        assert r.blocks_written >= 1 and r.files_written >= 1
        assert r.bytes_written > 0
    for r in rows:
        assert abs(r.timestamp.timestamp() - t[r.version]) < 1e-3
        # timestamp_epoch is the UNAMBIGUOUS timestamp_as_of input (the
        # timestamp column renders in session-local time; collected naive
        # datetimes would shift by the zone offset in non-UTC sessions)
        assert mf.version_as_of(root, r.timestamp_epoch) == r.name
    assert BloomIndex.load(spark, root).history(limit=2).count() == 2


def test_history_maintenance_attribution(spark, tmp_root):
    from bloomsearch_spark import fold_manifest, merge_files

    build_index(spark, generate_df(spark, 150), tmp_root, CFG)           # v1
    merge_files(spark, BloomIndex.load(spark, tmp_root),
                max_blocks_per_file=1000, max_files_per_merge=1000)      # v2
    fold_manifest(spark, BloomIndex.load(spark, tmp_root))               # v3
    rows = BloomIndex.load(spark, tmp_root).history().collect()
    assert [(r.version, r.operation, r.is_maintenance, r.parent_version)
            for r in rows] == [
        (3, "fold", True, 2), (2, "merge", True, 1), (1, "build", False, None),
    ]
    # maintenance metrics describe the op's rewritten output (OPTIMIZE's
    # operationMetrics analog): the fold consolidates all 150 rows into
    # its folded segment; the build wrote the same 150
    by_v = {r.version: r for r in rows}
    assert by_v[1].rows_written == 150
    assert by_v[3].rows_written == 150 and by_v[3].blocks_written >= 1


def test_changefeed_starting_timestamp_errors(spark, history):
    from bloomsearch_spark.streaming.changefeed import BloomSearchStreamReader

    root, t = history
    schema = (
        spark.read.format("bloomsearch").option("root", root).load().schema
    )
    with pytest.raises(ValueError, match="after the latest"):
        BloomSearchStreamReader(
            {"root": root, "starting_timestamp": str(t[3] + 3600)}, schema
        )
    with pytest.raises(ValueError, match="not both"):
        BloomSearchStreamReader(
            {"root": root, "starting_version": "earliest",
             "starting_timestamp": str(t[2])}, schema
        )
    with pytest.raises(ValueError, match="snapshot batch read"):
        BloomSearchStreamReader(
            {"root": root, "timestamp_as_of": str(t[2])}, schema
        )
    # snapshot batch reads refuse the stream-only option loudly
    with pytest.raises(Exception, match="changefeed"):
        (
            spark.read.format("bloomsearch").option("root", root)
            .option("starting_timestamp", str(t[2])).load().count()
        )


def test_bisect_commit_times_property(monkeypatch):
    """version_as_of / first_version_at_or_after ≡ a naive linear scan,
    for arbitrary monotone commit-time sequences and probe instants —
    including probes EXACTLY at commit times (the predicate is explicit
    <=/< rather than an epsilon shift: at epoch magnitude a double ULP
    is ~0.24 µs, so `ts - 1e-9` would round back onto ts and silently
    flip at-or-before into strictly-before)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = 1.7e9

    @settings(max_examples=200, deadline=None)
    @given(
        gaps=st.lists(
            st.floats(min_value=1e-6, max_value=3600, allow_nan=False),
            min_size=1, max_size=12,
        ),
        probe=st.one_of(
            st.floats(min_value=-7200, max_value=7200, allow_nan=False),
            st.sampled_from([0.0]),  # exactly-at-commit probes below
        ),
        exact_idx=st.integers(min_value=-1, max_value=11),
    )
    def check(gaps, probe, exact_idx):
        times = []
        t = base
        for g in gaps:
            t += g
            times.append(t)
        names = [f"v{i + 1:08d}" for i in range(len(times))]
        by_name = dict(zip(names, times))
        monkeypatch.setattr(mf, "retained_versions", lambda root: list(names))
        monkeypatch.setattr(
            mf, "commit_time", lambda root, v: by_name[v]
        )
        # probe at an offset — or EXACTLY at a commit instant
        ts = (
            times[exact_idx % len(times)]
            if 0 <= exact_idx < len(times)
            else times[0] + probe
        )

        at_or_before = [n for n, tt in zip(names, times) if tt <= ts]
        at_or_after = [n for n, tt in zip(names, times) if tt >= ts]

        if at_or_before:
            assert mf.version_as_of("x", ts) == at_or_before[-1]
        else:
            with pytest.raises(ValueError, match="predates"):
                mf.version_as_of("x", ts)
        assert mf.first_version_at_or_after("x", ts) == (
            at_or_after[0] if at_or_after else None
        )

    check()


def test_version_as_of_refuses_retained_holes(spark, tmp_root):
    """A NON-CONTIGUOUS retained set (e.g. a legacy back-compat ref keeps
    v1 while v2 was vacuumed): an instant strictly inside the gap must
    refuse — any vacuumed version may have been CURRENT then, so
    resolving to the retained lower bound would silently serve a staler
    snapshot.  Exactly-at-the-lower-bound still resolves."""
    from bloomsearch_spark.sources import fs as fsx

    build_index(spark, generate_df(spark, 120), tmp_root, CFG)
    for i, seed in enumerate((4, 9)):
        build_index(
            spark, generate_df(spark, 40, seed=seed).coalesce(1), tmp_root,
            CFG, mode="append", source_desc=f"a{i}",
        )
    t1 = mf.commit_time(tmp_root, "v00000001")
    t3 = mf.commit_time(tmp_root, "v00000003")
    # punch the hole: v2's dir goes, v1 and v3 stay
    fsx.delete_dir(fsx.join(tmp_root, "manifest", "v00000002"))
    assert mf.retained_versions(tmp_root) == ["v00000001", "v00000003"]

    with pytest.raises(ValueError, match="not consecutive"):
        mf.version_as_of(tmp_root, (t1 + t3) / 2)
    # exactly at the retained lower bound: no vacuumed version can have
    # committed at-or-before it (commit times are strictly monotonic)
    assert mf.version_as_of(tmp_root, t1) == "v00000001"
    # outside the gap both directions still resolve
    assert mf.version_as_of(tmp_root, t3 + 3600) == "v00000003"


def test_changes_read_rejects_starting_options(spark, history):
    """starting_version / starting_timestamp are the readStream spelling
    of a lower bound — a batch changes read must reject them loudly, not
    silently return the full history from v0."""
    root, t = history
    for k, v in (
        ("starting_timestamp", str(t[2])),
        ("starting_version", "2"),
    ):
        with pytest.raises(Exception, match="do not apply to a changes read"):
            (
                spark.read.format("bloomsearch").option("root", root)
                .option(k, v).option("changes_to", "3").load().count()
            )


def test_changes_read_vacuumed_lower_bound_refuses_upfront(spark, tmp_root):
    """A changes_from pointing at a vacuumed version must refuse AT
    PLANNING with batch vocabulary — not fail later inside the wrapped
    stream planner with a restart-the-stream message."""
    from bloomsearch_spark import fold_manifest, vacuum_manifest

    build_index(spark, generate_df(spark, 100), tmp_root, CFG)          # v1
    build_index(
        spark, generate_df(spark, 40, seed=4).coalesce(1), tmp_root, CFG,
        mode="append", source_desc="a1",
    )                                                                   # v2
    fold_manifest(spark, BloomIndex.load(spark, tmp_root))              # v3
    vacuum_manifest(BloomIndex.load(spark, tmp_root), staging_ttl=0)
    with pytest.raises(Exception, match="vacuumed"):
        (
            spark.read.format("bloomsearch").option("root", tmp_root)
            .option("changes_from", "2").load().count()
        )


def test_version_as_of_log_meta_reads(monkeypatch):
    """Scale honesty: resolving an instant over 1024 retained versions
    costs O(log n) meta reads (~10), never a linear sweep — the knob that
    keeps timestamp_as_of viable on long-retention object-store roots
    where each meta read is a GET."""
    n = 1024
    names = [f"v{i + 1:08d}" for i in range(n)]
    times = {v: 1.7e9 + 10.0 * i for i, v in enumerate(names)}
    reads = {"n": 0}

    def counting(root, v):
        reads["n"] += 1
        return times[v]

    monkeypatch.setattr(mf, "retained_versions", lambda root: list(names))
    monkeypatch.setattr(mf, "commit_time", counting)

    assert mf.version_as_of("x", 1.7e9 + 10.0 * 700 + 5) == names[700]
    assert reads["n"] <= 12  # ceil(log2(1024)) + memoized endpoints
    reads["n"] = 0
    assert mf.first_version_at_or_after("x", 1.7e9 + 10.0 * 700 + 5) == names[701]
    assert reads["n"] <= 12
