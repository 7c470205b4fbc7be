"""Deletion vectors — merge-on-read DELETE (r06).

``delete_where(use_deletion_vectors=True)`` records matched row POSITIONS
as an inline ``dvs`` manifest delta (DVS_SCHEMA) instead of rewriting
blocks: the commit moves O(matched positions) manifest bytes and ZERO data
bytes, and every read path (engine search, DataSource, changefeed replay)
masks the positions out.  Deltas are disjoint by construction — the
dv-delete scan itself reads DV-masked, so an already-deleted position can
never re-match — making the live mask a plain per-block union, the same
associative/idempotent merge discipline as the bloom bitset OR.

Delta-analog surface: DVs are Delta Lake's deletion-vector feature
reshaped for this manifest (positions inline in immutable segments, not
sidecar .bin files — the data vacuum needs no new file class).  Reference
analog: none (the Go engine has block-granular expiry only,
bloom_tree_engine.go:1374+); this is the Delta-shaped surface its
training-pipeline users expect for selective deletes at 100 TB.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import (
    BloomIndex,
    IndexConfig,
    build_index,
    clone,
    compact_blocks,
    delete_where,
    fold_manifest,
    new_query,
    restore,
    search,
    upsert_keys,
    vacuum,
    vacuum_manifest,
)
from bloomsearch_spark.sources import manifest as mf
from bloomsearch_spark.sources.synthetic import generate_df, generate_pdf

CFG = IndexConfig(
    indexed_fields=("repo", "path", "lang", "content"),
    partition_expr="lang",
    max_block_rows=100,
    blocks_per_file=4,
)


def _toks(s: pd.Series) -> pd.Series:
    return s.str.lower().str.split()


def _hit(pdf: pd.DataFrame, needle: str) -> pd.Series:
    return _toks(pdf["content"]).map(lambda t: needle in t)


ALPHA = lambda: new_query().token("needle_alpha").build()  # noqa: E731
ALL = lambda: new_query().field("content").build()  # noqa: E731


# ---------------------------------------------------------------------------
# core semantics


def test_dv_delete_masks_without_moving_data(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 600), tmp_root, CFG)
    pdf = generate_pdf(600)
    hit = _hit(pdf, "needle_alpha")
    before = {
        r.block_id: r.data_path
        for r in idx.blocks().select("block_id", "data_path").collect()
    }

    out, st = delete_where(spark, idx, ALPHA(), use_deletion_vectors=True)
    assert st.rows_deleted == int(hit.sum()) > 0
    assert st.dv_blocks >= 1
    assert st.blocks_rewritten == 0 and st.blocks_dropped == 0
    # ZERO data movement: every block keeps its id and dir
    after = {
        r.block_id: r.data_path
        for r in out.blocks().select("block_id", "data_path").collect()
    }
    assert after == before
    assert out.dvs_refs()
    # reads mask: deleted rows gone, every other row survives byte-exact
    assert search(spark, out, ALPHA()).count() == 0
    got = search(spark, out, ALL()).toPandas()
    assert sorted(got["commit"]) == sorted(pdf[~hit]["commit"])
    # bookkeeping: dv_count == positions length == rows deleted
    dvs = out.dvs().toPandas()
    assert int(dvs["dv_count"].sum()) == st.rows_deleted
    assert all(len(p) == c for p, c in zip(dvs["positions"], dvs["dv_count"]))


def test_dv_deltas_disjoint_and_cumulative(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 600), tmp_root, CFG)
    pdf = generate_pdf(600)
    a, b = _hit(pdf, "needle_alpha"), _hit(pdf, "needle_beta")

    ix1, s1 = delete_where(spark, idx, ALPHA(), use_deletion_vectors=True)
    ix2, s2 = delete_where(
        spark, ix1, new_query().token("needle_beta").build(),
        use_deletion_vectors=True,
    )
    # the second delete's scan reads DV-masked: alpha-deleted positions
    # cannot re-match, so the delta counts only the NEW rows
    assert s1.rows_deleted == int(a.sum())
    assert s2.rows_deleted == int((b & ~a).sum())
    # disjointness across deltas: no (block, pos) appears twice
    expl = ix2.dv_positions().toPandas()
    assert not expl.duplicated(["block_id", "_bs_pos"]).any()
    got = search(spark, ix2, ALL()).toPandas()
    assert sorted(got["commit"]) == sorted(pdf[~a & ~b]["commit"])


def test_dv_noop_commits_nothing(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 200), tmp_root, CFG)
    out, st = delete_where(
        spark, idx, new_query().token("zz_totally_absent").build(),
        use_deletion_vectors=True,
    )
    assert st.rows_deleted == 0 and st.dv_blocks == 0
    assert out.version == idx.version
    assert mf.current_version(tmp_root) == idx.version


def test_dv_time_travel_and_restore_both_directions(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 400), tmp_root, CFG)
    v1 = idx.version
    pdf = generate_pdf(400)
    n_hit = int(_hit(pdf, "needle_alpha").sum())

    out, _ = delete_where(spark, idx, ALPHA(), use_deletion_vectors=True)
    v2 = out.version
    # pinned pre-DV snapshot still answers with the deleted rows
    pre = BloomIndex.load(spark, tmp_root, version=v1)
    assert search(spark, pre, ALPHA()).count() == n_hit
    # restore BACK to v1: the mask travels with the target (dropped)
    r1 = restore(spark, out, version=v1)
    assert not r1.dvs_refs()
    assert search(spark, r1, ALPHA()).count() == n_hit
    # restore FORWARD to v2: exactly its mask again
    r2 = restore(spark, r1, version=v2)
    assert search(spark, r2, ALPHA()).count() == 0
    assert search(spark, r2, ALL()).count() == 400 - n_hit


def test_dv_append_carries_mask(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 300), tmp_root, CFG)
    pdf = generate_pdf(300)
    n_hit = int(_hit(pdf, "needle_alpha").sum())
    out, _ = delete_where(spark, idx, ALPHA(), use_deletion_vectors=True)

    ap = build_index(
        spark, generate_df(spark, 80, seed=7), tmp_root, CFG, mode="append"
    )
    pdf2 = generate_pdf(80, seed=7)
    n_hit2 = int(_hit(pdf2, "needle_alpha").sum())
    # old mask survives the append; appended rows are fully live
    assert ap.dvs_refs() == out.dvs_refs()
    assert search(spark, ap, ALPHA()).count() == n_hit2
    assert search(spark, ap, ALL()).count() == 300 - n_hit + 80
    # overwrite starts clean
    ow = build_index(
        spark, generate_df(spark, 50, seed=9), tmp_root, CFG, mode="overwrite"
    )
    assert not ow.dvs_refs()
    assert search(spark, ow, ALL()).count() == 50


# ---------------------------------------------------------------------------
# maintenance interplay


def test_dv_compact_purges_physically(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 600), tmp_root, CFG)
    pdf = generate_pdf(600)
    hit = _hit(pdf, "needle_alpha")
    out, _ = delete_where(spark, idx, ALPHA(), use_deletion_vectors=True)

    c, _ = compact_blocks(spark, out, max_block_rows=100_000)
    got = search(spark, c, ALL()).toPandas()
    assert sorted(got["commit"]) == sorted(pdf[~hit]["commit"])
    assert search(spark, c, ALPHA()).count() == 0
    # consolidated blocks materialized LIVE rows only: the manifest
    # row_counts of merged blocks reflect the purge
    merged = c.blocks().filter(~F.col("block_id").isin(
        [r.block_id for r in out.blocks().select("block_id").collect()]
    ))
    if merged.count():  # merge groups existed
        import pyarrow.parquet as pq

        from bloomsearch_spark.sources import fs as fsx

        for r in merged.select("data_path", "row_count").collect():
            physical = pq.read_table(
                fsx.join(c.data_dir, r.data_path)
            ).num_rows
            assert physical == r.row_count


def test_dv_fold_unions_and_drops_orphans(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 600), tmp_root, CFG)
    pdf = generate_pdf(600)
    a, b = _hit(pdf, "needle_alpha"), _hit(pdf, "needle_beta")
    ix1, _ = delete_where(spark, idx, ALPHA(), use_deletion_vectors=True)
    ix2, _ = delete_where(
        spark, ix1, new_query().token("needle_beta").build(),
        use_deletion_vectors=True,
    )
    assert len(ix2.dvs_refs()) == 2
    f = fold_manifest(spark, ix2)
    # folded to ONE dvs segment, per-block positions unioned
    assert len(f.dvs_refs()) == 1
    got = search(spark, f, ALL()).toPandas()
    assert sorted(got["commit"]) == sorted(pdf[~a & ~b]["commit"])
    # compact rewrites merged masked blocks -> fold drops their
    # orphaned DV rows (singleton pass-throughs may keep theirs)
    c, _ = compact_blocks(spark, f, max_block_rows=100_000)
    f2 = fold_manifest(spark, c)
    assert search(spark, f2, ALL()).count() == int((~a & ~b).sum())


def test_dv_zorder_purges_and_drops_refs(spark, tmp_root):
    n = 4000
    df = spark.range(n).select(
        ((F.col("id") * 7919) % n).alias("a"),
        ((F.col("id") * 104729) % n).alias("b"),
        F.concat(F.lit("tok"), (F.col("id") % 97)).alias("text"),
    )
    cfg = IndexConfig(
        indexed_fields=("text",), partition_expr="''",
        minmax_fields=("a", "b"), max_block_rows=200, blocks_per_file=4,
    )
    idx = build_index(spark, df, tmp_root, cfg)
    q = new_query().field_token("text", "tok5").build()
    out, st = delete_where(spark, idx, q, use_deletion_vectors=True)
    assert st.rows_deleted > 0 and out.dvs_refs()

    from bloomsearch_spark import optimize_zorder

    z, _ = optimize_zorder(spark, out, ["a", "b"], bits=8)
    # every block was rebuilt from a DV-masked scan: refs must NOT carry
    assert not z.dvs_refs()
    assert search(spark, z, q).count() == 0
    n_live = n - st.rows_deleted
    assert search(spark, z, new_query().field("text").build()).count() == n_live
    # physical: manifest row_count totals the live rows exactly
    assert z.blocks().agg(F.sum("row_count")).collect()[0][0] == n_live


def test_dv_scoped_zorder_carries_out_of_scope_masks(spark, tmp_root):
    """OPTIMIZE WHERE x DVs: a partition-scoped zorder purges the scoped
    partition's masked rows physically but CARRIES the dv refs — the
    untouched partitions' masks must keep applying."""
    from bloomsearch_spark import Eq, Partition, optimize_zorder

    n = 3000
    df = (
        spark.range(n).select(
            ((F.col("id") * 7919) % n).alias("a"),
            (F.col("id") % 3).cast("string").alias("grp"),
            F.concat(F.lit("tok"), (F.col("id") % 50)).alias("text"),
        )
    )
    cfg = IndexConfig(
        indexed_fields=("text", "grp"), partition_expr="grp",
        minmax_fields=("a",), max_block_rows=200, blocks_per_file=4,
    )
    idx = build_index(spark, df, tmp_root, cfg)
    # dv-delete tok7 rows (they live in EVERY partition)
    q = new_query().field_token("text", "tok7").build()
    out, st = delete_where(spark, idx, q, use_deletion_vectors=True)
    assert st.rows_deleted == n // 50

    z, zs = optimize_zorder(
        spark, out, ["a"], bits=8, where=Partition(Eq("1"))
    )
    assert z.dvs_refs()  # carried (out-of-scope partitions still masked)
    assert zs.blocks_rewritten < zs.blocks_before
    # deleted rows stay gone everywhere: purged in grp=1, masked elsewhere
    assert search(spark, z, q).count() == 0
    assert (
        search(spark, z, new_query().field("text").build()).count()
        == n - n // 50
    )
    # physical purge happened in the scoped partition only
    g1 = z.blocks().filter(F.col("partition_id") == "1")
    assert g1.agg(F.sum("row_count")).collect()[0][0] == n // 3 - n // 150


def test_dv_upsert_does_not_resurrect(spark, tmp_root):
    cfg = IndexConfig(
        indexed_fields=("repo", "path", "lang", "content"),
        partition_expr="lang", max_block_rows=100, blocks_per_file=4,
        sha_col="content",
    )
    idx = build_index(spark, generate_df(spark, 400), tmp_root, cfg)
    pdf = generate_pdf(400)
    hit = _hit(pdf, "needle_alpha")
    out, st = delete_where(spark, idx, ALPHA(), use_deletion_vectors=True)

    # full-row replace of 20 LIVE keys (needle-free contents)
    src = pdf[~hit].head(20).copy()
    src["content"] = "updated clean content row"
    up, _ = upsert_keys(
        spark, out, spark.createDataFrame(src), key_field="path"
    )
    assert search(spark, up, ALPHA()).count() == 0  # stays deleted
    got = search(spark, up, ALL()).toPandas()
    assert len(got) == int((~hit).sum())  # replaced, not added
    upd = got[got["path"].isin(set(src["path"]))]
    assert (upd["content"] == "updated clean content row").all()


def test_dv_vacuum_keeps_referenced_segments(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 300), tmp_root, CFG)
    pdf = generate_pdf(300)
    hit = _hit(pdf, "needle_alpha")
    out, _ = delete_where(spark, idx, ALPHA(), use_deletion_vectors=True)
    # no-retention vacuum of both halves: CURRENT's dvs segment survives
    vacuum(out)
    vacuum_manifest(out, staging_ttl=0.0)
    cur = BloomIndex.load(spark, tmp_root)
    assert cur.dvs_refs()
    got = search(spark, cur, ALL()).toPandas()
    assert sorted(got["commit"]) == sorted(pdf[~hit]["commit"])


def test_dv_purge_rewrites_only_masked_blocks(spark, tmp_root):
    """REORG APPLY (PURGE) analog: exactly the DV'd blocks rewrite (live
    rows materialized, fresh dirs), untouched blocks keep their dirs, all
    dvs refs drop, rows identical before/after."""
    from bloomsearch_spark import purge_deletion_vectors

    idx = build_index(spark, generate_df(spark, 600), tmp_root, CFG)
    pdf = generate_pdf(600)
    hit = _hit(pdf, "needle_alpha")
    out, st = delete_where(spark, idx, ALPHA(), use_deletion_vectors=True)
    dv_paths = set(out.dvs().toPandas()["data_path"])
    before = {
        r.block_id: r.data_path
        for r in out.blocks().select("block_id", "data_path").collect()
    }

    p, ps = purge_deletion_vectors(spark, out)
    assert not p.dvs_refs()
    assert ps.rows_deleted == st.rows_deleted  # the masked rows purged
    assert ps.blocks_rewritten + ps.blocks_dropped == len(dv_paths)
    after = {
        r.block_id: r.data_path
        for r in p.blocks().select("block_id", "data_path").collect()
    }
    # untouched blocks pass through verbatim; every DV'd dir is gone
    for b, path in after.items():
        if b in before:
            assert path == before[b] and path not in dv_paths
        else:
            assert path not in dv_paths
    # physical row counts now tell the truth (manifest == disk == live)
    n_live = int((~hit).sum())
    assert p.blocks().agg(F.sum("row_count")).collect()[0][0] == n_live
    got = search(spark, p, ALL()).toPandas()
    assert sorted(got["commit"]) == sorted(pdf[~hit]["commit"])
    assert search(spark, p, ALPHA()).count() == 0
    # idempotent: a second purge is a no-op (same version back)
    p2, ps2 = purge_deletion_vectors(spark, p)
    assert p2.version == p.version and ps2.rows_deleted == 0
    # the changefeed treats the purge as a reorganization: a plain feed
    # started AT the purge commit emits nothing for it and does not refuse
    from bloomsearch_spark.sources.datasource import BloomSearchDataSource

    spark.dataSource.register(BloomSearchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    n_purge_events = (
        spark.read.format("bloomsearch").option("root", tmp_root)
        .option("changes_from", str(int(p.version[1:])))
        .load().count()
    )
    assert n_purge_events == 0


def test_dv_maintain_purge_and_history(spark, tmp_root):
    from bloomsearch_spark import maintain

    idx = build_index(spark, generate_df(spark, 400), tmp_root, CFG)
    pdf = generate_pdf(400)
    hit = _hit(pdf, "needle_alpha")
    delete_where(spark, idx, ALPHA(), use_deletion_vectors=True)

    out = maintain(spark, tmp_root, purge_dvs=True)
    assert out["dv_purged_rows"] == int(hit.sum())
    cur = BloomIndex.load(spark, tmp_root)
    assert not cur.dvs_refs()
    assert search(spark, cur, ALL()).count() == int((~hit).sum())
    # DESCRIBE HISTORY surfaces both commits with their ops + row deltas
    h = cur.history().toPandas()
    ops = set(h["operation"])
    assert "delete_dv" in ops and "purge_dv" in ops
    dv_row = h[h["operation"] == "delete_dv"].iloc[0]
    assert int(dv_row["rows_written"]) == -int(hit.sum())


def test_dv_purge_drops_fully_masked_blocks(spark, tmp_root):
    from bloomsearch_spark import purge_deletion_vectors

    idx = build_index(spark, generate_df(spark, 400), tmp_root, CFG)
    pdf = generate_pdf(400)
    lang = pdf["lang"].iloc[0]
    # whole-partition DV delete -> some blocks 100% masked
    out, st = delete_where(
        spark, idx, new_query().field_token("lang", lang).build(),
        use_deletion_vectors=True,
    )
    p, ps = purge_deletion_vectors(spark, out)
    assert ps.blocks_dropped >= 1
    assert search(spark, p, ALL()).count() == int((pdf["lang"] != lang).sum())
    assert p.blocks().count() == ps.blocks_before - ps.blocks_dropped


# ---------------------------------------------------------------------------
# shallow clones: the one row-level mutation a zero-copy fork supports


def test_dv_delete_on_shallow_clone(spark, tmp_root, tmp_path):
    idx = build_index(spark, generate_df(spark, 300), tmp_root, CFG)
    pdf = generate_pdf(300)
    hit = _hit(pdf, "needle_alpha")
    croot = str(tmp_path / "clone")
    cl = clone(spark, idx, croot, shallow=True)

    out, st = delete_where(spark, cl, ALPHA(), use_deletion_vectors=True)
    assert st.rows_deleted == int(hit.sum()) > 0
    # the mask lives in the CLONE's manifest; source bytes + source
    # manifest untouched
    assert search(spark, out, ALPHA()).count() == 0
    assert search(spark, out, ALL()).count() == int((~hit).sum())
    src = BloomIndex.load(spark, tmp_root)
    assert not src.dvs_refs()
    assert search(spark, src, ALPHA()).count() == int(hit.sum())
    # the rewrite delete still refuses on a shallow clone
    with pytest.raises(ValueError, match="shallow"):
        delete_where(spark, out, ALPHA())


# ---------------------------------------------------------------------------
# commit races: the dv delta REBASES instead of re-planning when sound


def test_dv_delete_rebases_over_racing_dv_delete(spark, tmp_root):
    """Two dv deletes planned from the SAME snapshot: the loser rebases —
    overlapping positions are subtracted (serialized after the winner),
    disjointness holds, no re-scan, no conflict_retries needed."""
    idx = build_index(spark, generate_df(spark, 600), tmp_root, CFG)
    pdf = generate_pdf(600)
    a, b = _hit(pdf, "needle_alpha"), _hit(pdf, "needle_beta")
    stale = BloomIndex.load(spark, tmp_root)  # pinned at v1

    _, s1 = delete_where(
        spark, stale, new_query().token("needle_beta").build(),
        use_deletion_vectors=True,
    )
    # second delete from the SAME (now stale) handle: expected=v1 loses
    # the race, rebases onto v2 (conflict_retries=0 — no re-plan allowed)
    out, s2 = delete_where(
        spark, stale, ALPHA(), use_deletion_vectors=True,
    )
    assert s1.rows_deleted == int(b.sum())
    assert s2.rows_deleted == int((a & ~b).sum())  # overlap subtracted
    expl = out.dv_positions().toPandas()
    assert not expl.duplicated(["block_id", "_bs_pos"]).any()
    got = search(spark, out, ALL()).toPandas()
    assert sorted(got["commit"]) == sorted(pdf[~a & ~b]["commit"])


def test_dv_delete_rebases_over_racing_append(spark, tmp_root):
    """A dv delete losing to an APPEND rebases (blocks untouched) and
    serializes BEFORE it: concurrently appended rows matching the
    predicate are NOT deleted (snapshot isolation), same as Delta
    WriteSerializable."""
    idx = build_index(spark, generate_df(spark, 300), tmp_root, CFG)
    pdf = generate_pdf(300)
    hit = _hit(pdf, "needle_alpha")
    stale = BloomIndex.load(spark, tmp_root)

    build_index(
        spark, generate_df(spark, 80, seed=5), tmp_root, CFG, mode="append"
    )
    pdf2 = generate_pdf(80, seed=5)
    hit2 = _hit(pdf2, "needle_alpha")
    out, st = delete_where(spark, stale, ALPHA(), use_deletion_vectors=True)
    assert st.rows_deleted == int(hit.sum())  # base rows only
    cur = BloomIndex.load(spark, tmp_root)
    # the appended alpha rows survive (delete serialized before append)
    assert search(spark, cur, ALPHA()).count() == int(hit2.sum())
    assert (
        search(spark, cur, ALL()).count()
        == 300 - int(hit.sum()) + 80
    )


def test_dv_delete_unrebasable_race_replans(spark, tmp_root):
    """A racing REWRITE moved every block our delta references (it
    rewrote the SAME match surface): the rebase refuses — positions may
    be remapped — CommitConflict with retries=0; with retries=1 the full
    re-plan runs and finds the rows already gone (no empty commit)."""
    idx = build_index(spark, generate_df(spark, 400), tmp_root, CFG)
    pdf = generate_pdf(400)
    a = _hit(pdf, "needle_alpha")
    stale = BloomIndex.load(spark, tmp_root)

    winner, s1 = delete_where(spark, stale, ALPHA())  # block REWRITE
    assert s1.rows_deleted == int(a.sum())
    with pytest.raises(mf.CommitConflict):
        delete_where(
            spark, stale, ALPHA(), use_deletion_vectors=True,
        )
    out, st = delete_where(
        spark, stale, ALPHA(), use_deletion_vectors=True, conflict_retries=1
    )
    assert st.rows_deleted == 0  # re-plan: the rows are already deleted
    assert out.version == winner.version
    got = search(spark, out, ALL()).toPandas()
    assert sorted(got["commit"]) == sorted(pdf[~a]["commit"])


def test_dv_delete_race_fully_absorbed(spark, tmp_root):
    """The racer deleted our ENTIRE surface: the rebase nets zero
    positions and commits nothing — the delete's effect is present."""
    idx = build_index(spark, generate_df(spark, 300), tmp_root, CFG)
    stale = BloomIndex.load(spark, tmp_root)
    winner, s1 = delete_where(spark, stale, ALPHA(), use_deletion_vectors=True)
    out, s2 = delete_where(spark, stale, ALPHA(), use_deletion_vectors=True)
    assert s1.rows_deleted > 0 and s2.rows_deleted == 0
    assert out.version == winner.version  # no empty commit
    assert mf.current_version(tmp_root) == winner.version


# ---------------------------------------------------------------------------
# dv-mode upsert (MERGE with deletion vectors): append-shaped commits


def test_dv_upsert_append_shaped_commit(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 400), tmp_root, CFG)
    pdf = generate_pdf(400)
    before = {
        r.block_id: r.data_path
        for r in idx.blocks().select("block_id", "data_path").collect()
    }
    upd = pdf.head(20).copy()
    upd["content"] = "dvupserted clean row"
    new = pdf.head(3).copy()
    new["path"] = ["zz/new_a.py", "zz/new_b.py", "zz/new_c.py"]
    new["content"] = "dvupserted fresh row"
    src = pd.concat([upd, new], ignore_index=True)

    up, st = upsert_keys(
        spark, idx, spark.createDataFrame(src), key_field="path",
        use_deletion_vectors=True,
    )
    assert st.rows_deleted == 20  # replaced keys' old rows dv-masked
    assert st.dv_blocks >= 1 and up.dvs_refs()
    # APPEND-SHAPED: parent blocks segments referenced verbatim + ONE new
    assert up.table_refs()["blocks"][:-1] == idx.table_refs()["blocks"]
    assert len(up.table_refs()["blocks"]) == len(idx.table_refs()["blocks"]) + 1
    # every pre-existing block keeps its dir (zero old-block rewrites)
    after = {
        r.block_id: r.data_path
        for r in up.blocks().select("block_id", "data_path").collect()
    }
    assert all(after[b] == p for b, p in before.items())
    # row semantics: full-row replacement + fresh inserts
    got = search(spark, up, ALL()).toPandas()
    assert len(got) == 400 + 3
    repl = got[got["path"].isin(set(upd["path"]))]
    assert len(repl) == 20
    assert (repl["content"] == "dvupserted clean row").all()
    assert (
        search(
            spark, up, new_query().field_token("content", "dvupserted").build()
        ).count()
        == 23
    )


def test_dv_upsert_delete_keys_and_noop(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 300), tmp_root, CFG)
    pdf = generate_pdf(300)
    dels = pdf.head(5)[["path"]]
    # pure-delete dv upsert: empty source + delete_keys_df
    src = spark.createDataFrame(
        pdf.iloc[0:0],
        "repo string, path string, commit string, lang string, content string",
    )
    up, st = upsert_keys(
        spark, idx, src, key_field="path",
        delete_keys_df=spark.createDataFrame(dels),
        use_deletion_vectors=True,
    )
    assert st.rows_deleted == 5
    got = search(spark, up, ALL()).toPandas()
    assert sorted(got["path"]) == sorted(pdf[5:]["path"])
    # match-nothing + insert-nothing commits NOTHING
    up2, st2 = upsert_keys(
        spark, up, src, key_field="path",
        delete_keys_df=spark.createDataFrame(
            pd.DataFrame({"path": ["zz/absent.py"]})
        ),
        use_deletion_vectors=True,
    )
    assert st2.rows_deleted == 0 and up2.version == up.version


def test_dv_upsert_changefeed_cdc(spark, tmp_root):
    from bloomsearch_spark.sources.datasource import BloomSearchDataSource

    spark.dataSource.register(BloomSearchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    idx = build_index(spark, generate_df(spark, 300), tmp_root, CFG)
    pdf = generate_pdf(300)
    upd = pdf.head(10).copy()
    upd["content"] = "dvu replacement"
    upsert_keys(
        spark, idx, spark.createDataFrame(upd), key_field="path",
        use_deletion_vectors=True,
    )
    # plain feed refuses (the commit deletes the replaced keys' old rows)
    with pytest.raises(Exception, match="UPSERT"):
        (
            spark.read.format("bloomsearch").option("root", tmp_root)
            .option("changes_from", "0").load().count()
        )
    ev = (
        spark.read.format("bloomsearch").option("root", tmp_root)
        .option("changes_from", "0").option("change_events", "true")
        .option("commit_metadata", "true").load()
    ).collect()
    v2_del = [r for r in ev if r._commit_version == 2 and r._change_type == "delete"]
    v2_ins = [r for r in ev if r._commit_version == 2 and r._change_type == "insert"]
    # deletes = EXACTLY the replaced keys' old rows; inserts = the new rows
    assert sorted(r.path for r in v2_del) == sorted(upd["path"])
    assert all(r.content != "dvu replacement" for r in v2_del)
    assert sorted(r.path for r in v2_ins) == sorted(upd["path"])
    assert all(r.content == "dvu replacement" for r in v2_ins)
    state: dict = {}
    for r in sorted(ev, key=lambda r: (r._commit_version, r._change_type != "delete")):
        if r._change_type == "delete":
            state.pop((r.path, r.content), None)
        else:
            state[(r.path, r.content)] = True
    exp = pd.concat([pdf[10:], upd], ignore_index=True)
    assert sorted(state) == sorted(zip(exp["path"], exp["content"]))


def test_dv_apply_changes_batch(spark, tmp_root):
    from bloomsearch_spark import apply_changes_batch

    idx = build_index(spark, generate_df(spark, 300), tmp_root, CFG)
    pdf = generate_pdf(300)
    upd = pdf.head(4).copy()
    upd["content"] = "applied dv row"
    upd["_change_type"] = "insert"
    upd["_commit_version"] = 7
    dels = pdf.iloc[10:13].copy()
    dels["_change_type"] = "delete"
    dels["_commit_version"] = 7
    changes = spark.createDataFrame(pd.concat([upd, dels], ignore_index=True))

    out, st = apply_changes_batch(
        spark, idx, changes, key_field="path", use_deletion_vectors=True
    )
    assert st.rows_deleted == 7  # 4 replaced + 3 deleted
    got = search(spark, out, ALL()).toPandas()
    assert len(got) == 300 - 3
    assert (
        got[got["path"].isin(set(upd["path"]))]["content"] == "applied dv row"
    ).all()
    assert not set(dels["path"]) & set(got["path"])
    # append-shaped: one commit, parent block segments untouched
    assert out.table_refs()["blocks"][: len(idx.table_refs()["blocks"])] == (
        idx.table_refs()["blocks"]
    )


# ---------------------------------------------------------------------------
# DataSource + changefeed surfaces


def test_dv_datasource_read_paths(spark, tmp_root):
    from bloomsearch_spark.sources.datasource import BloomSearchDataSource

    spark.dataSource.register(BloomSearchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    idx = build_index(spark, generate_df(spark, 600), tmp_root, CFG)
    pdf = generate_pdf(600)
    hit = _hit(pdf, "needle_alpha")
    out, _ = delete_where(spark, idx, ALPHA(), use_deletion_vectors=True)
    live = pdf[~hit]

    def load(**opts):
        r = spark.read.format("bloomsearch").option("root", tmp_root)
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    # plain scan, WHERE pushdown, bloom option, slice fallback, time travel
    assert load().count() == len(live)
    lang = pdf["lang"].iloc[0]
    assert (
        load().filter(F.col("lang") == lang).count()
        == int((live["lang"] == lang).sum())
    )
    repo = "org0/monorepo"
    assert (
        load(field_token=f"repo:{repo}").count()
        == int((live["repo"] == repo).sum())
    )
    assert load(max_driver_blocks="1", slice_rows="2").count() == len(live)
    assert load(version=idx.version).count() == 600
    # value-level identity on the live set
    got = load().select("commit").toPandas()
    assert sorted(got["commit"]) == sorted(live["commit"])


def test_dv_changefeed_cdc_and_plain_refusal(spark, tmp_root):
    from bloomsearch_spark.sources.datasource import BloomSearchDataSource

    spark.dataSource.register(BloomSearchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    idx = build_index(spark, generate_df(spark, 300), tmp_root, CFG)
    pdf = generate_pdf(300)
    hit = _hit(pdf, "needle_alpha")
    delete_where(spark, idx, ALPHA(), use_deletion_vectors=True)

    # plain feed refuses the row-deleting commit (deletion-vector flavor)
    with pytest.raises(Exception, match="deletion"):
        (
            spark.read.format("bloomsearch").option("root", tmp_root)
            .option("changes_from", "0").load().count()
        )
    ev = (
        spark.read.format("bloomsearch").option("root", tmp_root)
        .option("changes_from", "0").option("change_events", "true")
        .option("commit_metadata", "true").load()
    ).collect()
    # v2 (the dv commit) emits EXACTLY the deleted rows as deletes
    v2_del = [r.commit for r in ev if r._commit_version == 2]
    assert all(
        r._change_type == "delete" for r in ev if r._commit_version == 2
    )
    assert sorted(v2_del) == sorted(pdf[hit]["commit"])
    # applying the log reproduces the post-delete snapshot
    state: set = set()
    for r in sorted(
        ev, key=lambda r: (r._commit_version, r._change_type != "delete")
    ):
        (state.discard if r._change_type == "delete" else state.add)(r.commit)
    assert state == set(pdf[~hit]["commit"])


def test_dv_model_random_op_sequence(spark, tmp_root):
    """Seeded randomized MODEL test: a 12-op sequence mixing dv deletes,
    rewrite deletes, appends, dv upserts, compact/purge reorganizations
    and restores, checked row-exactly against a pandas model after EVERY
    commit, then time-travel spot-checked against two historical models.
    The single highest-assurance test for mask/rewrite/travel interplay."""
    import numpy as np

    from bloomsearch_spark import purge_deletion_vectors

    rng = np.random.RandomState(7)
    idx = build_index(spark, generate_df(spark, 400), tmp_root, CFG)
    model = generate_pdf(400)
    history = [(idx.version, model.copy())]  # (version, snapshot)

    def check(ix, m):
        got = search(spark, ix, ALL()).toPandas()
        assert sorted(got["commit"]) == sorted(m["commit"]), (
            f"mismatch at v={ix.version}: got {len(got)} want {len(m)}"
        )

    langs = ["go", "py", "js", "rs", "java", "md"]
    seed = 100
    for step in range(12):
        op = rng.choice(
            ["dv_del", "rw_del", "append", "dv_upsert", "compact", "purge",
             "restore"]
        )
        if op in ("dv_del", "rw_del"):
            lang = langs[rng.randint(len(langs))]
            q = new_query().field_token("lang", lang).build()
            idx, _ = delete_where(
                spark, idx, q, use_deletion_vectors=(op == "dv_del")
            )
            model = model[model["lang"] != lang].copy()
        elif op == "append":
            seed += 1
            n = int(rng.randint(30, 80))
            idx = build_index(
                spark, generate_df(spark, n, seed=seed), tmp_root, CFG,
                mode="append",
            )
            model = pd.concat(
                [model, generate_pdf(n, seed=seed)], ignore_index=True
            )
        elif op == "dv_upsert":
            if len(model) == 0:
                continue
            k = min(len(model), int(rng.randint(3, 12)))
            upd = model.sample(n=k, random_state=rng).copy()
            upd["content"] = f"model upserted step{step}"
            idx, _ = upsert_keys(
                spark, idx, spark.createDataFrame(upd), key_field="path",
                use_deletion_vectors=True,
            )
            model = model[~model["path"].isin(set(upd["path"]))]
            model = pd.concat([model, upd], ignore_index=True)
        elif op == "compact":
            idx, _ = compact_blocks(spark, idx, max_block_rows=100_000)
        elif op == "purge":
            idx, _ = purge_deletion_vectors(spark, idx)
        elif op == "restore":
            j = int(rng.randint(len(history)))
            v, snap = history[j]
            idx = restore(spark, idx, version=v)
            model = snap.copy()
        cur = mf.current_version(tmp_root)
        if cur != history[-1][0]:  # a commit landed
            history.append((cur, model.copy()))
        check(idx, model)

    # time travel: two random historical versions still answer exactly
    for j in (int(rng.randint(len(history))), len(history) - 1):
        v, snap = history[j]
        check(BloomIndex.load(spark, tmp_root, version=v), snap)


def test_dv_changefeed_replay_masks_at_the_instant(spark, tmp_root):
    """Chunks read at their OWN version's mask, not CURRENT's: a rewrite
    delete AFTER a dv delete removes old block dirs that still physically
    hold the dv-deleted rows — the CDC delete events for those dirs must
    mask them out (they were not live at that instant), and the build's
    replayed inserts (pre-DV) must emit everything."""
    from bloomsearch_spark.sources.datasource import BloomSearchDataSource

    spark.dataSource.register(BloomSearchDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    idx = build_index(spark, generate_df(spark, 300), tmp_root, CFG)
    pdf = generate_pdf(300)
    a, b = _hit(pdf, "needle_alpha"), _hit(pdf, "needle_beta")
    out, _ = delete_where(spark, idx, ALPHA(), use_deletion_vectors=True)
    delete_where(
        spark, out, new_query().token("needle_beta").build()
    )  # v3: block REWRITE delete
    ev = (
        spark.read.format("bloomsearch").option("root", tmp_root)
        .option("changes_from", "0").option("change_events", "true")
        .option("commit_metadata", "true").load()
    ).collect()
    # v1 (pre-DV build) replays ALL rows
    v1_ins = [r.commit for r in ev if r._commit_version == 1]
    assert sorted(v1_ins) == sorted(pdf["commit"])
    # v3's delete events read v2's dirs masked with v2's dvs: the
    # alpha-deleted rows (not live at v2->v3) never appear
    v3_del = {
        r.commit
        for r in ev
        if r._commit_version == 3 and r._change_type == "delete"
    }
    assert not (v3_del & set(pdf[a]["commit"]))
    assert set(pdf[b & ~a]["commit"]) <= v3_del
    v3_ins = {
        r.commit
        for r in ev
        if r._commit_version == 3 and r._change_type == "insert"
    }
    assert not (v3_ins & set(pdf[a | b]["commit"]))
    state: set = set()
    for r in sorted(
        ev, key=lambda r: (r._commit_version, r._change_type != "delete")
    ):
        (state.discard if r._change_type == "delete" else state.add)(r.commit)
    assert state == set(pdf[~a & ~b]["commit"])
