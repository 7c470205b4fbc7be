"""CHECK constraints / expectations (r06) — the Delta ADD CONSTRAINT +
DLT-expectations analog: write-path data-quality gates enforced in the
SAME pass that stages rows (Observation counters, zero extra scans).

fail = abort before commit; drop = filter + record counts; warn = record
counts only; NULL expressions pass (SQL CHECK semantics)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import (
    BloomIndex,
    ConstraintViolation,
    IndexConfig,
    add_constraint,
    build_index,
    clone,
    drop_constraint,
    new_query,
    restore,
    search,
    upsert_keys,
)
from bloomsearch_spark.sources import manifest as mf
from bloomsearch_spark.sources.synthetic import generate_df, generate_pdf

CFG = IndexConfig(
    indexed_fields=("repo", "path", "lang", "content"),
    partition_expr="lang",
    max_block_rows=100,
    blocks_per_file=4,
)

ALL = lambda: new_query().field("content").build()  # noqa: E731


def _poison(spark, pdf: pd.DataFrame, n: int, lang="zz"):
    bad = pdf.head(n).copy()
    bad["path"] = [f"bad/row{i}.xx" for i in range(n)]
    bad["lang"] = lang
    return spark.createDataFrame(bad)


def test_fail_constraint_aborts_before_commit(spark, tmp_root):
    pdf = generate_pdf(200)
    df = generate_df(spark, 200).unionByName(_poison(spark, pdf, 3))
    with pytest.raises(ConstraintViolation, match="lang_known"):
        build_index(
            spark, df, tmp_root, CFG,
            constraints={"lang_known": "lang <> 'zz'"},
        )
    assert mf.current_version(tmp_root) is None  # NOTHING committed

    # valid build commits and STORES the constraint; a violating append
    # is refused with CURRENT unchanged
    idx = build_index(
        spark, generate_df(spark, 200), tmp_root, CFG,
        constraints={"lang_known": "lang <> 'zz'"},
    )
    assert idx.meta()["constraints"]["lang_known"]["action"] == "fail"
    with pytest.raises(ConstraintViolation):
        build_index(
            spark, _poison(spark, pdf, 2), tmp_root, CFG, mode="append"
        )
    assert mf.current_version(tmp_root) == idx.version
    # clean appends pass and CARRY the constraint
    ap = build_index(
        spark, generate_df(spark, 50, seed=3), tmp_root, CFG, mode="append"
    )
    assert ap.meta()["constraints"]["lang_known"]["expr"] == "lang <> 'zz'"
    assert search(spark, ap, ALL()).count() == 250


def test_drop_action_filters_and_records_counts(spark, tmp_root):
    pdf = generate_pdf(200)
    df = generate_df(spark, 200).unionByName(_poison(spark, pdf, 5))
    idx = build_index(
        spark, df, tmp_root, CFG,
        constraints={
            "lang_known": {"expr": "lang <> 'zz'", "action": "drop"},
            "has_content": {"expr": "content is not null", "action": "warn"},
        },
    )
    got = search(spark, idx, ALL()).toPandas()
    assert len(got) == 200 and not (got["lang"] == "zz").any()
    assert idx.meta()["constraint_violations"] == {"lang_known": 5}


def test_null_passes_sql_check_semantics(spark, tmp_root):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "repo": ["r"] * 4,
                "path": [f"p{i}" for i in range(4)],
                "commit": ["c"] * 4,
                "lang": ["go"] * 4,
                "content": ["ok words", None, "ok again", None],
            }
        )
    )
    idx = build_index(
        spark, df, tmp_root, CFG,
        # NULL content -> expression NULL -> PASSES (pair with an explicit
        # IS NOT NULL to require presence)
        constraints={"long_enough": "length(content) > 3"},
    )
    assert search(spark, idx, new_query().field("path").build()).count() == 4


def test_add_constraint_validates_existing_then_gates(spark, tmp_root):
    idx = build_index(spark, generate_df(spark, 150), tmp_root, CFG)
    pdf = generate_pdf(150)
    present = pdf["lang"].iloc[0]
    # violated by existing rows -> refused (one bounded scan)
    with pytest.raises(ConstraintViolation, match="existing rows"):
        add_constraint(spark, idx, "no_lang", f"lang <> '{present}'")
    # satisfiable one commits; appends now enforce it
    c1 = add_constraint(spark, idx, "lang_known", "lang <> 'zz'")
    assert c1.meta()["constraints"]["lang_known"]["action"] == "fail"
    with pytest.raises(ConstraintViolation):
        build_index(
            spark, _poison(spark, pdf, 2), tmp_root, CFG, mode="append"
        )
    # drop_constraint lifts the gate
    c2 = drop_constraint(spark, c1, "lang_known")
    assert "constraints" not in c2.meta() or not c2.meta()["constraints"]
    ap = build_index(
        spark, _poison(spark, pdf, 2), tmp_root, CFG, mode="append"
    )
    assert search(spark, ap, ALL()).count() == 152


def test_upsert_enforces_constraints(spark, tmp_root):
    idx = build_index(
        spark, generate_df(spark, 200), tmp_root, CFG,
        constraints={"lang_known": "lang <> 'zz'"},
    )
    pdf = generate_pdf(200)
    bad = pdf.head(3).copy()
    bad["lang"] = "zz"
    with pytest.raises(ConstraintViolation):
        upsert_keys(spark, idx, spark.createDataFrame(bad), key_field="path")
    assert mf.current_version(tmp_root) == idx.version  # aborted pre-commit

    # drop action: the violating row is dropped AND its key's OLD row
    # survives (a garbage row must not take out the row it would replace)
    d1 = drop_constraint(spark, BloomIndex.load(spark, tmp_root), "lang_known")
    d2 = add_constraint(
        spark, d1, "lang_known", "lang <> 'zz'", action="drop"
    )
    mixed = pd.concat(
        [bad.head(2), pdf.iloc[5:8].assign(content="upserted clean row")],
        ignore_index=True,
    )
    out, st = upsert_keys(
        spark, d2, spark.createDataFrame(mixed), key_field="path"
    )
    assert st.rows_deleted == 3  # only the clean keys replaced
    got = search(spark, out, ALL()).toPandas()
    assert len(got) == 200
    assert not (got["lang"] == "zz").any()
    kept_bad_keys = got[got["path"].isin(set(bad.head(2)["path"]))]
    assert (kept_bad_keys["lang"] != "zz").all()  # old rows survived
    assert out.meta()["constraint_violations"] == {"lang_known": 2}


def test_restore_and_clone_travel_constraints(spark, tmp_root, tmp_path):
    idx = build_index(spark, generate_df(spark, 100), tmp_root, CFG)
    v1 = idx.version
    c1 = add_constraint(spark, idx, "lang_known", "lang <> 'zz'")
    # clone carries the gate
    cl = clone(spark, c1, str(tmp_path / "c"))
    assert cl.meta()["constraints"]["lang_known"]["expr"] == "lang <> 'zz'"
    # restore to the pre-constraint version drops it (identity travels)
    r1 = restore(spark, c1, version=v1)
    assert not (r1.meta().get("constraints") or {})
    pdf = generate_pdf(100)
    build_index(spark, _poison(spark, pdf, 1), tmp_root, CFG, mode="append")
    # restore forward re-arms the gate
    r2 = restore(spark, BloomIndex.load(spark, tmp_root), version=c1.version)
    assert r2.meta()["constraints"]["lang_known"]["action"] == "fail"
    with pytest.raises(ConstraintViolation):
        build_index(
            spark, _poison(spark, pdf, 1), tmp_root, CFG, mode="append"
        )


def test_dsv2_writer_refuses_constrained_append(spark, tmp_root):
    from bloomsearch_spark.sources.datasource import BloomSearchDataSource

    spark.dataSource.register(BloomSearchDataSource)
    build_index(
        spark, generate_df(spark, 100), tmp_root, CFG,
        constraints={"lang_known": "lang <> 'zz'"},
    )
    df = generate_df(spark, 10, seed=2)
    with pytest.raises(Exception, match="CHECK constraints"):
        (
            df.write.format("bloomsearch").mode("append")
            .option("root", tmp_root)
            .option("indexed_fields", "repo,path,lang,content")
            .option("partition_expr", "lang")
            .save()
        )
