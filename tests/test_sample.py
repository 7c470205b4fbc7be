"""Deterministic split/sample operators (functions/sample.py).

The contract under test: membership is a pure function of (salt, key) —
reproducible across runs, partitionings, and ENGINES.  DuckDB recomputes
every assignment from the split_sql/sample_sql twins and must agree
bit-for-bit.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from bloomsearch_spark.functions.sample import (
    _threshold_hex,
    det_sample,
    sample_predicate,
    sample_sql,
    split_column,
    split_corpus,
    split_sql,
)

N = 5000


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(N).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("string").alias("lang"),
    )


def _pd(df):
    return df.toPandas().sort_values("doc_id").reset_index(drop=True)


def test_threshold_hex_edges():
    assert _threshold_hex(0.0) == "0" * 32
    assert _threshold_hex(1.0) == "g"  # admits every hex string
    t = _threshold_hex(0.5)
    assert len(t) == 32 and t[0] == "8"
    with pytest.raises(ValueError):
        _threshold_hex(1.5)


def test_split_matches_duckdb_exactly(spark, docs):
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = _pd(split_corpus(docs, "doc_id", weights, salt="s1"))
    con = duckdb.connect()
    case = split_sql("doc_id", weights, salt="s1")
    want = con.execute(
        f"SELECT i AS doc_id, {case} AS split FROM range({N}) t(i) ORDER BY 1"
    ).df()
    assert list(got["split"]) == list(want["split"])
    # all three splits are populated at N=5000 with these weights
    counts = got["split"].value_counts()
    assert set(counts.index) == {"train", "val", "test"}
    # ratios within ~4 sigma of the weights
    assert abs(counts["train"] / N - 0.8) < 0.03


def test_sample_matches_duckdb_and_is_stable(spark, docs):
    got = _pd(det_sample(docs, "doc_id", 0.25, salt="rep"))
    con = duckdb.connect()
    pred = sample_sql("doc_id", 0.25, salt="rep")
    want = con.execute(
        f"SELECT i AS doc_id FROM range({N}) t(i) WHERE {pred} ORDER BY 1"
    ).df()
    assert list(got["doc_id"]) == list(want["doc_id"])
    # reproducible under a different partitioning
    again = _pd(det_sample(docs.repartition(13), "doc_id", 0.25, salt="rep"))
    assert list(again["doc_id"]) == list(got["doc_id"])
    # and disjoint membership under a different salt (overlap ~ f^2)
    other = set(
        _pd(det_sample(docs, "doc_id", 0.25, salt="other"))["doc_id"]
    )
    overlap = len(other & set(got["doc_id"])) / N
    assert 0.01 < overlap < 0.12  # ~0.0625 expected


def test_stratified_fraction_applies_per_stratum(spark, docs):
    got = _pd(
        det_sample(docs, "doc_id", 0.5, salt="st", stratify_by="lang")
    )
    base = _pd(docs)
    per = got.groupby("lang").size() / base.groupby("lang").size()
    # every stratum individually near 0.5 (each ~714 rows, 4 sigma ~ 0.075)
    assert (per - 0.5).abs().max() < 0.09
    # oracle twin agrees
    con = duckdb.connect()
    pred = sample_sql("doc_id", 0.5, salt="st", stratify_sql="lang")
    want = con.execute(
        f"SELECT i AS doc_id FROM range({N}) t(i), "
        f"LATERAL (SELECT CAST(i % 7 AS VARCHAR) AS lang) WHERE {pred} "
        "ORDER BY 1"
    ).df()
    assert list(got["doc_id"]) == list(want["doc_id"])


def test_splits_partition_the_corpus(spark, docs):
    weights = {"a": 1, "b": 1, "c": 2}
    out = split_corpus(docs, "doc_id", weights, salt="p")
    assert out.count() == N
    assert out.select("doc_id").distinct().count() == N
    # incremental append consistency: the same keys get the same split
    half = docs.filter(F.col("doc_id") < N // 2)
    first = _pd(split_corpus(half, "doc_id", weights, salt="p"))
    whole = _pd(out).iloc[: N // 2]
    assert list(first["split"]) == list(whole["split"])


def test_split_validation(spark, docs):
    with pytest.raises(ValueError, match="at least one"):
        split_column(F.col("doc_id"), {})
    with pytest.raises(ValueError, match="nonnegative"):
        split_column(F.col("doc_id"), {"a": -1, "b": 2})
    with pytest.raises(ValueError, match="already exists"):
        split_corpus(docs, "doc_id", {"a": 1}, split_col="lang")
    # single split = constant label
    one = split_corpus(docs.limit(5), "doc_id", {"all": 3.0})
    assert set(r.split for r in one.collect()) == {"all"}


def test_plan_is_a_pure_map(spark, docs):
    """No shuffle: membership never depends on partitioning."""
    plan = det_sample(docs, "doc_id", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_null_keys_are_excluded(spark):
    df = spark.createDataFrame(
        [(1,), (None,), (2,)], "doc_id: bigint"
    )
    kept = det_sample(df, "doc_id", 1.0).collect()
    assert sorted(r.doc_id for r in kept) == [1, 2]
    pred = sample_predicate(F.col("doc_id"), 0.0)
    assert df.filter(pred).count() == 0
