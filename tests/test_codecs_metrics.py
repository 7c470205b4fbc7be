"""Per-codec e2e (mirrors the reference's uncompressed/zstd/snappy golden
triplets, bloom_tree_engine_test.go:469-984) + index health metrics."""

import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import IndexConfig, build_index, new_query, search, verify_integrity
from bloomsearch_spark.operators.metrics import bloom_health, index_metrics
from bloomsearch_spark.sources.synthetic import generate_df, generate_pdf

N = 1_500


@pytest.mark.parametrize("codec", ["none", "snappy", "zstd"])
def test_codec_roundtrip(spark, tmp_root, codec):
    cfg = IndexConfig(
        indexed_fields=("repo", "path", "lang", "content"),
        partition_expr="lang",
        max_block_rows=200,
        blocks_per_file=4,
        compression=codec,
        sha_col="content",
    )
    idx = build_index(spark, generate_df(spark, N), tmp_root, cfg)
    pdf = generate_pdf(N)
    expect = sum("needle_alpha" in c.lower().split() for c in pdf["content"])
    got = search(spark, idx, new_query().token("needle_alpha").build())
    assert got.count() == expect
    assert search(spark, idx, new_query().token("zz_absent").build()).count() == 0
    assert verify_integrity(spark, idx) == 0


def test_index_metrics(spark, tmp_root):
    cfg = IndexConfig(
        indexed_fields=("repo", "path", "lang", "content"),
        partition_expr="lang",
        max_block_rows=200,
        blocks_per_file=4,
        block_fpr=0.01,
        file_fpr=0.01,
        file_expected_items=20_000,
        sha_col="content",
    )
    idx = build_index(spark, generate_df(spark, N), tmp_root, cfg)
    m = index_metrics(idx)
    assert m["rows"] == N
    assert m["blocks"] >= 6 and m["files"] >= 6
    assert m["tokens_inserted"] > 0
    assert 0 < m["max_block_token_fill"] < 1
    assert 0 < m["max_file_token_fill"] < 1
    # blocks hold <= expected items, so implied FPR must be within sizing
    assert m["max_block_token_est_fpr"] <= 0.011
    assert m["lineage_ops"].get("build", 0) == m["blocks"]

    # per-row health frame exposes fill + est_fpr columns
    bh = bloom_health(idx.blocks()).select(
        "block_id", "token_fill", "token_est_fpr"
    ).toPandas()
    assert len(bh) == m["blocks"]
    assert (bh["token_fill"] > 0).all()


def test_overfilled_file_bloom_is_visible(spark, tmp_root):
    """Deliberately undersize the file bloom: the health metric must show
    the degradation the reference hides (SURVEY.md §7.3)."""
    cfg = IndexConfig(
        indexed_fields=("content",),
        partition_expr="''",
        max_block_rows=500,
        blocks_per_file=10,
        file_expected_items=20,  # absurdly small for ~thousands of tokens
        file_fpr=0.01,
        sha_col="content",
    )
    idx = build_index(spark, generate_df(spark, N), tmp_root, cfg)
    m = index_metrics(idx)
    # ~40-token synthetic vocabulary in a 192-bit filter: fill ~0.75, an
    # implied FPR orders of magnitude above the configured 0.01 — visible
    assert m["max_file_token_fill"] > 0.6
    assert m["max_file_token_est_fpr"] > 0.05


@pytest.mark.parametrize("level", [1, 19])
def test_zstd_level_roundtrip(spark, tmp_root, level):
    """ZstdCompressionLevel knob (reference bloom_tree_engine.go:46-80):
    both extremes round-trip; level 19 must not out-size level 1 output."""
    cfg = IndexConfig(
        indexed_fields=("repo", "path", "lang", "content"),
        partition_expr="lang",
        max_block_rows=500,
        blocks_per_file=4,
        compression="zstd",
        zstd_level=level,
        sha_col="content",
    )
    idx = build_index(spark, generate_df(spark, N), tmp_root, cfg)
    pdf = generate_pdf(N)
    expect = sum("needle_alpha" in c.lower().split() for c in pdf["content"])
    assert search(spark, idx, new_query().token("needle_alpha").build()).count() == expect
    assert verify_integrity(spark, idx) == 0
    total = idx.blocks().agg(F.sum("byte_size")).collect()[0][0]
    sizes = getattr(test_zstd_level_roundtrip, "_sizes", {})
    sizes[level] = total
    test_zstd_level_roundtrip._sizes = sizes
    if len(sizes) == 2:
        assert sizes[19] <= sizes[1]


def test_zstd_level_validation():
    with pytest.raises(ValueError, match="zstd_level requires"):
        IndexConfig(indexed_fields=("x",), compression="snappy", zstd_level=3)
    with pytest.raises(ValueError, match="in \\[1, 22\\]"):
        IndexConfig(indexed_fields=("x",), compression="zstd", zstd_level=99)
