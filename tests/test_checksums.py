"""Read-time block checksum verification — the reference CRC32C-frames and
verifies every block as it streams (bloom_tree_engine.go:1196-1203,
file_format.go:121-142).  Here: parquet page CRCs, always written
(build.codec_kwargs), verified at read when the session opts in
(enable_read_checksum_verification) and ALWAYS during merge consolidation
reads (fs.read_parquet_dir)."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import (
    IndexConfig,
    build_index,
    enable_read_checksum_verification,
    new_query,
    search,
)
from bloomsearch_spark.sources import fs as fsx
from bloomsearch_spark.sources.synthetic import generate_df

CFG = IndexConfig(
    indexed_fields=("repo", "path", "lang", "content"),
    partition_expr="lang",
    max_block_rows=2_000,
    blocks_per_file=4,
    # uncompressed: a flipped payload byte must NOT break decompression —
    # the point is that only the CRC catches it
    compression="none",
    sha_col="content",
)


def _corrupt_one_block(root: str) -> str:
    """Flip one data byte in one block file such that an UNVERIFIED read
    still succeeds (silent corruption) while a CRC-verified read fails.
    Returns the corrupted file path."""
    path = sorted(glob.glob(f"{root}/data/file_id=*/block_id=*/part-0.parquet"))[0]
    import os

    fsize = os.path.getsize(path)
    for frac in (0.45, 0.5, 0.55, 0.6, 0.4, 0.35):
        off = int(fsize * frac)
        with open(path, "r+b") as f:
            f.seek(off)
            orig = f.read(1)
            f.seek(off)
            f.write(bytes([orig[0] ^ 0xFF]))
        try:
            pq.read_table(path)  # unverified read must still succeed
        except Exception:
            with open(path, "r+b") as f:  # revert, try another offset
                f.seek(off)
                f.write(orig)
            continue
        with pytest.raises(Exception, match="CRC|checksum|integrity"):
            pq.read_table(path, page_checksum_verification=True)
        return path
    pytest.skip("could not plant a silent corruption at any probed offset")


def test_crc_catches_silent_block_corruption(spark, tmp_root):
    df = generate_df(spark, 6_000)
    index = build_index(spark, df, tmp_root, CFG)

    bad_path = _corrupt_one_block(tmp_root)

    # a scan that touches every block: match-all token absent -> use the
    # needle that hits ~1/101 rows in all partitions, forcing broad reads
    q = new_query().token("needle_alpha").build()

    # session default (no verification): the scan silently succeeds
    got = search(spark, index, q).count()
    assert got > 0

    # verification on: the scan fails fast on the corrupted page
    enable_read_checksum_verification(spark)
    try:
        with pytest.raises(Exception):
            # read the corrupted block directly through Spark to avoid
            # depending on which blocks the bloom probe prunes
            spark.read.parquet(bad_path.rsplit("/", 1)[0]).agg(
                F.count("content")
            ).collect()
    finally:
        enable_read_checksum_verification(spark, enabled=False)

    # merge consolidation reads ALWAYS verify: fs.read_parquet_dir raises
    with pytest.raises(Exception, match="CRC|checksum|integrity"):
        fsx.read_parquet_dir(bad_path.rsplit("/", 1)[0])


def test_clean_index_reads_fine_with_verification(spark, tmp_root):
    df = generate_df(spark, 3_000)
    index = build_index(spark, df, tmp_root, CFG)
    enable_read_checksum_verification(spark)
    try:
        q = new_query().token("needle_alpha").build()
        assert search(spark, index, q).count() > 0
    finally:
        enable_read_checksum_verification(spark, enabled=False)
