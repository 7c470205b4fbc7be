"""Index health metrics — the observability surface the reference lacks.

SURVEY.md §7.3: file blooms are sized for ``file_expected_items``; if a
file accumulates more distinct tokens the real FPR degrades *silently* in
the reference.  ``index_metrics`` surfaces bloom fill ratios (fraction of
set bits; FPR ≈ fill^k) plus block-size distribution and lineage counters
so operators can see when to re-size or compact.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from .. import bloom
from ..sources.manifest import BloomIndex

_FILL_SCHEMA = T.StructType(
    [
        T.StructField("field_fill", T.DoubleType()),
        T.StructField("token_fill", T.DoubleType()),
        T.StructField("fieldtoken_fill", T.DoubleType()),
    ]
)


@F.pandas_udf(_FILL_SCHEMA)
def _fills(field_bloom: pd.Series, token_bloom: pd.Series, ft_bloom: pd.Series) -> pd.DataFrame:
    import numpy as np

    def f(s):
        return s.map(
            lambda b: float("nan")
            if b is None
            else bloom.fill_ratio(np.frombuffer(b, dtype=np.uint8))
        )

    return pd.DataFrame(
        {"field_fill": f(field_bloom), "token_fill": f(token_bloom),
         "fieldtoken_fill": f(ft_bloom)}
    )


def bloom_health(manifest: DataFrame) -> DataFrame:
    """Per-row (block or file manifest) bloom fill ratios and the implied
    empirical FPR estimate fill^k for each of the three filters."""
    out = manifest.withColumn(
        "_fills", _fills("field_bloom", "token_bloom", "fieldtoken_bloom")
    ).select(
        "*",
        F.col("_fills.field_fill").alias("field_fill"),
        F.col("_fills.token_fill").alias("token_fill"),
        F.col("_fills.fieldtoken_fill").alias("fieldtoken_fill"),
    ).drop("_fills")
    # k from (n, p): ceil((m/n) ln 2) with m = ceil(-n ln p / ln^2 2)
    k = F.ceil(
        F.ceil(-F.col("expected_items") * F.log("fpr") / (math.log(2) ** 2))
        / F.col("expected_items")
        * math.log(2)
    )
    for c in ("field", "token", "fieldtoken"):
        out = out.withColumn(f"{c}_est_fpr", F.pow(F.col(f"{c}_fill"), k))
    return out


def index_metrics(index: BloomIndex) -> dict:
    """One summary dict: counts, block-size distribution, worst fill
    ratios / implied FPR at both hierarchy levels, lineage op counters."""
    blocks = index.blocks()
    files = index.files()
    bh = bloom_health(files).agg(
        F.max("token_fill").alias("max_file_token_fill"),
        F.max("token_est_fpr").alias("max_file_token_est_fpr"),
    ).collect()[0]
    bb = bloom_health(blocks).agg(
        F.max("token_fill").alias("max_block_token_fill"),
        F.max("token_est_fpr").alias("max_block_token_est_fpr"),
    ).collect()[0]
    sizes = blocks.agg(
        F.count("*").alias("blocks"),
        F.sum("row_count").alias("rows"),
        F.sum("token_count").alias("tokens_inserted"),
        F.min("row_count").alias("min_block_rows"),
        F.expr("percentile_approx(row_count, 0.5)").alias("median_block_rows"),
        F.max("row_count").alias("max_block_rows"),
        F.sum("byte_size").alias("data_bytes"),
    ).collect()[0]
    ops = {
        r.op: r.cnt
        for r in index.lineage().groupBy("op").agg(F.count("*").alias("cnt")).collect()
    }
    return {
        "version": index.version,
        "files": files.count(),
        **sizes.asDict(),
        **bh.asDict(),
        **bb.asDict(),
        "lineage_ops": ops,
    }
