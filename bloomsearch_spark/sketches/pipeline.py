"""Shared Spark pipeline for mergeable sketches.

The same two-stage shape as the bloom index build (plans/build.py):

1. ``sketch_partials`` — ONE ``mapInPandas`` pass over the data; each task
   keeps a dict of per-group sketch states updated with whole-batch numpy
   kernels and emits one serialized partial per (task, group).  Map-side
   combine: ZERO data shuffle — only KB-scale sketch blobs leave the task.
2. ``sketch_merged`` — groupBy(group keys) over the manifest-sized partials,
   merging blobs with the sketch's associative merge.

Because stage 1's output is a plain DataFrame of (keys..., sketch binary),
partials can be WRITTEN TO PARQUET and merged later / elsewhere — that is
the checkpoint-resume contract: a re-run merges persisted partials with
fresh ones and (for max-merge sketches) even double-merging is harmless.
"""

from __future__ import annotations

from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _schema_of(df: DataFrame, cols: Sequence[str]) -> list[str]:
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return [f"{c} {by_name[c]}" for c in cols]


def sketch_partials(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str],
    make_state: Callable[[], object],
) -> DataFrame:
    """One serialized sketch partial per (task, group).

    ``make_state()`` objects must expose ``add_values(ndarray)`` and
    ``to_bytes()``.
    """
    keys = list(key_cols)
    out_schema = ", ".join(_schema_of(df, keys) + ["sketch binary"])
    empty = pd.DataFrame(columns=[*keys, "sketch"])

    def fn(batches):
        states: dict[tuple, object] = {}
        for pdf in batches:
            if keys:
                for kt, grp in pdf.groupby(keys, dropna=False, sort=False):
                    kt = kt if isinstance(kt, tuple) else (kt,)
                    st = states.get(kt)
                    if st is None:
                        st = states[kt] = make_state()
                    st.add_values(grp[value_col].dropna().to_numpy())
            else:
                st = states.get(())
                if st is None:
                    st = states[()] = make_state()
                st.add_values(pdf[value_col].dropna().to_numpy())
        if not states:
            yield empty
            return
        yield pd.DataFrame(
            [
                {**dict(zip(keys, kt)), "sketch": st.to_bytes()}
                for kt, st in states.items()
            ],
            columns=[*keys, "sketch"],
        )

    return df.select(*keys, value_col).mapInPandas(fn, out_schema)


def sketch_merged(
    partials: DataFrame,
    key_cols: Sequence[str],
    merge_serialized: Callable[[list], bytes],
) -> DataFrame:
    """Merge partials down to one sketch per group (associative blob merge;
    input may mix fresh and checkpoint-loaded partials)."""
    keys = list(key_cols)
    out_schema = ", ".join(_schema_of(partials, keys) + ["sketch binary"])

    def fn(kt, pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.iloc[:1][[*keys]].copy() if keys else pd.DataFrame(index=[0])
        out["sketch"] = [merge_serialized(list(pdf["sketch"]))]
        return out

    if keys:
        return partials.groupBy(*keys).applyInPandas(fn, out_schema)
    return (
        partials.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda kt, pdf: fn((), pdf.drop(columns=["_g"])), "sketch binary")
    )


def estimate_col(sketch_col, estimator: Callable[[bytes], float]):
    """double-valued Column: ``estimator`` applied to each sketch blob."""

    @F.pandas_udf("double")
    def est(blobs: pd.Series) -> pd.Series:
        return blobs.map(estimator)

    return est(sketch_col)


def fold_serialized(cls):
    """Generic blob fold for any sketch class exposing ``from_bytes`` /
    ``merge`` / ``to_bytes`` — the one merge_serialized shared by all four
    sketch modules (each previously carried its own copy)."""

    def merge(blobs) -> bytes:
        it = iter(blobs)
        acc = cls.from_bytes(next(it))
        for b in it:
            acc.merge(cls.from_bytes(b))
        return acc.to_bytes()

    return merge


def sketch_group_quantiles(merged: DataFrame, key_cols, qs, from_bytes) -> DataFrame:
    """Per-group quantile extraction shared by the quantile sketches
    (t-digest, KLL): (keys..., q double, value double), one row per
    (group, q).  ``merged`` is a (keys..., sketch binary) frame from
    ``sketch_merged``; extraction is one tiny UDF over manifest-sized
    blobs."""
    qs = [float(q) for q in qs]

    @F.pandas_udf("array<double>")
    def extract(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: [from_bytes(b).quantile(q) for q in qs])

    out = merged.select(*key_cols, extract("sketch").alias("vals"))
    pairs = F.arrays_zip(
        F.array(*[F.lit(q) for q in qs]).alias("q"), F.col("vals").alias("value")
    )
    return out.select(*key_cols, F.explode(pairs).alias("p")).select(
        *key_cols, F.col("p.q").alias("q"), F.col("p.value").alias("value")
    )
