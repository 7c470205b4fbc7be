"""Shared harness emulating the driver's correctness gate at any SF:
run a __spark_entry__ queries() entry and compare row count + schema +
order-insensitive values against its DuckDB oracle over the same parquet."""

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(6)
        pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def check_against_oracle(spark, duck, name: str, sf_dir: str) -> None:
    import __spark_entry__ as entrymod

    got = entrymod.queries()[name](spark, sf_dir).toPandas()
    exp = duck.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    g, e = normalize(got), normalize(exp)
    eq = (g.values == e.values).all()
    assert eq, f"{name}: value mismatch\nspark:\n{g.head()}\noracle:\n{e.head()}"
