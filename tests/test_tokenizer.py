"""Tokenizer + field-extraction golden cases, mirroring the reference's
tokenizer_test.go semantics exactly (FIXTURES.md F4/F5)."""

import numpy as np
import pandas as pd
import pytest

from bloomsearch_spark import tokenizer as tk


# --- F5: BasicWhitespaceLowerTokenizer golden cases (tokenizer_test.go:99-173)

@pytest.mark.parametrize(
    "value,expected",
    [
        ("hello world 123", ["hello", "world", "123"]),
        ("hello@world.com!test", ["hello@world.com!test"]),  # punctuation kept
        ("hello-world_test", ["hello-world_test"]),
        ("Hello WORLD", ["hello", "world"]),
        ("  multiple   spaces\t\ttabs\nnewlines  ", ["multiple", "spaces", "tabs", "newlines"]),
        ("", []),
        (42.0, ["42"]),  # Go %v: float64(42) -> "42"
        (3.14, ["3.14"]),
        (True, ["true"]),
        (False, ["false"]),
        ("🚀 emoji test", ["🚀", "emoji", "test"]),
    ],
)
def test_tokenize_value_golden(value, expected):
    assert tk.tokenize_value(value) == expected


def test_tokenize_series_matches_scalar_path():
    s = pd.Series(["Hello World", "a@b!c", None, "", "MiXeD  Case"])
    got = tk.tokenize_series(s).tolist()
    assert got == [["hello", "world"], ["a@b!c"], [], [], ["mixed", "case"]]


def test_stringify_series_go_percent_v():
    assert tk.stringify_series(pd.Series([30.0, 3.5, None])).tolist() == ["30", "3.5", ""]
    assert tk.stringify_series(pd.Series([1, 2])).tolist() == ["1", "2"]
    assert tk.stringify_series(pd.Series([True, False])).tolist() == ["true", "false"]


def test_explode_tokens():
    s = pd.Series(["a b", "", None, "C"])
    rows, toks = tk.explode_tokens(s)
    assert rows.tolist() == [0, 0, 3]
    assert toks.tolist() == ["a", "b", "c"]


# --- F4: UniqueFields nested flattening (tokenizer_test.go:10-97)

def test_unique_fields_nested():
    doc = {"user": {"name": "John Doe", "role": "admin"}}
    assert tk.unique_fields(doc) == {"user.name": ["John Doe"], "user.role": ["admin"]}


def test_unique_fields_array_indices_dropped():
    doc = {"items": [{"name": "Item1", "category": "electronics"},
                     {"name": "Item2", "category": "books"}]}
    got = tk.unique_fields(doc)
    assert got == {"items.name": ["Item1", "Item2"],
                   "items.category": ["electronics", "books"]}


def test_unique_fields_dedup_per_row():
    doc = {"tags": ["admin", "user", "admin"]}
    assert tk.unique_fields(doc) == {"tags": ["admin", "user"]}


def test_unique_fields_deep_nested_arrays():
    doc = {"groups": [{"users": [{"name": "John"}, {"name": "Jane"}]},
                      {"users": [{"name": "Bob"}]}]}
    assert tk.unique_fields(doc) == {"groups.users.name": ["John", "Jane", "Bob"]}


def test_unique_fields_empty_object():
    assert tk.unique_fields({}) == {}


def test_doc_index_entries_three_domains():
    doc = {"records": [{"id": 1, "active": True}, {"id": 2, "active": False}]}
    fields, tokens, pairs = tk.doc_index_entries(doc)
    assert sorted(fields) == ["records.active", "records.id"]
    assert tokens == ["1", "2", "false", "true"]
    assert "records.id::1" in pairs and "records.active::true" in pairs


# --- exact-verify walkers (tokenizer_test.go:175-277)

DOC = {"items": [{"name": "Item1", "category": "electronics"},
                 {"name": "Item2", "category": "books"}],
       "user": {"name": "John Doe"}}


def test_doc_has_field():
    assert tk.doc_has_field(DOC, "items.name")
    assert tk.doc_has_field(DOC, "user.name")
    assert not tk.doc_has_field(DOC, "user.email")
    assert not tk.doc_has_field(DOC, "items.name.deep")


def test_doc_has_token():
    assert tk.doc_has_token(DOC, "item1")
    assert tk.doc_has_token(DOC, "john")  # "John Doe" -> ["john","doe"]
    assert not tk.doc_has_token(DOC, "John")  # query tokens are lowercase
    assert not tk.doc_has_token(DOC, "zzz")


def test_doc_has_field_token_information_loss():
    # array flattening loses element pairing: both match (tokenizer_test.go:238-277)
    assert tk.doc_has_field_token(DOC, "items.name", "item1")
    assert tk.doc_has_field_token(DOC, "items.category", "books")
    assert tk.doc_has_field_token(DOC, "items.name", "item2")
    assert not tk.doc_has_field_token(DOC, "items.name", "books")


def test_doc_has_field_token_numbers_and_bools():
    doc = {"records": [{"id": 1, "active": True}, {"id": 2, "active": False}]}
    assert tk.doc_has_field_token(doc, "records.id", "1")
    assert tk.doc_has_field_token(doc, "records.active", "true")
    assert not tk.doc_has_field_token(doc, "records.id", "3")


def test_doc_field_values_for_regex():
    vals = tk.doc_field_values(DOC, "items.category")
    assert vals == ["electronics", "books"]


# --- pluggable tokenizer (the reference's ValueTokenizerFunc injection
#     point, tokenizer.go:86-99) — golden cases for the built-in
#     code-identifier tokenizer across all three faces, mirroring the
#     tokenizer_test.go:99-173 golden-table style


CODE_GOLDEN = [
    ("hello world 123", ["hello", "world", "123"]),
    ("hello@world.com!test", ["hello", "world", "com", "test"]),
    ("hello-world_test", ["hello", "world_test"]),
    ("parseHTTPBody", ["parse", "http", "body"]),  # camel boundary split
    ("Foo::barBaz.qux", ["foo", "bar", "baz", "qux"]),
    ("snake_case stays", ["snake_case", "stays"]),
    ("", []),
    (42.0, ["42"]),
    (True, ["true"]),
]


@pytest.mark.parametrize("value,expected", CODE_GOLDEN)
def test_code_tokenizer_value_fn(value, expected):
    assert tk.CODE_IDENTIFIERS.value_fn(value) == expected


def test_code_tokenizer_arrow_face_matches_value_fn():
    vals = [v for v, _ in CODE_GOLDEN if isinstance(v, str)]
    uniq = set(tk.CODE_IDENTIFIERS.arrow_unique(pd.Series(vals)))
    expect = set()
    for v in vals:
        expect.update(tk.CODE_IDENTIFIERS.value_fn(v))
    assert uniq == expect


def test_code_tokenizer_sql_face_matches_value_fn(spark):
    from pyspark.sql import functions as F

    vals = [v for v, _ in CODE_GOLDEN if isinstance(v, str) and v]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r.s: list(r.toks)
        for r in df.select(
            "s", tk.CODE_IDENTIFIERS.sql_tokens(F.col("s")).alias("toks")
        ).collect()
    }
    for v in vals:
        assert got[v] == tk.CODE_IDENTIFIERS.value_fn(v), v


def test_unregistered_tokenizer_rejected():
    from bloomsearch_spark import IndexConfig

    with pytest.raises(KeyError, match="not registered"):
        IndexConfig(indexed_fields=("x",), tokenizer="no_such_tokenizer")


def test_custom_registered_tokenizer_roundtrip():
    """A user-registered python-only tokenizer (no fast faces) validates in
    IndexConfig and survives the meta dict round-trip by name."""
    from bloomsearch_spark import IndexConfig, register_tokenizer

    register_tokenizer(
        tk.Tokenizer(name="csv_fields", value_fn=lambda v: [
            t for t in tk.go_format_value(v).lower().split(",") if t
        ])
    )
    cfg = IndexConfig(indexed_fields=("x",), tokenizer="csv_fields")
    assert IndexConfig.from_dict(cfg.to_dict()).tokenizer == "csv_fields"


def test_go_float_formatting_reference_exact():
    """r03 review fix: Go fmt %v == strconv 'g' shortest — scientific iff
    decimal exponent < -4 or >= 6; the old %g truncated to 6 significant
    digits and str(int(...)) silently wrapped int64 at 2^63."""
    import pandas as pd

    from bloomsearch_spark.tokenizer import _go_float_str, stringify_series

    cases = [
        (30.0, "30"), (100000.0, "100000"), (999999.0, "999999"),
        (1000000.0, "1e+06"), (1234567.0, "1.234567e+06"),
        (12345678.0, "1.2345678e+07"), (3.14159265, "3.14159265"),
        (1e19, "1e+19"), (0.0001, "0.0001"), (0.00001, "1e-05"),
        (-42.5, "-42.5"), (0.0, "0"), (1.5e300, "1.5e+300"),
        (float("inf"), "+Inf"), (float("-inf"), "-Inf"),
    ]
    for v, want in cases:
        assert _go_float_str(v) == want, (v, want, _go_float_str(v))
    assert _go_float_str(-0.0) == "-0"
    assert _go_float_str(float("nan")) == "NaN"
    # the vectorized face agrees, including int64-overflow magnitudes
    s = pd.Series([1e19, 30.0, 1234567.0, None, 0.5])
    assert stringify_series(s).tolist() == ["1e+19", "30", "1.234567e+06", "", "0.5"]


def test_unicode_whitespace_consistent_across_faces(spark):
    """r03 review fix: Java \\s is ASCII-only, so the SQL verify face
    needed (?U) to split NBSP like the python/Arrow build faces (and Go
    strings.Fields) — otherwise verify false-negatives rows the index
    correctly matched."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    from bloomsearch_spark.tokenizer import WHITESPACE_LOWER

    txt = "Hello World bar"
    py = sorted(WHITESPACE_LOWER.value_fn(txt))
    arrow = sorted(WHITESPACE_LOWER.arrow_unique(pa.array([txt])).tolist())
    df = spark.createDataFrame([(txt,)], "s string")
    sql = sorted(
        df.select(WHITESPACE_LOWER.sql_tokens(F.col("s")).alias("t")).collect()[0].t
    )
    assert py == arrow == sql == ["bar", "hello", "world"]


def test_nbsp_document_found_end_to_end(spark, tmp_path):
    from bloomsearch_spark import IndexConfig, build_index, new_query, search

    df = spark.createDataFrame(
        [("r1", "alpha needletok beta"), ("r2", "plain text")],
        "id string, content string",
    )
    cfg = IndexConfig(
        indexed_fields=("content",), partition_expr="'p'",
        max_block_rows=10, blocks_per_file=2, sha_col="content",
    )
    idx = build_index(spark, df, str(tmp_path / "idx"), cfg)
    got = search(spark, idx, new_query().token("needletok").build())
    assert [r.id for r in got.collect()] == ["r1"]
