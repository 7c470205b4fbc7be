"""Schemaless JSON-document ingest path — replicates the reference's
golden e2e hit/miss cases (bloom_tree_engine_test.go:469-639, log rows
:503-506) and the array "information loss" semantics
(tokenizer_test.go:238-277) through the full build->prune->verify
pipeline with ``json_col``."""

import json

import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import (
    And,
    Field,
    FieldToken,
    IndexConfig,
    Or,
    Token,
    build_index,
    new_query,
    search,
)

# the reference's log-document corpus (bloom_tree_engine_test.go:503-506)
DOCS = [
    {"id": 1.0, "name": "Alice", "level": "error", "service": "auth"},
    {"id": 2.0, "name": "Bob", "level": "info", "service": "payment"},
    {"id": 3.0, "name": "Charlie", "level": "error", "service": "database"},
    {"id": 4.0, "name": "Diana", "level": "warn", "service": "cache"},
    {"id": 5.0, "name": "Eve", "level": "info", "service": "auth"},
    {"id": 6.0, "name": "Frank", "level": "debug", "service": "monitoring"},
    # nested + array docs (tokenizer_test.go information-loss cases)
    {
        "id": 7.0,
        "user": {"tags": [{"type": "user"}, {"role": "admin"}]},
        "items": [{"name": "item1", "category": "books"}, {"name": "item2"}],
    },
    {"id": 8.0, "msg": "Hello World from Spark"},
]

CFG = IndexConfig(
    json_col="doc",
    partition_expr="''",
    minmax_fields=("id",),
    max_block_rows=4,
    blocks_per_file=2,
    block_fpr=0.01,
    file_fpr=0.01,
    file_expected_items=1_000,
    sha_col="doc",
)


@pytest.fixture(scope="module")
def jindex(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("jidx"))
    df = spark.createDataFrame([(json.dumps(d),) for d in DOCS], "doc string")
    return build_index(spark, df, root, CFG)


def _ids(spark, idx, q) -> set:
    rows = search(spark, idx, q).collect()
    return {json.loads(r.doc)["id"] for r in rows}


def test_field_exists_golden(spark, jindex):
    # Field("level") -> all log rows (bloom_tree_engine_test.go:533-539)
    assert _ids(spark, jindex, new_query().field("level").build()) == {1, 2, 3, 4, 5, 6}
    # Field("nonexistent") -> nothing (:552-556)
    assert _ids(spark, jindex, new_query().field("nonexistent").build()) == set()


def test_token_lowercased_golden(spark, jindex):
    # Token("alice") matches stored "Alice" (:540-543)
    assert _ids(spark, jindex, new_query().token("alice").build()) == {1}
    # engine does not normalize query tokens: "Alice" misses
    assert _ids(spark, jindex, new_query().token("Alice").build()) == set()


def test_field_token_golden(spark, jindex):
    assert _ids(spark, jindex, new_query().field_token("level", "error").build()) == {1, 3}
    assert _ids(spark, jindex, new_query().field_token("service", "auth").build()) == {1, 5}
    # right token under the wrong field misses
    assert _ids(spark, jindex, new_query().field_token("level", "auth").build()) == set()


def test_nested_paths_and_array_index_loss(spark, jindex):
    # array indices are dropped from paths: user.tags.type / user.tags.role
    assert _ids(spark, jindex, new_query().field("user.tags.type").build()) == {7}
    assert _ids(spark, jindex, new_query().field("user.tags.role").build()) == {7}
    # the documented information loss (tokenizer_test.go:238-277): item1 and
    # books come from DIFFERENT array elements yet both match doc 7
    assert _ids(spark, jindex, new_query().field_token("items.name", "item1").build()) == {7}
    assert _ids(spark, jindex, new_query().field_token("items.category", "books").build()) == {7}
    assert _ids(
        spark,
        jindex,
        new_query()
        .match(And(FieldToken("items.name", "item1"), FieldToken("items.category", "books")))
        .build(),
    ) == {7}


def test_value_tokenization_multiword(spark, jindex):
    # "Hello World from Spark" -> whitespace tokens, lowercased
    assert _ids(spark, jindex, new_query().token("world").build()) == {8}
    assert _ids(spark, jindex, new_query().field_token("msg", "spark").build()) == {8}


def test_number_formatting_go_style(spark, jindex):
    # ids are JSON floats; Go %v renders 3.0 as "3" (tokenizer_test.go "30")
    assert _ids(spark, jindex, new_query().field_token("id", "3").build()) == {3}
    assert _ids(spark, jindex, new_query().field_token("id", "3.0").build()) == set()


def test_or_tree_and_regex(spark, jindex):
    got = _ids(
        spark,
        jindex,
        new_query().match(Or(Token("alice"), Token("bob"))).build(),
    )
    assert got == {1, 2}
    got2 = _ids(
        spark, jindex, new_query().field_regex("name", "^(Alice|Eve)$").build()
    )
    assert got2 == {1, 5}


def test_minmax_prefilter_on_json_field(spark, jindex):
    from bloomsearch_spark import Gte, MinMax

    q = new_query().match_prefilter(MinMax("id", Gte(7))).build()
    # block-granular: blocks holding ids 7-8 survive; exact rows still all
    # verified -> only rows the blocks contain
    got = _ids(spark, jindex, q)
    assert got <= {5, 6, 7, 8} and {7, 8} <= got
