"""Hidden partitioning (partition.py): Iceberg-style declared transforms.

- the python value twin must render EXACTLY like the write-side Catalyst
  expression for every supported type (soundness of derived pruning);
- the DataSource harvests WHERE equality/IN on the transform SOURCE
  column into partition prefilters (fewer planned partitions, still
  row-exact);
- the library path prunes via explicit Partition prefilters built with
  the partition_value helper;
- config refusals (transform + explicit partition_expr, malformed specs).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from bloomsearch_spark import (
    Eq,
    IndexConfig,
    Partition,
    build_index,
    new_query,
    partition_value,
    search,
)
from bloomsearch_spark.partition import parse_transform, transform_sql, transform_value
from bloomsearch_spark.sources.manifest import BloomIndex
from bloomsearch_spark.sources.synthetic import generate_df


def test_transform_twins_match_catalyst(spark):
    """transform_value == the Catalyst rendering for every supported
    literal type; unsupported types return None (skip pruning, stay
    exact)."""
    cases = [
        ("identity:c", "string", ["abc", "X y", ""]),
        ("identity:c", "long", [7, -3, 0]),
        ("identity:c", "boolean", [True, False]),
        ("bucket:16:c", "string", ["abc", "repo/name", "x" * 50]),
        ("bucket:16:c", "long", [7, -7, 2**40]),
        ("truncate:3:c", "string", ["abcdef", "ab"]),
        ("truncate:3:c", "long", [12345]),
        ("days:c", "date", [datetime.date(2026, 8, 18)]),
        ("days:c", "timestamp", [datetime.datetime(2026, 8, 18, 23, 59, 59)]),
        ("hours:c", "timestamp", [datetime.datetime(2026, 1, 2, 3, 4, 5)]),
        ("months:c", "date", [datetime.date(1999, 12, 31)]),
        ("years:c", "date", [datetime.date(2000, 1, 1)]),
        # pre-1000 years: Catalyst date_format zero-pads ('0999') where
        # strftime('%Y') does not — the twin must pad (ADVICE r06)
        ("years:c", "date", [datetime.date(999, 3, 7)]),
        ("days:c", "date", [datetime.date(7, 1, 2)]),
        ("hours:c", "timestamp", [datetime.datetime(999, 6, 5, 4, 3, 2)]),
    ]
    for spec, typ, vals in cases:
        for v in vals:
            py = transform_value(spec, v)
            assert py is not None, (spec, v)
            df = spark.createDataFrame([(v,)], f"c {typ}")
            got = df.selectExpr(transform_sql(spec) + " as r").first()[0]
            assert got == py, (spec, v, got, py)
    # unsupported types refuse to derive (floats, tz-aware instants, None)
    assert transform_value("bucket:8:c", 1.5) is None
    assert transform_value("identity:c", None) is None
    assert transform_value(
        "days:c", datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    ) is None


def test_config_derives_expr_and_refusals():
    cfg = IndexConfig(indexed_fields=("repo",), partition_transform="bucket:8:repo")
    assert cfg.partition_expr == "cast(pmod(crc32(cast(`repo` as string)), 8) as string)"
    rt = IndexConfig.from_dict(cfg.to_dict())  # manifest round-trip
    assert rt.partition_transform == "bucket:8:repo"
    assert rt.partition_expr == cfg.partition_expr
    with pytest.raises(ValueError, match="set one or the other"):
        IndexConfig(partition_transform="bucket:8:repo", partition_expr="lang")
    with pytest.raises(ValueError, match="malformed partition_transform"):
        IndexConfig(partition_transform="weeks:repo")
    with pytest.raises(ValueError, match="param must be > 0"):
        parse_transform("bucket:0:repo")


def test_bucket_hidden_pruning_datasource(spark, tmp_root):
    """WHERE repo = <val> through the DataSource prunes to the value's
    bucket without the query naming a partition — and stays row-exact."""
    from pyspark.sql.datasource import EqualTo, In

    from bloomsearch_spark.sources.datasource import (
        BloomSearchDataSource,
        BloomSearchReader,
    )

    df = generate_df(spark, 600)
    cfg = IndexConfig(
        indexed_fields=("repo", "path", "content"),
        partition_transform="bucket:8:repo",
        max_block_rows=50,
        blocks_per_file=4,
    )
    build_index(spark, df, tmp_root, cfg)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(BloomSearchDataSource)

    repo = df.select("repo").first()[0]
    schema = (
        spark.read.format("bloomsearch").option("root", tmp_root).load().schema
    )
    r_all = BloomSearchReader({"root": tmp_root}, schema)
    n_all = len(r_all.partitions())
    r_eq = BloomSearchReader({"root": tmp_root}, schema)
    list(r_eq.pushFilters([EqualTo(("repo",), repo)]))
    n_eq = len(r_eq.partitions())
    assert 0 < n_eq < n_all  # pruned to ~one bucket
    # IN over two repos prunes to at most two buckets' worth
    repos = [r.repo for r in df.select("repo").distinct().limit(2).collect()]
    r_in = BloomSearchReader({"root": tmp_root}, schema)
    list(r_in.pushFilters([In(("repo",), tuple(repos))]))
    assert n_eq <= len(r_in.partitions()) < n_all
    # a float literal is NOT derivable into a partition id (Catalyst float
    # rendering can diverge): the PARTITION harvest yields nothing for it
    # (the separate bloom harvest may still prune, soundly)
    assert r_all._prefilter_of(EqualTo(("repo",), 1.5)) is None

    got = (
        spark.read.format("bloomsearch").option("root", tmp_root).load()
        .filter(F.col("repo") == repo)
    )
    assert sorted(r.path for r in got.collect()) == sorted(
        r.path for r in df.filter(F.col("repo") == repo).collect()
    )


def test_days_transform_library_prune(spark, tmp_root):
    """days(<date col>) layout: an explicit Partition prefilter built with
    partition_value prunes blocks and returns exactly that day's rows."""
    from bloomsearch_spark.plans.search import QueryStats

    df = generate_df(spark, 500).withColumn(
        "day", F.expr("date_add(date'2026-01-01', cast(pmod(crc32(path), 7) as int))")
    )
    cfg = IndexConfig(
        indexed_fields=("repo", "path", "content"),
        partition_transform="days:day",
        max_block_rows=50,
        blocks_per_file=4,
    )
    build_index(spark, df, tmp_root, cfg)
    idx = BloomIndex.load(spark, tmp_root)
    pids = {r.partition_id for r in idx.blocks().select("partition_id").distinct().collect()}
    assert pids == {f"2026-01-0{d}" for d in range(1, 8)}

    day = datetime.date(2026, 1, 3)
    pid = partition_value(cfg, day)
    assert pid == "2026-01-03"
    q = new_query().match_prefilter(Partition(Eq(pid))).build()
    res, stats = search(spark, idx, q, with_stats=True)
    rows = res.collect()
    exp = df.filter(F.col("day") == F.lit(day)).collect()
    assert sorted(r.path for r in rows) == sorted(r.path for r in exp)
    stats.finish()
    assert 0 < stats.blocks_after_prefilter < stats.total_blocks
    # no transform declared -> helper returns None (no silent wrong ids)
    assert partition_value(IndexConfig(indexed_fields=("repo",)), day) is None


def test_time_range_pruning_datasource(spark, tmp_root):
    """Range predicates on a days(col) layout prune partitions through the
    order-preserving rendering (lexicographic == chronological) — and the
    result stays row-exact.  Bucket transforms must NOT range-prune."""
    import datetime

    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from bloomsearch_spark.partition import transform_range_value
    from bloomsearch_spark.sources.datasource import (
        BloomSearchDataSource,
        BloomSearchReader,
    )

    df = generate_df(spark, 500).withColumn(
        "day", F.expr("date_add(date'2026-01-01', cast(pmod(crc32(path), 7) as int))")
    )
    cfg = IndexConfig(
        indexed_fields=("repo", "path", "content"),
        partition_transform="days:day",
        max_block_rows=50,
        blocks_per_file=4,
    )
    build_index(spark, df, tmp_root, cfg)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(BloomSearchDataSource)
    schema = spark.read.format("bloomsearch").option("root", tmp_root).load().schema

    lo, hi = datetime.date(2026, 1, 3), datetime.date(2026, 1, 5)
    r_all = BloomSearchReader({"root": tmp_root}, schema)
    n_all = len(r_all.partitions())
    r_rng = BloomSearchReader({"root": tmp_root}, schema)
    list(r_rng.pushFilters([
        GreaterThanOrEqual(("day",), lo), LessThan(("day",), hi)
    ]))
    assert 0 < len(r_rng.partitions()) < n_all

    got = (
        spark.read.format("bloomsearch").option("root", tmp_root).load()
        .filter((F.col("day") >= F.lit(lo)) & (F.col("day") < F.lit(hi)))
    )
    exp = df.filter((F.col("day") >= F.lit(lo)) & (F.col("day") < F.lit(hi)))
    assert sorted(r.path for r in got.collect()) == sorted(
        r.path for r in exp.collect()
    )
    # order-preservation contract: bucket / numeric renderings refuse
    assert transform_range_value("bucket:8:c", "x") is None
    assert transform_range_value("identity:c", 10) is None
    assert transform_range_value("truncate:3:c", 10) is None
    assert transform_range_value("identity:c", "abc") == "abc"
    assert transform_range_value("days:c", lo) == "2026-01-03"


def test_hidden_partition_interactions(spark, tmp_root, tmp_path):
    """Transform-partitioned indexes compose with the other surfaces:
    partition_stats shows the derived ids, delete_where works (and the
    transform config survives the maintenance commit), the changefeed
    replays the build exactly."""
    from bloomsearch_spark import delete_where, partition_stats
    from bloomsearch_spark.sources.datasource import BloomSearchDataSource
    from bloomsearch_spark.sources.manifest import BloomIndex

    df = generate_df(spark, 400)
    cfg = IndexConfig(
        indexed_fields=("repo", "path", "content"),
        partition_transform="bucket:8:repo",
        max_block_rows=50,
        blocks_per_file=4,
    )
    build_index(spark, df, tmp_root, cfg)
    idx = BloomIndex.load(spark, tmp_root)

    # SHOW PARTITIONS over the derived layout: ids are bucket numbers,
    # per-bucket counts match the transform recomputed in SQL
    stats = {r.partition_id: r.n_rows for r in partition_stats(idx).collect()}
    exp = {
        str(r.cell): r.n
        for r in df.selectExpr(
            "pmod(crc32(cast(repo as string)), 8) as cell"
        ).groupBy("cell").count().withColumnRenamed("count", "n").collect()
    }
    assert stats == exp

    # changefeed replay of the BUILD commit is exact over the bucket layout
    spark.dataSource.register(BloomSearchDataSource)
    q = (
        spark.readStream.format("bloomsearch").option("root", tmp_root)
        .option("starting_version", 0).load()
        .writeStream.format("memory").queryName("hp_feed")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None
        got = {r.path for r in spark.table("hp_feed").collect()}
        assert got == {r.path for r in df.collect()}
    finally:
        q.stop()

    # row-level delete over the transform layout; config carries
    repo = df.select("repo").first()[0]
    idx2, st = delete_where(
        spark, idx, new_query().field_token("repo", repo.lower()).build()
    )
    assert idx2.config.partition_transform == "bucket:8:repo"
