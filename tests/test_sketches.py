"""Mergeable sketch library (north rule: HLL / count-min / t-digest / KLL /
Bloom as mergeable aggregations): published error bounds, merge algebra,
serialization round-trips, Spark two-stage pipeline, checkpoint-resume from
persisted partials."""

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomsearch_spark.sketches import HLL, KLL, CountMin, TDigest
from bloomsearch_spark.sketches.countmin import cms_sketch
from bloomsearch_spark.sketches.hll import approx_distinct, hll_merged, hll_partials
from bloomsearch_spark.sketches.kll import kll_sketch
from bloomsearch_spark.sketches.tdigest import td_sketch

RNG = np.random.RandomState(42)


# ---------------------------------------------------------------------------
# kernel properties
# ---------------------------------------------------------------------------


def _tokens(n, offset=0):
    return np.array([f"tok{i + offset}" for i in range(n)], dtype=object)


def test_hll_error_bound():
    """|est - n| within 4 sigma of the published 1.04/sqrt(m) RSE across
    three scales (deterministic hash -> this is a fixed property of the
    implementation, not a flaky statistical test)."""
    for n in (1_000, 20_000, 300_000):
        h = HLL(p=12)
        h.add_values(_tokens(n))
        assert abs(h.estimate() - n) <= 4 * h.rse * n, n


def test_hll_merge_algebra():
    """Merge is associative + commutative + idempotent BITWISE: shuffled
    partial merges and double-merges equal the single-shot registers."""
    vals = _tokens(50_000)
    single = HLL(12)
    single.add_values(vals)
    parts = []
    for chunk in np.array_split(vals, 13):
        p = HLL(12)
        p.add_values(chunk)
        parts.append(p)
    random.seed(7)
    random.shuffle(parts)
    acc = HLL(12)
    for p in parts:
        acc.merge(p)
    acc.merge(parts[3]).merge(parts[3])  # idempotent re-merge
    assert np.array_equal(acc.registers, single.registers)


def test_hll_param_mismatch_raises():
    with pytest.raises(ValueError, match="precision mismatch"):
        HLL(10).merge(HLL(12))


def test_cms_bounds_and_linearity():
    """Point estimates obey true <= est <= true + eps*N; merge is exact
    addition (merged table == single-shot table)."""
    words = np.concatenate(
        [np.repeat(f"w{i}", 1 + (i * 7) % 40) for i in range(500)]
    ).astype(object)
    single = CountMin(eps=0.005, delta=0.01)
    single.add_values(words)
    import collections

    true = collections.Counter(words.tolist())
    qs = np.array([f"w{i}" for i in range(100)], dtype=object)
    est = single.point(qs)
    for i in range(100):
        assert est[i] >= true[f"w{i}"]
        assert est[i] <= true[f"w{i}"] + single.eps * single.n_items
    parts = []
    for chunk in np.array_split(words, 9):
        c = CountMin(eps=0.005, delta=0.01)
        c.add_values(chunk)
        parts.append(c)
    acc = parts[0]
    for c in parts[1:]:
        acc.merge(c)
    assert np.array_equal(acc.table, single.table)
    assert acc.n_items == single.n_items


@pytest.mark.parametrize(
    "cls,kw,bound",
    [
        # t-digest: observed mid-range error ~1e-3 at delta=200; floor 0.01
        (TDigest, {"delta": 200.0}, 0.01),
        # KLL: published eps = O(1/k); floor at 3/k = 0.015 for k=200
        (KLL, {"k": 200}, 0.015),
    ],
)
def test_quantile_rank_error_bound(cls, kw, bound):
    """Rank error within the sketch's bound on a heavy-tailed distribution,
    single-shot AND under shuffled partial merges (the merge preserves the
    sketch guarantee even though it is not bitwise-associative)."""
    x = np.random.RandomState(97).lognormal(0.0, 2.0, 150_000)
    xs = np.sort(x)

    def rank_err(sk):
        errs = []
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            v = sk.quantile(q)
            errs.append(abs(np.searchsorted(xs, v) / len(xs) - q))
        return max(errs)

    single = cls(**kw)
    single.add_values(x)
    assert rank_err(single) <= bound

    parts = []
    for chunk in np.array_split(x, 11):
        s = cls(**kw)
        s.add_values(chunk)
        parts.append(s)
    random.seed(3)
    random.shuffle(parts)
    acc = parts[0]
    for s in parts[1:]:
        acc.merge(s)
    assert rank_err(acc) <= bound
    assert int(round(acc.n if isinstance(acc.n, float) else acc.n)) == len(x)


@pytest.mark.parametrize(
    "cls,kw",
    [
        (HLL, {"p": 12}),
        (CountMin, {"eps": 0.01, "delta": 0.05}),
        (TDigest, {"delta": 100.0}),
        (KLL, {"k": 64}),
    ],
)
def test_serialization_roundtrip(cls, kw):
    sk = cls(**kw)
    if cls in (HLL, CountMin):
        sk.add_values(_tokens(5_000))
    else:
        sk.add_values(RNG.normal(size=5_000))
    blob = sk.to_bytes()
    assert cls.from_bytes(blob).to_bytes() == blob


def test_deterministic_rebuild():
    """Same input -> bitwise-identical sketch bytes (resume safety: a
    retried stage reproduces the same partial)."""
    x = RNG.normal(size=20_000)
    toks = _tokens(10_000)
    for mk, data in ((lambda: HLL(12), toks), (lambda: CountMin(0.01, 0.01), toks),
                     (lambda: TDigest(200.0), x), (lambda: KLL(200), x)):
        a, b = mk(), mk()
        a.add_values(data)
        b.add_values(data)
        assert a.to_bytes() == b.to_bytes()


# ---------------------------------------------------------------------------
# Spark pipeline
# ---------------------------------------------------------------------------

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


@pytest.fixture(scope="module")
def doc_tokens(spark, docs):
    return docs.select(
        "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")


def test_spark_approx_distinct_per_group(spark, doc_tokens):
    est = {r.lang: r.estimate for r in approx_distinct(doc_tokens, "tok", ("lang",)).collect()}
    exact = {
        r.lang: r.n
        for r in doc_tokens.groupBy("lang")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    rse = 1.04 / (4096**0.5)
    assert set(est) == set(exact)
    for lang, n in exact.items():
        assert abs(est[lang] - n) <= 4 * rse * n, (lang, est[lang], n)


def test_spark_partials_checkpoint_resume(spark, doc_tokens, tmp_path):
    """Partials written to parquet and re-merged equal the direct merge
    BITWISE — the checkpoint-resume contract."""
    partials = hll_partials(doc_tokens, "tok", ("lang",), p=12)
    ckpt = str(tmp_path / "partials.parquet")
    partials.write.mode("overwrite").parquet(ckpt)
    direct = {r.lang: bytes(r.sketch) for r in hll_merged(partials, ("lang",)).collect()}
    resumed = {
        r.lang: bytes(r.sketch)
        for r in hll_merged(spark.read.parquet(ckpt), ("lang",)).collect()
    }
    assert direct == resumed


def test_spark_cms_token_counts(spark, doc_tokens):
    sk = cms_sketch(doc_tokens, "tok", eps=0.001, delta=0.01)
    exact = {
        r.tok: r.n
        for r in doc_tokens.groupBy("tok").agg(F.count("*").alias("n")).collect()
    }
    assert sk.n_items == sum(exact.values())
    toks = np.array(sorted(exact)[:200], dtype=object)
    est = sk.point(toks)
    for i, t in enumerate(toks):
        assert exact[t] <= est[i] <= exact[t] + sk.eps * sk.n_items


@pytest.mark.parametrize("build", [td_sketch, kll_sketch])
def test_spark_quantiles_lineitem(spark, build):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet").select("l_extendedprice")
    sk = build(li, "l_extendedprice")
    n = li.count()
    for q in (0.05, 0.5, 0.95):
        v = sk.quantile(q)
        rank = li.filter(F.col("l_extendedprice") <= v).count() / n
        assert abs(rank - q) <= 0.02, (q, v, rank)


def test_spark_group_quantiles(spark):
    """Per-group quantiles: each (group, q) estimate's exact rank within the
    sketch bound, for both t-digest and KLL."""
    from bloomsearch_spark.sketches.kll import kll_group_quantiles
    from bloomsearch_spark.sketches.tdigest import td_group_quantiles

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    )
    pdf = li.toPandas()
    qs = (0.1, 0.5, 0.9)
    for fn, bound in ((td_group_quantiles, 0.01), (kll_group_quantiles, 0.015)):
        got = fn(li, "l_extendedprice", ("l_returnflag",), qs).collect()
        assert len(got) == pdf["l_returnflag"].nunique() * len(qs)
        for r in got:
            vals = np.sort(
                pdf.loc[pdf["l_returnflag"] == r.l_returnflag, "l_extendedprice"].values
            )
            rank = np.searchsorted(vals, r.value) / len(vals)
            assert abs(rank - r.q) <= max(bound, 3.0 / len(vals)), r


# ---------------------------------------------------------------------------
# Bloom as a sketch-family UDAF (bloomsketch.py)
# ---------------------------------------------------------------------------


def test_bloom_sketch_guarantees():
    """No false negatives EVER; observed FP rate on absent probes within the
    realized-fill bound fill**k (4 sigma binomial slack); cardinality
    estimate within 5% (deterministic hashing => fixed property)."""
    from bloomsearch_spark.sketches import BloomSketch

    n = 20_000
    sk = BloomSketch(expected_items=1 << 15, fpr=0.01)
    present = _tokens(n)
    sk.add_values(present)
    assert sk.contains(present).all()  # bloom hard guarantee

    absent = _tokens(n, offset=10_000_000)
    fp = int(sk.contains(absent).sum())
    p = sk.fp_rate_bound()
    assert fp <= n * p + 4 * (n * p * (1 - p)) ** 0.5 + 1, (fp, p)
    assert abs(sk.approx_items() - n) <= 0.05 * n


def test_bloom_sketch_merge_algebra():
    """OR-merge is associative/commutative/idempotent BITWISE; param
    mismatch refuses (same rule as the index bitsets, M4)."""
    from bloomsearch_spark.sketches import BloomSketch

    vals = _tokens(30_000)
    single = BloomSketch(1 << 14, 0.01)
    single.add_values(vals)
    parts = []
    for chunk in np.array_split(vals, 11):
        p = BloomSketch(1 << 14, 0.01)
        p.add_values(chunk)
        parts.append(p)
    random.seed(3)
    random.shuffle(parts)
    acc = BloomSketch(1 << 14, 0.01)
    for p in parts:
        acc.merge(p)
    acc.merge(parts[5]).merge(parts[5])
    assert np.array_equal(acc.bitset, single.bitset)
    blob = acc.to_bytes()
    assert BloomSketch.from_bytes(blob).to_bytes() == blob
    with pytest.raises(ValueError, match="different params"):
        BloomSketch(1 << 14, 0.01).merge(BloomSketch(1 << 14, 0.02))


def test_spark_bloom_membership(spark, doc_tokens, tmp_path):
    """Spark pipeline: per-lang merged blooms admit every present token
    (no false negatives through the full partials->merge->probe path),
    bound the FP rate on guaranteed-absent probes, and partials persisted
    to parquet re-merge BITWISE identically (checkpoint-resume)."""
    from bloomsearch_spark.sketches.bloomsketch import (
        bloom_contains,
        bloom_merged,
        bloom_partials,
    )

    toks = doc_tokens.distinct()
    partials = bloom_partials(toks, "tok", ("lang",), expected_items=1 << 14, fpr=0.01)
    ckpt = str(tmp_path / "bloom_partials.parquet")
    partials.write.mode("overwrite").parquet(ckpt)
    merged = bloom_merged(spark.read.parquet(ckpt), ("lang",))
    direct = {r.lang: bytes(r.sketch) for r in bloom_merged(partials, ("lang",)).collect()}
    resumed = {r.lang: bytes(r.sketch) for r in merged.collect()}
    assert direct == resumed

    present = bloom_contains(toks, "tok", merged, ("lang",))
    n_present, n_hit = present.agg(
        F.count("*"), F.sum(F.col("maybe_present").cast("long"))
    ).first()
    assert n_present > 0 and n_hit == n_present  # zero false negatives

    # guaranteed-absent probes: suffix every token, anti-join the real set
    absent = (
        toks.select("lang", F.concat("tok", F.lit("#zz_absent")).alias("tok"))
        .join(toks, ["lang", "tok"], "left_anti")
    )
    probed = bloom_contains(absent, "tok", merged, ("lang",))
    n_abs, n_fp = probed.agg(
        F.count("*"), F.sum(F.col("maybe_present").cast("long"))
    ).first()
    from bloomsearch_spark.sketches import BloomSketch

    p = max(BloomSketch.from_bytes(b).fp_rate_bound() for b in resumed.values())
    assert n_fp <= n_abs * p + 4 * (n_abs * p * (1 - p)) ** 0.5 + 1, (n_fp, n_abs, p)


def test_bloom_sketch_nullable_numeric_no_false_negatives(spark):
    """Nullable int64 columns: pandas promotes null-containing batches to
    float64, so the build side sees 42.0 while a null-free probe batch
    sees 42 — canonical rendering must keep them the SAME key (ADVICE
    r06: str() alone inserted '42.0' and probed '42', a false negative).
    Also: the NULL-keyed group must find its sketch (collect() None vs
    groupby NaN key)."""
    from bloomsearch_spark.sketches.bloomsketch import (
        BloomSketch,
        bloom_contains,
        bloom_sketch_df,
    )

    # direct kernel check: float64-promoted build, int64 probe
    sk = BloomSketch(1 << 10, 0.01)
    sk.add_values(np.array([1.0, 42.0, 7.0]))  # what a nulled batch yields
    assert sk.contains(np.array([1, 42, 7], dtype=np.int64)).all()

    # end-to-end: values with nulls (forces float64 batches), numeric +
    # NULL group keys
    rows = [(g, v) for g in (1, 2, None) for v in (11, 42, None, 7)]
    df = spark.createDataFrame(rows, "grp long, val long")
    merged = bloom_sketch_df(
        df.filter(F.col("val").isNotNull()), "val", ("grp",),
        expected_items=1 << 10, fpr=0.01,
    )
    # probe a null-FREE frame (int64 batches) incl. the NULL-keyed group
    probes = df.filter(F.col("val").isNotNull())
    out = bloom_contains(probes, "val", merged, ("grp",))
    n, hits = out.agg(
        F.count("*"), F.sum(F.col("maybe_present").cast("long"))
    ).first()
    assert n == 9 and hits == n, (n, hits)  # zero false negatives
