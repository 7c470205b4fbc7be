"""Deduplication operators for training-data pipelines.

Four families, each a standard technique re-expressed Spark-first:

- **Exact**: hash-groupBy on a normalized-content fingerprint. One shuffle
  on the fingerprint; map-side combine; no skew (sha256 keys are uniform).
- **Exact n-gram Jaccard**: inverted-index self-join on word shingles ->
  shared-shingle counts -> Jaccard >= t.  Exact (any pair with J >= t > 0
  shares a shingle).  Scale lever: ``max_shingle_df`` drops ubiquitous
  shingles before the join (a pair sharing ONLY ubiquitous shingles has
  low Jaccard, so high thresholds are unaffected) — this is the classic
  stop-shingle cut that bounds join fan-out at web scale.
- **MinHash + LSH**: k hash-min signatures -> banded bucket join ->
  candidate pairs -> exact Jaccard verify.  Deterministic (fixed seeds).
  The 100 TB path: join fan-out is bounded by band buckets, not shingle
  frequency.
- **SimHash**: 64-bit sign-of-weighted-sum signature; near-dups = signatures
  within Hamming distance d, found via pigeonhole band exact-match join.

All heavy lifting is built-in Spark (explode/groupBy/join); signatures are
Arrow-vectorized pandas UDFs (numpy bit ops) — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.storagelevel import StorageLevel
from pyspark.sql import DataFrame, functions as F

from .text import WS, fingerprint

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group rows by normalized-content fingerprint.

    Returns (fingerprint, rep_id = min id, dup_count) — the survivor set is
    ``dup_count`` rows joined back on rep_id.  One uniform-key shuffle.
    """
    return (
        df.select(fingerprint(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("rep_id"), F.count("*").alias("dup_count"))
    )


# ---------------------------------------------------------------------------
# Shingles
# ---------------------------------------------------------------------------


def shingles_col(text_col: str, n: int = 3):
    """Distinct word n-gram shingles as an array column (first-occurrence
    order), via an Arrow-batched pandas UDF.

    A pure-Catalyst formulation (transform(sequence, i ->
    concat_ws(element_at...))) exists but re-evaluates the split() inside
    the lambda per element — measured ~30x slower; the UDF does one split
    and a linear join pass per document."""

    @F.pandas_udf("array<string>")
    def sh(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return []
            toks = str(t).lower().split()
            if len(toks) < n:
                return []
            return list(dict.fromkeys(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ))

        return texts.map(one)

    return sh(F.col(text_col).cast("string"))


def _parallelize(df: DataFrame) -> DataFrame:
    """Small inputs often arrive as 1-2 parquet partitions; fan out so the
    self-join/signature stages use the cluster (no-op at real scale)."""
    want = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def jaccard_prefix_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs via PREFIX FILTERING (AllPairs/PPJoin,
    Bayardo et al. WWW'07) — the lossless fan-out bound for exact Jaccard
    joins.

    Order all shingles by one global total order — ascending document
    frequency, ties on the shingle string — and index only each document's
    *prefix* of length ``|d| - ceil(t*|d|) + 1`` under that order.
    Completeness proof: suppose J(a,b) >= t and let s0 be the
    minimum-ordered shared shingle.  Every shingle of `a` ordered before s0
    is non-shared (s0 is the first shared one), and
    ``|a\\b| = |a| - |a∩b| <= |a| - ceil(t*|a∪b|) <= |a| - ceil(t*|a|)``,
    so s0 sits at position <= |a| - ceil(t*|a|) + 1 in `a` — inside a's
    prefix — and symmetrically inside b's.  The prefixes therefore share
    s0, and the prefix-prefix equi-join misses no pair with J >= t.
    Prefixes hold each doc's RAREST shingles, so a web-corpus's ubiquitous
    shingles ("the end of") never drive the join:
    fan-out is Σ df(s)² over *rare-prefix* occurrences, not raw shingle
    frequency (the r01 quadratic hot-shingle blowup is structurally gone).

    ``max_shingle_df`` optionally also drops shingles with df above the cap
    BEFORE prefixing — an explicit opt-in approximation (a doc whose whole
    prefix is ubiquitous can then be missed); the default None stays exact.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from pyspark.sql import Window

    sh = df.select(
        F.col(id_col).alias("doc"), shingles_col(text_col, n).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    u = sh.select("doc", "n_sh", F.explode("sh").alias("s"))
    dfreq = u.groupBy("s").agg(F.count("*").alias("s_df"))
    if max_shingle_df is not None:
        dfreq = dfreq.filter(F.col("s_df") <= max_shingle_df)
    u = u.join(dfreq, "s")
    w = Window.partitionBy("doc").orderBy(F.asc("s_df"), F.asc("s"))
    prefix = (
        u.withColumn("rn", F.row_number().over(w))
        .filter(
            F.col("rn")
            <= F.col("n_sh") - F.ceil(F.lit(float(threshold)) * F.col("n_sh")) + 1
        )
        .select("doc", "s")
        # persisted: self-joined plans containing pandas UDFs don't
        # canonicalize equal (fresh result ids), so without this Spark
        # would run the whole shingle+df+window chain twice
        # (see similarity._neardup_raw_candidates)
        .persist(StorageLevel.MEMORY_ONLY)
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    return (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact all-pairs Jaccard >= threshold over word n-gram shingle sets.

    Plan: prefix-filtered candidate join (lossless — see
    ``jaccard_prefix_candidates``) -> exact Jaccard verify from the full
    shingle arrays.  Safe by default at web scale: candidate fan-out is
    bounded by rare-prefix co-occurrence, never by hot-shingle df², and the
    verify recomputes J from complete sets so results are exact regardless.
    """
    df = _parallelize(df)
    cand = jaccard_prefix_candidates(df, text_col, id_col, threshold, n, max_shingle_df)
    # persisted: sa and sb below are two scans of this UDF-bearing plan
    sh = df.select(
        F.col(id_col).alias("doc"), shingles_col(text_col, n).alias("sh")
    ).persist(StorageLevel.MEMORY_ONLY)
    sa = sh.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    out = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.size("sh_a") + F.size("sh_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "jaccard")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_sigs_batch(
    lists: list, seeds_a: np.ndarray, seeds_b: np.ndarray
) -> list[np.ndarray]:
    """MinHash signatures for a whole batch of shingle lists at once:
    hash EVERY shingle in the batch in one pass, permute with (a*h+b) mod p,
    then segment-min per document via ``np.minimum.reduceat`` — no per-row
    Python.  Chunked so the (k, shingles) matrix stays cache-friendly."""
    k = len(seeds_a)
    sentinel = np.full(k, np.iinfo(np.int64).max, dtype=np.int64)
    lens = np.fromiter((len(x) for x in lists), dtype=np.int64, count=len(lists))
    out: list[np.ndarray] = [sentinel] * len(lists)
    nonempty = np.flatnonzero(lens)
    if len(nonempty) == 0:
        return out
    # chunk over documents so each permuted matrix is <= ~50k shingles
    target = 50_000
    start = 0
    while start < len(nonempty):
        end = start
        total = 0
        while end < len(nonempty) and (total == 0 or total + lens[nonempty[end]] <= target):
            total += lens[nonempty[end]]
            end += 1
        idxs = nonempty[start:end]
        flat = np.concatenate([np.asarray(lists[i], dtype=object) for i in idxs])
        base = pd.util.hash_array(flat, categorize=False).astype(np.uint64) & _MERSENNE
        hs = (seeds_a[:, None] * base[None, :] + seeds_b[:, None]) % _MERSENNE  # (k, m)
        starts = np.zeros(len(idxs), dtype=np.int64)
        np.cumsum(lens[idxs][:-1], out=starts[1:])
        mins = np.minimum.reduceat(hs, starts, axis=1)  # (k, docs)
        for j, i in enumerate(idxs):
            out[i] = mins[:, j].astype(np.int64)
        start = end
    return out


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 128, n: int = 3, seed: int = 42
) -> DataFrame:
    """(id, signature array<long>) via an Arrow-batched pandas UDF."""
    rng = np.random.RandomState(seed)
    seeds_a = rng.randint(1, (1 << 61) - 1, size=num_hashes).astype(np.uint64)
    seeds_b = rng.randint(0, (1 << 61) - 1, size=num_hashes).astype(np.uint64)

    @F.pandas_udf("array<long>")
    def sig(sh: pd.Series) -> pd.Series:
        lists = [s if s is not None else [] for s in sh]
        return pd.Series(_minhash_sigs_batch(lists, seeds_a, seeds_b))

    return df.select(
        F.col(id_col).alias("doc"), sig(shingles_col(text_col, n)).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 128,
    bands: int = 32,  # 32x4: P(candidate | J=0.8) = 1-(1-0.8^4)^32 ≈ 1-5e-8
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH + exact Jaccard verification.

    Deterministic for fixed seeds.  Candidate generation shuffles only
    (band_id, band_hash) keys; each bucket join-fans-out locally.  The
    final exact verify recomputes Jaccard from true shingle sets, so
    emitted pairs are never false positives; recall is the standard
    1-(1-t^r)^b LSH curve (≈1 for t well above threshold).
    """
    rows = num_hashes // bands
    df = _parallelize(df)
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, n, seed)
    bands_df = sigs.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice(F.col("sig"), b * rows + 1, rows),
            )
        ).alias("band_id", "band_sig"),
    ).select(
        "doc", "band_id", F.xxhash64(F.col("band_id"), F.col("band_sig")).alias("bh")
    ).persist(StorageLevel.MEMORY_ONLY)  # self-joined UDF-bearing plan (see jaccard_prefix_candidates)

    a = bands_df.alias("a")
    b = bands_df.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )

    sh = df.select(
        F.col(id_col).alias("doc"), shingles_col(text_col, n).alias("sh")
    ).persist(StorageLevel.MEMORY_ONLY)  # sa and sb are two scans of this UDF-bearing plan
    sa = sh.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    out = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "jaccard")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash over word tokens (sign of per-bit weighted sums).
    Batch-vectorized: one hash pass over every token in the batch, per-doc
    bit sums via ``np.add.reduceat``."""

    @F.pandas_udf("long")
    def sig(toks: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        lists = [t if t is not None else [] for t in toks]
        lens = np.fromiter((len(t) for t in lists), dtype=np.int64, count=len(lists))
        out = np.zeros(len(lists), dtype=np.int64)
        nonempty = np.flatnonzero(lens)
        if len(nonempty):
            flat = np.concatenate([np.asarray(lists[i], dtype=object) for i in nonempty])
            h = pd.util.hash_array(flat, categorize=False).astype(np.uint64)
            bits = ((h[:, None] >> shifts[None, :]) & 1).astype(np.int32) * 2 - 1
            starts = np.zeros(len(nonempty), dtype=np.int64)
            np.cumsum(lens[nonempty][:-1], out=starts[1:])
            sums = np.add.reduceat(bits, starts, axis=0)  # (docs, 64)
            sigs = ((sums > 0).astype(np.uint64) << shifts[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            out[nonempty] = sigs.view(np.int64)
        return pd.Series(out)

    toks = F.split(F.lower(F.col(text_col).cast("string")), WS)
    return df.select(F.col(id_col).alias("doc"), sig(toks).alias("simhash"))


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3, blocks: int = 4
) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming via the pigeonhole trick:
    split the 64-bit signature into ``blocks`` bands (blocks > max_hamming
    guarantees two near signatures agree exactly on >= 1 band), equi-join on
    (band_id, band_bits), then verify true Hamming distance with JVM
    bit_count — no quadratic scan."""
    if blocks <= max_hamming:
        raise ValueError("need blocks > max_hamming for pigeonhole completeness")
    width = 64 // blocks
    sigs = simhash_signatures(_parallelize(df), text_col, id_col)
    banded = sigs.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("band_bits"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("band"),
    ).select("doc", "simhash", "band.band_id", "band.band_bits").persist(StorageLevel.MEMORY_ONLY)
    # ^ self-joined UDF-bearing plan (see jaccard_prefix_candidates)

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iterations: int = 50,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Connected components over a near-duplicate PAIR graph ->
    ``(doc_id, cluster_id)`` where ``cluster_id`` is the minimum id
    reachable from the doc — the canonical-representative assignment a
    dedup pipeline applies after pair finding ("keep cluster_id, drop the
    rest").  No reference analog (bloomsearch stops at search); standard
    min-label propagation CC (the simple variant of Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14).

    Each round is one edge-sized equi-join + a vertex-sized min-groupBy:
    every vertex takes the min of its own and its neighbors' labels;
    converged when no label changes.  Rounds needed = component DIAMETER —
    near-dup components are clique-ish (usually 1-2 rounds); a pathological
    k-chain needs k rounds, bounded by ``max_iterations`` (RuntimeError
    beyond, never a silently-partial clustering).  At 100 TB scale the
    per-round cost is a shuffle of the EDGE list (pairs, already a tiny
    output of the bucketed pair joins), never the corpus; the only
    driver-side value is the per-round changed-count scalar.  Lineage is
    truncated every ``checkpoint_every`` rounds via localCheckpoint (on a
    real cluster prefer ``spark.sparkContext.setCheckpointDir`` +
    ``checkpoint`` for executor-loss resilience).
    """
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist(StorageLevel.MEMORY_ONLY)
    )
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    prev_cached = None  # round i-1's cache: releasable once round i is hot
    try:
        for it in range(max_iterations):
            nbr_min = (
                edges.join(
                    labels.select(F.col("u").alias("v"), "label"), "v"
                )
                .groupBy("u")
                .agg(F.min("label").alias("nbr_min"))
            )
            cached = stepped = (
                labels.join(nbr_min, "u", "left")
                .select(
                    "u",
                    F.col("label").alias("old_label"),
                    F.least("label", F.coalesce("nbr_min", "label")).alias("label"),
                )
                .persist(StorageLevel.MEMORY_ONLY)
            )
            if (it + 1) % checkpoint_every == 0:
                # the checkpoint copies the data; the pre-checkpoint cache
                # would otherwise leak one vertex-sized frame per 3 rounds
                stepped = stepped.localCheckpoint(eager=True)
                cached.unpersist()
                cached = None
            changed = stepped.filter(F.col("label") != F.col("old_label")).count()
            # this round is materialized; the previous round's cache is no
            # longer referenced — release it instead of accumulating one
            # vertex-sized cached frame per round
            if prev_cached is not None:
                prev_cached.unpersist()
            prev_cached = cached
            labels = stepped.drop("old_label")
            if changed == 0:
                # the final frame stays cached: the returned (lazy) result
                # reads from it; eviction merely recomputes
                return labels.select(
                    F.col("u").alias("doc_id"), F.col("label").alias("cluster_id")
                )
        if prev_cached is not None:  # error path: leave nothing cached
            prev_cached.unpersist()
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iterations} rounds "
            "(component diameter exceeds the bound) — raise max_iterations"
        )
    finally:
        edges.unpersist()


def dedupe_corpus(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Materialize the DEDUPED corpus: the end of the dedup pipeline.

    pair finding (any of the four families above) -> connected components
    (:func:`duplicate_clusters`) -> keep ONE canonical representative per
    cluster (the minimum id, the cluster label itself) -> anti-join the
    losers out of the corpus.  Docs that appear in no pair survive
    untouched (they are not vertices of the pair graph at all).

    100 TB shape: the loser frame is vertex-sized (bounded by docs that
    appear in some near-dup pair, typically a small fraction of the
    corpus); the anti-join shuffles on the id — one corpus-sized shuffle,
    unavoidable for a row-level subtraction, and AQE broadcast-converts it
    when the loser side is small.  No reference analog (bloomsearch stops
    at search); this is the standard CC-dedup shape (Kiveris et al.,
    SoCC'14).
    """
    clusters = duplicate_clusters(
        pairs, id_a=id_a, id_b=id_b, max_iterations=max_iterations
    )
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
