"""Dedup + similarity plan-shape guarantees (VERDICT r01 items 1, 2, 7):

- prefix-filtered Jaccard join is LOSSLESS vs a brute-force pandas oracle
- a hot shingle shared by 50% of docs no longer drives quadratic join
  fan-out (candidates bounded by rare-prefix co-occurrence)
- LSH-bucketed embedding near-dup pairs: recall 1.0 on planted near-dups,
  candidate pairs << N^2/2
- recall floors for the approximate ANN ops (lsh_topk, ivf_topk) so a
  parameter regression fails CI instead of only surfacing in BENCH.md
"""

import itertools

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomsearch_spark.functions.dedup import (
    jaccard_prefix_candidates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from bloomsearch_spark.functions.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    ivf_topk,
    lsh_topk,
    neardup_candidates,
)

SF001 = "/root/testdata/sf0.01"


def _brute_jaccard(texts: dict, threshold: float, n: int = 3) -> set:
    def sh(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {k: sh(v) for k, v in texts.items()}
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        u = len(sets[a] | sets[b])
        if u and len(sets[a] & sets[b]) / u >= threshold:
            out.add((a, b))
    return out


@pytest.fixture(scope="module")
def overlap_docs(spark):
    """120 docs in 30 groups of 4 rewrites sharing most of their tokens —
    dense J spectrum around any threshold."""
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(60)]
    texts = {}
    doc = 0
    for g in range(30):
        base = list(rng.choice(vocab, size=12))
        for v in range(4):
            t = list(base)
            for _ in range(v):  # v word-level edits
                t[rng.randint(len(t))] = vocab[rng.randint(len(vocab))]
            texts[doc] = " ".join(t)
            doc += 1
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    return df, texts


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_prefix_filter_lossless(spark, overlap_docs, threshold):
    df, texts = overlap_docs
    got = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(df, "text", "doc_id", threshold=threshold).collect()
    }
    assert got == _brute_jaccard(texts, threshold)


def test_minhash_agrees_with_exact(spark, overlap_docs):
    df, texts = overlap_docs
    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(df, "text", "doc_id", threshold=0.8).collect()
    }
    assert got == _brute_jaccard(texts, 0.8)


def test_hot_shingle_bounded_fanout(spark):
    """One shingle in 50% of docs: raw inverted-index fan-out would be
    (n/2)^2 = 40_000 join rows; the prefix filter keeps the hot shingle in
    every doc's suffix, so candidates stay ~0 (VERDICT r01 item 2)."""
    n_docs = 400
    rows = []
    for i in range(n_docs):
        toks = [f"u{i}x{j}" for j in range(10)]
        if i % 2 == 0:
            toks += ["the", "end", "of"]  # ubiquitous shingle "the end of"
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cand = jaccard_prefix_candidates(df, "text", "doc_id", threshold=0.8).count()
    hot_pairs = (n_docs // 2) * (n_docs // 2 - 1) // 2
    assert cand <= n_docs  # vs 19_900 hot-shingle pairs
    assert cand < hot_pairs / 100
    # and with 3 planted exact dups, pairs are still found exactly
    dup = spark.createDataFrame(
        [(1000 + i, rows[i][1]) for i in range(3)], "doc_id long, text string"
    )
    both = df.union(dup)
    got = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(both, "text", "doc_id", threshold=0.8).collect()
    }
    assert got == {(i, 1000 + i) for i in range(3)}


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF001}/embeddings.parquet")


def test_neardup_lsh_recall_and_candidates(spark, embs):
    """Planted near-dup twins (+0.02 on one component, cosine ~0.9998): the
    LSH-bucketed default must find every one (multi-table miss prob ~1e-15)
    with candidate pairs far below N^2/2 (VERDICT r01 item 1)."""
    base = embs.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    dup = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(0.02)),
            F.slice("embedding", 2, F.size("embedding") - 1),
        ).alias("embedding"),
    )
    aug = base.unionByName(dup)
    n = aug.count()
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(aug, 0.9, brute_force=True).collect()
    }
    lsh = {(r.id_a, r.id_b) for r in embedding_neardup_pairs(aug, 0.9).collect()}
    assert lsh == exact and len(exact) > 0
    cand = neardup_candidates(aug).count()
    assert cand < n * n / 2 / 4  # << N^2/2


def _recall(approx, brute):
    a = approx.groupBy("query_id").agg(F.collect_set("neighbor_id").alias("a"))
    b = brute.groupBy("query_id").agg(F.collect_set("neighbor_id").alias("b"))
    per = (
        a.join(b, "query_id")
        .select(
            (F.size(F.array_intersect("a", "b")) / F.size("b")).alias("r")
        )
        .collect()
    )
    return sum(x.r for x in per) / len(per)


def test_lsh_topk_recall_floor(spark, embs):
    """Seeded-deterministic recall floor: the 12-plane 0.02-recall incident
    (r01) must fail CI, not just BENCH.md (VERDICT r01 item 7)."""
    q = embs.filter(F.col("vec_id") < 5)
    brute = brute_force_topk(embs, q, k=10)
    approx = lsh_topk(embs, q, k=10)
    assert _recall(approx, brute) >= 0.9


def test_ivf_topk_recall_floor(spark, embs):
    """Default n_probe=4/16 cells sits at ~0.84 mean recall on this small
    500-vector slice (1.0 at sf0.1, see BENCH.md) — floor the default
    against catastrophic regression and the wider probe at 0.9."""
    q = embs.filter(F.col("vec_id") < 5)
    brute = brute_force_topk(embs, q, k=10)
    assert _recall(ivf_topk(embs, q, k=10), brute) >= 0.8
    assert _recall(ivf_topk(embs, q, k=10, n_probe=8), brute) >= 0.9


def test_duplicate_clusters_components_and_chain(spark):
    """CC over a pair graph: clique-ish component, a 4-chain (needs
    multiple propagation rounds), and an isolated pair; cluster_id = min
    reachable id.  Convergence bound raises instead of silently
    mis-clustering."""
    from bloomsearch_spark.functions.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3),            # triangle-ish via shared 2
            (10, 11), (11, 12), (12, 13),  # 4-chain: diameter 3
            (20, 21),                  # isolated pair
        ],
        "doc_a long, doc_b long",
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in duplicate_clusters(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10), (12, 10), (13, 10),
        (20, 20), (21, 20),
    }

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs, max_iterations=1)


def test_dedupe_corpus_keeps_canonical_and_singletons(spark):
    from bloomsearch_spark.functions.dedup import dedupe_corpus

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    got = sorted(r.doc_id for r in dedupe_corpus(docs, pairs).collect())
    # clusters {1,2,3} -> keep 1, {5,6} -> keep 5; 0/4/7 never paired
    assert got == [0, 1, 4, 5, 7]
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedupe_corpus(docs, empty).count() == 8


def test_ivf_persisted_index(spark, tmp_path):
    """Persistent IVF (r06 late): ivf_build writes centroids + the corpus
    hive-partitioned by cell; ivf_query returns IDENTICAL rows to the
    in-memory ivf_topk (deterministic trainer, same scoring/tie-break)
    while scanning only the probed cells' partitions (static pruning,
    asserted via the scan's input files)."""
    from bloomsearch_spark.functions.similarity import (
        brute_force_topk,
        ivf_build,
        ivf_query,
        ivf_topk,
    )

    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = embs.orderBy("vec_id").limit(8)
    root = str(tmp_path / "ivf")
    ivf_build(embs, root, n_cells=16, iters=2)

    got = ivf_query(spark, root, queries, k=5, n_probe=4)
    ref = ivf_topk(embs, queries, k=5, n_cells=16, n_probe=4, iters=2)
    g = sorted(map(tuple, got.collect()))
    r = sorted(map(tuple, ref.collect()))
    assert g == r and len(g) > 0

    # static partition pruning: the probed-cell filter reads fewer files
    # than the full layout holds
    import pyspark.sql.functions as F

    all_files = set(spark.read.parquet(f"{root}/vectors").inputFiles())
    pruned = spark.read.parquet(f"{root}/vectors").filter(
        F.col("cell").isin([0, 1])
    )
    files_read = (
        pruned.select(F.input_file_name().alias("f")).distinct().count()
    )
    assert 0 < files_read < len(all_files)

    # sanity floor: persisted top-1 recall vs exact brute force
    exact = brute_force_topk(embs, queries, k=5)
    top1 = {
        (r.query_id, r.neighbor_id) for r in exact.collect() if r.rank == 1
    }
    got1 = {(r.query_id, r.neighbor_id) for r in got.collect() if r.rank == 1}
    assert len(got1 & top1) >= int(0.5 * len(top1))
