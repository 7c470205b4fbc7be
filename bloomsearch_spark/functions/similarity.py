"""Similarity search over embedding columns (array<float>).

- **Brute-force cosine top-k** (the exactness baseline): broadcast the
  (small) query set, JVM-side higher-order-function dot products, window
  top-k.  No Python in the scoring loop.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  bucket the corpus; each query probes only its bucket (multi-probe via
  several independent tables).  Candidate scoring is the same JVM cosine.
- **Embedding near-dup pairs**: all pairs with cosine >= t, via either the
  brute self-join (small N) or LSH buckets (large N).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.storagelevel import StorageLevel
from pyspark.sql import DataFrame, Window, functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_col(a, b):
    """cosine(a, b) as a pure Catalyst expression over two array columns."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for every query vector.

    queries is expected to be small (it is broadcast); corpus scan is a
    single pass, scoring stays in whole-stage codegen.  Ties break on
    neighbor id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_tables, n_planes, dim)).astype(np.float64)


def _dim_probe(df: DataFrame, vec_col: str) -> int:
    """Embedding dimension via a limit-1 scan that ships ONE int to the
    driver (the old probe collected a full vector row)."""
    return int(df.select(F.size(F.col(vec_col))).first()[0])


def _dim_and_count(
    df: DataFrame, vec_col: str, dim: int | None, n_hint: int | None
) -> tuple[int, int]:
    """Resolve (dim, n) plan-time probes in at most ONE Spark job.  The
    old path ran two — a ``first()`` shipping a whole vector, then a
    ``count()`` — per call; one agg computes both (and when only one is
    unknown, only its cheap probe runs)."""
    if dim is not None and n_hint is not None:
        return dim, n_hint
    if n_hint is not None:
        return _dim_probe(df, vec_col), n_hint
    if dim is not None:
        return dim, df.count()
    row = df.agg(
        F.first(F.size(F.col(vec_col))), F.count(F.lit(1))
    ).first()
    return int(row[0]), int(row[1])


def lsh_bucket_udf(planes: np.ndarray):
    """(table, bucket) signature UDF: sign pattern of hyperplane dots.
    Vectorized: one matmul per Arrow batch."""
    n_tables, n_planes, dim = planes.shape
    flat = planes.reshape(n_tables * n_planes, dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        dots = mat @ flat.T  # (batch, tables*planes)
        bits = (dots > 0).astype(np.int64).reshape(len(mat), n_tables, n_planes)
        codes = (bits * weights[None, None, :]).sum(axis=2)  # (batch, tables)
        return pd.Series(list(codes))

    return buckets


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = 24,
    seed: int = 42,
    dim: int | None = None,
    n_hint: int | None = None,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH candidates,
    exact cosine re-rank.  Shuffles only (table, bucket) keys; each query
    scores its union-of-buckets candidates instead of the full corpus —
    the 100 TB path (corpus bucketing is a one-time build; queries probe).

    ``n_planes=None`` auto-sizes buckets to ~256 vectors each
    (planes = log2(n/256)): selectivity tracks corpus size, and the
    multi-table union keeps recall high (measured 1.0 at 2k vectors with
    the defaults; see BENCH.md).  More planes = faster + lower recall.
    Pass ``dim``/``n_hint`` to skip the plan-time first()/count() probes
    when the caller knows the embedding dimension / corpus size."""
    if n_planes is None:
        import math

        dim, n = _dim_and_count(corpus, vec_col, dim, n_hint)
        n_planes = max(4, math.ceil(math.log2(max(n, 512) / 256)))
    elif dim is None:
        dim = _dim_probe(corpus, vec_col)
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    budf = lsh_bucket_udf(planes)

    def with_buckets(df, idname):
        return df.select(
            F.col(id_col).alias(idname),
            _as_double(F.col(vec_col)).alias(f"{idname}_v"),
            F.posexplode(budf(F.col(vec_col))).alias("table_id", "bucket"),
        )

    cb = with_buckets(corpus, "neighbor_id")
    qb = with_buckets(queries, "query_id")
    # score RAW bucket collisions map-side, dedup cross-table duplicates
    # AFTER scoring: a .distinct() over (ids, vectors) would hash+shuffle
    # two full embeddings per candidate, while re-scoring a duplicate is a
    # cheap codegen dot product and the dedup then touches only tiny
    # (query_id, neighbor_id, sim) rows — same plan as
    # embedding_neardup_pairs (sim is deterministic per pair, so the
    # surviving row is identical whichever collision produced it)
    scored = (
        cb.join(F.broadcast(qb), ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_col(F.col("query_id_v"), F.col("neighbor_id_v")), 6
            ).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _nearest_cells_udf(centroids: np.ndarray, n: int):
    """UDF: n nearest centroid ids (by cosine) for each vector —
    one matmul per Arrow batch."""
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf("array<int>")
    def cells(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ cn.T  # (batch, n_cells)
        top = np.argsort(-sims, axis=1)[:, :n].astype(np.int32)
        return pd.Series(list(top))

    return cells


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic coarse quantizer: init = the n_cells lowest-id vectors,
    then Lloyd iterations computed distributively.  Assignment is one
    matmul UDF; per-cell sums are computed as PARTIAL (cell, sum_vec,
    count) rows per task via mapInPandas (map-side combine: one numpy
    reduction per batch, n_cells rows shuffled per task instead of a
    dim-fold posexplode of the whole corpus) and reduced on the driver —
    n_cells x dim doubles, never a corpus-sized pass."""
    init = (
        corpus.orderBy(id_col)
        .limit(n_cells)
        .select(_as_double(F.col(vec_col)).alias("v"))
        .collect()
    )
    centroids = np.stack([np.asarray(r.v, dtype=np.float64) for r in init])
    dim = centroids.shape[1]
    for _ in range(iters):
        cell_of = _nearest_cells_udf(centroids, 1)

        def partial_sums(pdfs):
            sums = np.zeros((n_cells, dim), dtype=np.float64)
            counts = np.zeros(n_cells, dtype=np.int64)
            for pdf in pdfs:
                cells = np.fromiter((c[0] for c in pdf["cell"]), dtype=np.int64, count=len(pdf))
                mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
                np.add.at(sums, cells, mat)
                np.add.at(counts, cells, 1)
            hit = np.flatnonzero(counts)
            yield pd.DataFrame(
                {
                    "cell": hit.astype(int),
                    "s": [sums[c].tolist() for c in hit],
                    "n": counts[hit],
                }
            )

        parts = (
            corpus.select(
                _as_double(F.col(vec_col)).alias("v"),
                cell_of(F.col(vec_col)).alias("cell"),
            )
            .mapInPandas(partial_sums, "cell int, s array<double>, n long")
            .collect()
        )
        sums = np.zeros((n_cells, dim), dtype=np.float64)
        counts = np.zeros(n_cells, dtype=np.int64)
        for r in parts:
            sums[r.cell] += np.asarray(r.s, dtype=np.float64)
            counts[r.cell] += r.n
        nxt = centroids.copy()  # cells that lost all members keep old centroid
        nonzero = counts > 0
        nxt[nonzero] = sums[nonzero] / counts[nonzero, None]
        centroids = nxt
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest-centroid
    cell; each query scans only its ``n_probe`` nearest cells, exact cosine
    re-rank.  The 100 TB shape: cell assignment is a one-time build (write
    the corpus bucketed/partitioned by cell); a query touches
    n_probe/n_cells of the data — the same hierarchical-pruning idea as the
    bloom index, with centroids as the zone map."""
    centroids = train_ivf_centroids(corpus, n_cells, iters, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
        F.element_at(_nearest_cells_udf(centroids, 1)(F.col(vec_col)), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        F.explode(_nearest_cells_udf(centroids, n_probe)(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def neardup_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = 32,
    seed: int = 42,
    dim: int | None = None,
    n_hint: int | None = None,
) -> DataFrame:
    """Candidate (id_a, id_b, va, vb) pairs sharing an LSH (table, bucket)
    — the scale path for near-dup detection: the join shuffles only
    (table_id, bucket) keys and fans out per bucket, so candidates grow
    ~O(N * bucket_size * tables) instead of N²/2.  ``dim``/``n_hint`` skip
    the plan-time first()/count() probes when the caller knows them."""
    return _neardup_raw_candidates(
        df, id_col, vec_col, n_planes, n_tables, seed, dim, n_hint
    ).dropDuplicates(["id_a", "id_b"])


def _neardup_raw_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = 32,
    seed: int = 42,
    dim: int | None = None,
    n_hint: int | None = None,
) -> DataFrame:
    """Bucket-collision pairs WITHOUT cross-table dedup (a pair colliding
    in k tables appears k times) — callers either dedup ids (tiny rows
    after scoring) or count distinct.

    The bucketed relation is PERSISTED (MEMORY_ONLY) before the
    self-join: two aliases of a plan containing a pandas UDF do NOT
    canonicalize equal (fresh result ids), so without the persist Spark
    plans two full source scans + two Arrow bucket-UDF passes + two
    shuffles — measured 3× slower end-to-end at 2.4k vectors (11.6 →
    3.8 s).  MEMORY_ONLY deliberately: evicted partitions recompute
    (correct, just slower) and nothing accumulates on spark.local.dir
    disk across many calls in a long session — MEMORY_AND_DISK blocks
    would persist on disk until an explicit unpersist, which a lazy
    operator API cannot schedule.  ``spark.catalog.clearCache()`` is the
    bulk escape hatch between jobs."""
    if n_planes is None:
        import math

        dim, n = _dim_and_count(df, vec_col, dim, n_hint)
        # target ~8 vectors per bucket: deep buckets keep candidates near-
        # linear; the 32-table union keeps recall ~1 for cosine >= 0.9
        # (per-table collision p = (1 - theta/pi)^planes, miss = (1-p)^32)
        n_planes = max(4, math.ceil(math.log2(max(n, 64) / 8)))
    elif dim is None:
        dim = _dim_probe(df, vec_col)
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    budf = lsh_bucket_udf(planes)
    tagged = df.select(
        F.col(id_col).alias("vid"),
        _as_double(F.col(vec_col)).alias("v"),
        F.posexplode(budf(F.col(vec_col))).alias("table_id", "bucket"),
    ).persist(StorageLevel.MEMORY_ONLY)
    a = tagged.alias("a")
    b = tagged.alias("b")
    return (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
    n_tables: int = 32,
    seed: int = 42,
    dim: int | None = None,
    n_hint: int | None = None,
    brute_force: bool = False,
) -> DataFrame:
    """All pairs with cosine >= threshold.

    Default plan: LSH-bucketed candidate equi-join (``neardup_candidates``)
    + exact cosine verify — precision is exact (every emitted pair is
    re-scored), recall is the multi-table LSH curve (~1 at near-dup
    thresholds; deterministic for a fixed seed).  This replaces the r01
    O(N²) crossJoin that could never finish at 100 TB.
    ``brute_force=True`` keeps the exact all-pairs plan for small N /
    recall oracles."""
    if brute_force:
        a = df.select(F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va"))
        b = df.select(F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb"))
        cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        # score RAW bucket collisions map-side, dedup AFTER the threshold
        # filter: duplicate (multi-table) pairs re-score cheaply in codegen,
        # while deduping first would shuffle both vectors per candidate —
        # the dedup then touches only tiny surviving (id, id, sim) rows
        cand = _neardup_raw_candidates(
            df, id_col, vec_col, n_planes, n_tables, seed, dim, n_hint
        )
    scored = cand.select(
        "id_a",
        "id_b",
        F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("sim"),
    ).filter(F.col("sim") >= threshold)
    if brute_force:
        return scored
    return scored.dropDuplicates(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# Persistent IVF index (r06 late): train once, probe many
# ---------------------------------------------------------------------------


def ivf_build(
    corpus: DataFrame,
    out_root: str,
    n_cells: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Materialize an IVF index: centroids parquet + the corpus vectors
    laid out hive-PARTITIONED BY CELL.  ``ivf_topk`` re-trains per call —
    fine for one-shot jobs, wrong for a query service; this is the
    train-once/probe-many shape, and the cell layout makes every later
    query a STATIC partition-pruned read (n_probe/n_cells of the files,
    enforced by the scan itself — the same hierarchical-pruning idea as
    the bloom index, with centroids as the zone map)."""
    import os

    centroids = train_ivf_centroids(corpus, n_cells, iters, id_col, vec_col)
    spark = corpus.sparkSession
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_root, "centroids")
    )
    (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(F.col(vec_col)).alias("cv"),
            F.element_at(
                _nearest_cells_udf(centroids, 1)(F.col(vec_col)), 1
            ).alias("cell"),
        )
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(out_root, "vectors"))
    )
    return out_root


def ivf_query(
    spark,
    root: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over a persisted IVF index: load the KB-scale centroids, pick
    each query's ``n_probe`` cells, then scan ONLY those cells' partitions
    (driver collects the probe-cell union — n_queries x n_probe ints — so
    the pruning is static and visible in the plan's PartitionFilters).
    Same scoring/tie-break as ``ivf_topk``: with identical centroids the
    two return identical rows (deterministic trainer, tested)."""
    import os

    crows = spark.read.parquet(os.path.join(root, "centroids")).collect()
    centroids = np.array(
        [r.centroid for r in sorted(crows, key=lambda r: r.cell)]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        F.explode(
            _nearest_cells_udf(centroids, n_probe)(F.col(vec_col))
        ).alias("cell"),
    )
    cells = sorted({r.cell for r in q.select("cell").distinct().collect()})
    vecs = spark.read.parquet(os.path.join(root, "vectors")).filter(
        F.col("cell").isin(cells)
    )
    scored = (
        vecs.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
