"""Approximate-nearest-neighbor search over an embedding column.

- ann_topk_bruteforce: exact top-k per query — broadcast the (small) query
  set against the corpus, native cosine, window rank. The correctness
  baseline; fine whenever |queries| is broadcastable.
- ann_topk_lsh: the scale path — random-hyperplane bucketing on BOTH sides,
  join on (band, signature), exact rescore, per-query top-k. Probed buckets
  ≪ corpus ⇒ the 100 TB-corpus query cost is proportional to bucket sizes,
  not corpus size. Recall is tunable via (n_planes, bands); falls back to
  brute force within each bucket.
- ann_topk_ivf: the second scale path — IVF coarse quantizer: k-means
  centroids fit driver-side on a deterministic sample (standard IVF
  practice), corpus vectors assigned to their nearest-centroid inverted
  list via an Arrow GEMM, queries probe only the `nprobe` nearest lists.
  Query cost ∝ nprobe/n_centroids of the corpus; the cell column is the
  natural bucketing/partition key for the corpus table at rest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cortex_spark.functions.similarity import dot_col, l2_norm_col
from cortex_spark.linker.lsh import add_lsh_bands


def _cosine_from_norms(q_vec, c_vec, q_norm, c_norm):
    """cosine(q, c) with the per-row L2 norms factored out of the pair join.

    cosine_col would re-evaluate both interpreted norm aggregates once per
    PAIR (|corpus|x|queries| times); computing each row's norm once before
    the join cuts the per-pair work to the dot product alone. Bit-identical
    to cosine_col: same fold order, same doubles, and IEEE multiplication is
    commutative so q_norm*c_norm == l2(q)*l2(c) exactly."""
    denom = q_norm * c_norm
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_col(q_vec, c_vec) / denom)


def ann_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, score, rank ≤ k); exact, deterministic
    tie-break on neighbor id."""
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm_col(F.col(vec_col)).alias("c_norm"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm_col(F.col(vec_col)).alias("q_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cosine_from_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 7,
) -> DataFrame:
    """LSH-bucketed top-k: only candidates sharing ≥1 band are scored."""
    dim_row = corpus.select(F.size(vec_col).alias("d")).filter("d is not null").first()
    dim = int(dim_row["d"]) if dim_row else 384
    c = add_lsh_bands(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec", dim, n_planes, bands, seed,
    ).select(
        "neighbor_id", "c_vec", l2_norm_col(F.col("c_vec")).alias("c_norm"),
        F.explode("lsh_sigs").alias("sig"),
    )
    q = add_lsh_bands(
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec", dim, n_planes, bands, seed,
    ).select(
        "query_id", "q_vec", l2_norm_col(F.col("q_vec")).alias("q_norm"),
        F.explode("lsh_sigs").alias("sig"),
    )
    cands = (
        c.join(q, "sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id", "neighbor_id",
            _cosine_from_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return cands.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _ivf_sample(corpus, vec_col: str, corpus_id: str, sample_cap: int, seed: int, n: int):
    """The quantizer-fit sample query: hash-threshold filter to ~2×cap
    survivors, then TakeOrderedAndProject over that tiny set. No Exchange,
    no global Sort anywhere in the plan (pytest-audited)."""
    h = F.xxhash64(F.col(corpus_id).cast("string"), F.lit(seed))
    k = max(1, n // (2 * sample_cap))
    return (
        corpus.select(F.col(vec_col).alias("v"), F.col(corpus_id).alias("i"))
        .filter(F.col("v").isNotNull())
        .filter(F.pmod(h, F.lit(k)) == 0)
        .orderBy(h)
        .limit(sample_cap)
    )


def fit_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    corpus_id: str = "vec_id",
    n_centroids: int = 16,
    sample_cap: int = 2048,
    iters: int = 8,
    seed: int = 7,
    n_rows: int | None = None,
):
    """Spherical k-means on a deterministic hash-thresholded sample
    (driver-side Lloyd iterations — the coarse quantizer is always
    sample-trained; only assignment is distributed). Returns an
    L2-normalized (n_centroids, dim) float32 numpy array.

    Sampling never total-orders the corpus: a pmod(xxhash64) filter keeps
    ~2×sample_cap rows (id-deterministic, partition-layout-independent),
    and only that small survivor set goes through TakeOrderedAndProject.
    The old orderBy-then-limit kept a sample_cap heap per partition and
    merged num_partitions×cap rows on the driver — a real job at 100 TB.

    Pass `n_rows` (the same contract as candidate_topk) to skip the count
    job entirely — the count only sizes the pmod modulus, so an estimate
    within ~2× is fine; without it one metadata-backed count runs."""
    n = n_rows if n_rows is not None else corpus.count()  # metadata-backed: no shuffle
    sample = _ivf_sample(corpus, vec_col, corpus_id, sample_cap, seed, n).collect()
    X = np.array([r["v"] for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C.astype(np.float32)


def _cell_udf(centroids, nprobe: int):
    """Arrow pandas UDF: vector → its `nprobe` nearest-centroid cell ids
    (batched float32 GEMM; one row of the centroid matrix is broadcast to
    every executor inside the serialized UDF closure)."""
    C = centroids  # (n_centroids, dim) float32, normalized

    @F.pandas_udf("array<int>")
    def cells(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.array(v.tolist(), dtype=np.float32)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        n = min(nprobe, C.shape[0])
        # argpartition then exact sort of the head — O(n_centroids) per row
        idx = np.argpartition(-sims, n - 1, axis=1)[:, :n]
        order = np.take_along_axis(-sims, idx, axis=1).argsort(axis=1)
        top = np.take_along_axis(idx, order, axis=1)
        return pd.Series([row.astype(int).tolist() for row in top])

    return cells


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    centroids=None,
    n_rows: int | None = None,
) -> DataFrame:
    """IVF top-k: corpus vectors live in their top-1 centroid cell, each
    query probes its `nprobe` nearest cells, exact cosine rescore + window
    rank inside the probed lists only. Pass precomputed `centroids` to
    reuse a fitted quantizer (the persisted-index pattern)."""
    C = centroids if centroids is not None else fit_ivf_centroids(
        corpus, vec_col, corpus_id, n_centroids, seed=seed, n_rows=n_rows
    )
    # null-embedding rows are dropped on BOTH sides (the same contract as
    # the linker paths); _cell_udf would otherwise fail the whole stage on a
    # ragged batch
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).filter(F.col("c_vec").isNotNull()).withColumn("cell", _cell_udf(C, 1)(F.col("c_vec"))[0]).withColumn(
        "c_norm", l2_norm_col(F.col("c_vec"))
    )
    q = (
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .filter(F.col("q_vec").isNotNull())
        .withColumn("cell", F.explode(_cell_udf(C, nprobe)(F.col("q_vec"))))
        .withColumn("q_norm", l2_norm_col(F.col("q_vec")))
    )
    cands = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            _cosine_from_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return cands.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


class IvfIndexStore:
    """Persisted IVF index: centroids as a small parquet, corpus
    assignments written `partitionBy("cell")` — the inverted lists ARE
    parquet partitions, so a probe's `cell IN (...)` filter partition-prunes
    the scan to the probed lists (pytest asserts the pruned file count).
    The at-rest layout a 100 TB embedding corpus would use."""

    def __init__(self, root: str, spark) -> None:
        import os

        self.root = root
        self.spark = spark
        self.centroids_path = os.path.join(root, "centroids")
        self.lists_path = os.path.join(root, "lists")

    def build(
        self,
        corpus: DataFrame,
        corpus_id: str = "vec_id",
        vec_col: str = "embedding",
        n_centroids: int = 16,
        seed: int = 7,
        n_rows: int | None = None,
    ) -> None:
        C = fit_ivf_centroids(corpus, vec_col, corpus_id, n_centroids, seed=seed, n_rows=n_rows)
        rows = [(int(i), [float(x) for x in row]) for i, row in enumerate(C)]
        self.spark.createDataFrame(rows, "cell int, centroid array<float>").coalesce(1).write.mode(
            "overwrite"
        ).parquet(self.centroids_path)
        assigned = corpus.select(
            F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ).filter(F.col("c_vec").isNotNull()).withColumn("cell", _cell_udf(C, 1)(F.col("c_vec"))[0])
        assigned.write.mode("overwrite").partitionBy("cell").parquet(self.lists_path)

    def centroids(self):
        rows = self.spark.read.parquet(self.centroids_path).orderBy("cell").collect()
        return np.array([r["centroid"] for r in rows], dtype=np.float32)

    def probe(
        self,
        queries: DataFrame,
        k: int = 10,
        query_id: str = "vec_id",
        vec_col: str = "embedding",
        nprobe: int = 4,
    ) -> DataFrame:
        """Top-k over the persisted lists; reads ONLY the probed cells."""
        C = self.centroids()
        q = (
            queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("q_vec"))
            .filter(F.col("q_vec").isNotNull())
            .withColumn("cell", F.explode(_cell_udf(C, nprobe)(F.col("q_vec"))))
            .localCheckpoint(eager=True)
        )
        cells = [r["cell"] for r in q.select("cell").distinct().collect()]
        lists = self.spark.read.parquet(self.lists_path).filter(F.col("cell").isin(cells))
        cands = (
            lists.withColumn("c_norm", l2_norm_col(F.col("c_vec")))
            .join(F.broadcast(q.withColumn("q_norm", l2_norm_col(F.col("q_vec")))), "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id", "neighbor_id",
                _cosine_from_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
                ).alias("score"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
        return cands.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
