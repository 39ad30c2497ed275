"""Approximate-nearest-neighbor search over an embedding column.

- ann_topk_bruteforce: exact top-k per query — broadcast the (small) query
  set against the corpus, native cosine, window rank. The correctness
  baseline; fine whenever |queries| is broadcastable.
- ann_topk_lsh: the scale path — random-hyperplane bucketing on BOTH sides,
  join on (band, signature), exact rescore, per-query top-k. Probed buckets
  ≪ corpus ⇒ the 100 TB-corpus query cost is proportional to bucket sizes,
  not corpus size. Recall is tunable via (n_planes, bands); falls back to
  brute force within each bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cortex_spark.functions.similarity import cosine_col
from cortex_spark.linker.lsh import add_lsh_bands


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
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("q_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_col(F.col("q_vec"), F.col("c_vec")).alias("score"),
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
    dim_row = corpus.select(F.size(vec_col).alias("d")).first()
    dim = int(dim_row["d"])
    c = add_lsh_bands(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        "c_vec", dim, n_planes, bands, seed,
    ).select("neighbor_id", "c_vec", F.explode("lsh_sigs").alias("sig"))
    q = add_lsh_bands(
        queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("q_vec")),
        "q_vec", dim, n_planes, bands, seed,
    ).select("query_id", "q_vec", F.explode("lsh_sigs").alias("sig"))
    cands = (
        c.join(q, "sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", cosine_col(F.col("q_vec"), F.col("c_vec")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return cands.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
