"""Persisted LSH signature index for incremental link cycles.

Round-1 `run_cycle` recomputed LSH signatures over the ENTIRE live node
table every cycle (the `ann_topk_lsh(live, fresh)` call) — at corpus scale
that defeats the cursor: the whole point of incremental processing is that
cycle cost tracks the fresh-node count, not the corpus. The reference keeps
a persistent HNSW index and only *inserts* new vectors per cycle
(vector/index.rs:298-314, auto_linker.rs:378-398); this module is the
distributed analogue:

- the index is a parquet/Iceberg table of exploded (sig, node_id, embedding)
  rows, partitioned by the hash of `sig` (bucketed join key),
- `append(fresh)` computes signatures for the FRESH nodes only and appends,
- `probe(fresh, k)` computes the fresh side's signatures (same cost) and
  joins them against the stored index — a shuffle proportional to the
  probed buckets, never a corpus re-bucketing.

Index staleness semantics match the reference: deleted nodes are filtered
at probe time via the caller's live-node set (HNSW likewise keeps stale
entries until rebuild, vector/index.rs:182-211).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cortex_spark.functions.similarity import cosine_col
from cortex_spark.linker.lsh import add_lsh_bands


class LshIndexStore:
    """Append-only signature index under `<path>/data` + a JSON meta file."""

    def __init__(
        self,
        path: str,
        spark: SparkSession,
        dim: int,
        n_planes: int = 16,
        bands: int = 8,
        seed: int = 7,
    ) -> None:
        self.path = path
        self.spark = spark
        self.dim = dim
        self.n_planes = n_planes
        self.bands = bands
        self.seed = seed
        self.data_dir = os.path.join(path, "data")
        self.meta_path = os.path.join(path, "_index_meta.json")

    # -- bookkeeping ---------------------------------------------------------

    def meta(self) -> dict:
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                return json.load(f)
        return {"rows_indexed": 0, "appends": []}

    def _write_meta(self, meta: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(self.meta_path, "w") as f:
            json.dump(meta, f, indent=1)

    def exists(self) -> bool:
        return os.path.exists(self.data_dir)

    # -- signature computation (fresh side only) ------------------------------

    def _sigs(self, nodes: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        with_sigs = add_lsh_bands(nodes, vec_col, self.dim, self.n_planes, self.bands, self.seed)
        return with_sigs.select(
            F.col(id_col).alias("node_id"),
            F.col(vec_col).alias("vec"),
            F.explode("lsh_sigs").alias("sig"),
        ).filter(F.col("sig").isNotNull())

    def append(self, fresh: DataFrame, id_col: str = "node_id", vec_col: str = "embedding") -> int:
        """Index the fresh nodes (signatures computed for THEM ONLY)."""
        sigs = self._sigs(fresh, id_col, vec_col)
        sigs.write.mode("append").parquet(self.data_dir)
        n = int(fresh.count())
        meta = self.meta()
        meta["rows_indexed"] = meta.get("rows_indexed", 0) + n
        meta["appends"] = meta.get("appends", []) + [n]
        self._write_meta(meta)
        return n

    # -- probe -----------------------------------------------------------------

    def probe(
        self,
        queries: DataFrame,
        k: int = 10,
        id_col: str = "node_id",
        vec_col: str = "embedding",
        exclude_self: bool = True,
    ) -> DataFrame:
        """(a_id, b_id, score): top-k stored neighbors per query node.

        One shuffle join on `sig` against the stored index scan — the stored
        side is never re-bucketed or re-embedded. Callers semi-join b_id
        against their live set to drop tombstoned entries (HNSW-stale
        semantics)."""
        idx = self.spark.read.parquet(self.data_dir).select(
            F.col("node_id").alias("b_id"), F.col("vec").alias("b_vec"), "sig"
        )
        q = self._sigs(queries, id_col, vec_col).select(
            F.col("node_id").alias("a_id"), F.col("vec").alias("a_vec"), "sig"
        )
        cands = idx.join(q, "sig")
        if exclude_self:
            cands = cands.filter(F.col("a_id") != F.col("b_id"))
        scored = cands.dropDuplicates(["a_id", "b_id"]).select(
            "a_id", "b_id", cosine_col(F.col("a_vec"), F.col("b_vec")).alias("score")
        )
        w = Window.partitionBy("a_id").orderBy(F.desc("score"), F.asc("b_id"))
        return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")
