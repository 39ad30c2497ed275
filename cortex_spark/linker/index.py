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
entries until rebuild, vector/index.rs:182-211). UPDATED nodes are handled
by version sequencing: every append stamps its rows with a monotonically
increasing `append_seq`; probe deterministically scores each candidate
against the NEWEST version visible in the probed buckets, and `compact()`
(the HNSW-rebuild analogue) rewrites the index dropping all superseded
versions, after which only current vectors can match at all.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cortex_spark.functions.similarity import cosine_col
from cortex_spark.linker.lsh import add_lsh_bands

# Signature rows are written partitionBy("bucket") with
# bucket = pmod(xxhash64(sig), N_BUCKET_PARTS): a probe collects its (≤
# N_BUCKET_PARTS) distinct bucket values driver-side and filters the scan,
# so Spark partition-prunes the index read to the probed buckets — the scan
# cost tracks the query's signature footprint, not the index size.
N_BUCKET_PARTS = 64


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
        center: list[float] | None = None,
    ) -> None:
        self.path = path
        self.spark = spark
        self.dim = dim
        self.n_planes = n_planes
        self.bands = bands
        self.seed = seed
        # optional signature centroid for anisotropic (real-encoder)
        # corpora — persisted with the params so every probe/append uses
        # the exact centroid the index was built with (see band_sig_udf)
        self.center = list(center) if center is not None else None
        self.data_dir = os.path.join(path, "data")
        self.meta_path = os.path.join(path, "_index_meta.json")

    @classmethod
    def open(cls, path: str, spark: SparkSession) -> "LshIndexStore":
        """Re-open an existing index from its persisted meta (dim + LSH
        params travel with the index so any consumer — CLI search, a later
        cycle — probes with the exact signature scheme it was built with)."""
        meta_path = os.path.join(path, "_index_meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        params = meta.get("params")
        if params is None:
            raise ValueError(f"index at {path} has no persisted params; pass them explicitly")
        return cls(
            path, spark, dim=params["dim"], n_planes=params["n_planes"],
            bands=params["bands"], seed=params["seed"],
            center=params.get("center"),
        )

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
        with_sigs = add_lsh_bands(
            nodes, vec_col, self.dim, self.n_planes, self.bands, self.seed,
            center=self.center,
        )
        return with_sigs.select(
            F.col(id_col).alias("node_id"),
            F.col(vec_col).alias("vec"),
            F.explode("lsh_sigs").alias("sig"),
        ).filter(F.col("sig").isNotNull())

    def append(self, fresh: DataFrame, id_col: str = "node_id", vec_col: str = "embedding") -> int:
        """Index the fresh nodes (signatures computed for THEM ONLY)."""
        # materialize once: the sig write and the count below would otherwise
        # each re-run the caller's upstream plan end-to-end
        fresh = fresh.localCheckpoint(eager=True)
        meta = self.meta()
        seq = len(meta.get("appends", []))
        sigs = (
            self._sigs(fresh, id_col, vec_col)
            .withColumn("append_seq", F.lit(seq))
            .withColumn("bucket", F.pmod(F.xxhash64("sig"), F.lit(N_BUCKET_PARTS)))
        )
        sigs.write.mode("append").partitionBy("bucket").parquet(self.data_dir)
        n = int(fresh.count())
        meta["rows_indexed"] = meta.get("rows_indexed", 0) + n
        meta["appends"] = meta.get("appends", []) + [n]
        meta["params"] = {
            "dim": self.dim, "n_planes": self.n_planes, "bands": self.bands, "seed": self.seed,
            "center": self.center,
        }
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
        side is never re-bucketed or re-embedded; only the PROBED buckets
        (broadcast semi-join on the fresh side's sigs) are read, hot buckets
        are capped at `max_bucket` newest-first (the same quadratic-blowup
        guard as candidate_pairs/candidate_topk), and duplicate (a, b)
        candidates resolve to the stored node's NEWEST appended vector
        (max append_seq). Callers semi-join b_id against their live set to
        drop tombstoned entries (HNSW-stale semantics)."""
        from cortex_spark.linker.lsh import DEFAULT_MAX_BUCKET

        idx = self.spark.read.parquet(self.data_dir)
        if "append_seq" not in idx.columns:  # pre-versioning index layout
            idx = idx.withColumn("append_seq", F.lit(0))
        q = self._sigs(queries, id_col, vec_col).select(
            F.col("node_id").alias("a_id"), F.col("vec").alias("a_vec"), "sig"
        )
        if "bucket" in idx.columns:
            # partition pruning: collect the probe's ≤ N_BUCKET_PARTS distinct
            # bucket values (a tiny query-side job) and filter the scan — the
            # index read touches only the probed bucket partitions
            bvals = [
                r["b"]
                for r in q.select(
                    F.pmod(F.xxhash64("sig"), F.lit(N_BUCKET_PARTS)).alias("b")
                ).distinct().collect()
            ]
            idx = idx.filter(F.col("bucket").isin(bvals))
        idx = idx.select(
            F.col("node_id").alias("b_id"), F.col("vec").alias("b_vec"), "sig",
            F.col("append_seq").alias("b_seq"),
        )
        # touch only probed buckets; cap each at max_bucket, newest versions
        # and lowest ids first (deterministic truncation)
        probe_sigs = q.select("sig").distinct()
        idx_hit = idx.join(F.broadcast(probe_sigs), "sig")
        w_cap = Window.partitionBy("sig").orderBy(F.desc("b_seq"), F.asc("b_id"))
        idx_hit = (
            idx_hit.withColumn("rn", F.row_number().over(w_cap))
            .filter(F.col("rn") <= DEFAULT_MAX_BUCKET)
            .drop("rn")
        )
        cands = idx_hit.join(q, "sig")
        if exclude_self:
            cands = cands.filter(F.col("a_id") != F.col("b_id"))
        # newest VISIBLE version of each stored node wins for re-appended
        # (updated) nodes — resolved per b_id across all probed buckets, so
        # a candidate surfaced via a stale version's signature still scores
        # against the newest vector those buckets know (run compact() to
        # drop superseded versions entirely)
        latest_b = cands.groupBy("b_id").agg(
            F.max_by(F.col("b_vec"), F.col("b_seq")).alias("b_latest")
        )
        pairs = cands.select("a_id", "b_id", "a_vec").dropDuplicates(["a_id", "b_id"])
        scored = pairs.join(latest_b, "b_id").select(
            "a_id", "b_id", cosine_col(F.col("a_vec"), F.col("b_latest")).alias("score")
        )
        w = Window.partitionBy("a_id").orderBy(F.desc("score"), F.asc("b_id"))
        return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")

    def compact(self) -> int:
        """Drop all superseded node versions (keep each node_id's rows at
        its max append_seq) — the maintenance analogue of an HNSW rebuild.
        Returns the number of surviving signature rows."""
        idx = self.spark.read.parquet(self.data_dir)
        if "append_seq" not in idx.columns:
            return idx.count()
        latest = idx.groupBy("node_id").agg(F.max("append_seq").alias("append_seq"))
        kept = idx.join(latest, ["node_id", "append_seq"])
        if "bucket" not in kept.columns:  # migrate pre-bucketing layouts
            kept = kept.withColumn("bucket", F.pmod(F.xxhash64("sig"), F.lit(N_BUCKET_PARTS)))
        tmp = self.data_dir + "_compact"
        kept.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
        out = self.spark.read.parquet(tmp)
        n = out.count()
        n_nodes = out.select("node_id").distinct().count()
        out.write.mode("overwrite").partitionBy("bucket").parquet(self.data_dir)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        # refresh the corpus-size hint: after compaction rows_indexed counts
        # surviving distinct nodes, not the append history (hybrid.vector_search
        # reads this driver-side to pick brute-vs-index without a count job)
        meta = self.meta()
        meta["rows_indexed"] = n_nodes
        meta["compacted"] = True
        self._write_meta(meta)
        return n
