"""Per-substage scaling diagnosis for the link pipeline.

Forces materialization between candidate_topk's internal stages to find
which one fails to scale 8→32 cores. Usage:
    python scripts/bench_stages.py <cpus> [n_pages]
Prints one JSON line with per-substage wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 32000

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from cortex_spark.corpus import synth_pages
    from cortex_spark.extract.fused import pages_to_nodes_fused
    from cortex_spark.linker.lsh import add_lsh_bands
    from cortex_spark.linker.pipeline import _attach_attrs
    from cortex_spark.linker.rules import LinkerConfig, apply_link_rules
    from cortex_spark.session import get_spark

    spark = get_spark(f"stages-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": cpus, "n_pages": n_pages}

    t = time.time()
    pages = synth_pages(spark, n_pages, seed=42, partitions=cpus * 2)
    nodes = pages_to_nodes_fused(pages, embed_dim=64).localCheckpoint()
    n_nodes = nodes.count()
    out["extract"] = round(time.time() - t, 2)
    out["nodes"] = n_nodes

    k, bands, seed, max_bucket, target_bucket = 100, 20, 7, 2000, 500
    rows = min(10, max(3, int(np.ceil(np.log2(max(n_nodes / target_bucket, 1.0))))))
    n_planes = rows * bands

    # stage 1: signatures + explode
    t = time.time()
    with_sigs = add_lsh_bands(nodes, "embedding", 64, n_planes, bands, seed)
    sigs = (
        with_sigs.select(
            F.xxhash64(F.col("node_id")).alias("nid"),
            F.col("embedding").alias("vec"),
            F.explode("lsh_sigs").alias("sig"),
        )
        .filter(F.col("sig").isNotNull())
        .localCheckpoint()
    )
    n_sigs = sigs.count()
    out["sig_explode"] = round(time.time() - t, 2)
    out["sig_rows"] = n_sigs

    # stage 2: bucket GEMM top-k (mirrors production candidate_topk:
    # Arrow-native over sig-sorted partitions, zero-copy matrices)
    def bucket_topk_partition(batches):
        import pyarrow as pa

        sig_parts, nid_parts, vec_parts = [], [], []
        for rb in batches:
            if rb.num_rows == 0:
                continue
            vecs = rb.column(rb.schema.get_field_index("vec"))
            sig_parts.append(rb.column(rb.schema.get_field_index("sig")).to_numpy())
            nid_parts.append(rb.column(rb.schema.get_field_index("nid")).to_numpy())
            vec_parts.append(vecs.flatten().to_numpy().astype(np.float32, copy=False).reshape(-1, 64))
        if not sig_parts:
            return
        sig = np.concatenate(sig_parts) if len(sig_parts) > 1 else sig_parts[0]
        nid = np.concatenate(nid_parts) if len(nid_parts) > 1 else nid_parts[0]
        V = np.concatenate(vec_parts) if len(vec_parts) > 1 else vec_parts[0]
        order = np.lexsort((nid, sig))
        sig, nid, V = sig[order], nid[order], V[order]
        starts = np.r_[0, np.flatnonzero(sig[1:] != sig[:-1]) + 1, len(sig)]
        out_a, out_b, out_s, out_counts = [], [], [], []
        for gi in range(len(starts) - 1):
            lo, hi = starts[gi], starts[gi + 1]
            n = hi - lo
            if n < 2:
                continue
            ids, X = nid[lo:hi], V[lo:hi]
            if n > max_bucket:
                ids, X = ids[:max_bucket], X[:max_bucket]
                n = max_bucket
            norms = np.linalg.norm(X, axis=1)
            norms[norms == 0] = 1.0
            Xn = X / norms[:, None]
            S = Xn @ Xn.T
            np.fill_diagonal(S, -np.inf)
            kk = min(k, n - 1)
            top_idx = np.argpartition(-S, kk, axis=1)[:, :kk] if kk < n - 1 else np.argsort(-S, axis=1)[:, :kk]
            out_a.append(ids)
            out_b.append(ids[top_idx].ravel())
            out_s.append(np.take_along_axis(S, top_idx, axis=1).ravel())
            out_counts.append(np.full(n, kk, dtype=np.int64))
        if not out_a:
            return
        a_flat = np.concatenate(out_a)
        counts = np.concatenate(out_counts)
        if int(counts.sum()) >= 2**31:
            raise ValueError("partition output exceeds int32 list offsets")
        offsets = np.r_[0, np.cumsum(counts)].astype(np.int32)
        yield pa.RecordBatch.from_arrays(
            [pa.array(a_flat),
             pa.ListArray.from_arrays(pa.array(offsets), pa.array(np.concatenate(out_b))),
             pa.ListArray.from_arrays(pa.array(offsets), pa.array(np.concatenate(out_s).astype(np.float32)))],
            names=["a_id", "bs", "ss"])

    t = time.time()
    per_bucket = (
        sigs.repartition(cpus * 2, "sig").sortWithinPartitions("sig")
        .mapInArrow(bucket_topk_partition, schema="a_id long, bs array<long>, ss array<float>")
        .localCheckpoint()
    )
    n_pb = per_bucket.count()
    out["bucket_gemm"] = round(time.time() - t, 2)
    out["bucket_rows"] = n_pb

    # stage 3: repartition + vectorized merge
    def merge_topk(batches):
        import pyarrow as pa

        a_parts, b_parts, s_parts = [], [], []
        for rb in batches:
            if rb.num_rows == 0:
                continue
            lens = rb.column(1).value_lengths().to_numpy().astype(np.int64)
            a_parts.append(np.repeat(rb.column(0).to_numpy(), lens))
            b_parts.append(rb.column(1).flatten().to_numpy())
            s_parts.append(rb.column(2).flatten().to_numpy())
        if not a_parts:
            return
        a = np.concatenate(a_parts) if len(a_parts) > 1 else a_parts[0]
        bs = np.concatenate(b_parts) if len(b_parts) > 1 else b_parts[0]
        ss = np.concatenate(s_parts) if len(s_parts) > 1 else s_parts[0]
        order = np.lexsort((bs, a))
        a, bs, ss = a[order], bs[order], ss[order]
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (bs[1:] != bs[:-1])
        starts0 = np.flatnonzero(first)
        ss = np.maximum.reduceat(ss, starts0)
        a, bs = a[starts0], bs[starts0]
        order = np.lexsort((bs, -ss, a))
        a, bs, ss = a[order], bs[order], ss[order]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        counts = np.diff(np.r_[starts, len(a)])
        rank = np.arange(len(a)) - np.repeat(starts, counts)
        keep = rank < k
        import pyarrow as pa

        yield pa.RecordBatch.from_arrays(
            [pa.array(a[keep]), pa.array(bs[keep]), pa.array(ss[keep].astype(np.float64))],
            names=["a_id", "b_id", "score"])

    t = time.time()
    merged = per_bucket.repartition(cpus * 2, "a_id").mapInArrow(
        merge_topk, schema="a_id long, b_id long, score double"
    ).localCheckpoint()
    n_m = merged.count()
    out["merge"] = round(time.time() - t, 2)
    out["pair_rows"] = n_m

    # stage 4: id map-back + attrs + rules + windows
    t = time.time()
    id_map = nodes.select(F.col("node_id").alias("sid"), F.xxhash64(F.col("node_id")).alias("nid"))
    a_map = id_map.select(F.col("nid").alias("a_id"), F.col("sid").alias("a_sid"))
    b_map = id_map.select(F.col("nid").alias("b_id"), F.col("sid").alias("b_sid"))
    pairs = (
        merged.join(F.broadcast(a_map), "a_id")
        .join(F.broadcast(b_map), "b_id")
        .select(F.col("a_sid").alias("a_id"), F.col("b_sid").alias("b_id"), "score")
    )
    live = nodes.filter(~F.col("deleted"))
    with_attrs = _attach_attrs(pairs, live)
    proposed = apply_link_rules(with_attrs, LinkerConfig())
    from pyspark.sql import Window

    w_dup = Window.partitionBy("src", "dst", "relation").orderBy("priority")
    w_cap = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"), F.asc("priority"))
    deduped = (
        proposed.withColumn("rn", F.row_number().over(w_dup)).filter(F.col("rn") == 1).drop("rn")
        .withColumn("cap_rn", F.row_number().over(w_cap)).filter(F.col("cap_rn") <= 50).drop("cap_rn")
    )
    n_e = deduped.count()
    out["rules_windows"] = round(time.time() - t, 2)
    out["edges"] = n_e
    out["total"] = round(sum(v for kk2, v in out.items() if kk2 in ("extract", "sig_explode", "bucket_gemm", "merge", "rules_windows")), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
