"""Per-substage timing of the bench KG pipeline (bench.py run_kg structure,
with extra localCheckpoint barriers inside the link/canon stages to
attribute wall time). Usage:
    python scripts/bench_kg_substages.py [cpus=32] [n_pages=10000]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 10000

    from pyspark.sql import functions as F

    from cortex_spark.canon.dedup import dedup_actions, dedup_pairs
    from cortex_spark.canon.merge import (
        canonical_map,
        dedup_edges_for_actions,
        merge_node_attrs,
        rewrite_edges,
    )
    from cortex_spark.corpus import synth_pages
    from cortex_spark.extract.fused import pages_to_nodes_fused
    from cortex_spark.linker.pipeline import (
        _attach_attrs,
        ann_candidates,
        first_rule_wins,
        link_nodes,
    )
    from cortex_spark.linker.rules import LinkerConfig, apply_link_rules
    from cortex_spark.session import get_spark

    spark = get_spark(f"substages-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cpus": cpus, "n_pages": n_pages}

    def step(name, fn):
        t = time.time()
        r = fn()
        out[name] = round(time.time() - t, 2)
        return r

    # warmup (same as bench: first kg sample is warm; here a tiny corpus)
    w = pages_to_nodes_fused(synth_pages(spark, 500, seed=7), embed_dim=64).localCheckpoint()
    link_nodes(w, lsh_kwargs={"dim": 64, "n_rows": w.count()}).count()

    nodes = step(
        "extract",
        lambda: pages_to_nodes_fused(synth_pages(spark, n_pages, seed=42), embed_dim=64).localCheckpoint(),
    )
    n_nodes = nodes.count()
    out["nodes"] = n_nodes

    cands = step(
        "cands",
        lambda: ann_candidates(nodes, lsh_kwargs={"dim": 64, "n_rows": n_nodes}).localCheckpoint(),
    )
    out["cand_rows"] = step("cands_count", lambda: cands.count())

    cfg = LinkerConfig()
    live = nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False))).filter(
        F.col("embedding").isNotNull()
    )
    proposals = step(
        "rules", lambda: apply_link_rules(_attach_attrs(cands, live), cfg).localCheckpoint()
    )
    out["proposal_rows"] = proposals.count()

    edges = step("edges_rest", lambda: link_nodes(nodes, candidates=cands).localCheckpoint())
    out["edge_rows"] = edges.count()

    pairs = step("dedup_pairs", lambda: dedup_pairs(nodes, candidates=cands).localCheckpoint())
    out["pair_rows"] = pairs.count()
    actions = step("dedup_actions", lambda: dedup_actions(pairs, nodes, edges).localCheckpoint())
    out["action_rows"] = actions.count()

    from datetime import datetime, timezone

    run_ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    cmap = step("canonical_map", lambda: canonical_map(actions, nodes, edges).localCheckpoint())
    out["cmap_rows"] = cmap.count()
    new_edges = step("rewrite_edges", lambda: rewrite_edges(edges, cmap).localCheckpoint())
    out["rewritten_rows"] = new_edges.count()
    dedup_e = step("dedup_edges", lambda: dedup_edges_for_actions(actions, cmap, run_ts).localCheckpoint())
    all_edges = step(
        "canon_union",
        lambda: new_edges.unionByName(
            dedup_e.join(new_edges.select("src", "dst", "relation"), ["src", "dst", "relation"], "left_anti")
        ).localCheckpoint(),
    )
    out["canonical_edges"] = all_edges.count()
    new_nodes = step("merge_node_attrs", lambda: merge_node_attrs(nodes, cmap, run_ts).localCheckpoint())
    out["node_rows_out"] = new_nodes.count()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
