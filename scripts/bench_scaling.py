"""Scaling-efficiency evidence (north rule): run the SAME KG job on the SAME
input at two parallelism levels (local[8] vs local[32] — the sandbox
stand-in for N vs 4N executors) and report throughput at both plus
efficiency = (throughput_4N / throughput_N) / 4.

Usage: python scripts/bench_scaling.py [n_pages]
Prints one JSON line; paste results into BASELINE.md / BENCH notes.
"""

from __future__ import annotations

import json
import os
import sys
import time


def one_run(cpus: int, n_pages: int) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from cortex_spark.corpus import synth_pages
    from cortex_spark.extract.pipeline import pages_to_nodes
    from cortex_spark.linker.pipeline import link_nodes
    from cortex_spark.session import get_spark

    spark = get_spark(f"scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    pages = synth_pages(spark, n_pages, seed=42, partitions=cpus * 2)
    nodes = pages_to_nodes(pages, embed_dim=64).localCheckpoint()
    n_nodes = nodes.count()
    edges = link_nodes(nodes, use_lsh=True).localCheckpoint()
    n_edges = edges.count()
    secs = time.time() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "secs": round(secs, 2),
        "nodes": n_nodes,
        "triples": n_edges,
        "triples_per_sec": round(n_edges / secs, 1),
    }


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    low = one_run(8, n_pages)
    high = one_run(32, n_pages)
    eff = (high["triples_per_sec"] / low["triples_per_sec"]) / (32 / 8)
    print(
        json.dumps(
            {
                "n_pages": n_pages,
                "low": low,
                "high": high,
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
