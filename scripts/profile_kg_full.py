"""Profile the full bench KG pipeline (extract/cands/link/canon) via the
Spark UI REST API: per-phase wall + summed task time, warm (second) sample.

Usage: python scripts/profile_kg_full.py [cpus=32] [n_pages=100000]
Prints one JSON line with per-phase {wall, task_s, jobs} for both samples.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 100000

    from cortex_spark.canon.dedup import dedup_actions, dedup_pairs
    from cortex_spark.canon.merge import canonicalize
    from cortex_spark.corpus import synth_pages
    from cortex_spark.extract.fused import pages_to_nodes_fused
    from cortex_spark.linker.pipeline import ann_candidates, link_nodes
    from cortex_spark.session import get_spark

    spark = get_spark(
        f"profile-kg-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    base = "http://localhost:4040/api/v1"

    def jobs_now():
        apps = json.load(urllib.request.urlopen(base + "/applications", timeout=10))
        app = apps[0]["id"]
        return app, json.load(
            urllib.request.urlopen(f"{base}/applications/{app}/jobs?status=succeeded", timeout=30)
        )

    out = {"cpus": cpus, "n_pages": n_pages, "samples": []}

    for s in range(2):
        marks = []  # (phase, first_job_id, wall)

        def phase(name, fn):
            app, jobs = jobs_now()
            first = max((j["jobId"] for j in jobs), default=-1) + 1
            sc.setJobDescription(f"{name}#{s}")
            t0 = time.time()
            r = fn()
            marks.append((name, first, round(time.time() - t0, 2)))
            sc.setJobDescription(None)
            return r

        t_all = time.time()
        nodes = phase(
            "extract",
            lambda: pages_to_nodes_fused(
                synth_pages(spark, n_pages, seed=42), embed_dim=64
            ).localCheckpoint(),
        )
        n_nodes = nodes.count()
        cands = phase(
            "cands",
            lambda: ann_candidates(nodes, lsh_kwargs={"dim": 64, "n_rows": n_nodes}).localCheckpoint(),
        )
        edges = phase("link", lambda: link_nodes(nodes, candidates=cands).localCheckpoint())
        n_edges = edges.count()

        def canon():
            pairs = dedup_pairs(nodes, candidates=cands)
            actions = dedup_actions(pairs, nodes, edges)
            cnodes, cedges = canonicalize(nodes, edges, actions)
            return cedges.count()

        n_cedges = phase("canon", canon)
        wall_all = round(time.time() - t_all, 2)

        app, jobs = jobs_now()
        jobs = sorted(jobs, key=lambda j: j["jobId"])
        bounds = [(m[0], m[1]) for m in marks] + [("end", 10**9)]
        rec = {"wall": wall_all, "nodes": n_nodes, "edges": n_edges, "cedges": n_cedges}
        for (name, lo), (_, hi) in zip(bounds, bounds[1:]):
            sel = [j for j in jobs if lo <= j["jobId"] < hi]
            # per-job wall from submission/completion times
            def dur(j):
                from datetime import datetime

                f = "%Y-%m-%dT%H:%M:%S.%fGMT"
                return (
                    datetime.strptime(j["completionTime"], f)
                    - datetime.strptime(j["submissionTime"], f)
                ).total_seconds()

            rec[name] = {
                "wall": next(m[2] for m in marks if m[0] == name),
                "jobs": len(sel),
                "job_wall_sum": round(sum(dur(j) for j in sel), 2),
            }
        out["samples"].append(rec)
        for df in (nodes, cands, edges):
            df.unpersist()

    # stage-level task time for the whole app, top 15 stages by task time
    app, _ = jobs_now()
    stages = json.load(
        urllib.request.urlopen(f"{base}/applications/{app}/stages?status=complete", timeout=30)
    )
    top = sorted(stages, key=lambda st: -st.get("executorRunTime", 0))[:15]
    out["top_stages"] = [
        {
            "id": st["stageId"],
            "task_s": round(st["executorRunTime"] / 1000, 1),
            "cpu_s": round(st.get("executorCpuTime", 0) / 1e9, 1),
            "in_mb": round(st.get("inputBytes", 0) / 2**20, 1),
            "sh_r_mb": round(st.get("shuffleReadBytes", 0) / 2**20, 1),
            "sh_w_mb": round(st.get("shuffleWriteBytes", 0) / 2**20, 1),
            "desc": (st.get("description") or st.get("name", ""))[:80],
        }
        for st in top
    ]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
