"""Profile the extract+link job's per-job/stage timing via the Spark UI REST
API to locate the non-scaling term in the 2->8 core scaling leg.

Usage: python scripts/profile_link.py [cpus=8] [n_pages=32000]
Prints job rows (wall secs, task-time secs, name) and a summary: total wall,
sum of job walls, driver gap (= wall - job walls), sum task time,
task-time / (wall * cpus) utilization.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 32000

    from cortex_spark.corpus import synth_pages
    from cortex_spark.extract.fused import pages_to_nodes_fused
    from cortex_spark.linker.pipeline import link_nodes
    from cortex_spark.session import get_spark

    spark = get_spark(
        f"profile-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # identical warmup to bench_scaling
    _w = pages_to_nodes_fused(synth_pages(spark, 200, seed=7, partitions=cpus), embed_dim=64)
    link_nodes(_w.localCheckpoint(), use_lsh=True, lsh_kwargs={"dim": 64, "n_rows": _w.count()}).count()

    base = "http://localhost:4040/api/v1"
    apps = json.load(urllib.request.urlopen(base + "/applications", timeout=10))
    app = apps[0]["id"]
    jobs0 = json.load(urllib.request.urlopen(f"{base}/applications/{app}/jobs", timeout=10))
    first_job = max((j["jobId"] for j in jobs0), default=-1) + 1

    t0 = time.time()
    pages = synth_pages(spark, n_pages, seed=42, partitions=cpus * 2)
    nodes = pages_to_nodes_fused(pages, embed_dim=64).localCheckpoint()
    n_nodes = nodes.count()
    t_ex = time.time() - t0
    edges = link_nodes(
        nodes, use_lsh=True, lsh_kwargs={"dim": 64, "n_rows": n_nodes}
    ).localCheckpoint()
    n_edges = edges.count()
    wall = time.time() - t0

    jobs = json.load(urllib.request.urlopen(f"{base}/applications/{app}/jobs", timeout=10))
    jobs = sorted((j for j in jobs if j["jobId"] >= first_job), key=lambda j: j["jobId"])
    stages = json.load(
        urllib.request.urlopen(f"{base}/applications/{app}/stages?status=complete", timeout=10)
    )
    st_by_id = {s["stageId"]: s for s in stages}

    def ts(s):
        return time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S"))

    rows = []
    for j in jobs:
        w = ts(j["completionTime"]) - ts(j["submissionTime"])
        task_ms = sum(
            st_by_id[sid].get("executorRunTime", 0) for sid in j["stageIds"] if sid in st_by_id
        )
        rows.append((j["jobId"], round(w, 1), round(task_ms / 1000, 1), j.get("name", "")[:95]))

    job_wall = sum(r[1] for r in rows)
    task_total = sum(r[2] for r in rows)
    print(f"cpus={cpus} pages={n_pages} nodes={n_nodes} edges={n_edges}")
    print(f"wall={wall:.1f}s extract={t_ex:.1f}s link={wall - t_ex:.1f}s")
    print(f"sum(job wall)={job_wall:.1f}s driver_gap={wall - job_wall:.1f}s "
          f"sum(task time)={task_total:.1f}s util={task_total / (wall * cpus):.2f}")
    for r in rows:
        print(f"  job {r[0]:>3} wall={r[1]:>7.1f}s task={r[2]:>8.1f}s {r[3]}")
    # per-stage detail for the 5 biggest stages
    big = sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:8]
    print("top stages by task time:")
    for s in big:
        print(
            f"  stage {s['stageId']:>3} tasks={s['numCompleteTasks']:>4} "
            f"task={s.get('executorRunTime', 0) / 1000:>8.1f}s "
            f"shufW={s.get('shuffleWriteBytes', 0) >> 20}M shufR={s.get('shuffleReadBytes', 0) >> 20}M "
            f"{s.get('name', '')[:70]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
