"""Query/ops CLI over a pipeline store (reference cortex-server/src/cli/*).

The reference ships `cortex` subcommands (stats, search, traverse, node,
briefing, doctor, backup/restore, security). Batch analogue — each command
reads the checkpoint-store parquet written by `cortex_spark.pipeline.run`
and prints one JSON document:

    python -m cortex_spark.cli --store /tmp/kg stats
    python -m cortex_spark.cli --store /tmp/kg search "rollout incident" -k 5
    python -m cortex_spark.cli --store /tmp/kg neighbors <node_id> --direction out
    python -m cortex_spark.cli --store /tmp/kg briefing <agent>
    python -m cortex_spark.cli --store /tmp/kg doctor
    python -m cortex_spark.cli --store /tmp/kg backup /backups/kg1
    python -m cortex_spark.cli --store /tmp/kg restore /backups/kg1
    python -m cortex_spark.cli security generate-key
"""

from __future__ import annotations

import argparse
import json
import sys


def _store_tables(spark, store: str):
    nodes = spark.read.parquet(f"{store}/canonical_nodes/data")
    edges = spark.read.parquet(f"{store}/canonical_edges/data")
    return nodes, edges


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="cortex_spark.cli")
    ap.add_argument("--store", default=None, help="pipeline out_dir (checkpoint store)")
    ap.add_argument("--cpus", type=int, default=8)
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("stats")
    p = sub.add_parser("search")
    p.add_argument("query")
    p.add_argument("-k", type=int, default=10)
    p = sub.add_parser("neighbors")
    p.add_argument("node_id")
    p.add_argument("--direction", default="both", choices=["out", "in", "both"])
    p = sub.add_parser("briefing")
    p.add_argument("agent")
    p.add_argument("--compact", action="store_true")
    sub.add_parser("doctor")
    p = sub.add_parser("backup")
    p.add_argument("dest")
    p = sub.add_parser("restore")
    p.add_argument("src")
    p = sub.add_parser("security")
    p.add_argument("action", choices=["generate-key"])

    args = ap.parse_args(argv)

    if args.cmd == "security":  # no SparkSession needed
        from cortex_spark.crypto import generate_key

        print(generate_key())
        return 0

    if args.cmd in ("backup", "restore"):  # filesystem-only
        from cortex_spark.ops import backup_store

        if args.cmd == "backup":
            man = backup_store(args.store, args.dest)
            print(json.dumps({"backed_up": len(man["files"]), "dest": args.dest}))
            return 0

    from cortex_spark.session import get_spark

    spark = get_spark("cortex-cli", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "restore":
        from cortex_spark.ops import restore_store

        man = restore_store(args.src, args.store)
        print(json.dumps({"restored": len(man["files"]), "store": args.store}))
        return 0

    if args.cmd == "doctor":
        from cortex_spark.ops import doctor

        results = doctor(spark, args.store)
        print(json.dumps(results))
        return 0 if all(r["status"] != "error" for r in results) else 1

    nodes, edges = _store_tables(spark, args.store)

    if args.cmd == "stats":
        from cortex_spark.stats import stats

        print(json.dumps(stats(nodes, edges), default=str))
    elif args.cmd == "search":
        from cortex_spark.hybrid import vector_search

        dim = len(nodes.select("embedding").filter("embedding is not null").first()[0])
        rows = vector_search(nodes, args.query, k=args.k, embed_dim=dim).collect()
        print(json.dumps([
            {"node_id": r["node_id"], "kind": r["kind"], "title": r["title"],
             "score": round(float(r["vector_score"]), 6)}
            for r in rows
        ]))
    elif args.cmd == "neighbors":
        from cortex_spark.graph.traverse import neighbors

        out = neighbors(edges, args.node_id, direction=args.direction).collect()
        print(json.dumps(sorted(r["node_id"] for r in out)))
    elif args.cmd == "briefing":
        from datetime import datetime

        from cortex_spark.briefing import (
            generate_briefing,
            render_briefing_compact,
            render_briefing_markdown,
        )

        report = generate_briefing(nodes, edges, args.agent, now=datetime(2026, 1, 1))
        render = render_briefing_compact if args.compact else render_briefing_markdown
        print(json.dumps({"briefing": render(report, args.agent)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
