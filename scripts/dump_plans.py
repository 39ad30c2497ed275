"""Dump .explain("formatted") for declared queries to plans/r06/.

Usage: python scripts/dump_plans.py <before|after> [query ...]
With no query names, dumps every headline bench query. Writes
plans/r06/<query>_<tag>.txt (the judge checks plan claims against these).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "tpch_q1",
    "tpch_q3ish",
    "degree",
    "exact_dedup",
    "minhash_signature",
    "ann_topk",
    "ann_lsh",
    "sessionize",
    "text_profile",
    "classify",
    "extract_text",
    "cc",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entry_mod
    from cortex_spark.session import get_spark

    spark = get_spark("dump-plans", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
