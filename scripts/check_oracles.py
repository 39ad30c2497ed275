"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side, compare row count + order-
insensitive value hash (columns sorted by name, floats rounded)."""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entry_mod  # noqa: E402
from cortex_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v))
        elif "float" in str(df[c].dtype):
            df[c] = df[c].astype("float64").round(6)
        elif "int" in str(df[c].dtype).lower():
            df[c] = df[c].astype("int64")
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    return hashlib.sha256(canon(df).to_csv(index=False).encode()).hexdigest()[:16]


def main(sf_dir: str) -> int:
    # NB: briefing / kg_triples / codec-feature goldens are PINNED to the
    # driver's correctness SF (0.01) — running this sweep at another SF
    # fails exactly those queries with a stale-looking hash mismatch.
    print(f"# oracle sweep over {sf_dir}")
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = sys.argv[2:] if len(sys.argv) > 2 else None
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {str(e)[:300]}")
            continue
        ok_rows = len(sdf) == len(odf)
        hs, ho = value_hash(sdf), value_hash(odf)
        status = "OK   " if (ok_rows and hs == ho) else "FAIL "
        if status.startswith("FAIL"):
            failures.append(name)
        print(f"{status}{name}: spark={len(sdf)} duck={len(odf)} hash {'=' if hs==ho else '≠'} [{time.time()-t0:.1f}s]")
        if status.startswith("FAIL") and not ok_rows:
            pass
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
