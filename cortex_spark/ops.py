"""Ops tooling for the checkpoint store: backup/restore + health checks
(reference cortex-server/src/cli/backup.rs and doctor.rs).

- backup_store / restore_store: whole-store copy with a per-file sha256
  manifest (the reference writes a .sha256 sidecar and verifies it before
  restoring; here every parquet/json file gets a digest, so partial
  corruption is localized to the damaged file).
- doctor: the reference's health checks re-expressed as distributed
  queries — store accessible, per-stage manifest row counts vs actual
  parquet counts, orphaned edges (src/dst not in the node table), missing
  embeddings, duplicate (src, dst, relation) edges.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

MANIFEST = "_backup_manifest.json"


def _file_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _walk_files(root: str) -> list[str]:
    out = []
    for base, _dirs, files in os.walk(root):
        for f in files:
            if f == MANIFEST or f.startswith("."):
                continue
            out.append(os.path.relpath(os.path.join(base, f), root))
    return sorted(out)


def backup_store(out_dir: str, backup_dir: str) -> dict:
    """Copy the checkpoint-store tree + write a per-file sha256 manifest
    (backup.rs:6-43). Returns the manifest."""
    if not os.path.isdir(out_dir):
        raise FileNotFoundError(f"store not found at {out_dir}")
    if os.path.exists(backup_dir):
        shutil.rmtree(backup_dir)
    shutil.copytree(out_dir, backup_dir)
    files = _walk_files(backup_dir)
    manifest = {
        "source": os.path.abspath(out_dir),
        "files": {f: _file_sha256(os.path.join(backup_dir, f)) for f in files},
    }
    with open(os.path.join(backup_dir, MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def restore_store(backup_dir: str, out_dir: str) -> dict:
    """Verify every file digest against the manifest, then restore
    (backup.rs:45-80: checksum mismatch aborts the restore)."""
    mpath = os.path.join(backup_dir, MANIFEST)
    if not os.path.exists(mpath):
        raise FileNotFoundError(f"backup manifest not found: {mpath}")
    with open(mpath) as fh:
        manifest = json.load(fh)
    bad = []
    for rel, want in manifest["files"].items():
        p = os.path.join(backup_dir, rel)
        if not os.path.exists(p) or _file_sha256(p) != want:
            bad.append(rel)
    if bad:
        raise ValueError(f"backup checksum mismatch — aborting restore: {bad[:5]}")
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    shutil.copytree(backup_dir, out_dir)
    os.remove(os.path.join(out_dir, MANIFEST))
    return manifest


def doctor(spark: SparkSession, out_dir: str) -> list[dict]:
    """Health checks over a pipeline out_dir (doctor.rs:28-130). Returns
    [{name, status ∈ ok|warning|error, detail}]."""
    results: list[dict] = []

    def check(name: str, status: str, detail: str) -> None:
        results.append({"name": name, "status": status, "detail": detail})

    if not os.path.isdir(out_dir):
        check("store accessible", "error", f"{out_dir} not found")
        return results
    check("store accessible", "ok", out_dir)

    tables = {}
    for stage in ("nodes", "edges", "canonical_nodes", "canonical_edges"):
        man_path = os.path.join(out_dir, stage, "_manifest.json")
        data_dir = os.path.join(out_dir, stage, "data")
        if not os.path.exists(man_path):
            continue
        with open(man_path) as fh:
            man = json.load(fh)
        df = spark.read.parquet(data_dir)
        tables[stage] = df
        actual = df.count()
        if actual == man["rows"]:
            check(f"{stage} manifest rows", "ok", f"{actual} rows")
        else:
            check(f"{stage} manifest rows", "error", f"manifest {man['rows']} != actual {actual}")

    nodes = tables.get("canonical_nodes", tables.get("nodes"))
    edges = tables.get("canonical_edges", tables.get("edges"))
    if nodes is not None and edges is not None:
        ids = nodes.select("node_id")
        orphans = (
            edges.select(F.col("src").alias("node_id"))
            .unionByName(edges.select(F.col("dst").alias("node_id")))
            .distinct()
            .join(ids, "node_id", "left_anti")
            .count()
        )
        check("orphaned edges", "ok" if orphans == 0 else "error", f"{orphans} endpoints missing")

        dups = (
            edges.groupBy("src", "dst", "relation")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
        check("duplicate edges", "ok" if dups == 0 else "error", f"{dups} duplicate (src,dst,relation)")

        missing_emb = nodes.filter(~F.coalesce(F.col("deleted"), F.lit(False))).filter(F.col("embedding").isNull()).count()
        check(
            "embedding coverage",
            "ok" if missing_emb == 0 else "warning",
            f"{missing_emb} live nodes without embeddings",
        )
    return results
