"""Backup/restore + doctor (cli/backup.rs, cli/doctor.rs analogues)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cortex_spark.ops import backup_store, doctor, restore_store


@pytest.fixture(scope="module")
def store_dir(spark, tmp_path_factory):
    from cortex_spark.corpus import synth_pages
    from cortex_spark.pipeline.run import PipelineConfig, run_pipeline

    out = tmp_path_factory.mktemp("ops") / "kg"
    pages = synth_pages(spark, 40, seed=5, partitions=2)
    run_pipeline(spark, pages, str(out), PipelineConfig(embed_dim=32))
    return str(out)


def test_doctor_healthy_store(spark, store_dir):
    results = {r["name"]: r for r in doctor(spark, store_dir)}
    assert results["store accessible"]["status"] == "ok"
    assert results["nodes manifest rows"]["status"] == "ok"
    assert results["canonical_edges manifest rows"]["status"] == "ok"
    assert results["orphaned edges"]["status"] == "ok"
    assert results["duplicate edges"]["status"] == "ok"
    assert results["embedding coverage"]["status"] == "ok"


def test_doctor_detects_orphans_and_missing_store(spark, store_dir, tmp_path):
    assert doctor(spark, str(tmp_path / "nope"))[0]["status"] == "error"
    # corrupt a copy: drop half the canonical nodes → orphaned edges
    broken = str(tmp_path / "broken")
    backup_store(store_dir, broken)
    os.remove(os.path.join(broken, "_backup_manifest.json"))
    nodes_dir = os.path.join(broken, "canonical_nodes", "data")
    df = spark.read.parquet(nodes_dir)
    kept = df.limit(max(1, df.count() // 4)).cache()
    kept.count()
    kept.write.mode("overwrite").parquet(nodes_dir + "_new")
    import shutil

    shutil.rmtree(nodes_dir)
    os.rename(nodes_dir + "_new", nodes_dir)
    results = {r["name"]: r for r in doctor(spark, broken)}
    assert results["canonical_nodes manifest rows"]["status"] == "error"
    assert results["orphaned edges"]["status"] == "error"


def test_backup_restore_roundtrip_and_corruption(spark, store_dir, tmp_path):
    bdir = str(tmp_path / "bk")
    manifest = backup_store(store_dir, bdir)
    assert manifest["files"] and all(len(h) == 64 for h in manifest["files"].values())

    # restore to a new location: byte-identical table contents
    rdir = str(tmp_path / "restored")
    restore_store(bdir, rdir)
    a = spark.read.parquet(os.path.join(store_dir, "canonical_edges", "data"))
    b = spark.read.parquet(os.path.join(rdir, "canonical_edges", "data"))
    ha = a.agg(F.sum(F.xxhash64("edge_id").cast("decimal(38,0)"))).first()[0]
    hb = b.agg(F.sum(F.xxhash64("edge_id").cast("decimal(38,0)"))).first()[0]
    assert ha == hb and a.count() == b.count()

    # flip bytes in one backup file → restore refuses
    victim = next(
        os.path.join(bdir, f) for f in manifest["files"] if f.endswith(".parquet")
    )
    with open(victim, "r+b") as fh:
        fh.seek(0)
        fh.write(b"\x00\x01\x02\x03")
    with pytest.raises(ValueError, match="checksum mismatch"):
        restore_store(bdir, str(tmp_path / "never"))
