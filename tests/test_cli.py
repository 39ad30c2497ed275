"""CLI surface over a real store (cortex-server/src/cli/* analogue)."""

from __future__ import annotations

import json

import pytest


@pytest.fixture(scope="module")
def cli_store(spark, tmp_path_factory):
    from cortex_spark.corpus import synth_pages
    from cortex_spark.pipeline.run import PipelineConfig, run_pipeline

    out = tmp_path_factory.mktemp("cli") / "kg"
    pages = synth_pages(spark, 40, seed=11, partitions=2)
    run_pipeline(spark, pages, str(out), PipelineConfig(embed_dim=32))
    return str(out)


def _run(capsys, *argv) -> str:
    from cortex_spark.cli import main

    rc = main(list(argv))
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    return out


def test_cli_stats_search_neighbors(spark, cli_store, capsys):
    s = json.loads(_run(capsys, "--store", cli_store, "stats"))
    assert s["node_count"] > 0 and s["nodes_by_kind"]

    hits = json.loads(_run(capsys, "--store", cli_store, "search", "deployment decision", "-k", "3"))
    assert len(hits) == 3 and all("node_id" in h and "score" in h for h in hits)

    nbrs = json.loads(_run(capsys, "--store", cli_store, "neighbors", hits[0]["node_id"]))
    assert isinstance(nbrs, list)


def test_cli_briefing_doctor_security(spark, cli_store, capsys):
    agent = json.loads(_run(capsys, "--store", cli_store, "stats"))
    # any agent present in the store works; briefing renders non-empty text
    from cortex_spark.session import get_spark

    sp = get_spark("t")
    a = sp.read.parquet(f"{cli_store}/canonical_nodes/data").select("source_agent").first()[0]
    b = json.loads(_run(capsys, "--store", cli_store, "briefing", a, "--compact"))
    assert b["briefing"]

    results = json.loads(_run(capsys, "--store", cli_store, "doctor"))
    assert all(r["status"] == "ok" for r in results)

    key = _run(capsys, "security", "generate-key")
    import base64

    assert len(base64.b64decode(key)) == 32


def test_cli_backup_restore(spark, cli_store, capsys, tmp_path):
    dest = str(tmp_path / "bk")
    out = json.loads(_run(capsys, "--store", cli_store, "backup", dest))
    assert out["backed_up"] > 0
    restored = str(tmp_path / "re")
    out2 = json.loads(_run(capsys, "--store", restored, "restore", dest))
    assert out2["restored"] == out["backed_up"]
    results = json.loads(_run(capsys, "--store", restored, "doctor"))
    assert all(r["status"] == "ok" for r in results)
