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


def test_cli_node_crud(spark, cli_store, capsys):
    created = json.loads(_run(
        capsys, "--store", cli_store, "node", "create",
        "--kind", "decision", "--title", "CLI-created decision",
        "--body", "made via the CLI", "--tags", "cli,test"))
    nid = created["node_id"]
    assert created["kind"] == "decision"

    got = json.loads(_run(capsys, "--store", cli_store, "node", "get", nid))
    assert got["title"] == "CLI-created decision" and got["tags"] == ["cli", "test"]

    listed = json.loads(_run(
        capsys, "--store", cli_store, "node", "list", "--kind", "decision", "--limit", "5"))
    assert any(n["node_id"] == nid for n in listed)

    st = json.loads(_run(capsys, "--store", cli_store, "node", "stats", nid))
    assert st["access_count"] == 0 and st["deleted"] is False

    deleted = json.loads(_run(capsys, "--store", cli_store, "node", "delete", nid, "-y"))
    assert deleted["deleted"] == nid
    st2 = json.loads(_run(capsys, "--store", cli_store, "node", "stats", nid))
    assert st2["deleted"] is True

    # mutations left audit entries queryable through the audit command
    entries = json.loads(_run(capsys, "--store", cli_store, "audit", "--node", nid))
    assert {e["action"] for e in entries} == {"node.created", "node.deleted"}


def test_cli_edge_traverse_path(spark, cli_store, capsys):
    a = json.loads(_run(capsys, "--store", cli_store, "node", "create",
                        "--kind", "fact", "--title", "edge-test A", "--body", "a"))
    b = json.loads(_run(capsys, "--store", cli_store, "node", "create",
                        "--kind", "fact", "--title", "edge-test B", "--body", "b"))
    e = json.loads(_run(capsys, "--store", cli_store, "edge", "create",
                        "--from", a["node_id"], "--to", b["node_id"],
                        "--relation", "related_to", "--weight", "0.9"))
    assert e["edge_id"]

    out = json.loads(_run(capsys, "--store", cli_store, "edge", "list",
                          "--node", a["node_id"], "--direction", "outgoing"))
    assert [x["dst"] for x in out] == [b["node_id"]]

    trav = json.loads(_run(capsys, "--store", cli_store, "traverse", a["node_id"],
                           "--depth", "1", "--direction", "outgoing"))
    assert {t["node_id"] for t in trav} == {a["node_id"], b["node_id"]}

    path = json.loads(_run(capsys, "--store", cli_store, "path",
                           a["node_id"], b["node_id"]))
    assert path["path"] == [a["node_id"], b["node_id"]] and path["hops"] == 1


def test_cli_import_export(spark, cli_store, capsys, tmp_path):
    src = tmp_path / "import.jsonl"
    src.write_text('{"kind": "fact", "title": "imported one", "body": "bb"}\n'
                   '{"kind": "goal", "title": "imported two", "body": "cc"}\n')
    dry = json.loads(_run(capsys, "--store", cli_store, "import", str(src),
                          "--dry-run", "--source", "mig1"))
    assert dry["would_import"] == 2
    done = json.loads(_run(capsys, "--store", cli_store, "import", str(src),
                           "--source", "mig1"))
    assert done["imported"] == 2
    listed = json.loads(_run(capsys, "--store", cli_store, "node", "list",
                             "--source", "mig1"))
    assert {n["title"] for n in listed} == {"imported one", "imported two"}

    md = tmp_path / "note.md"
    md.write_text("# A markdown note\n\nbody text here\n")
    mdone = json.loads(_run(capsys, "--store", cli_store, "import", str(md)))
    assert mdone["imported"] == 1 and mdone["format"] == "markdown"

    out_gml = tmp_path / "g.graphml"
    ex = json.loads(_run(capsys, "--store", cli_store, "export",
                         "--output", str(out_gml), "--format", "graphml"))
    assert ex["nodes"] > 0
    import xml.etree.ElementTree as ET

    root = ET.parse(out_gml).getroot()  # well-formed XML
    assert root.tag.endswith("graphml")

    out_dot = tmp_path / "g.dot"
    json.loads(_run(capsys, "--store", cli_store, "export",
                    "--output", str(out_dot), "--format", "dot", "--kind", "decision"))
    assert out_dot.read_text().startswith("digraph")


def test_cli_prompt_agent_config_migrate(spark, cli_store, capsys, tmp_path):
    # seed a prompt + agent + uses binding directly into the store
    from datetime import datetime

    from pyspark.sql import functions as F

    from cortex_spark.prompt_graph import create_prompt
    from cortex_spark.schemas import EDGES, NODES

    nodes = spark.read.parquet(f"{cli_store}/canonical_nodes/data")
    edges = spark.read.parquet(f"{cli_store}/canonical_edges/data")
    n2, _, pid = create_prompt(
        nodes, edges, "helper", {"role": "assistant"}, "tester", datetime(2026, 1, 2))
    prompt_rows = n2.join(nodes.select("node_id"), "node_id", "left_anti")
    now = datetime(2026, 1, 2)
    agent_row = spark.createDataFrame(
        [("agent-x", "agent", "kai", "", {}, [], None, "cli", None, "cli",
          0.5, 0, now, now, now, False)], NODES)
    uses = spark.createDataFrame(
        [("agent-x-uses", "agent-x", pid, "uses", 1.0, ("manual", None, None), now, now)], EDGES)
    prompt_rows.unionByName(agent_row).write.mode("append").partitionBy("kind").parquet(
        f"{cli_store}/canonical_nodes/data")
    uses.write.mode("append").partitionBy("relation").parquet(
        f"{cli_store}/canonical_edges/data")
    from cortex_spark.pipeline.checkpoint import CheckpointStore

    store = CheckpointStore(cli_store, spark)
    store.refresh_manifest("canonical_nodes")
    store.refresh_manifest("canonical_edges")

    pl = json.loads(_run(capsys, "--store", cli_store, "prompt", "list"))
    assert any(p["slug"] == "helper" for p in pl)
    pg = json.loads(_run(capsys, "--store", cli_store, "prompt", "get", "helper"))
    assert pg["slug"] == "helper" and pg["content"]["role"] == "assistant"

    al = json.loads(_run(capsys, "--store", cli_store, "agent", "list"))
    assert any(a["name"] == "kai" for a in al)
    ash = json.loads(_run(capsys, "--store", cli_store, "agent", "show", "kai"))
    assert len(ash["prompts"]) == 1
    ar = json.loads(_run(capsys, "--store", cli_store, "agent", "resolve", "kai"))
    assert ar["effective"][0]["resolved"]["content"]["role"] == "assistant"

    # config validate/show against the reference's own example file
    import shutil

    ref_toml = "/root/reference/cortex.example.toml"
    cfg_path = tmp_path / "cortex.toml"
    if not __import__("os").path.exists(ref_toml):
        cfg_path.write_text("[auto_linker]\nsimilarity_threshold = 0.8\n")
    else:
        shutil.copy(ref_toml, cfg_path)
    v = json.loads(_run(capsys, "--config", str(cfg_path), "config", "validate"))
    assert v["valid"] is True
    shown = json.loads(_run(capsys, "--config", str(cfg_path), "config", "show"))
    assert "linker" in shown

    mig = json.loads(_run(capsys, "--store", cli_store, "migrate"))
    assert mig["to"] == 1


def test_cli_errors(spark, cli_store, capsys):
    from cortex_spark.cli import main

    # store-requiring command without --store → clear usage error, rc 2
    assert main(["stats"]) == 2
    err = capsys.readouterr().err
    assert "--store" in err

    # unknown node → error, not a traceback
    assert main(["--store", cli_store, "node", "get", "nope"]) == 2
    # delete without -y refuses
    assert main(["--store", cli_store, "node", "delete", "nope", ]) == 2


def test_cli_backup_restore(spark, cli_store, capsys, tmp_path):
    dest = str(tmp_path / "bk")
    out = json.loads(_run(capsys, "--store", cli_store, "backup", dest))
    assert out["backed_up"] > 0
    restored = str(tmp_path / "re")
    out2 = json.loads(_run(capsys, "--store", restored, "restore", dest))
    assert out2["restored"] == out["backed_up"]
    results = json.loads(_run(capsys, "--store", restored, "doctor"))
    # CLI-created nodes have no embeddings yet -> coverage warning is expected
    assert all(r["status"] != "error" for r in results)


def test_cli_agent_bind_select_observe_history(spark, cli_store, capsys, tmp_path):
    """The agent↔prompt binding lifecycle (cli/agent.rs AgentCommands):
    bind → select → observe (EMA weight update) → history → unbind."""
    # a second prompt to bind (the module fixture seeded 'helper' + agent kai)
    mig = tmp_path / "prompts.json"
    mig.write_text(json.dumps([
        {"slug": "reviewer", "sections": {"role": "reviewer"}},
        {"slug": "helper", "sections": {"role": "assistant v2"}},  # new version
    ]))
    dry = json.loads(_run(capsys, "--store", cli_store, "prompt", "migrate", str(mig),
                          "--dry-run"))
    assert dry["would_import"] == 2
    out = json.loads(_run(capsys, "--store", cli_store, "prompt", "migrate", str(mig)))
    assert {i["slug"] for i in out["imported"]} == {"reviewer", "helper"}
    # helper's HEAD advanced to v2 via a supersedes edge
    pg = json.loads(_run(capsys, "--store", cli_store, "prompt", "get", "helper"))
    assert pg["version"] == 2 and pg["content"]["role"] == "assistant v2"

    b = json.loads(_run(capsys, "--store", cli_store, "agent", "bind", "kai", "reviewer",
                        "--weight", "0.8"))
    assert b["weight"] == 0.8
    show = json.loads(_run(capsys, "--store", cli_store, "agent", "show", "kai"))
    assert len(show["prompts"]) == 2

    sel = json.loads(_run(capsys, "--store", cli_store, "agent", "select", "kai",
                          "--sentiment", "0.9", "--epsilon", "0.0"))
    # epsilon 0 -> greedy: the highest-weight binding wins (helper @ 1.0)
    assert sel["explored"] is False and sel["score"] > 0

    pl = json.loads(_run(capsys, "--store", cli_store, "prompt", "list"))
    reviewer_id = next(p["node_id"] for p in pl if p["slug"] == "reviewer")
    ob = json.loads(_run(capsys, "--store", cli_store, "agent", "observe", "kai",
                         "--variant-id", reviewer_id,
                         "--sentiment-score", "1.0", "--task-outcome", "success"))
    # perfect observation pulls the weight UP via EMA (alpha=0.1)
    assert ob["new_weight"] > ob["old_weight"]
    assert abs(ob["obs_score"] - 1.0) < 1e-6  # 0.5*1 + 0.3*1 + 0.2*1

    hist = json.loads(_run(capsys, "--store", cli_store, "agent", "history", "kai"))
    assert len(hist) == 1 and hist[0]["outcome"] == "success"

    perf = json.loads(_run(capsys, "--store", cli_store, "prompt", "performance", "reviewer"))
    assert perf and perf[0]["n"] == 1

    un = json.loads(_run(capsys, "--store", cli_store, "agent", "unbind", "kai", "reviewer"))
    assert un["unbound"] == "reviewer"
    show2 = json.loads(_run(capsys, "--store", cli_store, "agent", "show", "kai"))
    assert len(show2["prompts"]) == 1


def test_cli_prompt_deploy_rollback_status(spark, cli_store, capsys):
    dep = json.loads(_run(capsys, "--store", cli_store, "prompt", "deploy", "helper",
                          "--agent-name", "kai"))
    assert dep["quarantined"] is False and "baseline" in dep
    st = json.loads(_run(capsys, "--store", cli_store, "prompt", "rollback-status", "helper"))
    assert st["quarantined"] is False and st["trigger"] is None
    unq = json.loads(_run(capsys, "--store", cli_store, "prompt", "unquarantine", "helper"))
    assert unq["quarantined"] is False


def test_cli_review_fixes(spark, cli_store, capsys, tmp_path):
    """Round-3 review regressions: pretty-printed JSON import, duplicate
    node create, strict --since parsing, orphan-free export, no stale
    data_tmp copies left in the store."""
    from cortex_spark.cli import main

    # pretty-printed whole-file array imports via --format json (multiLine)
    arr = tmp_path / "export.json"
    arr.write_text('[\n {"kind": "fact", "title": "arr one", "body": "x"},\n'
                   ' {"kind": "goal", "title": "arr two", "body": "y"}\n]\n')
    done = json.loads(_run(capsys, "--store", cli_store, "import", str(arr),
                           "--format", "json", "--source", "arr"))
    assert done["imported"] == 2
    listed = json.loads(_run(capsys, "--store", cli_store, "node", "list", "--source", "arr"))
    assert {n["title"] for n in listed} == {"arr one", "arr two"}
    # the same file as jsonl is unparseable -> clear error, not garbage rows
    assert main(["--store", cli_store, "import", str(arr), "--format", "jsonl"]) == 2

    # duplicate create rejected (same content hash)
    c = json.loads(_run(capsys, "--store", cli_store, "node", "create",
                        "--kind", "fact", "--title", "dupcheck", "--body", "z"))
    assert main(["--store", cli_store, "node", "create",
                 "--kind", "fact", "--title", "dupcheck", "--body", "z"]) == 2

    # strict --since: garbage and partial-garbage both rejected as JSON errors
    assert main(["--store", cli_store, "audit", "--since", "nonsense"]) == 2
    assert main(["--store", cli_store, "audit", "--since", "24hgarbage"]) == 2
    capsys.readouterr()

    # export never emits edges to tombstoned endpoints
    import xml.etree.ElementTree as ET

    _run(capsys, "--store", cli_store, "node", "delete", c["node_id"], "-y")
    gml = tmp_path / "clean.graphml"
    _run(capsys, "--store", cli_store, "export", "--output", str(gml), "--format", "graphml")
    root = ET.parse(gml).getroot()
    ns = "{http://graphml.graphdrawing.org/xmlns}"
    declared = {n.get("id") for n in root.iter(f"{ns}node")}
    for e in root.iter(f"{ns}edge"):
        assert e.get("source") in declared and e.get("target") in declared

    # table rewrites leave no stale data_tmp copy behind
    import os

    assert not os.path.exists(f"{cli_store}/canonical_nodes/data_tmp")
    assert not os.path.exists(f"{cli_store}/canonical_edges/data_tmp")


def test_cli_init_wizard(tmp_path, monkeypatch, capsys):
    """`init` (cli/init.rs): piped answers → cortex.toml that load_config
    accepts, data dir created; --yes takes every default silently."""
    import io

    from cortex_spark.cli import main
    from cortex_spark.config import load_config

    monkeypatch.chdir(tmp_path)
    out = tmp_path / "cortex.toml"
    # data dir, model=2 (bge-base 768d), autolinker=y, interval 120, nats, agents
    answers = f"{tmp_path / 'store'}\n2\ny\n120\nnats\nkai, scout\n"
    monkeypatch.setattr("sys.stdin", io.StringIO(answers))
    assert main(["init", "--output", str(out)]) == 0
    summary = json.loads(capsys.readouterr().out.strip())
    assert summary["valid"] and summary["embed_dim"] == 768
    assert summary["agents"] == ["kai", "scout"]
    cfg = load_config(str(out))
    assert cfg.embed_dim == 768
    assert cfg.retention.ttl_days_by_kind == {"observation": 90}
    assert (tmp_path / "store").is_dir()
    text = out.read_text()
    assert "bge-base" in text and "nats_enabled = true" in text

    # --yes: no stdin consumed, defaults everywhere (bge-small 384d)
    out2 = tmp_path / "defaults.toml"
    monkeypatch.setattr("sys.stdin", io.StringIO(""))
    assert main(["init", "--output", str(out2), "--yes"]) == 0
    summary = json.loads(capsys.readouterr().out.strip())
    assert summary["embed_dim"] == 384 and summary["agents"] == ["default"]
    assert (tmp_path / "data").is_dir()
    # junk interval answer falls back to 60 (init.rs unwrap_or)
    out3 = tmp_path / "junk.toml"
    monkeypatch.setattr("sys.stdin", io.StringIO("\n\ny\nnot-a-number\n\n\n"))
    assert main(["init", "--output", str(out3)]) == 0
    capsys.readouterr()
    assert "interval_seconds = 60" in out3.read_text()


def test_cli_shell_repl(spark, cli_store, capsys, monkeypatch, tmp_path):
    """`shell` (cli/shell.rs): scripted REPL session — dispatch, quoting,
    builtins, recursion guard, error isolation (a bad command doesn't kill
    the loop)."""
    import io

    from cortex_spark.cli import main

    script = (
        "\n"                       # blank line skipped
        "stats\n"
        'search "deployment decision" -k 2\n'
        "shell\n"                  # recursion guard
        "init\n"                   # wizard blocked inside the REPL
        "definitely-not-a-command\n"  # argparse error must not end the loop
        "node list --limit 1\n"
        "help\n"
        "exit\n"
        "stats\n"                  # after exit: must NOT run
    )
    monkeypatch.setattr("sys.stdin", io.StringIO(script))
    assert main(["--store", cli_store, "shell"]) == 0
    out = capsys.readouterr().out
    lines = [ln for ln in out.strip().splitlines() if ln]
    assert "Already in shell mode." in lines
    assert "Run `init` outside the shell." in lines
    assert "Available commands" in out
    json_lines = [json.loads(ln) for ln in lines if ln.startswith(("{", "["))]
    stats_docs = [d for d in json_lines if isinstance(d, dict) and "node_count" in d]
    assert len(stats_docs) == 1  # once before exit, never after
    hits = [d for d in json_lines if isinstance(d, list) and d and "score" in d[0]]
    assert hits and len(hits[0]) == 2  # quoted query survived shlex

    # shell without --store dies with the standard error contract
    assert main(["shell"]) == 2
    capsys.readouterr()
