"""Regenerate the kg_triples golden (goldens/kg_triples_sf0_01.json).

Pure-Python oracle for the exact-path KG triple emission over the frozen
sf0.01 documents subset (doc_id < KG_DOCS, lang='en'). Composes the
PYTHON reference kernels — chunk_text, classify_py, title_py, encode_py,
and a transliteration of the reference rule cascade (the same oracle shape
as tests/test_rules.py) — NOT the Spark engine, so a driver hash-match is
an independent check of the distributed composition:

    documents → pages mapping → chunk → classify/title/tags → validate →
    embed → all-pairs cosine → per-node top-k → rule pass →
    first-rule-wins → per-node cap → (src, dst, relation, weight)

Usage: python scripts/make_kg_golden.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cortex_spark.embed import encode_py  # noqa: E402
from cortex_spark.extract.chunk import chunk_text  # noqa: E402
from cortex_spark.extract.classify import classify_py, title_py  # noqa: E402

KG_DOCS = 500  # frozen fixture: every sf0.01 doc (en-filtered)
KG_CAP = 8  # max_edges_per_node for the driver query (exercises W7 too)
ANN_K = 100
EMBED_DIM = 64
BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)

NEGATION = ["not", "never", "no longer", "stopped", "removed", "deprecated", "replaced", "obsolete"]


def build_nodes(sf_dir: str) -> list[dict]:
    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    nodes = []
    for row in sorted(tbl, key=lambda r: r["doc_id"]):
        if row["doc_id"] >= KG_DOCS or row["lang"] != "en":
            continue
        url = f"https://{row['source']}.example.com/doc/{row['doc_id']}"
        created = (BASE_TS + timedelta(seconds=int(row["doc_id"]) * 60)).replace(tzinfo=None)
        agent = re.match(r"https?://([^/]+)/", url).group(1)
        for idx, chunk in enumerate(chunk_text(row["text"], None)):
            if not chunk.strip():
                continue
            title = title_py(chunk)
            if len(title) > 256 or len(chunk) == 0:
                continue
            kind = classify_py(chunk)
            tags = sorted(set(re.findall(r"(entity[0-9]{3})", chunk.lower())))[:32]
            nid = hashlib.sha256(f"{url}\x00{idx}".encode()).hexdigest()[:32]
            embed_in = f"{kind.capitalize()}: {title}\n{chunk}" + (
                "\ntags: " + ", ".join(tags) if tags else ""
            )
            nodes.append(
                dict(
                    node_id=nid, kind=kind, title=title, body=chunk, tags=tags,
                    agent=agent, session=url, created=created,
                    emb=np.array(encode_py(embed_in, EMBED_DIM, 42), dtype=np.float64),
                    neg=any(
                        w in (title + " " + chunk).lower() for w in NEGATION
                    ),
                )
            )
    return nodes


def rule_pass(a: dict, b: dict, score: float) -> list[tuple[str, float, int]]:
    """(relation, weight, priority) proposals in reference emission order."""
    out = []
    if score >= 0.75:
        out.append(("related_to", score, 0))
    if a["agent"] == b["agent"]:
        out.append(("related_to", 0.3, 1))
    if abs((a["created"] - b["created"]).total_seconds()) <= 1800:
        out.append(("related_to", 0.4, 2))
    shared = len(set(a["tags"]) & set(b["tags"]))
    if shared >= 2:
        out.append(("related_to", min(0.5 * (1 + (shared - 2) * 0.1), 1.0), 3))
    if (a["kind"] == "decision" and b["kind"] == "event" and a["session"] is not None
            and a["session"] == b["session"] and a["created"] < b["created"]):
        out.append(("led_to", 0.6, 4))
    if a["kind"] == "observation" and b["kind"] == "pattern" and score >= 0.7:
        out.append(("instance_of", 0.7, 5))
    if a["kind"] == "fact" and b["kind"] == "fact" and a["created"] > b["created"]:
        wa, wb = set(a["title"].lower().split()), set(b["title"].lower().split())
        j = 1.0 if not wa and not wb else (0.0 if not wa or not wb else len(wa & wb) / len(wa | wb))
        if j >= 0.9:
            out.append(("supersedes", 0.9, 6))
    if score >= 0.80 and a["neg"] != b["neg"]:
        out.append(("contradicts", score, 100))
    return out


def main(sf_dir: str) -> None:
    nodes = build_nodes(sf_dir)
    print(f"{len(nodes)} nodes from {KG_DOCS} docs")
    E = np.stack([n["emb"] for n in nodes])
    norms = np.maximum(np.linalg.norm(E, axis=1), 1e-300)
    sims = (E @ E.T) / np.outer(norms, norms)

    # per-node top-k candidate scan (both orientations), tie-break on b_id
    proposals = []  # (src, dst, relation, weight, priority, score)
    for i, a in enumerate(nodes):
        cands = sorted(
            ((float(sims[i, j]), nodes[j]["node_id"], j) for j in range(len(nodes)) if j != i),
            key=lambda t: (-t[0], t[1]),
        )[:ANN_K]
        for score, _, j in cands:
            for rel, w, prio in rule_pass(a, nodes[j], score):
                proposals.append((a["node_id"], nodes[j]["node_id"], rel, w, prio, score))

    # first-rule-wins per (src, dst, relation)
    best: dict[tuple, tuple] = {}
    for src, dst, rel, w, prio, score in proposals:
        k = (src, dst, rel)
        if k not in best or prio < best[k][1]:
            best[k] = (w, prio, score)

    # per-src cap in (score desc, dst asc, priority asc) order
    by_src: dict[str, list] = {}
    for (src, dst, rel), (w, prio, score) in best.items():
        by_src.setdefault(src, []).append((score, dst, prio, rel, w))
    triples = []
    for src, rows in by_src.items():
        rows.sort(key=lambda t: (-t[0], t[1], t[2]))
        for score, dst, prio, rel, w in rows[:KG_CAP]:
            triples.append([src, dst, rel, round(float(np.float32(w)), 6)])
    triples.sort()
    print(f"{len(triples)} triples")

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "kg_triples_sf0_01.json")
    with open(out, "w") as fh:
        json.dump({"sf_dir": sf_dir, "kg_docs": KG_DOCS, "cap": KG_CAP,
                   "triples": triples}, fh, indent=0)
    print(f"wrote {out}")

    brf = briefing_oracle(nodes, triples)
    out_b = os.path.join(out_dir, "briefing_sf0_01.json")
    with open(out_b, "w") as fh:
        json.dump({"sf_dir": sf_dir, "kg_docs": KG_DOCS, "rows": brf}, fh, indent=0)
    print(f"wrote {out_b} ({len(brf)} rows)")


def briefing_oracle(nodes: list[dict], triples: list[list]) -> list[list]:
    """Pure-Python transliteration of generate_briefing (briefing.py /
    reference briefing/engine.rs:139-289) over the frozen subgraph:
    ranked sections, 2-hop pattern neighborhood, contradiction endpoints,
    ordered seen-set exclusion, global cap, per-section rank window.
    Returns [section, section_idx, section_rank, node_id, kind, title,
    importance] rows."""
    MIN_IMPORTANCE, PER_SECTION, GLOBAL_CAP = 0.3, 10, 50
    DEFAULT_KINDS = {"agent", "decision", "fact", "event", "goal",
                     "preference", "pattern", "observation", "prompt"}
    by_id = {n["node_id"]: n for n in nodes}
    counts: dict[str, int] = {}
    for n in nodes:
        counts[n["agent"]] = counts.get(n["agent"], 0) + 1
    agent = min(counts, key=lambda a: (-counts[a], a))  # busiest, name tie-break
    importance = 0.5  # every extracted node (ingest.rs:119 default)
    a_nodes = [n for n in nodes if n["agent"] == agent]

    def rank(ns, limit=PER_SECTION):
        ns = [n for n in ns if importance >= MIN_IMPORTANCE]
        # (importance desc, access desc, node_id asc) — imp/access constant
        return sorted(ns, key=lambda n: n["node_id"])[:limit]

    sections = []
    sections.append(("identity", rank([n for n in a_nodes if n["kind"] in ("agent", "preference")])))
    sections.append(("goals", rank([n for n in a_nodes if n["kind"] == "goal"])))

    pattern_ids = {n["node_id"] for n in a_nodes if n["kind"] == "pattern"}
    if pattern_ids:
        adj: dict[str, set] = {}
        for s, d, rel, _ in triples:
            if rel in ("applies_to", "instance_of"):
                adj.setdefault(s, set()).add(d)
                adj.setdefault(d, set()).add(s)
        hood = set(pattern_ids)
        frontier = set(pattern_ids)
        for _ in range(2):
            frontier = {v for u in frontier for v in adj.get(u, ()) if v not in hood}
            hood |= frontier
        patt = [by_id[i] for i in hood if i in by_id]
    else:
        patt = []
    sections.append(("patterns", rank(patt)))

    contra = {x for s, d, rel, _ in triples if rel == "contradicts" for x in (s, d)}
    sections.append(("contradictions", rank([by_id[i] for i in contra if i in by_id])))

    # recent events: all frozen-corpus timestamps sit inside the 48 h window
    sections.append(("recent_events", rank([n for n in a_nodes if n["kind"] == "event"])))

    active = sorted(
        (n for n in a_nodes if importance >= MIN_IMPORTANCE),
        key=lambda n: (-n["created"].timestamp(), n["node_id"]),
    )[:PER_SECTION]
    sections.append(("active_context", active))

    novel: dict[str, float] = {}
    for n in nodes:
        if n["kind"] not in DEFAULT_KINDS:
            novel[n["kind"]] = novel.get(n["kind"], 0.0) + importance
    for kind in sorted(novel, key=lambda k: (-novel[k], k)):
        sections.append((f"more_{kind}", rank([n for n in nodes if n["kind"] == kind])))

    seen: set[str] = set()
    out = []
    remaining = GLOBAL_CAP
    for idx, (name, sec) in enumerate(sections):
        if remaining <= 0:
            break
        fresh = [n for n in sec if n["node_id"] not in seen]
        if name == "active_context":
            fresh.sort(key=lambda n: (-n["created"].timestamp(), n["node_id"]))
        else:
            fresh.sort(key=lambda n: n["node_id"])
        picked = fresh[:remaining]
        if not picked:
            continue
        remaining -= len(picked)
        seen |= {n["node_id"] for n in picked}
        for n in picked:
            out.append((name, idx, n))
    # per-section rank window: (imp desc, access desc, node_id asc)
    rows = []
    by_sec: dict[str, list] = {}
    for name, idx, n in out:
        by_sec.setdefault(name, []).append((idx, n))
    for name, entries in by_sec.items():
        entries.sort(key=lambda t: t[1]["node_id"])
        for r, (idx, n) in enumerate(entries, start=1):
            rows.append([name, idx, r, n["node_id"], n["kind"], n["title"], importance])
    rows.sort()
    return rows


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
