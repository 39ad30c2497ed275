"""Regenerate the streaming-autolink golden (goldens/streaming_autolink_sf0_01.json).

Pure-Python oracle for the flagship STREAMING composition (stream_autolink:
JSONL event stream → warren node templating → hashing embeddings →
persisted-LSH-index incremental link cycle → edge appends) over the shared
deterministic two-batch event fixture (cortex_spark/streaming/fixture.py).
Composes the python kernels (encode_py, the LSH hyperplanes, the
tests'/make_kg_golden rule-cascade transliteration) — NOT the Spark engine,
Structured Streaming, or the index store — so a driver hash-match is an
independent end-to-end check of:

  readStream(JSONL) → from_json → warren_events_to_nodes (9 templates,
  in-batch title+session dedup, cross-batch node_id dedup) → embed →
  run_cycle #1 (cursor init now−24h, index build+append, probe top-k,
  rule pass, first-rule-wins, per-node + per-cycle caps, cursor advance) →
  edge append → run_cycle #2 against the ACCUMULATED index and cursor.

Reference parity: the composition the reference runs as a server
(serve.rs:402-441 NATS ingest feeding auto_linker.rs:185-364 cycles).

Usage: python scripts/make_streaming_golden.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
from datetime import datetime, timedelta

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_kg_golden import NEGATION, rule_pass  # noqa: E402  (the validated cascade transliteration)

from cortex_spark.embed import encode_py  # noqa: E402
from cortex_spark.linker.lsh import _hyperplanes  # noqa: E402
from cortex_spark.streaming.fixture import warren_event_lines  # noqa: E402

EMBED_DIM = 64
EMBED_SEED = 42
N_PLANES, BANDS, LSH_SEED = 16, 8, 7  # LshIndexStore defaults
ANN_K = 100  # LinkerConfig.ann_k
EDGE_CAP = 6  # max_edges_per_node passed by the driver query
MAX_EDGES_PER_CYCLE = 2000


def template_node(ev: dict) -> dict | None:
    """warren_events_to_nodes transliteration (streaming/ingest.py:65-140)."""
    t = ev["type"]

    def c(k):  # _c(): coalesce(col, '')
        return ev.get(k) or ""

    if t in ("stage.advanced", "item.completed", "task.picked"):
        kind = "event"
    elif t == "evidence.submitted":
        kind = "fact"
    elif t in ("gate.approved", "gate.rejected", "refinement"):
        kind = "decision"
    elif t == "interaction.created":
        kind = "observation"
    elif t == "autonomy":
        kind = "pattern"
    else:
        return None
    title = {
        "stage.advanced": f"Item {c('item_id')} advanced to {c('stage')}",
        "item.completed": f"Completed: {c('title')}",
        "evidence.submitted": f"Evidence: {c('content')[:50]}",
        "gate.approved": f"Approved: {c('gate_id')} gate for stage {c('stage')}",
        "gate.rejected": f"Rejected: {c('gate_id')} gate for stage {c('stage')}",
        "interaction.created": f"Interaction by {c('agent_id')}",
        "task.picked": f"Task {c('task_id')} picked",
        "autonomy": f"Autonomy: {c('action')}",
        "refinement": f"Refinement by {c('agent_id')}",
    }[t]
    prev = ev.get("previous_stage") or "start"
    ec = ev.get("evidence_count")
    body = {
        "stage.advanced": f"Item progressed from {prev} to {c('stage')}",
        "item.completed": f"Item '{c('title')}' completed with {ec if ec is not None else 0} pieces of evidence",
        "evidence.submitted": c("content"),
        "gate.approved": f"Gate approved by {c('approved_by')}",
        "gate.rejected": f"Rejected by {c('rejected_by')}: {c('reason')}",
        "interaction.created": c("content"),
        "task.picked": f"Task picked by {c('picked_by')} for item {c('item_id')}",
        "autonomy": c("context"),
        "refinement": c("content"),
    }[t]
    session = {
        "interaction.created": ev.get("interaction_id"),
        "refinement": ev.get("refinement_id"),
        "autonomy": None,
    }.get(t, ev.get("item_id"))
    # node_id: sha2(concat_ws('\x00', type, coalesce(title,''), session)) —
    # concat_ws SKIPS null columns, so a NULL session contributes nothing
    parts = [t, title] + ([session] if session is not None else [])
    nid = hashlib.sha256("\x00".join(parts).encode()).hexdigest()[:32]
    created = datetime.strptime(ev["ts"], "%Y-%m-%d %H:%M:%S")
    # embed input (embed.embed_input_col): initcap(kind) + ': ' + title +
    # '\n' + body; tags are always empty for warren nodes → no tag line
    emb32 = np.array(
        encode_py(f"{kind.capitalize()}: {title}\n{body}", EMBED_DIM, EMBED_SEED),
        dtype=np.float32,
    )
    return dict(
        node_id=nid, kind=kind, title=title, body=body, tags=[],
        agent="warren", session=session, created=created,
        emb=emb32.astype(np.float64),
        neg=any(w in (title + " " + body).lower() for w in NEGATION),
    )


def lsh_sigs(emb64: np.ndarray, planes: np.ndarray) -> list[int]:
    """band_sig_udf transliteration: sign bits → per-band packed signatures."""
    rows = N_PLANES // BANDS
    bits = (emb64 @ planes.T) > 0
    weights = (1 << np.arange(rows - 1, -1, -1)).astype(np.int64)
    sigs = bits.reshape(BANDS, rows).astype(np.int64) @ weights
    sigs |= np.arange(BANDS, dtype=np.int64) << 32
    return [int(s) for s in sigs]


def seq_cosine(a: np.ndarray, b: np.ndarray) -> float:
    """cosine_col transliteration: SEQUENTIAL float64 accumulation (Spark's
    F.aggregate folds left-to-right; numpy's pairwise dot could differ in
    the last ulp right at a rule threshold)."""
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot += x * y
        na += x * x
        nb += y * y
    denom = math.sqrt(na) * math.sqrt(nb)
    return 0.0 if denom == 0.0 else dot / denom


def run_cycle_oracle(
    fresh: list[dict], index: list[dict], existing: set[tuple]
) -> list[tuple]:
    """pipeline/incremental.run_cycle + linker/index.probe transliteration.

    `index` holds every node appended so far (fresh included — insert-then-
    search); candidates for a fresh node a = stored nodes sharing ≥1 band
    signature, exact-cosine rescored, top ANN_K by (score desc, b_id asc).
    """
    by_sig: dict[int, list[dict]] = {}
    for n in index:
        for s in n["sigs"]:
            by_sig.setdefault(s, []).append(n)
    proposals = []  # (src, dst, rel, weight, priority, score)
    for a in sorted(fresh, key=lambda n: n["node_id"]):
        cand_ids: dict[str, dict] = {}
        for s in a["sigs"]:
            for b in by_sig.get(s, ()):
                if b["node_id"] != a["node_id"]:
                    cand_ids[b["node_id"]] = b
        scored = sorted(
            ((seq_cosine(a["emb"], b["emb"]), bid) for bid, b in cand_ids.items()),
            key=lambda t: (-t[0], t[1]),
        )[:ANN_K]
        for score, bid in scored:
            b = cand_ids[bid]
            for rel, w, prio in rule_pass(a, b, score):
                if (a["node_id"], bid, rel) not in existing:
                    proposals.append((a["node_id"], bid, rel, w, prio, score))
    # first-rule-wins per (src, dst, relation): lowest priority
    best: dict[tuple, tuple] = {}
    for src, dst, rel, w, prio, score in proposals:
        k = (src, dst, rel)
        if k not in best or prio < best[k][1]:
            best[k] = (w, prio, score)
    # per-src cap in (score desc, dst asc, priority asc) order
    by_src: dict[str, list] = {}
    for (src, dst, rel), (w, prio, score) in best.items():
        by_src.setdefault(src, []).append((score, dst, prio, rel, w))
    kept = []
    for src, rows in by_src.items():
        rows.sort(key=lambda t: (-t[0], t[1], t[2]))
        for score, dst, prio, rel, w in rows[:EDGE_CAP]:
            kept.append((src, dst, rel, w, score))
    # per-cycle global cap, (src asc, score desc, dst asc) order
    kept.sort(key=lambda t: (t[0], -t[4], t[1]))
    return [(s, d, r, w) for s, d, r, w, _ in kept[:MAX_EDGES_PER_CYCLE]]


def main(sf_dir: str) -> None:
    planes = _hyperplanes(EMBED_DIM, N_PLANES, LSH_SEED)
    b1, b2 = warren_event_lines(sf_dir)
    index: list[dict] = []
    seen_ids: set[str] = set()
    existing: set[tuple] = set()
    triples: list[list] = []
    for batch_lines in (b1, b2):
        nodes = []
        batch_keys = set()
        for line in batch_lines:
            n = template_node(json.loads(line))
            if n is None:
                continue
            key = (n["title"], n["session"])
            assert key not in batch_keys, f"fixture dedup-key collision: {key}"
            batch_keys.add(key)
            if n["node_id"] in seen_ids:  # cross-batch anti-join
                continue
            nodes.append(n)
        for n in nodes:
            n["sigs"] = lsh_sigs(n["emb"], planes)
            seen_ids.add(n["node_id"])
        # cursor check: run 1 starts at now−24h, run 2 at max(created) of
        # run 1 — the fixture's 2 h batch gap makes every batch node fresh
        index.extend(nodes)
        edges = run_cycle_oracle(nodes, index, existing)
        for src, dst, rel, w in edges:
            existing.add((src, dst, rel))
            triples.append([src, dst, rel, round(float(np.float32(w)), 6)])
    triples.sort()
    print(f"{len(seen_ids)} nodes, {len(triples)} edges across 2 cycles")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "streaming_autolink_sf0_01.json")
    with open(out, "w") as fh:
        json.dump({"sf_dir": sf_dir, "edge_cap": EDGE_CAP, "triples": triples}, fh, indent=0)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
