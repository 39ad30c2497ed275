"""Deterministic warren-event JSONL fixture for the streaming-autolink oracle.

Pure-Python (pyarrow read, no Spark) and shared VERBATIM by the driver query
(__spark_entry__.q_streaming_autolink) and the independent golden oracle
(scripts/make_streaming_golden.py), so both sides stream byte-identical
event files. Events derive from sf_dir/documents.parquet only — a pure
function of the test data, like every other oracle fixture.

Two batches (even doc_ids → batch 1, odd → batch 2) with disjoint time
ranges: batch-2 timestamps start 2 h after batch-1's so the second
availableNow run's cursor (max created_at of batch 1) classifies exactly
the batch-2 nodes as fresh — the incremental path, not a re-scan.

Field construction keeps the in-batch dedup key (title, source_session)
unique per batch (dropDuplicates keeps an arbitrary survivor otherwise):
ids that drive titles embed the doc_id; `action` is fully unique because
autonomy events have a NULL session. item_id cycles mod 60 so decision and
event nodes share sessions (exercises the DecisionToEvent rule
cross-document).
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta

EVENT_TYPES = [
    "stage.advanced",
    "item.completed",
    "evidence.submitted",
    "gate.approved",
    "gate.rejected",
    "interaction.created",
    "task.picked",
    "autonomy",
    "refinement",
]

BASE_TS = datetime(2026, 3, 1, 0, 0, 0)
N_DOCS = 160  # < 180 = lcm(9 types, 60 sessions): no (title, session) dupes


def warren_event_lines(sf_dir: str, n_docs: int = N_DOCS) -> tuple[list[str], list[str]]:
    """(batch1_lines, batch2_lines): one JSON event per doc_id < n_docs."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).to_pylist()
    batches: tuple[list[str], list[str]] = ([], [])
    for row in sorted(tbl, key=lambda r: r["doc_id"]):
        doc_id = int(row["doc_id"])
        if doc_id >= n_docs:
            continue
        text = row["text"] or ""
        source = row["source"] or "src"
        etype = EVENT_TYPES[doc_id % 9]
        batch = doc_id % 2  # even → batch 1, odd → batch 2
        ts = BASE_TS + timedelta(hours=2 * batch, seconds=30 * doc_id)
        ev = {
            "type": etype,
            "item_id": f"item{doc_id % 60:03d}",
            "stage": f"stage{doc_id % 5}",
            "previous_stage": f"stage{(doc_id + 4) % 5}" if doc_id % 3 else None,
            "title": f"{doc_id}: {text[:40]}",
            "evidence_count": doc_id % 7,
            "evidence_id": f"ev{doc_id:03d}",
            "content": f"doc{doc_id} {text[:200]}",
            "submitted_by": source,
            "gate_id": f"gate{doc_id % 6}",
            "approved_by": source,
            "rejected_by": source,
            "reason": f"reason {text[:30]}",
            "interaction_id": f"int{doc_id:03d}",
            "agent_id": source,
            "channel": "chan",
            "task_id": f"task{doc_id % 20}",
            "picked_by": source,
            "action": f"act{doc_id:03d}",
            "context": f"ctx{doc_id} {text[:120]}",
            "refinement_id": f"ref{doc_id:03d}",
            "ts": ts.strftime("%Y-%m-%d %H:%M:%S"),
        }
        batches[batch].append(json.dumps(ev, sort_keys=True))
    return batches
