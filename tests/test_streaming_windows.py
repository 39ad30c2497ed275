"""Watermarked windowed aggregation + applyInPandasWithState operator
(streaming/windows.py): late-data drop, exactly-once window emission,
state survival across availableNow restarts."""

from __future__ import annotations

import json


def _ev(i: int, item: str, ts: str) -> str:
    return json.dumps(
        {
            "type": "evidence.submitted",
            "item_id": item,
            "evidence_id": f"ev{i}",
            "content": f"payload {i}",
            "submitted_by": "kai",
            "ts": ts,
        }
    )


def test_windowed_counts_watermark_semantics(spark, tmp_path):
    from cortex_spark.streaming.windows import stream_windowed_counts

    src = tmp_path / "events"
    out = tmp_path / "agg"
    src.mkdir()
    # events in hour-windows 00, 01 and 05; watermark delay 2h
    (src / "b1.jsonl").write_text(
        "\n".join(
            [
                _ev(0, "item0", "2026-01-02 00:30:00"),
                _ev(1, "item0", "2026-01-02 00:40:00"),
                _ev(2, "item1", "2026-01-02 01:30:00"),
                _ev(3, "item1", "2026-01-02 05:30:00"),
            ]
        )
        + "\n"
    )
    stream_windowed_counts(spark, str(src), str(out)).awaitTermination(120)
    rows1 = {
        (str(r["window_start"]), r["n"])
        for r in spark.read.parquet(str(out / "window_counts")).collect()
    }
    # final watermark = 05:30 − 2h = 03:30 → hour-00 and hour-01 windows
    # are closed and emitted; the hour-05 window is withheld
    assert rows1 == {("2026-01-02 00:00:00", 2), ("2026-01-02 01:00:00", 1)}

    # run 2: one straggler BEHIND the watermark (dropped — its window is
    # closed) and one event advancing the watermark past hour 05
    (src / "b2.jsonl").write_text(
        "\n".join(
            [
                _ev(4, "item0", "2026-01-02 00:45:00"),  # late beyond watermark
                _ev(5, "item0", "2026-01-02 09:30:00"),  # watermark → 07:30
            ]
        )
        + "\n"
    )
    stream_windowed_counts(spark, str(src), str(out)).awaitTermination(120)
    rows2 = {
        (str(r["window_start"]), r["n"])
        for r in spark.read.parquet(str(out / "window_counts")).collect()
    }
    # hour-05 window now emitted with n=1; the straggler never surfaced —
    # hour-00 still counts 2 and appears exactly once
    assert rows2 == rows1 | {("2026-01-02 05:00:00", 1)}


def test_agent_state_survives_restart(spark, tmp_path):
    from cortex_spark.streaming.windows import stream_agent_state

    src = tmp_path / "events"
    out = tmp_path / "state"
    src.mkdir()
    (src / "b1.jsonl").write_text(
        "\n".join(
            [
                _ev(0, "item0", "2026-01-02 00:10:00"),
                _ev(1, "item0", "2026-01-02 00:20:00"),
                _ev(2, "item1", "2026-01-02 00:30:00"),
            ]
        )
        + "\n"
    )
    stream_agent_state(spark, str(src), str(out)).awaitTermination(120)
    stats1 = {
        r["agent"]: (r["event_count"], str(r["last_seen"]))
        for r in spark.read.parquet(str(out / "agent_stats")).collect()
    }
    assert stats1["item0"] == (2, "2026-01-02 00:20:00")
    assert stats1["item1"] == (1, "2026-01-02 00:30:00")

    # restart with one new file: state (counts) must RESUME, not reset;
    # untouched agents keep their previous row
    (src / "b2.jsonl").write_text(
        "\n".join(
            [
                _ev(3, "item0", "2026-01-02 01:10:00"),
                _ev(4, "item0", "2026-01-02 01:20:00"),
            ]
        )
        + "\n"
    )
    stream_agent_state(spark, str(src), str(out)).awaitTermination(120)
    stats2 = {
        r["agent"]: (r["event_count"], str(r["last_seen"]))
        for r in spark.read.parquet(str(out / "agent_stats")).collect()
    }
    assert stats2["item0"] == (4, "2026-01-02 01:20:00")
    assert stats2["item1"] == (1, "2026-01-02 00:30:00")
