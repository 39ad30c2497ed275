"""North-rule launch mode: `spark-submit --py-files cortex_spark.zip`.

Packages the library with scripts/make_pyfiles.py, then runs the real
pipeline CLI through spark-submit from a clean working directory (the repo
is NOT on the path — cortex_spark must resolve from the zip on both the
driver and the executors), and checks the run's JSON summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str | None:
    found = shutil.which("spark-submit")
    if found:
        return found
    cand = Path(os.environ.get("SPARK_HOME", "/opt/spark")) / "bin" / "spark-submit"
    return str(cand) if cand.exists() else None


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not on this host")
def test_spark_submit_pyfiles_end_to_end(tmp_path):
    sys.path.insert(0, str(REPO / "scripts"))
    from make_pyfiles import build

    zip_path = build(tmp_path / "cortex_spark.zip")
    workdir = tmp_path / "cwd"
    workdir.mkdir()
    shutil.copy(REPO / "scripts" / "submit_main.py", workdir / "submit_main.py")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source of the package
    env["SPARK_MASTER"] = "local[4]"
    out_dir = tmp_path / "kg_out"
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master",
            "local[4]",
            "--py-files",
            str(zip_path),
            "submit_main.py",
            "--synth",
            "30",
            "--out",
            str(out_dir),
        ],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert json_lines, f"no JSON summary in stdout: {proc.stdout[-2000:]}"
    summary = json.loads(json_lines[-1])
    assert summary["stages"]["nodes"]["rows"] > 0
    assert "canonical_edges" in summary["stages"]
    assert summary["triples"] >= 0 and summary["audit_rows"] > 0
    # stage outputs + lineage manifests landed on disk, and the
    # per-partition lineage entries resolve to real parquet files
    assert (out_dir / "nodes" / "_manifest.json").exists()
    assert (out_dir / "canonical_edges" / "_manifest.json").exists()
    man = json.loads((out_dir / "nodes" / "_manifest.json").read_text())
    assert man["lineage"], "per-partition lineage missing"
    data_dir = out_dir / "nodes" / "data"
    for entry in man["lineage"]:
        f = (data_dir / entry["file"]).resolve()
        assert f.is_file() and f.suffix == ".parquet", f"bad lineage path: {entry['file']}"
        assert entry["rows"] > 0
    assert sum(e["rows"] for e in man["lineage"]) == man["rows"]
