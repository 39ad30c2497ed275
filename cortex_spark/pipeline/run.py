"""End-to-end KG-construction pipeline (the spark-submit entry).

    pages ──extract──▶ nodes ──link──▶ edges ──dedup/canonicalize──▶
    canonical node/edge tables (+ per-stage manifests/metrics/checkpoints)

Each stage is checkpointed via CheckpointStore, so a killed run resumes
from the last completed stage with identical output (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

Run:  spark-submit --py-files cortex_spark.zip -m cortex_spark.pipeline.run
      (or `python -m cortex_spark.pipeline.run --pages <parquet> --out <dir>`)
"""

from __future__ import annotations

import argparse
import json
import time
from dataclasses import asdict, dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cortex_spark.canon.dedup import dedup_actions, dedup_pairs
from cortex_spark.canon.merge import canonicalize
from cortex_spark.extract.fused import pages_to_nodes_fused
from cortex_spark.extract.pipeline import pages_to_nodes
from cortex_spark.linker.pipeline import link_nodes
from cortex_spark.linker.rules import LinkerConfig
from cortex_spark.pipeline.checkpoint import CheckpointStore, config_hash


@dataclass
class PipelineConfig:
    embed_dim: int = 384
    embed_seed: int = 42
    langs: tuple[str, ...] = ("en",)
    use_lsh: bool = True
    lsh_planes: int = 16
    lsh_bands: int = 8
    run_dedup: bool = True
    # single-Python-pass extraction kernel (extract/fused.py) — bit-identical
    # to the 3-UDF path (pytest-asserted) but one Arrow boundary instead of 3
    fused_extract: bool = True
    linker: LinkerConfig = field(default_factory=LinkerConfig)
    run_ts: str = "2026-01-01 00:00:00"

    def hash(self) -> str:
        d = asdict(self)
        return config_hash(d)

    @property
    def run_dt(self) -> datetime:
        return datetime.strptime(self.run_ts, "%Y-%m-%d %H:%M:%S").replace(tzinfo=timezone.utc)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    cfg: PipelineConfig | None = None,
) -> dict:
    """Run all stages with checkpoint/resume; returns summary metrics."""
    cfg = cfg or PipelineConfig()
    store = CheckpointStore(out_dir, spark)
    h = cfg.hash()
    t0 = time.time()
    summary: dict = {"config_hash": h, "stages": {}}

    extract_fn = pages_to_nodes_fused if cfg.fused_extract else pages_to_nodes
    nodes, r1 = store.load_or_run(
        "nodes",
        h,
        lambda: extract_fn(
            pages, langs=cfg.langs, embed_dim=cfg.embed_dim, embed_seed=cfg.embed_seed
        ),
        partition_by=["kind"],
    )
    summary["stages"]["nodes"] = asdict(r1)

    lsh_kwargs = {"n_planes": cfg.lsh_planes, "bands": cfg.lsh_bands}
    cand_cache: dict = {}

    def _cands() -> DataFrame:
        # the similarity join is the expensive kernel — compute once, share
        # between the linker and the dedup scanner
        if "c" not in cand_cache:
            from cortex_spark.linker.pipeline import ann_candidates

            cand_cache["c"] = ann_candidates(
                nodes, cfg.linker, use_lsh=cfg.use_lsh, lsh_kwargs=lsh_kwargs
            ).localCheckpoint()
        return cand_cache["c"]

    edges, r2 = store.load_or_run(
        "edges",
        h,
        lambda: link_nodes(nodes, cfg.linker, run_ts=cfg.run_dt, candidates=_cands()),
        partition_by=["relation"],
    )
    summary["stages"]["edges"] = asdict(r2)

    if cfg.run_dedup:
        def _canon_nodes() -> DataFrame:
            from cortex_spark.canon.merge import canonical_map

            pairs = dedup_pairs(nodes, cfg.linker.dedup_threshold, candidates=_cands())
            actions = dedup_actions(pairs, nodes, edges)
            n2, e2 = canonicalize(nodes, edges, actions, run_ts=cfg.run_dt)
            # stash edges + canonical map (for the audit log) via closure
            _canon_nodes.edges = e2  # type: ignore[attr-defined]
            _canon_nodes.cmap = canonical_map(actions, nodes, edges)  # type: ignore[attr-defined]
            return n2

        cnodes, r3 = store.load_or_run("canonical_nodes", h, _canon_nodes, partition_by=["kind"])
        summary["stages"]["canonical_nodes"] = asdict(r3)

        def _canon_edges() -> DataFrame:
            if hasattr(_canon_nodes, "edges"):
                return _canon_nodes.edges  # computed this run
            pairs = dedup_pairs(nodes, cfg.linker.dedup_threshold, candidates=_cands())
            actions = dedup_actions(pairs, nodes, edges)
            _, e2 = canonicalize(nodes, edges, actions, run_ts=cfg.run_dt)
            return e2

        cedges, r4 = store.load_or_run("canonical_edges", h, _canon_edges, partition_by=["relation"])
        summary["stages"]["canonical_edges"] = asdict(r4)
    else:
        cnodes, cedges = nodes, edges

    # append-only audit log (policies/audit.rs analogue): one row per
    # mutation, derived from stage outputs; only for stages that ran fresh
    import os

    from cortex_spark.audit import AuditLog, audit_entries, canonicalization_audit

    alog = AuditLog(os.path.join(out_dir, "audit"), spark)
    if not r1.resumed:
        alog.append(audit_entries(nodes, "node.created", cfg.run_dt, actor="ingest"))
    if not r2.resumed:
        alog.append(audit_entries(edges, "edge.created", cfg.run_dt, actor="auto_linker", id_col="edge_id"))
    if cfg.run_dedup and not r3.resumed and hasattr(_canon_nodes, "cmap"):
        dedup_e = cedges.filter(F.col("provenance.ptype") == "auto_dedup")
        alog.append(canonicalization_audit(nodes, _canon_nodes.cmap, dedup_e, cfg.run_dt))
    summary["audit_rows"] = alog.read().count()

    summary["wall_secs"] = time.time() - t0
    summary["triples"] = summary["stages"].get("canonical_edges", summary["stages"]["edges"])["rows"]
    summary["triples_per_sec"] = summary["triples"] / max(summary["wall_secs"], 1e-9)
    return summary


def main() -> None:
    from cortex_spark.corpus import synth_pages
    from cortex_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default=None, help="parquet path of pages table")
    ap.add_argument("--synth", type=int, default=0, help="generate N synthetic pages instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-lsh", action="store_true")
    args = ap.parse_args()

    spark = get_spark("cortex-kg-pipeline")
    pages = (
        synth_pages(spark, args.synth) if args.synth else spark.read.parquet(args.pages)
    )
    cfg = PipelineConfig(use_lsh=not args.no_lsh)
    summary = run_pipeline(spark, pages, args.out, cfg)
    print(json.dumps(summary, default=str))


if __name__ == "__main__":
    main()
