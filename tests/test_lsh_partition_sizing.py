"""Output-byte-sized repartition counts for the candidate-topk stages (round-5).

The 512k staged leg measured 78 GB tree RSS in the cands stage vs ≤15 GB in
every other stage (BASELINE.md §Round-5): the GEMM kernel's packed top-k
output (n·bands·(16+k·12) B) and the merge kernel's flattened triplets ride
in a core-count-sized partition count, so per-task buffers grow ∝ corpus.
`sized_partitions` caps them by sizing the two repartitions from the
estimated bytes; results are partition-count-independent (the 256k leg's
cross-parallelism bit-identical signature), which the e2e test re-checks by
forcing a tiny per-partition target.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cortex_spark.linker.lsh import (
    TARGET_PARTITION_BYTES,
    candidate_topk,
    sized_partitions,
)


class TestSizedPartitions:
    def test_small_corpus_keeps_session_default(self):
        # tiny n → both stages stay at the session's shuffle.partitions
        assert sized_partitions(1_000, 20, 100, base=32) == (32, 32)

    def test_512k_leg_geometry(self):
        # the measured hazard: n=1.08M, bands=18 (one band-group pass), k=100
        gemm, merge = sized_partitions(1_080_762, 18, 100, base=16)
        # packed output ≈ 23.6 GB → ~90-95 partitions at the 256 MB target
        assert 80 <= gemm <= 110
        # flattened merge input ×3 sort copies ≈ 117 GB → several hundred
        assert 400 <= merge <= 500
        # per-partition estimate now sits at/under the target
        assert 1_080_762 * 18 * (16 + 100 * 12) / gemm <= TARGET_PARTITION_BYTES

    def test_monotone_in_n_and_capped(self):
        prev = (0, 0)
        for n in (10**4, 10**6, 10**8, 10**10):
            cur = sized_partitions(n, 30, 100, base=8)
            assert cur >= prev
            prev = cur
        assert prev == (65536, 65536)  # the 10^12-doc regime hits the cap

    def test_respects_base_floor(self):
        g, m = sized_partitions(10, 2, 5, base=200)
        assert g == 200 and m == 200


@pytest.mark.usefixtures("spark")
class TestPartitionCountInvariance:
    def test_edges_identical_under_forced_fine_partitioning(self, spark, monkeypatch):
        """Forcing a 64 KB per-partition target (partition count ≫ rows) must
        not change a single candidate pair or score."""
        import cortex_spark.linker.lsh as lsh_mod

        n = 400
        rng = np.random.default_rng(11)
        base_vecs = rng.standard_normal((n, 16)).astype(np.float32)
        rows = [
            (f"n{i:04d}", (base_vecs[i] / np.linalg.norm(base_vecs[i])).tolist())
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "node_id string, embedding array<float>")

        def run():
            out = candidate_topk(df, k=5, dim=16, n_rows=n)
            return sorted(
                (r["a_id"], r["b_id"], round(r["score"], 6))
                for r in out.collect()
            )

        baseline = run()
        monkeypatch.setattr(lsh_mod, "TARGET_PARTITION_BYTES", 64 * 1024)
        forced = run()
        assert forced == baseline
        assert len(baseline) > 0
