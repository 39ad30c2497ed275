"""Connected components via alternating large-star / small-star joins.

The canonicalization kernel (SURVEY §2.8 G12). The reference flood-fills
with BFS from every unvisited node (graph/engine.rs:282-301) — inherently
sequential. The scalable equivalent is the large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14):
O(log² n) rounds of two DataFrame self-joins, each round strictly
shrinking parent pointers toward the component minimum.

Scale notes: every round is two shuffles on node id; `localCheckpoint`
every round cuts the exponential lineage growth that would otherwise blow
up the Catalyst plan; convergence is detected by an aggregate signature
(sum of xxhash64 of sorted edges) instead of expensive DataFrame equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _neighborhoods(edges: DataFrame) -> DataFrame:
    """Symmetric (u, v) adjacency incl. both directions, no self-loops."""
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    return (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Kiveris large-star: neighborhoods over BOTH directions; connect every
    strictly-larger neighbor v of u to m = min(N(u) ∪ {u}).

    No intermediate distinct(): dedup is implicit in the groupBy-min, and
    duplicate (v, m) pairs in the output are semantically harmless — the
    round's single dedup happens once at the end of _small_star. Each
    eliminated distinct() is a whole shuffle stage, and round latency (not
    data volume) dominates this iterative kernel at every scale: the data
    strictly shrinks per round while stage count stays fixed."""
    nbrs = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mv")).select("u", F.least("mv", "u").alias("m"))
    return (
        nbrs.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Kiveris small-star: orient each edge high→low, connect all of u's
    ≤-neighbors (and u) to m = min of that set. Carries the round's ONE
    dedup (the final distinct) — see _large_star on why."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))  # m <= all v <= u
    out = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return out


def _signature(edges: DataFrame) -> int:
    row = edges.select(
        F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)).alias("sig"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    return (int(row["sig"]), int(row["n"]))


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    checkpoint_every: int = 1,
    stats: dict | None = None,
) -> DataFrame:
    """Return (node_id, component) where component = min node id reachable.

    Input: any edge DataFrame with `src`/`dst` string columns. Isolated
    nodes (no edges) are not emitted — callers left-join and coalesce to
    the node's own id. Pass `stats={}` to get the converged round count
    back in stats["rounds"] (scale evidence: rounds grow O(log² n), so a
    super-linear blowup shows up here first).
    """
    spark = edges.sparkSession
    cur = _neighborhoods(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    cur = cur.localCheckpoint(eager=True)
    prev_sig = None
    rounds = 0
    for i in range(max_iterations):
        cur = _small_star(_large_star(cur))
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
        rounds = i + 1
        sig = _signature(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    if stats is not None:
        stats["rounds"] = rounds
    # converged state: edges point each node at its component min
    comp = cur.groupBy("u").agg(F.min("v").alias("component"))
    comp = comp.select(F.col("u").alias("node_id"), "component")
    # the component roots themselves
    roots = comp.select(F.col("component").alias("node_id"), F.col("component")).distinct()
    return (
        comp.unionByName(roots)
        .groupBy("node_id")
        .agg(F.min("component").alias("component"))
    )
