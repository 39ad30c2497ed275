"""Connected components vs a pure-Python union-find oracle, on shapes from
FIXTURES §5 cc_chains: chains, stars, cliques, plus seeded random graphs."""

from __future__ import annotations

import random

import pytest

from cortex_spark.canon.components import connected_components


def union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical representative = min id in component
    comps = {}
    for n in nodes:
        comps.setdefault(find(n), set()).add(n)
    out = {}
    for members in comps.values():
        rep = min(members)
        for m in members:
            out[m] = rep
    return out


def run_cc(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = connected_components(df)
    return {r["node_id"]: r["component"] for r in got.collect()}


def check(spark, edges):
    nodes = sorted({x for e in edges for x in e})
    exp = union_find(edges, nodes)
    got = run_cc(spark, edges)
    assert got == exp


def test_chain(spark):
    check(spark, [(f"n{i:02d}", f"n{i+1:02d}") for i in range(10)])


def test_star(spark):
    check(spark, [("hub", f"leaf{i:02d}") for i in range(20)])


def test_clique_plus_islands(spark):
    clique = [(f"c{i}", f"c{j}") for i in range(5) for j in range(i + 1, 5)]
    islands = [("x1", "x2"), ("y1", "y2")]
    check(spark, clique + islands)


def test_two_chains_merged_by_bridge(spark):
    a = [(f"a{i}", f"a{i+1}") for i in range(5)]
    b = [(f"b{i}", f"b{i+1}") for i in range(5)]
    check(spark, a + b + [("a3", "b2")])


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 60
    nodes = [f"v{i:03d}" for i in range(n)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(70)]
    edges = [(u, v) for u, v in edges if u != v]
    check(spark, edges)


@pytest.mark.parametrize("seed", [4, 5])
def test_distributed_kernel_matches_driver_path(spark, seed, monkeypatch):
    """The iterative alternation (the 100 TB path) must produce exactly the
    rows the small-graph driver union-find produces — run both on the same
    graph by forcing the cap to 0."""
    import cortex_spark.canon.components as C

    rng = random.Random(seed)
    nodes = [f"v{i:03d}" for i in range(80)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src string, dst string")

    driver_rows = {(r["node_id"], r["component"]) for r in connected_components(df).collect()}
    monkeypatch.setattr(C, "DRIVER_CC_MAX_EDGES", 0)
    dist_rows = {(r["node_id"], r["component"]) for r in connected_components(df).collect()}
    assert driver_rows == dist_rows
    # and both match the pure-python oracle
    ns = sorted({x for e in edges for x in e})
    exp = set(union_find(edges, ns).items())
    assert dist_rows == exp


@pytest.mark.parametrize(
    "name,edges",
    [
        ("long_chain", [(f"n{i:04d}", f"n{i+1:04d}") for i in range(2000)]),
        ("chain_reversed", [(f"n{i+1:04d}", f"n{i:04d}") for i in range(500)]),
        (
            "dups_both_orientations",
            [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("c", "a"), ("x", "y")],
        ),
        ("two_stars_bridge", [("h1", f"l{i}") for i in range(50)]
         + [("h2", f"m{i}") for i in range(50)] + [("l7", "m9")]),
        ("appearance_order_trap", [("z9", "z8"), ("z8", "z7"), ("a0", "z9")]),
    ],
)
def test_driver_np_kernel_matches_reference(name, edges):
    """_driver_components_np (factorize + min-label propagation, the hot
    driver path) must emit exactly _driver_components' rows on shapes that
    stress it: deep chains (max propagation rounds), duplicate and
    reversed edges, and ids whose factorize appearance order inverts their
    sort order (min code != min id)."""
    from cortex_spark.canon.components import _driver_components, _driver_components_np

    src = [e[0] for e in edges]
    dst = [e[1] for e in edges]
    ref = set(_driver_components(list(zip(src, dst))))
    got = _driver_components_np(src, dst)
    assert set(zip(got["node_id"], got["component"])) == ref


def test_driver_np_kernel_int_ids():
    from cortex_spark.canon.components import _driver_components, _driver_components_np

    edges = [(5, 3), (3, 9), (100, 42), (7, 7 + 1)]
    src = [e[0] for e in edges]
    dst = [e[1] for e in edges]
    ref = set(_driver_components(list(zip(src, dst))))
    got = _driver_components_np(src, dst)
    assert set(zip(got["node_id"], got["component"])) == ref


@pytest.mark.parametrize("thr", [0, 10_000_000])
def test_aqe_toggle_rounds_identical_and_restored(spark, thr, monkeypatch):
    """Rounds below CC_AQE_OFF_MAX_ROWS run with AQE disabled (latency), but
    the output must be identical either way and the session setting must be
    restored afterwards — including when the threshold keeps AQE on."""
    import cortex_spark.canon.components as C

    rng = random.Random(11)
    nodes = [f"v{i:03d}" for i in range(100)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(160)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src string, dst string")

    before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    monkeypatch.setattr(C, "DRIVER_CC_MAX_EDGES", 0)
    monkeypatch.setattr(C, "CC_AQE_OFF_MAX_ROWS", thr)
    got = {(r["node_id"], r["component"]) for r in connected_components(df).collect()}
    assert spark.conf.get("spark.sql.adaptive.enabled", "true") == before
    ns = sorted({x for e in edges for x in e})
    assert got == set(union_find(edges, ns).items())
