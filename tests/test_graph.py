"""Graph operators on the reference's own bench shapes
(benches/storage.rs:120-222): fanout-10 depth-2 tree (111 nodes) and a
26-node chain; plus roots/leaves/degree/reachable."""

from __future__ import annotations

import pytest

from cortex_spark.graph.degree import most_connected
from cortex_spark.graph.paths import dijkstra, shortest_path_unweighted
from cortex_spark.graph.traverse import bfs, leaves, neighbors, reachable, roots
from tests.conftest import make_edge, make_node


def tree_edges(edges_df_factory):
    # root → 10 children → 10 grandchildren each (111 nodes)
    rows = []
    for i in range(10):
        rows.append(make_edge("root", f"c{i}"))
        for j in range(10):
            rows.append(make_edge(f"c{i}", f"g{i}_{j}"))
    return edges_df_factory(rows)


def test_bfs_depths_fanout_tree(spark, edges_df_factory):
    edges = tree_edges(edges_df_factory)
    got = {r["node_id"]: r["depth"] for r in bfs(edges, ["root"], max_depth=3, direction="out").collect()}
    assert got["root"] == 0
    assert got["c3"] == 1
    assert got["g3_7"] == 2
    assert len(got) == 111


def test_bfs_depth_limit(spark, edges_df_factory):
    edges = tree_edges(edges_df_factory)
    got = bfs(edges, ["root"], max_depth=1, direction="out")
    assert got.count() == 11


def test_bfs_min_depth_on_diamond(spark, edges_df_factory):
    # a→b→d and a→d: d must have depth 1, not 2
    edges = edges_df_factory([make_edge("a", "b"), make_edge("b", "d"), make_edge("a", "d")])
    got = {r["node_id"]: r["depth"] for r in bfs(edges, ["a"], direction="out").collect()}
    assert got["d"] == 1


def test_bfs_direction_and_exclude_start(spark, edges_df_factory):
    edges = edges_df_factory([make_edge("a", "b"), make_edge("c", "a")])
    out_only = {r["node_id"] for r in bfs(edges, ["a"], direction="out", include_start=False).collect()}
    assert out_only == {"b"}
    in_only = {r["node_id"] for r in bfs(edges, ["a"], direction="in", include_start=False).collect()}
    assert in_only == {"c"}
    both = {r["node_id"] for r in bfs(edges, ["a"], direction="both", include_start=False).collect()}
    assert both == {"b", "c"}


def test_shortest_path_chain(spark, edges_df_factory):
    # 26-node chain a..z (reference bench shape)
    import string

    letters = string.ascii_lowercase
    edges = edges_df_factory([make_edge(letters[i], letters[i + 1]) for i in range(25)])
    path = shortest_path_unweighted(edges, "a", "z", max_depth=30)
    assert path == list(letters)
    assert shortest_path_unweighted(edges, "z", "a", max_depth=30) is None  # directed


def test_shortest_path_prefers_fewer_hops(spark, edges_df_factory):
    edges = edges_df_factory(
        [make_edge("a", "b"), make_edge("b", "z"), make_edge("a", "c"), make_edge("c", "d"), make_edge("d", "z")]
    )
    assert shortest_path_unweighted(edges, "a", "z") == ["a", "b", "z"]


def test_dijkstra_cost_inversion(spark, edges_df_factory):
    # paths.rs:178: cost = 1-w → the HIGH-weight 2-hop path beats a low-weight direct edge
    edges = edges_df_factory(
        [
            make_edge("a", "z", weight=0.1),  # cost 0.9
            make_edge("a", "m", weight=0.9),  # cost 0.1
            make_edge("m", "z", weight=0.9),  # cost 0.1 → total 0.2
        ]
    )
    r = dijkstra(edges, "a", "z").first()
    assert r["path"] == ["a", "m", "z"]
    assert abs(r["cost"] - 0.2) < 1e-6  # float32 edge weights
    assert abs(r["path_weight"] - 0.81) < 1e-6  # Π weights (paths.rs:345-355)


def test_roots_leaves(spark, nodes_df_factory, edges_df_factory):
    nodes = nodes_df_factory([make_node(i) for i in ("a", "b", "c")])
    edges = edges_df_factory([make_edge("a", "b"), make_edge("b", "c")])
    assert {r["node_id"] for r in roots(nodes, edges).collect()} == {"a"}
    assert {r["node_id"] for r in leaves(nodes, edges).collect()} == {"c"}


def test_neighbors_and_reachable(spark, edges_df_factory):
    edges = edges_df_factory([make_edge("a", "b"), make_edge("b", "c"), make_edge("c", "d")])
    assert {r["node_id"] for r in neighbors(edges, "b").collect()} == {"a", "c"}
    assert {r["node_id"] for r in reachable(edges, ["a"]).collect()} == {"a", "b", "c", "d"}


def test_most_connected(spark, nodes_df_factory, edges_df_factory):
    nodes = nodes_df_factory([make_node(i) for i in ("hub", "x", "y", "z")])
    edges = edges_df_factory([make_edge("hub", "x"), make_edge("hub", "y"), make_edge("z", "hub")])
    top = most_connected(nodes, edges, n=1).first()
    assert top["node_id"] == "hub" and top["degree"] == 3


def test_weighted_traverse_max_product(spark, edges_df_factory):
    from cortex_spark.graph.paths import weighted_traverse

    edges = edges_df_factory(
        [
            make_edge("a", "b", weight=0.5),
            make_edge("a", "c", weight=0.9),
            make_edge("c", "b", weight=0.9),  # a→c→b = 0.81 beats a→b = 0.5
        ]
    )
    got = {r["node_id"]: (round(r["path_weight"], 6), r["depth"]) for r in weighted_traverse(edges, ["a"], max_depth=3, directed=True).collect()}
    assert got["a"] == (1.0, 0)
    assert got["b"][0] == pytest.approx(0.81, abs=1e-6)
    assert got["c"][0] == pytest.approx(0.9, abs=1e-6)


def test_yen_k_shortest(spark, edges_df_factory):
    from cortex_spark.graph.paths import yen_k_shortest

    edges = edges_df_factory(
        [
            make_edge("a", "b"), make_edge("b", "z"),
            make_edge("a", "c"), make_edge("c", "d"), make_edge("d", "z"),
            make_edge("b", "d"),
        ]
    )
    paths = yen_k_shortest(edges, "a", "z", k=3)
    assert paths[0] == ["a", "b", "z"]
    assert len(paths) >= 2
    assert all(p[0] == "a" and p[-1] == "z" for p in paths)
    assert len({tuple(p) for p in paths}) == len(paths)  # loopless + distinct


def test_adjacency_cache_lifecycle(spark, edges_df_factory):
    """graph/cache.rs semantics: lazy build, reuse without rebuild,
    invalidate-on-write then rebuild reflecting the new edge table."""
    from tests.conftest import make_edge

    from cortex_spark.graph.cache import AdjacencyCache

    edges = edges_df_factory([make_edge("a", "b"), make_edge("b", "c")])
    cache = AdjacencyCache(edges)
    assert not cache.is_valid()
    n1 = {r["node_id"] for r in cache.neighbors("b").collect()}
    assert n1 == {"a", "c"} and cache.is_valid() and cache.builds == 1
    # second lookup reuses the persisted projection
    assert {r["node_id"] for r in cache.neighbors("a").collect()} == {"b"}
    assert cache.builds == 1

    # a write invalidates; next read lazily rebuilds from the new table
    edges2 = edges_df_factory([make_edge("a", "b"), make_edge("b", "c"), make_edge("b", "d")])
    cache.set_edges(edges2)
    assert not cache.is_valid()
    n2 = {r["node_id"] for r in cache.neighbors("b").collect()}
    assert n2 == {"a", "c", "d"} and cache.builds == 2

    # direction + relation filters go through the cached projection
    assert {r["node_id"] for r in cache.neighbors("b", direction="out").collect()} == {"c", "d"}
    assert {r["node_id"] for r in cache.neighbors("b", direction="in").collect()} == {"a"}
    cache.invalidate()
