from cortex_spark.graph.traverse import bfs, neighbors, reachable, roots, leaves, neighborhood_at
from cortex_spark.graph.paths import shortest_path_unweighted, dijkstra
from cortex_spark.graph.degree import degree, most_connected

__all__ = [
    "bfs",
    "neighbors",
    "reachable",
    "roots",
    "leaves",
    "neighborhood_at",
    "shortest_path_unweighted",
    "dijkstra",
    "degree",
    "most_connected",
]
