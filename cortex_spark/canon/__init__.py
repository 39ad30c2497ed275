from cortex_spark.canon.components import connected_components
from cortex_spark.canon.dedup import dedup_pairs, dedup_actions
from cortex_spark.canon.merge import canonicalize

__all__ = ["connected_components", "dedup_pairs", "dedup_actions", "canonicalize"]
