from cortex_spark.streaming.ingest import warren_events_to_nodes, ingest_stream

__all__ = ["warren_events_to_nodes", "ingest_stream"]
