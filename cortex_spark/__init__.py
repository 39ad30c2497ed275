"""cortex_spark — PySpark-native knowledge-graph construction engine.

A from-scratch, Spark-first re-expression of the capabilities of the
MikeSquared-Agency/cortex graph-memory engine (reference at /root/reference,
cited by file:line throughout) as a distributed batch KG-construction
pipeline: HTML→text extraction → chunk/classify → embed → LSH candidate
generation → rule-based edge (triple) emission → dedup/canonicalization via
connected components → materialized node/edge tables with lineage, metrics
and checkpoint/resume.

Everything is declarative DataFrame dataflow (Catalyst-optimizable); per-row
logic lives only in Arrow-vectorized pandas UDFs. No RDDs, no driver-side
row loops.
"""

__version__ = "0.1.0"
