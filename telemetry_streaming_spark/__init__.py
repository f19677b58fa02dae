"""telemetry_streaming_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of mozilla/telemetry-streaming (reference surveyed in
SURVEY.md), built Spark-first: declarative DataFrame/SQL plans that
Catalyst can optimize (predicate pushdown, column pruning, partition
pruning, whole-stage codegen), Structured Streaming for the streaming
jobs, and Arrow-batched pandas UDFs only where built-ins genuinely
cannot express the semantics.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, UTC, Arrow).
- ``schemas``    : ping StructTypes + schema merge helpers (SURVEY §1.2).
- ``functions/`` : columnar accessors — the per-record P-operators of
  SURVEY §2.3 expressed as Column expressions, plus text/vector libs.
- ``operators/`` : relational/windowed operators (SURVEY §2.4-2.6) and
  the 100TB-scale extension operators (dedup, similarity).
- ``sources/``   : batch/streaming source registry (SURVEY §2.1).
- ``sinks/``     : parquet/HTTP/UDP/stateful sinks (SURVEY §2.2).
- ``jobs/``      : one module per reference job (SURVEY Appendix A).
- ``streaming/`` : watermark/window/checkpoint plumbing (SURVEY §2.8).
- ``ext/``       : multimodal binary-column plumbing.
"""

__version__ = "0.1.0"
