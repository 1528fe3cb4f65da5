"""Operator library: relational extensions and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns) — the north-star
additions beyond the reference's surface (BASELINE.json), built Spark-first:
JVM-side built-ins in the hot path, Arrow-batched pandas only where built-ins
can't express the semantics."""
