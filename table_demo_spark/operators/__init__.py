"""Large-scale data-pipeline operators (dedup, similarity, multimodal).

Each operator is a reusable ``DataFrame -> DataFrame`` transformation
built from declarative Spark ops so Catalyst keeps optimizing through
it; the ``queries.llmops`` module wires them to fixture tables and
DuckDB oracles.
"""
