"""table_demo_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference Flink Table API / SQL demo
(``fhueske/table-demo``) Spark-first: DataFrame / Spark SQL logical plans
optimized by Catalyst, Structured Streaming for continuous queries, and
native Column expressions (never row-at-a-time Python UDFs) on hot paths.

Layout
------
- ``session``    : tuned ``SparkSession`` bootstrap (AQE, shuffle sizing).
- ``functions``  : scalar function library — taxi-grid geo functions
  (ports of ``TaxiFunctions.scala``), text analysis, vector math.
- ``sources``    : batch fixture loaders + the event-replay streaming
  source (port of ``TaxiRideSource.java`` semantics).
- ``queries``    : the reference's relational queries (both dialects) and
  the extended analytic/conformance queries.
- ``operators``  : large-scale data-pipeline operators — dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
  search, text quality, multimodal column plumbing.
- ``streaming``  : continuous-query execution — upsert sinks, output-mode
  inference, stateful operators Structured Streaming lacks natively.
- ``plans``      : thin query-compilation shims (upsert-key / output-mode
  inference mirroring Flink's ``UpsertStreamTableSink`` planning).
"""

__version__ = "0.1.0"
