"""presencia_etl_spark — a PySpark-native analytics/ETL engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference system ``nahuelalejandrogomez/presencia-etl`` (an Access→MySQL
single-threaded sync + reconciliation tool), generalized to run on a Spark
cluster at 100 TB scale:

- ``functions/``  — scalar/row-wise semantics (hashing, date parsing, key
  normalization, null coercion, name-based schema inference).
- ``operators/``  — DataFrame → DataFrame relational + extension operators
  (filters, aggregations, CDC classify, dedup, similarity, text analysis,
  multimodal plumbing).
- ``sources/``    — readers + a config-driven table registry.
- ``sinks/``      — overwrite / append / upsert writers.
- ``plans/``      — the reference's three entry-point pipelines
  (full sync, incremental CDC sync, reconciliation).
- ``streaming/``  — Structured Streaming analogs (micro-batch upsert,
  windowed event aggregation).

Everything is declarative DataFrame API so Catalyst can push filters/
projections into scans and pick join strategies; Python UDFs are avoided on
hot paths (see each module's docstring for the scale notes).
"""

from presencia_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
