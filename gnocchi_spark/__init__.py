"""gnocchi_spark — a PySpark-native time-series analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
gnocchixyz/gnocchi (reference: /root/reference), designed Spark-first:

- measures are an append-only fact table / stream,
- archive policies drive multi-granularity ``groupBy(metric, window)``
  materializations (reference: gnocchi/storage/__init__.py:583-692),
- the query side is plain DataFrame/SQL over rollup tables, with small
  AST->Column compilers for gnocchi's operations DSL
  (gnocchi/rest/aggregates/operations.py) and resource filter DSL
  (gnocchi/indexer/sqlalchemy.py:1469-1618),
- plus large-scale training-data pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) that the reference lacks.

Everything in the hot path is built-in Column expressions (JVM-side,
whole-stage codegen); no row-at-a-time Python UDFs.
"""

__version__ = "0.1.0"
