"""Ingest connectors (SURVEY.md §2.1): protocol normalizers that map
wire formats onto the canonical measures schema
``(resource_id, metric_name, ts, value)``.

Each normalizer is a pure DataFrame transformation, so the same code
serves batch backfill (``spark.read``) and streaming ingest
(``spark.readStream``) unchanged — the Spark-first replacement for the
reference's per-protocol daemons.
"""
