"""Structured Streaming ingest (SURVEY.md §2.10, §3.1).

The reference's sack/metricd/chef machinery collapses into one
streaming query: measures stream -> watermark (= back-window) ->
windowed multi-method aggregation -> rollup sink.  Spark's checkpoint
and task scheduling replace tooz locks, hashring sharding and redis
wakeups entirely.
"""
