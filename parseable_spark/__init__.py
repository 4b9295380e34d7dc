"""parseable_spark — a PySpark-native log-analytics engine.

A from-scratch re-implementation of the capabilities of
parseablehq/parseable (reference at /root/reference, studied in
SURVEY.md) on top of Apache Spark:

- ingest: JSON flattening, schema inference/evolution/conflict
  renaming (reference: src/utils/json/flatten.rs, src/event/format/).
- storage: partitioned, sorted Parquet sink + JSON manifest catalog
  (reference: src/parseable/streams.rs, src/catalog/).
- catalog: snapshot/manifest file-stats pruning and the COUNT(*)
  metadata fast path (reference: src/query/stream_schema_provider.rs,
  src/query/mod.rs:427-462).
- query: SQL surface with time-filter injection and generated-SQL
  product APIs — counts histogram, alerts, field stats, log context
  (reference: src/query/mod.rs, src/alerts/, src/storage/field_stats.rs).
- llm: large-scale training-data pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing) — beyond the reference.

All relational execution is delegated to Spark SQL / Catalyst, exactly
as the reference delegates to DataFusion.
"""

__version__ = "0.1.0"
