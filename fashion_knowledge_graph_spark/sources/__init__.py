"""Table sources/sinks: snapshot-committed parquet tables (local
Iceberg stand-in), per-partition lineage + metrics."""
