"""Data sources: generated keyspace, parquet tables, streaming sources."""
