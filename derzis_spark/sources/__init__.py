"""Input-source connectors beyond parquet (WARC, …)."""
