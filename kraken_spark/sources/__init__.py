"""Document sources beyond the primary parquet documents table."""
