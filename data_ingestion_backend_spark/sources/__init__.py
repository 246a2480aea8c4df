"""Data sources: parquet fixture loaders and the CSV intake pipeline."""
