"""Table sources (parquet testdata loaders + synthetic tile tables)."""
