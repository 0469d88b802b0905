"""Sources: parquet catalog, incremental staging, synthetic data,
multimodal binary columns."""
