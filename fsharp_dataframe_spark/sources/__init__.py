"""Sources/sinks: CSV with reference dialect parity, parquet passthrough."""
