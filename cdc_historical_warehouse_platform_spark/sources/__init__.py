"""Sources & sinks: versioned parquet tables (the warehouse layer),
reference-format CDC change-batch files, and state files."""
