"""Sources & sinks: parquet test tables, catalog, text report parsing."""
