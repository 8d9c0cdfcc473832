"""Sources: parquet/CSV/JSON/JDBC/binaryFile readers and zip staging."""
