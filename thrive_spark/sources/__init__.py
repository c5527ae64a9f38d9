"""Sources and sinks: parquet/CSV/JSON scans, partitioned and DB sinks,
and the incremental dirlist ledger (the reference's core ETL idea)."""
