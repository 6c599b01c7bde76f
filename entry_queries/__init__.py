"""Driver-contract query/oracle modules, one per family; aggregated by
the repo-root __spark_entry__.py (the driver fixed entry point)."""
