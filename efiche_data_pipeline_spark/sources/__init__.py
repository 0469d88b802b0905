"""Sources: the parquet table catalog for the fixture tables (schema
normalization for TIMESTAMP(NANOS), temp-view registration)."""
