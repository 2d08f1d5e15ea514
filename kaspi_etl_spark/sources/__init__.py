"""Sources/sinks — reference ingest formats re-expressed for Spark."""
