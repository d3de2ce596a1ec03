"""Sources & sinks: checkpointed/resumable batch runner, lineage+metrics
table, text (NT) export. The Iceberg catalog isn't available in this
container; parquet directories partitioned by bucket stand in — the
reader/writer surface is identical (`spark.read.parquet` ↔
`spark.read.format("iceberg")`, partition pruning works the same way)."""
