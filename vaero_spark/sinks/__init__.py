from vaero_spark.sinks.writers import ExactlyOnceParquetSink, MemorySink, StdoutSink  # noqa: F401
