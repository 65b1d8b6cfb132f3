from vaero_spark.testing.fixtures import make_transcripts_pdf, write_transcripts_parquet  # noqa: F401
