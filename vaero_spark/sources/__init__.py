from vaero_spark.sources.transcripts import (  # noqa: F401
    TRANSCRIPTS_ORACLE_CTE,
    load_table,
    load_transcripts,
    load_transcripts_with_dupes,
    transcripts_stream,
)
