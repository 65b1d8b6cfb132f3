"""Canonical transcripts source.

The engine's canonical input (per the north-star spec) is a table of
multi-turn conversation/agent transcripts::

    (conv_id: string, turn_idx: int, role: string,
     text: string, tool: string, ts: timestamp)

In production this is an Iceberg table read as a stream. In the sandbox
we derive it *deterministically* from the driver-generated ``events``
parquet (TESTDATA.md) so that the DuckDB correctness oracle can rebuild
the exact same table from the same parquet: ``load_transcripts`` (Spark
DataFrame API) and ``TRANSCRIPTS_ORACLE_CTE`` (DuckDB SQL) implement the
same pure function of ``events``.

Derivation (all integer/string ops — no float formatting, so the two
engines agree bit-for-bit):

- ``conv_id``  = ``conv-<user_id>-<yyyy-MM-dd of ts>`` (a conversation is
  one user's activity on one day; user skew in events gives hot convs).
- ``turn_idx`` = 0-based rank of the event within its conversation,
  ordered by ``(ts, event_id)`` (event_id is the unique tiebreak).
- ``role``     = cycle user/assistant/tool/system by ``event_id % 4``.
- ``text``     = ``"turn <i> of <conv>: <event_type> k=<props.k>"`` with a
  PII-like email fragment appended when ``event_id % 7 = 0`` (gives the
  mask/parse/filter operators real work, per FIXTURES.md).
- ``tool``     = search/calc/code by ``event_id % 3`` when role='tool',
  else ``''`` (reference semantics: non-tool turns have empty tool).
- ``ts``       = event ts unchanged.

Reference seed: the reference's only built-in fixture source emits a
fixed synthetic batch per poll (``/root/reference/integrations/sources/
source_random.go:16-33``); this module is its scale-aware analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

_ROLES = ["user", "assistant", "tool", "system"]
_TOOLS = ["search", "calc", "code"]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the canonical transcripts table from ``events`` (Spark side).

    Must stay semantically identical to ``TRANSCRIPTS_ORACLE_CTE``.
    """
    ev = load_table(spark, sf_dir, "events")
    conv = F.concat(
        F.lit("conv-"),
        F.col("user_id").cast("string"),
        F.lit("-"),
        F.date_format("ts", "yyyy-MM-dd"),
    )
    df = ev.withColumn("conv_id", conv)
    w = Window.partitionBy("conv_id").orderBy("ts", "event_id")
    df = df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
    role = F.element_at(
        F.array(*[F.lit(r) for r in _ROLES]),
        (F.pmod(F.col("event_id"), F.lit(4)) + 1).cast("int"),
    )
    df = df.withColumn("role", role)
    k = F.get_json_object("props", "$.k")
    email = F.when(
        F.col("event_id") % 7 == 0,
        F.concat(F.lit(" contact user"), F.col("user_id").cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    text = F.concat(
        F.lit("turn "),
        F.col("turn_idx").cast("string"),
        F.lit(" of "),
        F.col("conv_id"),
        F.lit(": "),
        F.col("event_type"),
        F.lit(" k="),
        k,
        email,
    )
    df = df.withColumn("text", text)
    tool = F.when(
        F.col("role") == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (F.pmod(F.col("event_id"), F.lit(3)) + 1).cast("int"),
        ),
    ).otherwise(F.lit(""))
    df = df.withColumn("tool", tool)
    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


# DuckDB-side identical derivation. ``events`` is pre-registered as a view
# by the driver. Every transcript-operator oracle query starts with this CTE.
TRANSCRIPTS_ORACLE_CTE = """
transcripts AS (
  SELECT conv_id, turn_idx, role,
         'turn ' || CAST(turn_idx AS VARCHAR) || ' of ' || conv_id || ': '
           || event_type || ' k=' || k ||
           CASE WHEN event_id % 7 = 0
                THEN ' contact user' || CAST(user_id AS VARCHAR) || '@example.com'
                ELSE '' END AS text,
         CASE WHEN role = 'tool'
              THEN ['search','calc','code'][CAST(event_id % 3 AS INTEGER) + 1]
              ELSE '' END AS tool,
         ts
  FROM (
    SELECT *,
           CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY ts, event_id) - 1
                AS INTEGER) AS turn_idx,
           CASE CAST(event_id % 4 AS INTEGER)
                WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                WHEN 2 THEN 'tool' ELSE 'system' END AS role
    FROM (
      SELECT event_id, ts, user_id, event_type,
             'conv-' || CAST(user_id AS VARCHAR) || '-' || strftime(ts, '%Y-%m-%d') AS conv_id,
             json_extract_string(props, '$.k') AS k
      FROM events
    )
  )
)
""".strip()


def load_transcripts_with_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcripts plus deterministic duplicate rows (``turn_idx % 17 = 5``),
    the dedup-operator fixture (FIXTURES.md asks for ~duplicated
    ``(conv_id, turn_idx)`` rows with identical text)."""
    t = load_transcripts(spark, sf_dir)
    dupes = t.filter(F.col("turn_idx") % 17 == 5)
    return t.unionAll(dupes)


TRANSCRIPTS_WITH_DUPES_ORACLE_CTE = (
    TRANSCRIPTS_ORACLE_CTE
    + """,
transcripts_dup AS (
  SELECT * FROM transcripts
  UNION ALL
  SELECT * FROM transcripts WHERE turn_idx % 17 = 5
)
""".rstrip()
)


def transcripts_stream(
    spark: SparkSession,
    parquet_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Read a directory of transcripts parquet as an unbounded stream.

    This is the sandbox analog of the production Iceberg streaming read:
    Spark's file source gives exactly-once file tracking via the
    checkpoint (the upgrade over the reference's pickled HTTP cursor,
    ``/root/reference/vaero_cdk/api_cursor.py:20-31``).
    ``maxFilesPerTrigger`` is the rate-limit knob (reference analog:
    poll ``interval``, ``/root/reference/execute/execute.go:99-110``).
    """
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(parquet_dir)
