"""Conversation-document assembly: turns → one training document per
conversation.

The canonical last step of a transcript training-data pipeline: collect
a conversation's turns in stable ``turn_idx`` order and render them as
one role-tagged document (the shape LLM pretraining/sft corpora want),
with integrity columns (turn count, char count, md5) that are integer/
string-exact across engines for the oracle gate.

Distributed shape: ONE shuffle on ``conv_id`` (the groupBy); the sort
happens per group via ``sort_array`` on the collected structs — no
global sort, no window over the whole table. The per-conversation array
is bounded by conversation length (transcripts, not firehoses), the same
boundedness assumption the reference's per-prefix sink buffers make
(``/root/reference/execute/sinkNode.go:80-101``).

The sorted array is materialized as a real column BEFORE the rendering
``transform`` touches it (module PERFORMANCE RULE in functions/text.py:
expressions inlined into higher-order-function lambdas re-evaluate per
element).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLE_SEP = ": "
TURN_SEP = "\n"


def assemble_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """(turns) → (conv_id, doc, n_turns, doc_chars, doc_md5), one row
    per conversation; ``doc`` = 'role: text' lines joined by newline in
    ``order_col`` order (unique per conversation, so fully
    deterministic)."""
    turn = F.struct(
        F.col(order_col).alias("idx"),
        F.concat(F.col(role_col), F.lit(ROLE_SEP), F.col(text_col)).alias("line"),
    )
    agg = df.select(F.col(conv_col), turn.alias("t")).groupBy(conv_col).agg(
        F.sort_array(F.collect_list("t")).alias("_turns")
    )
    # _turns is an attribute here (own projection), so the transform
    # lambda slices a materialized array, not an expression tree
    doc = F.array_join(F.transform(F.col("_turns"), lambda t: t["line"]), TURN_SEP)
    return agg.select(
        F.col(conv_col),
        doc.alias("doc"),
        F.size("_turns").cast("bigint").alias("n_turns"),
    ).select(
        conv_col,
        "doc",
        "n_turns",
        F.length("doc").cast("bigint").alias("doc_chars"),
        F.md5("doc").alias("doc_md5"),
    )


def assemble_sql(table: str = "transcripts", conv_col: str = "conv_id") -> str:
    """DuckDB twin: ordered string_agg (same doc bytes, same md5)."""
    return f"""
        SELECT {conv_col}, doc,
               n_turns, CAST(length(doc) AS BIGINT) AS doc_chars,
               md5(doc) AS doc_md5
        FROM (
          SELECT {conv_col},
                 string_agg(role || '{ROLE_SEP}' || text, chr(10) ORDER BY turn_idx) AS doc,
                 COUNT(*) AS n_turns
          FROM {table} GROUP BY {conv_col}
        )"""
