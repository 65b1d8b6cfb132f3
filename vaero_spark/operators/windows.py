"""Windowed aggregation operators keyed by ``conv_id``.

These generalize the reference sink's only stateful behavior — the
per-prefix buffer with a time-cap flush (``/root/reference/execute/
sinkNode.go:105-131,242-254``, default 300 s) — into real tumbling,
sliding, and session windows. All are built on Spark's native
``F.window`` / ``F.session_window`` so the exact same operator runs in
batch (tests/oracle) and in Structured Streaming (with
``withWatermark`` upstream).

Scale notes: windowed groupBy shuffles on (key, window) — at 10^12
turns the hot-conversation skew is defused by the salted two-phase
variant in :mod:`vaero_spark.operators.skew`; AQE handles moderate
skew. Counts/min/max are integer/timestamp-exact, so results are
bit-stable across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _aggs():
    return [
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
        F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).alias("n_tool"),
        F.min("turn_idx").alias("first_turn"),
        F.max("turn_idx").alias("last_turn"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    ]


def windowed_counts(
    df: DataFrame, duration: str, slide: str | None = None, key: str = "conv_id"
) -> DataFrame:
    """Tumbling (or sliding when ``slide`` given) window aggregate.

    Output: (key, win_start, win_end, n_turns, n_user, n_tool,
    first_turn, last_turn, min_ts, max_ts) — the flush-buffer summary the
    reference computes implicitly per prefix/time-cap."""
    win = F.window("ts", duration, slide) if slide else F.window("ts", duration)
    return (
        df.groupBy(F.col(key), win.alias("win"))
        .agg(*_aggs())
        .select(
            F.col(key),
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *[F.col(c) for c in ["n_turns", "n_user", "n_tool", "first_turn", "last_turn", "min_ts", "max_ts"]],
        )
    )


def session_windows(df: DataFrame, gap: str, key: str = "conv_id") -> DataFrame:
    """Session windows: merge turns whose inter-arrival gap < ``gap``.

    ``F.session_window`` works in both batch and streaming; session end =
    last event ts + gap (Spark semantics — the analog of the reference's
    time-cap timer firing ``batch_max_time`` after the buffer's creation,
    ``sinkNode.go:242-254``)."""
    return (
        df.groupBy(F.col(key), F.session_window("ts", gap).alias("win"))
        .agg(*_aggs())
        .select(
            F.col(key),
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *[F.col(c) for c in ["n_turns", "n_user", "n_tool", "first_turn", "last_turn", "min_ts", "max_ts"]],
        )
    )
