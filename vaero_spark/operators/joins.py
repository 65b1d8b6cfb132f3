"""Conversation joins: user turns ⋈ tool-call turns.

The north-star's stateful stream-stream join: for each user turn, find
the tool turns of the same conversation that fire within a bounded time
range after it. In streaming, the time-range condition + watermarks
bound the join state (Spark evicts rows older than watermark − range);
in batch the identical expression runs as a plain range join. The
reference has no join at all — its closest construct is branch fan-out
(``/root/reference/execute/transformNode.go:36-57``).

Scale notes: the join shuffles both sides on ``conv_id``; hot
conversations are handled by AQE skew-join (enabled in session.py) or
pre-salting. The time-range predicate keeps per-key state bounded at
any scale; never join streams without it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def user_tool_join(
    df: DataFrame, max_lag: str = "5 minutes", how: str = "inner"
) -> DataFrame:
    """Pair each user turn with tool turns in (user.ts, user.ts + max_lag]
    of the same conversation.

    Output: conv_id, user_turn, user_ts, tool_turn, tool_name, tool_ts —
    sorted downstream by (conv_id, user_turn, tool_turn) for the
    stable-ordering invariant. ``how="left_outer"`` keeps user turns
    with no tool activity in range (null tool columns) — the coverage
    view ("which user turns triggered nothing").
    Works identically on a batch DataFrame or two watermarked streams.
    """
    users = df.filter(F.col("role") == "user").select(
        F.col("conv_id"),
        F.col("turn_idx").alias("user_turn"),
        F.col("ts").alias("user_ts"),
    )
    tools = df.filter(F.col("role") == "tool").select(
        F.col("conv_id").alias("t_conv_id"),
        F.col("turn_idx").alias("tool_turn"),
        F.col("tool").alias("tool_name"),
        F.col("ts").alias("tool_ts"),
    )
    cond = (
        (users.conv_id == tools.t_conv_id)
        & (tools.tool_ts > users.user_ts)
        & (tools.tool_ts <= users.user_ts + F.expr(f"INTERVAL {max_lag}"))
    )
    return users.join(tools, cond, how).select(
        "conv_id", "user_turn", "user_ts", "tool_turn", "tool_name", "tool_ts"
    )


def streaming_user_tool_join(
    stream: DataFrame,
    watermark: str = "10 minutes",
    max_lag: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Streaming variant: watermark both sides so the join state store
    evicts expired rows. The watermark is the principled version of the
    reference's Okta cursor late-drop (``/root/reference/integrations/
    python/source_okta.py:91-113``).

    ``how="left_outer"`` is the hard streaming-join semantics: a match
    emits eagerly, but an UNMATCHED user turn can only emit once no
    future tool turn could still pair with it — i.e. when the watermark
    passes ``user_ts + max_lag`` and the state store evicts the row,
    emitting it with null tool columns. Spark delivers those null rows
    in the micro-batch AFTER the watermark advance (eviction runs at
    batch end), so a drain needs a watermark-advancing sentinel ON BOTH
    SIDES (the per-side watermark nodes sit after the role filters) and
    one further batch; the gate query does exactly this. Drained ==
    the batch left join, bit for bit."""
    users = (
        stream.filter(F.col("role") == "user")
        .select("conv_id", F.col("turn_idx").alias("user_turn"), F.col("ts").alias("user_ts"))
        .withWatermark("user_ts", watermark)
    )
    tools = (
        stream.filter(F.col("role") == "tool")
        .select(
            F.col("conv_id").alias("t_conv_id"),
            F.col("turn_idx").alias("tool_turn"),
            F.col("tool").alias("tool_name"),
            F.col("ts").alias("tool_ts"),
        )
        .withWatermark("tool_ts", watermark)
    )
    cond = (
        (users.conv_id == tools.t_conv_id)
        & (tools.tool_ts > users.user_ts)
        & (tools.tool_ts <= users.user_ts + F.expr(f"INTERVAL {max_lag}"))
    )
    return users.join(tools, cond, how).select(
        "conv_id", "user_turn", "user_ts", "tool_turn", "tool_name", "tool_ts"
    )


def asof_join_last_user(df: DataFrame) -> DataFrame:
    """As-of join: attach to every tool turn the most recent user turn at
    or before it in the same conversation.

    Spark lacks a native as-of join; rather than a pairwise range join
    (quadratic in hot conversations) we use the scalable composition:
    union both sides, one window pass ordered by (ts, turn_idx) carrying
    the last user turn forward — O(n log n) per conversation, single
    shuffle, no state blowup.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("conv_id")
        .orderBy("ts", "turn_idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    user_turn = F.when(F.col("role") == "user", F.col("turn_idx"))
    user_ts = F.when(F.col("role") == "user", F.col("ts"))
    out = (
        df.withColumn("last_user_turn", F.last(user_turn, ignorenulls=True).over(w))
        .withColumn("last_user_ts", F.last(user_ts, ignorenulls=True).over(w))
        .filter(F.col("role") == "tool")
        .select(
            "conv_id",
            F.col("turn_idx").alias("tool_turn"),
            F.col("tool").alias("tool_name"),
            F.col("ts").alias("tool_ts"),
            "last_user_turn",
            "last_user_ts",
        )
    )
    return out


def interval_join_binned(
    points: DataFrame, intervals: DataFrame, bucket_s: int = 1800
) -> DataFrame:
    """RANGE JOIN points × UNKEYED intervals without a cartesian: the
    "which turns fall inside which incident/deploy/outage windows"
    enrichment. ``user_tool_join`` range-joins WITHIN a conversation
    (conv_id is the equi-key); here the intervals share no key with the
    points, and Spark's planner can only offer BroadcastNestedLoopJoin
    (dies when intervals outgrow the driver) or a cartesian.

    The scalable rewrite is time BINNING: every interval explodes to the
    ``bucket_s``-second buckets it covers (bounded fan-out: an interval
    of length L covers ≤ L/bucket_s + 1 buckets), every point maps to
    exactly ONE bucket, and the join becomes a plain equi-join on the
    bucket id — shuffle-partitionable on both sides at any scale. A
    point matches an interval through exactly one bucket (its own), so
    no post-join dedup is needed. Exact containment (``start_ms ≤ ts <
    end_ms``) is re-checked after the equi-join; empty intervals are
    dropped up front (a descending ``sequence`` would fabricate buckets).

    ``intervals``: (interval_id, start_ms, end_ms) with epoch-ms BIGINT
    bounds; pick ``bucket_s`` ≈ the typical interval length so fan-out
    stays ~2. Output: (interval_id, conv_id, turn_idx, ts_ms) — integer
    arithmetic end to end (the repo parity rule).

    Oracle twin: a plain inequality join (DuckDB plans IEJoin natively).
    """
    step = bucket_s * 1000
    # integer DIV, never `/`: float division can round across a bucket
    # boundary and desynchronize the point's bucket from the interval's
    p = points.select(
        "conv_id",
        "turn_idx",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    ).withColumn("bucket", F.expr(f"ts_ms DIV {step}"))
    iv = (
        intervals.filter(F.col("end_ms") > F.col("start_ms"))
        .select(
            "interval_id",
            "start_ms",
            "end_ms",
            F.explode(
                F.sequence(
                    F.expr(f"start_ms DIV {step}"),
                    F.expr(f"(end_ms - 1) DIV {step}"),
                )
            ).alias("bucket"),
        )
    )
    return (
        p.join(iv, "bucket")
        .filter((F.col("ts_ms") >= F.col("start_ms")) & (F.col("ts_ms") < F.col("end_ms")))
        .select("interval_id", "conv_id", "turn_idx", "ts_ms")
    )
