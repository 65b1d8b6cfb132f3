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


# ---------------------------------------------------------------------------
# gap-based sessionization (session-id assignment over an event log)
# ---------------------------------------------------------------------------


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign gap-based SESSIONS over an event log and aggregate them:
    consecutive events of a key belong to one session while the gap to
    the previous event is ≤ ``gap_minutes``; a larger gap starts the
    next session. Returns one row per session: (key, session_idx,
    n_events, start_ms, end_ms) with ``session_idx`` numbered from 1 in
    time order.

    This is the row-level ELT sessionization (every event gets a
    session id via lag → boundary flag → running sum) that
    ``F.session_window`` aggregation cannot express when downstream
    needs the PER-EVENT assignment or stable per-key session numbering.
    Millisecond-integer arithmetic end to end (the repo parity rule).

    100 TB shape: one shuffle on the key; the lag/cumsum window sorts
    PER KEY (a user's own events — bounded), never globally. Event-time
    ties within a key are ordered (ts, then nothing else needed: equal
    timestamps share a session by definition since their gap is 0).
    """
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy("ts_ms")
    base = events.select(F.col(key_col).alias("key"), ms.alias("ts_ms"))
    flagged = base.withColumn(
        "_new",
        F.when(
            F.col("ts_ms") - F.lag("ts_ms").over(w) > gap_minutes * 60_000, 1
        )
        .otherwise(0)
        .cast("long"),
    )
    assigned = flagged.withColumn(
        "session_idx", (F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)) + 1).cast("long")
    )
    return (
        assigned.groupBy("key", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_ms").alias("start_ms"),
            F.max("ts_ms").alias("end_ms"),
        )
    )


def sessionize_sql(
    table_expr: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> str:
    """DuckDB twin of :func:`sessionize` (caller supplies ``WITH``).
    SUM window casts OUTSIDE (HUGEINT rule); epoch_ms mirrors Spark's
    unix_millis."""
    return f"""
    sz_base AS (
      SELECT {key_col} AS key, epoch_ms(CAST({ts_col} AS TIMESTAMP)) AS ts_ms
      FROM {table_expr}),
    sz_flag AS (
      SELECT key, ts_ms,
             CASE WHEN ts_ms - lag(ts_ms) OVER (PARTITION BY key ORDER BY ts_ms)
                       > {gap_minutes} * 60000 THEN 1 ELSE 0 END AS _new
      FROM sz_base),
    sz_asgn AS (
      SELECT key, ts_ms,
             CAST(SUM(_new) OVER (PARTITION BY key ORDER BY ts_ms
                                  ROWS UNBOUNDED PRECEDING) + 1 AS BIGINT)
               AS session_idx
      FROM sz_flag)
    SELECT key, session_idx, COUNT(*) AS n_events,
           MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms
    FROM sz_asgn GROUP BY 1, 2"""


def windowed_distinct_users(
    df: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Tumbling-window EXACT distinct-user counts over an event stream —
    the traffic/uniques rollup every log-analytics surface starts from
    (the reference computes per-prefix event counts implicitly in its
    sink buffers; distinct users require real aggregation).

    Exact distinct, not approximate: Spark plans a single
    ``count(DISTINCT x)`` as the double-aggregation rewrite — a partial
    groupBy(window, user) dedup (map-side combined) feeding the final
    count, so the second shuffle carries one row per distinct
    (window, user), never the raw event volume. At 100 TB
    that is the standard exact-uniques plan; when a few-percent error
    is acceptable, swap ``approx_count_distinct`` (HLL) for a
    fixed-size sketch — kept exact here so the DuckDB oracle matches
    bit-for-bit.

    Output: (win_start, n_events, n_users), integer-exact.
    """
    return (
        df.groupBy(F.window(ts_col, duration).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(user_col).alias("n_users"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "n_events",
            "n_users",
        )
    )


def windowed_distinct_users_sql(
    table: str = "events",
    duration_sql: str = "INTERVAL '1 hour'",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> str:
    """DuckDB twin of :func:`windowed_distinct_users` (standalone
    SELECT): ``time_bucket`` mirrors ``F.window(...).start`` under the
    pinned-UTC session."""
    return f"""
    SELECT time_bucket({duration_sql}, {ts_col}) AS win_start,
           COUNT(*) AS n_events,
           COUNT(DISTINCT {user_col}) AS n_users
    FROM {table}
    GROUP BY 1"""


def stream_windowed_distinct(
    stream: DataFrame,
    duration: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """STREAMING exact windowed distinct-user counts — the live twin of
    :func:`windowed_distinct_users`, built as CHAINED STATEFUL
    operators (Spark 3.5+/4.x): watermark → dropDuplicates on
    (window, user) → windowed count, append mode. The dedup stage
    holds one state row per distinct (window, user) and the count
    stage one per window; BOTH evict as the watermark passes a
    window's end, so state is bounded by the watermark horizon times
    the distinct rate — the 10^12-event shape (an update-mode custom
    state fn would hold the same keys but re-emit per batch; the
    native chain emits each window exactly once, finalized).

    Append-mode semantics callers must know: a window emits only when
    the watermark passes its end, and events later than ``watermark``
    relative to the max seen timestamp are DROPPED (correct streaming
    semantics, not a bug). To drain a bounded replay exactly — every
    window emitted, nothing dropped — feed the backlog as one batch
    (no ``maxFilesPerTrigger`` cap: the watermark only advances
    between batches) and then append a single SENTINEL event past
    ``max_ts + watermark + 2·duration`` to flush every real window
    (the gate query does exactly this; the sentinel's own window
    stays held in state, unemitted).

    Output: (win_start, n_users) — each window exactly once.
    """
    dedup = (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.window(ts_col, duration).alias("win"),
            F.col(user_col).alias("_u"),
        )
        .dropDuplicates(["win", "_u"])
    )
    return (
        dedup.groupBy("win")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.col("win.start").alias("win_start"), "n_users")
    )


# ---------------------------------------------------------------------------
# multi-resolution rollup (hypertable-style continuous aggregate ladder)
# ---------------------------------------------------------------------------

_ROLLUP_METRICS = ["n_turns", "n_chars", "n_user"]


def multires_rollup(
    df: DataFrame, ts_col: str = "ts", levels: tuple[str, ...] = ("minute", "hour", "day")
) -> DataFrame:
    """Hypertable-style MULTI-RESOLUTION rollup: the traffic table at
    minute, hour, and day granularity from ONE corpus scan — each coarser
    level re-aggregates the previous level's (tiny) output, never the
    raw data. This is the continuous-aggregate ladder every time-series
    store (TimescaleDB caggs, Druid rollup) maintains; the reference's
    strftime prefix partitioning (``/root/reference/execute/
    sinkNode.go:105-131``) is its write-side shadow.

    All metrics are decomposable sums/counts, so level N+1 is an exact
    re-aggregation of level N (the reason approx/distinct metrics don't
    belong here — ``windowed_distinct_users`` handles those per level).

    100 TB shape: the ONLY corpus-sized shuffle is the minutely groupBy;
    the hour and day aggregates group ~43k e.g. minute rows per month.
    Because the coarse branches re-aggregate the SAME fine DataFrame,
    Spark plans the scan + minutely exchange ONCE and wires the other
    branches to a ReusedExchange (audited in tools/explain_audit.py) —
    the union costs one scan, not three.

    Output: (resolution, bucket_ts, n_turns, n_chars, n_user).
    """
    fine = df.groupBy(F.date_trunc(levels[0], F.col(ts_col)).alias("bucket_ts")).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).cast("long").alias("n_user"),
    )
    out = fine.select(F.lit(levels[0]).alias("resolution"), "*")
    prev = fine
    for lvl in levels[1:]:
        prev = prev.groupBy(F.date_trunc(lvl, F.col("bucket_ts")).alias("bucket_ts")).agg(
            *[F.sum(c).cast("long").alias(c) for c in _ROLLUP_METRICS]
        )
        out = out.unionByName(prev.select(F.lit(lvl).alias("resolution"), "*"))
    return out


# ---------------------------------------------------------------------------
# interval-concurrency occupancy (max simultaneously-open sessions per hour)
# ---------------------------------------------------------------------------


def concurrency_by_hour(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    bucket_ms: int = 60_000,
    hour_ms: int = 3_600_000,
) -> DataFrame:
    """MAX-CONCURRENCY occupancy per hour: how many conversations were
    simultaneously open at the busiest instant of each hour — the
    Little's-law load metric behind capacity planning ("how many live
    sessions must the serving tier hold"). A conversation is open on
    the inclusive span [min(ts), max(ts)] of its turns.

    Exact maximum, not samples: classic sweep-line (+1 at span start,
    −1 at span end, running sum) decomposed for scale as a TWO-LEVEL
    parallel prefix-max — the textbook scan decomposition:

    1. events bucket into minutes; the within-bucket running max is a
       window PARTITIONED by minute (a hot hour's events spread over 60
       tasks instead of funnelling one; ``bucket_ms`` is the skew knob),
    2. the cross-bucket carry is a running sum over ONE ROW PER MINUTE —
       bounded by the data's time range (a year is 525 600 rows), never
       by data volume, so the unpartitioned window is safe by
       construction at any corpus size,
    3. hour-level max = max over its minutes of (carry-in + within-
       minute prefix max), where the empty prefix (occupancy at bucket
       start, before any event) is a candidate via ``greatest(0, ...)``.

    Tie semantics: at one millisecond, starts order before ends (+1
    before −1), so a conversation starting exactly when another ends
    counts as overlapping at that instant. Ties among equal deltas are
    order-independent (each step adds the same ±1).

    Output: (hour_ms BIGINT epoch-millis, n_starts, n_ends, max_open),
    hours with ≥1 span boundary — pure integer arithmetic.
    """
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    spans = df.groupBy(conv_col).agg(
        F.min(ms).alias("start_ms"), F.max(ms).alias("end_ms")
    )
    ev = spans.select(F.col("start_ms").alias("ms"), F.lit(1).alias("d")).unionByName(
        spans.select(F.col("end_ms").alias("ms"), F.lit(-1).alias("d"))
    )
    ev = ev.withColumn("minute", F.expr(f"ms DIV {bucket_ms}"))
    from pyspark.sql import Window

    w_bucket = (
        Window.partitionBy("minute")
        .orderBy(F.col("ms"), F.col("d").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prefixed = ev.withColumn("_pfx", F.sum("d").over(w_bucket))
    minutes = prefixed.groupBy("minute").agg(
        F.sum("d").cast("long").alias("sum_d"),
        F.greatest(F.lit(0).cast("long"), F.max("_pfx").cast("long")).alias("max_pfx"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).cast("long").alias("n_starts"),
        F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).cast("long").alias("n_ends"),
    )
    w_carry = Window.orderBy("minute").rowsBetween(Window.unboundedPreceding, -1)
    carried = minutes.withColumn(
        "_carry", F.coalesce(F.sum("sum_d").over(w_carry), F.lit(0)).cast("long")
    )
    return (
        carried.groupBy(
            F.expr(f"(minute * {bucket_ms} DIV {hour_ms}) * {hour_ms}").alias("hour_ms")
        )
        .agg(
            F.sum("n_starts").cast("long").alias("n_starts"),
            F.sum("n_ends").cast("long").alias("n_ends"),
            F.max(F.col("_carry") + F.col("max_pfx")).cast("long").alias("max_open"),
        )
    )


def concurrency_by_hour_sql(
    table_expr: str,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    bucket_ms: int = 60_000,
    hour_ms: int = 3_600_000,
) -> str:
    """DuckDB twin of :func:`concurrency_by_hour` (caller supplies
    ``WITH``): the identical two-level sweep. Window/aggregate SUM casts
    OUTSIDE (HUGEINT rule)."""
    return f"""
    cc_spans AS (
      SELECT {conv_col},
             MIN(epoch_ms(CAST({ts_col} AS TIMESTAMP))) AS start_ms,
             MAX(epoch_ms(CAST({ts_col} AS TIMESTAMP))) AS end_ms
      FROM {table_expr} GROUP BY 1),
    cc_ev AS (
      SELECT start_ms AS ms, 1 AS d FROM cc_spans
      UNION ALL SELECT end_ms, -1 FROM cc_spans),
    cc_pfx AS (
      SELECT ms, d, ms // {bucket_ms} AS minute,
             CAST(SUM(d) OVER (PARTITION BY ms // {bucket_ms}
                               ORDER BY ms, d DESC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _pfx
      FROM cc_ev),
    cc_min AS (
      SELECT minute,
             CAST(SUM(d) AS BIGINT) AS sum_d,
             greatest(CAST(0 AS BIGINT), CAST(MAX(_pfx) AS BIGINT)) AS max_pfx,
             CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
             CAST(SUM(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends
      FROM cc_pfx GROUP BY 1),
    cc_carry AS (
      SELECT *,
             CAST(COALESCE(SUM(sum_d) OVER (ORDER BY minute
                                            ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING), 0) AS BIGINT)
               AS _carry
      FROM cc_min)
    SELECT (minute * {bucket_ms} // {hour_ms}) * {hour_ms} AS hour_ms,
           CAST(SUM(n_starts) AS BIGINT) AS n_starts,
           CAST(SUM(n_ends) AS BIGINT) AS n_ends,
           CAST(MAX(_carry + max_pfx) AS BIGINT) AS max_open
    FROM cc_carry GROUP BY 1"""


def multires_rollup_sql(
    table_expr: str, ts_col: str = "ts", levels: tuple[str, ...] = ("minute", "hour", "day")
) -> str:
    """DuckDB twin of :func:`multires_rollup` (caller supplies ``WITH``):
    the same re-aggregation ladder, each level reading the previous CTE.
    SUM casts OUTSIDE the aggregate (the HUGEINT rule)."""
    ctes = [
        f"""mr_{levels[0]} AS (
      SELECT date_trunc('{levels[0]}', {ts_col}) AS bucket_ts,
             COUNT(*) AS n_turns,
             CAST(SUM(length(text)) AS BIGINT) AS n_chars,
             CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user
      FROM {table_expr} GROUP BY 1)"""
    ]
    for prev, lvl in zip(levels, levels[1:]):
        sums = ",\n             ".join(
            f"CAST(SUM({m}) AS BIGINT) AS {m}" for m in _ROLLUP_METRICS
        )
        ctes.append(
            f"""mr_{lvl} AS (
      SELECT date_trunc('{lvl}', bucket_ts) AS bucket_ts,
             {sums}
      FROM mr_{prev} GROUP BY 1)"""
        )
    selects = [
        f"SELECT '{lvl}' AS resolution, bucket_ts, n_turns, n_chars, n_user FROM mr_{lvl}"
        for lvl in levels
    ]
    return ",\n    ".join(ctes) + "\n    " + "\n    UNION ALL ".join(selects)
