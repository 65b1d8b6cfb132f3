"""Per-conversation custom state — ``applyInPandasWithState`` operators.

The reference's only stateful construct is the sink-side per-prefix
buffer: byte-cap flush (``/root/reference/execute/sinkNode.go:105-125``)
and time-cap flush via a timer goroutine (``sinkNode.go:242-254``).
These operators generalize that to keyed state in Spark's state store
(RocksDB-backed in production), checkpointed and exactly-once — the
reference loses its buffers on crash.

All logic is Arrow-batched pandas (no per-row Python in the JVM loop);
state per key is O(1) scalars or a bounded set.
"""

from __future__ import annotations

import os
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

# benchmark A/B knob only — see _arm_idle_timeout docstring
_DISABLE_ARMING = os.environ.get("VAERO_DISABLE_IDLE_EVICTION") == "1"

# ---------------------------------------------------------------------------
# open-session tracking (time-cap flush parity, event-time based)
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [T.StructField("ts_us", T.ArrayType(T.LongType()))]
)


def _session_tracker(gap_seconds: int):
    """Keyed session assembly with EXACT batch-sessionization semantics:
    buffer the conversation's event times, split on gaps ≥ ``gap``, and
    emit a session as ``closed`` only once the watermark passes its
    ``end + gap`` — any row that could still bridge it would be late by
    then. State per key = event times within the un-matured horizon
    only (matured segments are emitted and dropped each update), so
    memory is bounded by the watermark window, not conversation life.
    This makes the streamed result equal ``F.session_window`` /
    the SQL sessionization bit-for-bit (oracle-checked in the gate as
    ``stream_open_sessions``)."""
    gap_us = gap_seconds * 1_000_000

    def segments(sorted_us: list) -> list:
        segs, cur = [], [sorted_us[0]]
        for t in sorted_us[1:]:
            if t - cur[-1] >= gap_us:
                segs.append(cur)
                cur = [t]
            else:
                cur.append(t)
        segs.append(cur)
        return segs

    def mk(conv_id, seg, closed) -> dict:
        return {
            "conv_id": conv_id,
            "session_start": pd.Timestamp(seg[0], unit="us"),
            "session_end": pd.Timestamp(seg[-1] + gap_us, unit="us"),
            "n_turns": len(seg),
            "closed": closed,
        }

    def fn(
        key: Tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        buf = list(state.get[0]) if state.exists else []
        if state.hasTimedOut:
            state.remove()
            if buf:
                yield pd.DataFrame([mk(conv_id, s, True) for s in segments(sorted(buf))])
            return

        for pdf in pdf_iter:
            ts = pdf["ts"].dropna()  # NaT → -2^63 under the int64 view
            us = ts.astype("int64")  # datetime64[us/ns] → int64
            if ts.dtype == "datetime64[ns]":
                us = us // 1000
            buf.extend(int(x) for x in us)
        if not buf:  # only null-ts rows ever seen: nothing to sessionize
            if state.exists:
                state.remove()
            return
        buf.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        out, keep = [], []
        for seg in segments(buf):
            if seg[-1] + gap_us <= wm_us:
                out.append(mk(conv_id, seg, True))  # matured: final, emit now
            else:
                keep.extend(seg)
        if keep:
            state.update((keep,))
            # ceil of (end + gap) in ms: floor-truncating the µs event
            # time would let the timeout fire up to ~1 ms BEFORE the
            # watermark truly passes end+gap, splitting a session that a
            # sub-ms bridging event would have merged (the non-timeout
            # path compares at exact µs — both paths must agree).
            timeout_ms = max(
                -(-(keep[-1] + gap_us) // 1000),
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(timeout_ms)
            out.append(mk(conv_id, segments(keep)[-1], False))  # trailing open
        else:
            state.remove()
        if out:
            yield pd.DataFrame(out)

    return fn


def track_open_sessions(
    stream: DataFrame, gap_seconds: int = 1800, watermark: str = "10 minutes"
) -> DataFrame:
    """Emit a per-conversation session row on every update and a final
    ``closed=True`` row when the watermark passes ``last_ts + gap`` —
    the event-time version of the reference's time-cap flush timer
    (``sinkNode.go:242-254``: flush fires ``batch_max_time`` after buffer
    creation unless flushed meanwhile).

    Only ``(conv_id, ts)`` crosses the Python boundary — the tracker
    reads nothing else, and shipping the payload columns per group would
    multiply the Arrow transfer ~10x for nothing (guide §4.1)."""
    return (
        stream.select("conv_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _session_tracker(gap_seconds),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# stateful dedup (seen-set per conversation)
# ---------------------------------------------------------------------------

DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seen", T.ArrayType(T.IntegerType())),
        T.StructField("last_us", T.LongType()),
    ]
)

# Event-time idle horizon after which a key's state is evicted (both
# custom-state ops below). Without eviction, one state row per
# conversation lives FOREVER — on a months-long run over 10^9
# conversations the state store grows without bound. A key idle longer
# than this (in event time) is removed:
#  - dedup: a duplicate arriving later than the idle horizon has an
#    event time below ``watermark − idle`` and is already dropped by
#    the watermark's late-row filter before reaching the operator, so
#    eviction cannot re-admit it (keep idle ≥ the watermark delay);
#  - counters: a conversation resuming after the horizon restarts at
#    zero — partial counts merge downstream by summing per conv_id
#    (the update-mode consumer sums/replaces per key anyway).
DEFAULT_IDLE_TIMEOUT_S = 24 * 3600


def _pdf_max_us(pdf: pd.DataFrame, cur: int) -> int:
    """max(cur, max event time in µs over NON-NULL ts rows). NaT must be
    excluded BEFORE the int64 view: it converts to the -2^63 sentinel,
    and an all-null-ts conversation would otherwise keep last_us=0 and
    arm an already-expired timeout that evicts its state on the next
    batch (re-admitting duplicates / resetting counters)."""
    ts = pdf["ts"].dropna()
    if ts.empty:
        return cur
    us = ts.astype("int64")
    if ts.dtype == "datetime64[ns]":
        us = us // 1000
    return max(cur, int(us.max()))


def _arm_idle_timeout(state: GroupState, last_us: int, idle_s: int) -> None:
    """Evict the key once the watermark passes last-event + idle (ceil
    to ms; must stay strictly above the current watermark).

    A key that has never seen a non-null event time (``last_us == 0``)
    is NOT armed: max(1970+idle, wm+1) degenerates to wm+1 — an
    immediately-expiring timeout that would evict the seen-set /
    counters on the very next batch, re-admitting duplicates. Such a
    key keeps NoTimeout behavior until a real timestamp arrives.

    ``VAERO_DISABLE_IDLE_EVICTION=1`` is a benchmark-A/B-only knob
    (``tools/ab_eviction.py``): it skips arming so the per-key
    ``setTimeoutTimestamp`` cost can be measured against an otherwise
    identical run. Never set it in production — per-key state then
    grows without bound. (Read at worker import time: local-mode Python
    workers inherit the driver's environment.)"""
    if last_us == 0 or _DISABLE_ARMING:
        return
    state.setTimeoutTimestamp(
        max(
            -(-(last_us + idle_s * 1_000_000) // 1000),
            state.getCurrentWatermarkMs() + 1,
        )
    )


def _dedup_fn(idle_timeout_seconds: int):
    def fn(
        key: Tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # idle past the horizon: seen-set expired
            return
        seen_list, last_us = state.get if state.exists else ([], 0)
        seen = set(seen_list or [])
        for pdf in pdf_iter:
            fresh_mask = ~pdf["turn_idx"].isin(seen) & ~pdf["turn_idx"].duplicated()
            out = pdf[fresh_mask]
            seen.update(int(t) for t in out["turn_idx"])
            if len(pdf):
                last_us = _pdf_max_us(pdf, last_us)
            if len(out):
                yield out
        state.update((sorted(seen), last_us))
        _arm_idle_timeout(state, last_us, idle_timeout_seconds)

    return fn


def stateful_dedup(
    stream: DataFrame,
    watermark: str = "10 minutes",
    idle_timeout_seconds: int = DEFAULT_IDLE_TIMEOUT_S,
) -> DataFrame:
    """Exactly-once per-(conv_id, turn_idx) pass-through — the custom-state
    generalization of ``dropDuplicates`` (reference seed: the Okta cursor
    ``>=`` late/dup gate, ``source_okta.py:91-113``). Keeps the full turn
    row; the seen-set is bounded per conversation AND per-key state is
    evicted after ``idle_timeout_seconds`` of event-time idleness (see
    ``DEFAULT_IDLE_TIMEOUT_S`` for why eviction cannot re-admit a
    duplicate when the horizon covers the watermark delay)."""
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    out_schema = T.StructType([f for f in stream.schema.fields if f.name in cols])
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _dedup_fn(idle_timeout_seconds),
            outputStructType=out_schema,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# routing counters (per-conversation route statistics)
# ---------------------------------------------------------------------------

COUNTER_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_total", T.LongType()),
        T.StructField("n_user", T.LongType()),
        T.StructField("n_tool", T.LongType()),
        T.StructField("n_error", T.LongType()),
    ]
)

COUNTER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_total", T.LongType()),
        T.StructField("n_user", T.LongType()),
        T.StructField("n_tool", T.LongType()),
        T.StructField("n_error", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _counter_fn(idle_timeout_seconds: int):
    def fn(
        key: Tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            # idle past the horizon: evict. The final totals were already
            # emitted on the last real update (update mode), so nothing
            # is emitted here; a resuming conversation restarts at zero
            # and partials merge downstream (DEFAULT_IDLE_TIMEOUT_S note).
            state.remove()
            return
        total, n_user, n_tool, n_error, last_us = (
            state.get if state.exists else (0, 0, 0, 0, 0)
        )
        for pdf in pdf_iter:
            total += len(pdf)
            n_user += int((pdf["role"] == "user").sum())
            n_tool += int((pdf["role"] == "tool").sum())
            # text never crosses the boundary — the error probe is the
            # JVM-evaluated `_is_error` flag (guide §4.1 column pruning)
            n_error += int(pdf["_is_error"].sum())
            if len(pdf):
                last_us = _pdf_max_us(pdf, last_us)
        state.update((total, n_user, n_tool, n_error, last_us))
        _arm_idle_timeout(state, last_us, idle_timeout_seconds)
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "n_total": [total],
                "n_user": [n_user],
                "n_tool": [n_tool],
                "n_error": [n_error],
            }
        )

    return fn


def routing_counters(
    stream: DataFrame,
    watermark: str = "10 minutes",
    idle_timeout_seconds: int = DEFAULT_IDLE_TIMEOUT_S,
) -> DataFrame:
    """Running per-conversation routing statistics (north-star 'routing
    counters' state). Per-key state is evicted after
    ``idle_timeout_seconds`` of event-time idleness — the store holds
    only conversations active within the horizon, not every conversation
    ever seen.

    Python-boundary shape (guide §4.1): only the columns the state
    function reads cross into the worker — the error probe on ``text``
    is evaluated JVM-side into a boolean flag, so the payload column
    never ships (``F.sum`` of the flag equals pandas
    ``str.contains('error').sum()``: null text counts 0 in both)."""
    narrow = stream.select(
        "conv_id",
        "role",
        F.coalesce(F.col("text").contains("error"), F.lit(False)).alias("_is_error"),
        "ts",
    )
    return (
        narrow.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _counter_fn(idle_timeout_seconds),
            outputStructType=COUNTER_OUTPUT_SCHEMA,
            stateStructType=COUNTER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# byte-cap flush parity (batch_max_bytes)
# ---------------------------------------------------------------------------

FLUSH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("prefix", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

FLUSH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buf_bytes", T.LongType()),
        T.StructField("buf_events", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _flush_fn(batch_max_bytes: int, batch_max_time_s: int):
    def fn(
        key: Tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (prefix,) = key
        if state.hasTimedOut:
            # time-cap flush (sinkNode.go:242-254): the watermark passed
            # last-event + batch_max_time with the buffer unflushed —
            # emit the trailing buffer and drop the key (state eviction
            # and the reference's flush timer are the same event here)
            buf_bytes, buf_events, last_us = state.get
            state.remove()
            if buf_events:
                yield pd.DataFrame(
                    [(prefix, buf_events, buf_bytes, pd.Timestamp(int(last_us), unit="us"))],
                    columns=["prefix", "n_events", "n_bytes", "last_ts"],
                )
            return
        buf_bytes, buf_events, last_us = state.get if state.exists else (0, 0, 0)
        flushed = []
        for pdf in pdf_iter:
            # text itself never ships — the JVM-computed char length is
            # all the cap logic reads (guide §4.1; F.length == str.len
            # on code points)
            sizes = pdf["_text_len"].astype("int64") + 1  # + newline, like "\n".join
            us = pdf["ts"].astype("int64")
            if pdf["ts"].dtype == "datetime64[ns]":
                us = us // 1000
            # vectorized pass per Arrow batch; flush decisions are per-event
            # (sinkNode.go:105-125: if appending would exceed the cap, flush
            # existing buffer, start fresh with the new event)
            for size, t in zip(sizes.to_numpy(), us.to_numpy()):
                if buf_bytes + size > batch_max_bytes and buf_events > 0:
                    flushed.append((prefix, buf_events, buf_bytes, pd.Timestamp(int(last_us), unit="us")))
                    buf_bytes, buf_events = 0, 0
                buf_bytes += int(size)
                buf_events += 1
                last_us = int(t)
        state.update((buf_bytes, buf_events, last_us))
        if buf_events:
            _arm_idle_timeout(state, last_us, batch_max_time_s)
        if flushed:
            yield pd.DataFrame(flushed, columns=["prefix", "n_events", "n_bytes", "last_ts"])

    return fn


def byte_cap_flush(
    stream: DataFrame,
    batch_max_bytes: int = 1_000_000,
    batch_max_time_s: int = 300,
    prefix_format: str = "yyyy/MM/dd",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact-parity port of the sink buffer caps: group events by the
    strftime prefix of ts (``sinkNode.go:63-102``), flush a 'file' row
    whenever the buffered text bytes would exceed ``batch_max_bytes``
    (``sinkNode.go:105-125``), AND flush the trailing buffer once the
    watermark passes last-event + ``batch_max_time_s`` — the event-time
    version of the reference's flush timer (``sinkNode.go:242-254``),
    which doubles as state eviction: a prefix's state row lives only
    while its buffer is open, so prefixes (dates) never accumulate
    forever. Rows with null ts are dropped, mirroring the reference's
    silent drop of unparseable timestamps (``sinkNode.go:86-89``)."""
    from pyspark.sql import functions as F

    keyed = (
        stream.filter(F.col("ts").isNotNull())
        .select(
            F.date_format("ts", prefix_format).alias("prefix"),
            F.length("text").alias("_text_len"),
            "ts",
        )
        .withWatermark("ts", watermark)
    )
    return keyed.groupBy("prefix").applyInPandasWithState(
        _flush_fn(batch_max_bytes, batch_max_time_s),
        outputStructType=FLUSH_OUTPUT_SCHEMA,
        stateStructType=FLUSH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# CDC upsert materialization (last-writer-wins entity view)
# ---------------------------------------------------------------------------

UPSERT_OUTPUT_DDL = "doc_id bigint, cur_seq bigint, deleted int, text_md5 string"
UPSERT_STATE_DDL = "best_seq bigint, deleted int, text_md5 string"


def stream_upsert(
    stream: DataFrame,
    id_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
    text_col: str = "text",
) -> DataFrame:
    """CDC UPSERT MATERIALIZATION: fold a stream of change events
    (id, seq, op ∈ {upsert, delete}, text) into the current entity view
    with LAST-WRITER-WINS semantics on the sequence number — the
    Flink-style changelog→table step a recurring crawl's consumers run
    (:func:`vaero_spark.operators.dedup.apply_changeset` is the batch
    sibling over a published diff; this materializes the LIVE feed).

    Out-of-order and duplicate safe BY CONSTRUCTION: the winner is
    ``argmax(seq)``, which no delivery order or at-least-once replay can
    change, so the drained result equals the batch argmax — an exact SQL
    oracle for a stateful streaming op. Tombstones stay in the view
    (``deleted`` = 1, ``text_md5`` = '') so downstream mirrors can
    propagate removals.

    100 TB shape: state is ONE scalar tuple (seq, flag, 32-char md5) per
    ENTITY — the materialized view itself, bounded by the entity count,
    never the event count (RocksDB state store in production). The md5
    is computed JVM-side BEFORE the stateful stage, so Arrow ships only
    (long, long, int, hash) per event and Python compares integers.
    Update mode: every change re-emits the entity's current row, so
    last-emission-wins gives consumers the view without a terminal scan.
    """
    from pyspark.sql import functions as F

    pre = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(seq_col).cast("long").alias("_seq"),
        (F.col(op_col) == F.lit("delete")).cast("int").alias("_del"),
        F.coalesce(F.md5(F.col(text_col)), F.lit("")).alias("_md5"),
    )

    def fn(key, pdfs, state):
        best, deleted, md5h = state.get if state.exists else (-1, 0, "")
        for pdf in pdfs:
            for s, d, m in zip(pdf["_seq"], pdf["_del"], pdf["_md5"]):
                if int(s) > best:
                    best, deleted = int(s), int(d)
                    md5h = "" if deleted else str(m)
        state.update((best, deleted, md5h))
        out = pd.DataFrame(
            [(key[0], best, deleted, md5h)],
            columns=["doc_id", "cur_seq", "deleted", "text_md5"],
        )
        yield out.astype(
            {"doc_id": "int64", "cur_seq": "int64", "deleted": "int32"}
        )

    return pre.groupBy("doc_id").applyInPandasWithState(
        fn,
        outputStructType=UPSERT_OUTPUT_DDL,
        stateStructType=UPSERT_STATE_DDL,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
