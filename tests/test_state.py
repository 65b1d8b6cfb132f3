"""Custom keyed-state operators (applyInPandasWithState): open-session
tracking with event-time timeout, stateful dedup, routing counters,
byte-cap flush parity."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vaero_spark.operators.state import (
    byte_cap_flush,
    routing_counters,
    stateful_dedup,
    track_open_sessions,
)
from vaero_spark.sinks.writers import MemorySink
from vaero_spark.sources.transcripts import transcripts_stream
from vaero_spark.testing.fixtures import write_transcripts_parquet


def _run(spark, df, tmp, name, mode="update"):
    sink = MemorySink()
    q = (
        df.writeStream.outputMode(mode)
        .option("checkpointLocation", os.path.join(tmp, f"ckpt_{name}"))
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return sink


@pytest.fixture(scope="module")
def src(tmp_path_factory):
    d = tmp_path_factory.mktemp("state_src")
    pdf = write_transcripts_parquet(str(d), n_files=3, n_turns=1500, n_convs=40, seed=23)
    return str(d), pdf


def test_stateful_dedup_removes_duplicates(spark, src, tmp_path):
    src_dir, pdf = src
    stream = transcripts_stream(spark, src_dir, max_files_per_trigger=1)
    deduped = stateful_dedup(stream)
    sink = _run(spark, deduped, str(tmp_path), "dedup", "append")
    got = [(r.conv_id, r.turn_idx) for r in sink.rows()]
    assert len(got) == len(set(got)), "emitted duplicates"
    # every distinct (conv, turn) appears exactly once
    want = set(zip(pdf["conv_id"], pdf["turn_idx"]))
    assert set(got) == want


def test_routing_counters_final_totals(spark, src, tmp_path):
    src_dir, pdf = src
    stream = transcripts_stream(spark, src_dir, max_files_per_trigger=1)
    counters = routing_counters(stream)
    sink = _run(spark, counters, str(tmp_path), "counters", "update")
    # last update per conv = final totals
    final = {}
    for _, rows in sink.batches:
        for r in rows:
            final[r.conv_id] = (r.n_total, r.n_user, r.n_tool)
    want = (
        pdf.assign(
            is_user=lambda d: d.role.eq("user"), is_tool=lambda d: d.role.eq("tool")
        )
        .groupby("conv_id")
        .agg(n=("role", "size"), u=("is_user", "sum"), t=("is_tool", "sum"))
    )
    for conv, row in want.iterrows():
        assert final[conv] == (row.n, row.u, row.t), conv


def test_open_sessions_close_on_watermark(spark, tmp_path):
    """Sessions emit closed=True once the watermark passes last_ts+gap —
    event-time version of the reference's batch_max_time flush timer."""
    import time

    src = tmp_path / "src"
    src.mkdir()
    base = pd.Timestamp("2024-03-01 09:00:00")

    def mk(rows, f):
        conv, idx, ts = zip(*rows)
        pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": pd.array(idx, dtype="int32"),
                "role": ["user"] * len(rows),
                "text": ["x"] * len(rows),
                "tool": [""] * len(rows),
                "ts": pd.Series(ts).astype("datetime64[us]"),
            }
        ).to_parquet(src / f, index=False)
        time.sleep(1.1)

    mk([("c1", 0, base), ("c1", 1, base + pd.Timedelta("5 minutes"))], "f0.parquet")
    # far-future row advances the watermark beyond c1's last+gap
    mk([("c2", 0, base + pd.Timedelta("3 hours"))], "f1.parquet")
    mk([("c2", 1, base + pd.Timedelta("6 hours"))], "f2.parquet")

    stream = transcripts_stream(spark, str(src), max_files_per_trigger=1)
    sessions = track_open_sessions(stream, gap_seconds=1800, watermark="10 minutes")
    sink = _run(spark, sessions, str(tmp_path), "sessions", "append")
    closed = [r for r in sink.rows() if r.closed and r.conv_id == "c1"]
    assert len(closed) == 1
    (s,) = closed
    assert s.n_turns == 2
    assert s.session_start == base.to_pydatetime().replace(tzinfo=None)
    assert s.session_end == (base + pd.Timedelta("35 minutes")).to_pydatetime().replace(tzinfo=None)


def _run_with_progress(spark, df, tmp, name, mode="update"):
    sink = MemorySink()
    q = (
        df.writeStream.outputMode(mode)
        .option("checkpointLocation", os.path.join(tmp, f"ckpt_{name}"))
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    q.processAllAvailable()
    prog = [p for p in q.recentProgress if p.get("stateOperators")]
    q.stop()
    return sink, prog


def _mk_idle_src(tmp_path):
    """c1 is active early then goes idle; c2's far-future turns advance
    the watermark past c1's idle horizon."""
    import time

    src = tmp_path / "idle_src"
    src.mkdir()
    base = pd.Timestamp("2024-03-01 09:00:00")

    def mk(rows, f):
        conv, idx, ts = zip(*rows)
        pd.DataFrame(
            {
                "conv_id": conv,
                "turn_idx": pd.array(idx, dtype="int32"),
                "role": ["user"] * len(rows),
                "text": ["x"] * len(rows),
                "tool": [""] * len(rows),
                "ts": pd.Series(ts).astype("datetime64[us]"),
            }
        ).to_parquet(src / f, index=False)
        time.sleep(1.1)

    mk([("c1", 0, base), ("c1", 1, base + pd.Timedelta("5 minutes"))], "f0.parquet")
    mk([("c2", 0, base + pd.Timedelta("3 hours"))], "f1.parquet")
    mk([("c2", 1, base + pd.Timedelta("6 hours"))], "f2.parquet")
    return str(src), base


def test_routing_counters_evict_idle_state(spark, tmp_path):
    """Per-key counter state must NOT live forever: once the watermark
    passes a conversation's last event + idle horizon, its state row is
    removed — the 100 TB / months-long-run bound. The totals emitted
    BEFORE eviction are unaffected."""
    src_dir, base = _mk_idle_src(tmp_path)
    stream = transcripts_stream(spark, src_dir, max_files_per_trigger=1)
    counters = routing_counters(
        stream, watermark="10 minutes", idle_timeout_seconds=600
    )
    sink, prog = _run_with_progress(spark, counters, str(tmp_path), "cnt_evict")
    final = {}
    for _, rows in sink.batches:
        for r in rows:
            final[r.conv_id] = r.n_total
    assert final == {"c1": 2, "c2": 2}  # emissions complete despite eviction
    # after the last batch only c2 is inside the idle horizon: c1's
    # state row was evicted by the event-time timeout
    assert prog, "no stateOperators progress recorded"
    assert prog[-1]["stateOperators"][0]["numRowsTotal"] == 1
    assert any(
        p["stateOperators"][0].get("numRowsRemoved", 0) > 0 for p in prog
    )


def test_stateful_dedup_evicts_idle_state_and_still_dedups(spark, tmp_path):
    """Same eviction bound for the dedup seen-sets; duplicates within
    the horizon are still dropped after other keys were evicted."""
    src_dir, base = _mk_idle_src(tmp_path)
    import time

    # a duplicate of c2 turn 1 in a later file: still deduped
    pd.DataFrame(
        {
            "conv_id": ["c2"],
            "turn_idx": pd.array([1], dtype="int32"),
            "role": ["user"],
            "text": ["x"],
            "tool": [""],
            "ts": pd.Series([pd.Timestamp("2024-03-01 15:00:00")]).astype(
                "datetime64[us]"
            ),
        }
    ).to_parquet(os.path.join(src_dir, "f3.parquet"), index=False)
    time.sleep(1.1)
    stream = transcripts_stream(spark, src_dir, max_files_per_trigger=1)
    deduped = stateful_dedup(stream, watermark="10 minutes", idle_timeout_seconds=600)
    sink, prog = _run_with_progress(spark, deduped, str(tmp_path), "dedup_evict", "append")
    got = sorted((r.conv_id, r.turn_idx) for r in sink.rows())
    assert got == [("c1", 0), ("c1", 1), ("c2", 0), ("c2", 1)]  # dup dropped
    assert prog[-1]["stateOperators"][0]["numRowsTotal"] == 1  # c1 evicted
    assert any(p["stateOperators"][0].get("numRowsRemoved", 0) > 0 for p in prog)


def test_pdf_max_us_ignores_nat():
    """NaT becomes the -2^63 sentinel under an int64 view; the last-event
    tracker must skip null ts or an all-null conversation arms an
    already-expired timeout and is evicted on the next batch."""
    from vaero_spark.operators.state import _pdf_max_us

    ts = pd.Series([pd.NaT, pd.Timestamp("2024-03-01 09:00:00")]).astype("datetime64[us]")
    want = int(pd.Timestamp("2024-03-01 09:00:00").value // 1000)
    assert _pdf_max_us(pd.DataFrame({"ts": ts}), 0) == want
    assert _pdf_max_us(pd.DataFrame({"ts": ts}), want + 5) == want + 5  # monotone
    all_nat = pd.Series([pd.NaT, pd.NaT]).astype("datetime64[us]")
    assert _pdf_max_us(pd.DataFrame({"ts": all_nat}), 7) == 7  # unchanged


def test_arm_idle_timeout_skips_all_null_ts_key():
    """A key whose rows ALL carry null ts keeps last_us=0; arming it
    would degenerate to watermark+1 — an immediately-expiring timeout
    that evicts the seen-set on the next batch, re-admitting duplicates.
    Such a key must retain NoTimeout behavior until a real ts arrives."""
    from vaero_spark.operators.state import _arm_idle_timeout

    class _FakeState:
        def __init__(self):
            self.armed = None

        def setTimeoutTimestamp(self, v):
            self.armed = v

        def getCurrentWatermarkMs(self):
            return 1_700_000_000_000

    st = _FakeState()
    _arm_idle_timeout(st, 0, 3600)
    assert st.armed is None  # never armed: NoTimeout retained
    _arm_idle_timeout(st, 1_700_000_100_000_000, 3600)
    assert st.armed == 1_700_000_100_000 + 3600 * 1000  # real ts arms


def test_byte_cap_flush_counts(spark, src, tmp_path):
    """batch_max_bytes parity (sinkNode.go:105-125): flush rows appear
    whenever a prefix buffer would exceed the cap; each flushed buffer
    except the trailing one is ≤ cap and adding one more event would
    have exceeded it."""
    src_dir, pdf = src
    cap = 2000
    stream = transcripts_stream(spark, src_dir, max_files_per_trigger=1)
    flushes = byte_cap_flush(stream, batch_max_bytes=cap, prefix_format="yyyy-MM-dd")
    sink = _run(spark, flushes, str(tmp_path), "flush", "append")
    rows = sink.rows()
    assert rows, "no flushes"
    assert all(r.n_bytes <= cap for r in rows)
    total_flushed = sum(r.n_events for r in rows)
    assert 0 < total_flushed <= len(pdf)


def test_byte_cap_time_flush_drains_trailing_buffer(spark, tmp_path):
    """The event-time version of the reference's batch_max_time timer
    (sinkNode.go:242-254): once the watermark passes a prefix's last
    event + time cap, its trailing sub-cap buffer flushes and the state
    row is evicted — EVERY event ends up flushed, prefixes don't
    accumulate open buffers forever."""
    src_dir, base = _mk_idle_src(tmp_path)
    stream = transcripts_stream(spark, src_dir, max_files_per_trigger=1)
    flushes = byte_cap_flush(
        stream,
        batch_max_bytes=10_000_000,  # byte cap never reached
        batch_max_time_s=300,
        prefix_format="yyyy-MM-dd HH",  # hour prefixes: c1's hour goes idle
        watermark="10 minutes",
    )
    sink, prog = _run_with_progress(spark, flushes, str(tmp_path), "tflush", "append")
    rows = sink.rows()
    # c1's two 09:xx turns flushed by the time cap (single flush row)
    nine = [r for r in rows if r.prefix.endswith("09")]
    assert len(nine) == 1 and nine[0].n_events == 2
    assert any(p["stateOperators"][0].get("numRowsRemoved", 0) > 0 for p in prog)