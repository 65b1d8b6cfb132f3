"""CEP sequence-pattern matching over conversation role sequences."""

from __future__ import annotations

import re

import pandas as pd
import pytest

from vaero_spark.operators.cep import ROLE_SYMBOLS, cep_match

ROLES = ["user", "assistant", "tool", "system"]


def _fixture_rows():
    """Deterministic pseudo-random conversations (hash-picked roles, so
    repeats and runs actually occur)."""
    import hashlib

    rows = []
    for conv in range(30):
        for i in range((conv * 7) % 13 + 3):
            pick = int(hashlib.md5(f"{conv}-{i}".encode()).hexdigest(), 16) % 4
            rows.append((f"c{conv}", i, ROLES[pick]))
    # one conversation with an unknown role: renders as '?', never matches
    rows += [("weird", 0, "tool"), ("weird", 1, "narrator"), ("weird", 2, "user")]
    return rows


@pytest.mark.parametrize("pattern", ["tt+u", "ua", "t[ua]s?", "^u", "s$"])
def test_cep_match_matches_python_re(spark, pattern):
    """n_matches and first_match_turn agree with Python's re (the
    non-overlapping ``finditer`` scan) on every conversation, and
    match-free conversations are excluded."""
    rows = _fixture_rows()
    out = cep_match(spark.createDataFrame(rows, ["conv_id", "turn_idx", "role"]), pattern)
    got = {r.conv_id: (r.n_turns, r.n_matches, r.first_match_turn) for r in out.collect()}

    seqs: dict[str, list[tuple[int, str]]] = {}
    for conv, idx, role in rows:
        seqs.setdefault(conv, []).append((idx, ROLE_SYMBOLS.get(role, "?")))
    expect = {}
    for conv, turns in seqs.items():
        seq = "".join(c for _, c in sorted(turns))
        matches = list(re.finditer(pattern, seq))
        if matches:
            expect[conv] = (len(seq), len(matches), matches[0].start())
    assert got == expect
    assert expect, f"fixture produced no matches for {pattern!r}"
    assert len(expect) < len(seqs), f"{pattern!r} matched every conversation"


def test_cep_match_tool_loop_fixture(spark):
    """A hand-built tool-churn conversation: two tool turns then a user
    interrupt matches ``tt+u`` exactly once, starting at the loop."""
    rows = [("c", i, r) for i, r in enumerate(
        ["user", "assistant", "tool", "tool", "tool", "user", "assistant"]
    )]
    out = cep_match(
        spark.createDataFrame(rows, ["conv_id", "turn_idx", "role"]), "tt+u"
    ).collect()
    assert [(r.conv_id, r.n_turns, r.n_matches, r.first_match_turn) for r in out] == [
        ("c", 7, 1, 2)
    ]


def test_stream_cep_final_state_equals_batch(spark, tmp_path):
    """Drain a multi-trigger file stream (rows shuffled within files)
    through the streaming CEP state machine; the last UPDATE emission
    per conversation must equal the batch operator on the same rows —
    the reassembly/carry logic survives out-of-order arrival."""
    import os

    from vaero_spark.operators.cep import stream_cep_match
    from vaero_spark.sinks.writers import MemorySink
    from vaero_spark.sources.transcripts import transcripts_stream
    from vaero_spark.testing.fixtures import write_transcripts_parquet

    src_dir = str(tmp_path / "src")
    write_transcripts_parquet(
        src_dir, n_files=5, n_turns=1200, n_convs=30, seed=7, role_mode="hash"
    )
    stream = transcripts_stream(spark, src_dir, max_files_per_trigger=1)
    out = stream_cep_match(stream, "ttu", watermark="60 days")
    sink = MemorySink()
    q = (
        out.writeStream.outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = {}
    for _, rows in sorted(sink.batches):
        for r in rows:
            final[r.conv_id] = (r.n_turns, r.n_matches, r.first_match_turn)
    got = {c: v for c, v in final.items() if v[1] > 0}

    # the stream op is exactly-once per (conv, turn) — late duplicate
    # rows in the fixture are ignored — so the batch comparison runs on
    # the deduped table (the canonical transcripts table is unique)
    batch = spark.read.parquet(src_dir).dropDuplicates(["conv_id", "turn_idx"])
    want = {
        r.conv_id: (r.n_turns, r.n_matches, r.first_match_turn)
        for r in cep_match(batch, "ttu").collect()
    }
    assert got == want
    assert want, "fixture produced no matches for 'ttu'"
    # every conversation fully reassembled (n_turns = its row count)
    totals = {r.conv_id: r.cnt for r in batch.groupBy("conv_id").count().withColumnRenamed("count", "cnt").collect()}
    for conv, (n_turns, _, _) in final.items():
        assert n_turns == totals[conv], conv


def test_stream_cep_fn_reassembles_out_of_order():
    """Unit-drive the state fn batch-by-batch with an adversarial
    arrival order: the match spanning a batch boundary is found once
    the gap fills, never double-counted."""
    from vaero_spark.operators.cep import ROLE_SYMBOLS, _stream_cep_fn

    class FakeState:
        exists = False
        hasTimedOut = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def setTimeoutTimestamp(self, *a, **k):
            pass

        def getCurrentWatermarkMs(self):
            return 0

        def remove(self):
            self._v, self.exists = None, False

    roles = ["user", "tool", "tool", "user", "assistant", "tool", "tool", "user"]
    # seq = "uttuattu": matches of "ttu" at 1 and 5
    fn = _stream_cep_fn("ttu", ROLE_SYMBOLS, 3600)
    state = FakeState()

    def feed(idxs):
        pdf = pd.DataFrame(
            {"turn_idx": idxs, "role": [roles[i] for i in idxs],
             "ts": pd.Timestamp("2024-01-01")}
        )
        return list(fn(("c",), iter([pdf]), state))

    # batch 1: turns 0,1 then a gap — turn 3,4 wait in pending
    out1 = feed([0, 1, 3, 4])
    assert out1 and out1[0]["n_matches"].iloc[0] == 0
    assert out1[0]["n_turns"].iloc[0] == 2  # contiguous prefix stops at gap
    # batch 2: the gap (turn 2) + duplicates of consumed turns
    out2 = feed([2, 0, 1])
    assert out2[0]["n_turns"].iloc[0] == 5
    assert out2[0]["n_matches"].iloc[0] == 1
    assert out2[0]["first_match_turn"].iloc[0] == 1
    # batch 3: the tail; second match spans the carry
    out3 = feed([5, 6, 7])
    assert out3[0]["n_turns"].iloc[0] == 8
    assert out3[0]["n_matches"].iloc[0] == 2
    assert out3[0]["first_match_turn"].iloc[0] == 1


def test_stream_cep_rejects_bad_literals():
    from vaero_spark.operators.cep import stream_cep_match

    for bad in ["", "txu", "t+u"]:
        with pytest.raises(ValueError):
            stream_cep_match(None, bad)


def test_kleene_parser_widths_and_lazy_form():
    from vaero_spark.operators.cep import ROLE_SYMBOLS, parse_kleene_pattern

    assert parse_kleene_pattern("t{2,3}u", ROLE_SYMBOLS) == (3, 4, "t{2,3}?u")
    assert parse_kleene_pattern("ta?u", ROLE_SYMBOLS) == (2, 3, "ta??u")
    assert parse_kleene_pattern("[ta]{1,2}u", ROLE_SYMBOLS) == (2, 3, "[ta]{1,2}?u")
    assert parse_kleene_pattern("t{2}u", ROLE_SYMBOLS) == (3, 3, "t{2}u")
    for bad in ["t*u", "t+u", "(tu){1,2}", "a?", "x{1,2}u", "t{3,2}u", ""]:
        with pytest.raises(ValueError):
            parse_kleene_pattern(bad, ROLE_SYMBOLS)


def test_stream_cep_kleene_fn_earliest_completion_and_carry():
    """Unit-drive the Kleene state fn: a quantified match held open at
    a batch boundary completes (earliest-completion) once the next
    symbols arrive, the carry stays < max_len, and a greedy-looking
    continuation does NOT extend an already-final match."""
    from vaero_spark.operators.cep import (
        ROLE_SYMBOLS,
        _stream_cep_kleene_fn,
        parse_kleene_pattern,
    )

    class FakeState:
        exists = False
        hasTimedOut = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def setTimeoutTimestamp(self, *a, **k):
            pass

        def getCurrentWatermarkMs(self):
            return 0

        def remove(self):
            self._v, self.exists = None, False

    l_min, l_max, lazy = parse_kleene_pattern("t{2,3}u", ROLE_SYMBOLS)
    fn = _stream_cep_kleene_fn(lazy, l_min, l_max, ROLE_SYMBOLS, 3600)
    state = FakeState()
    #         0      1      2      3      4      5       6      7
    roles = ["tool", "tool", "tool", "user", "tool", "tool", "user", "user"]
    # seq "tttuttuu": earliest-completion t{2,3}u: shortest at 0 needs
    # 3 t's + u (no u at 2) => match [0,4); then match "ttu" at 4;
    # n_matches 2, first at 0

    def feed(idxs):
        pdf = pd.DataFrame(
            {"turn_idx": idxs, "role": [roles[i] for i in idxs],
             "ts": pd.Timestamp("2024-01-01")}
        )
        return list(fn(("c",), iter([pdf]), state))

    out1 = feed([0, 1])  # "tt": could still match with more input => carried
    assert out1[0]["n_matches"].iloc[0] == 0
    assert len(state._v[3]) < l_max  # carry bounded by max_len
    out2 = feed([2, 3])  # "tttu" complete => one match, not two
    assert out2[0]["n_matches"].iloc[0] == 1
    assert out2[0]["first_match_turn"].iloc[0] == 0
    out3 = feed([4, 5, 6, 7])  # "ttuu" => second match at 4
    assert out3[0]["n_matches"].iloc[0] == 2
    assert out3[0]["n_turns"].iloc[0] == 8
    assert len(state._v[3]) < l_max


def test_stream_cep_kleene_drain_equals_batch_lazy(spark, tmp_path):
    """Drain the Kleene streaming matcher over a multi-trigger file
    stream; the last emission per conversation equals the batch regex
    operator with the RELUCTANT form of the pattern (the documented
    earliest-completion twin)."""
    import os

    from vaero_spark.operators.cep import stream_cep_kleene
    from vaero_spark.sinks.writers import MemorySink
    from vaero_spark.sources.transcripts import transcripts_stream
    from vaero_spark.testing.fixtures import write_transcripts_parquet

    src_dir = str(tmp_path / "src")
    write_transcripts_parquet(
        src_dir, n_files=5, n_turns=1200, n_convs=30, seed=11, role_mode="hash"
    )
    stream = transcripts_stream(spark, src_dir, max_files_per_trigger=1)
    out = stream_cep_kleene(stream, "t{2,3}u", watermark="60 days")
    sink = MemorySink()
    q = (
        out.writeStream.outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = {}
    for _, rows in sorted(sink.batches):
        for r in rows:
            final[r.conv_id] = (r.n_turns, r.n_matches, r.first_match_turn)
    got = {c: v for c, v in final.items() if v[1] > 0}

    batch = spark.read.parquet(src_dir).dropDuplicates(["conv_id", "turn_idx"])
    want = {
        r.conv_id: (r.n_turns, r.n_matches, r.first_match_turn)
        for r in cep_match(batch, "t{2,3}?u").collect()
    }
    assert got == want
    assert want, "fixture produced no matches for 't{2,3}u'"


def test_cep_match_rejects_unsafe_patterns(spark):
    df = None  # validation happens before any Spark work
    for bad in ["t*", "(u)\\1", "u(?=a)", ""]:
        with pytest.raises(ValueError):
            cep_match(df, bad)
    with pytest.raises(ValueError):
        cep_match(df, "ua", symbols={"user": "u", "assistant": "u"})
    with pytest.raises(ValueError):
        cep_match(df, "ua", symbols={"user": "??"})


def test_cep_within_time_bound_excludes_slow_completions(spark):
    """The within-clause: same role sequence, one completing inside the
    span and one straddling it — only the fast one counts; sliding
    (overlapping) starts all count. Brute-forced in Python."""
    import datetime

    from vaero_spark.operators.cep import cep_within

    base = datetime.datetime(2024, 1, 1)
    # conv A: t t u inside 10 min => hit at 0
    # conv B: t t u with 2 h before the u => no hit at span 3600
    # conv C: t t t u tight => 'ttu' hits only at 1; 'tt' hits at 0
    # AND 1 (sliding starts overlap)
    rows = []
    for conv, seq, gaps in [
        ("A", "ttu", [0, 60, 120]),
        ("B", "ttu", [0, 60, 7800]),
        ("C", "tttu", [0, 30, 60, 90]),
    ]:
        roles = {"t": "tool", "u": "user"}
        for i, (s, g) in enumerate(zip(seq, gaps)):
            rows.append((conv, i, roles[s], base + datetime.timedelta(seconds=g)))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, ts timestamp")
    got = {
        r.conv_id: (r.n_turns, r.n_within, r.first_within_turn)
        for r in cep_within(df, "ttu", 3600).collect()
    }
    assert got == {"A": (3, 1, 0), "C": (4, 1, 1)}
    got_tt = {
        r.conv_id: (r.n_within, r.first_within_turn)
        for r in cep_within(df, "tt", 3600).collect()
    }
    assert got_tt == {"A": (1, 0), "B": (1, 0), "C": (2, 0)}
    with pytest.raises(ValueError):
        cep_within(df, "t", 3600)  # spans need two ends
    with pytest.raises(ValueError):
        cep_within(df, "ttu", -1)


def test_stream_within_every_emission_equals_prefix_batch():
    """Unit-drive the streaming within machine over random timed role
    strings and every chunking: each emission must equal the brute-force
    sliding lead-chain scan of the consumed prefix (no end-of-stream
    fold exists in these semantics)."""
    import itertools
    import random

    from vaero_spark.operators.cep import ROLE_SYMBOLS, _stream_within_fn

    SYM_TO_ROLE = {v: k for k, v in ROLE_SYMBOLS.items()}

    class FakeState:
        exists = False
        hasTimedOut = False
        _v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def setTimeoutTimestamp(self, *a, **k):
            pass

        def getCurrentWatermarkMs(self):
            return 0

        def remove(self):
            self._v, self.exists = None, False

    def brute(seq, mss, literal, span_ms):
        L = len(literal)
        n = first = 0
        first = -1
        for p in range(len(seq) - L + 1):
            if seq[p : p + L] == literal and mss[p + L - 1] - mss[p] <= span_ms:
                n += 1
                if first < 0:
                    first = p
        return len(seq), n, first

    rng = random.Random(9)
    literal, span_ms = "ttu", 600_000
    for trial in range(60):
        n = rng.randrange(2, 9)
        seq = "".join(rng.choice("uat") for _ in range(n))
        base = 1_704_067_200_000
        mss = []
        t = base
        for _ in range(n):
            t += rng.choice([1_000, 120_000, 400_000, 700_000])
            mss.append(t)
        cuts = sorted(rng.sample(range(1, n), k=min(2, n - 1))) + [n]
        fn = _stream_within_fn(literal, span_ms, ROLE_SYMBOLS, 3600)
        state = FakeState()
        pos = 0
        for cut in cuts:
            idxs = list(range(pos, cut))
            pdf = pd.DataFrame(
                {
                    "turn_idx": idxs,
                    "role": [SYM_TO_ROLE[seq[i]] for i in idxs],
                    "ts": pd.to_datetime([mss[i] for i in idxs], unit="ms"),
                }
            )
            for emitted in fn(("c",), iter([pdf]), state):
                got = (
                    int(emitted["n_turns"].iloc[0]),
                    int(emitted["n_within"].iloc[0]),
                    int(emitted["first_within_turn"].iloc[0]),
                )
                assert got == brute(seq[:cut], mss[:cut], literal, span_ms), (
                    seq, mss, cuts, cut,
                )
            pos = cut
        # carry bounded by L-1 symbols
        assert len(state._v[4] or "") <= len(literal) - 1


def test_stream_within_drain_equals_batch(spark, tmp_path):
    """Drain the streaming within detector over an out-of-order file
    stream; last emissions (n_within > 0) == the batch operator."""
    import os

    from vaero_spark.operators.cep import cep_within, stream_cep_within
    from vaero_spark.sinks.writers import MemorySink
    from vaero_spark.sources.transcripts import transcripts_stream
    from vaero_spark.testing.fixtures import write_transcripts_parquet

    src_dir = str(tmp_path / "src")
    write_transcripts_parquet(
        src_dir, n_files=5, n_turns=900, n_convs=18, seed=21, role_mode="hash"
    )
    stream = transcripts_stream(spark, src_dir, max_files_per_trigger=1)
    out = stream_cep_within(stream, "tu", 1800, watermark="60 days")
    sink = MemorySink()
    q = (
        out.writeStream.outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = {}
    for _, rows in sorted(sink.batches):
        for r in rows:
            final[r.conv_id] = (r.n_turns, r.n_within, r.first_within_turn)
    got = {c: v for c, v in final.items() if v[1] > 0}
    batch = spark.read.parquet(src_dir).dropDuplicates(["conv_id", "turn_idx"])
    want = {
        r.conv_id: (r.n_turns, r.n_within, r.first_within_turn)
        for r in cep_within(batch, "tu", 1800).collect()
    }
    assert got == want
    assert want, "fixture produced no within-span matches"


def test_cep_match_multi_equals_per_pattern_runs(spark):
    """The one-pass library scan must equal N independent cep_match
    runs, pattern for pattern."""
    from vaero_spark.operators.cep import cep_match, cep_match_multi
    from vaero_spark.testing.fixtures import write_transcripts_parquet

    import tempfile

    d = tempfile.mkdtemp(prefix="cmm_")
    write_transcripts_parquet(d, n_files=1, n_turns=400, n_convs=12, seed=5, role_mode="hash")
    df = spark.read.parquet(d)
    pats = {"loop": "tt+u", "end_u": "u$", "sys": "s[ua]"}
    got = sorted(
        (r.pattern, r.conv_id, r.n_matches, r.first_match_turn)
        for r in cep_match_multi(df, pats).collect()
    )
    want = sorted(
        (name, r.conv_id, r.n_matches, r.first_match_turn)
        for name, pat in pats.items()
        for r in cep_match(df, pat).collect()
    )
    assert got == want and want
