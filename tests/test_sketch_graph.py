"""Exact small-case pins for the sketch family (Count-Min, HyperLogLog)
and integer TextRank — each Spark result is compared against an
independent pure-Python evaluation of the same spec constants, so these
tests fail on any drift in the hash family, register routing, or the
fixed-point recurrence. Cross-engine parity is the oracle gate's job."""

from __future__ import annotations

import hashlib

from vaero_spark.functions.text import MINHASH_P
from vaero_spark.operators.graph import (
    TEXTRANK_BASE,
    TEXTRANK_DAMP_BP,
    TEXTRANK_R0,
    textrank,
)
from vaero_spark.operators.sketch import (
    CMS_A,
    CMS_B,
    CMS_D,
    CMS_W,
    HLL_ALPHA_BP,
    HLL_M,
    HLL_MAX_RANK,
    countmin_report,
    hll_summary,
)

DOCS = [
    (1, "alpha beta alpha gamma alpha beta"),
    (2, "beta gamma delta delta delta delta"),
    (3, "alpha delta epsilon zeta eta theta"),
    (4, "alpha alpha alpha beta beta gamma"),
]


def _h40(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:10], 16)


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

def _py_cms(token_counts: dict[str, int]) -> dict[str, int]:
    cells: dict[tuple[int, int], int] = {}
    for tok, n in token_counts.items():
        h31 = _h40(tok) % MINHASH_P
        for i in range(CMS_D):
            col = ((CMS_A[i] * h31 + CMS_B[i]) % MINHASH_P) % CMS_W
            cells[(i, col)] = cells.get((i, col), 0) + n
    est = {}
    for tok in token_counts:
        h31 = _h40(tok) % MINHASH_P
        est[tok] = min(
            cells[(i, ((CMS_A[i] * h31 + CMS_B[i]) % MINHASH_P) % CMS_W)]
            for i in range(CMS_D)
        )
    return est


def test_countmin_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    counts: dict[str, int] = {}
    for _, text in DOCS:
        for t in text.split():
            counts[t] = counts.get(t, 0) + 1
    est = _py_cms(counts)
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    rows = sorted(countmin_report(df).collect(), key=lambda r: r.rank)
    assert [(r.token, r.n_exact) for r in rows] == expect
    for r in rows:
        assert r.n_cms == est[r.token]
        assert r.n_cms >= r.n_exact  # CMS never underestimates


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def _py_hll(tokens: set[str]):
    regs = [0] * HLL_M
    for t in tokens:
        h = _h40(t)
        reg = h % HLL_M
        sfx = h >> 6
        if sfx == 0:
            rank = HLL_MAX_RANK
        else:
            rank = 1
            while sfx % 2 == 0:
                rank += 1
                sfx //= 2
        regs[reg] = max(regs[reg], rank)
    r_max = max(regs)
    s_sum = sum(1 << (r_max - mr) for mr in regs)
    est = (HLL_ALPHA_BP * HLL_M * HLL_M * (1 << r_max)) // (10000 * s_sum)
    return regs, r_max, s_sum, est


def test_hll_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    vocab = {t for _, text in DOCS for t in text.split()}
    regs, r_max, s_sum, est = _py_hll(vocab)

    r = hll_summary(df).collect()[0]
    assert r.m == HLL_M
    assert r.n_exact == len(vocab)
    assert list(r.regs) == regs
    assert (r.r_max, r.s_sum, r.est_distinct) == (r_max, s_sum, est)
    assert r.err_bp == (10000 * abs(est - len(vocab))) // len(vocab)


def test_hll_register_merge_is_max(spark):
    """Registers of a union corpus == element-wise max of the halves —
    the mergeability property that makes the sketch shuffle-free."""
    half_a, half_b = DOCS[:2], DOCS[2:]
    ra = hll_summary(spark.createDataFrame(half_a, ["doc_id", "text"])).collect()[0]
    rb = hll_summary(spark.createDataFrame(half_b, ["doc_id", "text"])).collect()[0]
    ru = hll_summary(spark.createDataFrame(DOCS, ["doc_id", "text"])).collect()[0]
    assert list(ru.regs) == [max(a, b) for a, b in zip(ra.regs, rb.regs)]


# ---------------------------------------------------------------------------
# TextRank
# ---------------------------------------------------------------------------

def _py_textrank(docs, iters):
    edges: dict[tuple[str, str], int] = {}
    nodes: set[str] = set()
    for _, text in docs:
        toks = text.split()
        nodes.update(toks)
        for a, b in zip(toks, toks[1:]):
            edges[(a, b)] = edges.get((a, b), 0) + 1
    wout = {n: 0 for n in nodes}
    for (a, _), w in edges.items():
        wout[a] += w
    wt = {n: max(w, 1) for n, w in wout.items()}
    r = {n: TEXTRANK_R0 for n in nodes}
    for _ in range(iters):
        nxt = {n: TEXTRANK_BASE for n in nodes}
        for (a, b), w in edges.items():
            nxt[b] += (TEXTRANK_DAMP_BP * r[a] * w) // (10000 * wt[a])
        r = nxt
    return r


def test_textrank_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    ref = _py_textrank(DOCS, iters=6)
    expect = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:25]

    rows = sorted(textrank(df).collect(), key=lambda r: r.rank)
    assert [(r.token, r.score) for r in rows] == expect


def test_textrank_sink_node_keeps_base(spark):
    """A token that never leads anywhere (corpus-final, no out-edges)
    still surfaces every round via its self-loop, at exactly BASE +
    incoming contributions — the working-table-completeness property
    the recursive oracle depends on."""
    docs = [(1, "a b c")]  # c has no out-edge
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    ref = _py_textrank(docs, iters=6)
    rows = {r.token: r.score for r in textrank(df).collect()}
    assert rows == ref
    # a receives nothing after round 1: pinned at BASE
    assert rows["a"] == TEXTRANK_BASE

# ---------------------------------------------------------------------------
# Windowed HLL (batch == python reference; summary layer == gate math)
# ---------------------------------------------------------------------------

def test_windowed_hll_matches_python_reference(spark):
    """Two windows, disjoint vocab skew: each window's registers,
    estimate, and exact grading must equal the pure-Python evaluation
    restricted to that window."""
    import datetime

    from vaero_spark.operators.sketch import windowed_hll

    t0 = datetime.datetime(2026, 1, 1, 10, 0, 0)
    t1 = datetime.datetime(2026, 1, 1, 11, 30, 0)
    rows = [(d, txt, t0 if d <= 2 else t1) for d, txt in DOCS]
    df = spark.createDataFrame(rows, "doc_id int, text string, ts timestamp")

    by_win = {
        t0.replace(minute=0): {t for d, txt in DOCS if d <= 2 for t in txt.split()},
        t1.replace(minute=0): {t for d, txt in DOCS if d > 2 for t in txt.split()},
    }
    got = {r.win_start: r for r in windowed_hll(df).collect()}
    assert set(got) == set(by_win)
    for win, vocab in by_win.items():
        regs, r_max, s_sum, est = _py_hll(vocab)
        r = got[win]
        assert list(r.regs) == regs
        assert (r.r_max, r.s_sum, r.est_distinct) == (r_max, s_sum, est)
        assert r.n_exact == len(vocab)
        assert r.err_bp == (10000 * abs(est - len(vocab))) // len(vocab)


def test_stream_windowed_hll_drained_equals_batch(spark, tmp_path):
    """Append-mode drain (one-batch backlog + zero-token sentinel) must
    finalize exactly the batch registers — the mergeable state a 100 TB
    stream ships downstream."""
    import datetime

    from vaero_spark.operators.sketch import (
        stream_windowed_hll,
        windowed_hll_registers,
    )
    from vaero_spark.sinks.writers import MemorySink

    t0 = datetime.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        (d, txt, t0 + datetime.timedelta(minutes=40 * i))
        for i, (d, txt) in enumerate(DOCS)
    ]
    schema = "doc_id int, text string, ts timestamp"
    df = spark.createDataFrame(rows, schema)
    inp = str(tmp_path / "in")
    df.write.parquet(inp)

    src = spark.readStream.schema(df.schema).parquet(inp)
    sink = MemorySink()
    q = (
        stream_windowed_hll(src)
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    q.processAllAvailable()
    max_ts = max(r[2] for r in rows)
    spark.createDataFrame(
        [(99, "", max_ts + datetime.timedelta(hours=3))], schema
    ).write.mode("append").parquet(inp)
    q.processAllAvailable()
    q.stop()

    drained = sorted(
        (r.win_start, r.register, r.max_rank)
        for _, batch in sink.batches
        for r in batch
    )
    batch = sorted(
        (r.win_start, r.register, r.max_rank)
        for r in windowed_hll_registers(df).collect()
    )
    assert drained == batch and len(drained) > 0
