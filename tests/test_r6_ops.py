"""Exact small-case pins for the round-6 additions: tokenizer
fertility, winnowing-fingerprint retrieval, conversation-level quality
gating, and the chained-stateful streaming windowed distinct. Semantics
pinned here; cross-engine parity is the oracle gate's job."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from vaero_spark.functions.text import tokenizer_fertility
from vaero_spark.operators.curate import conversation_quality
from vaero_spark.operators.search import fingerprint_search


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------

def test_tokenizer_fertility_exact(spark):
    """"the and of to a in is it": 8 ws tokens, 8 bpe tokens (no
    punctuation) => fertility 10000; adding punctuation raises the bpe
    count, never the ws count."""
    df = spark.createDataFrame(
        [("the and of to a in is it",), ("the and, of to! a in is it",)],
        "text string",
    )
    rows = tokenizer_fertility(df).collect()
    assert len(rows) == 1  # one language bucket
    r = rows[0]
    assert r.n_docs == 2
    assert r.ws_tokens == 16
    assert r.bpe_tokens == 18  # the two punctuation marks tokenize
    assert r.fertility_bp == (10000 * 18) // 16


def test_tokenizer_fertility_zero_token_docs_guarded(spark):
    df = spark.createDataFrame([("",), ("   ",)], "text string")
    r = tokenizer_fertility(df).collect()[0]
    assert (r.ws_tokens, r.fertility_bp) == (0, 0)  # greatest(,1) guard


# ---------------------------------------------------------------------------
# fingerprint_search
# ---------------------------------------------------------------------------

def _fp_corpus(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base + " lambda mu nu xi"),
        (2, "totally different words live in this document here now ok"),
        (101, base + " lambda mu nu xi PLUS"),  # near-copy of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_fingerprint_search_retrieves_source(spark):
    corpus = _fp_corpus(spark)
    suspects = corpus.filter(F.col("doc_id") == 101)
    hits = fingerprint_search(corpus, suspects, min_shared=2).collect()
    assert [(h.query_id, h.doc_id) for h in hits] == [(101, 1)]
    assert hits[0].n_shared >= 2
    # self-match excluded even though every fp matches itself
    assert all(h.doc_id != h.query_id for h in hits)


def test_fingerprint_search_df_cap_drops_boilerplate(spark):
    """A fingerprint present in MORE than max_fp_df docs is dropped from
    the index: with the cap at 1, the shared-by-both fp contributes
    nothing and the near-copy no longer clears min_shared."""
    corpus = _fp_corpus(spark)
    suspects = corpus.filter(F.col("doc_id") == 101)
    hits = fingerprint_search(corpus, suspects, min_shared=1, max_fp_df=1).collect()
    assert hits == []  # every shared fp has df=2 > 1


# ---------------------------------------------------------------------------
# conversation_quality
# ---------------------------------------------------------------------------

def test_conversation_quality_rollup_and_flag(spark):
    """Floor-mean/min over per-turn quality; keep needs BOTH the mean
    threshold and the turn floor."""
    good = "the cat and the dog are in the house and it is good here now"
    bad = "zzz qqq"
    rows = [
        ("c1", good), ("c1", good),          # high mean, 2 turns -> keep
        ("c2", good),                        # high mean, 1 turn -> drop
        ("c3", bad), ("c3", bad),            # low mean -> drop
    ]
    df = spark.createDataFrame(rows, ["conv_id", "text"])
    out = {r.conv_id: r for r in conversation_quality(df, threshold_bp=3000).collect()}
    assert out["c1"].keep == 1 and out["c1"].n_turns == 2
    assert out["c2"].keep == 0  # min_turns
    assert out["c3"].keep == 0  # quality
    from vaero_spark.functions.text import quality_columns

    q = [
        r.q
        for r in df.filter(F.col("conv_id") == "c1")
        .select(quality_columns("text")["quality_bp"].alias("q"))
        .collect()
    ]
    assert out["c1"].mean_quality_bp == sum(q) // len(q)
    assert out["c1"].min_quality_bp == min(q)
    assert out["c1"].total_chars == 2 * len(good)


# ---------------------------------------------------------------------------
# stream_windowed_distinct
# ---------------------------------------------------------------------------

def test_stream_windowed_distinct_sentinel_drain_equals_batch(spark, tmp_path):
    """One-batch backlog + sentinel: every real window emits exactly
    once with the exact distinct count; the sentinel's window is held
    back (append semantics)."""
    import os

    from vaero_spark.operators.windows import stream_windowed_distinct
    from vaero_spark.sinks.writers import MemorySink

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for h, users in enumerate([[1, 2, 3, 1], [5, 5], [7]]):
        for m, u in enumerate(users):
            rows.append((base + datetime.timedelta(hours=h, minutes=m), u))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    inp = str(tmp_path / "in")
    df.write.parquet(inp)
    src = spark.readStream.schema(df.schema).parquet(inp)
    sink = MemorySink()
    q = (
        stream_windowed_distinct(src)
        .writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    q.processAllAvailable()
    n_before = sum(len(b) for _, b in sink.batches)
    spark.createDataFrame(
        [(base + datetime.timedelta(hours=6), -1)], df.schema
    ).write.mode("append").parquet(inp)
    q.processAllAvailable()
    q.stop()
    got = sorted(
        ((r.win_start, r.n_users) for _, b in sink.batches for r in b),
    )
    # the backlog batch advances the watermark to max_ts - 1h, which
    # finalizes the EARLIER windows already; the windows near max_ts
    # need the sentinel — completeness requires it
    assert n_before < 3
    assert got == [
        (base, 3),
        (base + datetime.timedelta(hours=1), 1),
        (base + datetime.timedelta(hours=2), 1),
    ]  # sentinel window absent
