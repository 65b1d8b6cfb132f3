"""Exact small-case pins for the round-5 additions: windowed
co-occurrence lift, BPE tokenizer application, lexicon blocklist
flags, and the tool-transition matrix. Every expectation is hand
computed — these pin the SEMANTICS; the cross-engine oracle gate
(tools/check_oracle.py) pins the DuckDB parity."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from vaero_spark.functions.bpe import SEP, bpe_stats
from vaero_spark.operators.cooccur import cooccur_lift
from vaero_spark.operators.curate import lexicon_flags
from vaero_spark.operators.analytics import tool_transitions


# ---------------------------------------------------------------------------
# cooccur_lift
# ---------------------------------------------------------------------------

def test_cooccur_lift_exact_counts_and_lift(spark):
    """doc "a b a b a", window 2: pairs (a,b)x4 (a,a)x2 (b,b)x1;
    marginals a=3 b=2, total 5; lift = (10000*pair*5) div (nx*ny)."""
    df = spark.createDataFrame([(1, "a b a b a")], "doc_id long, text string")
    out = {(r.x, r.y): r for r in cooccur_lift(df, min_count=1).collect()}
    assert out[("a", "b")].pair_n == 4
    assert out[("a", "a")].pair_n == 2
    assert out[("b", "b")].pair_n == 1
    assert out[("a", "b")].lift_bp == (10000 * 4 * 5) // (3 * 2)  # 33333
    assert out[("a", "a")].lift_bp == (10000 * 2 * 5) // (3 * 3)  # 11111
    assert out[("b", "b")].lift_bp == (10000 * 1 * 5) // (2 * 2)  # 12500


def test_cooccur_lift_min_count_and_window_edges(spark):
    """min_count prunes rare pairs; window never crosses documents."""
    df = spark.createDataFrame(
        [(1, "x y"), (2, "y x"), (3, "z q")], "doc_id long, text string"
    )
    out = cooccur_lift(df, min_count=2).collect()
    assert [(r.x, r.y, r.pair_n) for r in out] == [("x", "y", 2)]
    # (q,z) appears once -> pruned; no cross-doc (y,z) pair exists
    out_all = {(r.x, r.y) for r in cooccur_lift(df, min_count=1).collect()}
    assert ("q", "z") in out_all and ("y", "z") not in out_all


def test_cooccur_lift_overflow_guard(spark):
    """ADVICE r5: the BIGINT lift numerator is try_multiply-guarded —
    in-bound rows compute the exact integer lift, an out-of-bound row
    raises the actionable DECIMAL-migration error instead of ANSI's
    opaque ARITHMETIC_OVERFLOW."""
    from vaero_spark.operators.cooccur import LIFT_BP_EXPR

    ok = spark.sql(
        "SELECT " + LIFT_BP_EXPR + " AS lift_bp FROM VALUES "
        "(4L, 3L, 2L, 5L) AS v(pair_n, n_x, n_y, n_total)"
    ).collect()
    assert ok[0].lift_bp == (10000 * 4 * 5) // (3 * 2)
    big = 4_000_000_000_000_000  # 1e4 * big * big >> 2^63
    bad = spark.sql(
        "SELECT " + LIFT_BP_EXPR + " AS lift_bp FROM VALUES "
        f"({big}L, 3L, 2L, {big}L) AS v(pair_n, n_x, n_y, n_total)"
    )
    with pytest.raises(Exception, match="DECIMAL"):
        bad.collect()


def test_cooccur_lift_topk_orders_by_lift(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "c c")], "doc_id long, text string"
    )
    rows = cooccur_lift(df, min_count=1, k=2).collect()
    lifts = [r.lift_bp for r in rows]
    assert len(rows) == 2 and lifts == sorted(lifts, reverse=True)


# ---------------------------------------------------------------------------
# bpe_stats
# ---------------------------------------------------------------------------

def _stats(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return bpe_stats(df, **kw).collect()[0]


def test_bpe_merges_chain_to_full_word(spark):
    """"The the." -> clean "the the" -> (t,h) then (th,e) leave one
    unit per word: 2 units over 6 letters, md5 of the exact encoding."""
    r = _stats(spark, "The the.")
    assert (r.bpe_units, r.bpe_chars) == (2, 6)
    assert r.comp_bp == (10000 * 2) // 6  # 3333
    enc = f"{SEP}the{SEP}{SEP} {SEP}{SEP}the{SEP}"
    assert r.enc_md5 == hashlib.md5(enc.encode()).hexdigest()


def test_bpe_greedy_left_to_right_within_rank(spark):
    """"ttt" under a single (t,t) merge: left-to-right non-overlapping
    -> units [tt, t], the BPE within-rank greedy rule."""
    r = _stats(spark, "ttt", merges=(("t", "t"),))
    assert r.bpe_units == 2
    enc = f"{SEP}tt{SEP}{SEP}t{SEP}"
    assert r.enc_md5 == hashlib.md5(enc.encode()).hexdigest()


def test_bpe_no_cross_word_or_cross_unit_merges(spark):
    """(t,h) must not fire across a space ("t h") nor inside a longer
    already-merged unit; digits/punct normalize to spaces first."""
    r = _stats(spark, "t h!42", merges=(("t", "h"),))
    # clean = "t h" -> units t, space, h -> no merge fires
    assert r.bpe_units == 2 and r.bpe_chars == 2
    enc = f"{SEP}t{SEP}{SEP} {SEP}{SEP}h{SEP}"
    assert r.enc_md5 == hashlib.md5(enc.encode()).hexdigest()


def test_bpe_empty_and_nonletter_docs(spark):
    r = _stats(spark, "123 !!")
    assert (r.bpe_units, r.bpe_chars, r.comp_bp) == (0, 0, 0)
    assert r.enc_md5 == hashlib.md5(b"").hexdigest()


# ---------------------------------------------------------------------------
# lexicon_flags
# ---------------------------------------------------------------------------

def test_lexicon_flags_counts_phrases_case_insensitive(spark):
    df = spark.createDataFrame(
        [
            (1, "Spark Window spark window dup"),  # 2 + 1 hits -> flagged
            (2, "hash join here"),                 # 1 hit
            (3, "nothing to see"),                 # 0 hits
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lexicon_flags(df).collect()}
    assert (out[1].lex_hits, out[1].flagged) == (3, 1)
    assert (out[2].lex_hits, out[2].flagged) == (1, 0)
    assert (out[3].lex_hits, out[3].flagged) == (0, 0)


def test_lexicon_flags_counts_repeats_within_doc(spark):
    df = spark.createDataFrame([(1, "dup dup dupdup")], "doc_id long, text string")
    r = lexicon_flags(df, lexicon=("dup",), max_hits=3).collect()[0]
    assert (r.lex_hits, r.flagged) == (4, 1)


# ---------------------------------------------------------------------------
# tool_transitions
# ---------------------------------------------------------------------------

def test_tool_transitions_counts_and_row_probs(spark):
    rows = [
        ("c1", 1, "tool", "search"),
        ("c1", 2, "user", ""),        # non-tool turns are invisible
        ("c1", 3, "tool", "calc"),
        ("c1", 4, "tool", "search"),
        ("c2", 1, "tool", "calc"),
        ("c2", 2, "tool", "calc"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )
    out = {(r.prev_tool, r.tool): r for r in tool_transitions(df).collect()}
    assert out[("search", "calc")].n_trans == 1
    assert out[("calc", "search")].n_trans == 1
    assert out[("calc", "calc")].n_trans == 1
    # row-normalized: prev=search total 1 -> 10000; prev=calc total 2 -> 5000
    assert out[("search", "calc")].p_bp == 10000
    assert out[("calc", "search")].p_bp == 5000
    assert out[("calc", "calc")].p_bp == 5000


def test_tool_transitions_never_crosses_conversations(spark):
    rows = [("c1", 1, "tool", "a"), ("c2", 1, "tool", "b")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )
    assert tool_transitions(df).count() == 0
