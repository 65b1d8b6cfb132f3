"""Exact small-case pins for trending_tokens (windowed heavy hitters)
and key_skew_profile (the pre-join hot-key audit)."""

from __future__ import annotations

import datetime

from vaero_spark.operators.analytics import key_skew_profile, trending_tokens

SCHEMA = "conv_id string, turn_idx int, role string, text string, ts timestamp"


def _ts(hour, minute=0):
    return datetime.datetime(2024, 3, 1, hour, minute)


def test_trending_tokens_per_hour_with_tiebreak(spark):
    rows = [
        ("c1", 0, "user", "alpha beta alpha", _ts(9, 5)),
        ("c1", 1, "assistant", "beta gamma", _ts(9, 40)),
        ("c2", 0, "user", "delta", _ts(9, 59)),
        ("c2", 1, "assistant", "epsilon epsilon epsilon", _ts(10, 1)),
        ("c2", 2, "user", "zeta", _ts(10, 2)),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r.win_start.hour, r.rank): (r.token, r.n)
        for r in trending_tokens(df, k=3).collect()
    }
    # hour 9: alpha=2, beta=2 (tie -> token ASC), gamma=1/delta=1 (tie)
    assert out[(9, 1)] == ("alpha", 2)
    assert out[(9, 2)] == ("beta", 2)
    assert out[(9, 3)] == ("delta", 1)
    # hour 10: epsilon=3 then zeta=1; only 2 distinct tokens exist
    assert out[(10, 1)] == ("epsilon", 3)
    assert out[(10, 2)] == ("zeta", 1)
    assert (10, 3) not in out


def test_key_skew_profile_shares_and_totals(spark):
    rows = (
        [("hot", i, "user", "x", _ts(9)) for i in range(6)]
        + [("warm", i, "user", "x", _ts(9)) for i in range(3)]
        + [("a_cold", 0, "user", "x", _ts(9)), ("b_cold", 0, "user", "x", _ts(9))]
    )
    df = spark.createDataFrame(rows, SCHEMA)
    got = [
        (r.rank, r.key, r.n, r.share_bp, r.n_keys, r.n_total)
        for r in key_skew_profile(df, "conv_id", k=3)
        .orderBy("rank")
        .collect()
    ]
    # 11 rows over 4 keys; ties at n=1 break key ASC
    assert got == [
        (1, "hot", 6, 10000 * 6 // 11, 4, 11),
        (2, "warm", 3, 10000 * 3 // 11, 4, 11),
        (3, "a_cold", 1, 10000 * 1 // 11, 4, 11),
    ]


def test_conv_turn_stats_runs_and_alternation(spark):
    from vaero_spark.operators.analytics import conv_turn_stats

    rows = [
        # c1: user,user,assistant,tool,tool,tool -> runs [2,1,3], 2 changes
        ("c1", 0, "user", "x", _ts(9)),
        ("c1", 1, "user", "x", _ts(9)),
        ("c1", 2, "assistant", "x", _ts(9)),
        ("c1", 3, "tool", "x", _ts(9)),
        ("c1", 4, "tool", "x", _ts(9)),
        ("c1", 5, "tool", "x", _ts(9)),
        # c2: single turn -> one run, alternation 0 (denominator floor 1)
        ("c2", 0, "assistant", "x", _ts(9)),
        # c3: perfect alternation user/assistant/user -> 10000 bp
        ("c3", 0, "user", "x", _ts(9)),
        ("c3", 1, "assistant", "x", _ts(9)),
        ("c3", 2, "user", "x", _ts(9)),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        r.conv_id: (
            r.n_turns, r.n_user, r.n_assistant, r.n_tool,
            r.n_runs, r.max_run, r.alternation_bp,
        )
        for r in conv_turn_stats(df).collect()
    }
    assert out["c1"] == (6, 2, 1, 3, 3, 3, 10000 * 2 // 5)
    assert out["c2"] == (1, 0, 1, 0, 1, 1, 0)
    assert out["c3"] == (3, 2, 1, 0, 3, 1, 10000)


def test_cluster_stats_histogram(spark):
    from vaero_spark.operators.dedup import cluster_stats

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest before nightfall arrives"
    )
    other = (
        "completely different content about spark shuffles partitions "
        "and watermark semantics in structured streaming engines today"
    )
    docs = spark.createDataFrame(
        [
            (1, base),                 # cluster of 3: 1,2,3
            (2, base + " indeed"),
            (3, base + " truly"),
            (4, other),                # cluster of 2: 4,5
            (5, other + " also"),
            (6, "a lone unrelated document with plenty of novel tokens in it"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.cluster_size: (r.n_clusters, r.n_docs)
        for r in cluster_stats(docs).collect()
    }
    assert got == {3: (1, 3), 2: (1, 2)}  # singletons never enter the graph


def test_ann_recall_at_k_arithmetic(spark):
    from vaero_spark.operators.similarity import ann_recall_at_k

    exact = spark.createDataFrame(
        [("q1", 1), ("q1", 2), ("q1", 3), ("q1", 4), ("q1", 5),
         ("q2", 7), ("q2", 8), ("q2", 9), ("q2", 10), ("q2", 11)],
        "query_id string, neighbor_id long",
    )
    approx = spark.createDataFrame(
        # q1: 3/5 overlap (6, 99 are misses); q2: nothing returned
        [("q1", 1), ("q1", 3), ("q1", 5), ("q1", 6), ("q1", 99)],
        "query_id string, neighbor_id long",
    )
    got = {
        r.query_id: (r.n_hits, r.recall_bp)
        for r in ann_recall_at_k(exact, approx, k=5).collect()
    }
    assert got == {"q1": (3, 6000), "q2": (0, 0)}
