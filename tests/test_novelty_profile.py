"""Exact small-case pins for shingle novelty, JSON profiling, and the
streaming lexicon monitor (batch-parity + duplicate idempotency)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from vaero_spark.operators.dedup import shingle_novelty
from vaero_spark.operators.analytics import json_profile
from vaero_spark.operators.curate import lexicon_flags, stream_lexicon
from vaero_spark.sinks.writers import MemorySink


# ---------------------------------------------------------------------------
# shingle_novelty
# ---------------------------------------------------------------------------

def test_shingle_novelty_first_occurrence_by_id_order(spark):
    """d1 all-novel (10000), d2 shares one of two shingles (5000),
    d3 an exact dup of d1 (0) — first occurrence is by doc_id order."""
    docs = [(1, "a b c d"), (2, "a b c x"), (3, "a b c d")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in shingle_novelty(df).collect()}
    assert (out[1].n_shingles, out[1].n_novel, out[1].novelty_bp) == (2, 2, 10000)
    assert (out[2].n_shingles, out[2].n_novel, out[2].novelty_bp) == (2, 1, 5000)
    assert (out[3].n_shingles, out[3].n_novel, out[3].novelty_bp) == (2, 0, 0)


def test_shingle_novelty_counts_distinct_within_doc(spark):
    """A shingle repeated INSIDE one doc counts once (distinct-within-
    doc), so the ratio is over unique content units."""
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id long, text string"
    )
    r = shingle_novelty(df).collect()[0]
    # 9 tokens -> 7 positional shingles but only 3 distinct
    assert (r.n_shingles, r.n_novel, r.novelty_bp) == (3, 3, 10000)


# ---------------------------------------------------------------------------
# json_profile
# ---------------------------------------------------------------------------

def test_json_profile_presence_types_and_ranges(spark):
    rows = [('{"a": 1, "b": "x"}',), ('{"a": -5}',), ('{"b": "y"}',)]
    df = spark.createDataFrame(rows, "props string")
    out = {r.path: r for r in json_profile(df).collect()}
    a, b = out["a"], out["b"]
    assert (a.n_present, a.n_int, a.val_min, a.val_max) == (2, 2, "-5", "1")
    assert (b.n_present, b.n_int, b.val_min, b.val_max) == (2, 0, "x", "y")
    assert (a.n_obj, b.n_obj) == (0, 0)


def test_json_profile_non_integer_values_not_counted_as_int(spark):
    rows = [('{"k": 1.5}',), ('{"k": "12x"}',), ('{"k": 7}',)]
    df = spark.createDataFrame(rows, "props string")
    r = json_profile(df).collect()[0]
    assert (r.n_present, r.n_int) == (3, 1)


def test_json_profile_nested_dotted_paths(spark):
    """VERDICT r5 #8: object-valued keys recurse into dotted paths
    (the reference's hand-written `actor.id` extraction targets)."""
    rows = [
        ('{"actor": {"id": 3, "geo": {"city": "sf"}}, "n": 1}',),
        ('{"actor": {"id": 9}, "n": 2}',),
    ]
    df = spark.createDataFrame(rows, "props string")
    out = {r.path: r for r in json_profile(df).collect()}
    assert set(out) == {"actor", "actor.id", "actor.geo", "actor.geo.city", "n"}
    assert (out["actor"].n_present, out["actor"].n_obj) == (2, 2)
    assert (out["actor.id"].n_present, out["actor.id"].n_int) == (2, 2)
    assert (out["actor.id"].val_min, out["actor.id"].val_max) == ("3", "9")
    assert (out["actor.geo.city"].n_present, out["actor.geo.city"].val_min) == (1, "sf")


def test_json_profile_minmax_scalar_only_and_depth_cap(spark):
    """ADVICE r5: object/array values are EXCLUDED from val_min/val_max
    (their serialized text is engine-specific); the recursion stops at
    max_depth."""
    rows = [
        ('{"k": {"a": 1}}',),   # object value
        ('{"k": [9, 9]}',),     # array value
        ('{"k": "mid"}',),      # the only scalar
    ]
    df = spark.createDataFrame(rows, "props string")
    out = {r.path: r for r in json_profile(df).collect()}
    k = out["k"]
    assert (k.n_present, k.n_obj) == (3, 1)
    assert (k.val_min, k.val_max) == ("mid", "mid")  # scalar only
    deep = spark.createDataFrame(
        [('{"a": {"b": {"c": {"d": {"e": 1}}}}}',)], "props string"
    )
    paths = {r.path for r in json_profile(deep, max_depth=3).collect()}
    assert paths == {"a", "a.b", "a.b.c"}  # depth 3 => no a.b.c.d


# ---------------------------------------------------------------------------
# stream_lexicon
# ---------------------------------------------------------------------------

def _ts(d, m=0):
    import datetime

    return datetime.datetime(2024, 1, d, 0, m)


def test_stream_lexicon_drain_equals_batch_and_dup_safe(spark):
    """Turns arrive across micro-batches with one turn DUPLICATED — the
    per-ord state overwrite must not double-count, and the drained
    final emission equals the batch per-conversation aggregate."""
    rows = [
        ("a", 1, "bad apple", _ts(1, 1)),
        ("a", 2, "bad bad", _ts(1, 2)),
        ("a", 2, "bad bad", _ts(1, 3)),  # duplicate delivery of turn 2
        ("b", 1, "clean text", _ts(1, 4)),  # zero hits: never emits
        ("c", 1, "bad", _ts(1, 5)),
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp"
    )
    work = tempfile.mkdtemp(prefix="vaero_t_slex_")
    # one file per row, written in list order -> deterministic batches
    for i in range(len(rows)):
        spark.createDataFrame(
            [rows[i]], "conv_id string, turn_idx int, text string, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(f"{work}/in")
    src = (
        spark.readStream.schema(tr.schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(f"{work}/in")
    )
    sink = MemorySink()
    q = (
        stream_lexicon(src, lexicon=("bad",), max_hits=2, watermark="60 days")
        .writeStream.outputMode("update")
        .option("checkpointLocation", f"{work}/ckpt")
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = {}
    for epoch_id, batch_rows in sorted(sink.batches):
        for r in batch_rows:
            final[r.conv_id] = (r.lex_hits, r.flagged)
    # batch truth: a -> 1 + 2 = 3 hits (dup NOT double-counted), flagged;
    # b -> zero hits, never emitted; c -> 1 hit, not flagged
    assert final == {"a": (3, 1), "c": (1, 0)}
    want = {
        r.doc_id: (r.lex_hits, r.flagged)
        for r in lexicon_flags(
            spark.createDataFrame(
                [(1, "bad apple bad bad"), (3, "bad")], "doc_id long, text string"
            ),
            lexicon=("bad",),
        ).collect()
    }
    assert want == {1: (3, 1), 3: (1, 0)}


# ---------------------------------------------------------------------------
# windowed_distinct_users / centroid_sums
# ---------------------------------------------------------------------------

def test_windowed_distinct_users_exact(spark):
    from vaero_spark.operators.windows import windowed_distinct_users

    rows = [
        (_ts(1, 10), 7), (_ts(1, 20), 7), (_ts(1, 30), 9),  # hour 1: 2 users
        (_ts(2, 5), 7),                                     # next day: 1 user
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    out = {r.win_start: (r.n_events, r.n_users)
           for r in windowed_distinct_users(df).collect()}
    assert out[_ts(1, 0)] == (3, 2)
    assert out[_ts(2, 0)] == (1, 1)


def test_centroid_sums_exact_quantized(spark):
    from vaero_spark.operators.cluster import centroid_sums

    rows = [(0, [0.5, 1.0]), (0, [0.25, -1.0]), (1, [2.0, 0.0])]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {(r.label, r.dim_idx): (r.sum_q, r.n_vecs)
           for r in centroid_sums(df).collect()}
    # quantization = floor(x * 1e6) per element, summed exactly
    assert out[(0, 0)] == (500_000 + 250_000, 2)
    assert out[(0, 1)] == (1_000_000 - 1_000_000, 2)
    assert out[(1, 0)] == (2_000_000, 1)
    assert out[(1, 1)] == (0, 1)
