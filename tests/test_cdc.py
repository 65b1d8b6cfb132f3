"""Snapshot-maintenance CDC pair: apply_changeset's round-trip identity
(apply(old, diff(old, new)) == new) and stream_upsert's last-writer-wins
materialization under out-of-order, duplicate-bearing delivery.
Semantics pinned here; cross-engine parity is the oracle gate's job."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from vaero_spark.operators.dedup import apply_changeset, snapshot_diff
from vaero_spark.operators.state import stream_upsert
from vaero_spark.sinks.writers import MemorySink

DOCS = "doc_id long, text string"


def _manifest(df):
    return {
        (r.doc_id, r.text_md5)
        for r in df.select("doc_id", F.md5("text").alias("text_md5")).collect()
    }


def _snapshots(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo"), (3, "charlie"), (4, "delta")], DOCS
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo rev"), (5, "echo")], DOCS  # drop 3+4, change 2, add 5
    )
    return old, new


def _changes(old, new):
    return snapshot_diff(old, new).join(
        new.withColumnRenamed("text", "_t"), "doc_id", "left"
    ).select("doc_id", "status", F.col("_t").alias("text"))


def test_apply_changeset_roundtrip(spark):
    old, new = _snapshots(spark)
    applied = apply_changeset(old, _changes(old, new))
    assert {(r.doc_id, r.text_md5) for r in applied.collect()} == _manifest(new)


def test_apply_changeset_empty_changeset_is_identity(spark):
    old, _ = _snapshots(spark)
    empty = spark.createDataFrame([], "doc_id long, status string, text string")
    applied = apply_changeset(old, empty)
    assert {(r.doc_id, r.text_md5) for r in applied.collect()} == _manifest(old)


def test_apply_changeset_pure_delete_empties_snapshot(spark):
    old, _ = _snapshots(spark)
    gone = old.select("doc_id", F.lit("removed").alias("status"),
                      F.lit(None).cast("string").alias("text"))
    assert apply_changeset(old, gone).count() == 0


# ---------------------------------------------------------------------------
# stream_upsert
# ---------------------------------------------------------------------------

EV = "doc_id long, seq long, op string, text string"


def test_stream_upsert_out_of_order_duplicates_tombstones(spark, tmp_path):
    src_dir = str(tmp_path / "cdc_in")
    # batch 1 delivers the SUPERSEDING events FIRST (revision of 1, delete
    # of 2) — the stale initial upserts arrive a batch later and must not
    # downgrade the view; batch 3 replays duplicates + one stale event.
    batches = [
        [(1, 10, "upsert", "one rev"), (2, 11, "delete", None)],
        [(1, 3, "upsert", "one"), (2, 4, "upsert", "two"), (3, 5, "upsert", "three")],
        [(1, 10, "upsert", "one rev"), (2, 4, "upsert", "two")],  # replay + stale
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, EV).coalesce(1).write.mode("append").parquet(src_dir)
        if i < len(batches) - 1:
            time.sleep(1.1)  # distinct mtime second => deterministic batch order
    src = (
        spark.readStream.schema(EV).option("maxFilesPerTrigger", "1").parquet(src_dir)
    )
    sink = MemorySink()
    q = (
        stream_upsert(src)
        .writeStream.outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = {}
    for _, rows in sorted(sink.batches):
        for r in rows:
            final[r.doc_id] = (r.cur_seq, r.deleted, r.text_md5)
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert final == {
        1: (10, 0, md5("one rev")),  # revision survives the stale initial
        2: (11, 1, ""),              # tombstone wins over the late upsert
        3: (5, 0, md5("three")),
    }


# ---------------------------------------------------------------------------
# minhash_cross_pairs (cross-snapshot near-dup)
# ---------------------------------------------------------------------------


def test_minhash_cross_pairs_is_cross_only(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest before nightfall arrives"
    )
    other = (
        "completely different content about spark shuffles partitions "
        "and watermark semantics in structured streaming engines today"
    )
    ref = spark.createDataFrame(
        [(1, base), (2, base + " indeed"), (3, other)], DOCS  # 1~2: ref-internal pair
    )
    new = spark.createDataFrame(
        [
            (101, base + " vaero2"),      # near-dup of ref 1 and 2 -> caught
            (102, base + " vaero2 bis"),  # near-dup of 101 too (new-internal)
            (103, "fresh unrelated text about nothing seen before with many novel tokens here"),
        ],
        DOCS,
    )
    from vaero_spark.operators.dedup import minhash_cross_pairs

    pairs = {(r.id_a, r.id_b) for r in minhash_cross_pairs(ref, new).collect()}
    # every emitted pair is ref-side x new-side
    assert all(a in (1, 2, 3) and b in (101, 102, 103) for a, b in pairs)
    # the planted near-dups are caught; fresh content pairs with nothing
    assert (1, 101) in pairs and (1, 102) in pairs
    assert not any(b == 103 for _, b in pairs)
    # ref-internal (1,2) and new-internal (101,102) pairs are NOT emitted
    assert (1, 2) not in pairs and (101, 102) not in pairs
