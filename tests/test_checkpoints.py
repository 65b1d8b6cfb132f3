"""Per-round localCheckpoint blocks are RELEASED (VERDICT r6 #4).

The iterative ops (min-label components, k-means, TextRank) checkpoint
every round; before r7 every round's RDD blocks stayed pinned for the
session lifetime (12 measured after one emb_kmeans). The tracker in
``operators/checkpoints.py`` must (a) release superseded rounds as soon
as the next round materializes, (b) keep the FINAL round alive until
the next iterative-op invocation (the returned DataFrame reads it), and
(c) never touch managed DataFrame caches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vaero_spark.operators import dedup as DD
from vaero_spark.operators.checkpoints import _checkpoint_rdds


def _n_ckpt(spark) -> int:
    return len(_checkpoint_rdds(spark.sparkContext))


CHAIN = "alpha beta gamma delta epsilon zeta eta theta"
DOCS = [
    (1, CHAIN),
    (2, CHAIN + " one"),
    (3, CHAIN + " one two"),
    (9, "completely different words everywhere here today"),
]


def test_min_label_rounds_released(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r.doc_id: r.cluster_id for r in DD.neardup_clusters(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1}  # unchanged result
    # the 3-doc chain needs >= 2 propagation rounds + convergence round;
    # only the FINAL round's checkpoint may remain pinned
    after_first = _n_ckpt(spark)
    assert after_first <= 1, f"superseded rounds leaked: {after_first} pinned"
    # a second invocation releases the previous final round too —
    # steady-state is ~one lingering set, not one per invocation
    got2 = {r.doc_id: r.cluster_id for r in DD.neardup_clusters(df).collect()}
    assert got2 == got
    assert _n_ckpt(spark) <= 1


def test_kmeans_rounds_released(spark):
    from vaero_spark.operators.cluster import embed_kmeans

    vecs = [(i, [float((i * 7 + d) % 5) for d in range(8)]) for i in range(40)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    labels = embed_kmeans(df, k=4).collect()
    assert len(labels) == 40
    assert _n_ckpt(spark) <= 1


def test_textrank_rounds_released(spark):
    from vaero_spark.operators.graph import textrank

    df = spark.createDataFrame(
        [(1, "spark rank graph rank spark"), (2, "graph spark rank")],
        ["doc_id", "text"],
    )
    rows = textrank(df).collect()
    assert rows  # result intact
    # static edge checkpoint freed at finish(); only the final ranks stay
    assert _n_ckpt(spark) <= 1


def test_tracker_leaves_dataframe_caches_alone(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("g"))
    df.persist()
    try:
        assert df.count() == 100
        d2 = spark.createDataFrame(DOCS, ["doc_id", "text"])
        DD.neardup_clusters(d2).collect()  # runs a full tracker lifecycle
        assert df.storageLevel.useMemory  # cache untouched
        assert df.count() == 100
    finally:
        df.unpersist()
