"""Exact small-case pins for the round-6b additions: multi-resolution
rollup (incl. the runtime exchange-reuse property), binned interval
join, snapshot changeset, and the deterministic train/val/test split.
Semantics pinned here; cross-engine parity is the oracle gate's job."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from vaero_spark.operators.dedup import snapshot_diff
from vaero_spark.operators.joins import interval_join_binned
from vaero_spark.operators.transforms import stratified_split
from vaero_spark.operators.windows import multires_rollup
from vaero_spark.sources.transcripts import load_transcripts


def _ts(minute, second=0, hour=3, day=1):
    return datetime.datetime(2024, 1, day, hour, minute, second)


# ---------------------------------------------------------------------------
# multires_rollup
# ---------------------------------------------------------------------------

def _turns(spark):
    rows = [
        ("c1", 0, "user", "aaaa", _ts(0, 10)),
        ("c1", 1, "assistant", "bb", _ts(0, 50)),
        ("c1", 2, "user", "ccc", _ts(1, 0)),
        ("c2", 0, "user", "dddd", _ts(59, 59)),
        ("c2", 1, "tool", "e", _ts(0, 0, hour=4)),
        ("c3", 0, "system", "ff", _ts(30, 0, day=2)),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )


def test_rollup_ladder_exact(spark):
    out = {
        (r.resolution, r.bucket_ts): (r.n_turns, r.n_chars, r.n_user)
        for r in multires_rollup(_turns(spark)).collect()
    }
    # minute level: 03:00 has 2 turns (a+b), 03:01 one, 03:59 one, 04:00 one
    assert out[("minute", _ts(0))] == (2, 6, 1)
    assert out[("minute", _ts(1))] == (1, 3, 1)
    assert out[("minute", _ts(59))] == (1, 4, 1)
    # hour level re-aggregates the minutes exactly
    assert out[("hour", _ts(0))] == (4, 13, 3)
    assert out[("hour", _ts(0, hour=4))] == (1, 1, 0)
    # day level re-aggregates the hours exactly
    assert out[("day", datetime.datetime(2024, 1, 1))] == (5, 14, 3)
    assert out[("day", datetime.datetime(2024, 1, 2))] == (1, 2, 0)
    # every level conserves the totals
    for lvl in ("minute", "hour", "day"):
        lv = [v for (res, _), v in out.items() if res == lvl]
        assert (sum(v[0] for v in lv), sum(v[1] for v in lv)) == (6, 16)


def test_rollup_reuses_exchanges(spark, sf_dir):
    """The 100 TB property: ONE corpus scan feeds all three resolutions —
    after execution, AQE's final plan must wire the hour branch to the
    minutely exchange and the day branch to the hour exchange
    (ReusedExchange), never re-scan the parquet per level."""
    df = multires_rollup(load_transcripts(spark, sf_dir))
    df.collect()
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("ReusedExchange") >= 2, final[:3000]
    assert final.count("Scan parquet") == 1, final[:3000]


# ---------------------------------------------------------------------------
# interval_join_binned
# ---------------------------------------------------------------------------

def test_interval_join_exact_vs_bruteforce(spark):
    # bucket_s=60 so intervals span bucket boundaries; epoch-ms bounds
    points = spark.createDataFrame(
        [
            ("c1", 0, _ts(0, 0)),   # == start of iv1: INCLUDED
            ("c1", 1, _ts(1, 30)),  # inside iv1, crosses a bucket edge
            ("c1", 2, _ts(2, 0)),   # == end of iv1: EXCLUDED
            ("c2", 0, _ts(1, 59)),  # inside iv1 AND iv2 (overlap)
            ("c2", 1, _ts(10, 0)),  # matches nothing
        ],
        "conv_id string, turn_idx int, ts timestamp",
    )

    def ms(dt):
        return int(dt.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)

    ivs = [
        (1, ms(_ts(0, 0)), ms(_ts(2, 0))),
        (2, ms(_ts(1, 45)), ms(_ts(2, 15))),
        (3, ms(_ts(5, 0)), ms(_ts(5, 0))),  # empty: must produce nothing
    ]
    intervals = spark.createDataFrame(
        ivs, "interval_id int, start_ms long, end_ms long"
    )
    got = {
        (r.interval_id, r.conv_id, r.turn_idx)
        for r in interval_join_binned(points, intervals, bucket_s=60).collect()
    }
    pts = [(c, i, ms(t)) for c, i, t in points.collect()]
    want = {
        (iid, c, i)
        for iid, s, e in ivs
        for c, i, pms in pts
        if s <= pms < e
    }
    assert got == want
    assert (3, "c1", 0) not in got  # empty interval fabricated no buckets
    assert ("c2", 0) in {(c, i) for _, c, i in got}  # overlap matched twice
    assert len([1 for iid, c, i in got if (c, i) == ("c2", 0)]) == 2


def test_interval_join_bucket_exactness_at_edges(spark):
    """A point exactly ON a bucket boundary inside an interval must
    match (integer DIV bucket math, no float rounding)."""
    points = spark.createDataFrame(
        [("c", 0, _ts(1, 0))], "conv_id string, turn_idx int, ts timestamp"
    )
    base = int(_ts(0, 30).replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
    intervals = spark.createDataFrame(
        [(9, base, base + 60_000)], "interval_id int, start_ms long, end_ms long"
    )
    assert interval_join_binned(points, intervals, bucket_s=60).count() == 1


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------

def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.status) for r in snapshot_diff(old, new).collect()}
    # unchanged rows are EXCLUDED — the output is churn-sized
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}


# ---------------------------------------------------------------------------
# stratified_split
# ---------------------------------------------------------------------------

def test_split_deterministic_and_partition_independent(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in stratified_split(df).collect()}
    b = {
        r.doc_id: r.split
        for r in stratified_split(df.repartition(7)).collect()
    }
    assert a == b  # pure function of the row
    counts = {s: sum(1 for v in a.values() if v == s) for s in ("train", "val", "test")}
    assert sum(counts.values()) == 2000  # exhaustive + disjoint
    # expectations: 2000 * 204/256 = 1594, * 26/256 = 203; allow ±4 sigma
    assert abs(counts["train"] - 1594) < 80
    assert abs(counts["val"] - 203) < 60
    assert abs(counts["test"] - 203) < 60


def test_split_decorrelated_from_sample_hash(spark):
    """The salt makes the split independent of md5(doc_id) decisions
    (sampling/sharding): among docs a 50% unsalted-hash sample keeps,
    train/val/test proportions must hold, not collapse."""
    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    sampled = df.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 31, 2) < "80"
    )
    n = sampled.count()
    counts = dict(
        stratified_split(sampled).groupBy("split").count().collect()
    )
    assert abs(counts["train"] / n - 204 / 256) < 0.05
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0


# ---------------------------------------------------------------------------
# stream_interval (stream-static form of the binned range join)
# ---------------------------------------------------------------------------

def test_stream_interval_drained_equals_batch(spark, sf_dir):
    """Stateless stream-static equi-join on the bucket: the drained
    micro-batch replay must equal the batch join row-for-row."""
    import __spark_entry__ as E

    got = sorted(
        map(tuple, E.q_stream_interval(spark, sf_dir).collect())
    )
    want = sorted(map(tuple, E.q_j_interval(spark, sf_dir).collect()))
    assert got == want and len(want) > 0
