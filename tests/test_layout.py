"""Z-order layout tests: the Morton key matches a Python bit-interleave
and the pruning report's invariants hold (layout never changes answers,
z-order never reads more files than the stripe layout for a 2-D box)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vaero_spark.operators.layout import layout_prune_report, zorder_key


def _morton(a: int, b: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_key_matches_python_interleave(spark):
    rows = [(a, b) for a in range(0, 256, 17) for b in range(0, 256, 23)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _morton(a, b), (a, b)


def test_layout_prune_report_invariants(spark):
    import random

    rng = random.Random(1)
    rows = [(rng.randrange(256), rng.randrange(256)) for _ in range(5000)]
    df = spark.createDataFrame(rows, "a long, b long")
    rep = {
        r.layout: r
        for r in layout_prune_report(df, "a", "b", (30, 70), (100, 180)).collect()
    }
    want_match = sum(1 for a, b in rows if 30 <= a < 70 and 100 <= b < 180)
    # layout changes cost, never answers
    assert rep["time"].rows_matching == rep["zorder"].rows_matching == want_match
    # envelopes never under-read: every matching row is in a hit file
    for r in rep.values():
        assert r.rows_in_hit_files >= r.rows_matching
        assert r.files_hit <= r.n_files
    # the point of z-order: the 2-D box touches fewer rows' worth of files
    assert rep["zorder"].rows_in_hit_files < rep["time"].rows_in_hit_files
