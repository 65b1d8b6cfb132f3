"""Bloom-filter semijoin pruning tests: no false negatives ever, false
positives appear under a deliberately tiny bitset and match a
brute-force Python replay of the same seeded hash arithmetic."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from vaero_spark.operators.prune import (
    BLOOM_A,
    BLOOM_B,
    BLOOM_K,
    bloom_semijoin_stats,
)
from vaero_spark.functions.text import MINHASH_P


def _positions_py(key: str, m_bits: int) -> list[int]:
    h31 = int(hashlib.md5(key.encode()).hexdigest()[:10], 16) % MINHASH_P
    return [
        ((h31 * BLOOM_A[i] + BLOOM_B[i]) % MINHASH_P) % m_bits
        for i in range(BLOOM_K)
    ]


@pytest.mark.parametrize("m_bits", [256, 1 << 16])
def test_bloom_semijoin_matches_bruteforce(spark, m_bits):
    keys = [f"key-{i}" for i in range(60)]
    fact = [f"key-{i}" for i in range(40)] + [f"other-{i}" for i in range(400)]
    kdf = spark.createDataFrame([(k,) for k in keys], "k string")
    fdf = spark.createDataFrame([(k,) for k in fact], "k string")
    row = bloom_semijoin_stats(fdf, kdf, "k", m_bits=m_bits).collect()[0]

    inserted = {p for k in keys for p in _positions_py(k, m_bits)}
    want_pass = sum(
        1 for k in fact if all(p in inserted for p in _positions_py(k, m_bits))
    )
    want_match = sum(1 for k in fact if k in set(keys))
    assert row.n_keys == 60
    assert row.n_fact == 440
    assert row.n_pass == want_pass
    assert row.n_match == want_match == 40
    assert row.n_pass >= row.n_match  # no false negatives, ever
    assert row.fp_bp == (
        10000 * (want_pass - want_match) // want_pass if want_pass else 0
    )
    if m_bits == 256:
        # 60 keys x 3 hashes into 256 bits saturates ~half the bitset:
        # the false-positive path is genuinely exercised
        assert row.n_pass > row.n_match


def test_bloom_semijoin_null_keys_ignored(spark):
    kdf = spark.createDataFrame([("a",), (None,), ("a",)], "k string")
    fdf = spark.createDataFrame([("a",), ("b",)], "k string")
    row = bloom_semijoin_stats(fdf, kdf, "k").collect()[0]
    assert row.n_keys == 1
    assert row.n_match == 1
