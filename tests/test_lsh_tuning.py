"""Corpus-scale-aware LSH band sizing (functions/lsh_tuning.py):
bits must grow with log2(N) so per-bucket pair work stays bounded,
while small corpora reproduce the pinned defaults exactly."""

from __future__ import annotations

import pytest

from vaero_spark.functions.lsh_tuning import auto_band_bits


def test_band_bits_scale_with_corpus():
    # simhash family: 64-bit signature, 16-bit recall floor
    assert auto_band_bits(10**6, min_bits=16) == (4, 16)
    assert auto_band_bits(10**9, min_bits=16) == (2, 32)
    assert auto_band_bits(10**12, min_bits=16) == (2, 32)  # budget-capped
    # ANN family: 8-bit floor (recall over diffuse corpora)
    assert auto_band_bits(10**3, min_bits=8) == (8, 8)
    assert auto_band_bits(10**6, min_bits=8) == (4, 16)
    assert auto_band_bits(10**9, min_bits=8) == (2, 32)


def test_small_corpus_reproduces_pinned_defaults():
    """The gate fixtures (~550 docs / ~1000 vectors) must get exactly
    the constants the gate queries were pinned with."""
    from vaero_spark.functions.text import SIMHASH_BAND_BITS, SIMHASH_BANDS
    from vaero_spark.operators.similarity import (
        ANN_SIGN_BAND_BITS,
        ANN_SIGN_BANDS,
        SIGN_BAND_BITS,
        SIGN_BANDS,
    )

    assert auto_band_bits(550, min_bits=SIMHASH_BAND_BITS) == (
        SIMHASH_BANDS, SIMHASH_BAND_BITS
    )
    assert auto_band_bits(1000, min_bits=ANN_SIGN_BAND_BITS) == (
        ANN_SIGN_BANDS, ANN_SIGN_BAND_BITS
    )
    assert auto_band_bits(1000, min_bits=SIGN_BAND_BITS) == (
        SIGN_BANDS, SIGN_BAND_BITS
    )


def test_invariants():
    # bands × bits always partition the signature, with ≥ 2 bands
    for n in (1, 10, 10**4, 10**7, 10**10, 10**13):
        bands, bits = auto_band_bits(n, min_bits=8)
        assert bands * bits == 64
        assert bands >= 2
    # occupancy bound holds whenever the budget allows it
    bands, bits = auto_band_bits(10**7, min_bits=8)
    assert 10**7 / 2**bits <= 1024
    with pytest.raises(ValueError):
        auto_band_bits(0)


def test_occupancy_target_is_the_knob():
    # a tighter occupancy target widens the bands at the same N
    assert auto_band_bits(10**6, min_bits=8, target_occupancy=16)[1] == 16
    assert auto_band_bits(10**6, min_bits=8, target_occupancy=1)[1] == 32


def test_wide_band_key_build_no_overflow(spark):
    """ADVICE r4 (medium): ``auto_band_bits`` picks 2×32-bit bands above
    ~7e7 docs, where key = band_idx·2^32 + pattern overflows int32 —
    under Spark 4's default ANSI mode the old INT cast threw
    CAST_OVERFLOW at exactly the scales the auto-sizing exists for (and
    with ANSI off it would silently merge band keyspaces). Keys are
    BIGINT now; build them FOR REAL at (2, 32) in both engines against
    a pure-Python reference."""
    import duckdb
    from pyspark.sql import functions as F

    from vaero_spark.operators.similarity import (
        sign_band_keys_from_quant,
        sign_band_keys_sql,
    )

    vecs = {
        1: [1] * 64,                                   # max pattern per band
        2: [(1 if i % 2 == 0 else -1) for i in range(64)],
        3: [-1] * 32 + [1] * 32,                       # only band 1 all-set
    }

    def ref_keys(qv, bands=2, bits=32):
        out = []
        for b in range(bands):
            k = b * (1 << bits)
            for p in range(bits):
                if qv[b * bits + p] > 0:
                    k += 1 << p
            out.append(k)
        return out

    expected = sorted((vid, k) for vid, qv in vecs.items() for k in ref_keys(qv))
    assert max(k for _, k in expected) > 2**31 - 1  # really in the overflow regime

    df = spark.createDataFrame(
        list(vecs.items()), "vec_id long, qv array<bigint>"
    )
    got_spark = sorted(
        (r.vec_id, r.bk)
        for r in df.select(
            "vec_id", F.explode(sign_band_keys_from_quant("qv", 2, 32)).alias("bk")
        ).collect()
    )
    assert got_spark == expected

    values = ", ".join(f"({vid}, {qv}::BIGINT[])" for vid, qv in vecs.items())
    rows = duckdb.connect().execute(
        f"SELECT vec_id, unnest({sign_band_keys_sql('qv', 2, 32)}) AS bk "
        f"FROM (VALUES {values}) t(vec_id, qv)"
    ).fetchall()
    assert sorted(rows) == expected


def test_bucketed_ann_executes_at_auto_wide_bands(spark):
    """End-to-end: the n_estimate path that auto-sizes to (2, 32) must
    execute (it crashed on the int32 key build) and still retrieve an
    exact duplicate, which collides in every band by construction."""
    from vaero_spark.operators.similarity import cosine_topk_bucketed

    base = [
        (i, [float(((i >> j) & 1) * 2 - 1) for j in range(64)]) for i in range(8)
    ]
    dup = (100, base[1][1])  # exact duplicate of vec 1
    emb = spark.createDataFrame(
        base + [dup], "vec_id long, embedding array<double>"
    )
    out = cosine_topk_bucketed(
        emb, emb.filter("vec_id = 100"), k=2, n_estimate=10**8
    ).collect()
    assert 1 in {r.neighbor_id for r in out}


def test_ivf_and_hyperplane_params_scale():
    from vaero_spark.operators.similarity import (
        hyperplane_params_for,
        ivf_params_for,
    )

    # sqrt-N centroid rule with bounded probes (probe floor 12 = the
    # recall-oriented call default — VERDICT r5 #7: >= 0.8 recall@5 on
    # the diffuse bench corpus, where recall ~ the probed fraction)
    assert ivf_params_for(256) == (16, 12)         # fixture floor = defaults
    assert ivf_params_for(10**6) == (1000, 64)
    cents, probe = ivf_params_for(10**9)
    assert cents == 31623 and probe == 64          # candidates ~ 64*sqrt(N)
    assert ivf_params_for(10**12)[0] == 65536      # nlist budget cap
    # hyperplane planes sized like band bits; tables = recall multiplicity
    assert hyperplane_params_for(1000) == (4, 12)  # small-N floor
    assert hyperplane_params_for(10**6) == (10, 12)
    assert hyperplane_params_for(10**9) == (20, 12)
    assert hyperplane_params_for(10**12) == (24, 12)  # plane cap
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ivf_params_for(0)
