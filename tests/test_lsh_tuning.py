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


def test_ivf_and_hyperplane_params_scale():
    from vaero_spark.operators.similarity import (
        hyperplane_params_for,
        ivf_params_for,
    )

    # sqrt-N centroid rule with bounded probes
    assert ivf_params_for(256) == (16, 4)          # fixture floor = defaults
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
