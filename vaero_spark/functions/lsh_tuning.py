"""Corpus-scale-aware sizing for the sign-LSH / SimHash band knobs.

The banded-LSH families here (64-bit SimHash dedup, 64-sign-bit ANN
bucketing) all shuffle on a band key and then do quadratic work WITHIN
each bucket. With ``bits`` bits per band a band has ``2^bits`` buckets,
so expected occupancy is ``N / 2^bits`` and per-bucket pair work is its
square — the quantity that must stay bounded as the corpus grows
(buckets parallelize perfectly across executors; a single hot bucket
does not). Fixing ``bits`` at a small-corpus value is therefore a
silent scale-killer: 16-bit bands are ideal at 10^6 docs but at 10^9
leave 15k docs per bucket (10^8 pairs per bucket per band).

:func:`auto_band_bits` derives ``bits`` from an estimated corpus
cardinality: the smallest band width whose expected occupancy is at or
under ``target_occupancy``, clamped to the family's recall floor
(``min_bits``) and to the signature budget (``total_bits`` with at
least 2 bands — one band of all 64 bits hashes exact-duplicates only).
Fewer, longer bands trade recall for bounded work: banding detects any
pair whose signatures differ in at most ``bands − 1`` bands
(pigeonhole), so the caller sees the chosen (bands, bits) logged and
recorded.

The estimate only needs order-of-magnitude accuracy (bits moves with
log2 N); callers pass a known figure (ingest row counts, table stats) —
the ops never run a counting job to get it (an extra full scan per
query at 100 TB).
"""

from __future__ import annotations

import logging
import math

log = logging.getLogger(__name__)

# Per-bucket expected occupancy ceiling. 1024 docs/bucket ⇒ ≤ ~0.5M
# scored pairs per bucket per band — comfortable single-task work; the
# number of buckets, not their size, absorbs corpus growth.
DEFAULT_TARGET_OCCUPANCY = 1024


def auto_band_bits(
    n_estimate: int,
    *,
    total_bits: int = 64,
    min_bits: int = 8,
    target_occupancy: int = DEFAULT_TARGET_OCCUPANCY,
) -> tuple[int, int]:
    """(bands, bits) for an estimated corpus of ``n_estimate`` items.

    ``bits`` = smallest divisor of ``total_bits`` with expected bucket
    occupancy ``n_estimate / 2^bits ≤ target_occupancy``, clamped to
    ``[min_bits, total_bits // 2]`` (≥ 2 bands always). Divisors keep
    the bands an exact partition of the signature.
    """
    if n_estimate < 1:
        raise ValueError(f"n_estimate must be >= 1, got {n_estimate}")
    want = max(min_bits, math.ceil(math.log2(max(n_estimate / target_occupancy, 1.0))))
    divisors = [d for d in range(1, total_bits + 1) if total_bits % d == 0]
    max_bits = total_bits // 2  # at least 2 bands
    candidates = [d for d in divisors if d >= want and d <= max_bits]
    bits = min(candidates) if candidates else max_bits
    bands = total_bits // bits
    log.info(
        "auto_band_bits: n≈%.1e → %d bands × %d bits "
        "(expected occupancy %.1f docs/bucket, hamming tolerance %d bands)",
        n_estimate, bands, bits, n_estimate / 2 ** bits, bands - 1,
    )
    return bands, bits
