"""Windowed token co-occurrence with integer LIFT ranking — the
phrase-detection / PMI-prep pass of an LLM training-data pipeline
(word2vec-style phrase merging, collocation mining, vocab curation all
start from exactly this table: how much more often do two tokens appear
within a small window than their marginals predict).

Reference parity note: the reference engine has no co-occurrence
operator; this is part of the §2.7 training-data extension surface
(SURVEY.md). The statistic is Church–Hanks PMI re-expressed as an
integer: PMI ranks by ``P(x,y) / (P(x)·P(y))`` and the corpus-constant
pair total cancels within a single ranking, so we report

    ``lift_bp = (10000 · pair_n · n_tokens) div (n_x · n_y)``

— pure BIGINT multiply + integer division, identical in Spark (`div`)
and DuckDB (`//`), no ``ln`` anywhere (the repo parity rule: IEEE does
not require transcendentals correctly rounded, so engines may differ in
the last ulp; integer lift is rank-equivalent to PMI and hash-exact).
Magnitude bound: ``10000 · pair_n · n_tokens < 2^63`` holds through
~10^7-token gate corpora; at real 100 TB scale flip the two casts below
to DECIMAL(38,0) / HUGEINT (both engines carry 128-bit integers — kept
BIGINT here because Spark's ``div`` silently degrades DECIMAL operands
to bigint, measured on 4.1.2, so the decimal path must use
``floor(a / b)`` with a guard that the quotient is not near-integral).
The bound is GUARDED at runtime (ADVICE r5): the numerator is built
with ``try_multiply`` and a NULL (= BIGINT overflow) raises a clear
"switch to the DECIMAL path" error instead of ANSI's opaque
ARITHMETIC_OVERFLOW — zero extra cost on the in-bound path (the try
product IS the numerator; no second evaluation).

100 TB shape: ONE shuffle on doc_id for the per-document position
window (per-conversation/document sort only — never global), ONE
map-side-combined groupBy on the pair, marginals are a groupBy on the
token joined back by key (vocab ≪ pair table; AQE broadcasts when it
fits), and the corpus total rides a 1-row cross join (no driver-side
collect — explain_audit's eager-action trap stays happy). Top-k is
``orderBy().limit(k)`` → TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vaero_spark.functions.text import tokens, tokens_sql

COOCCUR_WINDOW = 2  # neighbors within this many positions co-occur
COOCCUR_MIN_COUNT = 5  # pairs rarer than this are noise, dropped
COOCCUR_TOPK = 100

# Guarded integer lift over (pair_n, n_x, n_y, n_total): try_multiply
# => NULL on BIGINT overflow => actionable error (module docstring: the
# DECIMAL(38,0) migration note) — zero extra cost in-bound because the
# try product IS the numerator.
LIFT_BP_EXPR = (
    "CASE WHEN try_multiply(try_multiply(10000L, pair_n), n_total) IS NULL"
    "     THEN CAST(raise_error('cooccur_lift: 10000*pair_n*n_total"
    " overflows BIGINT at this corpus size; switch lift_bp to the"
    " DECIMAL(38,0)/floor(a/b) path (see cooccur.py docstring)')"
    "          AS BIGINT)"
    "     ELSE try_multiply(try_multiply(10000L, pair_n), n_total)"
    "          div (n_x * n_y) END"
)


def cooccur_lift(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = COOCCUR_WINDOW,
    min_count: int = COOCCUR_MIN_COUNT,
    k: int = COOCCUR_TOPK,
) -> DataFrame:
    """Top-``k`` unordered token pairs by integer lift (module
    docstring). Returns (x, y, pair_n, lift_bp) ordered by
    (lift_bp desc, pair_n desc, x, y) — fully deterministic tiebreak.

    Pairs are UNORDERED (``least``/``greatest`` canonicalization —
    co-occurrence is symmetric) and counted once per (position,
    offset≤window) slot, the standard skip-gram extraction.
    """
    tok_df = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy("_doc").orderBy("pos")
    nbr_cols = [F.lead("tok", d).over(w).alias(f"_l{d}") for d in range(1, window + 1)]
    nbrs = tok_df.select("tok", *nbr_cols)
    pair = (
        nbrs.select(
            "tok",
            F.explode(F.array(*[f"_l{d}" for d in range(1, window + 1)])).alias("nbr"),
        )
        .filter(F.col("nbr").isNotNull())
        .select(
            F.least("tok", "nbr").alias("x"), F.greatest("tok", "nbr").alias("y")
        )
    )
    pair_cnt = pair.groupBy("x", "y").agg(F.count(F.lit(1)).alias("pair_n"))
    marg = tok_df.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    total = tok_df.agg(F.count(F.lit(1)).alias("n_total"))
    scored = (
        pair_cnt.filter(F.col("pair_n") >= min_count)
        .join(marg.withColumnRenamed("tok", "x").withColumnRenamed("n_tok", "n_x"), "x")
        .join(marg.withColumnRenamed("tok", "y").withColumnRenamed("n_tok", "n_y"), "y")
        .crossJoin(total)
        .select(
            "x",
            "y",
            "pair_n",
            F.expr(LIFT_BP_EXPR).alias("lift_bp"),
        )
    )
    return scored.orderBy(
        F.desc("lift_bp"), F.desc("pair_n"), "x", "y"
    ).limit(k)


def cooccur_lift_sql(
    table: str = "documents",
    text_col: str = "text",
    window: int = COOCCUR_WINDOW,
    min_count: int = COOCCUR_MIN_COUNT,
    k: int = COOCCUR_TOPK,
) -> str:
    """DuckDB twin of :func:`cooccur_lift` — a full standalone SELECT
    (no outer WITH needed). Mirrors the integer lift token-for-token:
    ``//`` is DuckDB's integer division, Spark's ``div``."""
    leads = ", ".join(
        f"lead(tok, {d}) OVER (PARTITION BY doc_id ORDER BY pos) AS _l{d}"
        for d in range(1, window + 1)
    )
    lead_list = ", ".join(f"_l{d}" for d in range(1, window + 1))
    return f"""
    SELECT x, y, pair_n,
           (10000 * pair_n * n_total) // (n_x * n_y) AS lift_bp
    FROM (
      WITH toks AS (
        -- parallel unnests zip in DuckDB (1.0 has no WITH ORDINALITY)
        SELECT doc_id, unnest(tk) AS tok,
               unnest(generate_series(1, len(tk))) AS pos
        FROM (SELECT doc_id, {tokens_sql(text_col)} AS tk FROM {table})
      ),
      nbrs AS (SELECT doc_id, tok, {leads} FROM toks),
      pairs AS (
        SELECT least(tok, nbr) AS x, greatest(tok, nbr) AS y
        FROM (SELECT tok, unnest([{lead_list}]) AS nbr FROM nbrs)
        WHERE nbr IS NOT NULL
      ),
      pc AS (SELECT x, y, COUNT(*) AS pair_n FROM pairs GROUP BY 1, 2),
      marg AS (SELECT tok, COUNT(*) AS n_tok FROM toks GROUP BY 1),
      tot AS (SELECT COUNT(*) AS n_total FROM toks)
      SELECT pc.x, pc.y, pc.pair_n,
             mx.n_tok AS n_x, my.n_tok AS n_y, tot.n_total
      FROM pc
      JOIN marg mx ON mx.tok = pc.x
      JOIN marg my ON my.tok = pc.y
      CROSS JOIN tot
      WHERE pc.pair_n >= {min_count}
    )
    ORDER BY lift_bp DESC, pair_n DESC, x, y
    LIMIT {k}"""
