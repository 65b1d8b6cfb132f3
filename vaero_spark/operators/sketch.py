"""Mergeable sketches: Count-Min heavy hitters and HyperLogLog distinct.

At 100 TB the full token-frequency table (billions of distinct keys) and
the exact distinct count are themselves shuffle-dominated jobs. Both
classic streaming sketches compress to a FIXED-size, partition-mergeable
summary:

- **Count-Min** (Cormode & Muthukrishnan, J. Algorithms 2005): a d x w
  counter grid; every occurrence increments one cell per row; the
  estimate for a key is the MIN over its d cells (always >= the truth).
  Map-side combine bounds per-partition state at d*w cells, so the only
  shuffle moves <= d*w rows regardless of corpus size.
- **HyperLogLog** (Flajolet et al., AofA 2007): m registers, each the
  max "rank" (trailing-zero run length + 1) of the hashes routed to it;
  the raw estimate is alpha_m * m^2 / sum_j 2^(-M_j). Registers merge
  by MAX, so the shuffle is m rows.

Everything is INTEGER math on md5-derived hashes (repo parity rule):
the Carter-Wegman row hashes reuse the minhash 31-bit family discipline
(products < 2^62, the modulus actually wraps — functions/text.py:519),
and the HLL estimate is evaluated as (ALPHA_BP * m^2 * 2^R) div
(10000 * S) with S = sum_j 2^(R - M_j), R = max_j M_j <= 35, so every
intermediate fits BIGINT in both engines (no DECIMAL division, whose
scale-capped HALF_UP rounding in Spark can cross an integer and break
floor parity). alpha is a 4-digit spec constant (7093 bp for m = 64);
the op defines its estimator, both engines evaluate it bit-identically.

No reference analog: vaerohq/vaero has no aggregation operators at all
(vaero/stream.go task graph = per-event transforms only); these are the
scale ops a 100 TB curation pipeline layers on top.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vaero_spark.functions.text import (
    MINHASH_P,
    _hex_slice_to_long,
    hex_slice_to_long_sql,
    tokens,
    tokens_sql,
)

# --- Count-Min geometry -----------------------------------------------------
CMS_D = 4  # hash rows
CMS_W = 1024  # counters per row
CMS_TOPK = 20  # gate report size

_cms_rng = random.Random(0xBEEFCAFE)  # fixed seed: constants are the spec
CMS_A = [_cms_rng.randrange(1, MINHASH_P) for _ in range(CMS_D)]
CMS_B = [_cms_rng.randrange(0, MINHASH_P) for _ in range(CMS_D)]
del _cms_rng

# --- HyperLogLog geometry ---------------------------------------------------
HLL_M = 64  # registers (b = 6 bits)
HLL_RANK_BITS = 40 - 6  # md5 slice is 40 bits; 6 route, 34 rank
HLL_MAX_RANK = HLL_RANK_BITS + 1  # all-zero suffix
# alpha_64 = 0.7213 / (1 + 1.079/64) = 0.70932... -> 7093 basis points.
HLL_ALPHA_BP = 7093


def _cms_col(h31: Column, row: int) -> Column:
    """Counter column for one CMS row: ((a*h + b) mod p) mod w."""
    return F.pmod(
        F.pmod(h31 * F.lit(CMS_A[row]) + F.lit(CMS_B[row]), F.lit(MINHASH_P)),
        F.lit(CMS_W),
    )


def _cms_col_sql(h31: str, row: int) -> str:
    return f"((({h31}) * {CMS_A[row]} + {CMS_B[row]}) % {MINHASH_P}) % {CMS_W}"


def countmin_cells(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the d x w Count-Min grid over whitespace tokens.

    Returns (row, col, n) for every touched cell. 100 TB shape: tokenize
    + explode are narrow; the groupBy(row, col) map-side combines into at
    most d*w = 4096 partials per partition, so the ONLY shuffle moves
    <= 4096 rows per partition — corpus size never reaches the exchange.
    """
    tok = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    h31 = F.pmod(_hex_slice_to_long(F.md5(F.col("token"))), F.lit(MINHASH_P))
    rc = tok.withColumn("_h", h31).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cms_col(F.col("_h"), i).alias("col")
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("rc")
    )
    return rc.groupBy(
        F.col("rc.row").alias("row"), F.col("rc.col").alias("col")
    ).agg(F.count(F.lit(1)).alias("n"))


def countmin_report(
    df: DataFrame, text_col: str = "text", k: int = CMS_TOPK
) -> DataFrame:
    """Exact top-``k`` tokens next to their Count-Min estimates.

    The report every sketch deployment needs once: how tight is the grid
    on THIS corpus's heavy hitters (n_cms >= n_exact always; the gap is
    the collision load). Deterministic: rank by (n_exact DESC, token).

    100 TB shape: the exact side is ONE map-side-combined groupBy(token)
    (it exists only to grade the sketch — production reads the grid
    alone); the global top-k rides the salted two-phase
    :func:`~vaero_spark.operators.transforms.group_topk` over a literal
    group (bounded partial state, never a global window sort);
    candidates are k rows and the grid <= d*w rows, so the estimate join
    broadcasts the grid; MIN over d cells closes it.
    """
    from vaero_spark.operators.transforms import group_topk

    cells = countmin_cells(df, text_col)
    tok = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_exact"))
    cand = group_topk(
        exact.withColumn("_g", F.lit(0)), "_g", "n_exact", "token", k=k
    ).withColumn(
        "_h", F.pmod(_hex_slice_to_long(F.md5(F.col("token"))), F.lit(MINHASH_P))
    )
    cand_rc = cand.select(
        "rank",
        "token",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), _cms_col(F.col("_h"), i).alias("col")
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("rc"),
    ).select(
        "rank",
        "token",
        "n_exact",
        F.col("rc.row").alias("row"),
        F.col("rc.col").alias("col"),
    )
    return (
        cand_rc.join(F.broadcast(cells), ["row", "col"])
        .groupBy("rank", "token", "n_exact")
        .agg(F.min("n").alias("n_cms"))
    )


def countmin_report_sql(table_expr: str, k: int = CMS_TOPK) -> str:
    """DuckDB twin of :func:`countmin_report` (same hashes, same grid)."""
    h31 = f"({hex_slice_to_long_sql('md5(token)')}) % {MINHASH_P}"
    rc_union = " UNION ALL ".join(
        f"SELECT token, n, {i} AS row, {_cms_col_sql('h31', i)} AS col FROM tok_h"
        for i in range(CMS_D)
    )
    return f"""
    tok AS (SELECT unnest({tokens_sql('text')}) AS token FROM {table_expr}),
    tok_n AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    tok_h AS (SELECT token, n, {h31} AS h31 FROM tok_n),
    rc AS ({rc_union}),
    cells AS (SELECT row, col, CAST(SUM(n) AS BIGINT) AS cn
              FROM rc GROUP BY row, col),
    cand AS (SELECT token, n AS n_exact, h31 FROM tok_h
             ORDER BY n DESC, token LIMIT {k}),
    cand_rc AS ({" UNION ALL ".join(
        f"SELECT token, n_exact, {i} AS row, {_cms_col_sql('h31', i)} AS col FROM cand"
        for i in range(CMS_D))})
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_exact DESC, token) AS INTEGER) AS rank,
           token, n_exact, CAST(MIN(cn) AS BIGINT) AS n_cms
    FROM (SELECT c.token, c.n_exact, cells.cn
          FROM cand_rc c JOIN cells USING (row, col)) j
    GROUP BY token, n_exact"""


def _rank_from_sfx() -> Column:
    """Rank of the 34-bit suffix in column ``_sfx``: trailing-zero run
    length + 1 (``HLL_MAX_RANK`` for the all-zero suffix). bin() prints
    without leading zeros in BOTH engines, so the string arithmetic is
    engine-identical."""
    return (
        F.when(F.col("_sfx") == 0, F.lit(HLL_MAX_RANK))
        .otherwise(
            F.expr(
                "length(bin(_sfx)) - length(TRIM(TRAILING '0' FROM bin(_sfx))) + 1"
            ).cast("int")
        )
        .alias("rank")
    )


def hll_summary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row HyperLogLog summary over whitespace tokens.

    Columns: m, n_exact (ground truth, for grading), est_distinct (the
    integer raw HLL estimate), err_bp (|est - exact| share of exact in
    basis points), r_max, s_sum (the estimate's integer numerics, so the
    row is self-auditing), regs (all m register max-ranks, ordered — the
    full mergeable sketch state, exact).

    Register routing: the 40-bit md5 slice splits 6 route bits (low) +
    34 rank bits; rank = trailing-zero run of the suffix + 1 (35 for an
    all-zero suffix). Trailing zeros via bin()/TRIM — bin() prints
    without leading zeros in BOTH engines (verified), so the string
    arithmetic is engine-identical.

    100 TB shape: hash + route are narrow; groupBy(register) map-side
    combines to <= m partials per partition (the sketch's entire point);
    the final agg is m rows -> 1. The exact countDistinct exists only to
    grade the estimate and is the one corpus-sized shuffle here.
    """
    tok = df.select(F.explode(tokens(F.col(text_col))).alias("token"))
    h = _hex_slice_to_long(F.md5(F.col("token")))
    rows = tok.select(
        F.pmod(h, F.lit(HLL_M)).alias("register"),
        F.shiftright(h, 6).alias("_sfx"),
    ).select(
        "register",
        _rank_from_sfx(),
    )
    regs = (
        df.sparkSession.range(HLL_M)
        .select(F.col("id").cast("int").alias("register"))
        .join(rows.groupBy("register").agg(F.max("rank").alias("mr")), "register", "left")
        .select("register", F.coalesce(F.col("mr"), F.lit(0)).alias("max_rank"))
    )
    exact = tok.agg(F.countDistinct("token").alias("n_exact"))
    # flat two-level aggregate (m rows -> 1): r_max first, then the
    # shifted sum against the broadcast 1-row max — no arithmetic inside
    # array lambdas (the repo's HOF re-evaluation/corruption discipline)
    mx = regs.agg(F.max("max_rank").alias("r_max"))
    summary = (
        regs.crossJoin(F.broadcast(mx))
        .groupBy("r_max")
        .agg(
            F.expr("CAST(SUM(shiftleft(1L, r_max - max_rank)) AS BIGINT)").alias(
                "s_sum"
            ),
            F.transform(
                F.array_sort(F.collect_list(F.struct("register", "max_rank"))),
                lambda s: s.max_rank,
            ).alias("regs"),
        )
        .crossJoin(F.broadcast(exact))
    )
    return (
        summary.withColumn(
            "est_distinct",
            F.expr(
                f"(CAST({HLL_ALPHA_BP} AS BIGINT) * {HLL_M * HLL_M}"
                " * shiftleft(1L, r_max)) div (10000L * s_sum)"
            ),
        )
        .withColumn(
            "err_bp", F.expr("(10000L * abs(est_distinct - n_exact)) div n_exact")
        )
        .select(
            F.lit(HLL_M).alias("m"),
            "n_exact",
            "est_distinct",
            "err_bp",
            "r_max",
            "s_sum",
            "regs",
        )
    )


def hll_summary_sql(table_expr: str) -> str:
    """DuckDB twin of :func:`hll_summary` (same routing, same estimate)."""
    h = hex_slice_to_long_sql("md5(token)")
    return f"""
    tok AS (SELECT unnest({tokens_sql('text')}) AS token FROM {table_expr}),
    hashed AS (SELECT ({h}) % {HLL_M} AS register, ({h}) // 64 AS sfx FROM tok),
    ranked AS (SELECT register,
                      CASE WHEN sfx = 0 THEN {HLL_MAX_RANK}
                           ELSE length(bin(sfx)) - length(rtrim(bin(sfx), '0')) + 1
                      END AS rank
               FROM hashed),
    regs AS (SELECT g.register,
                    CAST(COALESCE(MAX(ranked.rank), 0) AS INTEGER) AS max_rank
             FROM (SELECT unnest(generate_series(0, {HLL_M - 1})) AS register) g
             LEFT JOIN ranked ON ranked.register = g.register
             GROUP BY g.register),
    summ AS (SELECT MAX(max_rank) AS r_max,
                    list(max_rank ORDER BY register) AS regs
             FROM regs),
    ssum AS (SELECT r_max, regs,
                    (SELECT CAST(SUM(1::BIGINT << (summ.r_max - mr)) AS BIGINT)
                     FROM unnest(summ.regs) AS u(mr)) AS s_sum
             FROM summ),
    exact AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS n_exact FROM tok)
    SELECT {HLL_M} AS m,
           n_exact,
           CAST(({HLL_ALPHA_BP}::BIGINT * {HLL_M * HLL_M} * (1::BIGINT << r_max))
                // (10000::BIGINT * s_sum) AS BIGINT) AS est_distinct,
           CAST((10000::BIGINT * abs(({HLL_ALPHA_BP}::BIGINT * {HLL_M * HLL_M}
                * (1::BIGINT << r_max)) // (10000::BIGINT * s_sum) - n_exact))
                // n_exact AS BIGINT) AS err_bp,
           r_max,
           s_sum,
           regs
    FROM ssum, exact"""


# ---------------------------------------------------------------------------
# Windowed HLL — batch and streaming (the sketch the stream actually ships)
# ---------------------------------------------------------------------------


def windowed_hll_registers(
    df: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Per-window HLL register maxima (win_start, register, max_rank) —
    the batch form of the mergeable state :func:`stream_windowed_hll`
    maintains live. Only OBSERVED registers appear; the summary layer
    completes the set (untouched register = rank 0).

    100 TB shape: hash + route narrow; ONE map-side-combined
    groupBy(window, register) whose shuffle moves <= m rows per
    partition per open window.
    """
    tok = df.select(
        F.window(F.col(ts_col), duration).start.alias("win_start"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    h = _hex_slice_to_long(F.md5(F.col("token")))
    rows = tok.select(
        "win_start", F.pmod(h, F.lit(HLL_M)).alias("register"),
        F.shiftright(h, 6).alias("_sfx"),
    ).select(
        "win_start",
        "register",
        _rank_from_sfx(),
    )
    return rows.groupBy("win_start", "register").agg(F.max("rank").alias("max_rank"))


def stream_windowed_hll(
    stream: DataFrame,
    duration: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """STREAMING windowed HLL registers in APPEND mode — the approximate
    sibling of :func:`~vaero_spark.operators.windows.
    stream_windowed_distinct`, and the reason sketches exist at stream
    scale: the exact op's state is one row per OPEN (window, distinct
    key) — unbounded in the key domain — while this op's state is AT
    MOST ``m`` = 64 register rows per open window, whatever the corpus
    does. Each (window, register) max-rank is emitted exactly ONCE,
    finalized, at watermark passage; downstream consumers merge emitted
    registers by MAX (mergeability pytest-pinned) and apply the
    :func:`windowed_hll_summary` arithmetic.

    Drain contract = the ``stream_w_distinct`` convention: bounded
    replay as one batch + a zero-token sentinel past
    ``max_ts + watermark + 2*duration`` (the watermark advances at the
    watermark node, before tokenization drops the sentinel row; its own
    window stays held, unemitted).
    """
    tok = stream.withWatermark(ts_col, watermark).select(
        F.window(F.col(ts_col), duration).alias("win"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    h = _hex_slice_to_long(F.md5(F.col("token")))
    rows = tok.select(
        "win", F.pmod(h, F.lit(HLL_M)).alias("register"),
        F.shiftright(h, 6).alias("_sfx"),
    ).select(
        "win",
        "register",
        _rank_from_sfx(),
    )
    return (
        rows.groupBy("win", "register")
        .agg(F.max("rank").alias("max_rank"))
        .select(F.col("win.start").alias("win_start"), "register", "max_rank")
    )


def windowed_hll_summary(regs: DataFrame) -> DataFrame:
    """Per-window estimate from (win_start, register, max_rank) rows —
    the stateless arithmetic layer shared by the batch gate and the
    streaming drain (identical inputs => identical rows, which is the
    drained==batch oracle). Completes each window's register set
    (untouched register = rank 0) via a broadcast 64-row dimension,
    then the same flat two-level aggregate as :func:`hll_summary` —
    no arithmetic inside array lambdas (HOF discipline).
    """
    spark = regs.sparkSession
    dim = F.broadcast(
        spark.range(HLL_M).select(F.col("id").cast("int").alias("register"))
    )
    full = (
        regs.select("win_start").distinct()
        .join(dim)
        .join(regs, ["win_start", "register"], "left")
        .select(
            "win_start",
            "register",
            F.coalesce(F.col("max_rank"), F.lit(0)).alias("max_rank"),
        )
    )
    mx = full.groupBy("win_start").agg(F.max("max_rank").alias("r_max"))
    return (
        full.join(mx, "win_start")
        .groupBy("win_start", "r_max")
        .agg(
            F.expr("CAST(SUM(shiftleft(1L, r_max - max_rank)) AS BIGINT)").alias(
                "s_sum"
            ),
            F.transform(
                F.array_sort(F.collect_list(F.struct("register", "max_rank"))),
                lambda s: s.max_rank,
            ).alias("regs"),
        )
        .withColumn(
            "est_distinct",
            F.expr(
                f"(CAST({HLL_ALPHA_BP} AS BIGINT) * {HLL_M * HLL_M}"
                " * shiftleft(1L, r_max)) div (10000L * s_sum)"
            ),
        )
        .select("win_start", "est_distinct", "r_max", "s_sum", "regs")
    )


def windowed_hll(
    df: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Batch windowed HLL, self-grading: each window's integer estimate
    NEXT TO its exact distinct-token count (n_exact + err_bp) — the
    report that sizes the sketch before a deployment trusts it. The
    exact side is the one corpus-sized shuffle and exists only to grade
    (production reads the registers alone; ``w_distinct`` is the exact
    op when the gate demands exactness).
    """
    summ = windowed_hll_summary(windowed_hll_registers(df, duration, ts_col, text_col))
    exact = (
        df.select(
            F.window(F.col(ts_col), duration).start.alias("win_start"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("win_start")
        .agg(F.countDistinct("token").alias("n_exact"))
    )
    return (
        summ.join(exact, "win_start")
        .withColumn(
            "err_bp", F.expr("(10000L * abs(est_distinct - n_exact)) div n_exact")
        )
        .select(
            "win_start", "n_exact", "est_distinct", "err_bp", "r_max", "s_sum", "regs"
        )
    )


def windowed_hll_sql(table_expr: str, include_exact: bool = True) -> str:
    """DuckDB twin of :func:`windowed_hll` (``include_exact=True``) and
    of the drained :func:`stream_windowed_hll` + summary composition
    (``include_exact=False``) — same routing, same integer estimate."""
    h = hex_slice_to_long_sql("md5(token)")
    exact_cte = """,
    wexact AS (SELECT win_start, CAST(COUNT(DISTINCT token) AS BIGINT) AS n_exact
               FROM wtok GROUP BY win_start)"""
    exact_cols = (
        "n_exact, est_distinct, CAST((10000::BIGINT * abs(est_distinct - n_exact))"
        " // n_exact AS BIGINT) AS err_bp,"
        if include_exact
        else "est_distinct,"
    )
    exact_join = " JOIN wexact USING (win_start)" if include_exact else ""
    return f"""
    wtok AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
                    unnest({tokens_sql('text')}) AS token
             FROM {table_expr}),
    whash AS (SELECT win_start, ({h}) % {HLL_M} AS register,
                     ({h}) // 64 AS sfx
              FROM wtok),
    wrank AS (SELECT win_start, register,
                     CASE WHEN sfx = 0 THEN {HLL_MAX_RANK}
                          ELSE length(bin(sfx)) - length(rtrim(bin(sfx), '0')) + 1
                     END AS rank
              FROM whash),
    wobs AS (SELECT win_start, register, MAX(rank) AS max_rank
             FROM wrank GROUP BY win_start, register),
    wfull AS (SELECT w.win_start, g.register,
                     CAST(COALESCE(o.max_rank, 0) AS INTEGER) AS max_rank
              FROM (SELECT DISTINCT win_start FROM wobs) w
              CROSS JOIN (SELECT unnest(generate_series(0, {HLL_M - 1})) AS register) g
              LEFT JOIN wobs o
                ON o.win_start = w.win_start AND o.register = g.register),
    wmax AS (SELECT win_start, MAX(max_rank) AS r_max FROM wfull GROUP BY win_start),
    wsum AS (SELECT f.win_start, m.r_max,
                    CAST(SUM(1::BIGINT << (m.r_max - f.max_rank)) AS BIGINT) AS s_sum,
                    list(f.max_rank ORDER BY f.register) AS regs
             FROM wfull f JOIN wmax m USING (win_start)
             GROUP BY f.win_start, m.r_max),
    west AS (SELECT win_start, r_max, s_sum, regs,
                    CAST(({HLL_ALPHA_BP}::BIGINT * {HLL_M * HLL_M}
                          * (1::BIGINT << r_max))
                         // (10000::BIGINT * s_sum) AS BIGINT) AS est_distinct
             FROM wsum){exact_cte if include_exact else ""}
    SELECT west.win_start, {exact_cols} r_max, s_sum, regs
    FROM west{exact_join}"""
