"""Z-order (Morton) data layout + min-max pruning effectiveness report.

THE 100 TB data-layout question: a time-partitioned table prunes
beautifully on time and not at all on anything else — a query boxed on
(user, hour) still reads every file of every hour in range. Z-ORDER
CLUSTERING (Morton-interleaving the bits of two dimensions into one
clustering key — the mechanism behind Delta/Iceberg ``OPTIMIZE ZORDER
BY``) makes file-level min-max stats selective on BOTH dimensions at
once: a file of contiguous z-values covers a small rectangle of the
(a, b) plane instead of a full-width stripe.

This module computes the z-key as a flat integer expression (engine-
neutral: the bit interleave is pure div/mod/multiply arithmetic, no bit
intrinsics) and reports, for a given query box, the classic pruning
funnel under each layout: number of files, files whose min-max envelope
overlaps the box (what a parquet reader must open), rows inside those
files (the I/O proxy), and rows actually matching (identical across
layouts — layout changes cost, never answers).

"Files" here are layout-key prefix buckets — exactly the contiguous
key ranges a ``repartitionByRange(z).sortWithinPartitions(z)`` write
would place in one file, but computed WITHOUT a global sort: the bucket
id is a projection, the per-file stats one map-side-combined groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative integer
    columns: z = ... a1 b1 a0 b0 (a in the odd bit positions). Pure
    div/mod arithmetic — identical in any engine, no bit intrinsics."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        # true integer division (Spark's `div` == DuckDB `//`), never
        # double `/` + cast — exact at any magnitude (ADVICE r6)
        a_bit = F.call_function("div", a.cast("long"), F.lit(1 << i)) % F.lit(2)
        b_bit = F.call_function("div", b.cast("long"), F.lit(1 << i)) % F.lit(2)
        z = z + a_bit * F.lit(1 << (2 * i + 1)) + b_bit * F.lit(1 << (2 * i))
    return z


def zorder_key_sql(a: str, b: str, bits: int = 8) -> str:
    terms = []
    for i in range(bits):
        terms.append(
            f"((CAST({a} AS BIGINT) // {1 << i}) % 2) * {1 << (2 * i + 1)}"
            f" + ((CAST({b} AS BIGINT) // {1 << i}) % 2) * {1 << (2 * i)}"
        )
    return "(" + " + ".join(terms) + ")"


def layout_prune_report(
    df: DataFrame,
    a_col: str,
    b_col: str,
    box_a: tuple[int, int],
    box_b: tuple[int, int],
    bits: int = 8,
    file_rows_exp: int = 8,
) -> DataFrame:
    """Compare min-max file pruning for the query box ``a in [box_a),
    b in [box_b)`` under two layouts of the same rows:

    - ``time``: files are ``b``-prefix buckets (the time-partitioned
      status quo — one stripe per coarse b range, full a-width),
    - ``zorder``: files are z-prefix buckets (``z DIV 2^file_rows_exp``
      — contiguous Morton ranges, small (a, b) rectangles).

    Both carve the SAME key space into the SAME number of buckets
    (2^(2*bits - file_rows_exp) z-files vs matching b granularity), so
    the comparison isolates the CLUSTERING, not the file count. Output,
    one row per layout: (layout, n_files, files_hit, rows_in_hit_files,
    rows_matching) where files_hit counts files whose per-file
    (min/max a, min/max b) envelope — the parquet-footer model —
    overlaps the box. rows_matching is layout-invariant by
    construction; the report's point is the rows_in_hit_files gap.

    Shape: the file id is a narrow projection; per-file stats are ONE
    map-side-combined groupBy over ≤ 2^(2*bits) tiny rows; no sort
    anywhere (a real write would range-partition on the same key).
    """
    a = F.col(a_col).cast("long")
    b = F.col(b_col).cast("long")
    z = zorder_key(a, b, bits)
    layouts = {
        # time layout: same file COUNT => each file is a contiguous b
        # range of 2^file_rows_exp "hours" x full a-width... except b
        # only has 2^bits values, so files = b DIV 2^(file_rows_exp-bits)
        # when that is >= 1, else one file per b value
        "time": F.call_function("div", b, F.lit(max(1, 1 << (file_rows_exp - bits)))),
        "zorder": F.call_function("div", z, F.lit(1 << file_rows_exp)),
    }
    (a_lo, a_hi), (b_lo, b_hi) = box_a, box_b
    match = (a >= a_lo) & (a < a_hi) & (b >= b_lo) & (b < b_hi)
    out = None
    for name, file_id in layouts.items():
        stats = (
            df.select(
                file_id.alias("f"),
                a.alias("_a"),
                b.alias("_b"),
                match.cast("long").alias("_m"),
            )
            .groupBy("f")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("_a").alias("min_a"),
                F.max("_a").alias("max_a"),
                F.min("_b").alias("min_b"),
                F.max("_b").alias("max_b"),
                F.sum("_m").cast("long").alias("n_match"),
            )
        )
        hit = (
            (F.col("max_a") >= a_lo)
            & (F.col("min_a") < a_hi)
            & (F.col("max_b") >= b_lo)
            & (F.col("min_b") < b_hi)
        )
        report = stats.agg(
            F.lit(name).alias("layout"),
            F.count(F.lit(1)).alias("n_files"),
            F.sum(hit.cast("long")).cast("long").alias("files_hit"),
            F.sum(F.when(hit, F.col("n_rows")).otherwise(0)).cast("long").alias(
                "rows_in_hit_files"
            ),
            F.sum("n_match").cast("long").alias("rows_matching"),
        )
        out = report if out is None else out.unionByName(report)
    return out


def layout_prune_report_sql(
    table: str,
    a_col: str,
    b_col: str,
    box_a: tuple[int, int],
    box_b: tuple[int, int],
    bits: int = 8,
    file_rows_exp: int = 8,
) -> str:
    """DuckDB twin of :func:`layout_prune_report` (standalone SELECT)."""
    a = f"CAST({a_col} AS BIGINT)"
    b = f"CAST({b_col} AS BIGINT)"
    z = zorder_key_sql(a_col, b_col, bits)
    (a_lo, a_hi), (b_lo, b_hi) = box_a, box_b
    time_div = max(1, 1 << (file_rows_exp - bits))
    match = f"({a} >= {a_lo} AND {a} < {a_hi} AND {b} >= {b_lo} AND {b} < {b_hi})"
    parts = []
    for name, fexpr in (
        ("time", f"({b} // {time_div})"),
        ("zorder", f"({z} // {1 << file_rows_exp})"),
    ):
        parts.append(f"""
    SELECT '{name}' AS layout,
           COUNT(*) AS n_files,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS files_hit,
           CAST(SUM(CASE WHEN hit THEN n_rows ELSE 0 END) AS BIGINT)
             AS rows_in_hit_files,
           CAST(SUM(n_match) AS BIGINT) AS rows_matching
    FROM (
      SELECT f, COUNT(*) AS n_rows,
             CAST(SUM(m) AS BIGINT) AS n_match,
             (MAX(av) >= {a_lo} AND MIN(av) < {a_hi}
              AND MAX(bv) >= {b_lo} AND MIN(bv) < {b_hi}) AS hit
      FROM (SELECT {fexpr} AS f, {a} AS av, {b} AS bv,
                   CASE WHEN {match} THEN 1 ELSE 0 END AS m
            FROM {table})
      GROUP BY f)""")
    return "\n    UNION ALL".join(parts)
