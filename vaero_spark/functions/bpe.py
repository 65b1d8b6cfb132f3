"""BPE tokenizer APPLICATION as a narrow, shuffle-free column pipeline.

``vocab_merges`` (functions/text.pair_merge_topk) INDUCES a merge table
from the corpus; this module APPLIES a merge table to encode documents —
the other half of the tokenizer story a training-data pipeline needs
(count the real token budget of a corpus under a fixed vocab, compare
compression across sources, shard by encoded length).

Encoding scheme (Sennrich-style byte-pair application, exactly
mirrored in the DuckDB oracle):

1. normalize: lowercase, non-letters → space, collapse runs, trim;
2. wrap every char ``c`` as ``\\x1f c \\x1f`` (one regexp pass) — the
   unit separator makes token boundaries explicit so a merge pattern
   can never match across units or inside a longer unit;
3. for each merge ``(a, b)`` IN RANK ORDER run one global
   ``replace(s, SEP+a+SEP+SEP+b+SEP, SEP+ab+SEP)`` — builtin string
   replace is non-overlapping left-to-right in BOTH engines (probed:
   ``replace('a a a','a a','aa') = 'aa a'`` in Spark 4.1.2 and DuckDB
   1.x), which is exactly BPE's greedy within-rank application;
4. token count = units − spaces (spaces are single-char units, never
   merged), all integer arithmetic.

Everything is a chain of builtin string expressions — whole-stage
codegen, zero shuffles, zero UDFs, column-pruned down to (id, text).
At 100 TB this runs at scan speed; the merge table is a few hundred
entries compiled INTO the plan (a closed-form expression tree), not a
join — the same way production tokenizers ship the vocab to every
worker. Cross-engine parity is integer/string only (counts, md5,
floor-of-division basis points per the repo parity rule).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator between encoded tokens

# Default merge ranking: the classic high-frequency English character
# pairs (th/the/in/an/er/...), rank-ordered the way a corpus-induced
# table from pair_merge_topk would emerge. Each entry merges unit `a`
# followed by unit `b` into `a+b`; later merges may consume earlier
# outputs (("t","h") then ("th","e")).
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"),
    ("th", "e"),
    ("i", "n"),
    ("a", "n"),
    ("o", "n"),
    ("e", "r"),
    ("r", "e"),
    ("a", "t"),
    ("s", "t"),
    ("e", "n"),
    ("o", "r"),
    ("an", "d"),
    ("in", "g"),
    ("s", "e"),
    ("a", "r"),
    ("l", "e"),
)


def _clean(c: Column) -> Column:
    s = F.regexp_replace(F.lower(c), "[^a-z ]+", " ")
    return F.trim(F.regexp_replace(s, " +", " "))


def _clean_sql(col: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({col}),"
        f" '[^a-z ]+', ' ', 'g'), ' +', ' ', 'g'))"
    )


def bpe_encode(c: Column, merges=DEFAULT_MERGES) -> Column:
    """The encoded string: SEP-wrapped units after applying ``merges``
    in rank order (module docstring scheme)."""
    s = F.regexp_replace(_clean(c), "(.)", f"{SEP}$1{SEP}")
    for a, b in merges:
        s = F.replace(s, F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"), F.lit(f"{SEP}{a}{b}{SEP}"))
    return s


def bpe_encode_sql(col: str, merges=DEFAULT_MERGES) -> str:
    """DuckDB twin of :func:`bpe_encode`. The separator is spelled
    ``chr(31)`` so the SQL string carries no control characters."""
    sep = "chr(31)"
    s = f"regexp_replace({_clean_sql(col)}, '(.)', {sep} || '\\1' || {sep}, 'g')"
    for a, b in merges:
        pat = f"{sep} || '{a}' || {sep} || {sep} || '{b}' || {sep}"
        rep = f"{sep} || '{a}{b}' || {sep}"
        s = f"replace({s}, {pat}, {rep})"
    return s


def bpe_stats(df, text_col: str = "text", id_col: str = "doc_id", merges=DEFAULT_MERGES):
    """Per-document encoding stats, all oracle-exact:

    - ``bpe_units``  — encoded token count under the merge table
      (spaces excluded);
    - ``bpe_chars``  — letter count the units cover (normalized text
      minus spaces);
    - ``comp_bp``    — compression in basis points,
      ``floor(10000·units/chars)`` (10000 = no compression; lower =
      the vocab packs more chars per token);
    - ``enc_md5``    — md5 of the encoded string (the cross-engine
      value witness that every merge fired identically).

    Two projections on purpose: the merge chain (``_enc``) and the
    normalized text (``_clean``) are MATERIALIZED once and the count
    columns derive from them — Catalyst's CollapseProject keeps the
    split (multi-referenced non-cheap aliases), so the 16-replace chain
    evaluates once per row, and the DuckDB twin mirrors the same shape
    with a subquery.
    """
    c = F.col(text_col)
    base = df.select(
        F.col(id_col),
        _clean(c).alias("_clean"),
        bpe_encode(c, merges).alias("_enc"),
    )
    n_sep = F.length("_enc") - F.length(F.replace(F.col("_enc"), F.lit(SEP), F.lit("")))
    n_units_all = F.floor(n_sep / F.lit(2)).cast("bigint")
    n_spaces = (
        F.length("_clean") - F.length(F.replace(F.col("_clean"), F.lit(" "), F.lit("")))
    ).cast("bigint")
    n_units = (n_units_all - n_spaces).alias("bpe_units")
    n_chars = (F.length("_clean").cast("bigint") - n_spaces).alias("bpe_chars")
    comp = F.floor(
        F.lit(10000) * (n_units_all - n_spaces)
        / F.greatest(F.length("_clean").cast("bigint") - n_spaces, F.lit(1))
    ).cast("bigint").alias("comp_bp")
    return base.select(F.col(id_col), n_units, n_chars, comp, F.md5("_enc").alias("enc_md5"))


def bpe_stats_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    merges=DEFAULT_MERGES,
) -> str:
    """DuckDB twin of :func:`bpe_stats` — standalone SELECT; the
    encoded string materializes once in the inner subquery, count
    arithmetic mirrors the Spark expressions token-for-token."""
    inner = (
        f"SELECT {id_col}, {_clean_sql(text_col)} AS _clean, "
        f"{bpe_encode_sql(text_col, merges)} AS _enc FROM {table}"
    )
    n_sep = "(length(_enc) - length(replace(_enc, chr(31), '')))"
    n_units_all = f"CAST(floor({n_sep} / 2) AS BIGINT)"
    n_spaces = "CAST(length(_clean) - length(replace(_clean, ' ', '')) AS BIGINT)"
    n_units = f"({n_units_all} - {n_spaces})"
    n_chars = f"(CAST(length(_clean) AS BIGINT) - {n_spaces})"
    return f"""
    SELECT {id_col},
           {n_units} AS bpe_units,
           {n_chars} AS bpe_chars,
           CAST(floor(10000 * {n_units} / greatest({n_chars}, 1)) AS BIGINT) AS comp_bp,
           md5(_enc) AS enc_md5
    FROM ({inner})"""
