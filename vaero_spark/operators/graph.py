"""Integer fixed-point TextRank — PageRank over the token-adjacency
graph (Mihalcea & Tarau, EMNLP 2004) for corpus-level keyword scoring.

The op a curation pipeline uses to rank salient vocabulary: build the
directed token-transition graph (edge u->v weighted by how often v
follows u anywhere in the corpus), then run K damped power-iteration
rounds and report the top-k tokens by stationary score.

ALL arithmetic is BIGINT (repo parity rule — floats in an iterative
recurrence compound ulp drift across engines):

- every node starts at ``R0 = 10^9``;
- one round:  ``r'(v) = BASE + sum_u  (8500 * r(u) * w_uv) div
  (10000 * W_u)`` with ``BASE = (1500 * R0) div 10000`` (damping 0.85
  in basis points, floor at every edge — both engines floor-divide
  positive BIGINTs identically) and ``W_u`` = total out-weight of u;
- the per-edge numerator is built with ``try_multiply`` so a BIGINT
  overflow raises an actionable "switch to DECIMAL(38,0)" error
  instead of ANSI's opaque ARITHMETIC_OVERFLOW (the cooccur_lift
  idiom; in-bound the try product IS the numerator, zero extra cost).

Sink handling: every node gets a weight-0 self-loop, so nodes with no
real in-edges still surface each round (carrying exactly BASE) and the
recursive oracle's working table never loses them; a node with no real
out-edges keeps ``W_u = 1`` (GREATEST) so nothing divides by zero.
Dangling mass simply decays — the standard unnormalized variant, exact
and deterministic (scores are a ranking, not a distribution).

100 TB shape: the edge build is ONE shuffle on doc_id (per-document
position window only — never a global sort) + ONE map-side-combined
groupBy on the pair; the iteration state is VOCAB-sized (ranks: one row
per distinct token), each round = one join on src + one
map-side-combined groupBy(dst); the loop ``localCheckpoint``s per round
(lazy round-over-round plans re-evaluate exponentially — measured on
neardup_clusters, dedup.py) and K is a small constant. The final top-k
rides the salted two-phase group_topk, never a global window sort.

Oracle: the whole recurrence replays exactly in a DuckDB recursive CTE
(GROUP BY in the recursive term; the corpus_pack / dedup_keep r4
precedent) — the self-loops keep the working table complete.

No reference analog (vaerohq/vaero has no joins or aggregation); §2.7
training-data extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vaero_spark.functions.text import tokens, tokens_sql

TEXTRANK_R0 = 1_000_000_000  # initial per-node score
TEXTRANK_DAMP_BP = 8500  # damping 0.85 in basis points
TEXTRANK_BASE = (10_000 - TEXTRANK_DAMP_BP) * TEXTRANK_R0 // 10_000
TEXTRANK_ITERS = 6
TEXTRANK_TOPK = 25

# try_multiply(try_multiply(8500, r), w): NULL == BIGINT overflow ==
# actionable error; in-bound the try product IS the numerator.
_CONTRIB = (
    f"CASE WHEN try_multiply(try_multiply({TEXTRANK_DAMP_BP}L, r), w) IS NULL"
    "      THEN CAST(raise_error('textrank: 8500*r*w overflows BIGINT;"
    " switch the contribution to DECIMAL(38,0)/floor(a/b)"
    " (see graph.py docstring)') AS BIGINT)"
    f"      ELSE try_multiply(try_multiply({TEXTRANK_DAMP_BP}L, r), w)"
    "            div (10000L * wt) END"
)


def _token_edges(df: DataFrame, text_col: str) -> DataFrame:
    """(src, dst, w): directed adjacent-token transition counts."""
    tok = df.select(
        F.col("doc_id").alias("_doc"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy("_doc").orderBy("pos")
    return (
        tok.select(
            F.col("tok").alias("src"), F.lead("tok").over(w).alias("dst")
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def textrank(
    df: DataFrame,
    text_col: str = "text",
    iters: int = TEXTRANK_ITERS,
    k: int = TEXTRANK_TOPK,
) -> DataFrame:
    """Top-``k`` tokens by integer TextRank score after ``iters`` rounds.

    Output: (rank, token, score) — deterministic (score DESC, token ASC).
    """
    from vaero_spark.operators.transforms import group_topk

    edges = _token_edges(df, text_col)
    nodes = df.select(
        F.explode(tokens(F.col(text_col))).alias("node")
    ).distinct()
    e_all = edges.unionByName(
        nodes.select(
            F.col("node").alias("src"),
            F.col("node").alias("dst"),
            F.lit(0).cast("long").alias("w"),
        )
    )
    wout = e_all.groupBy("src").agg(
        F.greatest(F.sum("w"), F.lit(1).cast("long")).alias("wt")
    )
    from vaero_spark.operators.checkpoints import CheckpointTracker

    trk = CheckpointTracker(df.sparkSession)
    # static across rounds: materialize once so each round's plan starts
    # from a checkpointed edge relation, not a re-derived lineage tree
    e_w = e_all.join(wout, "src").localCheckpoint()
    trk.pin_static()  # held for the whole invocation, freed at finish()

    ranks = nodes.select("node", F.lit(TEXTRANK_R0).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (
            e_w.join(ranks, e_w.src == ranks.node)
            .select("dst", F.expr(_CONTRIB).alias("_c"))
            .groupBy("dst")
            .agg(F.sum("_c").alias("_sum"))
        )
        # per-round localCheckpoint: the repo's iterative-loop invariant
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(TEXTRANK_BASE).cast("long") + F.col("_sum")).alias("r"),
        ).localCheckpoint()
        trk.round_done()  # releases the superseded round's blocks

    trk.finish()
    top = group_topk(
        ranks.withColumn("_g", F.lit(0)), "_g", "r", "node", k=k
    )
    return top.select(
        "rank", F.col("node").alias("token"), F.col("r").alias("score")
    )


def textrank_sql(
    table_expr: str,
    iters: int = TEXTRANK_ITERS,
    k: int = TEXTRANK_TOPK,
) -> str:
    """DuckDB recursive-CTE twin of :func:`textrank` (same recurrence,
    same self-loop completion, same floor divisions). Returns a full
    SELECT to be prefixed with ``WITH RECURSIVE``."""
    tk = tokens_sql("text")
    return f"""
    toks AS (
      -- parallel unnests zip in DuckDB (1.0 has no WITH ORDINALITY)
      SELECT doc_id, unnest(tk) AS tok,
             unnest(generate_series(1, len(tk))) AS pos
      FROM (SELECT doc_id, {tk} AS tk FROM {table_expr})),
    pairs AS (
      SELECT tok AS src,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS dst
      FROM toks),
    edges AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
      FROM pairs WHERE dst IS NOT NULL GROUP BY src, dst),
    nodes AS (SELECT DISTINCT tok AS node FROM toks),
    e_all AS (
      SELECT * FROM edges
      UNION ALL
      SELECT node, node, CAST(0 AS BIGINT) FROM nodes),
    wout AS (
      SELECT src, GREATEST(CAST(SUM(w) AS BIGINT), 1) AS wt
      FROM e_all GROUP BY src),
    e_w AS (SELECT e_all.src, e_all.dst, e_all.w, wout.wt
            FROM e_all JOIN wout ON wout.src = e_all.src),
    pr(iter, node, r) AS (
      SELECT 0, node, CAST({TEXTRANK_R0} AS BIGINT) FROM nodes
      UNION ALL
      SELECT iter + 1, dst,
             CAST({TEXTRANK_BASE} +
                  SUM(({TEXTRANK_DAMP_BP} * r * w) // (10000 * wt))
                  AS BIGINT)
      FROM pr JOIN e_w ON e_w.src = pr.node
      WHERE iter < {iters}
      GROUP BY iter + 1, dst),
    final AS (SELECT node, r FROM pr WHERE iter = {iters})
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY r DESC, node) AS INTEGER) AS rank,
           node AS token, r AS score
    FROM final
    ORDER BY rank LIMIT {k}"""
