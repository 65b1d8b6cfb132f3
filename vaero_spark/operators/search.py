"""Corpus keyword search: BM25-family ranked retrieval over a document
table — the inspection/probing tool a training-data pipeline needs
beside its filters (pull the top documents for a term set to audit what
a curation gate is keeping, mine contamination candidates by keyword,
spot-check a 100 TB corpus without exporting it). No reference
counterpart (the reference's only text predicate is ``filter_regexp``,
``/root/reference/transform/filter_regexp.go``; SURVEY.md §2.7).

Scoring is BM25 with the RSJ ODDS idf — ``(N − df + 0.5)/(df + 0.5)``
instead of its logarithm. Rationale: ``ln`` is the one elementary
function IEEE 754 does NOT require correctly rounded, so a log-based
score can differ between engines in the last ulp and break the
bit-exact oracle gate at quantization boundaries; +, −, ×, ÷ are all
correctly rounded, so a log-free score built from them in a FIXED
expression order is bit-identical everywhere. The odds ratio is the
quantity whose log is the classic RSJ weight — per-term ranking order
is unchanged; only the blend across terms differs from textbook BM25
(documented trade for exactness).

100 TB shape: one tokenize pass → explode only the terms that match
the (tiny, broadcast) query term set — the exploded stream is
|matches|, not |tokens| — one groupBy (doc, term), a broadcast join of
per-term document frequencies, and a distributed top-k
(TakeOrderedAndProject). Corpus statistics (N, total token count) come
from the caller when known (table stats / ingest counters — no extra
scan) or from one aggregate over the tokenize pass otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vaero_spark.functions.text import tokens, tokens_sql

BM25_K1 = 1.2
BM25_B = 0.75


def _w_e6(tf, df, dl, n_docs, total_dl, k1: float, b: float):
    """floor(1e6 · odds-idf · saturated-tf) — the exact expression tree
    mirrored token-for-token by :func:`bm25_sql` (correctly-rounded ops
    in a fixed order ⇒ bit-identical across engines)."""
    idf = (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5))
    avgdl = total_dl / n_docs
    norm = F.lit(1.0) - F.lit(b) + F.lit(b) * (dl / avgdl)
    w = idf * (tf * (F.lit(k1) + F.lit(1.0))) / (tf + F.lit(k1) * norm)
    return F.floor(F.lit(1000000.0) * w).cast("bigint")


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
    total_tokens: int | None = None,
) -> DataFrame:
    """Top-``k`` documents for ``terms`` by log-free BM25 (module doc).

    Returns (id, score_e6, n_terms, rank) — score quantized to 1e-6,
    rank deterministic (score desc, id asc). Pass ``n_docs`` /
    ``total_tokens`` (known corpus stats) to skip the in-plan corpus
    aggregate — at scale those numbers come from table metadata, and an
    extra full scan per query is exactly what the ``n_estimate``
    pattern elsewhere avoids."""
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = docs.select(F.col(id_col).alias("_id"), tokens(text_col).alias("_tok"))
    exploded = toks.select(
        "_id", F.size("_tok").cast("long").alias("dl"), F.explode("_tok").alias("term")
    )
    matches = exploded.filter(F.col("term").isin(list(terms)))
    tf = matches.groupBy("_id", "term", "dl").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        matches.select("_id", "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    if n_docs is not None and total_tokens is not None:
        stats = docs.sparkSession.range(1).select(
            F.lit(n_docs).cast("long").alias("n_docs"),
            F.lit(total_tokens).cast("long").alias("total_dl"),
        )
    else:
        stats = toks.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("_tok").cast("long")).alias("total_dl"),
        )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "_id",
            _w_e6(
                F.col("tf").cast("double"),
                F.col("df").cast("double"),
                F.col("dl").cast("double"),
                F.col("n_docs").cast("double"),
                F.col("total_dl").cast("double"),
                k1,
                b,
            ).alias("w_e6"),
        )
    )
    per_doc = scored.groupBy("_id").agg(
        F.sum("w_e6").alias("score_e6"), F.count(F.lit(1)).alias("n_terms")
    )
    # distributed top-k (TakeOrderedAndProject), rank only the survivors
    top = per_doc.orderBy(F.col("score_e6").desc(), "_id").limit(k)
    w = Window.orderBy(F.col("score_e6").desc(), F.col("_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        F.col("_id").alias(id_col), "score_e6", "n_terms", "rank"
    )


def bm25_sql(
    table: str,
    terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`bm25_topk` (in-plan corpus stats form).
    The ``w_e6`` expression mirrors :func:`_w_e6` token for token."""
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    w_expr = (
        f"CAST(floor(1000000.0 * ("
        f"((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)"
        f" / (CAST(df AS DOUBLE) + 0.5))"
        f" * (CAST(tf AS DOUBLE) * ({k1} + 1.0))"
        f" / (CAST(tf AS DOUBLE) + {k1} * (1.0 - {b} + {b} *"
        f" (CAST(dl AS DOUBLE) / (CAST(total_dl AS DOUBLE)"
        f" / CAST(n_docs AS DOUBLE)))))"
        f")) AS BIGINT)"
    )
    return f"""
    toks AS (SELECT {id_col} AS _id, {tokens_sql(text_col)} AS _tok FROM {table}),
    stats AS (SELECT count(*) AS n_docs,
                     CAST(SUM(len(_tok)) AS BIGINT) AS total_dl FROM toks),
    m AS (SELECT _id, CAST(len(_tok) AS BIGINT) AS dl, unnest(_tok) AS term
          FROM toks),
    mt AS (SELECT * FROM m WHERE term IN ({term_list})),
    tf AS (SELECT _id, term, dl, count(*) AS tf FROM mt GROUP BY 1, 2, 3),
    dfreq AS (SELECT term, count(DISTINCT _id) AS df FROM mt GROUP BY term),
    w AS (SELECT _id, {w_expr} AS w_e6
          FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
    s AS (SELECT _id, CAST(SUM(w_e6) AS BIGINT) AS score_e6,
                 count(*) AS n_terms FROM w GROUP BY _id)
    SELECT _id AS {id_col}, score_e6, n_terms,
           CAST(ROW_NUMBER() OVER (ORDER BY score_e6 DESC, _id) AS INTEGER) AS rank
    FROM s QUALIFY rank <= {k}"""


# ---------------------------------------------------------------------------
# inverted-index build (capped posting lists)
# ---------------------------------------------------------------------------


def build_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    n_salts: int = 16,
) -> DataFrame:
    """Build the INVERTED INDEX a retrieval layer consumes: one row per
    (token, rank) with the token's exact document frequency and its
    ``k`` lowest doc ids as the capped posting sample — the
    index-construction step that lets repeated keyword queries
    (:func:`bm25_topk` audits, contamination probes) touch only their
    terms' postings instead of rescanning the corpus.

    100 TB shape: distinct (token, doc) pairs explode narrow; document
    frequency is one map-side-combined count. The capped posting list
    NEVER builds an unbounded per-token collect_list (a stop token's
    postings are corpus-sized — the partial aggregation state itself
    would be the OOM): the ``group_topk`` two-phase salted shape keeps
    every partial capped at ``k`` structs. The df join lands on the same
    token partitioning the aggregates produce.
    """
    from vaero_spark.operators.transforms import group_topk

    pairs = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
    )
    dfreq = pairs.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # smallest-k ids == top-k by (-id) DESC in the salted two-phase op
    low = group_topk(
        pairs.withColumn("_neg", -F.col("_id")),
        "token", "_neg", "_id", k=k, n_salts=n_salts,
    ).select("token", "rank", F.col("_id").alias(id_col))
    return low.join(dfreq, "token").select("token", "df", "rank", id_col)


def build_postings_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> str:
    """DuckDB twin of :func:`build_postings` — the window form (the
    salted plan is row-identical; the gate is the equivalence check)."""
    tok = tokens_sql(text_col)
    return f"""
    ix_pairs AS (
      SELECT {id_col} AS _id, unnest(list_distinct({tok})) AS token
      FROM {table}),
    ix_df AS (SELECT token, count(*) AS df FROM ix_pairs GROUP BY token),
    ix_ranked AS (
      SELECT token, _id,
             ROW_NUMBER() OVER (PARTITION BY token ORDER BY _id) AS rank
      FROM ix_pairs)
    SELECT r.token, d.df, CAST(r.rank AS INTEGER) AS rank, r._id AS {id_col}
    FROM ix_ranked r JOIN ix_df d USING (token)
    WHERE r.rank <= {k}"""


FP_SEARCH_MIN_SHARED = 2  # fingerprints shared before a hit is reported
FP_MAX_DF = 1000  # drop fingerprints present in more docs (boilerplate)


def fingerprint_search(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = FP_SEARCH_MIN_SHARED,
    max_fp_df: int = FP_MAX_DF,
) -> DataFrame:
    """Winnowing-fingerprint RETRIEVAL (the MOSS/plagiarism-detection
    query shape, Schleimer et al. SIGMOD'03 §4): given suspect
    documents, find every corpus document sharing >= ``min_shared``
    selected fingerprints — the "where did this text come from /
    who reuses it" probe a curation team runs on flagged documents.
    ``txt_fingerprint`` compares documents by identity digest; this op
    makes the underlying selected-hash SETS searchable.

    100 TB shape: an inverted index on the winnow-selected hashes (the
    ~2/w-sampled shingle space, far smaller than the full shingle
    index), with a document-frequency cap dropping boilerplate
    fingerprints (present in > ``max_fp_df`` docs — same blowup bound
    as the shingle index's stop-shingle cap); the suspect side is
    query-sized, so the equi-join on fp touches only the queries'
    postings; ONE groupBy on (query, doc) counts shared fingerprints.
    Never doc x doc.

    Output: (query_id, doc_id, n_shared) for hits with
    ``n_shared >= min_shared``, self-matches excluded.
    """
    from vaero_spark.functions.text import fingerprint_postings

    fps = fingerprint_postings(corpus, id_col, text_col)
    informative = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df")).filter(
        F.col("_df") <= max_fp_df
    )
    fps_i = fps.join(informative.select("fp"), "fp")
    qfps = fingerprint_postings(queries, id_col, text_col).select(
        F.col(id_col).alias("query_id"), "fp"
    )
    hits = (
        qfps.join(fps_i, "fp")
        .filter(F.col("query_id") != F.col(id_col))
        .groupBy("query_id", id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return hits


def fingerprint_search_sql(
    corpus_table: str,
    query_pred: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = FP_SEARCH_MIN_SHARED,
    max_fp_df: int = FP_MAX_DF,
) -> str:
    """DuckDB twin of :func:`fingerprint_search` (CTE-able SELECT;
    queries = corpus rows whose ``{id_col}`` satisfies
    ``query_pred``)."""
    from vaero_spark.functions.text import fingerprint_postings_sql

    return f"""
    fps AS ({fingerprint_postings_sql(corpus_table, id_col, text_col)}),
    fp_informative AS (
      SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {max_fp_df}),
    fps_i AS (SELECT f.* FROM fps f JOIN fp_informative USING (fp)),
    qfps AS (SELECT {id_col} AS query_id, fp FROM fps WHERE {query_pred})
    SELECT q.query_id, c.{id_col}, CAST(count(*) AS BIGINT) AS n_shared
    FROM qfps q JOIN fps_i c USING (fp)
    WHERE q.query_id != c.{id_col}
    GROUP BY 1, 2
    HAVING count(*) >= {min_shared}"""
