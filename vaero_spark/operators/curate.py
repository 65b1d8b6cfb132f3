"""Training-data curation: the composed keep/reject decision of an LLM
data pipeline (quality score + language + token-length gates), and the
apply-step of near-dup deduplication (keep one canonical doc per
cluster).

These close the loop the individual §2.7 operators open: ``txt_quality``
/ ``txt_langid`` / ``dedup_clusters`` DECIDE; these ops APPLY the
decision to produce the kept corpus — what a user actually feeds a
training run. (No reference counterpart — the reference's closest
construct is the per-event ``filter_regexp`` drop,
``/root/reference/transform/filter.go``; SURVEY.md §2.7.)

100 TB shape: ``curate_documents`` is a narrow projection + filter over
one tokenize pass (shuffle-free, whole-stage codegen — the module
PERFORMANCE RULE: tokenize ONCE into a column, never per-expression);
``neardup_keep`` is the MinHash+LSH cluster pipeline plus ONE left-anti
join on doc_id (broadcast-able: the drop-list is cluster members minus
canonicals, a tiny fraction of any real corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vaero_spark.functions.text import lang_id, quality_columns, tokens


def curate_documents(
    df: DataFrame,
    min_quality_bp: int = 3000,
    langs: tuple[str, ...] = ("en",),
    min_tokens: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-gate a document corpus: keep docs with ``quality_bp ≥
    min_quality_bp``, predicted language in ``langs``, and at least
    ``min_tokens`` whitespace tokens. Returns (id, pred_lang, n_tokens,
    quality_bp) for the kept docs — integer/string-only output, exact
    across engines."""
    tok = tokens(text_col)
    out = df.withColumn("_tok", tok)
    q = quality_columns(text_col, tok=F.col("_tok"))
    out = (
        out.withColumn("n_tokens", q["n_tokens"])
        .withColumn("quality_bp", q["quality_bp"])
        .withColumn("pred_lang", lang_id(text_col, tok=F.col("_tok")))
        .drop("_tok")
    )
    return out.filter(
        (F.col("quality_bp") >= min_quality_bp)
        & F.col("pred_lang").isin(*langs)
        & (F.col("n_tokens") >= min_tokens)
    ).select(id_col, "pred_lang", "n_tokens", "quality_bp")


def neardup_keep(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard_pct: int = 50,
) -> DataFrame:
    """Apply the near-dup clustering decision: every document that is a
    NON-CANONICAL member of a near-dup cluster (``doc_id != cluster_id``
    in :func:`~vaero_spark.operators.dedup.neardup_clusters`) is
    dropped; canonical keepers and non-participants survive. Returns
    (id, text_md5) — the kept corpus as a compact manifest."""
    from vaero_spark.operators.dedup import neardup_clusters

    drop = (
        neardup_clusters(df, id_col, text_col, min_jaccard_pct)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select(F.col("doc_id").alias(id_col))
    )
    return df.join(F.broadcast(drop), id_col, "left_anti").select(
        id_col, F.md5(text_col).alias("text_md5")
    )
