"""Document / embedding / media corpus sources.

Loads the driver-generated ``documents`` and ``embeddings`` parquet
tables (TESTDATA.md) and derives deterministic test variants from them:

- ``documents_nd``  — documents plus planted near-duplicates (every 10th
  doc re-appears under ``doc_id + ND_OFFSET`` with one appended token),
  the fixture for MinHash/SimHash/Jaccard near-dup detection.
- ``embeddings_nd`` — embeddings plus planted exact duplicates (every
  50th vector re-appears under ``vec_id + ND_OFFSET``), the fixture for
  embedding-based dedup.
- ``media``         — a multimodal table derived from documents: the
  UTF-8 bytes of ``text`` stand in for image/audio/video payloads
  (``binary`` column) with typed metadata, so the Arrow/pandas-UDF
  plumbing for binary columns is real even though actual codecs are
  stubbed (no image/audio libs in this container).

Every derivation is a pure function of the parquet tables, duplicated
as a DuckDB CTE so the driver's oracle rebuilds the identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ND_OFFSET = 100_000
DOC_ND_EVERY = 10  # every 10th doc gets a planted near-dup
EMB_ND_EVERY = 50  # every 50th vector gets a planted exact dup
ND_TOKEN = "vaero"  # appended token for the planted near-dup
EMB_QUANT = 1_000_000  # embedding quantization (1e-6) for exact int math

_MEDIA_KINDS = ["image", "audio", "video"]


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def documents_with_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_documents(spark, sf_dir)
    nd = (
        d.filter(F.col("doc_id") % DOC_ND_EVERY == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(ND_OFFSET))
        .withColumn("text", F.concat("text", F.lit(f" {ND_TOKEN}")))
    )
    return d.unionByName(nd)


DOCUMENTS_ND_ORACLE_CTE = f"""
documents_nd AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + {ND_OFFSET} AS doc_id, text || ' {ND_TOKEN}' AS text,
         lang, source, n_chars
  FROM documents WHERE doc_id % {DOC_ND_EVERY} = 0
)
""".strip()


def embeddings_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_embeddings(spark, sf_dir)
    nd = e.filter(F.col("vec_id") % EMB_ND_EVERY == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(ND_OFFSET)
    )
    return e.unionByName(nd)


EMBEDDINGS_ND_ORACLE_CTE = f"""
embeddings_nd AS (
  SELECT * FROM embeddings
  UNION ALL
  SELECT vec_id + {ND_OFFSET} AS vec_id, embedding, label
  FROM embeddings WHERE vec_id % {EMB_ND_EVERY} = 0
)
""".strip()


def quantized(col, scale: int = EMB_QUANT):
    """float array → exact int64 array: ``floor(x * scale)`` per element.

    All downstream similarity math (dot products, norms) runs on these
    integers, so results are order-independent and bit-identical across
    engines — float reduction order never matters.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long")
    )


def quantized_sql(col: str = "embedding", scale: int = EMB_QUANT) -> str:
    return (
        f"list_transform(CAST({col} AS DOUBLE[]), "
        f"x -> CAST(floor(x * {scale}.0) AS BIGINT))"
    )


def load_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal table: opaque binary payload + typed metadata.

    Payload = UTF-8 bytes of the document text (ASCII in the synthetic
    corpus, so byte offsets == char offsets and the DuckDB oracle can
    address the same bytes with ``substr``). Width/height/duration are
    planted deterministic metadata.
    """
    d = load_documents(spark, sf_dir)
    return d.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(k) for k in _MEDIA_KINDS]),
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.lit(64) + F.pmod(F.col("doc_id"), F.lit(512))).cast("int").alias("width"),
        (F.lit(64) + F.pmod(F.col("doc_id") * 3, F.lit(512))).cast("int").alias("height"),
        "text",  # kept only so the oracle can hash the same bytes
    )


MEDIA_ORACLE_CTE = """
media AS (
  SELECT doc_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
         text,
         CAST(64 + doc_id % 512 AS INTEGER) AS width,
         CAST(64 + (doc_id * 3) % 512 AS INTEGER) AS height
  FROM documents
)
""".strip()
