"""Corpus clustering: distributed Lloyd's k-means over an embedding
column — the topic-bucketing / corpus-organization op of a
training-data pipeline (stratify training mixes by cluster, inspect
corpus composition, seed IVF coarse quantizers).

No reference counterpart (SURVEY.md §2.7; the reference has no vector
ops at all). Spark-first shape, per iteration:

- **assignment**: one vectorized numpy matmul per Arrow batch against
  the broadcast centroid matrix (pandas UDF — centroids are model-sized,
  k·dim floats, shipped in the UDF closure like the IVF quantizer);
- **update**: `posexplode` the vectors of each cluster → `groupBy
  (cluster, dim)` average → k·dim rows collected to the driver (the
  model update — MLlib's own KMeans aggregates per-cluster sums to the
  driver the same way; bounded by k·dim, never data-sized);
- **convergence**: the changed-assignment count rides the SAME job as
  the assignment materialization via ``observe`` + a join with the
  previous labels (the `neardup_clusters` pattern — no extra probe
  job), with a per-round ``localCheckpoint`` truncating the iterative
  lineage (the 2^k re-evaluation trap, see CLAUDE.md).

Determinism: centroid init is a hash-ordered sample (xxhash64 of id),
assignment ties break to the LOWEST cluster index, and means are
computed in float64 — the same inputs give the same clustering on any
partitioning. Spark-only (iterative float math has no bit-stable SQL
twin); pytest verifies against a same-seed numpy reference
implementation and the fixed points (k == n, duplicate vectors
co-cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def embed_kmeans(
    df: DataFrame,
    k: int = 8,
    max_iters: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster) after Lloyd's k-means with cosine/unit-sphere
    geometry (vectors are L2-normalized once; nearest centroid by dot
    product). Runs to convergence (zero reassignments) or
    ``max_iters``; k is clamped to the corpus size."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    seed_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(k)
        .collect()
    )
    C = np.vstack([np.asarray(r[1], dtype="float64") for r in seed_rows])
    C = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)

    from vaero_spark.operators.checkpoints import CheckpointTracker

    base = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    trk = CheckpointTracker(df.sparkSession)
    labels = None
    for it in range(max_iters):
        C_now = C  # bind the loop variable for the UDF closure

        def _assign(v: pd.Series) -> pd.Series:
            if len(v) == 0:  # empty Arrow batch
                return pd.Series([], dtype="int32")
            mat = np.vstack(v.to_numpy()).astype("float64")
            mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)
            sims = mat @ C_now.T
            # argmax returns the FIRST (lowest) index on ties: determinism
            return pd.Series(np.argmax(sims, axis=1).astype("int32"))

        _assign.__annotations__ = {"v": pd.Series, "return": pd.Series}
        assign_udf = pandas_udf(_assign, "int")

        assigned = base.withColumn("cluster", assign_udf(F.col("vec")))
        if labels is None:
            new_labels = assigned.select("vec_id", "vec", "cluster").localCheckpoint()
            changed = None
        else:
            obs = Observation(f"kmeans_round_{it}")
            new_labels = (
                assigned.join(
                    labels.select("vec_id", F.col("cluster").alias("prev")), "vec_id"
                )
                .observe(
                    obs,
                    F.sum((F.col("cluster") != F.col("prev")).cast("long")).alias(
                        "changed"
                    ),
                )
                .select("vec_id", "vec", "cluster")
                .localCheckpoint()
            )
            changed = obs.get["changed"]
        trk.round_done()  # releases the superseded round's blocks
        labels = new_labels
        if changed == 0:
            break
        # model update: per-cluster mean, k*dim rows to the driver
        means = (
            labels.select("cluster", F.posexplode("vec").alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        C_new = C.copy()  # empty clusters keep their old centroid
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        for c, dims in by_cluster.items():
            vec = np.array([dims[d] for d in sorted(dims)], dtype="float64")
            C_new[c] = vec / (np.linalg.norm(vec) + 1e-12)
        C = C_new
    trk.finish()
    return labels.select("vec_id", "cluster")


def centroid_sums(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-class CENTROID SUFFICIENT STATISTICS over an embedding
    table: for every (label, dimension), the exact sum of the
    1e-6-quantized vector components plus the class size — the
    map-side-combinable statistic behind centroid classifiers,
    per-class mean embeddings, and k-means seeding (divide sum by
    count downstream; the SUM is kept so the op stays integer-exact
    across engines, the repo parity rule — float mean reduction order
    would differ).

    100 TB shape: quantize narrow, posexplode to (label, dim, q) —
    row count = vectors × dims but each row is 3 integers — then ONE
    map-side-combined groupBy(label, dim); the result is
    model-sized (classes × dims), never data-sized. Long format on
    purpose: no per-group array reassembly, no collect_list state.

    Output: (label, dim_idx, sum_q, n_vecs) — ``dim_idx`` 0-based.
    """
    from vaero_spark.sources.corpus import quantized

    q = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(quantized(vec_col)).alias("dim_idx", "_q"),
    )
    return (
        q.groupBy("label", "dim_idx")
        .agg(
            F.sum("_q").alias("sum_q"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .select(
            "label",
            # posexplode yields int32; the DuckDB twin's generate_series
            # yields BIGINT — align the dtype explicitly
            F.col("dim_idx").cast("bigint").alias("dim_idx"),
            "sum_q",
            "n_vecs",
        )
    )


def centroid_sums_sql(
    table: str = "embeddings",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`centroid_sums` (standalone SELECT).
    Parallel unnests zip (DuckDB 1.0 has no WITH ORDINALITY); SUM cast
    OUTSIDE the aggregate (HUGEINT rule); dim_idx shifts to 0-based to
    match ``posexplode``."""
    from vaero_spark.sources.corpus import quantized_sql

    qexpr = quantized_sql(vec_col)
    return f"""
    SELECT label, dim_idx,
           CAST(SUM(_q) AS BIGINT) AS sum_q,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM (
      SELECT {label_col} AS label,
             unnest(generate_series(0, len(qv) - 1)) AS dim_idx,
             unnest(qv) AS _q
      FROM (SELECT {label_col}, {qexpr} AS qv FROM {table}))
    GROUP BY 1, 2"""
