"""Approximate-nearest-neighbor similarity search over embedding columns.

Three tiers (none exist in the reference — SURVEY.md §2.6):

- :func:`cosine_topk_brute` — exact brute-force top-k: broadcast the
  (small) query set against the corpus; one narrow pass + a per-query
  top-k. The correctness baseline, and the right plan whenever
  |queries| is broadcastable.
- :func:`cosine_topk_bucketed` — multi-band sign LSH: the 64 coordinate
  signs are split into 4 bands of 16 bits; a pair is a candidate if it
  collides in ANY band (the OR construction). One shuffle on the band
  key; each band has 2^16 buckets, so expected within-bucket work is
  (N/65536)² per band — bounded at scale, unlike a single small-bucket
  scheme. (Sign-of-coordinate is the simplest hyperplane family; it
  keeps the DuckDB oracle exact.)
- :func:`cosine_topk_hyperplane` — random-hyperplane LSH with a
  broadcast plane matrix in a vectorized pandas UDF (numpy matmul per
  Arrow batch). The production ANN path; Spark-only (float matmul has
  no bit-stable SQL twin), tested against the brute-force baseline.

All oracle-checked variants quantize embeddings to int64 (1e-6 grid)
and do integer dot products / norms, so scores and rankings are
order-independent and bit-identical across engines; the only floats are
single IEEE sqrt/div ops applied identically in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vaero_spark.sources.corpus import quantized

# Sign-LSH banding: bits/band is the precision↔recall knob (collision
# prob per band ≈ (1 − θ/π)^bits). Near-dup DEDUP (cos ≥ 0.99 ⇒ nearly
# all signs equal) affords long bands; ANN over a diffuse corpus (true
# neighbors ~60-70° apart) needs short bands + more of them. Both use
# all 64 dims; bits also sizes the buckets (2^bits per band), i.e. at
# larger corpora raise bits to keep within-bucket pair work bounded.
SIGN_BANDS = 4  # dedup: 4 bands × 16 bits
SIGN_BAND_BITS = 16
ANN_SIGN_BANDS = 8  # ANN: 8 bands × 8 bits
ANN_SIGN_BAND_BITS = 8


def ivf_params_for(n_estimate: int, probe_frac_denom: int = 8) -> tuple[int, int]:
    """(n_centroids, n_probe) for an estimated corpus of ``n_estimate``
    vectors: the standard IVF sizing ``nlist ≈ √N`` (balances
    assignment cost N·nlist against per-query scan nprobe·N/nlist),
    probing ``nlist/probe_frac_denom`` cells (≥12, ≤64 — per-query
    candidates stay ≈ ``64·√N``, sublinear in N). Clamped to
    [16, 65536] centroids. The probe floor is 12, matching the
    recall-oriented call default (VERDICT r5 #7: defaults must clear
    recall@5 ≥ 0.8 on the bench corpus): the bench corpus is DIFFUSE
    (near-orthogonal true neighbors — the IVF worst case, where recall
    ≈ the probed fraction: measured 0.44 at 4/16, 0.76 at 8/16,
    ``BENCH/scale_ops_r5.json``), so the small-N floor probes 12/16 =
    3/4 of the cells; at scale the ``nlist/8`` fraction shrinks as
    designed because real embedding corpora are clustered, not
    adversarially diffuse — callers keep the explicit ``n_probe`` knob
    for the precision end of the trade."""
    import math

    if n_estimate < 1:
        raise ValueError(f"n_estimate must be >= 1, got {n_estimate}")
    n_centroids = min(max(16, round(math.sqrt(n_estimate))), 65536)
    n_probe = min(max(12, n_centroids // probe_frac_denom), 64)
    return n_centroids, n_probe


def hyperplane_params_for(
    n_estimate: int, target_occupancy: int = 1024
) -> tuple[int, int]:
    """(n_planes, n_tables) for an estimated corpus: planes = the bits
    of one table's bucket id, sized exactly like the sign-band widths
    (smallest count keeping expected bucket occupancy ``N/2^planes ≤
    target``, clamped to [4, 24]); tables = 12, the measured
    recall-oriented multiplicity (recall@5 0.89-0.93 on the diffuse
    bench corpus, ``BENCH/scale_ops_r4.json``) — raise it for more
    recall at proportional candidate cost."""
    import math

    if n_estimate < 1:
        raise ValueError(f"n_estimate must be >= 1, got {n_estimate}")
    planes = min(
        max(4, math.ceil(math.log2(max(n_estimate / target_occupancy, 1.0)))), 24
    )
    return planes, 12


def _int_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _with_quant(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    q = quantized(vec_col)
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        q.alias(f"{prefix}_q"),
        _int_dot(q, q).alias(f"{prefix}_nsq"),
    )


def _sim_e4(dot, nsq_a, nsq_b):
    """floor(1e4 * cosine) — exact ints into IEEE sqrt/div, identical in
    any engine."""
    return F.floor(
        F.lit(10000.0) * dot.cast("double") / (F.sqrt(nsq_a.cast("double")) * F.sqrt(nsq_b.cast("double")))
    ).cast("bigint")


def cosine_topk_brute(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded).

    Queries are broadcast; the corpus is scanned once (narrow); ranking
    is a window partitioned by query — shuffle size is |corpus|·|queries|
    scored rows, controlled by keeping the query set small/broadcastable.
    """
    c = _with_quant(corpus, id_col, vec_col, "n")
    q = _with_quant(queries, id_col, vec_col, "q")
    scored = (
        c.join(F.broadcast(q), F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            _sim_e4(_int_dot(F.col("q_q"), F.col("n_q")), F.col("q_nsq"), F.col("n_nsq")).alias(
                "sim_e4"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim_e4").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            "sim_e4",
        )
    )


def cosine_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = ANN_SIGN_BANDS,
    bits: int = ANN_SIGN_BAND_BITS,
    n_estimate: int | None = None,
) -> DataFrame:
    """Approximate top-k: score pairs colliding in ≥1 sign band.

    Candidate generation carries only (id, band_key) — the exploded
    band table is narrow, the equi-join on the band key is the only
    data-sized shuffle, and vectors are fetched back by id AFTER the
    distinct, so the ×bands explosion never moves the embedding arrays.
    Expected work per band is |corpus|·|queries|/2^bits; AQE handles
    band-bucket skew. Pass ``n_estimate`` (known corpus cardinality —
    no counting job) to auto-size (bands, bits) for the corpus scale
    via :func:`~vaero_spark.functions.lsh_tuning.auto_band_bits`
    instead of the 8×8 default.
    """
    if n_estimate is not None:
        from vaero_spark.functions.lsh_tuning import auto_band_bits

        bands, bits = auto_band_bits(
            n_estimate, total_bits=bands * bits, min_bits=ANN_SIGN_BAND_BITS
        )
    c = _with_quant(corpus, id_col, vec_col, "n")
    q = _with_quant(queries, id_col, vec_col, "q")
    cb = c.select(
        "n_id", F.explode(sign_band_keys_from_quant("n_q", bands, bits)).alias("bk")
    )
    qb = q.select(
        "q_id", F.explode(sign_band_keys_from_quant("q_q", bands, bits)).alias("bk_q")
    )
    cand = (
        qb.join(cb, (F.col("bk_q") == F.col("bk")) & (F.col("q_id") != F.col("n_id")))
        .select("q_id", "n_id")
        .distinct()  # OR across bands
    )
    scored = (
        cand.join(q, "q_id")
        .join(c, "n_id")
        .select(
            "q_id",
            "n_id",
            _sim_e4(_int_dot(F.col("q_q"), F.col("n_q")), F.col("q_nsq"), F.col("n_nsq")).alias(
                "sim_e4"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim_e4").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            "sim_e4",
        )
    )


def sign_band_keys_from_quant(
    qvec_col: str, bands: int = SIGN_BANDS, bits: int = SIGN_BAND_BITS
):
    """Array of ``bands`` band keys from the already-quantized int
    vector: key = band_idx·2^bits + sign-bit pattern of that band's
    coordinates. Sign is preserved by floor-quantization for |x| ≥ 1e-6;
    using the same source on both engines keeps boundary cases
    identical. Exact duplicates collide in every band by construction.

    Keys are BIGINT: ``auto_band_bits`` picks 2×32-bit bands for corpus
    estimates ≳7e7 (``functions/lsh_tuning.py``), and at bits=32 the key
    ``band_idx·2^32 + pattern`` overflows int32 — under Spark 4's ANSI
    mode an int cast then throws CAST_OVERFLOW at exactly the scales the
    auto-sizing exists for (and with ANSI off it would silently merge
    band keyspaces). Mirrored in :func:`sign_band_keys_sql`; pinned by
    ``tests/test_lsh_tuning.py``'s wide-band key-build test."""
    c = F.col(qvec_col)
    keys = []
    for b in range(bands):
        out = F.lit(b * (1 << bits)).cast("bigint")
        for p in range(bits):
            out = out + F.when(
                F.element_at(c, b * bits + p + 1) > 0, F.lit(1 << p).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
        keys.append(out.cast("bigint"))
    return F.array(*keys)


def sign_band_keys_sql(
    qvec: str, bands: int = SIGN_BANDS, bits: int = SIGN_BAND_BITS
) -> str:
    """DuckDB twin of :func:`sign_band_keys_from_quant` (a BIGINT list —
    see the Spark side for why int32 overflows at auto-sized 32-bit
    bands)."""
    keys = []
    for b in range(bands):
        terms = " + ".join(
            f"CASE WHEN ({qvec})[{b * bits + p + 1}] > 0 THEN {1 << p} ELSE 0 END"
            for p in range(bits)
        )
        keys.append(f"CAST({b * (1 << bits)} + {terms} AS BIGINT)")
    return "[" + ", ".join(keys) + "]"


def _exact_cosine_rank(cand: DataFrame, k: int) -> DataFrame:
    """Shared re-rank tail for the float ANN paths: exact cosine over
    candidate (q_id, q_vec, n_id, n_vec) rows, per-query top-k.

    Scored with a vectorized numpy pandas UDF rather than nested
    higher-order Column functions: zip_with-inside-aggregate is exactly
    the nested-HOF codegen shape that returned wrong values in
    long-lived Spark 4.1.2 sessions (CLAUDE.md invariant) — and these
    float queries have no SQL oracle to catch a silent regression. The
    Arrow-batched matmul is also the faster path.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(q, n):
        A = np.vstack(q.to_numpy()).astype("float64")
        B = np.vstack(n.to_numpy()).astype("float64")
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pd.Series(num / np.where(den == 0.0, 1.0, den))

    _cos.__annotations__ = {"q": pd.Series, "n": pd.Series, "return": pd.Series}
    cos_udf = pandas_udf(_cos, "double")

    scored = cand.select(
        "q_id", "n_id", cos_udf(F.col("q_vec"), F.col("n_vec")).alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            "sim",
        )
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 12,
    n_estimate: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN — the other production scale path next to
    LSH: coarse-quantize the corpus into ``n_centroids`` spherical
    cells, keep an inverted list per cell, and probe only the
    ``n_probe`` nearest cells per query, exact-cosine re-ranking the
    union of those lists. Expected candidate work per query =
    ``n_probe/n_centroids`` of the corpus; recall follows the probe
    count (identical vectors share a nearest centroid, so exact dups
    are always retrieved at any ``n_probe ≥ 1``).

    Centroids here are a deterministic hash-ordered sample of corpus
    vectors, unit-normalized (a k-means-free coarse quantizer — one
    bounded collect of ``n_centroids`` rows, the model-fitting step;
    capped at 65536 even under ``n_estimate`` auto-sizing ≈ 16 MB of
    float64 at dim 64, i.e. model-sized, and broadcast to workers via
    the UDF closure. Production swaps in ``pyspark.ml.clustering.
    KMeans`` centers without touching the rest of the plan).
    Assignment is a vectorized numpy matmul per Arrow batch. Pass
    ``n_estimate`` to size (n_centroids, n_probe) by the √N rule
    (:func:`ivf_params_for`). Spark-only (float math has no bit-stable
    SQL twin); verified against brute force in tests like the
    hyperplane path.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if n_estimate is not None:
        n_centroids, n_probe = ivf_params_for(n_estimate)

    cents = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_centroids)
        .collect()
    )
    C = np.vstack([np.asarray(r[1], dtype="float64") for r in cents])
    C = C / (np.linalg.norm(C, axis=1, keepdims=True) + 1e-12)  # spherical

    def _cells(v, n):
        mat = np.vstack(v.to_numpy()).astype("float64")
        mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)
        sims = mat @ C.T  # (batch, n_centroids)
        top = np.argsort(-sims, axis=1)[:, :n].astype("int32")
        return top

    def _assign(v):
        return pd.Series(_cells(v, 1)[:, 0])

    def _probes(v):
        return pd.Series(list(_cells(v, n_probe)))

    _assign.__annotations__ = {"v": pd.Series, "return": pd.Series}
    _probes.__annotations__ = {"v": pd.Series, "return": pd.Series}
    assign_udf = pandas_udf(_assign, "int")
    probes_udf = pandas_udf(_probes, "array<int>")

    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        assign_udf(F.col(vec_col)).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(probes_udf(F.col(vec_col))).alias("cell"),
    )
    cand = (
        q.join(c, (q.cell == c.cell) & (F.col("n_id") != F.col("q_id")))
        .select("q_id", "q_vec", "n_id", "n_vec")
        .dropDuplicates(["q_id", "n_id"])
    )
    return _exact_cosine_rank(cand, k)


def cosine_topk_hyperplane(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    dim: int = 64,
    n_estimate: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH ANN (production path, Spark-only).

    Defaults are the RECALL-oriented config (4 planes × 12 tables):
    measured recall@5 on the diffuse bench corpus is 0.89 here vs 0.20
    at the old precision-oriented 8×6 (``BENCH/scale_ops_r4.json``) — a
    user calling with defaults should get useful neighbors, not minimal
    candidate counts. 4 planes means only 16 buckets/table, so for any
    real corpus pass ``n_estimate``: :func:`hyperplane_params_for`
    widens planes with log2(N) (bounded bucket occupancy) while keeping
    the 12-table recall multiplicity.

    Standard multi-table LSH (Indyk–Motwani shape): ``n_tables``
    independent hash tables, each hashing a vector to the sign pattern
    of ``n_planes`` seeded-Gaussian hyperplane projections — one numpy
    matmul per Arrow batch inside a pandas UDF (vectorized, no per-row
    Python). A pair is a candidate if it collides in ANY table (the OR
    construction — recall grows with tables, bucket work stays
    |bucket|-local); exact cosine re-ranks candidates. Verified against
    brute force in tests, not against the SQL oracle (float matmul has
    no bit-stable SQL twin).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if n_estimate is not None:
        n_planes, n_tables = hyperplane_params_for(n_estimate)

    rng = np.random.default_rng(seed)
    # (dim, n_tables * n_planes): table t owns columns [t*p, (t+1)*p)
    planes = rng.standard_normal((dim, n_tables * n_planes)).astype("float64")
    weights = (1 << np.arange(n_planes)).astype("int64")

    def _hp(v):
        mat = np.vstack(v.to_numpy())  # (batch, dim)
        signs = (mat @ planes) > 0  # (batch, tables*planes)
        # bucket id per table, offset so tables never collide
        per_table = [
            signs[:, t * n_planes : (t + 1) * n_planes] @ weights + (t << n_planes)
            for t in range(n_tables)
        ]
        return pd.Series(list(np.stack(per_table, axis=1).astype("int64")))

    # real annotation objects (PEP-563 string hints break UDF inference)
    _hp.__annotations__ = {"v": pd.Series, "return": pd.Series}
    hp_buckets = pandas_udf(_hp, "array<long>")

    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        F.explode(hp_buckets(F.col(vec_col))).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(hp_buckets(F.col(vec_col))).alias("bucket"),
    )
    cand = (
        c.join(q, (c.bucket == q.bucket) & (F.col("n_id") != F.col("q_id")))
        .select("q_id", "q_vec", "n_id", "n_vec")
        .dropDuplicates(["q_id", "n_id"])  # OR across tables
    )
    return _exact_cosine_rank(cand, k)


def ann_recall_at_k(
    exact: DataFrame, approx: DataFrame, k: int = 5
) -> DataFrame:
    """RETRIEVAL EVALUATION as a first-class op: per-query recall@k of
    an approximate ranking against the exact one, in basis points —
    the measurement loop that tunes LSH band/table and IVF probe
    parameters runs IN the engine instead of collecting rankings to the
    driver (``BENCH/scale_ops_*.json`` measures the same number out of
    band; this makes it a queryable table a pipeline can gate on).

    Both inputs are (query_id, neighbor_id, rank, …) top-k tables.
    ``n_hits`` counts exact neighbors the approximate ranking also
    returned (set intersection — rank positions don't matter for
    recall); ``recall_bp = 10000·n_hits div k``. Pure BIGINT.

    100 TB shape: the rankings are the expensive part and already
    model-sized (k rows per query); this is ONE equi-join on
    (query, neighbor) + ONE groupBy(query) over k·|Q| rows.
    """
    a = approx.select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    j = exact.select("query_id", "neighbor_id").join(
        a, ["query_id", "neighbor_id"], "left"
    )
    return (
        j.groupBy("query_id")
        .agg(F.count("_hit").alias("n_hits"))
        .withColumn("recall_bp", F.expr(f"(10000 * n_hits) div {k}"))
    )
