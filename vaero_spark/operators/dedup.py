"""Deduplication operators for the training-data pipeline.

Five families, each the idiomatic distributed shape (the reference has
only a cursor ``>=`` late-event gate, ``/root/reference/integrations/
python/source_okta.py:91-113`` — none of these exist there; SURVEY.md
§2.6):

- **exact**        — hash-groupBy on md5(text); one shuffle on the hash.
- **MinHash+LSH**  — per-row signatures (narrow), explode band keys,
  shuffle once on band key, candidate pairs from bucket self-join,
  exact-Jaccard verification via a shingle inverted index. This is the
  standard shape that scales to 10^12 docs: no all-pairs anywhere; work
  is proportional to colliding candidates only.
- **SimHash**      — per-row 64-bit signature (narrow), band join on
  16-bit sub-bands, Hamming-distance verification with ``bit_count``.
- **n-gram Jaccard** — inverted index on shingles (stop-shingles
  dropped) → pair intersection counts → exact Jaccard filter.
- **embedding**    — exact/near dup via md5 of the int-quantized vector
  (hash-groupBy; no pairwise math at all).

All similarity arithmetic is integer (intersection/union counts,
quantized vectors, md5 hex), so the DuckDB oracle reproduces results
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from vaero_spark.functions.text import (
    MINHASH_BANDS,
    MINHASH_N,
    band_keys,
    minhash_agg,
    shingles,
    simhash_agg,
    tokens,
)
from vaero_spark.sources.corpus import quantized

# Shingles present in more than this many docs are "stop shingles":
# they connect everything to everything while carrying no dedup signal.
# An ABSOLUTE document-frequency cap (standard inverted-index practice)
# bounds the candidate pairs any one shingle can generate at O(cap²)
# regardless of corpus size — a fractional cap (0.2·N) would let a
# single common shingle emit (0.2N)² pairs, ~4×10¹⁶ at 10⁹ docs — and
# needs no corpus-wide count() action to compute.
STOP_SHINGLE_MAX_DF = 50

# Passage length (tokens) for duplicate-passage coverage: longer than
# the 3-word dedup shingle — passage copying is a long-span phenomenon
# and short spans saturate over formulaic text (see
# :func:`dup_passage_coverage`).
PASSAGE_K = 8

# The shingle inverted index each LSH op builds is persisted (it feeds
# both candidate generation and exact verification — a diamond), but the
# op returns a LAZY DataFrame, so it cannot unpersist after its own
# execution. Ownership is managed here instead: each new op invocation
# releases the previous op's index, bounding storage memory to ONE
# lingering index per session instead of one per invocation (and without
# nuking unrelated user caches the way ``spark.catalog.clearCache()``
# does). Call :func:`release_caches` to drop the last one eagerly.
_ACTIVE_CACHES: list = []


def release_caches() -> None:
    """Unpersist intermediates registered by previous dedup-op calls.
    Safe while their result DataFrames are still live — unpersist only
    costs recompute, never correctness."""
    while _ACTIVE_CACHES:
        _ACTIVE_CACHES.pop().unpersist()


def _persist_managed(df: DataFrame, keep_existing: bool = False) -> DataFrame:
    """``keep_existing=True`` registers an ADDITIONAL cache for the
    current op (e.g. the pair graph on top of the shingle index) without
    releasing the ones the same invocation already holds."""
    if not keep_existing:
        release_caches()
    df.persist()
    _ACTIVE_CACHES.append(df)
    return df


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per distinct text (hash-groupBy — one shuffle
    on md5(text), never on the full text bytes)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
        .select(id_col, "text_md5", "n_copies")
    )


def doc_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle) pairs, distinct per doc."""
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles(tokens(text_col)))).alias("shingle")
    )


def pair_jaccard(cand: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs (id_a, id_b) using the shingle
    inverted index ``sh`` = (doc_id, shingle) distinct. Integer output:
    (id_a, id_b, inter, union_n)."""
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingle").alias("shingle_b"))
    inter = (
        cand.join(a, "id_a")
        .join(b, (cand.id_b == b.id_b) & (F.col("shingle") == F.col("shingle_b")))
        .groupBy("id_a", cand.id_b)
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(
            sizes.select(F.col("doc_id").alias("id_b2"), F.col("n_sh").alias("n_b")),
            F.col("id_b") == F.col("id_b2"),
        )
        .select(
            "id_a",
            "id_b",
            "inter",
            (F.col("n_a") + F.col("n_b") - F.col("inter")).alias("union_n"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard_pct: int = 50,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.

    Plan shape: narrow signature computation → explode 4 band keys →
    shuffle on band key (the only data-sized shuffle) → bucket
    self-join → verify. Hot buckets are bounded by banding (a bucket
    only holds docs agreeing on 3 minhashes).
    """
    # one shingle inverted index feeds BOTH the signatures and the
    # exact-Jaccard verification — persist the diamond root so its
    # (expensive) construction runs once (managed: see _persist_managed)
    sh = _persist_managed(doc_shingles(df, id_col, text_col))
    sig = minhash_agg(sh, "doc_id", MINHASH_N)
    bands = sig.select(
        "doc_id", F.explode(band_keys(F.col("sig"), MINHASH_BANDS, MINHASH_N)).alias("bk")
    )
    left = bands.select(F.col("doc_id").alias("id_a"), "bk")
    right = bands.select(F.col("doc_id").alias("id_b"), F.col("bk").alias("bk_b"))
    cand = (
        left.join(right, (F.col("bk") == F.col("bk_b")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
        .distinct()
    )
    verified = pair_jaccard(cand, sh)
    return verified.filter(
        F.lit(100) * F.col("inter") >= F.lit(min_jaccard_pct) * F.col("union_n")
    )


def minhash_cross_pairs(
    ref_df: "DataFrame",
    new_df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard_pct: int = 50,
) -> "DataFrame":
    """CROSS-SNAPSHOT near-dup mining: which NEW docs near-duplicate a
    doc already in the REFERENCE snapshot — :func:`dedup_against`'s
    near-dup sibling (that one drops exact by-content repeats; this
    catches the lightly-edited recrawl copies that survive it), and the
    incremental form of :func:`minhash_lsh_pairs` (self-join finds
    within-corpus pairs; a recurring pipeline only needs new×ref).

    Ids must be DISJOINT across the two snapshots (the verification
    index unions both sides by id; the gate shifts new ids).

    100 TB shape: each side computes signatures independently (same
    seeded hash family, so band keys agree), then ONE band-key equi-join
    between the sides — cross pairs only BY CONSTRUCTION, no side
    column, no post-filter, and the join never revisits ref×ref (the
    dominant cost of re-running the self-join per crawl). Verification
    reuses the shared shingle inverted index over the union.
    """
    sh_ref = _persist_managed(doc_shingles(ref_df, id_col, text_col))
    sh_new = _persist_managed(
        doc_shingles(new_df, id_col, text_col), keep_existing=True
    )
    bands = lambda sh, out: minhash_agg(sh, "doc_id", MINHASH_N).select(  # noqa: E731
        F.col("doc_id").alias(out),
        F.explode(band_keys(F.col("sig"), MINHASH_BANDS, MINHASH_N)).alias(
            "bk" if out == "id_a" else "bk_b"
        ),
    )
    cand = (
        bands(sh_ref, "id_a")
        .join(bands(sh_new, "id_b"), F.col("bk") == F.col("bk_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    verified = pair_jaccard(cand, sh_ref.unionByName(sh_new))
    return verified.filter(
        F.lit(100) * F.col("inter") >= F.lit(min_jaccard_pct) * F.col("union_n")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard_pct: int = 50,
    max_df: int = STOP_SHINGLE_MAX_DF,
    min_shared: int = 2,
) -> DataFrame:
    """All near-dup pairs by exact n-gram Jaccard, via the shingle
    inverted index (never all-pairs): docs sharing ≥ ``min_shared``
    informative shingles are candidates; stop-shingles (document
    frequency above the absolute ``max_df`` cap) are dropped from
    candidate *generation* but kept for the exact verification, so the
    Jaccard value is unbiased.

    ``min_shared`` is the count filter from set-similarity joins
    (PPJoin-style): accidental pairs overwhelmingly share exactly one
    mid-frequency shingle (measured 1.37M → 0.14M candidates at sf0.1,
    a 10× cut in exact-verification work), while true near-dups at
    J ≥ 0.5 share ~half their shingles. The effective threshold per
    pair is ``least(min_shared, |A|, |B|)`` so docs with fewer total
    shingles than ``min_shared`` (3-word docs have ONE) are never
    excluded; what remains droppable are pairs whose overlap is
    ~entirely stop shingles — not near-dups in any meaningful sense.
    The per-doc floor counts INFORMATIVE shingles (``sh_i``), not all
    shingles: a doc whose shingles are mostly stop-shingles may have
    ≥ ``min_shared`` total but only one informative shingle, and a
    floor computed from the total would make such a doc unable to ever
    satisfy the filter — a silent recall hole.
    NOTE on big duplicate clusters: a boilerplate text repeated in more
    than ``max_df`` docs turns its own shingles into stop shingles and
    becomes invisible to THIS op — by design (the df cap is what bounds
    per-shingle pair fan-out at O(cap²)); run `exact_dedup` first for
    identical copies and `minhash_lsh_pairs` (banded signatures, no df
    cap) for large near-dup clusters. Fully lazy — no driver-side
    action in the plan (asserted by tools/explain_audit.py's eager-job
    guard)."""
    sh = _persist_managed(doc_shingles(df, id_col, text_col))  # shared by 3 consumers
    informative = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("shingle")
    )
    sh_i = sh.join(informative, "shingle")
    a = sh_i.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh_i.select(F.col("doc_id").alias("id_b"), F.col("shingle").alias("shingle_b"))
    sizes = sh_i.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    cand = (
        a.join(b, (F.col("shingle") == F.col("shingle_b")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_shared"))
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("_na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("_nb")), "id_b")
        .filter(
            F.col("_shared")
            >= F.least(F.lit(min_shared), F.col("_na"), F.col("_nb"))
        )
        .select("id_a", "id_b")
    )
    verified = pair_jaccard(cand, sh)
    return verified.filter(
        F.lit(100) * F.col("inter") >= F.lit(min_jaccard_pct) * F.col("union_n")
    )


def neardup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard_pct: int = 50,
    max_iters: int = 20,
) -> DataFrame:
    """Canonicalize near-dups: connected components over the MinHash+LSH
    pair graph — the step that turns pairwise findings into a
    keep-one-per-cluster dedup decision (the standard shape in
    MapReduce/Spark CC literature: min-label propagation à la
    "hash-to-min", Rastogi et al., ICDE'13). Output: (doc_id,
    cluster_id) for every doc that participates in ≥1 near-dup pair,
    cluster_id = the minimum doc_id reachable (so ``doc_id ==
    cluster_id`` marks the canonical keeper).

    Distributed shape: iterative min-label propagation — each round is
    one equi-join (edge → neighbor label) + one groupBy-min, then a
    ``localCheckpoint`` that MATERIALIZES the (cluster-participant-
    sized) label table and truncates its lineage. The truncation is not
    optional: each round references the previous labels twice (union +
    join), so an all-lazy loop re-analyzes/re-evaluates rounds 1..k-1
    down both references — a 2^k blow-up (measured 471 s for 137 nodes
    at 8 rounds; checkpointed: ~2 s). Per-round materialization is the
    standard shape for iterative graph algorithms on Spark (GraphX/
    GraphFrames iterate the same way); the jobs are executor-side, no
    driver collect. The loop runs TO CONVERGENCE (a round that changes
    no label ends it — the changed-label count rides the round's own
    materialization job via ``observe`` + a join against the previous
    labels, ONE job per round, no separate probe), so the result is the full
    transitive closure exactly like the recursive-CTE oracle twin; a
    graph deeper than ``max_iters`` raises instead of silently emitting
    a partially-merged clustering (label propagation needs O(diameter)
    rounds; near-dup components are shallow, so the default cap is
    generous)."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, min_jaccard_pct)
    labels = _min_label_components(
        pairs.select("id_a", "id_b"), max_iters, op_name="neardup_clusters"
    )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lab").alias("cluster_id")
    )


def _min_label_components(
    edges: DataFrame, max_iters: int, op_name: str = "components"
) -> DataFrame:
    """(node, lab) min-label connected components over an (id_a, id_b)
    edge DataFrame — the shared iterative core of
    :func:`neardup_clusters` and :func:`embedding_clusters` (see the
    former's docstring for the localCheckpoint / observe-convergence
    rationale)."""
    from vaero_spark.operators.checkpoints import CheckpointTracker

    # persist the (tiny) symmetric edge list: every propagation round
    # references it, and without the cache each round would re-run the
    # whole candidate-pair pipeline (keep_existing: the callers'
    # shingle/band indexes are already registered upstream)
    sym = _persist_managed(
        edges.unionByName(
            edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        ),
        keep_existing=True,
    )
    trk = CheckpointTracker(edges.sparkSession)
    labels = sym.select(F.col("id_a").alias("node")).distinct().withColumn(
        "lab", F.col("node")
    )
    for it in range(max_iters):
        prop = (
            sym.alias("e")
            .join(labels.alias("l"), F.col("e.id_b") == F.col("l.node"))
            .select(F.col("e.id_a").alias("node"), F.col("l.lab").alias("lab"))
        )
        # Convergence rides the SAME job as the propagation: the new
        # min-label table joins the previous labels (node sets are
        # identical round-over-round), an ``observe`` sums the changed
        # flags while ``localCheckpoint`` materializes the round, and
        # the loop reads the metric — no separate isEmpty/count probe
        # job per round (was one extra join-scan per iteration).
        obs = Observation(f"cc_{op_name}_round_{it}")
        new_labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
            .join(labels.select("node", F.col("lab").alias("prev_lab")), "node")
            .observe(
                obs,
                F.sum((F.col("lab") != F.col("prev_lab")).cast("long")).alias(
                    "changed"
                ),
            )
            .select("node", "lab")
            .localCheckpoint()  # see docstring: truncates the 2^k lineage
        )
        trk.round_done()  # releases the superseded round's blocks
        labels = new_labels
        if not obs.get["changed"]:
            break
    else:
        raise RuntimeError(
            f"{op_name} did not converge in {max_iters} rounds — "
            "the pair graph has a component deeper than max_iters; raise it"
        )
    trk.finish()
    return labels


def embedding_clusters(
    df: DataFrame,
    vec_col: str = "embedding",
    min_sim_e4: int = 9900,
    n_estimate: int | None = None,
    max_iters: int = 20,
) -> DataFrame:
    """SEMANTIC near-dup canonicalization: connected components over
    the embedding near-dup pair graph (:func:`embedding_neardup_pairs`)
    — the embedding-space twin of :func:`neardup_clusters` (which
    clusters the lexical MinHash graph). The step that turns pairwise
    cosine findings into a keep-one-per-cluster decision for
    semantically-duplicated corpora (re-crawls, templated rewrites,
    translations sharing an embedding). Output: (vec_id, cluster_id)
    for every vector in >= 1 near-dup pair; cluster_id = min reachable
    vec_id, so ``vec_id == cluster_id`` marks the canonical keeper.

    100 TB shape: pair mining is the banded sign-LSH equi-join (auto-
    sized via ``n_estimate``), the CC loop is the shared min-label
    propagation (one join + one groupBy-min per round, per-round
    ``localCheckpoint``, convergence via ``observe`` on the round's own
    job). Oracle: recursive-CTE reachability over the same verified
    pair set — exact, because pair admission (``sim_e4``) is the
    established quantized-int path and the closure is integer-only."""
    pairs = embedding_neardup_pairs(
        df, vec_col=vec_col, min_sim_e4=min_sim_e4, n_estimate=n_estimate
    )
    labels = _min_label_components(
        pairs.select("id_a", "id_b"), max_iters, op_name="embedding_clusters"
    )
    return labels.select(
        F.col("node").alias("vec_id"), F.col("lab").alias("cluster_id")
    )


def simhash_docs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — the per-doc 64-bit signature (signed BIGINT)."""
    out = simhash_agg(df, id_col, text_col)
    return out if id_col == "doc_id" else out.withColumnRenamed(id_col, "doc_id")


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_estimate: int | None = None,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ ``max_hamming``.

    Candidate generation: split the 64-bit signature into bands; by
    pigeonhole, any pair within Hamming(bands−1) agrees on ≥1 band —
    join on (band_idx, band_value), then verify with bit_count(xor).
    Default 4×16-bit bands: 2¹⁶ buckets per band keep within-bucket
    pair work at (N/65536)² — the 8-bit bands of a 32-bit signature
    would hold N/256 docs each and collapse to quadratic at ≥10⁹ docs
    (see functions/text.py ``SIMHASH_BITS``). Pass ``n_estimate``
    (known corpus cardinality — no counting job is run) to auto-size
    the bands for scale via :func:`~vaero_spark.functions.lsh_tuning.
    auto_band_bits`; wider bands shrink the pigeonhole guarantee, so a
    ``max_hamming`` above bands−1 is logged as recall-degraded. The
    arithmetic shift's sign-extension is masked off by the band mask
    (identical low bits either way)."""
    from vaero_spark.functions.text import (
        SIMHASH_BAND_BITS,
        SIMHASH_BANDS,
        SIMHASH_BITS,
    )

    if n_estimate is None:
        n_bands, band_bits = SIMHASH_BANDS, SIMHASH_BAND_BITS
    else:
        from vaero_spark.functions.lsh_tuning import auto_band_bits

        n_bands, band_bits = auto_band_bits(
            n_estimate, total_bits=SIMHASH_BITS, min_bits=SIMHASH_BAND_BITS
        )
        if max_hamming > n_bands - 1:
            import logging

            logging.getLogger(__name__).warning(
                "simhash_pairs: %d bands guarantee recall only to "
                "hamming %d < max_hamming %d — pairs beyond it may be "
                "missed (the bounded-work trade at n≈%.1e)",
                n_bands, n_bands - 1, max_hamming, n_estimate,
            )

    sh = simhash_docs(df, id_col, text_col)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(i)),
                        F.shiftright(F.col("simhash"), band_bits * i)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .cast("string"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    )
    a = bands.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "band")
    b = bands.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), F.col("band").alias("band_b")
    )
    cand = (
        a.join(b, (F.col("band") == F.col("band_b")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    min_sim_e4: int = 9900,
    n_estimate: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs: cosine ≥ ``min_sim_e4``/1e4.

    Candidates collide in ≥1 of the 4 sign bands (16 bits each —
    vectors with cosine ≈ 1 share every coordinate sign, so they
    collide in ALL bands); exact int-quantized cosine verifies. The
    band self-join moves only (id, band_key); vectors are joined back
    by id after the distinct — per-band buckets number 2^16, so
    within-bucket pair work is (N/65536)² per band, never all-pairs.
    Pass ``n_estimate`` (known corpus cardinality) to auto-size the
    bands for scale (``functions/lsh_tuning.py``). Output: (id_a,
    id_b, sim_e4)."""
    from vaero_spark.operators.similarity import (
        SIGN_BAND_BITS,
        SIGN_BANDS,
        _int_dot,
        _sim_e4,
        sign_band_keys_from_quant,
    )

    if n_estimate is None:
        n_bands, band_bits = SIGN_BANDS, SIGN_BAND_BITS
    else:
        from vaero_spark.functions.lsh_tuning import auto_band_bits

        n_bands, band_bits = auto_band_bits(
            n_estimate, total_bits=SIGN_BANDS * SIGN_BAND_BITS,
            min_bits=SIGN_BAND_BITS,
        )

    q = quantized(vec_col)
    base = df.select(F.col("vec_id"), q.alias("qv"), _int_dot(q, q).alias("nsq"))
    bk = base.select(
        "vec_id",
        F.explode(sign_band_keys_from_quant("qv", n_bands, band_bits)).alias("bk"),
    )
    cand = (
        bk.select(F.col("vec_id").alias("id_a"), "bk")
        .join(
            bk.select(F.col("vec_id").alias("id_b"), F.col("bk").alias("bk_b")),
            (F.col("bk") == F.col("bk_b")) & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()  # OR across bands
    )
    a = base.select(
        F.col("vec_id").alias("id_a"), F.col("qv").alias("qa"), F.col("nsq").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("id_b"), F.col("qv").alias("qb"), F.col("nsq").alias("nb")
    )
    pairs = cand.join(a, "id_a").join(b, "id_b").select(
        "id_a",
        "id_b",
        _sim_e4(_int_dot(F.col("qa"), F.col("qb")), F.col("na"), F.col("nb")).alias("sim_e4"),
    )
    return pairs.filter(F.col("sim_e4") >= min_sim_e4)


def dedup_against(
    new_df: DataFrame,
    snapshot_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CROSS-SNAPSHOT exact dedup: drop documents whose text already
    exists (by md5) in a reference snapshot — the incremental-crawl
    step of a recurring pipeline (today's crawl deduped against the
    corpus already ingested; ``exact_dedup`` is the WITHIN-corpus
    sibling). Returns the kept manifest (id, text_md5).

    100 TB shape: both sides project to (id, md5) narrow — the join
    moves 16-byte hashes, never text bytes — then ONE left-anti
    equi-join on the hash. NO broadcast hint: a snapshot is
    corpus-sized by definition (the ``dedup_keep`` lesson); AQE
    broadcasts only when the runtime size permits.
    """
    ref = snapshot_df.select(F.md5(F.col(text_col)).alias("text_md5")).distinct()
    return (
        new_df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_md5"))
        .join(ref, "text_md5", "left_anti")
        .select(id_col, "text_md5")
    )


def dedup_against_sql(
    new_cte: str, snapshot_cte: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`dedup_against` over two CTE/table names."""
    return f"""
    SELECT {id_col}, md5({text_col}) AS text_md5 FROM {new_cte} n
    WHERE NOT EXISTS (
      SELECT 1 FROM {snapshot_cte} s WHERE md5(s.{text_col}) = md5(n.{text_col}))"""


def dup_passage_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    k: int = PASSAGE_K,
) -> DataFrame:
    """Per-document DUPLICATE-PASSAGE coverage — the exact-substring
    dedup signal (Lee et al., ACL'22 "Deduplicating Training Data Makes
    Language Models Better") at k-token passage granularity: the share
    of a document's distinct k-token passages that also occur in at
    least ``min_df - 1`` OTHER documents, in basis points. Near-dup ops
    (`minhash_lsh_pairs` et al.) answer "which DOCUMENT pairs are
    copies"; this answers "how much of EACH document is copied text" —
    the per-doc filter signal a curation pass thresholds on (a doc that
    is 80% duplicated passages is boilerplate-stitched even when no
    single pair crosses a Jaccard bar). No reference counterpart
    (nearest seed: the cursor ``>=`` gate,
    ``/root/reference/integrations/python/source_okta.py:91-113``).

    Output: (id, n_passages, n_dup, dup_bp) for every input doc —
    integer-exact (counts + a floor-quantized correctly-rounded
    division mirrored token-for-token in the SQL twin).

    100 TB shape: explode distinct passages (narrow) → ONE map-side-
    combined groupBy on the passage text for document frequencies →
    equi-join back on the passage (co-partitioned with the groupBy —
    Catalyst reuses the exchange) → per-doc aggregate. Work is
    passage-count-sized; no doc×doc pairs anywhere. The df table is
    corpus-sized, so it gets NO broadcast hint (the ``dedup_keep``
    lesson) — AQE decides at runtime.

    ``k`` defaults to :data:`PASSAGE_K` (longer than the 3-word dedup
    shingle): passage-level copying is a longer-span phenomenon than
    shingle overlap, and short k over formulaic text saturates the
    signal (every doc shares 3-grams; few share 8-grams by accident).
    """
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(tokens(text_col), k))).alias("shingle"),
    )
    pdf = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("pdf"))
    ann = sh.join(pdf, "shingle")
    per_doc = ann.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(F.when(F.col("pdf") >= min_df, 1).otherwise(0))
        .cast("long")
        .alias("n_dup"),
    )
    return per_doc.select(
        id_col,
        "n_passages",
        "n_dup",
        F.floor(F.lit(10000) * F.col("n_dup") / F.col("n_passages"))
        .cast("long")
        .alias("dup_bp"),
    )


def dup_passage_coverage_sql(docs_cte: str, min_df: int = 2, k: int = PASSAGE_K) -> str:
    """DuckDB twin of :func:`dup_passage_coverage` over a CTE/table of
    (doc_id, text). SUM casts OUTSIDE the aggregate (DuckDB SUM(BIGINT)
    → HUGEINT → pandas float64 otherwise); the dup_bp division mirrors
    Spark's bigint·int → double token-for-token."""
    from vaero_spark.functions.text import shingles_sql, tokens_sql

    sh = shingles_sql(tokens_sql("text"), k)
    return f"""
    sh AS (SELECT DISTINCT doc_id, unnest({sh}) AS shingle FROM {docs_cte}),
    pdf AS (SELECT shingle, count(*) AS pdf FROM sh GROUP BY shingle),
    per_doc AS (
      SELECT s.doc_id,
             CAST(count(*) AS BIGINT) AS n_passages,
             CAST(sum(CASE WHEN p.pdf >= {min_df} THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      FROM sh s JOIN pdf p USING (shingle)
      GROUP BY s.doc_id)
    SELECT doc_id, n_passages, n_dup,
           CAST(floor(10000 * n_dup / n_passages) AS BIGINT) AS dup_bp
    FROM per_doc"""


def embedding_dup_groups(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact-duplicate vectors via md5 of the int-quantized embedding —
    a hash-groupBy, no pairwise math, fully scalable."""
    sig = F.md5(
        F.array_join(F.transform(quantized(vec_col), lambda x: x.cast("string")), ",")
    )
    return (
        df.select(F.col("vec_id"), sig.alias("vec_sig"))
        .groupBy("vec_sig")
        .agg(
            F.min("vec_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("vec_id")), lambda x: x.cast("string")
                ),
                ",",
            ).alias("members"),
        )
        .filter(F.col("n_copies") > 1)
        .select("keep_id", "n_copies", "members")
    )


# ---------------------------------------------------------------------------
# cross-document shingle novelty (corpus-growth / data-mixing signal)
# ---------------------------------------------------------------------------

def shingle_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Per-document NOVELTY against everything earlier in the corpus:
    the fraction of a document's distinct k-shingles whose FIRST
    occurrence (by ``id_col`` order — ingestion order in a snapshot
    corpus) is this document. ``novelty_bp = 10000`` means all-new
    content; low values mean the document mostly restates earlier
    text — the curve data-mixing and crawl-scheduling decisions read
    (is a source still contributing new content?). Passage-level
    companion to :func:`dedup_against` (doc-level cross-snapshot).

    100 TB shape: distinct-within-doc shingles explode narrow; the
    first-occurrence table is ONE map-side-combined ``min`` groupBy on
    the shingle; the join back lands on the SAME shingle partitioning
    (no second exchange on the probe side); the per-doc rollup is one
    shuffle on doc_id. No doc×doc pairs anywhere. At 10^12 docs the
    shingle key would be a 128-bit hash instead of the raw string —
    same plan, narrower wire; the gate keeps the string so the DuckDB
    twin is byte-identical.

    Output: (id, n_shingles, n_novel, novelty_bp), all integers.
    """
    sh = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(shingles(tokens(F.col(text_col)), k))
        ).alias("_sh"),
    )
    first = sh.groupBy("_sh").agg(F.min(id_col).alias("_first"))
    joined = sh.join(first, "_sh")
    n_novel = F.sum(
        F.when(F.col("_first") == F.col(id_col), 1).otherwise(0)
    ).cast("bigint")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        n_novel.alias("n_novel"),
        F.floor(
            F.lit(10000)
            * F.sum(F.when(F.col("_first") == F.col(id_col), 1).otherwise(0))
            / F.count(F.lit(1))
        ).cast("bigint").alias("novelty_bp"),
    )


def shingle_novelty_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> str:
    """DuckDB twin of :func:`shingle_novelty` (standalone SELECT).
    SUM casts OUTSIDE the aggregate (HUGEINT rule); the novelty ratio
    mirrors Spark's ``floor(10000·sum/count)`` token-for-token."""
    from vaero_spark.functions.text import shingles_sql, tokens_sql

    sh_expr = shingles_sql(tokens_sql(text_col), k)
    return f"""
    WITH nv_sh AS (
      SELECT {id_col}, unnest(list_distinct({sh_expr})) AS _sh
      FROM {table}),
    nv_first AS (SELECT _sh, MIN({id_col}) AS _first FROM nv_sh GROUP BY 1)
    SELECT {id_col},
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN _first = {id_col} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(floor(10000 * SUM(CASE WHEN _first = {id_col} THEN 1 ELSE 0 END)
                / COUNT(*)) AS BIGINT) AS novelty_bp
    FROM nv_sh JOIN nv_first USING (_sh)
    GROUP BY {id_col}"""


def snapshot_diff(
    old_df: "DataFrame",
    new_df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """SNAPSHOT CHANGESET: classify every document as added / removed /
    changed between two corpus snapshots — the diff a recurring crawl
    pipeline publishes alongside each snapshot (what must re-embed,
    re-dedup, re-index downstream). ``dedup_against`` answers "which new
    docs are novel by content"; this keys by IDENTITY and reports the
    full churn, unchanged rows excluded so the output is churn-sized,
    not corpus-sized.

    100 TB shape: both sides project to (id, md5) narrow — 16-byte
    hashes cross the wire, never text — then ONE full-outer equi-join on
    the id. NO broadcast hint (both sides are corpus-sized; AQE decides).

    Output: (id_col, status) with status ∈ {added, removed, changed}.
    """
    o = old_df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_old_md5"))
    n = new_df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_new_md5"))
    status = (
        F.when(F.col("_old_md5").isNull(), "added")
        .when(F.col("_new_md5").isNull(), "removed")
        .when(F.col("_old_md5") != F.col("_new_md5"), "changed")
    )
    return (
        o.join(n, id_col, "full_outer")
        .select(F.col(id_col), status.alias("status"))
        .filter(F.col("status").isNotNull())
    )


def snapshot_diff_sql(
    old_cte: str, new_cte: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`snapshot_diff` over two CTE/table names."""
    return f"""
    SELECT COALESCE(o.{id_col}, n.{id_col}) AS {id_col},
           CASE WHEN o.{id_col} IS NULL THEN 'added'
                WHEN n.{id_col} IS NULL THEN 'removed'
                WHEN md5(o.{text_col}) <> md5(n.{text_col}) THEN 'changed'
           END AS status
    FROM {old_cte} o FULL OUTER JOIN {new_cte} n ON o.{id_col} = n.{id_col}
    WHERE o.{id_col} IS NULL OR n.{id_col} IS NULL
       OR md5(o.{text_col}) <> md5(n.{text_col})"""


def apply_changeset(
    base_df: "DataFrame",
    changes_df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    status_col: str = "status",
) -> "DataFrame":
    """SNAPSHOT MAINTENANCE: apply a :func:`snapshot_diff`-style changeset
    to the base snapshot and emit the NEXT snapshot's manifest — the
    CONSUMER side of the diff a recurring crawl publishes (a downstream
    mirror applies churn instead of re-copying the corpus; the Iceberg
    MERGE INTO shape, expressed engine-neutrally).

    ``changes_df`` carries (id, status, new text): status ∈ {added,
    removed, changed}; ``text`` holds the new content for added/changed
    rows and is ignored (may be null) for removed. The defining identity
    — ``apply_changeset(old, snapshot_diff(old, new) ⋈ new texts) ==
    new`` — IS the gate's oracle: the applied result must equal the new
    snapshot's own manifest byte-for-byte.

    100 TB shape: base drops every churned id via ONE left-anti
    equi-join on the id (NO broadcast hint — a recrawl's churn can be
    corpus-sized, AQE decides); added/changed rows union in narrow.
    Output (id, text_md5): 16-byte hashes cross the wire, never text.
    """
    manifest = lambda df: df.select(  # noqa: E731
        F.col(id_col), F.md5(F.col(text_col)).alias("text_md5")
    )
    kept = base_df.join(changes_df.select(id_col), id_col, "left_anti")
    upserts = changes_df.filter(F.col(status_col).isin("added", "changed"))
    return manifest(kept).unionByName(manifest(upserts))


def cluster_stats(
    df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard_pct: int = 50,
) -> "DataFrame":
    """DUPLICATION-MASS report: the near-dup CLUSTER SIZE HISTOGRAM —
    how many clusters of each size the corpus carries and how many docs
    they bind (``n_dup_docs`` = the rows a keep-one-per-cluster pass
    would drop is ``sum((size-1)·n_clusters)`` downstream). The
    go/no-go summary a curation run reads before committing to
    ``dedup_keep``: a corpus whose mass sits in a few giant clusters
    needs boilerplate stripping first; long-tail pairs just need the
    standard pass.

    100 TB shape: rides :func:`neardup_clusters` (banded pair mining +
    checkpointed min-label propagation), then TWO model-sized
    aggregates: groupBy(cluster) → size over the cluster-participant
    set only, groupBy(size) → histogram (output ≤ max-cluster-size
    rows). Nothing here touches non-duplicate docs.
    """
    labels = neardup_clusters(df, id_col, text_col, min_jaccard_pct)
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
    )
