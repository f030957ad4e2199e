"""Vector-similarity operators over the ``embeddings`` table (SURVEY §2.11).

Cosine math is pure higher-order-function Spark SQL (``zip_with`` dot
product + ``aggregate`` fold) — JVM-side, codegen, no Python. Floats are
accumulated in double and every emitted similarity is rounded to 4 dp with
the shared cross-engine rounding expression; all ORDER BY / thresholds
operate on the ROUNDED value with integer tie-breaks, so Spark and DuckDB
(`list_cosine_similarity`) select identical row sets.

Scale notes (100 TB / billions of vectors):
- ``sim_knn_cosine`` broadcasts the query vector — a map-only scan + top-k
  (TakeOrderedAndProject): no shuffle at all. The canonical brute-force
  baseline; throughput = scan bandwidth.
- ``sim_pairwise_topk`` / ``dedup_embed_cosine`` join within a blocking key
  (label) — never a global cross join. At scale the blocking key becomes an
  IVF/LSH bucket id (``sim_ann_lsh``) and the same plan shape holds.
- ``sim_ann_lsh`` shows the scale path: random-hyperplane signatures shrink
  the candidate set to one bucket; recall is tunable via bits/tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from python_kinesis_streaming_spark.functions.rounding import rnd, sql_rnd
from python_kinesis_streaming_spark.registry import op
from python_kinesis_streaming_spark.sources.tables import load_table


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ in double precision (HOF fold — no Python)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))
QUERY_VEC_ID = 0  # the deterministic "query" for knn ops

#: (session, sf_dir) → embeddings with a precomputed L2 norm column, cached.
#: Norms are query-independent — computing them per lookup wastes a full
#: interpreted-HOF pass; at 100 TB they'd be materialized at ingest alongside
#: the vectors (the classic vector-index preparation step).
_NORM_CACHE: dict[tuple[int, str], DataFrame] = {}


def emb_with_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (id(spark), sf_dir)
    if key not in _NORM_CACHE:
        emb = load_table(spark, sf_dir, "embeddings")
        _NORM_CACHE[key] = emb.withColumn("norm", l2norm(F.col("embedding"))).cache()
    return _NORM_CACHE[key]


@op(
    "sim_knn_cosine",
    oracle=f"""
        WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
                   WHERE vec_id = {QUERY_VEC_ID})
        SELECT vec_id,
               floor((list_cosine_similarity(embedding::DOUBLE[], qe))
                     * 10000.0 + 0.505) / 10000.0 AS sim
        FROM embeddings, q
        WHERE vec_id <> {QUERY_VEC_ID}
        ORDER BY sim DESC, vec_id
        LIMIT 10
    """,
    scale=(
        "Broadcast one query vector; map-only cosine + TakeOrderedAndProject "
        "top-k — zero shuffles, scales linearly with scan bandwidth. "
        "Batch-of-queries variant: broadcast the query SET, explode per "
        "partition, per-query top-k via window."
    ),
)
def sim_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors of vec_id=0, brute force (exact baseline).

    The query vector is fetched to the driver (64 floats — the degenerate
    broadcast) and inlined as LITERAL coefficients, so the dot product is a
    flat whole-stage-codegen expression over the scan — no join, no
    interpreted HOF lambda in the hot loop; vector norms come precomputed
    from the cached index table (emb_with_norm). The plan is scan →
    TakeOrderedAndProject, zero shuffles.
    """
    emb = emb_with_norm(spark, sf_dir)
    qv = [
        float(x)
        for x in emb.where(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"]
    ]
    qnorm = sum(x * x for x in qv) ** 0.5
    # Left-to-right summation order identical to the HOF/DuckDB loop.
    dot_expr = F.lit(0.0)
    for i, w in enumerate(qv):
        dot_expr = dot_expr + F.col("embedding")[i].cast("double") * F.lit(w)
    sim = dot_expr / (F.col("norm") * F.lit(qnorm))
    return (
        emb.where(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", rnd(sim, 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


@op(
    "sim_pairwise_topk",
    oracle="""
        WITH pairs AS (
            SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
                   floor((list_cosine_similarity(a.embedding::DOUBLE[],
                                                 b.embedding::DOUBLE[]))
                         * 10000.0 + 0.505) / 10000.0 AS sim
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
        )
        SELECT label, vec_a, vec_b, sim FROM (
            SELECT *, row_number() OVER (
                PARTITION BY label ORDER BY sim DESC, vec_a, vec_b) AS rn
            FROM pairs
        ) WHERE rn <= 5
    """,
    scale=(
        "All-pairs restricted to a blocking key (label): the join fans out "
        "per-bucket, never globally. Bucket size is the knob — at 100 TB "
        "use finer blocking (LSH bucket) so |bucket|² stays bounded; AQE "
        "splits skewed buckets."
    ),
)
def sim_pairwise_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most-similar vector pairs within each label (blocked all-pairs).

    Norms come precomputed from ``emb_with_norm`` (one HOF per VECTOR),
    so each PAIR costs a single dot fold — identical arithmetic to
    ``cosine`` (bit-identical doubles; the r12 SemDeDup kernel lesson,
    PERF.md r12), 3x fewer HOF evaluations in the quadratic stage."""
    from pyspark.sql.window import Window

    emb = emb_with_norm(spark, sf_dir)
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.label").alias("label"),
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        rnd(
            dot(F.col("a.embedding"), F.col("b.embedding"))
            / (F.col("a.norm") * F.col("b.norm")),
            4,
        ).alias("sim"),
    )
    w = Window.partitionBy("label").orderBy(
        F.desc("sim"), F.asc("vec_a"), F.asc("vec_b")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .drop("rn")
    )


@op(
    "dedup_embed_cosine",
    oracle="""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               floor((list_cosine_similarity(a.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[]))
                     * 10000.0 + 0.505) / 10000.0 AS sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE floor((list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]))
                    * 10000.0 + 0.505) / 10000.0 >= 0.30
    """,
    scale=(
        "Embedding near-dup = threshold variant of the blocked pair join; "
        "the label block stands in for an ANN bucket at scale. Threshold "
        "compares the rounded value on both engines — no float-boundary "
        "divergence."
    ),
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vector pairs: cosine ≥ 0.30 within the same label.

    (0.30 is calibrated to the synthetic fixtures — max within-label cosine
    is ~0.47 — so the op exercises a non-empty result; real pipelines use
    ~0.9+ on normalized embeddings.)

    Pair similarity uses precomputed ``emb_with_norm`` norms + one dot
    fold per pair — bit-identical to ``cosine`` (r12 kernel lesson)."""
    emb = emb_with_norm(spark, sf_dir)
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            rnd(
                dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.norm") * F.col("b.norm")),
                4,
            ).alias("sim"),
        )
        .where(F.col("sim") >= 0.30)
    )


#: Deterministic pseudo-random hyperplanes for the LSH signature: plane p,
#: dim d weight derived from a fixed integer hash → [-0.5, 0.5). No RNG at
#: runtime, identical across sessions/executors. 6 planes → 64 buckets
#: (~n/64 candidates each); scale bits up with corpus size to hold the
#: bucket-size target, add tables/probes to recover recall.
LSH_PLANES = 6


def _hyperplane_weight(p: int, d: int) -> float:
    # Splitmix64-style integer scramble, reduced to a unit-ish float.
    x = (p * 64 + d) * 0x9E3779B97F4A7C15 % (1 << 64)
    x = (x ^ (x >> 31)) * 0xBF58476D1CE4E5B9 % (1 << 64)
    x = (x ^ (x >> 27)) % (1 << 64)
    return (x % 10_000_019) / 10_000_019.0 - 0.5


def _ann_lsh_oracle(dims: int = 64) -> str:
    """DuckDB twin of sim_ann_lsh: the hyperplane weights are deterministic
    pure arithmetic (splitmix-style scramble computed at import time), so the
    SAME double literals are inlined into SQL; projection sum order matches
    the Spark fold (left-to-right over dims), making the bucket id — and
    therefore the candidate set — bit-identical across engines."""
    projs = []
    for p in range(LSH_PLANES):
        terms = " + ".join(
            f"CAST({_hyperplane_weight(p, d)!r} AS DOUBLE) * e[{d + 1}]"
            for d in range(dims)
        )
        projs.append(f"CASE WHEN (CAST(0.0 AS DOUBLE) + {terms}) > 0 THEN {1 << p} ELSE 0 END")
    bucket = "\n                 + ".join(projs)
    probes = " OR ".join(
        ["w.bucket = q.qb"]
        + [f"w.bucket = xor(q.qb, {1 << p})" for p in range(LSH_PLANES)]
    )
    return f"""
        WITH wb AS (
            SELECT vec_id, embedding::DOUBLE[] AS e,
                   ({bucket}) AS bucket
            FROM embeddings
        ),
        q AS (SELECT e AS qe, bucket AS qb FROM wb WHERE vec_id = {QUERY_VEC_ID})
        SELECT w.vec_id,
               floor((list_cosine_similarity(w.e, q.qe)) * 10000.0 + 0.505) / 10000.0 AS sim
        FROM wb w, q
        WHERE w.vec_id <> {QUERY_VEC_ID} AND ({probes})
        ORDER BY sim DESC, w.vec_id
        LIMIT 10
    """


@op(
    "sim_ann_lsh",
    oracle=_ann_lsh_oracle(),
    scale=(
        "The 100 TB ANN path: fixed random hyperplanes → bucket id; the "
        "query probes its own bucket plus all Hamming-1 neighbors "
        "(multi-probe) via an equi-join on bucket — index build is one "
        "map-only pass, lookup shuffles only probed buckets. Recall/latency "
        "tuned by bits, probes, and table count."
    ),
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 neighbors of vec_id=0 via random-hyperplane LSH.

    Signature bit p = sign(v · hyperplane_p) with hyperplanes derived from a
    fixed integer hash (deterministic everywhere). Candidates = vectors in
    the query's bucket or any Hamming-1 neighbor bucket (multi-probe);
    exact cosine re-rank over the candidates.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dims = 64

    def bucket_col() -> Column:
        acc = F.lit(0)
        for p in range(LSH_PLANES):
            proj = F.aggregate(
                F.zip_with(
                    "embedding",
                    F.array(
                        *[F.lit(_hyperplane_weight(p, d)) for d in range(dims)]
                    ),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            acc = acc + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        return acc

    with_bucket = emb.withColumn("bucket", bucket_col())
    # Multi-probe: the query's bucket plus every Hamming-1 neighbor
    # (flip each of the LSH_PLANES bits) — 1+6 probed buckets of 64.
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(LSH_PLANES)],
    )
    q = with_bucket.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qe"), probes.alias("qprobes")
    )
    return (
        with_bucket.join(F.broadcast(q), how="cross")
        .where(
            F.array_contains(F.col("qprobes"), F.col("bucket"))
            & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .select("vec_id", rnd(cosine(F.col("embedding"), F.col("qe")), 4).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


@op(
    "sim_centroids",
    oracle="""
        SELECT label, i.i AS pos,
               floor((avg(embedding[i.i])) * 10000.0 + 0.505) / 10000.0
                   AS centroid_val
        FROM embeddings, range(1, 65) i(i)
        GROUP BY label, i.i
    """,
    scale=(
        "Elementwise centroid via posexplode -> (label, pos) partial-agg "
        "avg: the shuffle carries |labels| x dims tiny rows. The k-means / "
        "IVF-index build step; reassemble arrays downstream only if needed "
        "(array_agg over sorted pos)."
    ),
)
def sim_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, one row per (label, dimension)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("p", "v"))
        .groupBy("label", (F.col("p") + 1).alias("pos"))
        .agg(rnd(F.avg(F.col("v").cast("double")), 4).alias("centroid_val"))
    )


@op(
    "sim_query_batch",
    oracle="""
        WITH q AS (
            SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
            FROM embeddings WHERE vec_id < 5
        ),
        scored AS (
            SELECT q.qid, e.vec_id,
                   floor((list_cosine_similarity(e.embedding::DOUBLE[], q.qe))
                         * 10000.0 + 0.505) / 10000.0 AS sim
            FROM embeddings e, q
            WHERE e.vec_id <> q.qid
        )
        SELECT qid, vec_id, sim FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
            FROM scored
        ) WHERE rn <= 3
    """,
    scale=(
        "Batched knn: broadcast the (small) query set, score every corpus "
        "vector against all queries in one scan pass, per-query top-k via "
        "window on qid. Corpus scanned ONCE for Q queries - the serving "
        "batch shape; at larger Q block queries into broadcast-sized "
        "groups."
    ),
)
def sim_query_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 cosine neighbors for each of 5 query vectors in one pass."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            rnd(cosine(F.col("embedding"), F.col("qe")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


@op(
    "emb_normalize_quantize",
    oracle="""
        WITH n AS (
            SELECT vec_id,
                   list_transform(embedding::DOUBLE[], x -> x) AS e,
                   sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
            FROM embeddings
        ),
        q AS (
            SELECT vec_id, nrm,
                   list_transform(e, x -> CAST(floor(x / nrm * 127.0 + 0.505) AS BIGINT)) AS qv
            FROM n
        )
        SELECT vec_id,
               floor(nrm * 10000.0 + 0.505) / 10000.0 AS norm,
               CAST(list_sum(qv) AS BIGINT) AS q_sum,
               list_min(qv) AS q_min,
               list_max(qv) AS q_max
        FROM q
    """,
    scale=(
        "Int8 quantization of an embedding corpus (ANN index prep): "
        "unit-normalize then round each coordinate to [-127,127] — 4× "
        "bandwidth/memory cut for the billion-vector scan. Map-only, "
        "JVM HOFs, zero shuffles; per-vector scalars out (norm + "
        "quantized checksums) keep the result hash-safe. Rounding is the "
        "repo-wide floor(x·k+0.505) so both engines quantize identically."
    ),
)
def emb_normalize_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize each embedding and quantize to int8; emit per-vector
    norm + quantized-vector summary scalars (sum/min/max)."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = l2norm(F.col("embedding"))
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") / F.col("nrm") * 127.0 + F.lit(0.505)).cast(
            "long"
        ),
    )
    return (
        emb.withColumn("nrm", nrm)
        .withColumn("qv", qv)
        .select(
            "vec_id",
            rnd(F.col("nrm"), 4).alias("norm"),
            F.aggregate("qv", F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
            F.array_min("qv").alias("q_min"),
            F.array_max("qv").alias("q_max"),
        )
    )


@op(
    "emb_gram_matrix",
    oracle="""
        WITH dims AS (SELECT CAST(u.i AS INTEGER) AS d
                      FROM unnest(range(0, 64)) AS u(i)),
        e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.d AS j, b.d AS k,
               floor(sum(v[a.d + 1] * v[b.d + 1]) * 10000.0 + 0.505)
                   / 10000.0 AS g
        FROM e, dims a, dims b
        WHERE a.d <= b.d
        GROUP BY 1, 2
    """,
    scale=(
        "The d×d gram/covariance matrix — the distributed primitive behind "
        "PCA, whitening, and OPQ rotation for ANN indexes. Per Arrow batch "
        "a numpy E^T·E partial (d² floats, computed at BLAS speed) is "
        "emitted, then ONE tiny shuffle of d²-row partials merges them: "
        "row count never crosses the wire, so 100 TB of embeddings costs "
        "scan bandwidth + a 2080-row exchange. Eigendecomposition of the "
        "result is a driver-side O(d³) numpy call."
    ),
)
def emb_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle gram matrix G[j,k] = Σ_vec e_j·e_k over all
    embeddings (float64 accumulation, rounded 4 dp)."""
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")

    def partial_gram(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            gram = mat.T @ mat
            ju, ku = np.triu_indices(gram.shape[0])
            yield pd.DataFrame(
                {
                    "j": ju.astype(np.int32),
                    "k": ku.astype(np.int32),
                    "partial": gram[ju, ku],
                }
            )

    partials = emb.mapInPandas(
        partial_gram, schema="j int, k int, partial double"
    )
    return partials.groupBy("j", "k").agg(
        rnd(F.sum("partial"), 4).alias("g")
    )


@op(
    "emb_kmeans_one_iter",
    oracle="""
        WITH cent AS (
            SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
            FROM embeddings WHERE vec_id < 8
        ),
        assigned AS (
            SELECT e.vec_id,
                   min_by(c.cid,
                          CAST(floor(list_sum(list_transform(range(1, 65),
                               i -> (e.embedding[CAST(i AS INTEGER)]::DOUBLE
                                     - c.cv[CAST(i AS INTEGER)]) ^ 2))
                               * 1000000.0 + 0.505) AS BIGINT) * 8 + c.cid) AS cid
            FROM embeddings e, cent c
            GROUP BY e.vec_id
        )
        SELECT a.cid,
               count(*) AS n_members,
               floor((avg(e.embedding[1]::DOUBLE)) * 10000.0 + 0.505)
                   / 10000.0 AS new_c0,
               floor((avg(e.embedding[2]::DOUBLE)) * 10000.0 + 0.505)
                   / 10000.0 AS new_c1
        FROM assigned a JOIN embeddings e ON e.vec_id = a.vec_id
        GROUP BY a.cid
    """,
    scale=(
        "One Lloyd iteration, the iterative-ML template: k centroids "
        "BROADCAST against the corpus (k·d doubles — never a shuffle of "
        "vectors), per-row nearest-centroid via a codegen HOF distance, "
        "then ONE partial agg producing the k·d update. 100 TB per "
        "iteration = scan + broadcast + k-row exchange; convergence loops "
        "this plan exactly like graph_pagerank_lite. Distances are "
        "eps-floor-rounded before the argmin with a centroid-id tie-break, "
        "so assignment is bit-identical across engines and partitionings."
    ),
)
def emb_kmeans_one_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means (k=8) assignment+update pass over the embeddings:
    deterministic init (vec_id < 8), L2² nearest-centroid assignment,
    per-centroid member count + first-2-dim updated means."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    dist = F.expr(
        "aggregate(zip_with(embedding, cv, (a, b) -> "
        "(CAST(a AS DOUBLE) - CAST(b AS DOUBLE)) * "
        "(CAST(a AS DOUBLE) - CAST(b AS DOUBLE))), 0D, (acc, x) -> acc + x)"
    )
    assigned = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "cid",
            # (dist, cid) argmin encoded as ONE integer ordinal —
            # floor(d*1e6 + .505) IS the 6-dp rounding scaled to int, so the
            # ordering matches DuckDB's min_by exactly (structs don't order
            # portably across the two engines).
            (
                F.floor(dist * F.lit(1000000.0) + F.lit(0.505)).cast("long")
                * F.lit(8)
                + F.col("cid")
            ).alias("ord"),
        )
        .groupBy("vec_id")
        .agg(
            F.min_by("cid", "ord").alias("cid"),
            F.first("embedding").alias("embedding"),
        )
    )
    return assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        rnd(F.avg(F.col("embedding")[0].cast("double")), 4).alias("new_c0"),
        rnd(F.avg(F.col("embedding")[1].cast("double")), 4).alias("new_c1"),
    )


@op(
    "sim_rerank_two_stage",
    oracle=f"""
        WITH q AS (
            SELECT embedding::DOUBLE[] AS qe,
                   sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                x -> x * x))) AS qnrm
            FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
        ),
        qq AS (
            SELECT qe, list_transform(qe, x -> CAST(floor(x / qnrm * 127.0
                                                          + 0.505) AS BIGINT)) AS qqv
            FROM q
        ),
        cand AS (
            SELECT vec_id, embedding::DOUBLE[] AS e,
                   list_transform(embedding::DOUBLE[],
                       x -> CAST(floor(x / sqrt(list_sum(list_transform(
                                embedding::DOUBLE[], y -> y * y))) * 127.0
                                + 0.505) AS BIGINT)) AS qv
            FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}
        ),
        stage1 AS (
            SELECT vec_id, e,
                   CAST(list_dot_product(qv, qqv) AS BIGINT) AS coarse_score
            FROM cand, qq
            ORDER BY coarse_score DESC, vec_id LIMIT 50
        )
        SELECT vec_id, coarse_score,
               floor(list_cosine_similarity(e, qe) * 1000000.0 + 0.505)
                   / 1000000.0 AS sim
        FROM stage1, qq
        ORDER BY sim DESC, vec_id LIMIT 10
    """,
    scale=(
        "The retrieval cascade: stage 1 scores EVERY vector with the int8 "
        "quantized dot (4× less bandwidth, SIMD-friendly integer math, "
        "exact-deterministic ordering) and keeps 50 via TakeOrdered — "
        "zero shuffles; stage 2 reranks only those 50 with the exact "
        "float cosine. At billions of vectors stage 1 is the only "
        "full-scan cost, and its candidate count (not corpus size) "
        "bounds the expensive math — the cost/recall knob every vector "
        "store exposes."
    ),
)
def sim_rerank_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN: int8-quantized dot-product top-50, exact-cosine
    rerank to top-10 (query = vec_id 0)."""
    emb = emb_with_norm(spark, sf_dir)
    qrow = emb.where(F.col("vec_id") == QUERY_VEC_ID).first()
    qe = [float(x) for x in qrow["embedding"]]
    qnrm = sum(x * x for x in qe) ** 0.5
    import math

    qqv = [int(math.floor(x / qnrm * 127.0 + 0.505)) for x in qe]

    cand = emb.where(F.col("vec_id") != QUERY_VEC_ID)
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(
            x.cast("double") / F.col("norm") * 127.0 + F.lit(0.505)
        ).cast("long"),
    )
    coarse = F.aggregate(
        F.zip_with(
            qv,
            F.array(*[F.lit(v) for v in qqv]),
            lambda a, b: a * b,
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    stage1 = (
        cand.select("vec_id", "embedding", "norm", coarse.alias("coarse_score"))
        .orderBy(F.desc("coarse_score"), F.asc("vec_id"))
        .limit(50)
    )
    dot_expr = F.lit(0.0)
    for i, w in enumerate(qe):
        dot_expr = dot_expr + F.col("embedding")[i].cast("double") * F.lit(w)
    sim = dot_expr / (F.col("norm") * F.lit(qnrm))
    return (
        stage1.select("vec_id", "coarse_score", rnd(sim, 6).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(10)
    )


@op(
    "emb_centroid_diagnostics",
    oracle="""
        WITH expl AS (
            SELECT label, u.i AS pos,
                   embedding[CAST(u.i AS INTEGER)]::DOUBLE AS v
            FROM embeddings, unnest(range(1, 65)) AS u(i)
        ),
        cent AS (SELECT label, pos, avg(v) AS c FROM expl GROUP BY label, pos),
        carr AS (SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label)
        SELECT e.label,
               count(*) AS n_vectors,
               floor((any_value(sqrt(list_sum(list_transform(cv, x -> x * x)))))
                     * 10000.0 + 0.505) / 10000.0 AS centroid_norm,
               floor((avg(list_cosine_similarity(e.embedding::DOUBLE[], cv)))
                     * 10000.0 + 0.505) / 10000.0 AS avg_cos_to_centroid
        FROM embeddings e JOIN carr USING (label)
        GROUP BY e.label
    """,
    scale=(
        "Per-class embedding diagnostics (centroid norm + mean cosine "
        "cohesion — the drift/collapse monitor for embedding pipelines): "
        "centroids are one partial agg over (label, dim) — k·d rows of "
        "mergeable state — broadcast back for the cohesion pass. Two "
        "scans, no row-level shuffle; the same plan feeds kmeans_step "
        "when the diagnostics say re-cluster."
    ),
)
def emb_centroid_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector count, centroid L2 norm, and average cosine of
    members to their centroid."""
    emb = load_table(spark, sf_dir, "embeddings")
    expl = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = expl.groupBy("label", "pos").agg(
        F.avg(F.col("v").cast("double")).alias("c")
    )
    carr = cent.groupBy("label").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").alias(
            "cv"
        )
    )
    joined = emb.join(F.broadcast(carr), "label").select(
        "label",
        l2norm(F.col("cv")).alias("cnorm"),
        cosine(F.col("embedding"), F.col("cv")).alias("cos"),
    )
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        rnd(F.first("cnorm"), 4).alias("centroid_norm"),
        rnd(F.avg("cos"), 4).alias("avg_cos_to_centroid"),
    )


@op(
    "emb_outlier_gate",
    oracle="""
        WITH expl AS (
            SELECT label, vec_id, u.i AS pos,
                   embedding[CAST(u.i AS INTEGER)]::DOUBLE AS v
            FROM embeddings, unnest(range(1, 65)) AS u(i)
        ),
        cent AS (SELECT label, pos, avg(v) AS c FROM expl GROUP BY label, pos),
        carr AS (SELECT label, list(c ORDER BY pos) AS cv FROM cent GROUP BY label),
        coss AS (
            SELECT e.label, e.vec_id,
                   floor(list_cosine_similarity(e.embedding::DOUBLE[], cv)
                         * 1000000.0 + 0.505) / 1000000.0 AS cos
            FROM embeddings e JOIN carr USING (label)
        ),
        stats AS (
            SELECT label,
                   floor(avg(cos) * 1000000.0 + 0.505) / 1000000.0 AS mu,
                   floor(stddev_pop(cos) * 1000000.0 + 0.505) / 1000000.0 AS sd
            FROM coss GROUP BY label
        )
        SELECT c.label,
               count(*) AS n_vectors,
               CAST(count_if(c.cos < s.mu - 2.0 * s.sd) AS BIGINT) AS n_outliers
        FROM coss c JOIN stats s USING (label)
        GROUP BY c.label
    """,
    scale=(
        "Embedding outlier gate (cohesion z-test vs the class centroid): "
        "three broadcast-sized aggregates — centroids (k·d), per-class "
        "cosine moments (k rows) — and two scans; no row-level shuffle. "
        "Every comparison operates on eps-floor-rounded values so the "
        "outlier threshold cut is bit-identical across engines. The "
        "mislabeled/corrupt-vector filter that runs before ANN index "
        "builds."
    ),
)
def emb_outlier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label count of vectors whose centroid-cosine falls more than
    2 population-stddevs below the class mean (rounded thresholds)."""
    emb = load_table(spark, sf_dir, "embeddings")
    expl = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = expl.groupBy("label", "pos").agg(
        F.avg(F.col("v").cast("double")).alias("c")
    )
    carr = cent.groupBy("label").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").alias(
            "cv"
        )
    )
    coss = emb.join(F.broadcast(carr), "label").select(
        "label",
        "vec_id",
        rnd(cosine(F.col("embedding"), F.col("cv")), 6).alias("cos"),
    )
    stats = coss.groupBy("label").agg(
        rnd(F.avg("cos"), 6).alias("mu"),
        rnd(F.stddev_pop("cos"), 6).alias("sd"),
    )
    return (
        coss.join(F.broadcast(stats), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.count_if(
                F.col("cos") < F.col("mu") - F.lit(2.0) * F.col("sd")
            ).alias("n_outliers"),
        )
    )


@op(
    "emb_hamming_knn",
    oracle="""
        WITH sigs AS (
            SELECT vec_id,
                   CAST(list_sum(list_transform(range(1, 33),
                       i -> CASE WHEN embedding[i] > 0
                                 THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT
                            END)) AS BIGINT) AS sig_lo,
                   CAST(list_sum(list_transform(range(33, 65),
                       i -> CASE WHEN embedding[i] > 0
                                 THEN (1::BIGINT << (i - 33)) ELSE 0::BIGINT
                            END)) AS BIGINT) AS sig_hi
            FROM embeddings
        ),
        q AS (SELECT sig_lo AS q_lo, sig_hi AS q_hi FROM sigs WHERE vec_id = 0)
        SELECT s.vec_id,
               CAST(bit_count(xor(s.sig_lo, q.q_lo))
                    + bit_count(xor(s.sig_hi, q.q_hi)) AS INTEGER) AS hamming
        FROM sigs s CROSS JOIN q
        WHERE s.vec_id <> 0
        ORDER BY hamming, s.vec_id
        LIMIT 10
    """,
    scale=(
        "Binary-signature ANN: each 64-dim float vector compresses to a "
        "64-bit sign signature (two 32-bit halves packed into BIGINTs), "
        "and similarity becomes popcount(xor) — 8 bytes per vector instead "
        "of 256, so a 100 TB float corpus becomes a ~3 TB bit corpus that "
        "scans at memory bandwidth. Signatures are computed map-only from "
        "built-in HOF exprs (aggregate over sequence — no UDF); the query "
        "signature is a 1-row broadcast; top-k is TakeOrderedAndProject "
        "(no global sort). The standard first-pass filter before exact "
        "re-ranking (see sim_rerank_two_stage)."
    ),
)
def emb_hamming_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nearest neighbours by sign-bit Hamming distance to vec 0."""
    emb = load_table(spark, sf_dir, "embeddings")

    def sig(lo_bit: int, hi_bit: int, alias: str):
        return F.expr(
            f"aggregate(sequence({lo_bit}, {hi_bit}), 0L, (acc, i) -> "
            f"acc + IF(element_at(embedding, i) > 0, "
            f"shiftleft(1L, i - {lo_bit}), 0L))"
        ).alias(alias)

    sigs = emb.select(
        "vec_id", sig(1, 32, "sig_lo"), sig(33, 64, "sig_hi")
    )
    q = (
        sigs.where(F.col("vec_id") == 0)
        .select(
            F.col("sig_lo").alias("q_lo"), F.col("sig_hi").alias("q_hi")
        )
    )
    return (
        sigs.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                F.bit_count(F.expr("sig_lo ^ q_lo"))
                + F.bit_count(F.expr("sig_hi ^ q_hi"))
            ).cast("int").alias("hamming"),
        )
        .orderBy("hamming", "vec_id")
        .limit(10)
    )


@op(
    "emb_pca_power_iter",
    oracle=f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        x AS (
            SELECT vec_id, CAST(u.i AS INTEGER) AS j, v[u.i + 1] AS x
            FROM e, unnest(range(0, 64)) AS u(i)
        ),
        s1 AS (SELECT vec_id, sum(x) / 8.0 AS s FROM x GROUP BY vec_id),
        v1 AS (
            SELECT j, sum(x.x * s1.s) AS v1
            FROM x JOIN s1 USING (vec_id) GROUP BY j
        ),
        v1n AS (SELECT j, v1 / sqrt(sum(v1 * v1) OVER ()) AS v1n FROM v1),
        s2 AS (
            SELECT vec_id, sum(x.x * v1n.v1n) AS s2
            FROM x JOIN v1n USING (j) GROUP BY vec_id
        ),
        v2 AS (
            SELECT j, sum(x.x * s2.s2) AS v2
            FROM x JOIN s2 USING (vec_id) GROUP BY j
        ),
        nrm AS (SELECT j, v2, sqrt(sum(v2 * v2) OVER ()) AS n2 FROM v2),
        lam AS (
            SELECT sum(v1n.v1n * v2.v2) AS l FROM v1n JOIN v2 USING (j)
        )
        SELECT nrm.j, {sql_rnd("v2 / n2", 4)} AS loading,
               (SELECT {sql_rnd("l")} FROM lam) AS eigenvalue
        FROM nrm
    """,
    scale=(
        "Top principal component by TWO power-iteration matvecs that never "
        "materialize the gram matrix: v_{{t+1}} = Σ_i e_i (e_i·v_t), i.e. "
        "each pass is a per-row dot product (map-only against the broadcast "
        "64-row v_t) followed by a d-row weighted-sum agg — the Krylov "
        "pattern that scales to 100 TB because the shuffle carries d rows "
        "per partition, not d² and not N. Start vector is the constant "
        "1/8-vector so the first dot product folds into a row-local HOF. "
        "The Rayleigh quotient v_t·v_{{t+1}} estimates the eigenvalue. "
        "More iterations = repeat pass 2; convergence is |corpus|-free."
    ),
)
def emb_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two power-iteration steps toward the top PCA loading vector."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("j", "x"),
    )
    s1 = emb.select(
        "vec_id",
        (
            F.aggregate(
                F.col("embedding").cast("array<double>"),
                F.lit(0.0),
                lambda a, b: a + b,
            )
            / F.lit(8.0)
        ).alias("s"),
    )
    v1 = (
        x.join(s1, "vec_id")
        .groupBy("j")
        .agg(F.sum(F.col("x") * F.col("s")).alias("v1"))
    )
    wall = Window.partitionBy()
    v1n = v1.select(
        "j",
        (
            F.col("v1")
            / F.sqrt(F.sum(F.col("v1") * F.col("v1")).over(wall))
        ).alias("v1n"),
    )
    s2 = (
        x.join(F.broadcast(v1n), "j")
        .groupBy("vec_id")
        .agg(F.sum(F.col("x") * F.col("v1n")).alias("s2"))
    )
    v2 = (
        x.join(s2, "vec_id")
        .groupBy("j")
        .agg(F.sum(F.col("x") * F.col("s2")).alias("v2"))
    )
    lam = (
        v2.join(F.broadcast(v1n), "j")
        .agg(rnd(F.sum(F.col("v1n") * F.col("v2"))).alias("eigenvalue"))
    )
    nrm = v2.select(
        "j",
        rnd(
            F.col("v2") / F.sqrt(F.sum(F.col("v2") * F.col("v2")).over(wall)),
            4,
        ).alias("loading"),
    )
    return nrm.crossJoin(F.broadcast(lam))


@op(
    "emb_dim_variance_prune",
    oracle=f"""
        WITH x AS (
            SELECT CAST(u.i AS INTEGER) AS j,
                   (embedding::DOUBLE[])[u.i + 1] AS x
            FROM embeddings, unnest(range(0, 64)) AS u(i)
        ),
        v AS (
            SELECT j, var_pop(x) AS vj FROM x GROUP BY j
        ),
        r AS (
            SELECT j, {sql_rnd("vj", 6)} AS variance,
                   row_number() OVER (
                       ORDER BY {sql_rnd("vj", 6)} DESC, j
                   ) AS rk
            FROM v
        )
        SELECT j, variance, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= 16
    """,
    scale=(
        "Per-dimension variance ranking — the feature-pruning half of "
        "dimensionality reduction (keep the 16 highest-variance dims "
        "before an expensive PCA/OPQ pass). var_pop keeps a 3-value "
        "mergeable moment state per dimension, so the shuffle carries 64 "
        "partials per map task at any corpus size; ranking happens on 64 "
        "rows. Ordering ties break on the rounded variance THEN j so the "
        "cut is engine-identical."
    ),
)
def emb_dim_variance_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-16 embedding dimensions by population variance."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("j", "x")
    )
    v = x.groupBy("j").agg(rnd(F.var_pop("x"), 6).alias("variance"))
    r = v.withColumn(
        "rk",
        F.row_number()
        .over(Window.orderBy(F.desc("variance"), "j"))
        .cast("long"),
    )
    return r.where(F.col("rk") <= 16)


@op(
    "sim_pq_assign",
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        ),
        sub AS (
            SELECT vec_id, s.s AS s, emb[CAST(s.s*8+1 AS BIGINT) : CAST(s.s*8+8 AS BIGINT)] AS v
            FROM e, unnest(range(8)) AS s(s)
        ),
        cw AS (
            SELECT vec_id AS code, s, v AS c FROM sub WHERE vec_id < 8
        ),
        d AS (
            SELECT sub.vec_id, sub.s, cw.code,
                   CAST(floor(list_aggregate(
                       list_transform(range(1, 9),
                                      i -> (sub.v[i]-cw.c[i])*(sub.v[i]-cw.c[i])),
                       'sum') * 10000 + 0.505) AS BIGINT) AS idist
            FROM sub JOIN cw USING (s)
        ),
        a AS (
            SELECT vec_id, s, code, idist,
                   row_number() OVER (PARTITION BY vec_id, s
                                      ORDER BY idist, code) AS rk
            FROM d
        )
        SELECT CAST(s AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code,
               CAST(count(*) AS BIGINT) AS n_assigned,
               floor(sum(idist) / (count(*) * 10000.0) * 10000.0 + 0.505)
                   / 10000.0 AS avg_qerr
        FROM a WHERE rk = 1 GROUP BY s, code
    """,
    scale=(
        "Product quantization assignment — the index-build half of "
        "IVF-PQ, the standard billion-vector ANN format: 64 dims split "
        "into 8 subspaces, each vector's subvector snapped to the nearest "
        "of 8 codewords, compressing 256 B vectors to 8 B codes. The "
        "codebook is 64 tiny rows broadcast everywhere; the per-vector "
        "work is a map-side 8x8 distance table + argmin (no shuffle "
        "beyond the final 64-row histogram). Distances are quantized to "
        "integer 1e-4 units BEFORE argmin/sum so assignment and stats "
        "are bit-identical across engines and partial-agg orders."
    ),
)
def sim_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ: assign each (vector, subspace) to its nearest codeword; emit the
    per-(subspace, code) assignment histogram with mean quantization error.

    Codewords are the first 8 vectors (vec_id < 8) sliced per subspace —
    a deterministic stand-in for per-subspace k-means training.
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    subspaces = F.array(*[F.lit(i) for i in range(8)])
    sub = emb.select(
        "vec_id",
        F.explode(subspaces).alias("s"),
        F.col("embedding").cast("array<double>").alias("emb"),
    ).select(
        "vec_id", "s", F.slice("emb", F.col("s") * 8 + 1, 8).alias("v")
    )
    cw = sub.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("code"), "s", F.col("v").alias("c")
    )
    sqdist = F.aggregate(
        F.zip_with("v", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = sub.join(F.broadcast(cw), "s").select(
        "vec_id",
        "s",
        "code",
        F.floor(sqdist * 10000 + 0.505).cast("long").alias("idist"),
    )
    a = d.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("vec_id", "s").orderBy("idist", "code")
        ),
    ).where(F.col("rk") == 1)
    return a.groupBy(
        F.col("s").cast("long").alias("subspace"),
        F.col("code").cast("long").alias("code"),
    ).agg(
        F.count("*").alias("n_assigned"),
        rnd(F.sum("idist") / (F.count("*") * 10000.0), 4).alias("avg_qerr"),
    )


@op(
    "sim_threshold_sweep",
    oracle="""
        WITH pairs AS (
            SELECT a.vec_id AS va, b.vec_id AS vb,
                   floor((list_cosine_similarity(a.embedding::DOUBLE[],
                                                 b.embedding::DOUBLE[]))
                         * 10000.0 + 0.505) / 10000.0 AS sim
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
        )
        SELECT t.t AS threshold,
               CAST(count(*) FILTER (WHERE sim >= t.t) AS BIGINT) AS n_pairs,
               CAST(count(DISTINCT CASE WHEN sim >= t.t THEN vb END)
                    AS BIGINT) AS n_docs_flagged
        FROM pairs, (VALUES (0.25), (0.30), (0.35), (0.40)) t(t)
        GROUP BY t.t
    """,
    scale=(
        "Dedup-threshold calibration: ONE blocked pair join scanned once, "
        "all candidate thresholds evaluated as conditional aggregates over "
        "the same pair stream — never one pair join per threshold. The "
        "output (pairs + docs removed per threshold) is the curve an "
        "operator reads before committing a near-dup cut on the full "
        "corpus; at 100 TB the pair stream comes from the LSH-band join "
        "and this sweep rides it for free. Counts on ROUNDED sims — "
        "engine-exact set membership at every threshold."
    ),
)
def sim_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair/doc counts at each candidate cosine threshold, from one
    label-blocked pair join (precomputed norms + one dot fold per pair —
    bit-identical to ``cosine``, r12 kernel lesson)."""
    emb = emb_with_norm(spark, sf_dir)
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("b.vec_id").alias("vb"),
        rnd(
            dot(F.col("a.embedding"), F.col("b.embedding"))
            / (F.col("a.norm") * F.col("b.norm")),
            4,
        ).alias("sim"),
    )
    thresholds = F.explode(
        F.array(*[F.lit(t) for t in (0.25, 0.30, 0.35, 0.40)])
    ).alias("threshold")
    return (
        pairs.select("*", thresholds)
        .groupBy("threshold")
        .agg(
            F.count(F.when(F.col("sim") >= F.col("threshold"), 1)).alias(
                "n_pairs"
            ),
            F.countDistinct(
                F.when(F.col("sim") >= F.col("threshold"), F.col("vb"))
            ).alias("n_docs_flagged"),
        )
    )


@op(
    "emb_quantization_recall",
    oracle="""
        WITH sigs AS (
            SELECT vec_id,
                   CAST(list_sum(list_transform(range(1, 33),
                       i -> CASE WHEN embedding[i] > 0
                                 THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT
                            END)) AS BIGINT) AS sig_lo,
                   CAST(list_sum(list_transform(range(33, 65),
                       i -> CASE WHEN embedding[i] > 0
                                 THEN (1::BIGINT << (i - 33)) ELSE 0::BIGINT
                            END)) AS BIGINT) AS sig_hi
            FROM embeddings
        ),
        exact AS (
            SELECT q.vec_id AS q_id, e.vec_id,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                       floor((list_cosine_similarity(e.embedding::DOUBLE[],
                             q.embedding::DOUBLE[])) * 10000.0 + 0.505)
                           / 10000.0 DESC,
                       e.vec_id) AS rk
            FROM embeddings e JOIN embeddings q
              ON q.vec_id < 5 AND e.vec_id <> q.vec_id
        ),
        ham AS (
            SELECT q.vec_id AS q_id, s.vec_id,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                       bit_count(xor(s.sig_lo, qs.sig_lo))
                       + bit_count(xor(s.sig_hi, qs.sig_hi)),
                       s.vec_id) AS rk
            FROM sigs s
            JOIN embeddings q ON q.vec_id < 5 AND s.vec_id <> q.vec_id
            JOIN sigs qs ON qs.vec_id = q.vec_id
        )
        SELECT e.q_id,
               CAST(count(h.vec_id) AS BIGINT) AS n_overlap,
               floor(count(h.vec_id) / 10.0 * 100.0 + 0.505) / 100.0
                   AS recall_at_10
        FROM (SELECT * FROM exact WHERE rk <= 10) e
        LEFT JOIN (SELECT * FROM ham WHERE rk <= 10) h
          ON e.q_id = h.q_id AND e.vec_id = h.vec_id
        GROUP BY e.q_id
    """,
    scale=(
        "Quantization-recall audit — the measurement that licenses the "
        "256B->8B sign-bit compression (emb_hamming_knn) as a first-pass "
        "filter: exact cosine top-10 vs Hamming top-10 overlap for a "
        "query panel. Both retrieval paths are broadcast-query scans "
        "(no corpus self-shuffle); the audit runs on a sampled panel at "
        "100 TB, and its recall@k output sets the re-rank depth in "
        "sim_rerank_two_stage (recall too low -> widen the candidate "
        "pool, never trust the bits blindly)."
    ),
)
def emb_quantization_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of sign-bit Hamming retrieval vs exact cosine, for query
    vectors 0..4."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")

    def sig(lo_bit: int, hi_bit: int, alias: str):
        return F.expr(
            f"aggregate(sequence({lo_bit}, {hi_bit}), 0L, (acc, i) -> "
            f"acc + IF(element_at(embedding, i) > 0, "
            f"shiftleft(1L, i - {lo_bit}), 0L))"
        ).alias(alias)

    sigs = emb.select("vec_id", sig(1, 32, "sig_lo"), sig(33, 64, "sig_hi"))
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    qsigs = sigs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("sig_lo").alias("q_lo"),
        F.col("sig_hi").alias("q_hi"),
    )
    exact = (
        emb.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            rnd(cosine(F.col("embedding"), F.col("q_emb")), 4).alias("sim"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("sim"), "vec_id")
            ),
        )
        .where(F.col("rk") <= 10)
    )
    ham = (
        sigs.crossJoin(F.broadcast(qsigs))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (
                F.bit_count(F.expr("sig_lo ^ q_lo"))
                + F.bit_count(F.expr("sig_hi ^ q_hi"))
            ).alias("hd"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy("hd", "vec_id")
            ),
        )
        .where(F.col("rk") <= 10)
    )
    joined = exact.select("q_id", "vec_id").join(
        ham.select(F.col("q_id").alias("hq"), F.col("vec_id").alias("hv")),
        (F.col("q_id") == F.col("hq")) & (F.col("vec_id") == F.col("hv")),
        "left",
    )
    return joined.groupBy("q_id").agg(
        F.count("hv").alias("n_overlap"),
        rnd(F.count("hv") / 10.0, 2).alias("recall_at_10"),
    )


@op(
    "emb_mips_transform",
    oracle="""
        WITH norms AS (
            SELECT vec_id, label,
                   sqrt(list_aggregate(list_transform(
                       CAST(embedding AS DOUBLE[]), x -> x * x), 'sum'))
                       AS nrm
            FROM embeddings
        ),
        m AS (SELECT max(nrm) AS mx FROM norms),
        aug AS (
            SELECT label, nrm,
                   sqrt(mx * mx - nrm * nrm) AS aug_dim,
                   floor(sqrt(nrm * nrm + (mx * mx - nrm * nrm))
                         * 10000.0 + 0.505) / 10000.0 AS aug_norm,
                   floor(mx * 10000.0 + 0.505) / 10000.0 AS mx_r
            FROM norms, m
        )
        SELECT label,
               CAST(count(*) AS BIGINT) AS n,
               floor(avg(aug_dim) * 10000.0 + 0.505) / 10000.0 AS avg_aug_dim,
               CAST(count(*) FILTER (WHERE aug_norm = mx_r) AS BIGINT)
                   AS n_norm_equalized
        FROM aug GROUP BY label
    """,
    scale=(
        "MIPS-to-cosine reduction (asymmetric augmentation): append one "
        "dimension sqrt(M^2 - ||x||^2) so every corpus vector's norm "
        "equals the global max M — after which maximum inner product "
        "search IS cosine search and every cosine-ANN structure "
        "(sim_ann_lsh, sim_pq_assign, emb_hamming_knn) applies "
        "unchanged. M is a 1-row broadcast max; the augmentation is "
        "map-only; the op audits that equalization holds (rounded) for "
        "every vector. The standard index-prep step for recommender "
        "retrieval at scale."
    ),
)
def emb_mips_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Augment vectors with the MIPS dimension; audit per-label that all
    augmented norms equal the global max norm."""
    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select("vec_id", "label", l2norm(F.col("embedding")).alias("nrm"))
    m = norms.agg(F.max("nrm").alias("mx"))
    aug = norms.crossJoin(F.broadcast(m)).select(
        "label",
        F.sqrt(F.col("mx") * F.col("mx") - F.col("nrm") * F.col("nrm")).alias(
            "aug_dim"
        ),
        rnd(
            F.sqrt(
                F.col("nrm") * F.col("nrm")
                + (F.col("mx") * F.col("mx") - F.col("nrm") * F.col("nrm"))
            ),
            4,
        ).alias("aug_norm"),
        rnd(F.col("mx"), 4).alias("mx_r"),
    )
    return aug.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        rnd(F.avg("aug_dim"), 4).alias("avg_aug_dim"),
        F.count(F.when(F.col("aug_norm") == F.col("mx_r"), 1)).alias(
            "n_norm_equalized"
        ),
    )


@op(
    "sim_index_build_report",
    oracle="""
        WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c,
                          CAST(count(DISTINCT label) AS BIGINT) AS k
                   FROM embeddings)
        SELECT 'float_vectors' AS artifact, c AS rows,
               CAST(c * 256 AS BIGINT) AS bytes_est FROM n
        UNION ALL
        SELECT 'l2_norms', c, CAST(c * 8 AS BIGINT) FROM n
        UNION ALL
        SELECT 'sign_bits', c, CAST(c * 8 AS BIGINT) FROM n
        UNION ALL
        SELECT 'pq_codes', c, CAST(c * 8 AS BIGINT) FROM n
        UNION ALL
        SELECT 'ivf_centroids', k, CAST(k * 256 AS BIGINT) FROM n
    """,
    scale=(
        "Vector-index build manifest — the artifact inventory one "
        "index-build job produces in a single corpus pass: raw floats "
        "(256 B/vec), L2 norms (8 B), sign-bit signatures (8 B), PQ "
        "codes (8 B), and |labels| IVF centroids — i.e. the 32x "
        "compression ladder (sim_knn_cosine -> emb_hamming_knn -> "
        "sim_pq_assign -> sim_ivf_probe) priced in bytes. At 100 TB "
        "this report is what decides which tier fits in executor "
        "memory; all counts are one tiny aggregate."
    ),
)
def sim_index_build_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-cost inventory of every ANN index artifact for the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.agg(
        F.count(F.lit(1)).alias("c"),
        F.countDistinct("label").alias("k"),
    )
    rows = []
    for name, cnt, per in [
        ("float_vectors", "c", 256),
        ("l2_norms", "c", 8),
        ("sign_bits", "c", 8),
        ("pq_codes", "c", 8),
        ("ivf_centroids", "k", 256),
    ]:
        rows.append(
            n.select(
                F.lit(name).alias("artifact"),
                F.col(cnt).alias("rows"),
                (F.col(cnt) * per).cast("long").alias("bytes_est"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@op(
    "emb_knn_graph",
    oracle="""
        WITH pairs AS (
            SELECT a.label AS label, a.vec_id AS src, b.vec_id AS dst,
                   floor((list_cosine_similarity(a.embedding::DOUBLE[],
                                                 b.embedding::DOUBLE[]))
                         * 10000.0 + 0.505) / 10000.0 AS sim
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id <> b.vec_id
        ),
        knn AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY src ORDER BY sim DESC, dst) AS rn
                FROM pairs
            ) WHERE rn <= 3
        )
        SELECT k1.label, k1.src AS vec_a, k1.dst AS vec_b, k1.sim
        FROM knn k1 JOIN knn k2
          ON k1.src = k2.dst AND k1.dst = k2.src
        WHERE k1.src < k1.dst
    """,
    scale=(
        "Mutual-kNN graph (the edge set behind kNN-graph clustering and "
        "agglomerative dedup): candidate pairs come from the label block "
        "(stand-in for an LSH/IVF bucket), per-source top-3 is a window "
        "over the block, and mutuality is an equi-self-join on the "
        "directed edge list — which is k·n rows, NOT n², so the join "
        "after the window is linear in corpus size. Rounding happens "
        "BEFORE ranking so tie order is engine-identical. At 100 TB the "
        "block join is the only quadratic term and is bounded by bucket "
        "size, same ladder as sim_pairwise_topk."
    ),
)
def emb_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual top-3 cosine-neighbor edges within each label block."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.label").alias("label"),
        F.col("a.vec_id").alias("src"),
        F.col("b.vec_id").alias("dst"),
        rnd(cosine(F.col("a.embedding"), F.col("b.embedding")), 4).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    knn = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )
    k1 = knn.alias("k1")
    k2 = knn.alias("k2")
    return (
        k1.join(
            k2,
            (F.col("k1.src") == F.col("k2.dst"))
            & (F.col("k1.dst") == F.col("k2.src")),
        )
        .where(F.col("k1.src") < F.col("k1.dst"))
        .select(
            F.col("k1.label").alias("label"),
            F.col("k1.src").alias("vec_a"),
            F.col("k1.dst").alias("vec_b"),
            F.col("k1.sim").alias("sim"),
        )
    )


@op(
    "emb_centroid_confusion",
    oracle="""
        WITH c AS (
            SELECT label AS clabel, i.i AS pos,
                   floor((avg(embedding[i.i])) * 1000000.0 + 0.505)
                       / 1000000.0 AS cval
            FROM embeddings, range(1, 65) i(i)
            GROUP BY 1, 2
        ),
        cn AS (SELECT clabel, sqrt(sum(cval * cval)) AS cnorm
               FROM c GROUP BY clabel),
        v AS (
            SELECT vec_id, label AS tlabel, i.i AS pos,
                   CAST(embedding[i.i] AS DOUBLE) AS val
            FROM embeddings, range(1, 65) i(i)
        ),
        vn AS (SELECT vec_id, sqrt(sum(val * val)) AS vnorm
               FROM v GROUP BY vec_id),
        dots AS (
            SELECT v.vec_id, v.tlabel, c.clabel,
                   sum(v.val * c.cval) AS d
            FROM v JOIN c USING (pos) GROUP BY 1, 2, 3
        ),
        scored AS (
            SELECT vec_id, tlabel, clabel,
                   floor((d / (vnorm * cnorm)) * 1000000.0 + 0.505)
                       / 1000000.0 AS cos
            FROM dots JOIN vn USING (vec_id) JOIN cn USING (clabel)
        ),
        assigned AS (
            SELECT tlabel, clabel FROM (
                SELECT tlabel, clabel, row_number() OVER (
                    PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn
                FROM scored
            ) WHERE rn = 1
        )
        SELECT tlabel AS true_label, clabel AS assigned_label,
               CAST(count(*) AS BIGINT) AS n
        FROM assigned GROUP BY 1, 2
    """,
    scale=(
        "Nearest-centroid confusion matrix — the cluster-quality eval "
        "behind every IVF/k-means index decision. Centroids reduce to "
        "|labels| x dims rows (partial agg), both norm tables are "
        "grouped sums, and the score join fans each vector out only "
        "k=|labels| ways (posexplode join on pos, re-agg per (vec, "
        "centroid)) — linear in corpus x k, never corpus x corpus. "
        "Centroid values round to 1e-6 BEFORE the dot so the argmax "
        "ordering is bit-stable across engines and partition orders. "
        "The confusion aggregate is k x k rows; at 100 TB this whole "
        "eval is one pass over the vectors plus broadcast-sized side "
        "tables."
    ),
)
def emb_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of true label vs nearest-centroid assignment."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.col("label").alias("tlabel"),
        F.posexplode("embedding").alias("p", "raw"),
    ).select(
        "vec_id",
        "tlabel",
        (F.col("p") + 1).alias("pos"),
        F.col("raw").cast("double").alias("val"),
    )
    c = v.groupBy(
        F.col("tlabel").alias("clabel"), "pos"
    ).agg(rnd(F.avg("val"), 6).alias("cval"))
    cn = c.groupBy("clabel").agg(
        F.sqrt(F.sum(F.col("cval") * F.col("cval"))).alias("cnorm")
    )
    vn = v.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("vnorm")
    )
    dots = (
        v.join(F.broadcast(c), "pos")
        .groupBy("vec_id", "tlabel", "clabel")
        .agg(F.sum(F.col("val") * F.col("cval")).alias("d"))
    )
    scored = (
        dots.join(vn, "vec_id")
        .join(F.broadcast(cn), "clabel")
        .select(
            "vec_id",
            "tlabel",
            "clabel",
            rnd(F.col("d") / (F.col("vnorm") * F.col("cnorm")), 6).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("clabel"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return assigned.groupBy(
        F.col("tlabel").alias("true_label"),
        F.col("clabel").alias("assigned_label"),
    ).agg(F.count(F.lit(1)).alias("n"))


def _rp_sign_sql() -> str:
    h = (
        "CAST(('0x' || substring(md5(CAST(i.i AS VARCHAR) || ':' "
        "|| CAST(j.j AS VARCHAR)), 1, 15)) AS BIGINT)"
    )
    return f"""
        SELECT i.i AS i, j.j AS j,
               CASE WHEN {h} % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
        FROM range(1, 65) i(i), range(1, 17) j(j)
    """


@op(
    "emb_random_projection",
    oracle=f"""
        WITH sel AS (
            SELECT vec_id, embedding::DOUBLE[] AS e
            FROM embeddings WHERE vec_id < 20
        ),
        dims AS (
            SELECT vec_id, i.i AS i, e[i.i] AS v
            FROM sel, range(1, 65) i(i)
        ),
        signs AS ({_rp_sign_sql()}),
        proj AS (
            SELECT d.vec_id, s.j, sum(d.v * s.s) / 4.0 AS p
            FROM dims d JOIN signs s USING (i) GROUP BY 1, 2
        ),
        d_orig AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   sqrt(sum((a.v - b.v) * (a.v - b.v))) AS dd
            FROM dims a JOIN dims b
              ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2
        ),
        d_proj AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   sqrt(sum((a.p - b.p) * (a.p - b.p))) AS dp
            FROM proj a JOIN proj b
              ON a.j = b.j AND a.vec_id < b.vec_id
            GROUP BY 1, 2
        )
        SELECT o.vec_a, o.vec_b,
               floor(o.dd * 10000.0 + 0.505) / 10000.0 AS dist_64d,
               floor(p.dp * 10000.0 + 0.505) / 10000.0 AS dist_16d,
               floor((p.dp / o.dd) * 10000.0 + 0.505) / 10000.0
                   AS distortion
        FROM d_orig o JOIN d_proj p USING (vec_a, vec_b)
    """,
    scale=(
        "Johnson-Lindenstrauss random projection 64d -> 16d entirely as "
        "relational ops: the sign matrix is DERIVED (md5 parity of "
        "(i, j) — no stored state, any executor regenerates any tile "
        "deterministically, which is how a projection matrix ships to "
        "1000 executors for free), the projection is an explode-join-"
        "reagg per vector (linear, mergeable partials), and the audit "
        "joins projected vs original pairwise distances on a bounded "
        "panel. Distortion hovering near 1.0 is the JL guarantee the "
        "16d index relies on; this op IS that certification. At 100 TB "
        "project once at ingest, search in 16d, re-rank survivors in "
        "64d (sim_rerank_two_stage)."
    ),
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL-project a vector panel 64d->16d and audit pairwise distortion."""
    from python_kinesis_streaming_spark.llm.dedup import md5_hash64

    emb = load_table(spark, sf_dir, "embeddings")
    dims = (
        emb.where(F.col("vec_id") < 20)
        .select("vec_id", F.posexplode("embedding").alias("p", "raw"))
        .select(
            "vec_id",
            (F.col("p") + 1).alias("i"),
            F.col("raw").cast("double").alias("v"),
        )
    )
    signs = (
        spark.range(1, 65)
        .select(F.col("id").cast("int").alias("i"))
        .crossJoin(
            spark.range(1, 17).select(F.col("id").cast("int").alias("j"))
        )
        .select(
            "i",
            "j",
            F.when(
                md5_hash64(F.concat_ws(":", F.col("i"), F.col("j"))) % 2
                == 0,
                1.0,
            ).otherwise(-1.0).alias("s"),
        )
    )
    proj = (
        dims.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg((F.sum(F.col("v") * F.col("s")) / 4.0).alias("p"))
    )

    def pair_dist(df, key, val):
        a, b = df.alias("a"), df.alias("b")
        return (
            a.join(
                b,
                (F.col(f"a.{key}") == F.col(f"b.{key}"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .groupBy(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
            )
            .agg(
                F.sqrt(
                    F.sum(
                        (F.col(f"a.{val}") - F.col(f"b.{val}"))
                        * (F.col(f"a.{val}") - F.col(f"b.{val}"))
                    )
                ).alias("d")
            )
        )

    d_orig = pair_dist(dims, "i", "v").withColumnRenamed("d", "dd")
    d_proj = pair_dist(proj, "j", "p").withColumnRenamed("d", "dp")
    return d_orig.join(d_proj, ["vec_a", "vec_b"]).select(
        "vec_a",
        "vec_b",
        rnd(F.col("dd"), 4).alias("dist_64d"),
        rnd(F.col("dp"), 4).alias("dist_16d"),
        rnd(F.col("dp") / F.col("dd"), 4).alias("distortion"),
    )
