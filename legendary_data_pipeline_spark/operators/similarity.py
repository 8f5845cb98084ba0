"""Similarity search over embedding columns (SURVEY.md §2.11).

`embeddings` table: `vec_id, embedding array<float>, label`.

- `cosine_topk` — brute-force exact top-k: candidate join (optionally
  label-blocked) → cosine via array `zip_with`/`aggregate` (JVM-side,
  no Python) → window top-k. The baseline; exact and oracle-checkable.
- `lsh_bucket_topk` — scale path: random-hyperplane-style signs from
  deterministic md5 projections bucket vectors; top-k runs within
  buckets only. Approximate (rows-only check).

Scale design (100 TB): brute force is O(Q×N); block it (label, LSH
bucket, IVF coarse centroid) so each probe touches a small candidate
set. The query side should be broadcast when small. Math stays in
`array<double>` to make results reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.ranking import top_k_per_group


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot_expr(a: str, b: str) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: str) -> Column:
    return F.sqrt(
        F.aggregate(F.col(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk(
    embeddings: DataFrame,
    k: int = 3,
    query_filter: Column | None = None,
    block_on_label: bool = True,
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Rounds the similarity before ranking so ordering (and therefore the
    selected top-k) is stable across engines/retries; ties break on
    neighbor id.
    """
    base = embeddings.select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("vec")
    )
    queries = base if query_filter is None else base.filter(query_filter)
    queries = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("vec").alias("q_vec"),
        norm_expr("vec").alias("q_norm"),
    )
    cands = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("vec").alias("c_vec"),
        norm_expr("vec").alias("c_norm"),
    )
    if block_on_label:
        joined = queries.join(cands, F.col("q_label") == F.col("c_label"))
    else:
        joined = queries.crossJoin(cands)
    joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    cos = F.round(
        dot_expr("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")),
        round_digits,
    )
    scored = joined.select("query_id", "neighbor_id", cos.alias("cos_sim"))
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "rank", "cos_sim")


def ivf_topk(
    embeddings: DataFrame,
    n_centroids: int = 32,
    n_probe: int = 4,
    k: int = 3,
    query_filter: Column | None = None,
    seed: int = 42,
) -> DataFrame:
    """IVF-style approximate top-k: KMeans coarse quantizer + multi-probe.

    Train a small KMeans codebook (`pyspark.ml`), assign every vector to
    its nearest centroid (the inverted list), and search each query only
    against its `n_probe` closest lists. The classic IVF trade: recall
    rises with n_probe, cost falls with n_centroids. At 100 TB the
    codebook is trained on a sample and the assignment is a broadcast of
    `n_centroids` vectors — no shuffle on the corpus beyond the top-k.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = embeddings.select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("vec")
    ).withColumn("features", array_to_vector("vec"))
    # KMeans iterates over its input — cache the (tiny) feature frame so
    # each iteration doesn't re-scan/re-cast the source. A coarse
    # quantizer doesn't need convergence: few iterations on a sample
    # give the same bucketing quality (the standard IVF training shape:
    # train on a sample, assign everything).
    # Coalesce hard: the sample is tiny and every KMeans iteration
    # schedules one task per partition — 64 partitions of ~15 rows each
    # is pure scheduler overhead.
    train = base.select("features").sample(0.2, seed=seed).coalesce(4).cache()
    if train.count() < n_centroids * 10:
        train.unpersist()
        train = base.select("features").coalesce(4).cache()
        train.count()
    # A coarse quantizer needs rough centroids, not convergence — 5
    # iterations on the sample is plenty for list balance.
    km = KMeans(k=n_centroids, seed=seed, featuresCol="features", maxIter=5)
    model = km.fit(train)
    train.unpersist()
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    spark = embeddings.sparkSession
    centers_df = spark.createDataFrame(
        centers, "centroid_id int, center array<double>"
    )

    # Inverted lists: the model's native JVM assignment (one pass, no
    # per-row Python or interpreted distance lambdas).
    assignment = model.transform(base).select(
        "vec_id", "label", "vec", F.col("prediction").alias("centroid_id")
    )
    cands = assignment.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vec").alias("c_vec"),
        norm_expr("vec").alias("c_norm"),
        "centroid_id",
    )

    # Probe lists: centroid distances computed for QUERY vectors only —
    # queries × n_centroids stays tiny even when the corpus doesn't.
    q_base = base if query_filter is None else base.filter(query_filter)
    with_centers = q_base.crossJoin(F.broadcast(centers_df))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("vec"), F.col("center"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    ranked = with_centers.select(
        "vec_id", "vec", "centroid_id", dist.alias("dist")
    )
    probes = top_k_per_group(
        ranked, ["vec_id"], [F.col("dist").asc(), F.col("centroid_id").asc()],
        k=n_probe, rank_col="__r",
    )
    queries = probes.select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("q_vec"),
        norm_expr("vec").alias("q_norm"),
        "centroid_id",
    )
    joined = queries.join(cands, "centroid_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.round(
        dot_expr("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 6
    )
    scored = joined.select(
        "query_id", "neighbor_id", cos.alias("cos_sim")
    ).dropDuplicates(["query_id", "neighbor_id"])
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "rank", "cos_sim")


def embedding_cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    block_on_label: bool = True,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos ≥ threshold).

    The dedup-by-embedding operator: label-blocked self-join (at 100 TB,
    block on an LSH bucket or IVF centroid instead of / in addition to
    the label), cosine JVM-side, threshold filter pushed into the join
    output before any further shuffle.
    """
    base = embeddings.select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("vec")
    ).select(
        "vec_id", "label", "vec", norm_expr("vec").alias("nrm")
    )
    a = base.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("label_a"),
        F.col("vec").alias("vec_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = base.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("label_b"),
        F.col("vec").alias("vec_b"),
        F.col("nrm").alias("nrm_b"),
    )
    if block_on_label:
        cond = (F.col("label_a") == F.col("label_b")) & (
            F.col("id_a") < F.col("id_b")
        )
    else:
        cond = F.col("id_a") < F.col("id_b")
    joined = a.join(b, cond)
    cos = F.round(
        dot_expr("vec_a", "vec_b") / (F.col("nrm_a") * F.col("nrm_b")),
        round_digits,
    )
    return (
        joined.select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    planes: int = 8,
    k: int = 3,
    query_filter: Column | None = None,
) -> DataFrame:
    """Approximate top-k: sign-bucket vectors, search within buckets.

    The "hyperplanes" are deterministic pseudo-random ±1 projections
    derived from md5 of (plane, dimension) — reproducible without any
    stored model. Recall improves with fewer planes (bigger buckets) or
    multi-probe; this is the scale path, checked rows-only.

    The sign matrix depends only on (plane, dim), so it is computed ONCE
    driver-side (Python md5 == engine md5) and shipped as literal arrays
    — per-row work is just `planes` fused multiply-adds over the vector,
    not per-row hashing.
    """
    import hashlib

    base = embeddings.select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("vec")
    )
    dim = base.select(F.size("vec").alias("d")).first()["d"]

    def sign_of(p: int, d: int) -> float:
        h = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16)
        return 1.0 if h % 2 == 0 else -1.0

    def plane_sign(p: int) -> Column:
        signs = F.array(*[F.lit(sign_of(p, d)) for d in range(dim)])
        proj = F.aggregate(
            F.zip_with(F.col("vec"), signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))

    bucket = None
    for p in range(planes):
        bit = plane_sign(p) * (2**p)
        bucket = bit if bucket is None else bucket + bit
    bucketed = base.withColumn("bucket", bucket)

    queries = bucketed if query_filter is None else bucketed.filter(query_filter)
    queries = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket").alias("q_bucket"),
        F.col("vec").alias("q_vec"),
        norm_expr("vec").alias("q_norm"),
    )
    cands = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("bucket").alias("c_bucket"),
        F.col("vec").alias("c_vec"),
        norm_expr("vec").alias("c_norm"),
    )
    joined = queries.join(cands, F.col("q_bucket") == F.col("c_bucket")).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.round(
        dot_expr("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), 6
    )
    scored = joined.select("query_id", "neighbor_id", cos.alias("cos_sim"))
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "rank", "cos_sim")
