"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k, fully JVM-side (``zip_with`` dot
product + ``aggregate`` — no UDF).  Scale path: random-hyperplane LSH
bucketing so the pairwise step only runs within buckets, and an
IVF-style coarse quantizer (nearest of K deterministic centroids).

At 100 TB the brute-force path is only ever used *per bucket / per
probe list*; the bucket id is the shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> F.Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_to_query(
    df: DataFrame, vec_col: str, id_col: str, query: list[float], k: int = 10
) -> DataFrame:
    """Brute-force top-k by cosine to a literal query vector.
    One scan + one top-k (no shuffle of the vectors themselves)."""
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col), cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def hyperplane_lsh_bucket(vec_col, hyperplanes: list[list[float]]) -> F.Column:
    """Sign-bit bucket id from deterministic hyperplanes (seeded off-line).
    bucket = sum_b (dot(v, h_b) > 0) << b  — all JVM-side."""
    bucket = F.lit(0)
    for b, h in enumerate(hyperplanes):
        hcol = F.array(*[F.lit(float(x)) for x in h])
        bit = F.when(dot(vec_col, hcol) > 0, F.lit(1 << b)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def make_hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def ann_bucketed_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_planes: int = 8,
    seed: int = 42,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding near-dup pairs: hyperplane-LSH bucket join, exact cosine
    verification within bucket.  The cross product never leaves a bucket."""
    head = df.select(vec_col).first()
    if head is None or head[0] is None:
        # empty input: no pairs, correct schema
        return df.sparkSession.createDataFrame([], "id_a long, id_b long, cos_sim double")
    dim = len(head[0])
    planes = make_hyperplanes(n_planes, dim, seed)
    v = df.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__bucket", hyperplane_lsh_bucket(F.col("__v"), planes))
    l, r = v.alias("l"), v.alias("r")
    pairs = l.join(
        r,
        (F.col("l.__bucket") == F.col("r.__bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        cosine(F.col("l.__v"), F.col("r.__v")).alias("cos_sim"),
    )
    return pairs.where(F.col("cos_sim") >= threshold)


def ivf_assign(df: DataFrame, vec_col: str, id_col: str, centroids: list[list[float]]) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (max cosine).  Centroids come from any off-line source; here a
    deterministic seeded sample stands in for k-means."""
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v"))
    best_id, best_sim = None, None
    for ci, c in enumerate(centroids):
        ccol = F.array(*[F.lit(float(x)) for x in c])
        sim = cosine(F.col("__v"), ccol)
        if best_sim is None:
            best_id, best_sim = F.lit(ci), sim
        else:
            cond = sim > best_sim
            best_id = F.when(cond, F.lit(ci)).otherwise(best_id)
            best_sim = F.when(cond, sim).otherwise(best_sim)
    return v.select(F.col(id_col), best_id.alias("centroid_id"), best_sim.alias("centroid_sim"))


def ivf_topk_to_query(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF search: probe the n_probe centroids nearest the query, scan only
    their inverted lists.  Recall < 1 by design; the brute-force variant is
    the correctness baseline."""
    import numpy as np

    qv = np.asarray(query, dtype=float)
    cs = np.asarray(centroids, dtype=float)
    sims = (cs @ qv) / (np.linalg.norm(cs, axis=1) * np.linalg.norm(qv) + 1e-12)
    probe = [int(i) for i in np.argsort(-sims)[:n_probe]]
    assigned = ivf_assign(df, vec_col, id_col, centroids)
    shortlist = df.join(
        assigned.where(F.col("centroid_id").isin(probe)).select(id_col), on=id_col
    )
    return cosine_topk_to_query(shortlist, vec_col, id_col, query, k)
