"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: one scan, expression-only dot
product (``zip_with`` + ``aggregate`` — JVM-side, no Python), then a global
top-k (TakeOrderedAndProject — no full sort). The scale path is IVF: a coarse
k-means-ish partition (deterministic seeded centroids), each vector assigned
to its nearest centroid at write time; a query probes only ``n_probe``
centroid buckets — at 10^12 rows that's the difference between scanning
everything and scanning ~n_probe/n_centroids of it. An LSH (random
hyperplane) bucketing variant covers the dedup-style use.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_to_query(df: DataFrame, vec_col: str, query: list[float]):
    q = F.array(*[F.lit(float(x)) for x in query])
    return _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))


def brute_force_topk(
    df: DataFrame, vec_col: str, id_col: str, query: list[float], k: int = 10
) -> DataFrame:
    """Exact cosine top-k vs a query vector. Deterministic tie-break on id.

    The orderBy+limit lowers to TakeOrderedAndProject: per-partition heap of
    size k, merge on driver — O(n) scan, no shuffle of the full table."""
    scored = df.select(
        F.col(id_col), cosine_to_query(df, vec_col, query).alias("cos_sim")
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def ivf_assign(df: DataFrame, vec_col: str, id_col: str, centroids: list[list[float]]) -> DataFrame:
    """Assign each vector to its nearest (cosine) centroid — the IVF build
    pass. Expression-only: one struct-array argmax, no UDF, no shuffle."""
    scored = [
        F.struct(
            cosine_to_query(df, vec_col, c).alias("sim"), F.lit(i).alias("cid")
        )
        for i, c in enumerate(centroids)
    ]
    best = F.array_max(F.array(*scored))  # struct compare: sim first, cid breaks ties
    return df.select(F.col(id_col), F.col(vec_col), best["cid"].alias("centroid_id"))


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF search: probe the n_probe centroids nearest the query, brute-force
    within those buckets only. At scale the assignment is precomputed and the
    table is partitioned by centroid_id → partition pruning does the skip."""
    qv = np.asarray(query, dtype=np.float64)

    def cos(c):
        cv = np.asarray(c, dtype=np.float64)
        return float(cv @ qv / (np.linalg.norm(cv) * np.linalg.norm(qv)))

    probe = sorted(range(len(centroids)), key=lambda i: (-cos(centroids[i]), i))[:n_probe]
    assigned = ivf_assign(df, vec_col, id_col, centroids)
    cand = assigned.filter(F.col("centroid_id").isin(probe))
    return brute_force_topk(cand, vec_col, id_col, query, k)


def _cos_cols(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def ivf_centroids(df: DataFrame, vec_col: str, id_col: str, k: int = 32) -> DataFrame:
    """Deterministic distributed centroid init: rank vectors by
    md5(id) and take the k smallest — a uniform reproducible sample that
    lowers to TakeOrderedAndProject (per-partition top-k heaps; the driver
    never materializes vectors, and the result STAYS a DataFrame). md5 (not
    xxhash64) so an external SQL oracle reproduces the exact sample.
    Returns (cid, cvec)."""
    return (
        df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy(F.md5(F.col("cid").cast("string")), "cid")
        .limit(k)
    )


def ivf_assign_distributed(
    df: DataFrame, vec_col: str, id_col: str, centroids: DataFrame
) -> DataFrame:
    """IVF build pass with the centroid set as a DATAFRAME (vs ivf_assign's
    inlined literals, which requires a driver collect): broadcast the k-row
    centroid table, argmax cosine per vector via one max-of-struct
    aggregation. Zero driver-side vector state at any table size.
    Returns (id, vec, centroid_id)."""
    # both norms are pair-invariant: compute each ONCE (per vector / per
    # centroid) instead of once per (vector, centroid) cell — identical
    # expressions, identical bits, 1/k the sqrt+fold work
    j = (
        df.select(
            F.col(id_col), F.col(vec_col), _norm(F.col(vec_col)).alias("__nv")
        )
        .crossJoin(
            F.broadcast(centroids.withColumn("__nc", _norm(F.col("cvec"))))
        )
    )
    sim = _dot(F.col(vec_col), F.col("cvec")) / (F.col("__nv") * F.col("__nc"))
    # struct compare: sim first, cid breaks ties deterministically; the vec
    # field is never reached by the comparison (cid is unique) and just rides
    # along so no second join is needed to recover it
    best = (
        j.groupBy(id_col)
        .agg(
            F.max(
                F.struct(sim.alias("sim"), F.col("cid"), F.col(vec_col).alias("v"))
            ).alias("b")
        )
        .select(
            F.col(id_col),
            F.col("b.v").alias(vec_col),
            F.col("b.cid").alias("centroid_id"),
        )
    )
    return best


def ivf_topk_distributed(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int = 10,
    n_centroids: int = 32,
    n_probe: int = 2,
) -> DataFrame:
    """Fully declarative IVF search — centroid init, probe selection,
    assignment, and candidate top-k are ALL DataFrame ops (no collect
    anywhere): probe = the n_probe centroids nearest the query (tiny
    orderBy+limit), candidates = vectors assigned to a probed centroid
    (broadcast semi-join), then exact top-k. At scale the assignment is
    precomputed and the table partitioned by centroid_id → the probe join
    becomes partition pruning."""
    cents = ivf_centroids(df, vec_col, id_col, k=n_centroids)
    q = F.array(*[F.lit(float(x)) for x in query])
    probe = (
        cents.select("cid", "cvec", _cos_cols(F.col("cvec"), q).alias("qs"))
        .orderBy(F.desc("qs"), "cid")
        .limit(n_probe)
        .select("cid")
    )
    assigned = ivf_assign_distributed(df, vec_col, id_col, cents)
    cand = assigned.join(
        F.broadcast(probe), assigned.centroid_id == probe.cid
    ).select(id_col, vec_col)
    return brute_force_topk(cand, vec_col, id_col, query, k)


def _bucket_bits(vec_col: str, n_planes: int, seed: int, dim: int):
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bits = [
        F.when(_dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in p])) >= 0, "1").otherwise("0")
        for p in planes
    ]
    return F.concat(*bits)


def hyperplane_lsh_buckets(
    df: DataFrame, vec_col: str, id_col: str, n_planes: int = 16, seed: int = 42, dim: int = 64
) -> DataFrame:
    """Random-hyperplane LSH: sign pattern of <v, h_i> → bucket string.
    Deterministic seeded planes; expression-only dot products."""
    return df.select(
        F.col(id_col), _bucket_bits(vec_col, n_planes, seed, dim).alias("bucket")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: candidate pairs
    share a hyperplane-LSH bucket (equi-join, never all-pairs), then exact
    cosine verifies. Fewer planes → wider buckets → higher recall at more
    verify cost; hot buckets are bounded like MinHash-LSH. A vector lives in
    exactly one bucket, so no pair dedup pass is needed.
    Returns (id_a, id_b, cos_sim) with id_a < id_b, cos_sim >= threshold."""
    # norm is computed ONCE per vector here (identical expression, identical
    # bits) instead of once per candidate PAIR side below — the verify join
    # then only evaluates the dot product per pair (guide §1.2 step 2:
    # don't recompute what a cheaper stage already knows)
    withb = df.select(
        F.col(id_col),
        F.col(vec_col),
        _bucket_bits(vec_col, n_planes, seed, dim).alias("bucket"),
        _norm(F.col(vec_col)).alias("nrm"),
    )
    sizes = withb.groupBy("bucket").agg(F.count(F.lit(1)).alias("sz")).filter(
        (F.col("sz") > 1) & (F.col("sz") <= max_bucket_size)
    )
    guarded = withb.join(F.broadcast(sizes.select("bucket")), "bucket")
    a = guarded.select(
        "bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        F.col("nrm").alias("na"),
    )
    b = guarded.select(
        "bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        F.col("nrm").alias("nb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
