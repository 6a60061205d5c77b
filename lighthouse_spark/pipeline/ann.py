"""Approximate-nearest-neighbor search over an embedding column.

- brute_force_topk: exact cosine top-k — the correctness baseline and
  the in-bucket scorer. Pure built-in higher-order functions
  (zip_with/aggregate), whole-stage codegen, no Python.
- lsh_topk: random-hyperplane LSH — bucket the corpus once (a cheap
  narrow transform), probe the query's bucket (+multi-probe bit
  flips). Scale path: the probe is a partition-prunable equality
  filter when the bucketed table is written partitioned by bucket.
- ivf_topk: IVF with KMeans coarse centroids (pyspark.ml), probe the
  nprobe closest lists. The classic 100-TB layout: cluster once,
  write partitioned by list_id, query scans nprobe partitions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(vec_col, arr: np.ndarray):
    plane = F.array(*[F.lit(float(x)) for x in arr])
    return F.aggregate(
        F.zip_with(vec_col, plane, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )


def cosine_to_query(vec_col, q: np.ndarray):
    qn = float(np.linalg.norm(q))
    dot = _dot(vec_col, q)
    n = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (n * F.lit(qn))


def brute_force_topk(
    df: DataFrame, id_col: str, vec_col: str, query: list[float] | np.ndarray, k: int = 10
) -> DataFrame:
    """Exact cosine top-k: one scan + TakeOrderedAndProject."""
    q = np.asarray(query, dtype=np.float64)
    v = F.col(vec_col).cast("array<double>")
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_to_query(v, q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _bucket_expr(vec_col, planes: np.ndarray):
    bits = None
    for p in range(planes.shape[0]):
        bit = F.when(_dot(vec_col, planes[p]) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bits = bit if bits is None else bits.bitwiseOR(F.shiftleft(bit, p))
    return bits


def lsh_bucketize(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: int = 8,
    seed: int = 42,
    dim: int | None = None,
    planes_mat: np.ndarray | None = None,
) -> tuple[DataFrame, np.ndarray]:
    """Attach a random-hyperplane bucket id. At scale, write the result
    partitioned by `bucket` so probes prune partitions. Pass
    ``planes_mat`` to pin the hyperplanes (e.g. for cross-engine
    reproducible bucketing); otherwise they are seeded-random."""
    if planes_mat is None:
        if dim is None:
            dim = len(df.select(vec_col).first()[0])
        rng = np.random.default_rng(seed)
        planes_mat = rng.standard_normal((planes, dim))
    mat = np.asarray(planes_mat, dtype=np.float64)
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn("bucket", _bucket_expr(v, mat)), mat


def lsh_topk(
    bucketed: DataFrame,
    planes_mat: np.ndarray,
    id_col: str,
    vec_col: str,
    query: list[float] | np.ndarray,
    k: int = 10,
    nprobe_bits: int = 1,
) -> DataFrame:
    """Probe the query's bucket plus all buckets within `nprobe_bits`
    bit flips (multi-probe), exact-score the candidates."""
    q = np.asarray(query, dtype=np.float64)
    qbits = 0
    for p in range(planes_mat.shape[0]):
        if float(planes_mat[p] @ q) > 0:
            qbits |= 1 << p
    probes = {qbits}
    if nprobe_bits >= 1:
        for p in range(planes_mat.shape[0]):
            probes.add(qbits ^ (1 << p))
    v = F.col(vec_col).cast("array<double>")
    return (
        bucketed.filter(F.col("bucket").isin(sorted(probes)))
        .select(F.col(id_col), F.round(cosine_to_query(v, q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, centroids: np.ndarray
) -> DataFrame:
    """IVF list assignment against a GIVEN centroid matrix (argmin
    squared L2, ties to the lowest list id) — the quantizer-agnostic
    half of IVF. Use ivf_build for fitted KMeans centroids, or pass a
    deterministic matrix when cross-engine reproducibility matters
    (the driver-contract oracle recomputes this assignment in SQL).
    Pure built-in expressions; at scale, persist partitioned by
    list_id so probes prune partitions."""
    v = F.col(vec_col).cast("array<double>")
    structs = []
    for j, c in enumerate(np.asarray(centroids, dtype=np.float64)):
        plane = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(v, plane, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        structs.append(F.struct(d.alias("d"), F.lit(j).alias("j")))
    list_id = F.array_min(F.array(*structs)).getField("j")
    return df.withColumn("list_id", list_id)


def ivf_probe_lists(centroids: np.ndarray, query, nprobe: int) -> list[int]:
    """The nprobe closest lists for a query (driver-side argsort over
    the tiny centroid table) — shared by ivf_topk and its oracle."""
    q = np.asarray(query, dtype=np.float64)
    d = ((np.asarray(centroids, dtype=np.float64) - q) ** 2).sum(axis=1)
    return np.argsort(d, kind="stable")[:nprobe].tolist()


def ivf_build(
    df: DataFrame, id_col: str, vec_col: str, n_lists: int = 16, seed: int = 42
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer: KMeans centroids + list assignment.

    Returns (df + list_id, centroids). At scale: persist partitioned by
    list_id; centroids are tiny driver state (broadcast implicitly via
    literals)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    feats = df.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    km = KMeans(k=n_lists, seed=seed, maxIter=20)
    model = km.fit(feats)
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
    assigned = model.transform(feats).select(
        F.col(id_col), F.col("prediction").alias("list_id")
    )
    return df.join(assigned, id_col), centroids


def ivf_topk(
    indexed: DataFrame,
    centroids: np.ndarray,
    id_col: str,
    vec_col: str,
    query: list[float] | np.ndarray,
    k: int = 10,
    nprobe: int = 3,
) -> DataFrame:
    """Scan only the nprobe lists with closest centroids (driver-side
    argsort over the tiny centroid table), exact-score inside."""
    q = np.asarray(query, dtype=np.float64)
    probe = ivf_probe_lists(centroids, q, nprobe)
    v = F.col(vec_col).cast("array<double>")
    return (
        indexed.filter(F.col("list_id").isin(probe))
        .select(F.col(id_col), F.round(cosine_to_query(v, q), 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
