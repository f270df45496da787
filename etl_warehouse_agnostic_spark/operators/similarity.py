"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products run JVM-side via ``aggregate``/``zip_with`` (no Python);
  the query side is broadcast, so the scan parallelizes over the corpus
  with no shuffle until the (tiny) per-query top-k.
- ``ivf_topk``: IVF-style scale path — corpus is bucketed to its
  nearest centroid; a query probes only ``nprobe`` cells, cutting the
  scanned fraction to ~nprobe/k at 10^9-vector scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded).

    Output: (query_id, neighbor_id, sim, rank). Ranking is
    deterministic: (sim desc, neighbor_id asc); ``round_to`` makes the
    sim engine-portable for cross-checks.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("_cv")
    )
    sim = cosine(F.col("_qv"), F.col("_cv"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid (cosine, broadcast).
    Deterministic ties → lowest centroid id."""
    c = centroids.select(F.col(cent_id), F.col(vec_col).alias("_cent"))
    sim = F.round(cosine(F.col(vec_col), F.col("_cent")), 6)
    scored = corpus.join(F.broadcast(c)).select(
        id_col, vec_col, cent_id, sim.alias("_csim")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc(cent_id))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .drop("_rn", "_csim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    num_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """IVF approximate top-k: centroids are the first ``num_centroids``
    corpus vectors by id (deterministic, no training dependency);
    queries probe their ``nprobe`` nearest cells only."""
    w_c = Window.orderBy(F.asc(id_col))
    cents = (
        corpus.withColumn("_rn", F.row_number().over(w_c))
        .where(F.col("_rn") <= num_centroids)
        .select(F.col("_rn").alias("centroid_id"), F.col(vec_col))
    )
    assigned = ivf_assign(corpus, cents, id_col, vec_col)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    qsim = F.round(cosine(F.col("_qv"), F.col(vec_col)), 6)
    qcells = (
        q.join(F.broadcast(cents))
        .select("query_id", "_qv", "centroid_id", qsim.alias("_csim"))
    )
    w_q = Window.partitionBy("query_id").orderBy(F.desc("_csim"), F.asc("centroid_id"))
    probes = (
        qcells.withColumn("_rn", F.row_number().over(w_q))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "_qv", "centroid_id")
    )
    sim = F.round(cosine(F.col("_qv"), F.col(vec_col)), 6)
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"), sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
