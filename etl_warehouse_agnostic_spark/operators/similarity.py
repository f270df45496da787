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


# Join-site rule: never evaluate `cosine` directly inside a pairwise
# join — that recomputes BOTH vector norms per candidate pair (three
# array aggregations per pair). Hoist each side's norm into a per-ROW
# column first and use ``_dot(a, b) / (na * nb)``: identical
# floating-point expression (same ops, same order), one aggregation
# per pair. All the pairwise operators below do this.


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
    ).withColumn("_qn", _norm(F.col("_qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("_cv")
    ).withColumn("_cn", _norm(F.col("_cv")))
    sim = _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))
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


def cosine_near_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact: all (a < b) with
    ``cosine ≥ threshold``. O(n²) self-join — the correctness baseline
    only; :func:`blocked_near_pairs` is the scale path (same contract,
    sub-quadratic)."""
    base = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).withColumn("_n", _norm(F.col("_v")))
    a = base.select(F.col(id_col).alias("a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = base.select(F.col(id_col).alias("b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    sim = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
    )


_SRP_MAX_BITS = 6


def _srp_bit(vec_col: str, i: int):
    """Signed-random-projection bit i: sign of the dot product with a
    deterministic Rademacher (±1) hyperplane derived per (bit, element
    index) from xxhash64 — JVM-side, no Python, no stored planes."""
    signed = F.transform(
        F.col(vec_col),
        lambda x, j: x
        * F.when(
            F.pmod(F.xxhash64(F.concat_ws("_", F.lit(f"srp{i}"), j.cast("string"))), 2) == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )
    dot = F.aggregate(signed, F.lit(0.0), lambda acc, v: acc + v)
    return (dot > 0).cast("long")


def blocked_assignment(
    corpus: DataFrame,
    num_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    max_cell_size: int | None = 100_000,
) -> DataFrame:
    """Multi-probe IVF assignment with the cell-size guard applied:
    (id, vec, centroid_id, _blk) where ``_blk`` sub-splits any cell
    whose membership exceeds ``max_cell_size`` via SRP bits. Exposed so
    tests (and capacity planners) can audit block sizes directly."""
    cents = kmeans_centroids(corpus, id_col, vec_col, k=num_centroids, sample_size=sample_size)
    c = cents.select("centroid_id", F.col(vec_col).alias("_cent")).withColumn(
        "_cent_n", _norm(F.col("_cent"))
    )
    corp = corpus.withColumn("_vn", _norm(F.col(vec_col)))
    csim = F.round(
        _dot(F.col(vec_col), F.col("_cent")) / (F.col("_vn") * F.col("_cent_n")), 6
    )
    scored = corp.join(F.broadcast(c)).select(id_col, vec_col, "centroid_id", csim.alias("_cs"))
    w = Window.partitionBy(id_col).orderBy(F.desc("_cs"), F.asc("centroid_id"))
    # Materialize the assignment once: it feeds the cell-size census
    # AND both sides of the within-cell pair join downstream — three
    # recomputations of the scoring join + ranking window without this
    # (Spark shares no subtrees across join branches). An IVF index is
    # materialized before probing in any real ANN build; memory-and-
    # disk storage keeps it safe at corpus scale.
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= nprobe)
        .select(id_col, vec_col, "centroid_id")
    ).localCheckpoint()
    if max_cell_size is None:
        return assigned.select(id_col, vec_col, "centroid_id", F.lit(0).cast("long").alias("_blk"))
    # tiny census (≤ num_centroids rows) → per-cell split depth
    sizes = assigned.groupBy("centroid_id").agg(F.count(F.lit(1)).alias("_cn"))
    n_bits = F.least(
        F.lit(_SRP_MAX_BITS),
        F.greatest(
            F.lit(0),
            F.ceil(F.log2(F.col("_cn") / F.lit(float(max_cell_size)))).cast("int"),
        ),
    )
    code = F.lit(0).cast("long")
    for i in range(_SRP_MAX_BITS):
        code = code + F.when(
            F.lit(i) < n_bits, F.shiftleft(_srp_bit(vec_col, i), i)
        ).otherwise(F.lit(0))
    return (
        assigned.join(F.broadcast(sizes), "centroid_id")
        .select(id_col, vec_col, "centroid_id", code.alias("_blk"))
    )


def blocked_near_pairs(
    corpus: DataFrame,
    threshold: float,
    num_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    max_cell_size: int | None = 100_000,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, sub-quadratic: each vector is
    multi-assigned to its ``nprobe`` nearest k-means cells; candidate
    pairs are generated ONLY within a cell (equi-join on centroid_id),
    then verified exactly. With balanced cells the join cost drops from
    n² to ~nprobe²·n²/k — the IVF analog of MinHash banding, and the
    same recall/probe tradeoff (near-dup pairs are cosine-close, so
    they land in a common probed cell with high probability).

    **Cell-size guard**: a degenerate corpus can dump most vectors into
    one k-means cell, degrading the within-cell join toward n². Cells
    whose multi-probe membership exceeds ``max_cell_size`` are re-split
    into ~size/max sub-blocks by signed-random-projection bits (LSH
    within the cell): each extra bit halves the block and keeps a
    cosine-θ pair together with probability 1 − θ/π per bit (≈0.98 per
    bit at 0.95 cosine), so the worst-case join cost is bounded by
    ~max_cell_size² per block instead of n². The split census is one
    ≤ num_centroids-row aggregate broadcast back — no extra data pass.
    Output (a, b, sim) with a < b, deduplicated across blocks."""
    assigned = blocked_assignment(
        corpus, num_centroids=num_centroids, nprobe=nprobe, id_col=id_col,
        vec_col=vec_col, sample_size=sample_size, max_cell_size=max_cell_size,
    )
    normed = assigned.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"),
        "centroid_id", "_blk",
    ).withColumn("_n", _norm(F.col("_v")))
    left = normed.select(
        F.col(id_col).alias("a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"),
        "centroid_id", "_blk",
    )
    right = normed.select(
        F.col(id_col).alias("b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
        "centroid_id", "_blk",
    )
    sim = F.round(
        _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6
    )
    return (
        left.join(right, ["centroid_id", "_blk"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
        .distinct()
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
    c = centroids.select(F.col(cent_id), F.col(vec_col).alias("_cent")).withColumn(
        "_cent_n", _norm(F.col("_cent"))
    )
    corp = corpus.withColumn("_vn", _norm(F.col(vec_col)))
    sim = F.round(
        _dot(F.col(vec_col), F.col("_cent")) / (F.col("_vn") * F.col("_cent_n")), 6
    )
    scored = corp.join(F.broadcast(c)).select(
        id_col, vec_col, cent_id, sim.alias("_csim")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), F.asc(cent_id))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .drop("_rn", "_csim")
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    sample_size: int = 4096,
    iters: int = 8,
) -> DataFrame:
    """Spherical k-means (Lloyd) centroid training on a bounded,
    deterministic corpus sample — the IVF coarse quantizer.

    The sample is the ``sample_size`` rows with the smallest
    ``xxhash64(id)`` — a distributed top-k (TakeOrderedAndProject:
    per-partition heaps merged on the driver, NO global single-partition
    sort), deterministic for a given corpus. Training runs in numpy on
    the driver — O(sample·k·dim) flops on ≤ a few thousand rows,
    independent of corpus size — then the k centroids are broadcast
    back. This is the standard IVF training recipe (train on a sample,
    assign everything); initialization is k evenly spaced rows of the
    hash-ordered sample, so the whole pipeline is deterministic.
    """
    import numpy as np

    rows = (
        corpus.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(sample_size)
        .collect()
    )
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    X = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
    k = min(k, len(X))
    init_idx = np.linspace(0, len(X) - 1, num=k).astype(int)
    C = X[init_idx].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(k):
            pts = X[assign == j]
            if len(pts):
                c = pts.mean(axis=0)
                n = float(np.linalg.norm(c))
                if n > 1e-12:
                    C[j] = c / n
    data = [(int(j), [float(x) for x in C[j]]) for j in range(k)]
    return corpus.sparkSession.createDataFrame(
        data, f"centroid_id int, {vec_col} array<double>"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    num_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    sample_size: int = 4096,
    train_iters: int = 8,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are bucketed to their
    nearest trained centroid (:func:`kmeans_centroids`); a query probes
    only its ``nprobe`` nearest cells, scanning ~nprobe/num_centroids of
    the corpus."""
    cents = kmeans_centroids(
        corpus, id_col, vec_col, k=num_centroids,
        sample_size=sample_size, iters=train_iters,
    )
    assigned = ivf_assign(corpus, cents, id_col, vec_col)

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("_qn", _norm(F.col("_qv")))
    qsim = F.round(
        _dot(F.col("_qv"), F.col(vec_col)) / (F.col("_qn") * _norm(F.col(vec_col))), 6
    )
    qcells = (
        q.join(F.broadcast(cents))
        .select("query_id", "_qv", "_qn", "centroid_id", qsim.alias("_csim"))
    )
    w_q = Window.partitionBy("query_id").orderBy(F.desc("_csim"), F.asc("centroid_id"))
    probes = (
        qcells.withColumn("_rn", F.row_number().over(w_q))
        .where(F.col("_rn") <= nprobe)
        .select("query_id", "_qv", "_qn", "centroid_id")
    )
    scanned = assigned.withColumn("_n", _norm(F.col(vec_col)))
    sim = F.round(
        _dot(F.col("_qv"), F.col(vec_col)) / (F.col("_qn") * F.col("_n")), 6
    )
    scored = (
        scanned.join(F.broadcast(probes), "centroid_id")
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("neighbor_id"), sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
