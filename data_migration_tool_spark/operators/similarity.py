"""Similarity search over embedding columns (``array<float>``).

Baseline is brute-force cosine top-k (exact); the scale path is IVF
partitioning (search only the nearest centroid's cell) — both pure
DataFrame ops, JVM-side vector math via higher-order functions.

Two execution disciplines every operator here follows:

1. **Norms once per row.** L2 norms are computed in the per-side
   projection and carried into the pair stream, so each pair pays
   exactly one array traversal (the dot product) instead of three —
   ``cos(a,b) = dot(a,b) / (‖a‖·‖b‖)`` with the norm factored out. The
   arithmetic (and therefore every result bit) is identical to
   computing norms inline.
2. **Spread the streamed side.** Pairwise joins inherit the streamed
   side's partitioning, and a small parquet input arrives as ONE
   partition — a cartesian/BNLJ over it runs single-task regardless of
   cores. ``_spread`` repartitions the streamed side to cluster
   parallelism first (round-robin, no key needed). At 100 TB the input
   is already thousands of partitions and ``_spread`` is a no-op.

Scale: brute force is queries × corpus — fine when queries are few and
the corpus is broadcast-partitioned; IVF cuts the corpus factor to
~corpus/n_cells. For billion-vector corpora you'd add a PQ/HNSW stage
per cell via mapInPandas (same partitioning layout as ``ivf_assign``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_migration_tool_spark.functions.vectors import dot_product, l2_norm
from data_migration_tool_spark.partitioning import spread as _spread


def _with_norm(
    df: DataFrame, id_col: str, vec_col: str, id_as: str, vec_as: str
) -> DataFrame:
    return df.select(
        F.col(id_col).alias(id_as),
        F.col(vec_col).alias(vec_as),
        l2_norm(vec_col).alias(f"{vec_as}_nrm"),
    )


def _cos(a_vec: str, b_vec: str) -> Column:
    return dot_product(a_vec, b_vec) / (
        F.col(f"{a_vec}_nrm") * F.col(f"{b_vec}_nrm")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × spread corpus, window
    rank. Output (query_id, neighbor_id, rank) — ids only, so results
    are stable under floating-point noise except at exact ties (broken
    by neighbor id)."""
    q = _with_norm(queries, id_col, vec_col, "query_id", "q_vec")
    c = _with_norm(_spread(corpus), id_col, vec_col, "neighbor_id", "c_vec")
    pairs = F.broadcast(q).crossJoin(c)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    sims = pairs.select("query_id", "neighbor_id", _cos("q_vec", "c_vec").alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (the IVF cell).
    Centroids are broadcast; one spread pass over the corpus. At scale,
    repartition the output by cell so each cell is co-located."""
    c = _with_norm(centroids, id_col, vec_col, "cell_id", "cent_vec")
    e = _with_norm(_spread(corpus), id_col, vec_col, id_col, "e_vec")
    scored = e.crossJoin(F.broadcast(c)).select(
        F.col(id_col),
        F.col("e_vec"),
        "cell_id",
        _cos("e_vec", "cent_vec").alias("cent_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cent_sim"), F.asc("cell_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col(id_col), F.col("e_vec").alias(vec_col), "cell_id")
    )


def ivf_topk(
    queries: DataFrame,
    corpus_assigned: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: route each query to its cell, search only that cell.
    Approximate (recall < 1 when true neighbors live across the cell
    boundary) — the standard IVF trade; nprobe>1 = relax the rank
    filter in ``ivf_assign``."""
    q_assigned = ivf_assign(queries, centroids, id_col, vec_col)
    q = q_assigned.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(vec_col).alias("q_vec_nrm"),
        "cell_id",
    )
    c = corpus_assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(vec_col).alias("c_vec_nrm"),
        "cell_id",
    )
    pairs = F.broadcast(q).join(c, "cell_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    sims = pairs.select("query_id", "neighbor_id", _cos("q_vec", "c_vec").alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine ≥ threshold. Quadratic —
    verify-stage tool; for scale, pre-bucket with ``ivf_assign`` and
    compare within cells only."""
    a = _with_norm(df, id_col, vec_col, "id_a", "v_a")
    b = _with_norm(_spread(df), id_col, vec_col, "id_b", "v_b")
    return (
        F.broadcast(a)
        .crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", _cos("v_a", "v_b").alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b")
    )
