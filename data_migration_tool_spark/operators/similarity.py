"""Similarity search over embedding columns (``array<float>``).

Baseline is brute-force cosine top-k (exact); the scale path is IVF
partitioning (search only the nearest centroid's cell) — both pure
DataFrame ops, JVM-side vector math via higher-order functions.

Scale: brute force is queries × corpus — fine when queries are few and
the corpus is broadcast-partitioned; IVF cuts the corpus factor to
~corpus/n_cells. For billion-vector corpora you'd add a PQ/HNSW stage
per cell via mapInPandas (same partitioning layout as ``ivf_assign``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_migration_tool_spark.functions.vectors import cosine_similarity


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × corpus, window rank.
    Output (query_id, neighbor_id, rank) — ids only, so results are
    stable under floating-point noise except at exact ties (broken by
    neighbor id)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    pairs = F.broadcast(q).crossJoin(c)
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    sims = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_similarity("q_vec", "c_vec").alias("sim"),
    )
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
    Centroids are broadcast; one pass over the corpus. At scale,
    repartition the output by cell so each cell is co-located."""
    c = centroids.select(
        F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cent_vec")
    )
    scored = corpus.crossJoin(F.broadcast(c)).select(
        F.col(id_col),
        vec_col,
        "cell_id",
        cosine_similarity(vec_col, "cent_vec").alias("cent_sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cent_sim"), F.asc("cell_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "cell_id")
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
    q_assigned = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "cell_id",
    )
    c = corpus_assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        "cell_id",
    )
    pairs = F.broadcast(q_assigned).join(c, "cell_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    sims = pairs.select(
        "query_id",
        "neighbor_id",
        cosine_similarity("q_vec", "c_vec").alias("sim"),
    )
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
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_similarity("v_a", "v_b").alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b")
    )
