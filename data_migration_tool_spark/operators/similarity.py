"""Similarity search over embedding columns (``array<float>``).

Baseline is brute-force cosine top-k (exact); the scale path is IVF
partitioning (search only the nearest centroid's cell).

Execution design — **block mat-mul, not per-pair evaluation**:

The pairwise stage is always `small side × big side`. The small side
(queries / centroids / a verify-stage corpus) is collected to a numpy
matrix and broadcast; the big side streams through ``mapInPandas``
ONCE, each Arrow batch doing a single ``batch × smallᵀ`` BLAS product.
Costs at 100 TB: the big side crosses the JVM→Python boundary exactly
once (no per-pair row stream — a per-pair kernel ships |pairs|×dim
values; this ships |rows|×dim), and each batch emits only its local
top-k (or thresholded pairs), so the final global top-k shuffles
k×|queries| rows per partition, not |rows|×|queries|.

Numerics: accumulation uses numpy SIMD order, so similarities agree
with a sequential-accumulation oracle to float ulps, not bit-exact.
All operators here return ids/ranks (or threshold survivors), which
are stable under ulp noise except at exact decision boundaries.

The reference has no vector operators (SURVEY §2 — absent); these are
the training-data-pipeline extensions (ANN / near-dup) built on the
same engine.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_migration_tool_spark.partitioning import spread as _spread


def _collect_matrix(
    df: DataFrame, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ids, matrix, norms) for the SMALL side of a pairwise op. The
    collect is the deliberate broadcast of the small operand (queries /
    centroids), not a driver-side loop over the data."""
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
    return ids, mat, norms


def _batches(pdfs: Iterator[pd.DataFrame]) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ids = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
        mat = np.stack(pdf.iloc[:, 1].to_numpy()).astype(np.float64, copy=False)
        norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
        yield ids, mat, norms


_SIM_SCHEMA = "query_id long, neighbor_id long, sim double"
_PAIR_SCHEMA = "id_a long, id_b long, sim double"


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine. Queries (small) broadcast as a matrix;
    corpus streams once; per-batch local top-k then exact global top-k
    (top-k of per-partition top-ks). Output (query_id, neighbor_id,
    rank), ties broken by neighbor id."""
    q_ids, q_mat, q_norms = _collect_matrix(queries, id_col, vec_col)

    def score(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for c_ids, c_mat, c_norms in _batches(pdfs):
            sims = (c_mat @ q_mat.T) / np.outer(c_norms, q_norms)  # n×Q
            out = []
            for qi in range(len(q_ids)):
                col = sims[:, qi]
                mask = c_ids != q_ids[qi] if exclude_self else np.ones_like(col, bool)
                cand_sim, cand_ids = col[mask], c_ids[mask]
                if len(cand_ids) > k:
                    # local top-k: keeps only k rows per (batch, query)
                    part = np.argpartition(-cand_sim, k - 1)[:k]
                    cand_sim, cand_ids = cand_sim[part], cand_ids[part]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[qi],
                            "neighbor_id": cand_ids,
                            "sim": cand_sim,
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    local = (
        _spread(corpus, factor=1)
        .select(id_col, vec_col)
        .mapInPandas(score, _SIM_SCHEMA)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (the IVF cell),
    ties broken by cell id. Centroid matrix broadcast; corpus streams
    once. At scale, repartition the output by cell so each cell is
    co-located."""
    cent_ids, cent_mat, cent_norms = _collect_matrix(centroids, id_col, vec_col)
    # stable tie-break: order centroid columns by cell id
    order = np.argsort(cent_ids, kind="stable")
    cent_ids, cent_mat, cent_norms = cent_ids[order], cent_mat[order], cent_norms[order]

    vec_type = dict(corpus.dtypes)[vec_col]
    schema = f"{id_col} long, {vec_col} {vec_type}, cell_id long"

    def assign(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
            sims = (mat @ cent_mat.T) / np.outer(norms, cent_norms)
            best = np.argmax(sims, axis=1)  # first max = smallest cell id
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    vec_col: pdf[vec_col],
                    "cell_id": cent_ids[best],
                }
            )

    return _spread(corpus, factor=1).select(id_col, vec_col).mapInPandas(assign, schema)


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
    boundary) — the standard IVF trade; nprobe>1 = assign queries to
    their top-n cells. Queries grouped by cell and broadcast; the
    assigned corpus streams once, each batch scoring only the cells it
    contains."""
    q_assigned = ivf_assign(queries, centroids, id_col, vec_col)
    rows = q_assigned.collect()
    by_cell: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    for cell in {r["cell_id"] for r in rows}:
        cell_rows = [r for r in rows if r["cell_id"] == cell]
        ids = np.array([r[id_col] for r in cell_rows], dtype=np.int64)
        mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in cell_rows])
        by_cell[cell] = (ids, mat, np.sqrt(np.einsum("ij,ij->i", mat, mat)))

    def score(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            out = []
            for cell, grp in pdf.groupby("cell_id"):
                if cell not in by_cell:
                    continue
                q_ids, q_mat, q_norms = by_cell[cell]
                c_ids = grp[id_col].to_numpy(dtype=np.int64)
                c_mat = np.stack(grp[vec_col].to_numpy()).astype(np.float64, copy=False)
                c_norms = np.sqrt(np.einsum("ij,ij->i", c_mat, c_mat))
                sims = (c_mat @ q_mat.T) / np.outer(c_norms, q_norms)
                for qi in range(len(q_ids)):
                    col, mask = sims[:, qi], c_ids != q_ids[qi]
                    cand_sim, cand_ids = col[mask], c_ids[mask]
                    if len(cand_ids) > k:
                        part = np.argpartition(-cand_sim, k - 1)[:k]
                        cand_sim, cand_ids = cand_sim[part], cand_ids[part]
                    out.append(
                        pd.DataFrame(
                            {"query_id": q_ids[qi], "neighbor_id": cand_ids, "sim": cand_sim}
                        )
                    )
            if out:
                yield pd.concat(out, ignore_index=True)

    # no re-spread: corpus_assigned comes out of ivf_assign already at
    # cluster parallelism, and mapInPandas chains narrowly onto it —
    # assign→score run as ONE fused stage with no extra shuffle
    local = corpus_assigned.select(id_col, vec_col, "cell_id").mapInPandas(
        score, _SIM_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine ≥ threshold. The corpus is
    both sides: one copy broadcast as a matrix (verify-stage contract —
    fits in memory), the other streams once; each batch emits only its
    surviving pairs. For billion-row corpora, pre-bucket with
    ``ivf_assign`` and run this within cells."""
    b_ids, b_mat, b_norms = _collect_matrix(df, id_col, vec_col)

    def score(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for a_ids, a_mat, a_norms in _batches(pdfs):
            sims = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
            ai, bi = np.nonzero((sims >= threshold) & (a_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame(
                {"id_a": a_ids[ai], "id_b": b_ids[bi], "sim": sims[ai, bi]}
            )

    return (
        _spread(df, factor=1)
        .select(id_col, vec_col)
        .mapInPandas(score, _PAIR_SCHEMA)
        .select("id_a", "id_b")
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train IVF centroids with Lloyd's k-means — the missing half of
    the IVF scale path (``ivf_assign``/``ivf_topk`` consume whatever
    centroids exist; this produces them from the corpus itself).

    Deterministic throughout: init takes the k corpus rows with the
    smallest md5(id) (a reproducible pseudo-random sample, no RNG
    state), and assignment ties break by cell id — reruns converge to
    identical centroids. Each iteration = one corpus stream through
    the block mat-mul assignment + one dimension-wise mean at
    (cell × dim) grain (posexplode → avg → rebuild, map-side
    combinable). Centroids stay a k×dim broadcast; the corpus is never
    collected. Empty cells keep their previous centroid. Returns
    (id_col = cell id 0..k-1, vec_col) ready for ``ivf_assign``.

    At 100 TB: cost is iters × (scan + tiny shuffle); for faster
    convergence on huge corpora, fit on a hash-sampled fraction
    (``doc_hash_sample`` pattern) and assign the full corpus once.
    """
    from pyspark.sql import Window

    vec_type = dict(corpus.dtypes)[vec_col]
    cents = (
        corpus.select(id_col, vec_col)
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(k)
        .withColumn(
            "__cell", F.row_number().over(Window.orderBy("__h")) - 1
        )
        .select(F.col("__cell").alias(id_col), vec_col)
    )
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, id_col, vec_col)
        dim_means = (
            assigned.select("cell_id", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("cell_id", "pos")
            .agg(F.avg("x").alias("m"))
        )
        new_cents = (
            dim_means.groupBy("cell_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pairs")
            )
            .select(
                F.col("cell_id").alias(id_col),
                F.transform("pairs", lambda p: p["m"])
                .cast(vec_type)
                .alias(vec_col),
            )
        )
        # empty cells keep their previous centroid
        kept = cents.join(
            new_cents.select(F.col(id_col).alias("__seen")),
            cents[id_col] == F.col("__seen"),
            "left_anti",
        )
        cents = new_cents.unionByName(kept).localCheckpoint()
    return cents
