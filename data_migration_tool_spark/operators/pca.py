"""Distributed PCA over embedding columns — the dimensionality-reduction
step before indexing / clustering / visualization of a 100 TB embedding
corpus.

Execution shape (the only one that scales):

1. ONE corpus pass computes per-partition moment partials — count,
   feature sum, and the d×d Gramian Σ v·vᵀ — as Arrow-batched numpy
   (``mapInPandas``); each partition emits a single (1 + d + d²)-float
   row.
2. The driver sums #partitions such rows (KBs for d ≤ 1024 — O(d²),
   never O(rows)), forms the covariance, and runs a local ``eigh`` —
   a d×d eigendecomposition is microseconds next to the scan.
3. Projection broadcasts the (k×d) component matrix back and streams
   the corpus once more through a batch mat-mul.

Determinism: partials are summed in partition order, eigenvectors are
sign-normalized (largest-magnitude coordinate made positive), and ties
in eigenvalues keep ``eigh``'s ascending order reversed — reruns on the
same layout reproduce bit-identical components. Cross-engine exactness
is NOT claimed (float sums re-associate across layouts), which is why
the registry query is rows-only and the value check is a numpy
reference in pytest — the honest contract for float-iterative ops
(same policy as k-means).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = principal axes
    explained_variance: np.ndarray  # (k,)


def _moment_partials(vec_col: str):
    def compute(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x if g is None else g + x.T @ x
        if n == 0:
            return
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
        )

    return compute


def pca_fit(
    corpus: DataFrame, n_components: int = 8, vec_col: str = "embedding"
) -> PCAModel:
    partials = corpus.select(vec_col).mapInPandas(
        _moment_partials(vec_col), schema="n long, s array<double>, g array<double>"
    )
    rows = partials.collect()  # one row per non-empty partition — O(d²) each
    if not rows:
        raise ValueError("pca_fit: empty corpus")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # (k, d)
    # sign normalization: make each component's largest-|x| coord positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=evals[order],
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pcs array<double>) — centered projection onto the model's
    components, one streamed batch mat-mul over the corpus."""
    mean, comps = model.mean, model.components

    def project(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            p = (x - mean) @ comps.T
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "pcs": list(p)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        project, schema="id long, pcs array<double>"
    ).withColumnRenamed("id", id_col)
