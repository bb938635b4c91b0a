"""Distributed KMeans (Lloyd's) over an embedding column.

The iterative-algorithm template for this engine: per-iteration work is
fully distributed (one Arrow-batched assignment pass + one bounded
aggregation), driver state is only the k x d centroid matrix.

Scale posture per iteration at 100 TB:
- assignment: mapInPandas with the centroid matrix in the closure —
  vectorized numpy GEMM per Arrow batch, no shuffle;
- update: per-batch PARTIAL centroid sums emitted from the same pass
  (k x d rows per batch, independent of batch row count), then a
  single reduce of bounded partials — the map-side-combine shape, so
  shuffle volume is O(#batches * k * d), never O(rows).
- convergence: centroid shift on the driver (k x d floats).

Determinism: centroids init from the k lowest-id points; partial sums
are float64 and the final merge is a sum of <= #batches partials per
cluster (not row-order dependent beyond numpy's fixed batch reduce).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

__all__ = ["dist_kmeans", "kmeans_assign", "ml_kmeans"]

K_CLUSTERS = 8
KMEANS_ITERS = 10


def _partials_factory(centroids: np.ndarray, id_col: str, vec_col: str):
    k, d = centroids.shape

    def _partials(batches):
        import pandas as pd

        c = centroids
        c_norms = (c * c).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf[vec_col].to_numpy())
            # argmin_j ||x - c_j||^2 = argmin_j (c_j.c_j - 2 x.c_j)
            assign = (c_norms[None, :] - 2.0 * (x @ c.T)).argmin(axis=1)
            sums = np.zeros((k, d))
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=k)
            yield pd.DataFrame(
                {
                    "cluster": np.arange(k),
                    "vec_sum": list(sums),
                    "n": counts,
                }
            )

    return _partials


def _farthest_first_init(
    vecs: DataFrame, id_col: str, vec_col: str, k: int
) -> np.ndarray:
    """Deterministic k-center seeding (farthest-first traversal): start
    from the lowest-id point, repeatedly add the point farthest from
    the current center set (ties -> lowest id). The deterministic
    stand-in for KMeans|| — no rand(), identical under retries — at the
    cost of k-1 distributed min-distance passes (fine for small k; use
    init='first' for large k).
    """
    first = vecs.orderBy(id_col).limit(1).collect()[0]
    centers = [np.asarray(first[vec_col], dtype=float)]
    for _ in range(k - 1):
        c = np.vstack(centers)

        def _mind(batches):
            import pandas as pd

            c_norms = (c * c).sum(axis=1)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.vstack(pdf[vec_col].to_numpy())
                d2 = (
                    (x * x).sum(axis=1)[:, None]
                    - 2.0 * (x @ c.T)
                    + c_norms[None, :]
                ).min(axis=1)
                yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "d2": d2})

        far = (
            vecs.mapInPandas(_mind, schema=f"{id_col} long, d2 double")
            .orderBy(F.desc("d2"), F.asc(id_col))
            .limit(1)
            .collect()[0]
        )
        row = vecs.where(F.col(id_col) == far[id_col]).collect()[0]
        centers.append(np.asarray(row[vec_col], dtype=float))
    return np.vstack(centers)


def dist_kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = K_CLUSTERS,
    max_iterations: int = KMEANS_ITERS,
    tol: float = 1e-6,
    init: str = "first",
) -> np.ndarray:
    """Fit KMeans; returns the k x d centroid matrix.

    ``init``: 'first' seeds from the k lowest-id points (one cheap
    pass); 'farthest' runs deterministic farthest-first traversal
    (better-spread seeds, k-1 extra passes).
    """
    vecs = df.select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    )
    if init == "farthest":
        centroids = _farthest_first_init(vecs, id_col, vec_col, k)
    elif init == "first":
        rows = vecs.orderBy(id_col).limit(k).collect()
        centroids = np.vstack([np.asarray(r[vec_col]) for r in rows])
    else:
        raise ValueError("init must be 'first' or 'farthest'")
    for _ in range(max_iterations):
        partials = vecs.mapInPandas(
            _partials_factory(centroids, id_col, vec_col),
            schema=f"cluster int, vec_sum array<double>, n long",
        )
        merged = (
            partials.groupBy("cluster")
            .agg(
                F.aggregate(
                    F.collect_list("vec_sum"),
                    F.array_repeat(F.lit(0.0), centroids.shape[1]),
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("vec_sum"),
                F.sum("n").alias("n"),
            )
            .collect()
        )
        new_centroids = centroids.copy()
        for r in merged:
            if r.n > 0:
                new_centroids[r.cluster] = np.asarray(r.vec_sum) / r.n
        shift = float(np.abs(new_centroids - centroids).max())
        centroids = new_centroids
        if shift < tol:
            break
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every row to its nearest centroid; returns
    (id_col, cluster int, sq_dist double). Map-only (no shuffle)."""
    c = centroids

    def _assign(batches):
        import pandas as pd

        c_norms = (c * c).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf[vec_col].to_numpy())
            d2 = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ c.T)
                + c_norms[None, :]
            )
            assign = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": assign,
                    "sq_dist": d2[np.arange(len(x)), assign],
                }
            )

    vecs = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    return vecs.mapInPandas(
        _assign, schema=f"{id_col} long, cluster int, sq_dist double"
    )


def ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: KMeans over the embeddings table — per-cluster
    sizes and inertia (rows-only: iterative float algorithm)."""
    emb = load_table(spark, "embeddings", sf_dir)
    centroids = dist_kmeans(emb)
    assigned = kmeans_assign(emb, centroids)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("sq_dist"), 4).alias("inertia"),
        )
        .orderBy("cluster")
    )


ORACLE_SQL: dict[str, str] = {}

QUERIES = {"ml_kmeans": ml_kmeans}
