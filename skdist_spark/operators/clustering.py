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
    # EAGER checkpoint: every iteration's mapInPandas (plus the init
    # pass) re-ran the scan + array cast lineage — max_iterations + 1
    # source passes for one materialization (guide §5: reuse >>
    # recompute).  The checkpoint preserves partitioning, so per-batch
    # partial sums — and therefore the float fold — are unchanged
    # (A/B-verified row-identical at sf0.1).
    vecs = df.select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
    ).localCheckpoint(eager=True)
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


# ---- integer-exact quantized KMeans (oracle-backed) -------------------------

# Quantization for the cross-engine-exact face: embeddings are float32
# in (-1, 1), so e * 2^14 is EXACT in float64 (power-of-two scale) and
# floor() of an exact value agrees on every engine; centroids carry a
# further 2^10 sub-integer scale and are refreshed by floor(s*2^10/n)
# — one IEEE division + floor, identical on both engines (the
# oracle-parity rule: never more than one float op between integers).
KMEANS_QUANT = 16_384  # 2^14: q = floor(e * 2^14), |q| <= 2^14
KMEANS_CSCALE = 1_024  # 2^10: centroid fixed-point sub-scale
KMEANS_EXACT_ROUNDS = 4
_DIMS = 64  # embeddings are fixed 64-d (TESTDATA.md)


def ml_kmeans_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans with ALL arithmetic in scaled integers — the exact face
    that verifies the float ``ml_kmeans`` algorithm cross-engine
    (the part_kcore / pagerank promotion pattern: fix the rounds,
    quantize the state, and the whole recurrence is engine-exact).

    Fixed recurrence: seeds = the k lowest-id vectors; then
    ``KMEANS_EXACT_ROUNDS`` Lloyd rounds of (argmin assignment by
    integer squared distance, ties to the lowest cluster id; centroid
    refresh ``floor(sum * 2^10 / n)`` per dimension, empty clusters
    keep their centroid), then a final assignment.  Outputs per-cluster
    sizes and exact integer inertia.

    Scale posture: the N-row work per round is one broadcast of the
    k-row centroid table + one map-side-combining (cluster, dim)
    aggregation — shuffle volume O(partitions * k * d), never O(rows);
    no Python in the loop; each k-row centroid state is persisted (the
    forked lineage — next-round join + empty-cluster fallback — shares
    one copy), pinned with a k-row count() and the PRIOR round's cache
    released, so cached partitions never accumulate across rounds.

    No reference counterpart (sk-dist has no clustering; net-new).
    """
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id",
        F.expr(
            f"transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE)"
            f" * {KMEANS_QUANT}) AS BIGINT))"
        ).alias("q"),
    )
    return (
        exact_lloyd_assign(emb, K_CLUSTERS, KMEANS_EXACT_ROUNDS)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            # exact integer sum (DECIMAL(38,0) / HUGEINT on the oracle),
            # then ONE deterministic round-to-nearest into DOUBLE — the
            # engines agree because the pre-cast value is exact
            F.sum(F.col("d2").cast("decimal(38,0)"))
            .cast("double")
            .alias("inertia"),
        )
        .orderBy("cluster")
    )


def exact_lloyd_assign(
    emb: DataFrame,
    k: int,
    rounds: int,
    cscale: int = KMEANS_CSCALE,
) -> DataFrame:
    """Integer-exact Lloyd recurrence shared by the oracle faces
    (``ml_kmeans_exact`` here, ``dedup_semantic_exact`` in dedup.py):
    ``emb`` is (vec_id, q: array<bigint>); seeds are the ``k``
    lowest-id vectors scaled by ``cscale``; each round is (argmin
    assignment by integer squared distance, ties to the lowest cluster
    id; centroid refresh ``floor(sum * cscale / n)`` per dimension,
    empty clusters keep their centroid).  Returns the FINAL assignment
    ``(vec_id, q, cluster, d2)`` — every value a replayable integer.

    The centroid state is a bounded O(k*d) driver matrix (exactly what
    the old broadcast centroid table held), so the rounds are
    driver-coordinated: each round is ONE job — a mapInPandas that
    assigns its partition by blocked integer GEMM and emits per-
    partition (cluster, dim) partial sums, reduced by a (cluster, pos)
    groupBy and collected as <= k*d bounded rows; the floor refresh
    replays the identical BIGINT->DOUBLE cast arithmetic in Python
    (both are IEEE-754 nearest + floor).  This replaces the old
    per-round DataFrame dance (HOF argmin per row x k centroids,
    posexplode of EVERY row, collect_list join, eager checkpoint) —
    O(k*d) interpreted lambda evals per row became one GEMM per Arrow
    batch, and the per-round shuffle dropped from O(rows * d) exploded
    values to O(partitions * k * d) partials.  int64 GEMM is exact
    (|q*cscale| <= 2^20 keeps every term < 2^48) and np.argmin ties
    break to the FIRST (= lowest) cluster with ascending blocks and a
    strict '<' cross-block update — bit-identical to the old
    sort_array tiebreak.  Blocks bound the (rows x k) distance slab to
    ~128 MiB (the SemDeDup driver-fit recipe), so a corpus-scaled k
    cannot blow batch memory.

    The quantized corpus is lazily localCheckpointed: rounds + 1
    passes read one materialized copy instead of re-running the
    scan + quantize lineage per round.
    """
    import math

    sc = emb.sparkSession.sparkContext
    if emb.rdd.getNumPartitions() < sc.defaultParallelism:
        emb = emb.repartition(sc.defaultParallelism)
    emb = emb.localCheckpoint(eager=False)

    seed_rows = sorted(
        emb.orderBy("vec_id").limit(k).collect(), key=lambda r: r["vec_id"]
    )
    C = np.array([list(r["q"]) for r in seed_rows], dtype=np.int64) * cscale

    def _blocked_argmin(Qs, C, c2):
        """(rows, d) x (k, d) -> (cluster, d2) per row; ties to the
        lowest cluster; slab-bounded."""
        q2 = np.einsum("ij,ij->i", Qs, Qs)
        step = max(1, (16 << 20) // max(len(Qs), 1))
        best_d2 = None
        best_c = None
        for s in range(0, len(C), step):
            d2b = q2[:, None] + c2[None, s : s + step] - 2 * (
                Qs @ C[s : s + step].T
            )
            bi = d2b.argmin(axis=1)
            bd = d2b[np.arange(len(Qs)), bi]
            if best_d2 is None:
                best_d2, best_c = bd, bi + s
            else:
                upd = bd < best_d2
                best_d2 = np.where(upd, bd, best_d2)
                best_c = np.where(upd, bi + s, best_c)
        return best_c, best_d2

    for _ in range(rounds):
        Cr = C
        c2 = np.einsum("ij,ij->i", Cr, Cr)
        kk, d = Cr.shape

        def partial_sums(batches, Cr=Cr, c2=c2, kk=kk, d=d):
            import pandas as pd

            sums = np.zeros((kk, d), dtype=np.int64)
            cnts = np.zeros(kk, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                Q = np.array(
                    [np.asarray(v) for v in pdf["q"]], dtype=np.int64
                )
                best_c, _ = _blocked_argmin(Q * cscale, Cr, c2)
                np.add.at(sums, best_c, Q)
                np.add.at(cnts, best_c, 1)
            nz = np.nonzero(cnts)[0]
            if not len(nz):
                return
            yield pd.DataFrame(
                {
                    "cluster": np.repeat(nz, d).astype(np.int32),
                    "pos": np.tile(np.arange(d, dtype=np.int32), len(nz)),
                    "sm": sums[nz].ravel(),
                    "n": np.repeat(cnts[nz], d),
                }
            )

        rows = (
            emb.mapInPandas(
                partial_sums, schema="cluster int, pos int, sm long, n long"
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("sm").alias("sm"), F.sum("n").alias("n"))
            .collect()
        )
        C = Cr.copy()
        for r in rows:
            # identical to SQL floor(CAST(sm * cscale AS DOUBLE) / n):
            # exact int -> IEEE double (round-nearest), IEEE divide,
            # floor toward -inf — Python floats ARE IEEE doubles
            C[r["cluster"], r["pos"]] = math.floor(
                float(r["sm"] * cscale) / r["n"]
            )

    c2 = np.einsum("ij,ij->i", C, C)

    def assign_batches(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            Qs = (
                np.array([np.asarray(v) for v in pdf["q"]], dtype=np.int64)
                * cscale
            )
            best_c, best_d2 = _blocked_argmin(Qs, C, c2)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "q": pdf["q"],
                    "cluster": best_c.astype(np.int32),
                    "d2": best_d2,
                }
            )

    return emb.mapInPandas(
        assign_batches,
        schema="vec_id long, q array<bigint>, cluster int, d2 long",
    )


def exact_lloyd_cte_parts(
    k: "int | str",
    rounds: int,
    dims: int = _DIMS,
    quant: int = KMEANS_QUANT,
    cscale: int = KMEANS_CSCALE,
) -> list[str]:
    """DuckDB replay of ``exact_lloyd_assign`` as a list of CTE
    fragments; the caller joins them with ``"WITH " + ",\\n".join(...)``
    and selects from the final assignment CTE ``a{rounds}``
    (vec_id, q, cluster, d2).  Every round is MATERIALIZED: round t is
    referenced twice by round t+1 — assignment + the empty-cluster
    fallback — and DuckDB inlines repeated CTEs into exponential
    blowup otherwise.  ``k`` may be a SQL expression string (e.g. a
    COUNT(*)-derived scalar subquery over the ``q`` CTE) so callers can
    corpus-scale the cell count on both faces identically."""
    d2 = (
        f"CAST(list_sum(list_transform(range(1, {dims + 1}), i ->"
        f" (q.q[i] * {cscale} - c.c[i]) * (q.q[i] * {cscale} - c.c[i])))"
        " AS BIGINT)"
    )
    parts = [
        f"""q AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(embedding, e ->
                       CAST(floor(CAST(e AS DOUBLE) * {quant}) AS BIGINT)) AS q
            FROM embeddings
        ), c0 AS MATERIALIZED (
            SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                       AS cluster,
                   list_transform(q, v -> v * {cscale}) AS c
            FROM q ORDER BY vec_id LIMIT {k}
        )"""
    ]
    for r in range(rounds + 1):
        parts.append(
            f"""a{r} AS MATERIALIZED (
                SELECT vec_id, q, cluster, d2 FROM (
                    SELECT vec_id, q, cluster, d2,
                           row_number() OVER (PARTITION BY vec_id
                                              ORDER BY d2, cluster) AS rn
                    FROM (
                        SELECT q.vec_id, q.q AS q, c.cluster AS cluster,
                               {d2} AS d2
                        FROM q, c{r} c
                    )
                ) WHERE rn = 1
            )"""
        )
        if r == rounds:
            break
        parts.append(
            f"""u{r} AS MATERIALIZED (
                SELECT cluster, i, SUM(q[i]) AS s, COUNT(*) AS n
                FROM a{r}, range(1, {dims + 1}) t(i)
                GROUP BY cluster, i
            ), c{r + 1} AS MATERIALIZED (
                SELECT c.cluster,
                       CASE WHEN u.cu IS NULL THEN c.c ELSE u.cu END AS c
                FROM c{r} c LEFT JOIN (
                    SELECT cluster,
                           list(CAST(floor(CAST(s * {cscale} AS DOUBLE) / n)
                                     AS BIGINT) ORDER BY i) AS cu
                    FROM u{r} GROUP BY cluster
                ) u USING (cluster)
            )"""
        )
    return parts


def _ml_kmeans_exact_oracle_sql(
    k: int = K_CLUSTERS,
    rounds: int = KMEANS_EXACT_ROUNDS,
) -> str:
    parts = exact_lloyd_cte_parts(k, rounds)
    return (
        "WITH " + ",\n".join(parts) + f"""
        SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(d2) AS DOUBLE) AS inertia
        FROM a{rounds} GROUP BY cluster ORDER BY cluster
    """
    )


ORACLE_SQL: dict[str, str] = {
    "ml_kmeans_exact": _ml_kmeans_exact_oracle_sql(),
}

QUERIES = {"ml_kmeans": ml_kmeans, "ml_kmeans_exact": ml_kmeans_exact}
