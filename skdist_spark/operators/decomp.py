"""Distributed decomposition over embedding columns: PCA via a
single-pass covariance aggregation.

The standard large-scale PCA shape: d is small (embeddings are 64-d
here, rarely >4k anywhere), N is huge, so the d x d Gram matrix is the
ONLY thing that ever crosses the wire.  One ``mapInPandas`` pass emits
per-partition partials (n, sum_x, sum_xxT); the driver folds the ~P
partial rows, forms the covariance, runs ``numpy.linalg.eigh`` on the
d x d matrix, and broadcasts the q principal axes back into a map-only
projection.  No shuffle of vector data at any point — the plan is
scan -> partials -> tiny collect -> scan -> project, which holds
unchanged at 100 TB / 1000 executors.

Sign convention: eigenvectors are normalized so their
largest-magnitude coordinate is positive, making the output
deterministic across LAPACK builds.

Rows-only for the driver (eigendecomposition isn't ANSI SQL); pytest
verifies the projection against a local full-matrix numpy PCA.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

N_COMPONENTS = 2


def _partials(id_col: str, vec_col: str):
    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "ss": [(x.T @ x).ravel().tolist()],
                }
            )

    return gen


def fit_pca(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_components: int = N_COMPONENTS,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One distributed pass -> (mean[d], components[q, d],
    explained_variance[q]).  Driver work is O(P * d^2) fold + O(d^3)
    eigh — independent of N."""
    vecs = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
    parts = vecs.mapInPandas(
        _partials(id_col, vec_col),
        schema="n long, s array<double>, ss array<double>",
    ).collect()
    n = sum(r["n"] for r in parts)
    d = len(parts[0]["s"])
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in parts:
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(d, d)
    mean = s / n
    cov = (ss - np.outer(mean, s) - np.outer(s, mean) + n * np.outer(mean, mean)) / (
        n - 1
    )
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T
    # deterministic sign: largest-|coordinate| positive
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order]


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only projection onto the fitted axes: (id, pc1..pcq)."""
    m, c = mean, components

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = (x - m) @ c.T
            out = {id_col: pdf[id_col].to_numpy()}
            for q in range(c.shape[0]):
                out[f"pc{q + 1}"] = proj[:, q]
            yield pd.DataFrame(out)

    vecs = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
    cols = ", ".join(f"pc{q + 1} double" for q in range(c.shape[0]))
    return vecs.mapInPandas(gen, schema=f"{id_col} long, {cols}")


def embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA of the embeddings table: every vector projected onto the
    top-2 principal axes (rows-only; numpy equivalence pytest)."""
    emb = load_table(spark, "embeddings", sf_dir)
    mean, comps, _ = fit_pca(emb)
    proj = pca_project(emb, mean, comps)
    return proj.select(
        "vec_id", F.round("pc1", 6).alias("pc1"), F.round("pc2", 6).alias("pc2")
    ).orderBy("vec_id")


ORACLE_SQL: dict[str, str] = {}

QUERIES = {
    "embedding_pca": embedding_pca,
}


# ---- class-separability diagnostic (Fisher ratio per dimension) --------


def label_separability(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-dimension Fisher discriminant ratio over labeled vectors:
    between-class variance / within-class variance — "which embedding
    dimensions actually separate my classes", the pre-flight check
    before training a classifier head or pruning dimensions.

    One scan: coordinates are micro-quantized to BIGINT (the
    embedding_corr discipline) and posexploded to (dim, label)
    moments — a bounded dims x labels aggregate, map-side combinable.
    Between = sum_c n_c*(m_c - m)^2, within = sum_c (ss_c - n_c*m_c^2),
    evaluated in DOUBLE from the exact integer moments; the output is
    bit-reproducible.
    """
    q = df.select(
        F.col(label_col).alias("lbl"),
        F.posexplode(
            F.expr(f"transform({vec_col}, x -> CAST(floor(x * 1000000) AS BIGINT))")
        ).alias("dim", "v"),
    )
    cell = q.groupBy("dim", "lbl").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0))")).alias("s"),
        F.sum(F.expr("CAST(v AS DECIMAL(19,0)) * v")).alias("ss"),
    )
    tot = cell.groupBy("dim").agg(
        F.sum("n").alias("nt"), F.sum("s").alias("st")
    )
    mc = "(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
    mg = "(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE))"
    between = f"(CAST(n AS DOUBLE) * ({mc} - {mg}) * ({mc} - {mg}))"
    within = f"(CAST(ss AS DOUBLE) - CAST(n AS DOUBLE) * {mc} * {mc})"
    return (
        cell.join(tot, "dim")
        .groupBy("dim")
        .agg(
            F.sum(F.expr(between)).alias("_b"),
            F.sum(F.expr(within)).alias("_w"),
        )
        .select(
            "dim",
            F.expr("ROUND(_b / _w, 6)").alias("fisher_ratio"),
        )
        .orderBy("dim")
    )


def embedding_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher ratio of every embedding dimension vs the label column."""
    emb = load_table(spark, "embeddings", sf_dir)
    return label_separability(emb)


ORACLE_SQL["embedding_separability"] = """
    WITH q AS (
        SELECT label AS lbl, d.i - 1 AS dim,
               CAST(floor(CAST(embedding[d.i] AS DOUBLE) * 1000000) AS BIGINT) AS v
        FROM embeddings,
             LATERAL (SELECT UNNEST(range(1, len(embedding) + 1)) AS i) d
    ), cell AS (
        SELECT dim, lbl, COUNT(*) AS n,
               SUM(CAST(v AS DECIMAL(38,0))) AS s,
               SUM(CAST(v AS DECIMAL(19,0)) * v) AS ss
        FROM q GROUP BY 1, 2
    ), tot AS (
        SELECT dim, SUM(n) AS nt, SUM(s) AS st FROM cell GROUP BY dim
    )
    SELECT dim,
           ROUND(SUM(CAST(n AS DOUBLE)
                     * ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                        - (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)))
                     * ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                        - (CAST(st AS DOUBLE) / CAST(nt AS DOUBLE))))
                 / SUM(CAST(ss AS DOUBLE)
                       - CAST(n AS DOUBLE)
                         * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS fisher_ratio
    FROM cell JOIN tot USING (dim)
    GROUP BY dim ORDER BY dim
"""

QUERIES["embedding_separability"] = embedding_separability


WHITEN_EPS = 1e-6


def fit_whitening(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = WHITEN_EPS,
) -> "tuple[np.ndarray, np.ndarray]":
    """ZCA whitening fit: (mean[d], W[d, d]) with
    W = E diag(1/sqrt(l + eps)) E^T from the same one-pass distributed
    covariance as PCA — the standard embedding post-processing that
    decorrelates dimensions and equalizes their scale (retrieval and
    SemDeDup pipelines whiten before cosine so a few dominant
    directions stop swamping the similarity).  ZCA (not PCA-rotate):
    the W E^T E rotation back keeps whitened vectors maximally close
    to the originals, so downstream cosine stays interpretable.
    Driver work is O(d^2) fold + O(d^3) eigh, independent of N.
    """
    mean, comps, evals = fit_pca(df, id_col, vec_col, n_components=10**9)
    # fit_pca truncates to n_components; a huge value keeps all d axes
    scale = 1.0 / np.sqrt(evals + eps)
    w = comps.T @ np.diag(scale) @ comps
    return mean, w


def whiten_project(
    df: DataFrame,
    mean: np.ndarray,
    w: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only whitening transform: (id, whitened array<double>).
    The (mean, W) pair is tiny broadcast state; no shuffle."""
    import pandas as pd

    m = np.asarray(mean, dtype=np.float64)
    wm = np.asarray(w, dtype=np.float64)

    def run(batches):
        for pdf in batches:
            x = np.stack(pdf[vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64)
            ))
            y = (x - m) @ wm.T
            yield pd.DataFrame({id_col: pdf[id_col], "whitened": list(map(list, y))})

    src = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col))
    return src.mapInPandas(run, schema=f"{id_col} long, whitened array<double>")


def embedding_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: ZCA-whiten the embeddings; emit per-vector norm
    before/after plus a rounded first-coordinate (rows-only: the eigh
    fit is numpy; equivalence vs a pure-numpy whitening is pinned in
    pytest, incl. the identity that whitened covariance ~= I)."""
    from ..sources.catalog import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    mean, w = fit_whitening(emb)
    out = whiten_project(emb, mean, w)
    norm = "sqrt(aggregate(transform(whitened, x -> x * x), 0D, (acc, x) -> acc + x))"
    return out.select(
        "vec_id",
        F.round(F.expr(norm), 6).alias("w_norm"),
        F.round(F.element_at("whitened", 1), 6).alias("w_dim1"),
    ).orderBy("vec_id")


QUERIES["embedding_whiten"] = embedding_whiten


# ---- Johnson-Lindenstrauss random projection ------------------------------

JL_OUT_DIMS = 16
JL_BAND_LO = 7   # in-band distortion ratio lower bound, tenths
JL_BAND_HI = 13  # ... upper bound, tenths
_JL_K1 = 2654435761


def _jl_sign(engine: str, i: str, j: str) -> str:
    """±1 sign for (input dim i, output dim j) — a pure integer hash,
    identical text on both engines (operands stay < 2^44, no overflow
    or negative operand, so plain % and // agree everywhere).

    The sign is the TOP bit of a Knuth multiplicative hash of the
    combined index: low-bit parity of a linear form is NOT random
    ((a*i + b*j) % 2 with odd a, b degenerates to (-1)^(i+j), a rank-1
    'matrix' that destroys the JL guarantee — caught by the in-band
    eval itself)."""
    expr = (
        f"((({i} * 4096 + {j} + 1) * {_JL_K1}) % 4294967296)"
        f" // 2147483648"
    )
    if engine == "spark":
        expr = expr.replace("//", "div")
    return f"(CASE WHEN {expr} = 0 THEN 1 ELSE -1 END)"


def jl_project_expr(vec_col: str, out_dims: int = JL_OUT_DIMS) -> str:
    """Spark SQL expression: project a quantized BIGINT vector (micro
    units) onto ``out_dims`` hash-sign directions — the
    database-friendly Achlioptas form of Johnson-Lindenstrauss (no
    dense Gaussian matrix is materialized anywhere; the matrix IS the
    hash).  Pure integer arithmetic: y_j = sum_i s(i,j) * v_i.
    """
    sign = _jl_sign("spark", "i", "j")
    return (
        f"transform(sequence(0, {out_dims - 1}), j -> "
        f"aggregate(sequence(0, size({vec_col}) - 1), 0L, "
        f"(acc, i) -> acc + {sign} * element_at({vec_col}, i + 1)))"
    )


def embedding_jl_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: JL distance preservation on consecutive-id
    embedding pairs (2m, 2m+1): squared L2 before (64-dim micro ints)
    vs after (16 hash-sign dims, scaled by 1/k), in-band share for
    ratio in [0.7, 1.3] decided by exact integer cross-multiplication,
    min/max ratio as the only float ops.

    The projection is map-side (no shuffle at all until the pair
    join on the consecutive-id key); at 100 TB the eval sample stays
    a bounded slice while the projection itself streams.
    """
    k = JL_OUT_DIMS
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(floor(x * 1000000) AS BIGINT))"
        ).alias("v"),
    )
    proj = emb.select(
        "vec_id", "v", F.expr(jl_project_expr("v")).alias("y")
    )
    a = proj.select(
        (F.col("vec_id") / 2).cast("long").alias("pair_id"),
        F.col("vec_id").alias("ida"),
        F.col("v").alias("va"),
        F.col("y").alias("ya"),
    ).where(F.col("ida") % 2 == 0)
    b = proj.select(
        (F.col("vec_id") / 2).cast("long").alias("pair_id"),
        F.col("vec_id").alias("idb"),
        F.col("v").alias("vb"),
        F.col("y").alias("yb"),
    ).where(F.col("idb") % 2 == 1)
    d2 = (
        a.join(b, "pair_id")
        .select(
            "pair_id",
            F.expr(
                "aggregate(zip_with(va, vb, (x, y) -> (x - y) * (x - y)),"
                " 0L, (acc, t) -> acc + t)"
            ).alias("do2"),
            F.expr(
                "aggregate(zip_with(ya, yb, (x, y) -> (x - y) * (x - y)),"
                " 0L, (acc, t) -> acc + t)"
            ).alias("dp2"),
        )
        .where(F.col("do2") > 0)
    )
    ratio = F.expr(f"CAST(dp2 AS DOUBLE) / (CAST({k} AS DOUBLE) * CAST(do2 AS DOUBLE))")
    return d2.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.expr(
                f"CASE WHEN 10 * dp2 >= {JL_BAND_LO} * {k} * do2"
                f" AND 10 * dp2 <= {JL_BAND_HI} * {k} * do2 THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_in_band"),
        F.expr(
            f"CAST(SUM(CASE WHEN 10 * dp2 >= {JL_BAND_LO} * {k} * do2"
            f" AND 10 * dp2 <= {JL_BAND_HI} * {k} * do2 THEN 1 ELSE 0 END)"
            f" * 1000000 DIV COUNT(*) AS BIGINT)"
        ).alias("in_band_ppm"),
        F.round(F.min(ratio), 6).alias("min_ratio"),
        F.round(F.max(ratio), 6).alias("max_ratio"),
    )


def _jl_oracle_sql(k: int = JL_OUT_DIMS) -> str:
    sign = _jl_sign("duck", "i", "j")
    proj = (
        f"list_transform(range(0, {k}), j -> "
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range(0, len(v)), i -> {sign} * v[i + 1])),"
        f" (acc, t) -> acc + t))"
    )
    ratio = f"(CAST(dp2 AS DOUBLE) / (CAST({k} AS DOUBLE) * CAST(do2 AS DOUBLE)))"
    band = (
        f"10 * dp2 >= {JL_BAND_LO} * {k} * do2"
        f" AND 10 * dp2 <= {JL_BAND_HI} * {k} * do2"
    )
    return f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
            FROM embeddings
        ), proj AS (
            SELECT vec_id, v, {proj} AS y FROM q
        ), pairs AS (
            SELECT a.v AS va, b.v AS vb, a.y AS ya, b.y AS yb
            FROM proj a JOIN proj b
              ON b.vec_id = a.vec_id + 1
             AND a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
        ), d AS (
            SELECT
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(0, len(va)),
                  i -> (va[i + 1] - vb[i + 1]) * (va[i + 1] - vb[i + 1]))),
                (acc, t) -> acc + t) AS do2,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(0, {k}),
                  i -> (ya[i + 1] - yb[i + 1]) * (ya[i + 1] - yb[i + 1]))),
                (acc, t) -> acc + t) AS dp2
            FROM pairs
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN {band} THEN 1 ELSE 0 END) AS BIGINT) AS n_in_band,
               CAST(SUM(CASE WHEN {band} THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS in_band_ppm,
               ROUND(MIN({ratio}), 6) AS min_ratio,
               ROUND(MAX({ratio}), 6) AS max_ratio
        FROM d WHERE do2 > 0
    """


QUERIES["embedding_jl_eval"] = embedding_jl_eval
ORACLE_SQL["embedding_jl_eval"] = _jl_oracle_sql()


# ---- embedding drift (standardized mean difference per dimension) -----------


def _smd_expr(big: str) -> str:
    """The exact-integer SMD composition; ``big`` is the engine's
    128-bit-capable exact integer type (DECIMAL(38,0) on Spark,
    HUGEINT on DuckDB — DuckDB SILENTLY promotes an overflowing
    DECIMAL multiply to DOUBLE, which cost a 1e-8 divergence here)."""
    return (
        "(CAST(s_b * n_a - s_a * n_b AS DOUBLE)"
        " * sqrt(CAST(n_a + n_b - 2 AS DOUBLE)"
        " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
        f" * CAST(CAST(n_b AS {big}) * (CAST(n_a AS {big}) * CAST(ss_a AS {big})"
        f" - CAST(s_a AS {big}) * CAST(s_a AS {big}))"
        f" + CAST(n_a AS {big}) * (CAST(n_b AS {big}) * CAST(ss_b AS {big})"
        f" - CAST(s_b AS {big}) * CAST(s_b AS {big}))"
        " AS DOUBLE))))"
    )


_SMD_EXPR = _smd_expr("DECIMAL(38,0)")


def embedding_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space drift monitor: per dimension, the standardized
    mean difference (Cohen's d with pooled variance) between a
    reference slice and a current slice — the retraining/recalibration
    trigger for anything serving on top of these vectors (ANN cells,
    classifiers, whitening stats all assume the distribution holds).

    One micro-quantized posexplode + exact integer moments per (side,
    dim); d composes in a single shared float expression, so the table
    is engine-identical.  Map-side combinable aggregate over dims x 2
    cells — scale-free.
    """
    def moments(df: DataFrame, side: str) -> DataFrame:
        q = df.select(
            F.posexplode(
                F.expr(
                    f"transform({vec_col}, x -> CAST(floor(x * 1000000) AS BIGINT))"
                )
            ).alias("dim", "v")
        )
        return q.groupBy("dim").agg(
            F.count(F.lit(1)).alias(f"n_{side}"),
            F.sum(F.expr("CAST(v AS DECIMAL(38,0))")).alias(f"s_{side}"),
            F.sum(F.expr("CAST(v AS DECIMAL(19,0)) * v")).alias(f"ss_{side}"),
        )

    j = moments(ref, "a").join(moments(cur, "b"), "dim")
    mean = "(CAST(s_{s} AS DOUBLE) / CAST(n_{s} AS DOUBLE))"
    # d rearranged so EVERYTHING except one mult/div/sqrt/mult tail is
    # exact DECIMAL integer arithmetic — the naive mean/var/pooled float
    # chain diverged from DuckDB by 1 ulp at ROUND boundaries:
    #   d = A * sqrt(k / (n_a*n_b * P)),  A = s_b*n_a - s_a*n_b,
    #   P = n_b*(n_a*ss_a - s_a^2) + n_a*(n_b*ss_b - s_b^2),
    #   k = n_a + n_b - 2
    d = _SMD_EXPR
    return j.select(
        "dim",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.expr(f"ROUND({mean.format(s='a')} / 1000000.0, 6)").alias("mean_ref"),
        F.expr(f"ROUND({mean.format(s='b')} / 1000000.0, 6)").alias("mean_cur"),
        F.expr(f"ROUND({d}, 6)").alias("smd"),
    ).orderBy("dim")


def embedding_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: drift of odd-vec_id embeddings vs the even-id
    reference slice, per dimension."""
    emb = load_table(spark, "embeddings", sf_dir)
    return embedding_drift(
        emb.where(F.expr("vec_id % 2 = 0")), emb.where(F.expr("vec_id % 2 = 1"))
    )


def _drift_sql() -> str:
    mean = "(CAST(s_{s} AS DOUBLE) / CAST(n_{s} AS DOUBLE))"
    d = _smd_expr("HUGEINT")
    side = """
        SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_{s},
               SUM(CAST(v AS DECIMAL(38,0))) AS s_{s},
               SUM(CAST(v AS DECIMAL(19,0)) * v) AS ss_{s}
        FROM (
            SELECT d.i - 1 AS dim,
                   CAST(floor(CAST(embedding[d.i] AS DOUBLE) * 1000000) AS BIGINT) AS v
            FROM embeddings,
                 LATERAL (SELECT UNNEST(range(1, len(embedding) + 1)) AS i) d
            WHERE vec_id % 2 = {par}
        ) GROUP BY dim
    """
    return f"""
        WITH a AS ({side.format(s='a', par=0)}),
             b AS ({side.format(s='b', par=1)})
        SELECT dim, n_a, n_b,
               ROUND({mean.format(s='a')} / 1000000.0, 6) AS mean_ref,
               ROUND({mean.format(s='b')} / 1000000.0, 6) AS mean_cur,
               ROUND({d}, 6) AS smd
        FROM a JOIN b USING (dim)
        ORDER BY dim
    """


QUERIES["embedding_drift_report"] = embedding_drift_report
ORACLE_SQL["embedding_drift_report"] = _drift_sql()


# ---- distributed covariance (the Gram heart of PCA), oracle-backed ------

EMB_COV_SCALE = 1 << 14  # micro-quantization: floor(e * 2^14) is exact
_EMB_COV_SCALE2 = float(EMB_COV_SCALE * EMB_COV_SCALE)
# the synthetic embeddings table is 64-dim; BOTH faces filter to exactly
# this size so ragged or empty (non-NULL) embeddings are excluded
# identically — without the pin, the oracle derived its dimension list
# from one arbitrary row while Spark expanded per-row sizes, silently
# diverging on ragged data and raising on a zero-length array.
EMB_COV_DIM = 64


def exact_moment_scan(emb: DataFrame, quant: int) -> DataFrame:
    """Exact integer second moments of the embedding table from ONE
    Arrow-batched scan: (i, j, n, s_i, s_j, s_ij) for every
    upper-triangle pair i <= j, on floor(e * quant) BIGINT coordinates.

    Each Arrow batch contributes ONE int64 GEMM partial (x.T @ x is
    exact integer arithmetic in numpy — no BLAS float path for int64 —
    with |entry| <= rows_per_partition * d * quant^2, far inside
    int64), emitted as 2080 partial rows per partition; a map-side
    combined groupBy folds partials into the global moments.  This
    replaced a per-row 2080-element HOF explode (interpreted flatten /
    transform per row — measured 4x slower at the sf1 profile for the
    identical integers).  At 100 TB the 2080-row partials per
    partition ARE the shuffle.
    """
    d = EMB_COV_DIM

    def part(batches):
        import numpy as np
        import pandas as pd

        P = np.zeros((d, d), dtype=np.int64)
        s = np.zeros(d, dtype=np.int64)
        cnt = 0
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.floor(
                np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
                * quant
            ).astype(np.int64)
            P += x.T @ x
            s += x.sum(axis=0)
            cnt += len(x)
        if cnt == 0:
            return
        iu = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": iu[0].astype(np.int32),
                "j": iu[1].astype(np.int32),
                "n_p": np.full(len(iu[0]), cnt, dtype=np.int64),
                "si_p": s[iu[0]],
                "sj_p": s[iu[1]],
                "p_p": P[iu],
            }
        )

    partials = emb.select("embedding").mapInPandas(
        part, schema="i int, j int, n_p long, si_p long, sj_p long, p_p long"
    )
    return partials.groupBy("i", "j").agg(
        F.sum("n_p").alias("n"),
        F.sum("si_p").alias("s_i"),
        F.sum("sj_p").alias("s_j"),
        F.sum("p_p").alias("s_ij"),
    )


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed heart of PCA/whitening — ORACLE-BACKED: the full
    upper-triangle covariance matrix of the embedding table from ONE
    scan, computed on floor(e * 2^14) BIGINT coordinates (quantization
    is the only approximation; every moment is an exact integer).

    Shape: one Arrow-batched GEMM partial per partition
    (``exact_moment_scan``), then a map-side-combined groupBy leaves
    only 2080 moment rows on the shuffle — at 100 TB the moments ARE
    the shuffle, which is why ``fit_pca``'s driver step only ever sees
    a d x d matrix.  The covariance itself is derived from the exact
    moments by a fixed IEEE sequence (three divisions, one multiply,
    one subtract), so both engines emit bit-identical doubles.

    ``embedding_pca`` stays rows-only (eigensolve); this pins the
    distributed portion of the decomposition family cross-engine.
    """
    emb = load_table(spark, "embeddings", sf_dir).where(
        F.col("embedding").isNotNull() & (F.size("embedding") == EMB_COV_DIM)
    )
    mom = exact_moment_scan(emb, EMB_COV_SCALE)
    cov = (
        F.col("s_ij").cast("double") / F.col("n").cast("double")
        - (F.col("s_i").cast("double") / F.col("n").cast("double"))
        * (F.col("s_j").cast("double") / F.col("n").cast("double"))
    ) / F.lit(_EMB_COV_SCALE2)
    return mom.select("i", "j", "n", "s_i", "s_j", "s_ij", cov.alias("cov")).orderBy(
        "i", "j"
    )


ORACLE_SQL["embedding_covariance"] = f"""
    WITH q AS (
        SELECT list_transform(embedding,
                   e -> CAST(floor(CAST(e AS DOUBLE) * {EMB_COV_SCALE}) AS BIGINT)) AS q
        FROM embeddings
        WHERE embedding IS NOT NULL AND len(embedding) = {EMB_COV_DIM}
    ), dims AS (
        SELECT UNNEST(range(0, {EMB_COV_DIM})) AS i
    ), pairs AS (
        SELECT a.i AS i, b.i AS j FROM dims a, dims b WHERE b.i >= a.i
    ), terms AS (
        SELECT p.i, p.j,
               q.q[p.i + 1] * q.q[p.j + 1] AS prod,
               q.q[p.i + 1] AS qi, q.q[p.j + 1] AS qj
        FROM q, pairs p
    ), mom AS (
        SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(qi) AS BIGINT) AS s_i,
               CAST(SUM(qj) AS BIGINT) AS s_j,
               CAST(SUM(prod) AS BIGINT) AS s_ij
        FROM terms GROUP BY i, j
    )
    SELECT i, j, n, s_i, s_j, s_ij,
           (CAST(s_ij AS DOUBLE) / CAST(n AS DOUBLE)
            - (CAST(s_i AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(s_j AS DOUBLE) / CAST(n AS DOUBLE)))
             / {_EMB_COV_SCALE2!r} AS cov
    FROM mom ORDER BY i, j
"""
QUERIES["embedding_covariance"] = embedding_covariance


# ---- integer-exact PCA power iteration: the oracle face of the
# ---- eigensolve behind embedding_pca --------------------------------------

PCX_QUANT = 1_024  # 2^10 (coarser than embedding_covariance's 2^14):
# scatter entries are n*s_ij - s_i*s_j <= n^2 * 2^20, inside BIGINT up
# to ~2e9 rows; the covariance face keeps the finer quant for moments
PCX_ROUNDS = 96  # fixed power-iteration rounds: the testdata eigengap
# ratio is ~0.988, so 96 rounds reach |cos| ~ 0.99 to the true leading
# eigenvector (measured; 12 rounds stalled at 0.60) — each round is a
# d-row matvec, trivially cheap on both faces
PCX_VSCALE = 1_024  # iterate renormalized to max|v| = 2^10 each round
PCX_SSCALE = 1 << 20  # scatter renormalized to max|S| ~ 2^20 once


def _pcx_power_iteration(moments):
    """The shared integer recurrence, in arbitrary-precision Python
    ints (the Spark face runs this on the collected 2080-row moment
    table; the DuckDB oracle unrolls the identical rounds in SQL).
    Division discipline: DuckDB ``//`` TRUNCATES toward zero on
    negatives (-7 // 2 = -3) while Python ``//`` floors (-4) — every
    division here goes through ``_tdiv`` (truncating) so the two
    faces agree on negative intermediates:

    S = n*s_ij - s_i*s_j (full symmetric scatter; eigenvectors of S
    equal eigenvectors of the covariance), renormalized ONCE by
    floor-div with GREATEST(max|S| // 2^20, 1); then PCX_ROUNDS rounds
    of (w = S v; v = (w * 2^10) // GREATEST(max|w|, 1)); output the
    final integer iterate and the exact Rayleigh pair
    (v' S v, v' v).
    """
    def _tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return q if a >= 0 else -q

    # Fail-fast on the BIGINT scatter contract (the KMV non-integral
    # precedent, sketches.py): the Python face computes n*s_ij - s_i*s_j
    # in arbitrary precision, but the DuckDB oracle evaluates the SAME
    # products in BIGINT — both factors and the difference must stay
    # under 2^63 or the oracle face overflows.  With |q| <= n_rows-
    # independent 2^10 per component, the bound n^2 * 2^20 crosses
    # 2^63 at n ~ 2.9e9 embedding rows; a 100 TB embedding table must
    # use the float ``fit_pca`` face (unaffected) — this face refuses
    # loudly instead of letting the two engines diverge.
    _I64 = 1 << 63
    for i, j, n, s_i, s_j, s_ij in moments:
        worst = max(abs(n * s_ij), abs(s_i * s_j), abs(n * s_ij - s_i * s_j))
        if worst >= _I64:
            raise ValueError(
                "embedding_pca_exact: scatter term for dims "
                f"({i},{j}) reaches {worst} >= 2^63 — the integer-exact "
                "face is BIGINT-bounded to ~2.9e9 embedding rows "
                "(n^2 * 2^20 < 2^63); use the float fit_pca face at "
                "this scale"
            )

    d = EMB_COV_DIM
    s = [[0] * d for _ in range(d)]
    for i, j, n, s_i, s_j, s_ij in moments:
        val = n * s_ij - s_i * s_j
        s[i][j] = val
        s[j][i] = val
    div = max(max(abs(x) for row in s for x in row) // PCX_SSCALE, 1)
    sq = [[_tdiv(x, div) for x in row] for row in s]
    v = [1] * d
    for _ in range(PCX_ROUNDS):
        w = [sum(sq[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(max(abs(x) for x in w), 1)
        v = [_tdiv(x * PCX_VSCALE, m) for x in w]
    rq_num = sum(v[i] * sq[i][j] * v[j] for i in range(d) for j in range(d))
    rq_den = sum(x * x for x in v)
    return v, rq_num, rq_den


def embedding_pca_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA's eigensolve with ALL arithmetic in integers — ORACLE-BACKED
    (r7): ``embedding_covariance`` pinned the distributed moments; this
    pins the POWER ITERATION on top of them, so the whole
    moments -> scatter -> leading-eigenvector chain is replayed
    bit-for-bit by DuckDB (fixed rounds, floor-div renormalization by
    a data-derived integer — the quantized-recurrence recipe of
    ml_kmeans_exact / ann_pq_exact / dedup_semantic_exact).

    Scale posture: the data-sized work is the ONE moment scan (each
    row expands to its d(d+1)/2 upper-triangle products, map-side
    combined to 2080 moment rows — identical to embedding_covariance);
    the iteration itself touches only the d x d integer matrix, run
    driver-side in arbitrary-precision Python (the documented bounded
    fit posture).  The float ``embedding_pca`` stays the numeric face;
    this face pins the RECURRENCE — with a small eigengap the iterate
    is convergence-incomplete but still engine-exact.

    Contract: BIGINT-bounded to ~2.9e9 embedding rows (scatter terms
    n*s_ij - s_i*s_j <= n^2 * 2^20 must stay under 2^63 for the DuckDB
    face); ``_pcx_power_iteration`` fail-fasts past the bound instead
    of letting the engines silently diverge — beyond it, use the float
    ``fit_pca`` face.

    No reference counterpart (sk-dist has no decomposition; net-new).
    """
    emb = load_table(spark, "embeddings", sf_dir).where(
        F.col("embedding").isNotNull() & (F.size("embedding") == EMB_COV_DIM)
    )
    mom = exact_moment_scan(emb, PCX_QUANT).collect()
    # bounded: d(d+1)/2 = 2080 rows, the fit posture
    v, rq_num, rq_den = _pcx_power_iteration(
        [(int(r.i), int(r.j), int(r.n), int(r.s_i), int(r.s_j), int(r.s_ij))
         for r in mom]
    )
    rows = [(i, v[i], rq_num, rq_den) for i in range(EMB_COV_DIM)]
    return spark.createDataFrame(
        rows, schema="pos int, loading bigint, rq_num bigint, rq_den bigint"
    ).orderBy("pos")


def _embedding_pca_exact_oracle_sql(
    quant: int = PCX_QUANT,
    rounds: int = PCX_ROUNDS,
    vscale: int = PCX_VSCALE,
    sscale: int = PCX_SSCALE,
    d: int = EMB_COV_DIM,
) -> str:
    parts = [
        f"""q AS MATERIALIZED (
            SELECT list_transform(embedding,
                       e -> CAST(floor(CAST(e AS DOUBLE) * {quant}) AS BIGINT)) AS q
            FROM embeddings
            WHERE embedding IS NOT NULL AND len(embedding) = {d}
        ), dims AS (
            SELECT UNNEST(range(0, {d})) AS i
        ), mom AS MATERIALIZED (
            SELECT p.i, p.j,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(q.q[p.i + 1]) AS BIGINT) AS s_i,
                   CAST(SUM(q.q[p.j + 1]) AS BIGINT) AS s_j,
                   CAST(SUM(q.q[p.i + 1] * q.q[p.j + 1]) AS BIGINT) AS s_ij
            FROM q, (SELECT a.i AS i, b.i AS j FROM dims a, dims b
                     WHERE b.i >= a.i) p
            GROUP BY p.i, p.j
        ), sfull AS MATERIALIZED (
            SELECT i, j, n * s_ij - s_i * s_j AS s FROM mom
            UNION ALL
            SELECT j, i, n * s_ij - s_i * s_j FROM mom WHERE i != j
        ), sdiv AS (
            SELECT GREATEST(MAX(ABS(s)) // {sscale}, 1) AS dv FROM sfull
        ), sq AS MATERIALIZED (
            SELECT i, j, s // (SELECT dv FROM sdiv) AS sq FROM sfull
        ), v0 AS (
            SELECT i, CAST(1 AS BIGINT) AS v FROM dims
        )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""w{r} AS MATERIALIZED (
                SELECT sq.i AS i, CAST(SUM(sq.sq * v.v) AS BIGINT) AS w
                FROM sq JOIN v{r - 1} v ON v.i = sq.j
                GROUP BY sq.i
            ), m{r} AS (
                SELECT GREATEST(MAX(ABS(w)), 1) AS m FROM w{r}
            ), v{r} AS MATERIALIZED (
                SELECT i, (w * {vscale}) // (SELECT m FROM m{r}) AS v
                FROM w{r}
            )"""
        )
    return (
        "WITH " + ",\n".join(parts) + f""",
        rq AS (
            SELECT CAST(SUM(a.v * sq.sq * b.v) AS BIGINT) AS num
            FROM sq
            JOIN v{rounds} a ON a.i = sq.i
            JOIN v{rounds} b ON b.i = sq.j
        ), den AS (
            SELECT CAST(SUM(v * v) AS BIGINT) AS den FROM v{rounds}
        )
        SELECT CAST(v.i AS INT) AS pos, CAST(v.v AS BIGINT) AS loading,
               (SELECT num FROM rq) AS rq_num,
               (SELECT den FROM den) AS rq_den
        FROM v{rounds} v ORDER BY pos
    """
    )


QUERIES["embedding_pca_exact"] = embedding_pca_exact
ORACLE_SQL["embedding_pca_exact"] = _embedding_pca_exact_oracle_sql()
