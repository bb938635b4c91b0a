"""Similarity search over embedding columns.

- ann_topk: exact brute-force cosine top-k for a bounded query set —
  broadcast the queries, one pass over the corpus, per-query top-k via
  ranked window. The exactness baseline.
- ann_lsh: random-hyperplane (sign) LSH bucketing — the 100 TB path:
  candidates meet in buckets via an equi-join instead of a cross join.
  Hyperplanes are derived deterministically from md5, so results are
  reproducible and the bucket assignment is oracle-checked (the sign
  matrix inlines into DuckDB SQL with the same fold order).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors
LSH_BITS = 8

_DOT = "aggregate(zip_with(q.v, c.v, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
_NORM = "sqrt(aggregate(transform({0}, x -> x * x), 0D, (acc, x) -> acc + x))"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: queries (vec_id < N_QUERIES) x corpus.

    The query side is bounded (N_QUERIES ids), so the scan is one
    map-side pass over the corpus — linear in corpus size, no shuffle
    of the big side; top-k via window on the query key.

    Implementation (r8): the bounded query block rides the mapInPandas
    closure (the same state the old plan broadcast) and each Arrow
    batch computes one cosine tile whose values reproduce the SQL left
    fold bit-for-bit (dimension-at-a-time accumulation + the same
    norm/divide order), pre-pruned to the per-batch top-k per query
    under the final (cosine desc, neighbor_id) order — a superset of
    the global top-k, so the window reads O(batches * k) rows per
    query instead of the whole corpus.
    """
    import numpy as np

    emb = _emb(spark, sf_dir)
    q_rows = sorted(
        emb.where(F.col("vec_id") < N_QUERIES).collect(),
        key=lambda r: r["vec_id"],
    )
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    QV = np.array([list(r["v"]) for r in q_rows], dtype=np.float64)
    nq = len(qids)

    def _norms(M):
        acc = np.zeros(len(M))
        for i in range(M.shape[1]):
            acc += M[:, i] * M[:, i]
        return np.sqrt(acc)

    qnorm = _norms(QV) if nq else np.zeros(0)

    def score_batches(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf) or not nq:
                continue
            C = np.array([np.asarray(x) for x in pdf["v"]], dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            tile = np.zeros((nq, len(C)))
            for i in range(C.shape[1]):
                tile += np.outer(QV[:, i], C[:, i])
            cos = tile / (qnorm[:, None] * _norms(C)[None, :])
            out_q, out_n, out_c = [], [], []
            for r in range(nq):
                mask = ids != qids[r]
                cand_n, cand_c = ids[mask], cos[r, mask]
                order = np.lexsort((cand_n, -cand_c))[
                    : min(TOP_K, len(cand_n))
                ]
                out_q.append(np.full(len(order), qids[r]))
                out_n.append(cand_n[order])
                out_c.append(cand_c[order])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q) if out_q else [],
                    "neighbor_id": np.concatenate(out_n) if out_n else [],
                    "cosine": np.concatenate(out_c) if out_c else [],
                }
            )

    scored = emb.mapInPandas(
        score_batches, schema="query_id long, neighbor_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN: 8-bit signatures from deterministic
    pseudo-random hyperplanes; neighbors retrieved per bucket.

    Hyperplane r_b[i] = +1/-1 from a md5-derived bit — reproducible
    everywhere without shipping a matrix. Output: per-bucket stats.
    Oracle-checked: the same sign matrix inlines into DuckDB SQL as an
    explicit left-associated sum, so both engines compute bit-identical
    projections and identical bucket assignments.
    """
    emb = _emb(spark, sf_dir)
    # bit b of the signature: sign of dot(v, r_b), r_b[i] in {+1,-1}
    # from the high bit of md5(b:i)'s first hex nibble. The md5 depends
    # only on (b, i), so the whole sign matrix is computed ONCE here and
    # inlined as +/-x literals — the per-row lambda is pure arithmetic
    # (the naive spelling re-hashes inside the lambda: rows x bits x dims
    # digest evaluations for 512 distinct values).
    import hashlib

    dims = 64  # embeddings are fixed 64-d (TESTDATA.md)
    bit_exprs = []
    for b in range(LSH_BITS):
        signs = [
            "x" if hashlib.md5(f"{b}:{i}".encode()).hexdigest()[0] in "89abcdef" else "-x"
            for i in range(dims)
        ]
        sign_arr = ", ".join(
            "1D" if s == "x" else "-1D" for s in signs
        )
        proj = (
            f"aggregate(zip_with(v, array({sign_arr}),"
            f" (x, s) -> x * s), 0D, (acc, x) -> acc + x)"
        )
        bit_exprs.append(f"(CASE WHEN {proj} > 0 THEN {2**b} ELSE 0 END)")
    sig = " + ".join(bit_exprs)
    buckets = emb.withColumn("bucket", F.expr(sig).cast("int"))
    return (
        buckets.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
            F.max("vec_id").alias("max_vec_id"),
        )
        .orderBy("bucket")
    )


def _lsh_oracle_sql() -> str:
    """DuckDB spelling of ann_lsh: identical md5-derived sign matrix,
    explicit left-associated projection sum (same fold order as the
    Spark ``aggregate``), same bucket arithmetic."""
    import hashlib

    dims = 64
    bit_sqls = []
    for b in range(LSH_BITS):
        acc = "0"
        for i in range(dims):
            sign = (
                "1.0"
                if hashlib.md5(f"{b}:{i}".encode()).hexdigest()[0] in "89abcdef"
                else "-1.0"
            )
            acc = f"({acc} + v[{i + 1}] * {sign})"
        bit_sqls.append(f"(CASE WHEN {acc} > 0 THEN {2**b} ELSE 0 END)")
    sig = " + ".join(bit_sqls)
    return f"""
        WITH e AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), b AS (
            SELECT vec_id, CAST({sig} AS INTEGER) AS bucket FROM e
        )
        SELECT bucket, COUNT(*) AS n_vectors,
               MIN(vec_id) AS min_vec_id, MAX(vec_id) AS max_vec_id
        FROM b GROUP BY bucket ORDER BY bucket
    """


_DUCK_DOT = (
    "list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]),"
    " (x, y) -> x + y)"
)
_DUCK_NORM = (
    "sqrt(list_reduce(list_transform({0}, x -> x * x), (x, y) -> x + y))"
)


def _ivf_oracle_sql(nprobe: int | None = None) -> str:
    """DuckDB spelling of ann_ivf. Dot products and norms are
    left-fold sums in the same order as the Spark ``aggregate``
    expressions (list_reduce's first-element init equals Spark's 0D
    init exactly in IEEE), so every cosine is bit-identical and the
    argmax / probe / re-rank orderings agree without tolerance.
    Tie-breaks replicate the Spark ones: cell assignment = max_by
    struct(cos, cent_id) -> highest id on ties; probe list =
    array_sort(struct(-cos, cent_id)) -> lowest id first."""
    if nprobe is None:
        nprobe = IVF_NPROBE
    dot_vc = _DUCK_DOT.format(a="e.v", b="c.cv")
    cand_dot = _DUCK_DOT.format(a="p.qv", b="cl.v")
    return f"""
        WITH e AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), c AS (
            SELECT vec_id AS cent_id, v AS cv FROM e
            WHERE vec_id >= {_CENTROID_BASE} AND vec_id < {_CENTROID_BASE + IVF_NLIST}
        ), scored AS (
            SELECT e.vec_id, e.v, c.cent_id,
                   {dot_vc} / ({_DUCK_NORM.format('e.v')} * {_DUCK_NORM.format('c.cv')})
                       AS cent_cos
            FROM e CROSS JOIN c
        ), ranked AS (
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY cent_cos DESC, cent_id DESC) AS rn_assign,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY cent_cos DESC, cent_id ASC) AS rn_probe
            FROM scored
        ), cells AS (
            SELECT vec_id, cent_id AS cell, v FROM ranked WHERE rn_assign = 1
        ), probes AS (
            SELECT vec_id AS query_id, v AS qv, cent_id AS cell
            FROM ranked WHERE vec_id < {N_QUERIES} AND rn_probe <= {nprobe}
        ), cand AS (
            SELECT p.query_id, cl.vec_id AS neighbor_id,
                   {cand_dot} / ({_DUCK_NORM.format('p.qv')} * {_DUCK_NORM.format('cl.v')})
                       AS cosine
            FROM probes p JOIN cells cl USING (cell)
            WHERE p.query_id != cl.vec_id
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
            FROM cand
        ) WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """


def cosine_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Generic exact cosine top-k: for each query vector, the k nearest
    corpus vectors. The query side is broadcast (bounded by contract),
    so the scan is one map-side pass over the corpus — same plan shape
    as ann_topk but over arbitrary frames. Self-matches (equal ids)
    are excluded.
    """
    q = F.broadcast(
        queries_df.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
    )
    c = corpus_df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    dot = "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    nrm = "sqrt(aggregate(transform({0}, x -> x * x), 0D, (acc, x) -> acc + x))"
    cos = f"{dot} / ({nrm.format('qv')} * {nrm.format('cv')})"
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.expr(cos).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


IVF_NLIST = 16
IVF_NPROBE = 4
_CENTROID_BASE = 100  # corpus vectors used as deterministic centroids


def _ann_ivf_index(emb: DataFrame):
    """``ann_ivf``'s static side — the collected centroid matrix and
    the corpus cell assignment (the data-sized stage; independent of
    ``nprobe``) — split out so ``ann_probe_sweep`` can assign cells
    ONCE for all sweep points instead of once per probe budget.
    Returns ``(C_ids, CV, cells)``; the arithmetic is byte-for-byte
    the former inline build."""
    import numpy as np

    cent_rows = sorted(
        emb.where(
            (F.col("vec_id") >= _CENTROID_BASE)
            & (F.col("vec_id") < _CENTROID_BASE + IVF_NLIST)
        )
        .select(F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"))
        .collect(),
        key=lambda r: r["cent_id"],
    )
    C_ids = np.array([r["cent_id"] for r in cent_rows], dtype=np.int64)
    CV = np.array([list(r["cv"]) for r in cent_rows], dtype=np.float64)
    ncent = len(C_ids)
    cnorm = _ivf_norms(CV) if ncent else np.zeros(0)

    def assign_cells(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf) or not ncent:
                continue
            V = np.array([np.asarray(x) for x in pdf["v"]], dtype=np.float64)
            cos = _ivf_cos_tile(V, CV, _ivf_norms(V), cnorm)
            j = (ncent - 1) - np.argmax(cos[:, ::-1], axis=1)
            yield pd.DataFrame(
                {"cell": C_ids[j], "vec_id": pdf["vec_id"], "v": pdf["v"]}
            )

    cells = emb.mapInPandas(
        assign_cells, schema="cell long, vec_id long, v array<double>"
    )
    return C_ids, CV, cells


def ann_ivf(
    spark: SparkSession,
    sf_dir: str,
    nprobe: int = IVF_NPROBE,
    _index=None,
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus partitioned into NLIST cells by
    nearest centroid; each query probes only its NPROBE nearest cells.

    Centroids are a deterministic data sample (vec_ids 100..115) in
    place of a k-means pass — the plan shape is identical to trained
    IVF. Everything is DataFrame ops: assignment is a broadcast
    corpus x centroids score + ``max_by`` argmax (map-side, no
    shuffle of the corpus beyond one groupBy on vec_id); probing
    explodes each query to NPROBE cells; candidate retrieval is an
    EQUI-join on cell id (this is what kills the cross join at 100 TB:
    candidates per query drop by ~NLIST/NPROBE); exact cosine re-rank
    inside candidates only. Rows-only (recall-vs-exact is tested).

    Implementation (r8): the same exact left-fold GEMM stages as
    ``ivf_join`` (cosines bit-identical to the SQL fold, ties
    identical), with the self-match filter applied inside the per-cell
    cogroup BEFORE its top-k prune.
    """
    import numpy as np

    emb = _emb(spark, sf_dir)
    if _index is None:
        C_ids, CV, cells = _ann_ivf_index(emb)
    else:
        C_ids, CV, cells = _index
    ncent = len(C_ids)
    _norms, _cos_tile = _ivf_norms, _ivf_cos_tile
    cnorm = _norms(CV) if ncent else np.zeros(0)
    take = min(nprobe, ncent) if ncent else 0

    def probe_lists(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf) or not take:
                continue
            Q = np.array([np.asarray(x) for x in pdf["v"]], dtype=np.float64)
            neg = -_cos_tile(Q, CV, _norms(Q), cnorm)
            out = np.empty((len(Q), take), dtype=np.int64)
            for r in range(len(Q)):
                out[r] = C_ids[np.lexsort((C_ids, neg[r]))[:take]]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(pdf["vec_id"].to_numpy(), take),
                    "qv": [v for v in pdf["v"] for _ in range(take)],
                    "cell": out.ravel(),
                }
            )

    probes = emb.where(F.col("vec_id") < N_QUERIES).mapInPandas(
        probe_lists, schema="query_id long, qv array<double>, cell long"
    )

    def cell_candidates(qpdf, cpdf):
        import pandas as pd

        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int64"),
                    "neighbor_id": pd.Series(dtype="int64"),
                    "cosine": pd.Series(dtype="float64"),
                }
            )
        Q = np.array([np.asarray(x) for x in qpdf["qv"]], dtype=np.float64)
        C = np.array([np.asarray(x) for x in cpdf["v"]], dtype=np.float64)
        cos = _cos_tile(Q, C, _norms(Q), _norms(C))
        nids = cpdf["vec_id"].to_numpy()
        qids = qpdf["query_id"].to_numpy()
        out_q, out_n, out_c = [], [], []
        for r in range(len(Q)):
            mask = nids != qids[r]  # self-match filter BEFORE the prune
            cand_n, cand_c = nids[mask], cos[r, mask]
            order = np.lexsort((cand_n, -cand_c))[: min(TOP_K, len(cand_n))]
            out_q.append(np.full(len(order), qids[r]))
            out_n.append(cand_n[order])
            out_c.append(cand_c[order])
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q) if out_q else [],
                "neighbor_id": np.concatenate(out_n) if out_n else [],
                "cosine": np.concatenate(out_c) if out_c else [],
            }
        )

    cand = (
        probes.groupby("cell")
        .cogroup(cells.groupby("cell"))
        .applyInPandas(
            cell_candidates,
            schema="query_id long, neighbor_id long, cosine double",
        )
    )
    w_k = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w_k))
        .where(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


# ---- Product quantization ANN ----------------------------------------
# The memory-scale path beyond IVF: 64-dim float vectors compress to
# M one-byte codes (16x here), and search happens against CODES with
# per-query lookup tables (asymmetric distance computation) — at 100 TB
# the corpus resident set shrinks from 256 GB of floats to 16 GB of
# codes while scans stay sequential. Codebooks are trained once on a
# bounded deterministic driver sample (k-means is the reference PQ
# construction); encoding and search are Arrow-batch numpy (dense
# linear algebra — the one place SQL lambdas lose by ~10x, same
# precedent as the blocked-GEMM embedding dedup).

PQ_M = 8          # subspaces (64 dims -> 8 per subspace)
PQ_K = 16         # centroids per subspace -> 4-bit codes
PQ_SAMPLE = 2000  # training sample rows (driver-side, bounded)
PQ_ITERS = 10


def _pq_lloyd(sub: "np.ndarray", k: int, iters: int) -> "np.ndarray":
    """Deterministic local k-means for one subspace: farthest-first
    seeding from row 0, fixed iteration count, empty clusters re-seeded
    from the worst-fit point."""
    import numpy as np

    cents = [sub[0]]
    d2 = ((sub - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        cents.append(sub[int(np.argmax(d2))])
        d2 = np.minimum(d2, ((sub - cents[-1]) ** 2).sum(axis=1))
    c = np.stack(cents)
    for _ in range(iters):
        dist = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = dist.argmin(axis=1)
        for j in range(k):
            members = sub[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
            else:
                c[j] = sub[int(dist.min(axis=1).argmax())]
    return c


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = PQ_M,
    k: int = PQ_K,
) -> "np.ndarray":
    """Train PQ codebooks (m, k, d/m) on a deterministic bounded sample
    of L2-NORMALIZED vectors (normalized so approx-L2 ranking equals
    cosine ranking downstream)."""
    import numpy as np

    sample = (
        df.select(id_col, vec_col).orderBy(id_col).limit(PQ_SAMPLE).toPandas()
    )
    x = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    d = x.shape[1]
    sub_d = d // m
    return np.stack(
        [_pq_lloyd(x[:, i * sub_d : (i + 1) * sub_d], k, PQ_ITERS) for i in range(m)]
    )


def pq_encode(df: DataFrame, codebooks, vec_col: str = "embedding") -> DataFrame:
    """Attach ``codes`` (array<int>, one code per subspace): nearest
    centroid per normalized sub-vector, vectorized per Arrow batch."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    cb = codebooks  # (m, k, sub_d) — serialized once per executor
    m, _, sub_d = cb.shape

    def _encode(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        codes = np.empty((len(x), m), dtype=np.int32)
        for i in range(m):
            subx = x[:, i * sub_d : (i + 1) * sub_d]
            dist = ((subx[:, None, :] - cb[i][None, :, :]) ** 2).sum(axis=2)
            codes[:, i] = dist.argmin(axis=1)
        return pd.Series(list(codes))

    encode = F.pandas_udf(_encode, ArrayType(IntegerType()))
    return df.withColumn("codes", encode(F.col(vec_col)))


def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ANN: top-k neighbors per query by asymmetric distance
    (exact query sub-vectors against corpus codes via per-query lookup
    tables). Same query/corpus split and output shape as ann_topk."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, "embeddings", sf_dir)
    codebooks = train_pq_codebooks(emb)
    m, k, sub_d = codebooks.shape
    corpus = pq_encode(emb.where(F.col("vec_id") >= N_QUERIES), codebooks).select(
        "vec_id", "codes"
    )

    qrows = (
        emb.where(F.col("vec_id") < N_QUERIES).orderBy("vec_id").toPandas()
    )
    q = np.stack(qrows["embedding"].to_numpy()).astype(np.float64)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # LUT[query, subspace, code] = squared L2 from the query sub-vector
    lut = np.empty((len(q), m, k))
    for i in range(m):
        subq = q[:, i * sub_d : (i + 1) * sub_d]
        lut[:, i, :] = ((subq[:, None, :] - codebooks[i][None, :, :]) ** 2).sum(axis=2)
    qids = qrows["vec_id"].to_numpy()

    out_schema = "query_id long, neighbor_id long, approx_dist double"

    def score(batches):
        for pdf in batches:
            codes = np.stack(pdf["codes"].to_numpy())  # (B, m)
            # ADC: gather per-subspace table entries and sum -> (Q, B)
            dists = lut[:, np.arange(m)[None, :], codes].sum(axis=2)
            b = len(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, b),
                    "neighbor_id": np.tile(pdf["vec_id"].to_numpy(), len(qids)),
                    "approx_dist": np.round(dists, 9).ravel(),
                }
            )

    scored = corpus.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


# feature-moment correlation: dims quantized to exact integer
# micro-units (float x 1e6 is exact in double: 24-bit mantissa x 20-bit
# scale < 53 bits), so every cross-engine moment is a bit-identical
# BIGINT and the final double formula is bit-identical too — the only
# way a corpus-order-independent Pearson matrix hash-matches DuckDB.
CORR_DIMS = 4


def feature_corr(
    df: DataFrame, vec_col: str = "embedding", n_dims: int = CORR_DIMS
) -> DataFrame:
    """Pearson correlation matrix of the first ``n_dims`` vector
    dimensions in ONE pass: 2d + d(d-1)/2 integer moments, all
    map-side combinable — at 100 TB this is a single scan + one
    scalar-row reduce, vs d^2 separate corr() passes.
    Returns (dim_i, dim_j, n, corr) for i < j.
    """
    q = [
        F.expr(
            f"CAST(floor(CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) * 1000000) AS BIGINT)"
        ).alias(f"x{i}")
        for i in range(n_dims)
    ]
    qdf = df.select(*q)
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(n_dims):
        aggs.append(F.sum(F.col(f"x{i}").cast("decimal(38,0)")).alias(f"s{i}"))
        aggs.append(
            F.sum(F.expr(f"CAST(x{i} AS DECIMAL(19,0)) * x{i}").cast("decimal(38,0)")).alias(f"ss{i}")
        )
    pairs = [(i, j) for i in range(n_dims) for j in range(n_dims) if i < j]
    for i, j in pairs:
        aggs.append(
            F.sum(F.expr(f"CAST(x{i} AS DECIMAL(19,0)) * x{j}").cast("decimal(38,0)")).alias(f"c{i}_{j}")
        )
    m = qdf.agg(*aggs)
    corr_exprs = []
    for i, j in pairs:
        num = f"(CAST(n AS DOUBLE) * CAST(c{i}_{j} AS DOUBLE) - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE))"
        den = (
            f"sqrt(CAST(n AS DOUBLE) * CAST(ss{i} AS DOUBLE) - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
            f" * sqrt(CAST(n AS DOUBLE) * CAST(ss{j} AS DOUBLE) - CAST(s{j} AS DOUBLE) * CAST(s{j} AS DOUBLE))"
        )
        corr_exprs.append(f"{i}, {j}, n, {num} / ({den})")
    stacked = ", ".join(corr_exprs)
    return m.select(
        F.expr(
            f"stack({len(pairs)}, {stacked}) AS (dim_i, dim_j, n, corr)"
        )
    ).orderBy("dim_i", "dim_j")


def embedding_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation matrix of the first 4 embedding dimensions."""
    return feature_corr(load_table(spark, "embeddings", sf_dir))


def _duck_corr_sql() -> str:
    dims = range(CORR_DIMS)
    qcols = ", ".join(
        f"CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000) AS BIGINT) AS x{i}"
        for i in dims
    )
    moments = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for i in dims:
        moments.append(f"CAST(SUM(CAST(x{i} AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s{i}")
        moments.append(
            f"CAST(SUM(CAST(x{i} AS DECIMAL(19,0)) * x{i}) AS DECIMAL(38,0)) AS ss{i}"
        )
    pairs = [(i, j) for i in dims for j in dims if i < j]
    for i, j in pairs:
        moments.append(
            f"CAST(SUM(CAST(x{i} AS DECIMAL(19,0)) * x{j}) AS DECIMAL(38,0)) AS c{i}_{j}"
        )
    selects = []
    for i, j in pairs:
        num = f"(CAST(n AS DOUBLE) * CAST(c{i}_{j} AS DOUBLE) - CAST(s{i} AS DOUBLE) * CAST(s{j} AS DOUBLE))"
        den = (
            f"sqrt(CAST(n AS DOUBLE) * CAST(ss{i} AS DOUBLE) - CAST(s{i} AS DOUBLE) * CAST(s{i} AS DOUBLE))"
            f" * sqrt(CAST(n AS DOUBLE) * CAST(ss{j} AS DOUBLE) - CAST(s{j} AS DOUBLE) * CAST(s{j} AS DOUBLE))"
        )
        selects.append(
            f"SELECT {i} AS dim_i, {j} AS dim_j, n, {num} / ({den}) AS corr FROM m"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
        WITH q AS (SELECT {qcols} FROM embeddings),
        m AS (SELECT {", ".join(moments)} FROM q)
        {union}
        ORDER BY dim_i, dim_j
    """


# ---- int8-quantized ANN ----------------------------------------------


def quantize_int8(df: DataFrame, id_col: str = "vec_id", vec_col: str = "v") -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|x| / 127,
    code_i = round(x_i / scale) — 4x memory compression (the standard
    serving-time embedding compression below PQ's 16x), all in SQL
    expressions so both engines quantize bit-identically.
    Returns (id, codes array<int>, scale double, norm double)."""
    scale = "aggregate(v, 0D, (acc, x) -> greatest(acc, abs(x))) / 127.0D"
    return df.select(
        F.col(id_col),
        F.col(vec_col).alias("v"),
    ).select(
        id_col,
        F.expr(f"({scale})").alias("scale"),
        F.expr(
            f"transform(v, x -> CAST(round(x / ({scale})) AS INT))"
        ).alias("codes"),
        F.expr(_NORM.format("v")).alias("norm"),
    )


def ann_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN over int8-quantized vectors: the integer dot product of the
    codes (exact BIGINT arithmetic — no float summation to diverge)
    rescales by the two quantization scales to approximate the cosine;
    queries are the standard bounded broadcast set.

    At 100 TB the corpus resident set shrinks 4x and the hot loop is
    integer multiply-adds; the top-k lists land within ~1% of the
    float cosine ranking (int8 is the serving default for a reason).
    """
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q8 = quantize_int8(emb)
    queries = F.broadcast(
        q8.where(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("codes").alias("qc"),
            F.col("scale").alias("qs"),
            F.col("norm").alias("qn"),
        )
    )
    corpus = q8.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("codes").alias("cc"),
        F.col("scale").alias("cs"),
        F.col("norm").alias("cn"),
    )
    # exact integer dot of the code arrays, then one float rescale
    int_dot = (
        "aggregate(zip_with(qc, cc, (a, b) -> CAST(a AS BIGINT) * b),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    approx_cos = f"(CAST({int_dot} AS DOUBLE) * qs * cs) / (qn * cn)"
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        queries.join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(f"ROUND({approx_cos}, 6)").alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def _int8_oracle_sql() -> str:
    scale = "list_reduce(list_transform(v, x -> abs(x)), (a, b) -> greatest(a, b)) / 127.0"
    int_dot = (
        "list_reduce(list_transform(range(1, 65), i -> CAST(q.codes[i] AS BIGINT) * c.codes[i]),"
        " (a, b) -> a + b)"
    )
    return f"""
        WITH e AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), q8 AS (
            SELECT vec_id,
                   ({scale}) AS scale,
                   list_transform(v, x -> CAST(round(x / ({scale})) AS INT)) AS codes,
                   {_DUCK_NORM_BASE} AS norm
            FROM e
        ), scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROUND((CAST({int_dot} AS DOUBLE) * q.scale * c.scale)
                         / (q.norm * c.norm), 6) AS cosine
            FROM q8 q JOIN q8 c ON q.vec_id != c.vec_id
            WHERE q.vec_id < {N_QUERIES}
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """


_DUCK_NORM_BASE = "sqrt(list_reduce(list_transform(v, x -> x * x), (x, y) -> x + y))"


# ---- Metadata-filtered ANN -------------------------------------------


def ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search: exact cosine top-k restricted
    to corpus vectors whose label is even — the PRE-filtering shape
    (filter, then score only survivors).

    In dedicated vector stores filtered ANN is the hard case (the
    index doesn't know the predicate); in a relational engine it's
    free: the label predicate is an ordinary pushed-down filter under
    the same broadcast scoring pass, so selectivity directly reduces
    scored rows.  Self-matches excluded as in ann_topk.
    """
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = F.broadcast(
        emb.where(F.col("vec_id") < N_QUERIES).select("vec_id", "v")
    ).alias("q")
    corpus = emb.where(F.col("label") % 2 == 0).select("vec_id", "v").alias("c")
    cos = f"{_DOT} / ({_NORM.format('q.v')} * {_NORM.format('c.v')})"
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        queries.join(corpus, F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.expr(cos).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def _filtered_oracle_sql() -> str:
    dot = _DUCK_DOT.format(a="q.v", b="c.v")
    return f"""
        WITH e AS (
            SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {dot} / ({_DUCK_NORM.format('q.v')} * {_DUCK_NORM.format('c.v')}) AS cosine
            FROM e q JOIN e c ON q.vec_id != c.vec_id
            WHERE q.vec_id < {N_QUERIES} AND c.label % 2 = 0
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
            FROM scored
        ) WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """


# ---- Cross-corpus IVF similarity join --------------------------------

IVF_JOIN_NPROBE = 4
# cells scale with the corpus so the EXPECTED CELL SIZE stays constant:
# with nlist fixed, cells fatten linearly and the probe-join candidate
# count per query grows linearly — times a query side that also grows,
# an O(N^2) join (measured 10x-data slope 31 at the sf1 profile before
# this).  nlist = max(IVF_NLIST, corpus // TARGET) keeps it linear; at
# the driver SFs (corpus <= 1000) the max() leaves nlist at 16, so
# oracle results are unchanged there.
IVF_JOIN_TARGET_CELL = 128


def _ivf_norms(M):
    # left-fold sum of squares + one sqrt — same op sequence as
    # sqrt(aggregate(transform(v, x -> x*x), 0D, +))
    import numpy as np

    acc = np.zeros(len(M))
    for i in range(M.shape[1]):
        acc += M[:, i] * M[:, i]
    return np.sqrt(acc)


def _ivf_cos_tile(A, B, an, bn):
    # dimension-at-a-time outer-product adds == the zip_with left
    # fold; then dot / (norm_a * norm_b) in the SQL's op order
    import numpy as np

    tile = np.zeros((len(A), len(B)))
    for i in range(A.shape[1]):
        tile += np.outer(A[:, i], B[:, i])
    return tile / (an[:, None] * bn[None, :])


class _IvfIndex:
    """The STATIC side of ``ivf_join``, built once and served many
    times: the collected centroid matrix (bounded — it is the same
    state every prior plan broadcast) plus the corpus cell-assignment
    frame.  The one consumer that amortizes it is the streaming
    replica: cell assignment is the O(|corpus| x nlist) stage, and
    re-deriving it per micro-batch re-paid the whole static-side cost
    for every trigger of a stream whose static corpus never changes."""

    __slots__ = ("C_ids", "CV", "cnorm", "ncent", "cells")

    def __init__(self, C_ids, CV, cnorm, ncent, cells):
        self.C_ids = C_ids
        self.CV = CV
        self.cnorm = cnorm
        self.ncent = ncent
        self.cells = cells


def ivf_build_index(
    corpus_df: DataFrame,
    centroids_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    reuse: bool = True,
) -> "_IvfIndex":
    """Collect the centroids and assign every corpus vector to its
    cell — ``ivf_join``'s static side.  With ``reuse=True`` the cell
    frame is lazily localCheckpoint'ed so the first consumer
    materializes it and every later one (the next micro-batch) reads
    the stored rows instead of re-scoring the corpus."""
    import numpy as np

    cent_rows = sorted(
        centroids_df.select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cv")
        ).collect(),
        key=lambda r: r["cent_id"],
    )
    C_ids = np.array([r["cent_id"] for r in cent_rows], dtype=np.int64)
    CV = np.array([list(r["cv"]) for r in cent_rows], dtype=np.float64)
    ncent = len(C_ids)
    cnorm = _ivf_norms(CV) if ncent else np.zeros(0)

    # pin scoring parallelism: the centroid scoring stages are the
    # compute-heavy passes and the test corpora arrive as single-split
    # scans — without the spread AQE coalesces the tiny-byte stage
    # onto one task
    n_par = corpus_df.sparkSession.sparkContext.defaultParallelism
    corpus = corpus_df.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("v")
    ).repartition(n_par, F.col("cid"))

    def assign_cells(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf) or not ncent:
                continue
            V = np.array([np.asarray(x) for x in pdf["v"]], dtype=np.float64)
            cos = _ivf_cos_tile(V, CV, _ivf_norms(V), cnorm)
            # ties -> HIGHEST cent_id (max_by struct(cent_cos, cent_id)):
            # argmax over reversed columns returns the LAST max
            j = (ncent - 1) - np.argmax(cos[:, ::-1], axis=1)
            yield pd.DataFrame(
                {"cell": C_ids[j], "cid": pdf["cid"], "v": pdf["v"]}
            )

    cells = corpus.mapInPandas(
        assign_cells, schema="cell long, cid long, v array<double>"
    )
    if reuse:
        cells = cells.localCheckpoint(eager=False)
    return _IvfIndex(C_ids, CV, cnorm, ncent, cells)


def ivf_join(
    queries_df: DataFrame,
    corpus_df: DataFrame = None,
    centroids_df: DataFrame = None,
    k: int = TOP_K,
    nprobe: int = IVF_JOIN_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "v",
    index: "_IvfIndex | None" = None,
) -> DataFrame:
    """Cross-corpus ANN join: for every QUERY vector, the k nearest
    CORPUS vectors, with both sides arbitrarily large.

    This is the scale shape `cosine_topk` can't reach (it broadcasts
    the query side): both sides are partitioned into shared IVF cells
    against one broadcast centroid set, and candidates meet through an
    EQUI-join on cell id — per-query work drops from |corpus| to
    ~nprobe/nlist of it, and the shuffle is the cell-keyed join, never
    a cross join.  Corpus cell assignment is one groupBy on the corpus
    id; query probe lists come from the same argmax aggregation shape.

    Ids may overlap across sides (they name different corpora); no
    self-match filter is applied.  Ties replicate ann_ivf: cell
    assignment takes the highest cent_id on equal cosine, probe order
    the lowest.

    Implementation (r8): every cosine is produced by the
    dimension-at-a-time numpy accumulation that reproduces the SQL
    left fold BIT-FOR-BIT (the _embedding_impl determinism trick), so
    the DuckDB oracle and the streaming replica see identical doubles
    while the per-pair interpreted HOF evaluation — |side| x nlist x d
    lambda evals in the centroid stages, |candidates| x d in the
    serving join — becomes three vectorized stages: a mapInPandas
    cell assignment, a mapInPandas probe-list builder (the centroid
    matrix rides each closure; it is the same bounded state the old
    plan broadcast), and a per-cell COGROUP that scores each query
    block against its cell's members in one tile and pre-prunes to
    the per-cell top-k under the final (cosine desc, neighbor_id)
    order — a superset of the global top-k by construction, so the
    rank window reads O(cells x k) rows per query, never every
    candidate.
    ``index``: a prebuilt ``ivf_build_index`` result; the batch faces
    build it inline per call (``reuse=False`` — no checkpoint storage
    for a once-read frame, plans unchanged), the streaming replica
    builds it ONCE and serves every micro-batch from it instead of
    re-assigning the static corpus per trigger.
    """
    import numpy as np

    if index is None:
        index = ivf_build_index(
            corpus_df, centroids_df, id_col, vec_col, reuse=False
        )
    C_ids, CV, cnorm, ncent = index.C_ids, index.CV, index.cnorm, index.ncent
    cells = index.cells
    _norms, _cos_tile = _ivf_norms, _ivf_cos_tile

    n_par = queries_df.sparkSession.sparkContext.defaultParallelism
    queries = queries_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("v")
    ).repartition(n_par, F.col("query_id"))

    take = min(nprobe, ncent) if ncent else 0

    def probe_lists(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf) or not take:
                continue
            Q = np.array([np.asarray(x) for x in pdf["v"]], dtype=np.float64)
            cos = _cos_tile(Q, CV, _norms(Q), cnorm)
            # ascending (neg_cos, cent_id) == the array_sort of
            # struct(negate(cent_cos), cent_id): ties -> lowest id.
            # C_ids is ascending, so a STABLE argsort of -cos (ties ->
            # lowest column index -> lowest cent_id) is exactly the
            # per-row lexsort((C_ids, -cos[r])) — but one C-level sort
            # over the whole tile instead of a Python loop per row
            order = np.argsort(-cos, axis=1, kind="stable")[:, :take]
            cells_out = C_ids[order]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(
                        pdf["query_id"].to_numpy(), take
                    ),
                    "qv": [v for v in pdf["v"] for _ in range(take)],
                    "cell": cells_out.ravel(),
                }
            )

    probes = queries.mapInPandas(
        probe_lists, schema="query_id long, qv array<double>, cell long"
    )

    def cell_candidates(qpdf, cpdf):
        import pandas as pd

        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame(
                {
                    "query_id": pd.Series(dtype="int64"),
                    "neighbor_id": pd.Series(dtype="int64"),
                    "cosine": pd.Series(dtype="float64"),
                }
            )
        Q = np.array([np.asarray(x) for x in qpdf["qv"]], dtype=np.float64)
        C = np.array([np.asarray(x) for x in cpdf["v"]], dtype=np.float64)
        nids = cpdf["cid"].to_numpy()
        # pre-sort the cell block by neighbor id so the per-row tie
        # order (cosine desc, neighbor_id asc) falls out of ONE stable
        # argsort over the whole tile — identical to the per-row
        # lexsort((nids, -cos[r])) it replaces, without the Python loop
        ordn = np.argsort(nids, kind="stable")
        nids = nids[ordn]
        cos = _cos_tile(Q, C[ordn], _norms(Q), _norms(C)[ordn])
        keep = min(k, len(nids))
        qids = qpdf["query_id"].to_numpy()
        order = np.argsort(-cos, axis=1, kind="stable")[:, :keep]
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, keep),
                "neighbor_id": nids[order].ravel(),
                "cosine": np.take_along_axis(cos, order, axis=1).ravel(),
            }
        )

    cand = (
        probes.groupby("cell")
        .cogroup(cells.groupby("cell"))
        .applyInPandas(
            cell_candidates,
            schema="query_id long, neighbor_id long, cosine double",
        )
    )
    # note: scoring parallelism is capped at the cell count by the
    # cogroup; operators/joins.salted_join remains the escape hatch if
    # a production corpus develops hot cells
    w_k = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w_k))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ann_ivf_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus IVF join between the two label-parity halves of the
    embeddings table: odd-label vectors query the even-label corpus.

    Centroids are the 16 lowest-id corpus vectors with vec_id >=
    _CENTROID_BASE (TakeOrderedAndProject — deterministic, no global
    sort, no single-partition exchange), standing in for a trained
    k-means pass with the identical plan shape.
    """
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    corpus = emb.where(F.col("label") % 2 == 0).select("vec_id", "v")
    queries = emb.where(F.col("label") % 2 == 1).select("vec_id", "v")
    # corpus-scaled cell count (constant expected cell size); at the
    # driver SFs this stays exactly IVF_NLIST so the oracle is stable
    nlist = max(IVF_NLIST, corpus.count() // IVF_JOIN_TARGET_CELL)
    cents = (
        corpus.where(F.col("vec_id") >= _CENTROID_BASE)
        .orderBy("vec_id")
        .limit(nlist)
    )
    return ivf_join(queries, corpus, cents)


def _ivf_join_oracle_sql() -> str:
    """DuckDB spelling of ann_ivf_join — same fold-order contract as
    _ivf_oracle_sql, over the parity-split corpora."""
    dot_vc = _DUCK_DOT.format(a="s.v", b="c.cv")
    cand_dot = _DUCK_DOT.format(a="p.qv", b="cl.v")
    return f"""
        WITH e AS (
            SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), corpus AS (
            SELECT vec_id, v FROM e WHERE label % 2 = 0
        ), queries AS (
            SELECT vec_id, v FROM e WHERE label % 2 = 1
        ), c AS (
            SELECT cent_id, cv FROM (
                SELECT vec_id AS cent_id, v AS cv,
                       row_number() OVER (ORDER BY vec_id) AS rn
                FROM corpus WHERE vec_id >= {_CENTROID_BASE}
            ) WHERE rn <= (SELECT GREATEST({IVF_NLIST},
                                           COUNT(*) // {IVF_JOIN_TARGET_CELL})
                           FROM corpus)
        ), corp_scored AS (
            SELECT s.vec_id, s.v, c.cent_id,
                   {dot_vc} / ({_DUCK_NORM.format('s.v')} * {_DUCK_NORM.format('c.cv')})
                       AS cent_cos
            FROM corpus s CROSS JOIN c
        ), cells AS (
            SELECT vec_id AS cid, cent_id AS cell, v FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                    ORDER BY cent_cos DESC, cent_id DESC) AS rn
                FROM corp_scored
            ) WHERE rn = 1
        ), q_scored AS (
            SELECT s.vec_id, s.v, c.cent_id,
                   {dot_vc} / ({_DUCK_NORM.format('s.v')} * {_DUCK_NORM.format('c.cv')})
                       AS cent_cos
            FROM queries s CROSS JOIN c
        ), probes AS (
            SELECT vec_id AS query_id, v AS qv, cent_id AS cell FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                    ORDER BY cent_cos DESC, cent_id ASC) AS rn
                FROM q_scored
            ) WHERE rn <= {IVF_JOIN_NPROBE}
        ), cand AS (
            SELECT p.query_id, cl.cid AS neighbor_id,
                   {cand_dot} / ({_DUCK_NORM.format('p.qv')} * {_DUCK_NORM.format('cl.v')})
                       AS cosine
            FROM probes p JOIN cells cl USING (cell)
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
            FROM cand
        ) WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """


ORACLE_SQL: dict[str, str] = {
    "ann_int8": _int8_oracle_sql(),
    "ann_filtered": _filtered_oracle_sql(),
    "ann_ivf_join": _ivf_join_oracle_sql(),
    "ann_lsh": _lsh_oracle_sql(),
    "ann_ivf": _ivf_oracle_sql(),
    "embedding_corr": _duck_corr_sql(),
    "ann_topk": f"""
        WITH e AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   list_sum(list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i]))
                     / (sqrt(list_sum(list_transform(q.v, x -> x * x)))
                        * sqrt(list_sum(list_transform(c.v, x -> x * x)))) AS cosine
            FROM e q JOIN e c ON q.vec_id != c.vec_id
            WHERE q.vec_id < {N_QUERIES}
        )
        SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine DESC, neighbor_id ASC) AS rank
            FROM scored
        ) WHERE rank <= {TOP_K}
        ORDER BY query_id, rank
    """,
}

# ---- integer-exact PQ: the oracle face of ann_pq -------------------------

PQX_M = 4  # subspaces (64 dims -> 16 per subspace)
PQX_SUB_D = 16
PQX_K = 8  # centroids per subspace -> 3-bit codes
PQX_ROUNDS = 2  # fixed Lloyd rounds per subspace codebook
PQX_TRAIN = 256  # deterministic training set: vec_id < 256
PQX_QUANT = 16_384  # 2^14: q = floor(e * 2^14) is exact (|e| < 1)
PQX_CSCALE = 1_024  # 2^10: centroid fixed-point sub-scale


def ann_pq_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization with ALL arithmetic in scaled integers —
    ORACLE-BACKED (promoted r6): the quantized-Lloyd trick that pinned
    ``ml_kmeans_exact`` applied per SUBSPACE, so the codebooks, the
    corpus codes, AND the asymmetric-distance (ADC) lookup tables are
    exact integers the DuckDB oracle rebuilds bit-for-bit.  This is
    the cross-engine verification face of the float ``ann_pq``
    (which stays as the throughput face: Arrow-batched numpy ADC).

    Fixed recurrence per subspace s: seeds = the k lowest-vec_id
    sub-vectors; PQX_ROUNDS rounds of (integer argmin assignment, ties
    to the lowest code; centroid refresh floor(sum * 2^10 / n); empty
    clusters keep their centroid); corpus codes = final argmin;
    approx_dist(query, neighbor) = sum over subspaces of the exact
    integer LUT entry — one BIGINT per (query, code) pair.

    Scale posture: codebook training touches only the bounded
    PQX_TRAIN set (vec_id < 256 — bounded driver state by
    construction, the ml fit-cap precedent), so the per-subspace Lloyd
    recurrence runs in driver numpy with the IDENTICAL integer
    arithmetic the old per-round DataFrame dance computed: np.argmin's
    first-minimum tiebreak == the (d2, cluster) sort, and the floor
    refresh replays the same BIGINT->DOUBLE cast (both IEEE-754).
    Serving is ONE corpus pass: a mapInPandas that encodes each row
    against the m*k driver codebooks and sums the exact integer LUT
    entries — the classic ADC shape with the codebook shipped in the
    closure instead of three broadcast joins and an m-way explode of
    every corpus row.  Each Arrow batch pre-prunes to its local top-k
    per query under the final (approx_dist, neighbor_id) order — a
    superset of the global top-k by construction — so the ranking
    window receives O(batches * k * n_queries) rows, never
    corpus * n_queries.
    """
    import numpy as np

    emb = (
        load_table(spark, "embeddings", sf_dir)
        # the EMB_COV_DIM rule: a NULL/ragged embedding yields NULL d2,
        # which sorts NULLS FIRST in Spark's row_number window but
        # NULLS LAST in DuckDB — guard BOTH faces identically
        .where(
            F.col("embedding").isNotNull()
            & (F.size("embedding") == PQX_M * PQX_SUB_D)
        )
        .select(
            "vec_id",
            F.expr(
                f"transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE)"
                f" * {PQX_QUANT}) AS BIGINT))"
            ).alias("q"),
        )
    )

    train_rows = sorted(
        emb.where(F.col("vec_id") < PQX_TRAIN).collect(),
        key=lambda r: r["vec_id"],
    )
    T = np.array([list(r["q"]) for r in train_rows], dtype=np.int64)
    q_ids = [r["vec_id"] for r in train_rows if r["vec_id"] < N_QUERIES]
    QV = T[: len(q_ids)]  # query sub-vectors (ids sorted first)

    def _sub(M: np.ndarray, s: int) -> np.ndarray:
        return M[:, s * PQX_SUB_D : (s + 1) * PQX_SUB_D]

    def _codes(V: np.ndarray, C: np.ndarray) -> np.ndarray:
        # d2 to every centroid; ties -> lowest cluster (argmin = first)
        d2 = np.einsum("ij,ij->i", V, V)[:, None] + np.einsum(
            "ij,ij->i", C, C
        )[None, :] - 2 * (V @ C.T)
        return d2.argmin(axis=1)

    codebooks = []
    for s in range(PQX_M):
        V = _sub(T, s)
        C = V[:PQX_K] * PQX_CSCALE  # seeds: k lowest train vec_ids
        for _ in range(PQX_ROUNDS):
            assign = _codes(V * PQX_CSCALE, C)
            Cn = C.copy()
            for c in range(len(C)):
                m = assign == c
                n = int(m.sum())
                if n:
                    # identical to SQL floor(CAST(sm*cscale AS DOUBLE)/n)
                    Cn[c] = np.floor(
                        (V[m].sum(axis=0) * PQX_CSCALE).astype(np.float64)
                        / n
                    ).astype(np.int64)
            C = Cn
        codebooks.append(C)

    # exact integer ADC lookup table, driver-side: (s, query, code)
    lut = np.stack(
        [
            np.array(
                [
                    [
                        int(((vq * PQX_CSCALE - c) ** 2).sum())
                        for c in codebooks[s]
                    ]
                    for vq in _sub(QV, s)
                ],
                dtype=np.int64,
            )
            for s in range(PQX_M)
        ]
    )
    qid_arr = np.array(q_ids, dtype=np.int64)
    nq = len(q_ids)

    def score_batches(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf) or not nq:
                continue
            Q = np.array([np.asarray(v) for v in pdf["q"]], dtype=np.int64)
            ids = pdf["vec_id"].to_numpy()
            dist = np.zeros((len(Q), nq), dtype=np.int64)
            for s in range(PQX_M):
                code = _codes(_sub(Q, s) * PQX_CSCALE, codebooks[s])
                dist += lut[s][:, code].T  # (rows, nq)
            keep = min(TOP_K, len(Q))
            out_q, out_n, out_d = [], [], []
            for qi in range(nq):
                order = np.lexsort((ids, dist[:, qi]))[:keep]
                out_q.append(np.full(keep, qid_arr[qi]))
                out_n.append(ids[order])
                out_d.append(dist[order, qi])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "approx_dist": np.concatenate(out_d),
                }
            )

    scored = emb.where(F.col("vec_id") >= N_QUERIES).mapInPandas(
        score_batches,
        schema="query_id long, neighbor_id long, approx_dist long",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "approx_dist", "rank")
        .orderBy("query_id", "rank")
    )


def _ann_pq_exact_oracle_sql(
    m: int = PQX_M,
    sub_d: int = PQX_SUB_D,
    k: int = PQX_K,
    rounds: int = PQX_ROUNDS,
    train: int = PQX_TRAIN,
    quant: int = PQX_QUANT,
    cscale: int = PQX_CSCALE,
    n_queries: int = N_QUERIES,
    top_k: int = TOP_K,
) -> str:
    """Unrolled per-subspace Lloyd rounds as chained MATERIALIZED CTEs
    (the ml_kmeans_exact oracle pattern with (s, cluster) keys)."""
    d2 = (
        f"CAST(list_sum(list_transform(range(1, {sub_d + 1}), i ->"
        f" (t.v[i] * {cscale} - c.c[i]) * (t.v[i] * {cscale} - c.c[i])))"
        " AS BIGINT)"
    )
    parts = [
        f"""q AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(embedding, e ->
                       CAST(floor(CAST(e AS DOUBLE) * {quant}) AS BIGINT)) AS q
            FROM embeddings
            WHERE embedding IS NOT NULL AND len(embedding) = {m * sub_d}
        ), sub AS MATERIALIZED (
            SELECT vec_id, ss.s AS s,
                   list_transform(range(1, {sub_d + 1}),
                                  i -> q[ss.s * {sub_d} + i]) AS v
            FROM q, (SELECT unnest(range(0, {m})) AS s) ss
        ), c0 AS MATERIALIZED (
            SELECT s, CAST(rn - 1 AS INT) AS cluster,
                   list_transform(v, x -> x * {cscale}) AS c
            FROM (
                SELECT s, v,
                       row_number() OVER (PARTITION BY s ORDER BY vec_id) AS rn
                FROM sub WHERE vec_id < {train}
            ) WHERE rn <= {k}
        )"""
    ]
    for r in range(rounds + 1):
        pts = (
            f"SELECT * FROM sub WHERE vec_id < {train}"
            if r < rounds
            else f"SELECT * FROM sub WHERE vec_id >= {n_queries}"
        )
        parts.append(
            f"""a{r} AS MATERIALIZED (
                SELECT vec_id, s, v, cluster, d2 FROM (
                    SELECT vec_id, s, v, cluster, d2,
                           row_number() OVER (PARTITION BY vec_id, s
                                              ORDER BY d2, cluster) AS rn
                    FROM (
                        SELECT t.vec_id, t.s, t.v AS v, c.cluster AS cluster,
                               {d2} AS d2
                        FROM ({pts}) t JOIN c{r} c ON t.s = c.s
                    )
                ) WHERE rn = 1
            )"""
        )
        if r == rounds:
            break
        parts.append(
            f"""u{r} AS MATERIALIZED (
                SELECT s, cluster, i, SUM(v[i]) AS sm, COUNT(*) AS n
                FROM a{r}, range(1, {sub_d + 1}) t(i)
                GROUP BY s, cluster, i
            ), c{r + 1} AS MATERIALIZED (
                SELECT c.s, c.cluster,
                       CASE WHEN u.cu IS NULL THEN c.c ELSE u.cu END AS c
                FROM c{r} c LEFT JOIN (
                    SELECT s, cluster,
                           list(CAST(floor(CAST(sm * {cscale} AS DOUBLE) / n)
                                     AS BIGINT) ORDER BY i) AS cu
                    FROM u{r} GROUP BY s, cluster
                ) u USING (s, cluster)
            )"""
        )
    return (
        "WITH " + ",\n".join(parts) + f""",
        lut AS MATERIALIZED (
            SELECT t.vec_id AS query_id, t.s, c.cluster AS code, {d2} AS d2
            FROM (SELECT * FROM sub WHERE vec_id < {n_queries}) t
            JOIN c{rounds} c ON t.s = c.s
        ), scored AS (
            SELECT l.query_id, a.vec_id AS neighbor_id,
                   CAST(SUM(l.d2) AS BIGINT) AS approx_dist
            FROM a{rounds} a
            JOIN lut l ON l.s = a.s AND l.code = a.cluster
            GROUP BY l.query_id, a.vec_id
        )
        SELECT query_id, neighbor_id, approx_dist, CAST(rank AS INT) AS rank
        FROM (
            SELECT query_id, neighbor_id, approx_dist,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY approx_dist, neighbor_id)
                       AS rank
            FROM scored
        ) WHERE rank <= {top_k}
        ORDER BY query_id, rank
    """
    )


QUERIES = {
    "ann_topk": ann_topk,
    "ann_lsh": ann_lsh,
    "ann_ivf": ann_ivf,
    "ann_int8": ann_int8,
    "ann_filtered": ann_filtered,
    "ann_ivf_join": ann_ivf_join,
    "ann_pq": ann_pq,
    "ann_pq_exact": ann_pq_exact,
    "embedding_corr": embedding_corr,
}


# ---------------------------------------------------------------------------
# Simplified (centroid-based) silhouette score — the standard
# clustering-quality diagnostic at scale: a(i) = distance to own
# label's centroid, b(i) = distance to the nearest other centroid,
# s(i) = (b - a) / max(a, b).  Exact all-pairs silhouette is O(n^2);
# the centroid form is the accepted large-n variant (it is what
# Spark MLlib's ClusteringEvaluator computes).
#
# Cross-engine determinism recipe (same as embedding_corr/ann_topk):
# quantize dims to integer micro-units, centroid = exact BIGINT sums
# with ONE double division, distances via the fixed-order list fold
# both engines share, and the per-label mean taken over floor(s*1e9)
# BIGINTs so row order cannot perturb the hash.
#
# 100 TB: one explode-aggregate for centroids (k*d rows), a broadcast
# fan-out of k centroid rows, one label shuffle for the final means —
# no point-to-point pairs anywhere.
# ---------------------------------------------------------------------------


def silhouette_score(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid-silhouette summary over a labeled vector
    frame: (label, n_points, mean_silhouette, n_negative) — negative
    silhouettes mark points closer to a foreign centroid than their
    own (likely mislabeled / boundary points)."""
    pts = df.select(
        F.col(id_col).alias("pid"),
        F.col(label_col).alias("lbl"),
        F.expr(
            f"transform({vec_col},"
            " v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("xq"),
    )
    expl = pts.select("lbl", F.posexplode("xq").alias("pos", "x"))
    sums = expl.groupBy("lbl", "pos").agg(F.sum("x").alias("s"))
    counts = pts.groupBy("lbl").agg(F.count(F.lit(1)).alias("n"))
    cents = (
        sums.groupBy("lbl")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, s))), t -> t.s)"
            ).alias("svec")
        )
        .join(counts, "lbl")
        .select(
            F.col("lbl").alias("clbl"),
            F.expr("transform(svec, s -> CAST(s AS DOUBLE) / n)").alias(
                "cent"
            ),
        )
    )
    fan = pts.crossJoin(F.broadcast(cents))
    d2 = fan.select(
        "pid",
        "lbl",
        "clbl",
        F.expr(
            "aggregate(zip_with(xq, cent,"
            " (x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)),"
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        ).alias("d2"),
    )
    per_point = d2.groupBy("pid", "lbl").agg(
        F.max(F.when(F.col("clbl") == F.col("lbl"), F.col("d2"))).alias("a2"),
        F.min(F.when(F.col("clbl") != F.col("lbl"), F.col("d2"))).alias("b2"),
    )
    scored = per_point.select(
        "lbl",
        F.expr(
            "CAST(floor(CASE WHEN greatest(sqrt(a2), sqrt(b2)) = 0 THEN 0"
            " ELSE (sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2)) END"
            " * 1000000000) AS BIGINT)"
        ).alias("s_ppb"),
    )
    return (
        scored.groupBy("lbl")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("s_ppb").alias("s_sum"),
            F.sum(F.when(F.col("s_ppb") < 0, 1).otherwise(0)).alias(
                "n_negative"
            ),
        )
        .select(
            F.col("lbl").alias("label"),
            F.col("n_points").cast("long"),
            (
                F.col("s_sum").cast("double")
                / F.col("n_points")
                / F.lit(1000000000.0)
            ).alias("mean_silhouette"),
            F.col("n_negative").cast("long"),
        )
        .orderBy("label")
    )


def embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: how well separated the embedding labels are."""
    return silhouette_score(load_table(spark, "embeddings", sf_dir))


def _silhouette_oracle_sql() -> str:
    return """
        WITH pts AS (
            SELECT vec_id AS pid, label AS lbl,
                   list_transform(embedding,
                       v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS xq
            FROM embeddings
        ), ex AS (
            SELECT lbl, t.pos, xq[t.pos] AS x
            FROM pts, UNNEST(range(1, len(xq) + 1)) AS t(pos)
        ), sums AS (
            SELECT lbl, pos, CAST(SUM(x) AS BIGINT) AS s
            FROM ex GROUP BY lbl, pos
        ), counts AS (
            SELECT lbl, COUNT(*) AS n FROM pts GROUP BY lbl
        ), cents AS (
            SELECT s.lbl AS clbl,
                   list_transform(list(s.s ORDER BY s.pos),
                                  v -> CAST(v AS DOUBLE) / c.n) AS cent
            FROM sums s JOIN counts c ON s.lbl = c.lbl
            GROUP BY s.lbl, c.n
        ), d2 AS (
            SELECT p.pid, p.lbl, c.clbl,
                   list_sum(list_transform(range(1, len(p.xq) + 1),
                       i -> (CAST(p.xq[i] AS DOUBLE) - c.cent[i])
                            * (CAST(p.xq[i] AS DOUBLE) - c.cent[i]))) AS d2
            FROM pts p CROSS JOIN cents c
        ), per_point AS (
            SELECT pid, lbl,
                   MAX(CASE WHEN clbl = lbl THEN d2 END) AS a2,
                   MIN(CASE WHEN clbl != lbl THEN d2 END) AS b2
            FROM d2 GROUP BY pid, lbl
        ), scored AS (
            SELECT lbl,
                   CAST(floor(CASE WHEN greatest(sqrt(a2), sqrt(b2)) = 0 THEN 0
                        ELSE (sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2)) END
                        * 1000000000) AS BIGINT) AS s_ppb
            FROM per_point
        )
        SELECT lbl AS label,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(s_ppb) AS DOUBLE) / COUNT(*) / 1000000000.0
                   AS mean_silhouette,
               CAST(SUM(CASE WHEN s_ppb < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_negative
        FROM scored GROUP BY lbl ORDER BY label
    """


QUERIES["embedding_silhouette"] = embedding_silhouette
ORACLE_SQL["embedding_silhouette"] = _silhouette_oracle_sql()


MMR_CANDIDATES = 8 * TOP_K  # bounded per-query candidate pool
MMR_DIV_THRESHOLD = 0.98  # drop a candidate this similar to a kept result


def diversified_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    candidates: int = MMR_CANDIDATES,
    div_threshold: float = MMR_DIV_THRESHOLD,
) -> DataFrame:
    """DIVERSIFIED cosine top-k (the distributed diversified-top-k
    search problem, e.g. EDBT'20's best-region variant; greedy MMR-style
    selection): for each query, the top-k results such that no kept
    result is more than ``div_threshold``-similar to an earlier kept
    one — near-duplicate corpora make plain top-k return k copies of
    the same document; diversified top-k returns k *different* answers.

    Two stages, both bounded: (1) the DISTRIBUTED part scores the
    corpus per query (bounded query block rides the mapInPandas
    closure — the same state the old plan broadcast) and keeps a
    candidate pool of ``candidates`` rows per query via window top-M
    — data-sized work ends here; (2) the greedy diversification scan,
    inherently sequential in rank order, runs per query inside one
    applyInPandas over the PER-QUERY candidate pool (O(M*k) dot
    products on <= M rows — bounded state, never the corpus).

    Implementation (r8): each Arrow batch computes one cosine tile
    whose values reproduce the old per-pair SQL left fold bit-for-bit
    (dimension-at-a-time accumulation + the same norm-multiply-divide
    order — the ann_topk recipe), pre-pruned to the per-batch top-M
    per query under the final (cosine desc, neighbor_id) order — a
    superset of the global top-M pool, so the window reads
    O(batches * M) rows per query instead of the whole corpus, and no
    interpreted HOF runs per pair.
    """
    import numpy as np
    import pandas as pd

    q_rows = sorted(
        queries.select("vec_id", "v").collect(), key=lambda r: r["vec_id"]
    )
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    QV = np.array([list(r["v"]) for r in q_rows], dtype=np.float64)
    nq = len(qids)

    def _norms(M):
        acc = np.zeros(len(M))
        for i in range(M.shape[1]):
            acc += M[:, i] * M[:, i]
        return np.sqrt(acc)

    qnorm = _norms(QV) if nq else np.zeros(0)
    m_keep = candidates

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf) or not nq:
                continue
            C = np.array([np.asarray(x) for x in pdf["v"]], dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            vs = pdf["v"].to_numpy()
            tile = np.zeros((nq, len(C)))
            for i in range(C.shape[1]):
                tile += np.outer(QV[:, i], C[:, i])
            cos = tile / (qnorm[:, None] * _norms(C)[None, :])
            frames = []
            for r in range(nq):
                mask = ids != qids[r]
                cand_n, cand_c = ids[mask], cos[r, mask]
                order = np.lexsort((cand_n, -cand_c))[
                    : min(m_keep, len(cand_n))
                ]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(order), qids[r]),
                            "neighbor_id": cand_n[order],
                            "cosine": cand_c[order],
                            "nv": [list(v) for v in vs[mask][order]],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = emb.select("vec_id", "v").mapInPandas(
        score_batches,
        schema="query_id long, neighbor_id long, cosine double,"
        " nv array<double>",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    pool = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= candidates)
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("rank")
        kept_rows = []
        kept_vecs: "list[np.ndarray]" = []
        for row in pdf.itertuples():
            v = np.asarray(row.nv, dtype=np.float64)
            v = v / np.linalg.norm(v)
            if any(float(v @ kv) > div_threshold for kv in kept_vecs):
                continue
            kept_vecs.append(v)
            kept_rows.append(
                (row.query_id, len(kept_rows) + 1, row.neighbor_id, round(row.cosine, 6))
            )
            if len(kept_rows) >= k:
                break
        return pd.DataFrame(
            kept_rows, columns=["query_id", "div_rank", "neighbor_id", "cosine"]
        )

    return pool.groupBy("query_id").applyInPandas(
        greedy, schema="query_id long, div_rank int, neighbor_id long, cosine double"
    )


def ann_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: diversified top-k over the embeddings corpus
    (rows-only: the greedy scan is order-sequential, not
    SQL-expressible; a numpy replay pins exactness in pytest)."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return diversified_topk(emb, queries).orderBy("query_id", "div_rank")


QUERIES["ann_diversified"] = ann_diversified


# ---- exact diversified top-k: the oracle face of ann_diversified -------

# Tighter threshold than the float face's 0.98: testdata cosines top out
# ~0.6, so at 0.98 the greedy never drops anything and the oracle would
# only re-prove plain top-k.  At 0.25 the drop branch fires on ~1/4 of
# the picks (measured at sf0.01), so the RECURRENCE itself is pinned.
MMRX_THR = 0.25


def ann_diversified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-k with every float produced in the fixed
    operation order both engines share — ORACLE-BACKED (r7): the
    greedy rank-order scan (keep a candidate iff fewer than k kept and
    its max cosine to every kept result <= MMRX_THR) is replayed by a
    DuckDB RECURSIVE CTE carrying the kept-id list, the first
    sequential-control-flow operator pinned that way (the iterative
    siblings — ml_kmeans_exact, ann_pq_exact, dedup_semantic_exact —
    unroll fixed rounds; this one recurses data-dependently per rank).

    Float discipline: vectors are normalized ONCE (u = v / sqrt(fold
    v*v), the repo's sequential-fold idiom proven bit-equal to DuckDB's
    list_reduce), pool cosines and candidate-vs-kept similarities are
    sequential folds of u products, and the greedy's Python loop
    replays the identical left-to-right accumulation — so the kept set
    is decided on bit-identical doubles, never a normalizer's mercy.

    Scale posture: same as diversified_topk — bounded query block in
    the mapInPandas closure, map-only scoring, per-query top-M window
    pool (M = MMR_CANDIDATES bounded), then the inherently sequential
    greedy runs on <= M rows per query inside applyInPandas.

    Implementation (r8): each Arrow batch normalizes its block with
    the same left-fold sum of squares + per-element IEEE divide the
    old SQL ``transform`` computed, then scores one cosine tile
    accumulated dimension-at-a-time — the exact op sequence of the
    ``aggregate(zip_with(qu, u, ...))`` fold, so every double matches
    the DuckDB RECURSIVE oracle bit-for-bit.  Per-batch top-M pruning
    keeps the window input at O(batches * M) rows per query.

    No reference counterpart (sk-dist has no retrieval; net-new).
    """
    import numpy as np
    import pandas as pd

    emb = (
        load_table(spark, "embeddings", sf_dir)
        .where(F.col("embedding").isNotNull() & (F.size("embedding") == 64))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )

    def _norms(M: "np.ndarray") -> "np.ndarray":
        # left-fold sum of squares, one dimension at a time — the same
        # op order as aggregate(transform(v, x -> x*x), 0D, +)
        acc = np.zeros(len(M))
        for i in range(M.shape[1]):
            acc += M[:, i] * M[:, i]
        return np.sqrt(acc)

    q_rows = sorted(
        emb.where(F.col("vec_id") < N_QUERIES).collect(),
        key=lambda r: r["vec_id"],
    )
    qids = np.array([r["vec_id"] for r in q_rows], dtype=np.int64)
    QV = np.array([list(r["v"]) for r in q_rows], dtype=np.float64)
    nq = len(qids)
    QU = QV / _norms(QV)[:, None] if nq else QV
    m_keep = MMR_CANDIDATES

    def score_batches(batches):
        for pdf in batches:
            if not len(pdf) or not nq:
                continue
            V = np.array([np.asarray(x) for x in pdf["v"]], dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            U = V / _norms(V)[:, None]
            tile = np.zeros((nq, len(U)))
            for i in range(U.shape[1]):
                tile += np.outer(QU[:, i], U[:, i])
            frames = []
            for r in range(nq):
                mask = ids != qids[r]
                cand_n, cand_c = ids[mask], tile[r, mask]
                order = np.lexsort((cand_n, -cand_c))[
                    : min(m_keep, len(cand_n))
                ]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(order), qids[r]),
                            "neighbor_id": cand_n[order],
                            "cosine": cand_c[order],
                            "nu": [list(u) for u in U[mask][order]],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = emb.mapInPandas(
        score_batches,
        schema="query_id long, neighbor_id long, cosine double,"
        " nu array<double>",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    pool = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= MMR_CANDIDATES)
        .withColumn("cos6", F.round("cosine", 6))
    )

    k, thr = TOP_K, MMRX_THR

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("r")
        kept_u: "list[list[float]]" = []
        rows = []
        for row in pdf.itertuples():
            if len(rows) >= k:
                break
            cu = list(row.nu)
            m = None
            for ku in kept_u:
                acc = 0.0
                for x, y in zip(cu, ku):  # left-to-right: list_reduce order
                    acc += x * y
                m = acc if m is None or acc > m else m
            if m is not None and m > thr:
                continue
            kept_u.append(cu)
            rows.append(
                (int(row.query_id), len(rows) + 1, int(row.neighbor_id),
                 float(row.cos6))
            )
        return pd.DataFrame(
            rows, columns=["query_id", "div_rank", "neighbor_id", "cosine"]
        )

    return (
        pool.groupBy("query_id")
        .applyInPandas(
            greedy,
            schema="query_id long, div_rank int, neighbor_id long,"
            " cosine double",
        )
        .orderBy("query_id", "div_rank")
    )


def _ann_diversified_exact_oracle_sql(
    k: int = TOP_K,
    m: int = MMR_CANDIDATES,
    n_queries: int = N_QUERIES,
    thr: float = MMRX_THR,
) -> str:
    dot = _DUCK_DOT.format(a="q.u", b="c.u")
    kdot = _DUCK_DOT.format(a="cu.u", b="ku.u")
    return f"""
    WITH RECURSIVE nv AS MATERIALIZED (
        SELECT vec_id, list_transform(v, x -> x / nrm) AS u
        FROM (
            SELECT vec_id, v, {_DUCK_NORM.format("v")} AS nrm
            FROM (
                SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings
                WHERE embedding IS NOT NULL AND len(embedding) = 64
            )
        )
    ), pool AS MATERIALIZED (
        SELECT query_id, neighbor_id, cosine, r, ROUND(cosine, 6) AS cos6
        FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {dot} AS cosine,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY {dot} DESC, c.vec_id ASC) AS r
            FROM nv q JOIN nv c ON q.vec_id != c.vec_id
            WHERE q.vec_id < {n_queries}
        ) WHERE r <= {m}
    ), rec AS (
        SELECT query_id, CAST(0 AS BIGINT) AS r,
               CAST([] AS BIGINT[]) AS kept, 0 AS n_kept,
               CAST(NULL AS BIGINT) AS pick, CAST(NULL AS DOUBLE) AS pick_cos
        FROM (SELECT DISTINCT query_id FROM pool)
      UNION ALL
        SELECT query_id, r,
               CASE WHEN ok THEN list_append(kept, neighbor_id) ELSE kept END,
               CASE WHEN ok THEN n_kept + 1 ELSE n_kept END,
               CASE WHEN ok THEN neighbor_id END,
               CASE WHEN ok THEN cos6 END
        FROM (
            SELECT rec.query_id, p.r, rec.kept, rec.n_kept,
                   p.neighbor_id, p.cos6,
                   (rec.n_kept < {k}
                    AND (ms.mx IS NULL OR ms.mx <= {thr})) AS ok
            FROM rec
            JOIN pool p ON p.query_id = rec.query_id AND p.r = rec.r + 1
            LEFT JOIN LATERAL (
                SELECT MAX({kdot}) AS mx
                FROM unnest(rec.kept) AS t(kid)
                JOIN nv ku ON ku.vec_id = t.kid
                JOIN nv cu ON cu.vec_id = p.neighbor_id
            ) ms ON true
        )
    )
    SELECT query_id, CAST(n_kept AS INT) AS div_rank,
           pick AS neighbor_id, pick_cos AS cosine
    FROM rec WHERE pick IS NOT NULL
    ORDER BY query_id, div_rank
    """


QUERIES["ann_diversified_exact"] = ann_diversified_exact
ORACLE_SQL["ann_diversified_exact"] = _ann_diversified_exact_oracle_sql()


# ---- ANN recall evaluation --------------------------------------------


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF index against exact brute-force truth — the
    eval every approximate index must ship with (the ANN counterpart of
    ``dedup_minhash_eval``'s precision/recall vs exact all-pairs).

    Both faces are the audited operators themselves (``ann_ivf``,
    ``ann_topk``), so this measures the REAL index, not a model of it;
    recall is a count ratio (one exact integer over the constant k),
    never a float comparison of cosines.  Offline-eval posture: the
    corpus scan runs once per face; at 100 TB the exact face is the
    documented bounded-query-set baseline (broadcast queries, one
    map-side pass), so the eval stays linear in the corpus.
    """
    ivf = ann_ivf(spark, sf_dir).select("query_id", "neighbor_id")
    exact = ann_topk(spark, sf_dir).select("query_id", "neighbor_id")
    matched = (
        exact.join(ivf, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    all_q = exact.select("query_id").distinct()
    return (
        all_q.join(matched, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / TOP_K
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


def _recall_eval_oracle_sql() -> str:
    return f"""
        WITH ivf AS ({_ivf_oracle_sql()}),
        ex AS ({ORACLE_SQL["ann_topk"]}),
        hits AS (
            SELECT e.query_id,
                   CAST(COUNT(i.neighbor_id) AS BIGINT) AS n_hits
            FROM ex e LEFT JOIN ivf i
              ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
            GROUP BY e.query_id
        )
        SELECT query_id, n_hits,
               CAST(n_hits AS DOUBLE) / {TOP_K} AS recall_at_k
        FROM hits ORDER BY query_id
    """


QUERIES["ann_recall_eval"] = ann_recall_eval
ORACLE_SQL["ann_recall_eval"] = _recall_eval_oracle_sql()
ORACLE_SQL["ann_pq_exact"] = _ann_pq_exact_oracle_sql()


PROBE_SWEEP = (1, 2, 4, 8)


def ann_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF tuning table: mean recall@k against exact truth for each
    probe budget — the recall/cost curve that picks nprobe before an
    index ships (candidate work scales ~linearly with nprobe, so this
    IS the latency-recall tradeoff readout).  Mean recall is the exact
    integer  sum(hits) * 1e6  DIV  (k * n_queries)  in ppm.

    Each sweep point reuses the audited ``ann_ivf`` face; the exact
    truth comes from ``ann_topk`` once.  Offline-eval posture, same as
    ``ann_recall_eval``.
    """
    # EAGER checkpoints: `exact` joins every sweep point (plus the nq
    # count) and each reference re-derived the full exact scoring pass;
    # the IVF index (centroid collect + corpus cell assignment — the
    # data-sized, nprobe-independent stage) is built ONCE and shared by
    # all probe budgets instead of rebuilt per point (snapshot: 12
    # FileScans before, the per-point serving joins after).  Values
    # are unchanged: the cells frame content is identical per point.
    exact = (
        ann_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    nq = exact.select("query_id").distinct().count()
    C_ids, CV, cells = _ann_ivf_index(_emb(spark, sf_dir))
    index = (C_ids, CV, cells.localCheckpoint(eager=True))
    parts = []
    for np_ in PROBE_SWEEP:
        ivf = ann_ivf(spark, sf_dir, nprobe=np_, _index=index).select(
            "query_id", "neighbor_id"
        )
        hits = exact.join(ivf, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).alias("hits")
        )
        parts.append(hits.select(F.lit(np_).cast("int").alias("nprobe"), "hits"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "nprobe",
        "hits",
        F.expr(f"CAST(hits * 1000000 DIV {TOP_K * nq} AS BIGINT)").alias(
            "mean_recall_ppm"
        ),
    ).orderBy("nprobe")


def _probe_sweep_oracle_sql() -> str:
    pieces = []
    for np_ in PROBE_SWEEP:
        pieces.append(
            f"""
        SELECT CAST({np_} AS INTEGER) AS nprobe,
               CAST(COUNT(*) AS BIGINT) AS hits
        FROM ({ORACLE_SQL["ann_topk"]}) e
        JOIN ({_ivf_oracle_sql(nprobe=np_)}) i
          ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
        """
        )
        # hits are counted over the same (query, neighbor) identity join
    union = " UNION ALL ".join(pieces)
    return f"""
        WITH nq AS (
            SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
            FROM embeddings WHERE vec_id < {N_QUERIES}
        )
        SELECT nprobe, hits,
               CAST(hits * 1000000 // ({TOP_K} * n) AS BIGINT) AS mean_recall_ppm
        FROM ({union}) CROSS JOIN nq
        ORDER BY nprobe
    """


QUERIES["ann_probe_sweep"] = ann_probe_sweep
ORACLE_SQL["ann_probe_sweep"] = _probe_sweep_oracle_sql()


# ---- LSH bucket vs label NMI ------------------------------------------------


def lsh_label_nmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized mutual information between the sign-LSH bucket and
    the class label: does the hash geometry already separate the
    classes (high NMI = LSH buckets are nearly class-pure, so
    bucket-local operations approximately stratify by class; near 0 =
    the planes are class-blind).

    All probabilities are exact integer count ratios; every entropy /
    MI sum is a left fold over an explicitly sorted cell list (the
    repo's sequential-fold float contract), so the scalar replays
    bit-identically on DuckDB.
    """
    emb = _emb(spark, sf_dir)
    lbl = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("label").cast("int").alias("lbl")
    )
    import hashlib

    dims = 64
    bit_exprs = []
    for b in range(LSH_BITS):
        signs = ", ".join(
            "1D"
            if hashlib.md5(f"{b}:{i}".encode()).hexdigest()[0] in "89abcdef"
            else "-1D"
            for i in range(dims)
        )
        proj = (
            f"aggregate(zip_with(v, array({signs}),"
            f" (x, s) -> x * s), 0D, (acc, x) -> acc + x)"
        )
        bit_exprs.append(f"(CASE WHEN {proj} > 0 THEN {2**b} ELSE 0 END)")
    sig = " + ".join(bit_exprs)
    # EAGER checkpoint: cells (bounded by buckets x labels) feeds nb,
    # nl and the joined fold — without it each reference re-ran the
    # 16-plane sign-projection HOFs over the corpus (snapshot: 10
    # FileScans).
    cells = (
        emb.join(lbl, "vec_id")
        .withColumn("bucket", F.expr(sig).cast("int"))
        .groupBy("bucket", "lbl")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    nb = cells.groupBy("bucket").agg(F.sum("n").alias("n_b"))
    nl = cells.groupBy("lbl").agg(F.sum("n").alias("n_l"))
    joined = cells.join(nb, "bucket").join(nl, "lbl")
    folded = joined.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.expr(
            "sort_array(collect_list(struct(bucket, lbl, n, n_b, n_l)))"
        ).alias("cells"),
    )
    margins = (
        nb.select(F.col("bucket").alias("k"), F.col("n_b").alias("m"))
        .unionAll(
            nl.select(
                (F.col("lbl") + 1_000_000).alias("k"), F.col("n_l").alias("m")
            )
        )
        .agg(
            F.expr(
                "sort_array(collect_list(struct(k, m)))"
            ).alias("ms")
        )
    )
    both = folded.crossJoin(F.broadcast(margins))
    mi = (
        "aggregate(cells, 0D, (acc, c) -> acc"
        " + (CAST(c.n AS DOUBLE) / n_total)"
        " * ln(CAST(c.n AS DOUBLE) * n_total"
        "      / (CAST(c.n_b AS DOUBLE) * CAST(c.n_l AS DOUBLE))))"
    )
    hb = (
        "aggregate(filter(ms, x -> x.k < 1000000), 0D, (acc, x) -> acc"
        " - (CAST(x.m AS DOUBLE) / n_total) * ln(CAST(x.m AS DOUBLE) / n_total))"
    )
    hl = (
        "aggregate(filter(ms, x -> x.k >= 1000000), 0D, (acc, x) -> acc"
        " - (CAST(x.m AS DOUBLE) / n_total) * ln(CAST(x.m AS DOUBLE) / n_total))"
    )
    return both.select(
        "n_total",
        F.expr("size(cells)").cast("long").alias("n_cells"),
        F.expr(f"ROUND({mi}, 6)").alias("mi_nats"),
        F.expr(f"ROUND({hb}, 6)").alias("h_bucket"),
        F.expr(f"ROUND({hl}, 6)").alias("h_label"),
        F.expr(f"ROUND({mi} / sqrt({hb} * {hl}), 6)").alias("nmi"),
    )


def _nmi_oracle_sql() -> str:
    import hashlib

    dims = 64
    bit_sqls = []
    for b in range(LSH_BITS):
        acc = "0"
        for i in range(dims):
            sign = (
                "1.0"
                if hashlib.md5(f"{b}:{i}".encode()).hexdigest()[0] in "89abcdef"
                else "-1.0"
            )
            acc = f"({acc} + v[{i + 1}] * {sign})"
        bit_sqls.append(f"(CASE WHEN {acc} > 0 THEN {2**b} ELSE 0 END)")
    sig = " + ".join(bit_sqls)
    fold = "list_reduce(list_prepend(0.0, {xs}), (acc, t) -> acc + t)"
    mi_terms = (
        "list_transform(cells, c -> (CAST(c.n AS DOUBLE) / n_total)"
        " * ln(CAST(c.n AS DOUBLE) * n_total"
        " / (CAST(c.n_b AS DOUBLE) * CAST(c.n_l AS DOUBLE))))"
    )
    hb_terms = (
        "list_transform(list_filter(ms, x -> x.k < 1000000), x ->"
        " -(CAST(x.m AS DOUBLE) / n_total) * ln(CAST(x.m AS DOUBLE) / n_total))"
    )
    hl_terms = (
        "list_transform(list_filter(ms, x -> x.k >= 1000000), x ->"
        " -(CAST(x.m AS DOUBLE) / n_total) * ln(CAST(x.m AS DOUBLE) / n_total))"
    )
    mi, hb, hl = fold.format(xs=mi_terms), fold.format(xs=hb_terms), fold.format(xs=hl_terms)
    return f"""
        WITH e AS (
            SELECT vec_id, label AS lbl,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ), bk AS (
            SELECT CAST({sig} AS INTEGER) AS bucket, lbl FROM e
        ), cells0 AS (
            SELECT bucket, lbl, CAST(COUNT(*) AS BIGINT) AS n
            FROM bk GROUP BY bucket, lbl
        ), nb AS (
            SELECT bucket, CAST(SUM(n) AS BIGINT) AS n_b FROM cells0 GROUP BY bucket
        ), nl AS (
            SELECT lbl, CAST(SUM(n) AS BIGINT) AS n_l FROM cells0 GROUP BY lbl
        ), folded AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_total,
                   list(struct_pack(bucket := c.bucket, lbl := c.lbl, n := c.n,
                                    n_b := nb.n_b, n_l := nl.n_l)
                        ORDER BY c.bucket, c.lbl) AS cells
            FROM cells0 c JOIN nb USING (bucket) JOIN nl USING (lbl)
        ), ms_t AS (
            SELECT list(struct_pack(k := k, m := m) ORDER BY k) AS ms FROM (
                SELECT bucket AS k, n_b AS m FROM nb
                UNION ALL
                SELECT lbl + 1000000 AS k, n_l AS m FROM nl
            )
        )
        SELECT n_total,
               CAST(len(cells) AS BIGINT) AS n_cells,
               ROUND({mi}, 6) AS mi_nats,
               ROUND({hb}, 6) AS h_bucket,
               ROUND({hl}, 6) AS h_label,
               ROUND({mi} / sqrt({hb} * {hl}), 6) AS nmi
        FROM folded CROSS JOIN ms_t
    """


QUERIES["lsh_label_nmi"] = lsh_label_nmi
ORACLE_SQL["lsh_label_nmi"] = _nmi_oracle_sql()
