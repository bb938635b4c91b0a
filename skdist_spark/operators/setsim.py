"""All-pairs set-similarity join with prefix filtering (PPJoin-style,
Chaudhuri et al. ICDE'06 / Xiao et al. WWW'08).

The MinHash/LSH dedup family (operators/dedup.py) finds near-dup
CANDIDATES probabilistically; this operator is the EXACT all-pairs
join: every document pair whose shingle-set Jaccard >= t, no false
negatives, no sketch error.  The trick that makes exact all-pairs
feasible at scale is the prefix filter: order every document's shingle
set by ascending global document frequency (rarest first) and keep
only the first L - ceil(t*L) + 1 shingles; any pair with Jaccard >= t
provably shares at least one PREFIX shingle, so candidate generation
is an equi-join on prefix shingles — never doc x doc — and the fan-out
concentrates on RARE shingles (the frequent ones sit past every
prefix, which is exactly what kills the hot-key blowup a naive
shingle-join suffers).

Everything is integer-exact: the threshold test is
T_DEN * |A∩B| >= T_NUM * |A∪B|, prefix lengths use integer
ceil-division, and the reported jaccard_ppm is an integer division —
so the DuckDB brute-force oracle (which computes ALL O(N^2) pairs and
filters) must match bit-for-bit, proving the filter lossless.

Scale posture (100 TB):
- one scan -> shingle arrays (materialized once, house rule);
- document frequencies: one groupBy on shingle (map-side combined);
- prefix candidate join: equi-join on (shingle), quadratic only within
  a shingle's PREFIX occurrence list;
- verification re-reads only candidate docs' arrays (two hash joins)
  and is a pure array_intersect — no re-shingling, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .dedup import _duck_shingles, _spark_shingles, _SPARK_WORDS

# Jaccard threshold t = T_NUM / T_DEN = 0.5
T_NUM = 1
T_DEN = 2


def _setsim_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    t_num: int = T_NUM,
    t_den: int = T_DEN,
) -> tuple[DataFrame, DataFrame]:
    """The candidate-generation stages of ``setsim_join``, split out so
    the scale ledger (tools/count_setsim_candidates.py) can measure the
    pruned candidate cardinality — 3 slim bigints per row — without
    paying the array-verify join.  Returns ``(cand, ordered)``:
    ``cand`` = (da, db) pruned candidate pairs, ``ordered`` = per-doc
    df-ordered integer shingle-rank arrays for the verify stage.
    """
    from ..functions.global_rank import two_phase_row_number

    words = _SPARK_WORDS.replace("text", text_col)
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.expr(_spark_shingles(words=words)).alias("sh"),
    )
    tok = sh.select("doc", F.explode_outer("sh").alias("s"))
    dfreq = tok.groupBy("s").agg(F.count(F.lit(1)).alias("dfr"))
    # canonical order: ascending (document frequency, shingle) — rarest
    # first, total and engine-independent.  Each shingle gets a DENSE
    # INTEGER id = its rank in that order (two-phase row_number: no
    # single-partition window, vocabulary-sized input).  The rank is a
    # bijection monotone in (dfr, s), so sorting by sid, prefix
    # selection, the candidate equi-join, and array_intersect sizes
    # are all IDENTICAL to the string formulation — but every
    # downstream shuffle ships packed bigint arrays instead of ~20x
    # wider string arrays, and the verify stage intersects ints (the
    # measured verify wall at sf1 was ~6x the candidate stages, all of
    # it array bytes).
    sids = two_phase_row_number(
        dfreq,
        order_by=[F.col("dfr"), F.col("s")],
        shard_key=F.col("dfr"),
        out_col="sid",
    ).select("s", "sid")
    # lazy checkpoint: ordered is read FOUR times downstream (both
    # prefix sides + both verify sides) — materialize the shingle/
    # rank/collect subtree once instead of compiling it per reference
    # (the ml_kmeans_exact / dedup-verify precedent); also keeps the
    # two-phase rank's bounded offset window out of every downstream
    # compiled plan
    ordered = (
        tok.hint("merge").join(sids, "s")
        .groupBy("doc")
        .agg(F.sort_array(F.collect_list("sid")).alias("toks"))
        .select("doc", "toks", F.size("toks").alias("len"))
        .localCheckpoint(eager=False)
    )
    # prefix length = L - ceil(t*L) + 1 (integer ceil-division)
    plen = f"len - (len * {t_num} + {t_den} - 1) div {t_den} + 1"
    prefix = ordered.select(
        "doc",
        "len",
        F.posexplode_outer(F.expr(f"slice(toks, 1, {plen})")).alias("pos", "s"),
    )
    # merge hint: the prefix sides are EXPLODED from the corpus — the
    # estimator cannot see the fan-out, and a broadcast of a corpus-
    # sized side is the sf10 OOM class
    a, b = prefix.alias("a").hint("merge"), prefix.alias("b")
    # required overlap for the PAIR: o = ceil(t/(1+t) * (la+lb))
    o_pair = f"(({t_num} * (a.len + b.len)) + {t_num} + {t_den} - 1) div ({t_num} + {t_den})"
    cand = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc") < F.col("b.doc"))
            # length filter: J >= t forces t*max(la,lb) <= min(la,lb)
            & (F.expr(f"{t_den} * least(a.len, b.len) >= {t_num} * greatest(a.len, b.len)"))
            # positional filter (PPJoin): tokens before pos can't help,
            # so the best-case overlap from here is bounded by the
            # shorter remaining suffix (pos is 0-based -> len - pos
            # elements remain including the shared one)
            & (F.expr(f"least(a.len - a.pos, b.len - b.pos) >= {o_pair}")),
        )
        .groupBy(
            F.col("a.doc").alias("da"),
            F.col("b.doc").alias("db"),
            F.col("a.len").alias("la2"),
            F.col("b.len").alias("lb2"),
        )
        .agg(
            F.count(F.lit(1)).alias("kpf"),
            F.max("a.pos").alias("mpa"),
            F.max("b.pos").alias("mpb"),
        )
        # pair-level positional bound (PPJoin verification-side): the
        # match chain of a pair has both coordinates increasing, and
        # the per-occurrence filter above can only drop a SUFFIX of
        # that chain — so every shared shingle not counted in kpf sits
        # strictly after (mpa, mpb) in BOTH df-ordered arrays, giving
        # inter <= kpf + least(la-1-mpa, lb-1-mpb).  Pairs that cannot
        # reach the required overlap o = ceil(t/(1+t)*(la+lb)) never
        # enter the array-verify join: with a small shingle vocabulary
        # (synthetic text) the raw candidate set is ~3600x the true
        # pair set at sf1 and the verify join was the whole wall.
        .where(
            F.expr(
                f"kpf + least(la2 - 1 - mpa, lb2 - 1 - mpb) >= "
                f"((({t_num} * (la2 + lb2)) + {t_num} + {t_den} - 1)"
                f" div ({t_num} + {t_den}))"
            )
        )
        .select("da", "db")
        # the verify stage below is compute-bound (array_intersect per
        # pair), and its shuffle is tiny — AQE would coalesce it onto
        # one task; pin the session's parallelism (the catalog-floor
        # idiom, NOT a hard-coded local core count) so the CPU spreads
        .repartition(df.sparkSession.sparkContext.defaultParallelism, "da", "db")
    )
    return cand, ordered


def setsim_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    t_num: int = T_NUM,
    t_den: int = T_DEN,
) -> DataFrame:
    """Exact self-join: all pairs with shingle Jaccard >= t_num/t_den.

    Returns (doc_a, doc_b, inter, uni, jaccard_ppm) with doc_a < doc_b,
    ordered by (doc_a, doc_b).  See module docstring for the plan.
    """
    cand, ordered = _setsim_candidates(df, id_col, text_col, t_num, t_den)
    # verification: exact intersection over the full ordered token sets
    ta = ordered.select(F.col("doc").alias("da"), F.col("toks").alias("toks_a"), F.col("len").alias("la"))
    tb = ordered.select(F.col("doc").alias("db"), F.col("toks").alias("toks_b"), F.col("len").alias("lb"))
    return (
        cand.join(ta.hint("merge"), "da")
        .join(tb.hint("merge"), "db")
        .withColumn("inter", F.size(F.array_intersect("toks_a", "toks_b")))
        .withColumn("uni", F.expr("la + lb - inter"))
        .where(F.expr(f"{t_den} * inter >= {t_num} * uni"))
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "inter",
            "uni",
            F.expr("CAST(inter * 1000000 div uni AS BIGINT)").alias("jaccard_ppm"),
        )
        .orderBy("doc_a", "doc_b")
    )


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
    block_cols: tuple = (),
) -> DataFrame:
    """Exact edit-distance self-join: every pair of rows (within
    identical ``block_cols`` values) whose ``str_col`` values are
    within levenshtein distance ``max_dist`` — candidate generation by
    the PassJoin segment pigeonhole (Li/Deng/Feng, VLDB'11), never
    row x row.

    Pigeonhole: partition each string into d+1 contiguous segments; if
    lev(a, b) <= d, at most d segments of ``a`` are touched by edits,
    so at least one segment survives VERBATIM as a substring of ``b``,
    shifted by at most the d indels that precede it.  Candidate
    generation is therefore an equi-join on
    (block, source-length L, segment index i, segment text): the index
    side emits each string's d+1 exact segments; the probe side emits,
    for every candidate source length L = len + k and every position
    shift delta, the substring the pigeonhole would have to hit.  The
    (k, i, delta) probe space is pruned by indel balance — the shift
    before the preserved segment needs >= |delta| indels and the
    remaining length difference (M-L) - delta needs >= |(M-L) - delta|
    indels after it, so their sum cannot exceed d — leaving 39 probes
    per row at d=2 (constant: the work is LINEAR in rows) with join
    keys carrying full segment-text entropy.  This replaced a
    (p_type, p_size) blocking join whose in-block pair count grew
    quadratically (10x-data slope 8.1 in the r5 BENCH_SCALE).

    Verification is one thresholded ``levenshtein(a, b, d)`` (early
    exit above d) per DISTINCT candidate pair.  Lossless — no false
    negatives, by the pigeonhole argument; the brute-force DuckDB
    oracle for ``fuzzy_part_match`` pins that cross-engine at every
    SF.  Returns (id_a, id_b, edit_dist) with id_a < id_b.
    """
    d = max_dist
    n_seg = d + 1
    blocks = list(block_cols)
    base = df.where(F.col(str_col).isNotNull()).select(
        *blocks,
        F.col(id_col).alias("_id"),
        F.col(str_col).alias("_s"),
        F.length(str_col).alias("_l"),
    )

    # index side: the d+1 exact segments of each string (segment i of a
    # length-L string spans [floor((i-1)L/(d+1)), floor(iL/(d+1))))
    seg_structs = []
    for i in range(1, n_seg + 1):
        start = F.floor(F.lit(i - 1) * F.col("_l") / n_seg).cast("int")
        end = F.floor(F.lit(i) * F.col("_l") / n_seg).cast("int")
        seg_structs.append(
            F.struct(
                F.lit(i).alias("i"),
                F.col("_l").cast("int").alias("L"),
                F.col("_s").substr(start + F.lit(1), end - start).alias("seg"),
            )
        )
    index = base.select(
        *blocks,
        F.col("_id").alias("_ida"),
        F.col("_s").alias("_sa"),
        F.explode(F.array(*seg_structs)).alias("k"),
    ).select(*blocks, "_ida", "_sa", "k.i", "k.L", "k.seg")

    # probe side: explode a LITERAL (k, i, delta) combo array first so
    # the plan compiles ONE shared substring expression instead of 39
    # inline branches (codegen stays small; runtime work is identical)
    combos = [
        (k, i, delta)
        for k in range(-d, d + 1)
        for i in range(1, n_seg + 1)
        for delta in range(-d, d + 1)
        if abs(delta) + abs(-k - delta) <= d
    ]
    combo_arr = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"), F.lit(i).alias("i"), F.lit(dl).alias("dl")
            )
            for k, i, dl in combos
        ]
    )
    _L = (F.col("_l") + F.col("c.k")).cast("int")
    _start0 = F.floor((F.col("c.i") - 1) * _L / n_seg).cast("int")
    _end0 = F.floor(F.col("c.i") * _L / n_seg).cast("int")
    _p = _start0 + F.col("c.dl")
    probes = (
        base.select(
            *blocks,
            F.col("_id").alias("_idb"),
            F.col("_s").alias("_sb"),
            "_l",
            F.explode(combo_arr).alias("c"),
        )
        .where((_L >= 0) & (_p >= 0) & (_p + (_end0 - _start0) <= F.col("_l")))
        .select(
            *blocks,
            "_idb",
            "_sb",
            F.col("c.i").alias("i"),
            _L.alias("L"),
            F.col("_sb").substr(_p + F.lit(1), _end0 - _start0).alias("seg"),
        )
    )
    # per-row duplicate probes (clipped/empty segments) survive here;
    # verification runs BEFORE the pair-level dedup so the distinct()
    # shuffle carries only VERIFIED pairs (output-sized), never the
    # candidate set: a hot (block, i, L, seg) key — strings sharing a
    # long common suffix — makes candidates quadratic while the
    # thresholded levenshtein (early exit above d, O(d*len) per call)
    # kills them map-side; re-verifying a pair once per matching
    # segment combo costs a bounded constant (<= the 39-probe space),
    # the candidate-sized exchange cost O(pairs * |s|) bytes
    cand = (
        index.hint("merge").join(probes, [*blocks, "i", "L", "seg"])
        .where(F.col("_ida") < F.col("_idb"))
        .select("_ida", "_idb", "_sa", "_sb")
    )
    return (
        cand.withColumn("edit_dist", F.levenshtein("_sa", "_sb", d))
        .where(F.col("edit_dist") >= 0)
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            "edit_dist",
        )
        .distinct()
    )


def similar_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with word-3-gram-shingle Jaccard >= 0.5 over
    the documents table — the exact-recall face of dedup_minhash."""
    return setsim_join(load_table(spark, "documents", sf_dir))


def _setsim_oracle_sql() -> str:
    """Brute-force DuckDB oracle: ALL pairs, same shingles, same
    integer threshold — any pair the prefix filter dropped would
    surface here as a hash mismatch."""
    return f"""
        WITH toks AS (
            SELECT doc_id, {_duck_shingles()} AS sh
            FROM documents
        ), pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.sh, b.sh)) AS inter,
                   len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni
            FROM toks a JOIN toks b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(inter AS INTEGER) AS inter,
               CAST(uni AS INTEGER) AS uni,
               CAST(inter * 1000000 // uni AS BIGINT) AS jaccard_ppm
        FROM pairs
        WHERE {T_DEN} * inter >= {T_NUM} * uni
        ORDER BY doc_a, doc_b
    """


QUERIES = {
    "similar_doc_pairs": similar_doc_pairs,
}

ORACLE_SQL: dict[str, str] = {
    "similar_doc_pairs": _setsim_oracle_sql(),
}
