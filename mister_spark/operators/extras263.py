"""Wave 263: truncation dedup, portable theta set-op sketches, and
embedding-geometry diagnostics.

- dd_prefix_dup: a document that is an exact PREFIX of another is the
  signature of truncation/continuation duplicates (retries, pagination
  stitches, cut-off crawls) — invisible to symmetric Jaccard once the
  longer doc dwarfs the shorter. Lexicographic adjacency makes it a
  sort problem, not a pair problem: if A is a prefix of ANY document,
  A is a prefix of its immediate lexicographic successor (every string
  between A and a superstring of A also starts with A), so one global
  order + one neighbor check finds every victim.
- sketch_theta_setops: KMV/theta bottom-k sketches over the md5-60
  hash domain support UNION (bottom-k of sketch union = sketch of set
  union) and INTERSECTION (count common hashes below min(theta),
  rescale) — the composable set algebra that answers "how many users
  did BOTH" at 100 TB without a distinct-shuffle per question. Fully
  deterministic (fixed hash), so DuckDB replays the exact sketch.
- emb_intrinsic_dim: the Facco/Rodriguez/Laio TwoNN estimator —
  d = n / sum(ln(d2/d1)) over a fixed query panel's two nearest
  neighbors. The working dimensionality of an embedding space (vs its
  ambient 64) is the first diagnostic for index tuning and curse-of-
  dimensionality risk.
- emb_hubness: k-occurrence skew — how unevenly corpus points appear
  in others' k-NN lists. Hubness is the canonical high-dimensional
  retrieval pathology (a few points dominate every result list);
  skew + antihub share quantify it from the same panel.

Exactness discipline: distances are in-order left folds over the
64-dim arrays (identical double sequence in both engines — no BLAS on
the oracle-checked path), hashes are the shared md5-60 construction,
and every emitted double lands on the floor(x·10^n + 0.5) grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import global_rank
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

THETA_K = 256  # KMV sketch size (rel. err ~ 1/sqrt(K-2) ~ 6.3%)
THETA_SCALE = 1 << 60
THETA_PAIRS = [("click", "purchase"), ("click", "view"), ("purchase", "view")]
PANEL_K = 64  # TwoNN / hubness query panel size
HUB_K = 10  # neighbors per query for k-occurrence


@query(
    "dd_prefix_dup",
    oracle="""
    WITH s AS (SELECT doc_id, text,
                      LEAD(text) OVER (ORDER BY text, doc_id) AS nt,
                      LEAD(doc_id) OVER (ORDER BY text, doc_id) AS nid
               FROM documents)
    SELECT doc_id, nid AS witness_doc,
           CAST(LENGTH(text) AS BIGINT) AS doc_chars,
           CAST(CASE WHEN text = nt THEN 1 ELSE 0 END AS BIGINT) AS exact_dup
    FROM s
    WHERE nt IS NOT NULL AND starts_with(nt, text)
    """,
)
def dd_prefix_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents that are an exact prefix of another document
    (truncation duplicates), with a witness superstring and an
    exact-duplicate flag. Prefix-of-ANY reduces to prefix-of-
    lexicographic-successor (strings sort prefix-first and everything
    between A and a superstring of A starts with A), so the whole
    corpus needs ONE total order and one neighbor comparison — no
    candidate pairs at all.

    Scale: the total order comes from the two-phase `global_rank`
    (range partition + per-partition sort + broadcast offsets — no
    single-task sort); the successor is an equi-join of rank r with
    r+1, shuffling (rank, text) once. At 100 TB this is exactly a
    sort-merge pass over the text key — the cheapest dedup primitive
    there is."""
    docs = cat(spark, sf_dir)["documents"].select("doc_id", "text")
    r = global_rank(docs, "text", "doc_id").localCheckpoint()
    nxt = r.select(
        (F.col("rk") - 1).alias("rk"),
        F.col("text").alias("nt"),
        F.col("doc_id").alias("nid"),
    )
    return (
        r.join(nxt, "rk")
        .filter(F.col("nt").startswith(F.col("text")))
        .select(
            "doc_id",
            F.col("nid").alias("witness_doc"),
            F.length("text").cast("bigint").alias("doc_chars"),
            (F.col("text") == F.col("nt")).cast("bigint").alias("exact_dup"),
        )
    )


def _theta_hash_sql(x: str) -> str:
    return f"CAST('0x' || substr(md5('t:' || CAST({x} AS VARCHAR)), 1, 15) AS BIGINT)"


def _theta_pair_sql(a: str, b: str) -> str:
    """One UNION-ALL branch of the oracle: the full KMV pipeline for
    one type pair, replayed relationally."""
    k = THETA_K
    return f"""
    (WITH du AS (SELECT DISTINCT event_type, user_id FROM events
                 WHERE event_type IN ('{a}', '{b}')),
    h AS (SELECT event_type, {_theta_hash_sql("user_id")} AS h FROM du),
    sk AS (SELECT event_type, h,
                  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h)
                    AS rn,
                  CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                    AS n
           FROM h),
    kept AS (SELECT * FROM sk WHERE rn <= {k}),
    ta AS (SELECT MAX(CASE WHEN rn = {k} THEN h END) AS theta,
                  MAX(n) AS n
           FROM kept WHERE event_type = '{a}'),
    tb AS (SELECT MAX(CASE WHEN rn = {k} THEN h END) AS theta,
                  MAX(n) AS n
           FROM kept WHERE event_type = '{b}'),
    comb AS (SELECT h,
                    MAX(CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END)
                      AS in_a,
                    MAX(CASE WHEN event_type = '{b}' THEN 1 ELSE 0 END)
                      AS in_b
             FROM kept GROUP BY h),
    uni AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn,
                   CAST(COUNT(*) OVER () AS BIGINT) AS m
            FROM comb),
    tu AS (SELECT MAX(CASE WHEN rn = {k} THEN h END) AS theta,
                  MAX(m) AS m
           FROM uni),
    est AS (SELECT
      CASE WHEN ta.n < {k} THEN CAST(ta.n AS DOUBLE)
           ELSE ({k} - 1) * {THETA_SCALE}.0 / ta.theta END AS est_a,
      CASE WHEN tb.n < {k} THEN CAST(tb.n AS DOUBLE)
           ELSE ({k} - 1) * {THETA_SCALE}.0 / tb.theta END AS est_b,
      CASE WHEN tu.m < {k} THEN CAST(tu.m AS DOUBLE)
           ELSE ({k} - 1) * {THETA_SCALE}.0 / tu.theta END AS est_union,
      CASE WHEN ta.n >= {k} OR tb.n >= {k}
           THEN (SELECT COUNT(*) FROM comb
                 WHERE in_a = 1 AND in_b = 1
                   AND h < LEAST(COALESCE(ta.theta, {THETA_SCALE}),
                                 COALESCE(tb.theta, {THETA_SCALE})))
                * CAST(LEAST(COALESCE(ta.theta, {THETA_SCALE}),
                             COALESCE(tb.theta, {THETA_SCALE}))
                       AS DOUBLE) / {THETA_SCALE}.0
                * {THETA_SCALE}.0
                / LEAST(COALESCE(ta.theta, {THETA_SCALE}),
                        COALESCE(tb.theta, {THETA_SCALE}))
           ELSE (SELECT COUNT(*) FROM comb WHERE in_a = 1 AND in_b = 1)
      END AS est_inter
      FROM ta, tb, tu),
    ex AS (SELECT
      (SELECT COUNT(DISTINCT user_id) FROM events
        WHERE event_type = '{a}') AS exact_a,
      (SELECT COUNT(DISTINCT user_id) FROM events
        WHERE event_type = '{b}') AS exact_b,
      (SELECT COUNT(DISTINCT user_id) FROM events
        WHERE event_type IN ('{a}', '{b}')) AS exact_union)
    SELECT '{a}' AS type_a, '{b}' AS type_b,
           FLOOR(est.est_a * 100 + 0.5) / 100 AS est_a,
           FLOOR(est.est_b * 100 + 0.5) / 100 AS est_b,
           FLOOR(est.est_union * 100 + 0.5) / 100 AS est_union,
           FLOOR(est.est_inter * 100 + 0.5) / 100 AS est_inter,
           CAST(ex.exact_a AS BIGINT) AS exact_a,
           CAST(ex.exact_b AS BIGINT) AS exact_b,
           CAST(ex.exact_union AS BIGINT) AS exact_union,
           CAST(ex.exact_a + ex.exact_b - ex.exact_union AS BIGINT)
             AS exact_inter
    FROM est, ex)
    """


@query(
    "sketch_theta_setops",
    oracle=" UNION ALL ".join(
        _theta_pair_sql(a, b) for a, b in THETA_PAIRS
    ),
)
def sketch_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV set operations over per-event-type distinct-user
    sketches: bottom-{k} md5-60 hashes per set, union estimated from
    the merged sketch's k-th smallest (KMV mergeability: bottom-k of
    sketch-union = sketch of set-union), intersection from common
    hashes below min(theta) rescaled — plus the exact answers for the
    measured error. Deterministic hash -> the whole sketch replays in
    DuckDB. Sets smaller than k degrade to exact mode (theta
    saturates), matching production theta-sketch behavior.

    Scale: Spark builds each bottom-k in TWO phases — per-(type,
    salt) bottom-k windows in parallel, then a final bottom-k over
    the salt survivors (k·S rows) — the mergeable form, so no single
    task ever sees a whole set's hashes; every later step runs on
    model-sized (≤ 2k-row) frames. Exact counterparts are plain
    distinct aggregates here, and at 100 TB they are exactly what the
    sketch exists to avoid."""
    ev = cat(spark, sf_dir)["events"]
    types = sorted({t for p in THETA_PAIRS for t in p})
    du = (
        ev.filter(F.col("event_type").isin(types))
        .select("event_type", "user_id")
        .distinct()
    )
    h = du.select(
        "event_type",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("t:"), F.col("user_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    # two-phase mergeable bottom-k
    salted = h.withColumn("salt", (F.col("h") % 32).cast("int"))
    w1 = W.partitionBy("event_type", "salt").orderBy("h")
    phase1 = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= THETA_K)
        .drop("rn1", "salt")
    )
    w2 = W.partitionBy("event_type").orderBy("h")
    sk = (
        phase1.withColumn("rn", F.row_number().over(w2))
        .withColumn(
            "n",
            F.count(F.lit(1)).over(W.partitionBy("event_type")),
        )
        .localCheckpoint()
    )
    # NOTE: n here is the SALT-SURVIVOR count, not the set size; when
    # it is < k the set genuinely had < k distinct hashes (phase 1
    # only drops rows beyond k per salt), so exact-mode detection via
    # n < k is still correct.
    kept = sk.filter(F.col("rn") <= THETA_K)
    exact = (
        du.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nexact"))
        .localCheckpoint()
    )
    outs = []
    for a, b in THETA_PAIRS:
        ka = kept.filter(F.col("event_type") == a)
        kb = kept.filter(F.col("event_type") == b)
        ta = ka.agg(
            F.max(F.when(F.col("rn") == THETA_K, F.col("h"))).alias("theta_a"),
            F.max("n").alias("n_a"),
        )
        tb = kb.agg(
            F.max(F.when(F.col("rn") == THETA_K, F.col("h"))).alias("theta_b"),
            F.max("n").alias("n_b"),
        )
        comb = (
            ka.select("h", F.lit(1).alias("ia"), F.lit(0).alias("ib"))
            .unionByName(
                kb.select("h", F.lit(0).alias("ia"), F.lit(1).alias("ib"))
            )
            .groupBy("h")
            .agg(F.max("ia").alias("in_a"), F.max("ib").alias("in_b"))
        )
        uni = comb.withColumn(
            "rn", F.row_number().over(W.orderBy("h"))
        ).withColumn("m", F.count(F.lit(1)).over(W.partitionBy(F.lit(1))))
        tu = uni.agg(
            F.max(F.when(F.col("rn") == THETA_K, F.col("h"))).alias("theta_u"),
            F.max("m").alias("m"),
        )
        theta_min = F.least(
            F.coalesce(F.col("theta_a"), F.lit(THETA_SCALE)),
            F.coalesce(F.col("theta_b"), F.lit(THETA_SCALE)),
        )
        inter_raw = comb.crossJoin(F.broadcast(ta)).crossJoin(
            F.broadcast(tb)
        )
        s_inter = inter_raw.agg(
            F.sum(
                (
                    (F.col("in_a") == 1)
                    & (F.col("in_b") == 1)
                    & (F.col("h") < theta_min)
                ).cast("long")
            ).alias("n_common"),
            F.max(theta_min).alias("theta_min"),
            F.max(
                ((F.col("n_a") >= THETA_K) | (F.col("n_b") >= THETA_K)).cast(
                    "int"
                )
            ).alias("sketch_mode"),
            F.sum(
                ((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")
            ).alias("n_common_all"),
        )
        ea = exact.filter(F.col("event_type") == a).select(
            F.col("nexact").alias("exact_a")
        )
        eb = exact.filter(F.col("event_type") == b).select(
            F.col("nexact").alias("exact_b")
        )
        eu = (
            du.filter(F.col("event_type").isin([a, b]))
            .select("user_id")
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias("exact_union"))
        )
        est_of = lambda n, theta, m: F.when(  # noqa: E731
            n < THETA_K, n.cast("double")
        ).otherwise(F.lit(float(THETA_K - 1) * THETA_SCALE) / theta)
        row = (
            ta.crossJoin(F.broadcast(tb))
            .crossJoin(F.broadcast(tu))
            .crossJoin(F.broadcast(s_inter))
            .crossJoin(F.broadcast(ea))
            .crossJoin(F.broadcast(eb))
            .crossJoin(F.broadcast(eu))
            .select(
                F.lit(a).alias("type_a"),
                F.lit(b).alias("type_b"),
                F.floor(
                    est_of(F.col("n_a"), F.col("theta_a"), None) * 100
                    + F.lit(0.5)
                ).alias("_ea"),
                F.floor(
                    est_of(F.col("n_b"), F.col("theta_b"), None) * 100
                    + F.lit(0.5)
                ).alias("_eb"),
                F.floor(
                    est_of(F.col("m"), F.col("theta_u"), None) * 100
                    + F.lit(0.5)
                ).alias("_eu"),
                F.floor(
                    F.when(
                        F.col("sketch_mode") == 1,
                        F.col("n_common").cast("double")
                        * (F.col("theta_min").cast("double") / THETA_SCALE)
                        * F.lit(float(THETA_SCALE))
                        / F.col("theta_min"),
                    ).otherwise(F.col("n_common_all").cast("double"))
                    * 100
                    + F.lit(0.5)
                ).alias("_ei"),
                "exact_a",
                "exact_b",
                "exact_union",
                (
                    F.col("exact_a") + F.col("exact_b") - F.col("exact_union")
                ).cast("bigint").alias("exact_inter"),
            )
            .select(
                "type_a",
                "type_b",
                (F.col("_ea") / 100).alias("est_a"),
                (F.col("_eb") / 100).alias("est_b"),
                (F.col("_eu") / 100).alias("est_union"),
                (F.col("_ei") / 100).alias("est_inter"),
                "exact_a",
                "exact_b",
                "exact_union",
                "exact_inter",
            )
        )
        outs.append(row)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _dist2_sql(a: str, b: str) -> str:
    """In-order left-fold squared euclidean distance (same double
    sequence as the Spark aggregate fold)."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))), (x, y) -> x + y)"
    )


def _panel_nn_topk(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Exact k-NN of the fixed {PANEL_K}-point query panel against the
    corpus, returning (qid, vec_id, d2, rn) with rn <= k — the shared
    neighbor stage of emb_intrinsic_dim / emb_hubness.

    r11 rewrite (guide §8 "decide with small rows" + §4.2): the old
    shape broadcast the panel into a crossJoin and ran a corpus-sized
    window (panel x N rows shuffled AND sorted — the measured
    superlinear path: 19 s / slope 1.08 at sf1 for hubness). Now each
    scan task computes distances and keeps its LOCAL top-k per panel
    point inside one mapInArrow pass, so only tasks x {PANEL_K} x k
    candidate rows ever reach the final window. Distances stay
    bit-identical to the oracle's in-order fold: the numpy kernel
    accumulates (x_i - y_i)^2 over dims in ascending index order —
    the same IEEE-754 double add sequence as the former JVM
    zip_with/aggregate fold and the DuckDB list fold — and the
    selection key (d2, vec_id) is the window's exact sort key, so the
    kept sets (ties included) are identical."""
    import numpy as np

    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    ph = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("e:"), F.col("vec_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    # bottom-K by (hash, vec_id) is a TakeOrdered merge; the panel is a
    # constant-size (PANEL_K x dim) driver pull, corpus-size-independent
    panel = (
        emb.withColumn("ph", ph)
        .orderBy("ph", "vec_id")
        .limit(PANEL_K)
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
        .collect()
    )
    qids = np.array([r["qid"] for r in panel], dtype=np.int64)
    Q = np.array([r["qv"] for r in panel], dtype=np.float64)
    P, dim = Q.shape

    def local_topk(it):
        import pyarrow as pa

        best_d = [np.empty(0, dtype=np.float64) for _ in range(P)]
        best_v = [np.empty(0, dtype=np.int64) for _ in range(P)]
        for batch in it:
            vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
            col = batch.column("v")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            X = flat.reshape(len(vid), dim)
            # ascending-dim accumulation: identical double sequence to
            # the JVM/DuckDB left fold (exactness contract above)
            acc = np.zeros((len(vid), P), dtype=np.float64)
            for i in range(dim):
                diff = X[:, i : i + 1] - Q[None, :, i]
                acc += diff * diff
            for p in range(P):
                mask = vid != qids[p]
                d2 = np.concatenate([best_d[p], acc[mask, p]])
                vv = np.concatenate([best_v[p], vid[mask]])
                if len(d2) > k:
                    # all rows tied with the k-th by d2 stay in until the
                    # exact (d2, vec_id) lexsort below cuts at k
                    kth = np.partition(d2, k - 1)[k - 1]
                    keep = d2 <= kth
                    d2, vv = d2[keep], vv[keep]
                order = np.lexsort((vv, d2))[:k]
                best_d[p], best_v[p] = d2[order], vv[order]
        out_q = np.repeat(qids, [len(b) for b in best_v])
        if len(out_q):
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_q, type=pa.int64()),
                    pa.array(np.concatenate(best_v), type=pa.int64()),
                    pa.array(np.concatenate(best_d), type=pa.float64()),
                ],
                names=["qid", "vec_id", "d2"],
            )

    cand = emb.mapInArrow(local_topk, "qid long, vec_id long, d2 double")
    wq = W.partitionBy("qid").orderBy("d2", "vec_id")
    return cand.withColumn("rn", F.row_number().over(wq)).filter(
        F.col("rn") <= k
    )


_PANEL_SQL = f"""
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS qid, v AS qv FROM (
            SELECT vec_id, v,
                   ROW_NUMBER() OVER (ORDER BY
                     CAST('0x' || substr(md5('e:' || CAST(vec_id AS VARCHAR)),
                          1, 15) AS BIGINT), vec_id) AS prn
            FROM e) WHERE prn <= {PANEL_K}),
    d AS (SELECT q.qid, e.vec_id, {_dist2_sql('q.qv', 'e.v')} AS d2
          FROM q JOIN e ON e.vec_id <> q.qid),
    rnk AS (SELECT qid, vec_id, d2,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2, vec_id)
                     AS rn
            FROM d)
"""


@query(
    "emb_intrinsic_dim",
    oracle=f"""
    WITH {_PANEL_SQL},
    two AS (SELECT qid,
                   MAX(CASE WHEN rn = 1 THEN d2 END) AS s1,
                   MAX(CASE WHEN rn = 2 THEN d2 END) AS s2
            FROM rnk WHERE rn <= 2 GROUP BY qid),
    used AS (SELECT qid, 0.5 * ln(s2 / s1) AS logmu
             FROM two WHERE s1 > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           FLOOR(SUM(logmu) * 1000000 + 0.5) / 1000000 AS sum_log_mu,
           FLOOR(COUNT(*) / SUM(logmu) * 10000 + 0.5) / 10000
             AS intrinsic_dim
    FROM used
    """,
)
def emb_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate (Facco et al., public
    literature): for a fixed {p}-point query panel (bottom-{p} by
    md5-60 hash — deterministic, corpus-size-independent), take each
    query's two nearest neighbors and the MLE d = n / Σ ln(d2/d1).
    Exact-duplicate neighbors (d1 = 0) are dropped, as the estimator
    requires. An embedding space that "is" 12-dimensional inside its
    64 ambient dims wants different IVF/PQ settings than one using
    all 64 — this is the measurement.

    Scale: the panel is FIXED size, so the distance stage is one
    mapInArrow pass over the corpus (linear in N) that keeps each
    task's local 2-NN candidates per panel point — only tasks × panel
    × 2 rows reach the final window (`_panel_nn_topk`; the former
    panel × corpus shuffle+sort window measured superlinear at sf1).
    Distances accumulate dims in ascending order — the identical
    double sequence as the oracle's fold, no BLAS reassociation."""
    two = (
        _panel_nn_topk(spark, sf_dir, 2)
        .groupBy("qid")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("d2"))).alias("s1"),
            F.max(F.when(F.col("rn") == 2, F.col("d2"))).alias("s2"),
        )
        .filter(F.col("s1") > 0)
        .withColumn("logmu", 0.5 * F.log(F.col("s2") / F.col("s1")))
    )
    return two.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        (F.floor(F.sum("logmu") * 1000000 + F.lit(0.5)) / 1000000).alias(
            "sum_log_mu"
        ),
        (
            F.floor(
                F.count(F.lit(1)) / F.sum("logmu") * 10000 + F.lit(0.5)
            )
            / 10000
        ).alias("intrinsic_dim"),
    )


@query(
    "emb_hubness",
    oracle=f"""
    WITH {_PANEL_SQL},
    knn AS (SELECT vec_id FROM rnk WHERE rn <= {HUB_K}),
    occ AS (SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS k_occ
            FROM knn GROUP BY vec_id),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM e),
    mom AS (SELECT CAST(SUM(k_occ) AS DOUBLE) AS s1,
                   CAST(SUM(k_occ * k_occ) AS DOUBLE) AS s2,
                   CAST(SUM(k_occ * k_occ * k_occ) AS DOUBLE) AS s3,
                   CAST(COUNT(*) AS BIGINT) AS n_retrieved,
                   MAX(k_occ) AS max_occ
            FROM occ)
    SELECT nn.n_corpus,
           CAST({PANEL_K} AS BIGINT) AS n_queries,
           CAST({HUB_K} AS BIGINT) AS k,
           mom.n_retrieved,
           mom.max_occ,
           FLOOR((nn.n_corpus - mom.n_retrieved)
                 / CAST(nn.n_corpus AS DOUBLE) * 10000 + 0.5) / 10000
             AS antihub_share,
           FLOOR(((mom.s3 / nn.n_corpus
                   - 3 * (mom.s1 / nn.n_corpus) * (mom.s2 / nn.n_corpus)
                   + 2 * (mom.s1 / nn.n_corpus) * (mom.s1 / nn.n_corpus)
                     * (mom.s1 / nn.n_corpus))
                  / POWER(mom.s2 / nn.n_corpus
                          - (mom.s1 / nn.n_corpus) * (mom.s1 / nn.n_corpus),
                          1.5)) * 10000 + 0.5) / 10000
             AS occ_skewness
    FROM nn, mom
    """,
)
def emb_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence hubness audit: over the same fixed query panel,
    each query's {k}-NN list votes for its members; a corpus point's
    k-occurrence is its vote count (zero for never-retrieved
    antihubs). Reports the occurrence skewness over the WHOLE corpus
    (zeros included, via raw moments — no per-point zero rows are
    materialized), the max hub, and the antihub share. High skew =
    a few points dominate every result list — the standard
    high-dimensional failure mode that distance calibration or
    mutual-kNN reranking must fix before retrieval quality numbers
    mean anything.

    Scale: identical neighbor stage to emb_intrinsic_dim
    (`_panel_nn_topk`: per-task local top-{k} inside one mapInArrow
    corpus pass, candidates-only window) — the occurrence aggregate is
    over ≤ panel·{k} rows and the moment trick keeps the zero-class
    implicit."""
    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    occ = (
        _panel_nn_topk(spark, sf_dir, HUB_K)
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k_occ"))
    )
    n_corpus = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n_corpus"))
    mom = occ.agg(
        F.sum("k_occ").cast("double").alias("s1"),
        F.sum(F.col("k_occ") * F.col("k_occ")).cast("double").alias("s2"),
        F.sum(F.col("k_occ") * F.col("k_occ") * F.col("k_occ"))
        .cast("double")
        .alias("s3"),
        F.count(F.lit(1)).cast("bigint").alias("n_retrieved"),
        F.max("k_occ").alias("max_occ"),
    )
    n = F.col("n_corpus").cast("double")
    m1 = F.col("s1") / n
    m2 = F.col("s2") / n - m1 * m1
    m3 = F.col("s3") / n - 3 * m1 * (F.col("s2") / n) + 2 * m1 * m1 * m1
    return (
        mom.crossJoin(F.broadcast(n_corpus))
        .select(
            "n_corpus",
            F.lit(PANEL_K).cast("bigint").alias("n_queries"),
            F.lit(HUB_K).cast("bigint").alias("k"),
            "n_retrieved",
            "max_occ",
            ratio(
                (F.col("n_corpus") - F.col("n_retrieved"))
                / F.col("n_corpus").cast("double")
            ).alias("antihub_share"),
            rnd(m3 / F.pow(m2, 1.5), 4).alias("occ_skewness"),
        )
    )


emb_intrinsic_dim.__doc__ = emb_intrinsic_dim.__doc__.format(p=PANEL_K)
emb_hubness.__doc__ = emb_hubness.__doc__.format(k=HUB_K)
sketch_theta_setops.__doc__ = sketch_theta_setops.__doc__.format(k=THETA_K)
