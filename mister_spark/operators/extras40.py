"""Wave 40: lift/gains tables, price-volume-mix decomposition, MMR
diversified retrieval, and the LSH-vs-exact dedup evaluation.

ml_lift_table is the campaign-targeting view of a scored population
(the decile twin of ml_calibration_bins); ev_pvm_decomposition is the
finance-standard answer to 'did revenue move because of MORE events or
BIGGER events'; sim_mmr is the diversity re-rank every RAG retriever
bolts onto top-k; dd_lsh_eval closes the dedup loop by measuring the
scale path (MinHash LSH) against the exact Jaccard ground truth as a
driver-visible report rather than only a pytest assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import global_rank, ntile_from_rank
from mister_spark.operators.common import cat, money, ratio
from mister_spark.operators.dedup import DD_LSH_ORACLE, DD_NGRAM_ORACLE
from mister_spark.registry import query

DAY_US = 86_400_000_000
LIFT_POS_LABEL_LT = 5  # mirrors ml_auc / ml_pr_auc
LIFT_TILES = 10
MMR_SHORTLIST = 50
MMR_K = 10
MMR_LAMBDA = 0.7


@query(
    "ml_lift_table",
    oracle=f"""
    WITH s AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS score,
                      CASE WHEN label < {LIFT_POS_LABEL_LT} THEN 1 ELSE 0 END
                        AS pos
               FROM embeddings),
    d AS (SELECT pos, NTILE({LIFT_TILES}) OVER (ORDER BY score DESC, vec_id)
                        AS decile
          FROM s),
    g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(pos) AS BIGINT) AS n_pos
          FROM d GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tn,
                 CAST(SUM(n_pos) AS DOUBLE) AS tp FROM g),
    c AS (SELECT decile, n, n_pos,
                 SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
                   AS cum_pos
          FROM g)
    SELECT CAST(c.decile AS BIGINT) AS decile, c.n, c.n_pos,
           FLOOR(CAST(c.n_pos AS DOUBLE) / c.n * 10000 + 0.5) / 10000
             AS pos_rate,
           FLOOR(CAST(c.cum_pos AS DOUBLE) / t.tp * 10000 + 0.5) / 10000
             AS cum_gain,
           FLOOR((CAST(c.n_pos AS DOUBLE) / c.n) / (t.tp / t.tn)
                 * 10000 + 0.5) / 10000 AS lift
    FROM c, t
    """,
)
def ml_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table by score decile: rank the
    population by the model score, cut into {LIFT_TILES} exact NTILE
    deciles, and report per decile the positive rate, the cumulative
    share of all positives captured (the gains curve), and lift over
    the base rate — the 'how deep do we mail' view marketing and risk
    teams read instead of AUC. Deciles are tie-free (score DESC,
    vec_id tiebreak) so both engines cut identically.

    Scale: ranking is the two-phase `global_rank` + arithmetic
    `ntile_from_rank` (no single-task NTILE window); the cumulative
    sum runs on the {LIFT_TILES}-row decile frame."""
    emb = cat(spark, sf_dir)["embeddings"]
    s = emb.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("score"),
        F.when(F.col("label") < LIFT_POS_LABEL_LT, 1).otherwise(0).alias("pos"),
    )
    r = global_rank(s, F.desc("score"), F.asc("vec_id"), rank_col="rk")
    t = s.agg(
        F.count(F.lit(1)).cast("double").alias("tn"),
        F.sum("pos").cast("double").alias("tp"),
    )
    d = r.crossJoin(F.broadcast(t)).select(
        "pos",
        "tn",
        "tp",
        ntile_from_rank(F.col("rk"), F.col("tn"), LIFT_TILES).alias("decile"),
    )
    g = d.groupBy("decile", "tn", "tp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
    )
    w = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    c = g.withColumn("cum_pos", F.sum("n_pos").over(w))
    return c.select(
        F.col("decile").cast("bigint").alias("decile"),
        "n",
        "n_pos",
        ratio(F.col("n_pos").cast("double") / F.col("n")).alias("pos_rate"),
        ratio(F.col("cum_pos").cast("double") / F.col("tp")).alias("cum_gain"),
        ratio(
            (F.col("n_pos").cast("double") / F.col("n"))
            / (F.col("tp") / F.col("tn"))
        ).alias("lift"),
    )


@query(
    "ev_pvm_decomposition",
    oracle=f"""
    WITH b AS (SELECT MIN(epoch_us(ts) // {DAY_US}) AS mnd,
                      MAX(epoch_us(ts) // {DAY_US}) AS mxd FROM events),
    e AS (SELECT event_type,
                 CASE WHEN epoch_us(ts) // {DAY_US}
                           < (b.mnd + b.mxd + 1) // 2
                      THEN 0 ELSE 1 END AS half,
                 value
          FROM events, b),
    g AS (SELECT event_type,
                 CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
                 CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2,
                 CAST(FLOOR(SUM(CASE WHEN half = 0 THEN value ELSE 0 END)
                            * 100 + 0.5) AS BIGINT) AS v1c,
                 CAST(FLOOR(SUM(CASE WHEN half = 1 THEN value ELSE 0 END)
                            * 100 + 0.5) AS BIGINT) AS v2c
          FROM e GROUP BY 1)
    SELECT event_type, n1, n2,
           FLOOR(v1c / 100.0 * 100 + 0.5) / 100 AS rev_1,
           FLOOR(v2c / 100.0 * 100 + 0.5) / 100 AS rev_2,
           FLOOR((v2c - v1c) / 100.0 * 100 + 0.5) / 100 AS delta,
           FLOOR((n2 - n1) * (v1c / 100.0 / n1) * 100 + 0.5) / 100
             AS volume_effect,
           FLOOR(n2 * (v2c / 100.0 / n2 - v1c / 100.0 / n1) * 100 + 0.5)
             / 100 AS rate_effect
    FROM g
    WHERE n1 > 0 AND n2 > 0
    """,
)
def ev_pvm_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix decomposition of revenue change between the
    first and second half of the observed window: per event type,
    ΔRevenue splits exactly into a VOLUME effect ((n₂−n₁)·rate₁ —
    more events at the old average) and a RATE effect (n₂·(rate₂−
    rate₁) — the same events getting bigger). The identity volume +
    rate = Δ holds pre-rounding; each effect is cent-rounded
    identically in both engines. This is the finance-close staple for
    'why did the number move'.

    Scale: the day bounds are a 1-row broadcast; the half split is
    map-side; ONE partial-agg shuffle on event_type computes all four
    conditional aggregates."""
    ev = cat(spark, sf_dir)["events"]
    b = ev.agg(
        F.min(F.expr(f"unix_micros(ts) div {DAY_US}")).alias("mnd"),
        F.max(F.expr(f"unix_micros(ts) div {DAY_US}")).alias("mxd"),
    )
    e = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(
            F.expr(f"unix_micros(ts) div {DAY_US}")
            < F.floor((F.col("mnd") + F.col("mxd") + 1) / 2),
            0,
        )
        .otherwise(1)
        .alias("half"),
        "value",
    )
    g = e.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.floor(
            F.sum(F.when(F.col("half") == 0, F.col("value")).otherwise(0.0)) * 100
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("v1c"),
        F.floor(
            F.sum(F.when(F.col("half") == 1, F.col("value")).otherwise(0.0)) * 100
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("v2c"),
    )
    rate1 = F.col("v1c") / 100.0 / F.col("n1")
    rate2 = F.col("v2c") / 100.0 / F.col("n2")
    return g.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        "event_type",
        "n1",
        "n2",
        money(F.col("v1c") / 100.0).alias("rev_1"),
        money(F.col("v2c") / 100.0).alias("rev_2"),
        money((F.col("v2c") - F.col("v1c")) / 100.0).alias("delta"),
        money((F.col("n2") - F.col("n1")) * rate1).alias("volume_effect"),
        money(F.col("n2") * (rate2 - rate1)).alias("rate_effect"),
    )


@query(
    "sim_mmr",
    # Real oracle: the greedy MMR loop as a recursive CTE carrying the
    # chosen-id list; every dot product / norm on BOTH engines is a
    # sequential left fold (list_reduce here, plain Python loops on
    # the driver — numpy's BLAS summation order was the one thing that
    # couldn't be mirrored), so the shortlist cut, the pairwise sims,
    # and the argmax comparisons see identical doubles. Ties break to
    # the lowest vec_id exactly like the Python loop.
    oracle=f"""
    WITH RECURSIVE qv AS (
      SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE vec_id = 0),
    qn AS (SELECT list_transform(v, x -> x / GREATEST(SQRT(
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(v, x -> x * x)), (a, b) -> a + b)),
             1e-12)) AS q
           FROM qv),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id <> 0),
    scored AS (SELECT e.vec_id, e.v,
                      list_reduce(list_prepend(CAST(0 AS DOUBLE),
                        list_transform(range(1, len(e.v) + 1),
                                       i -> e.v[i] * qn.q[i])),
                        (a, b) -> a + b)
                      / GREATEST(SQRT(list_reduce(
                          list_prepend(CAST(0 AS DOUBLE),
                            list_transform(e.v, x -> x * x)),
                          (a, b) -> a + b)), 1e-12) AS rel
               FROM e, qn),
    short AS (SELECT vec_id, rel,
                     list_transform(v, x -> x / GREATEST(SQRT(
                       list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list_transform(v, x -> x * x)),
                         (a, b) -> a + b)), 1e-12)) AS nv
              FROM scored ORDER BY rel DESC, vec_id
              LIMIT {MMR_SHORTLIST}),
    sims AS (SELECT a.vec_id AS i, b.vec_id AS j,
                    list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(range(1, len(a.nv) + 1),
                                     k -> a.nv[k] * b.nv[k])),
                      (x, y) -> x + y) AS s
             FROM short a JOIN short b ON a.vec_id <> b.vec_id),
    walk AS (
      SELECT 0 AS it, CAST([] AS BIGINT[]) AS chosen,
             CAST(NULL AS BIGINT) AS pick, CAST(NULL AS DOUBLE) AS rel,
             CAST(NULL AS DOUBLE) AS score
      UNION ALL
      SELECT w.it + 1, list_append(w.chosen, p.id), p.id, p.rel, p.sc
      FROM walk w, LATERAL (
        SELECT c.vec_id AS id, c.rel,
               {MMR_LAMBDA} * c.rel - (1 - {MMR_LAMBDA})
               * COALESCE(MAX(CASE WHEN list_contains(w.chosen, s.j)
                                   THEN s.s END), 0.0) AS sc
        FROM short c LEFT JOIN sims s ON s.i = c.vec_id
        WHERE NOT list_contains(w.chosen, c.vec_id)
        GROUP BY c.vec_id, c.rel
        ORDER BY sc DESC, c.vec_id LIMIT 1) p
      WHERE w.it < {MMR_K})
    SELECT CAST(it AS BIGINT) AS rank, pick AS vec_id,
           FLOOR(rel * 10000 + 0.5) / 10000 AS relevance,
           FLOOR(score * 10000 + 0.5) / 10000 AS mmr_score
    FROM walk WHERE it >= 1
    """,
)
def sim_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversified top-{MMR_K} for the
    vec_id=0 query: greedily pick argmax of λ·rel(d) − (1−λ)·max
    sim(d, selected) over a {MMR_SHORTLIST}-candidate shortlist — the
    standard re-rank that stops a retriever returning ten near-copies
    of the same document (λ={MMR_LAMBDA}). Ties break to the lowest
    vec_id, so selection is deterministic.

    Scale: the shortlist is the distributed brute/IVF top-k
    (TakeOrdered, no full sort); the greedy loop runs driver-side on
    the O(k·shortlist·dim) slice — O(model), never O(corpus). Cite:
    Carbonell & Goldstein 1998.

    tests/test_wave40.py replays the greedy loop in pure numpy from
    the parquet and requires identical selection order."""
    import math

    def seq_sum(xs):
        # sequential left fold — the one accumulation order every
        # engine (Spark aggregate, DuckDB list_reduce, this loop)
        # reproduces bit-for-bit; numpy's BLAS pairwise sums don't
        acc = 0.0
        for x in xs:
            acc += x
        return acc

    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qrow = emb.filter(F.col("vec_id") == 0).collect()[0]
    qn = max(math.sqrt(seq_sum(x * x for x in qrow["v"])), 1e-12)
    q = [x / qn for x in qrow["v"]]
    dots = F.aggregate(
        F.zip_with("v", F.array([F.lit(float(x)) for x in q]), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform("v", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    short = (
        emb.filter(F.col("vec_id") != 0)
        .withColumn("rel", dots / F.greatest(nrm, F.lit(1e-12)))
        .orderBy(F.desc("rel"), "vec_id")
        .limit(MMR_SHORTLIST)
        .collect()
    )
    ids = [r["vec_id"] for r in short]
    rel = [r["rel"] for r in short]
    X = []
    for r in short:
        n = max(math.sqrt(seq_sum(x * x for x in r["v"])), 1e-12)
        X.append([x / n for x in r["v"]])
    sims = [
        [seq_sum(a * b for a, b in zip(X[i], X[j])) for j in range(len(X))]
        for i in range(len(X))
    ]
    chosen: list[int] = []
    out = []
    remaining = list(range(len(ids)))
    for rank in range(1, min(MMR_K, len(ids)) + 1):
        best_i, best_score = None, None
        for i in remaining:
            penalty = max(sims[i][j] for j in chosen) if chosen else 0.0
            score = MMR_LAMBDA * rel[i] - (1 - MMR_LAMBDA) * penalty
            if (
                best_score is None
                or score > best_score
                or (score == best_score and ids[i] < ids[best_i])
            ):
                best_i, best_score = i, score
        chosen.append(best_i)
        remaining.remove(best_i)
        r4 = lambda x: math.floor(x * 10000 + 0.5) / 10000  # noqa: E731
        out.append((rank, ids[best_i], r4(rel[best_i]), r4(best_score)))
    return spark.createDataFrame(
        out, "rank bigint, vec_id bigint, relevance double, mmr_score double"
    )


@query(
    "dd_lsh_eval",
    # Real oracle: both pair sets are oracle-exact queries now (the
    # exact-Jaccard SQL and the shared universal-hash LSH SQL), so the
    # eval is two wrapped subqueries and set arithmetic.
    oracle=f"""
    WITH exact AS (SELECT doc_a, doc_b FROM ({DD_NGRAM_ORACLE}) q1),
    lsh AS (SELECT doc_a, doc_b FROM ({DD_LSH_ORACLE}) q2),
    tp AS (SELECT CAST(COUNT(*) AS BIGINT) AS c
           FROM lsh JOIN exact USING (doc_a, doc_b)),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM exact),
    nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM lsh)
    SELECT ne.c AS n_exact_pairs, nl.c AS n_lsh_pairs,
           tp.c AS true_positives,
           CASE WHEN nl.c > 0
                THEN FLOOR(CAST(tp.c AS DOUBLE) / nl.c * 10000 + 0.5)
                     / 10000 ELSE 1.0 END AS precision,
           CASE WHEN ne.c > 0
                THEN FLOOR(CAST(tp.c AS DOUBLE) / ne.c * 10000 + 0.5)
                     / 10000 ELSE 1.0 END AS recall,
           ne.c - tp.c AS missed
    FROM tp, ne, nl
    """,
)
def dd_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-pipeline evaluation report: the MinHash-LSH scale path
    (dd_minhash_lsh) measured against the exact shingle-Jaccard ground
    truth (dd_ngram_jaccard) — pair counts, true positives, precision,
    recall, and the miss count, as a driver-visible one-row report
    (the eval the pytest recall gate runs, productized — a 100 TB
    dedup run ships this row next to its savings report). Both sides
    verify exact Jaccard ≥ τ on their pairs, so precision is 1.0 by
    construction and the informative number is RECALL: the share of
    true near-dup pairs whose signatures collided in ≥1 LSH band.

    Scale: both inputs are the bucketed linear-shuffle plans; the
    comparison joins on (doc_a, doc_b) pair keys — candidate-sized."""
    from mister_spark.operators.dedup import dd_minhash_lsh, dd_ngram_jaccard

    exact = dd_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b").localCheckpoint()
    lsh = dd_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b").localCheckpoint()
    tp = lsh.join(exact, ["doc_a", "doc_b"]).count()
    n_exact = exact.count()
    n_lsh = lsh.count()
    import math

    import pandas as pd

    row = pd.DataFrame(
        [
            {
                "n_exact_pairs": n_exact,
                "n_lsh_pairs": n_lsh,
                "true_positives": tp,
                "precision": math.floor(tp / n_lsh * 10000 + 0.5) / 10000
                if n_lsh
                else 1.0,
                "recall": math.floor(tp / n_exact * 10000 + 0.5) / 10000
                if n_exact
                else 1.0,
                "missed": n_exact - tp,
            }
        ]
    )
    return spark.createDataFrame(row)
