"""Wave 97: retrieval self-evaluation, overdispersed proportion
fitting, and data-scaling curves.

ds_rag_eval is the self-supervised retrieval harness: take a prefix
of every Nth document as a query, run BM25 over the inverted index,
and score hit@5 / MRR on whether the SOURCE document comes back — a
retrieval QA gate that needs no labels; stat_beta_binomial fits the
beta-binomial to per-source flag rates (the proportion twin of
stat_negbin_fit: 'rates vary MORE across sources than a shared-p
binomial allows, here is the ICC'); ml_learning_curve retrains the
logistic probe on growing deterministic fractions of the corpus —
the data-scaling read that says whether more data is still buying
anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS
from mister_spark.operators.common import cat, ratio
from mister_spark.operators.extras92 import BLOCKLIST
from mister_spark.registry import query

RAG_EVERY = 29  # every doc with doc_id % RAG_EVERY == 0 becomes a query
RAG_PREFIX = 8  # query = first N tokens
RAG_K = 5
BM25_K1, BM25_B = 1.2, 0.75
LC_FRACTIONS = (4, 2, 1)  # vec_id % f == 0 → 25%, 50%, 100%
LC_ITERS = 8
LC_LR = 0.5


@query(
    "ds_rag_eval",
    # Real oracle: the whole harness is relational — bigram postings,
    # BM25 with the same idf/tf/length terms on identical doubles, the
    # (score DESC, doc_id) top-K window, and two ratio aggregates.
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    b2 AS (SELECT doc_id,
                  list_transform(generate_series(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i + 1]) AS bg,
                  CAST(len(toks) - 1 AS BIGINT) AS dl
           FROM t WHERE len(toks) - 1 > 0),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     AVG(CAST(dl AS DOUBLE)) AS avgdl FROM b2),
    tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, dl, unnest(bg) AS term FROM b2) u
           GROUP BY 1, 2, 3),
    dfreq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
              FROM tf GROUP BY 1),
    q AS (SELECT doc_id AS q_id,
                 unnest(list_distinct(bg[1:{RAG_PREFIX}])) AS term
          FROM b2 WHERE doc_id % {RAG_EVERY} = 0),
    scored AS (SELECT q.q_id, tf.doc_id,
                      SUM(LN((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
                          * (tf.tf * ({BM25_K1} + 1))
                          / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                             + {BM25_B} * tf.dl / s.avgdl))) AS score
               FROM q JOIN tf ON q.term = tf.term
                    JOIN dfreq d ON d.term = q.term
                    CROSS JOIN stats s
               GROUP BY 1, 2),
    top AS (SELECT q_id, doc_id, rk FROM (
              SELECT q_id, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY score DESC, doc_id) AS rk
              FROM scored) w WHERE rk <= {RAG_K}),
    perq AS (SELECT q_id,
                    MAX(CASE WHEN doc_id = q_id THEN 1 ELSE 0 END) AS hit,
                    MAX(CASE WHEN doc_id = q_id THEN 1.0 / rk END) AS rr
             FROM top GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           FLOOR(AVG(hit) * 10000 + 0.5) / 10000 AS hit_at_k,
           FLOOR(AVG(COALESCE(rr, 0.0)) * 10000 + 0.5) / 10000 AS mrr
    FROM perq
    """,
)
def ds_rag_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-free retrieval evaluation: every {n}th document donates
    its first {p} token BIGRAMS as a query; BM25 over the corpus must
    retrieve the donor. Reports hit@{k} and MRR — the canary that
    catches tokenization or scoring regressions in a RAG stack
    (bigram terms: the unigram vocabulary here is ~31 types, too
    ambiguous for ANY retriever — term granularity is itself a
    retrieval-design lever this op exposes)
    without a single human label (self-retrieval failing means real
    queries have no chance).

    Scale: scoring goes through the inverted index (explode query
    terms, equi-join the postings, one partial-agg per (query, doc))
    — candidate-bounded, never |queries|×|docs|; the per-query top-{k}
    is a window over candidate hits partitioned by query."""
    from mister_spark.functions.text import bigrams, tokens

    docs = cat(spark, sf_dir)["documents"]
    bg = bigrams(tokens())
    base = docs.select(
        "doc_id", bg.alias("toks"), F.size(bg).alias("dl")
    ).filter(F.col("dl") > 0).localCheckpoint()
    n_docs = base.count()
    avgdl = base.agg(F.avg("dl")).collect()[0][0]
    post = base.select(
        "doc_id", "dl", F.explode(F.array_distinct("toks")).alias("term")
    )
    tf = base.select(
        "doc_id", "dl", F.explode("toks").alias("term")
    ).groupBy("doc_id", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = post.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    queries = base.filter(F.col("doc_id") % RAG_EVERY == 0).select(
        F.col("doc_id").alias("q_id"),
        F.explode(
            F.array_distinct(F.slice("toks", 1, RAG_PREFIX))
        ).alias("term"),
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    scored = (
        queries.join(tf, "term")
        .join(F.broadcast(dfreq), "term")
        .withColumn(
            "s",
            idf
            * (F.col("tf") * (BM25_K1 + 1))
            / (
                F.col("tf")
                + BM25_K1
                * (1 - BM25_B + BM25_B * F.col("dl") / F.lit(float(avgdl)))
            ),
        )
        .groupBy("q_id", "doc_id")
        .agg(F.sum("s").alias("score"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("score").desc(), "doc_id")
    top = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= RAG_K
    )
    per_q = top.groupBy("q_id").agg(
        F.max(
            F.when(F.col("doc_id") == F.col("q_id"), 1).otherwise(0)
        ).alias("hit"),
        F.max(
            F.when(F.col("doc_id") == F.col("q_id"), 1.0 / F.col("rk"))
        ).alias("rr"),
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        ratio(F.avg("hit")).alias("hit_at_k"),
        ratio(F.avg(F.coalesce("rr", F.lit(0.0)))).alias("mrr"),
    )


ds_rag_eval.__doc__ = ds_rag_eval.__doc__.format(
    n=RAG_EVERY, p=RAG_PREFIX, k=RAG_K
)


def _bl_arr() -> str:
    return "[" + ", ".join(f"'{w}'" for w in BLOCKLIST) + "]"


@query(
    "stat_beta_binomial",
    oracle=f"""
    WITH t AS (SELECT source,
                      CAST(COUNT(*) AS DOUBLE) AS n,
                      CAST(SUM(CASE WHEN len(list_filter(
                               list_filter(string_split(text, ' '),
                                           x -> x <> ''),
                               x -> list_contains({_bl_arr()}, x))) > 0
                               THEN 1 ELSE 0 END) AS DOUBLE) AS k
               FROM documents GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS DOUBLE) AS g,
                 AVG(k / n) AS m1, VAR_SAMP(k / n) AS s2,
                 AVG(n) AS nbar
          FROM t),
    rho AS (SELECT g, m1, nbar,
                   GREATEST((s2 - m1 * (1 - m1) / nbar)
                            / (m1 * (1 - m1) * (1 - 1.0 / nbar)),
                            0.0001) AS icc
            FROM m)
    SELECT CAST(g AS BIGINT) AS sources,
           FLOOR(m1 * 10000 + 0.5) / 10000 AS mean_rate,
           FLOOR(icc * 10000 + 0.5) / 10000 AS icc,
           FLOOR(m1 * (1 / icc - 1) * 10000 + 0.5) / 10000 AS alpha,
           FLOOR((1 - m1) * (1 / icc - 1) * 10000 + 0.5) / 10000 AS beta
    FROM rho
    """,
)
def stat_beta_binomial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beta-binomial method-of-moments fit to per-source blocklist
    flag rates: intra-class correlation ρ measures how much MORE the
    rates vary across sources than one shared binomial p allows, and
    (α, β) give the rate prior a hierarchical model would use.
    ρ near its floor ⇒ a pooled rate is fine; large ρ ⇒ per-source
    modeling (or per-source review) is mandatory.

    Scale: one pass collapses to |sources| rows (the blocklist test
    is the JVM array filter from tx_blocklist_screen); the fit is
    |sources|-row arithmetic."""
    docs = cat(spark, sf_dir)["documents"]
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    lit = F.array(*[F.lit(w) for w in BLOCKLIST])
    flagged = (
        F.size(F.filter(toks, lambda t: F.array_contains(lit, t))) > 0
    ).cast("double")
    t = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(flagged).alias("k"),
    )
    rate = F.col("k") / F.col("n")
    m = t.agg(
        F.count(F.lit(1)).cast("double").alias("g"),
        F.avg(rate).alias("m1"),
        F.var_samp(rate).alias("s2"),
        F.avg("n").alias("nbar"),
    )
    icc = F.greatest(
        (F.col("s2") - F.col("m1") * (1 - F.col("m1")) / F.col("nbar"))
        / (F.col("m1") * (1 - F.col("m1")) * (1 - 1.0 / F.col("nbar"))),
        F.lit(0.0001),
    )
    return m.select(
        F.col("g").cast("bigint").alias("sources"),
        ratio(F.col("m1")).alias("mean_rate"),
        ratio(icc).alias("icc"),
        ratio(F.col("m1") * (1 / icc - 1)).alias("alpha"),
        ratio((1 - F.col("m1")) * (1 / icc - 1)).alias("beta"),
    )


@query(
    "ml_learning_curve",
    # Real oracle: the per-fraction GD loops run as ONE recursive CTE
    # keyed by the slice modulus f — each (f, it) group carries its
    # own 65-weight DOUBLE list; the reported loss is the last pass's
    # pre-update loss (weights after LC_ITERS-1 updates), exactly the
    # Python accounting (same shape as the shared logreg fragment,
    # with f joined through every stage).
    oracle=f"""
    WITH RECURSIVE fr AS (SELECT UNNEST([{", ".join(str(f) for f in LC_FRACTIONS)}]) AS f),
    emb AS (SELECT fr.f, CAST(e.embedding AS DOUBLE[]) AS v,
                   CAST(e.label % 2 AS DOUBLE) AS y
            FROM embeddings e JOIN fr ON e.vec_id % fr.f = 0),
    nn AS (SELECT f, CAST(COUNT(*) AS DOUBLE) AS n FROM emb GROUP BY f),
    gd AS (
      SELECT f, 0 AS it,
             list_transform(range(1, 66), i -> CAST(0.0 AS DOUBLE)) AS w
      FROM fr
      UNION ALL
      SELECT q.f, q.it + 1, list(q.nw ORDER BY q.dim)
      FROM (
        SELECT r.f, r.it, u.dim,
               MAX(r.wd[u.dim])
               - {LC_LR} * (SUM((r.p - r.y) * u.x) / MAX(r.n)) AS nw
        FROM (
          SELECT s.f, s.it, s.w AS wd, e.y, nx.n,
                 list_append(e.v, CAST(1.0 AS DOUBLE)) AS xv,
                 1.0 / (1.0 + EXP(-(list_aggregate(
                   list_transform(range(1, 65), i -> e.v[i] * s.w[i]),
                   'sum') + s.w[65]))) AS p
          FROM gd s JOIN emb e ON e.f = s.f JOIN nn nx ON nx.f = s.f
          WHERE s.it < {LC_ITERS}
        ) r
        CROSS JOIN LATERAL (SELECT unnest(generate_series(1, 65)) AS dim,
                                   unnest(r.xv) AS x) u
        GROUP BY r.f, r.it, u.dim
      ) q
      GROUP BY q.f, q.it
    ),
    wp AS (SELECT f, w FROM gd WHERE it = {LC_ITERS} - 1),
    lo AS (SELECT sc.f, SUM(-(sc.y * LN(sc.p + 1e-12)
                              + (1 - sc.y) * LN(1 - sc.p + 1e-12))) AS ls
           FROM (SELECT e.f, e.y,
                        1.0 / (1.0 + EXP(-(list_aggregate(
                          list_transform(range(1, 65),
                                         i -> e.v[i] * wp.w[i]), 'sum')
                          + wp.w[65]))) AS p
                 FROM emb e JOIN wp ON wp.f = e.f) sc(f, y, p)
           GROUP BY sc.f)
    SELECT FLOOR(1.0 / fr.f * 10000 + 0.5) / 10000 AS fraction,
           CAST(nn.n AS BIGINT) AS n,
           FLOOR(lo.ls / nn.n * 1e6 + 0.5) / 1e6 AS final_loss
    FROM fr JOIN nn ON nn.f = fr.f JOIN lo ON lo.f = fr.f
    """,
)
def ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-scaling curve for the logistic probe: retrain on
    deterministic 25% / 50% / 100% slices (vec_id modulo — stable
    nested subsets, each a superset of the previous) and report the
    final training log-loss and n per slice. Flat curve ⇒ the probe
    is capacity- or signal-limited, not data-limited — the cheapest
    answer to 'would more data help'.

    Scale: same full-batch gradient structure as ml_logreg (O(d)
    state through the closure, partial gradients per Arrow batch);
    the slice filter pushes into the scan."""
    import numpy as np
    import pandas as pd

    out = []
    for frac in LC_FRACTIONS:
        emb = (
            cat(spark, sf_dir)["embeddings"]
            .filter(F.col("vec_id") % frac == 0)
            .select(
                F.col("embedding").cast("array<double>").alias("v"),
                (F.col("label") % 2).cast("double").alias("y"),
            )
            .localCheckpoint()
        )
        d = len(emb.first()["v"])
        n_rows = emb.count()
        w = np.zeros(d + 1)
        loss = None
        for _ in range(LC_ITERS):
            wb = w.copy()

            def partials(batches):
                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = np.array(list(pdf["v"]), dtype=np.float64)
                    X = np.hstack([X, np.ones((len(X), 1))])
                    y = pdf["y"].to_numpy()
                    z = X @ wb
                    p = 1.0 / (1.0 + np.exp(-z))
                    eps = 1e-12
                    ll = -(
                        y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)
                    ).sum()
                    yield pd.DataFrame(
                        {
                            "g": [(X.T @ (p - y)).tolist()],
                            "loss": [float(ll)],
                            "n": [len(X)],
                        }
                    )

            rows = emb.mapInPandas(
                partials, "g array<double>, loss double, n long"
            ).collect()
            n = sum(r["n"] for r in rows)
            g = np.sum([np.array(r["g"]) for r in rows], axis=0) / n
            loss = sum(r["loss"] for r in rows) / n
            w = w - LC_LR * g
        import math

        out.append(
            (
                math.floor(1.0 / frac * 10000 + 0.5) / 10000,
                int(n_rows),
                math.floor(loss * 1e6 + 0.5) / 1e6,
            )
        )
    return spark.createDataFrame(
        out, "fraction double, n long, final_loss double"
    )
