"""Wave 105: two-stage retrieval, session co-occurrence lift, and
text-hygiene auditing.

sim_two_stage_rank is the production retrieval shape — a cheap BM25
candidate stage feeding an embedding-cosine re-ranker — evaluated
with the same self-retrieval protocol as ds_rag_eval so the two
stages' contributions are measurable; ev_session_cooccurrence mines
which event types co-occur within the same session with lift vs
independence — market-basket analysis at the action level;
tx_encoding_audit counts the text-hygiene defects (control chars,
CR/LF mixtures, null bytes, replacement chars, leading/trailing
whitespace) that silently poison tokenizers — and PROVES a clean
corpus clean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, bigrams, tokens
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

TS_EVERY = 29  # query sampling (mirrors ds_rag_eval)
TS_PREFIX = 8
TS_STAGE1_K = 25  # BM25 candidates
TS_K = 5
BM25_K1, BM25_B = 1.2, 0.75
SESSION_GAP_US = 30 * 60 * 1_000_000


@query(
    "sim_two_stage_rank",
    # Real oracle: stage 1 is the ds_rag_eval BM25 SQL; stage 2 joins
    # the candidates to their (id % 500) vectors and re-ranks by a
    # sequential-fold cosine (list_reduce = Spark's aggregate fold
    # order), with both top-K windows tie-broken on doc_id.
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
                 unnest(list_distinct(bg[1:{TS_PREFIX}])) AS term
          FROM b2 WHERE doc_id % {TS_EVERY} = 0),
    s1 AS (SELECT q.q_id, tf.doc_id,
                  SUM(LN((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
                      * (tf.tf * ({BM25_K1} + 1))
                      / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                         + {BM25_B} * tf.dl / s.avgdl))) AS bm25
           FROM q JOIN tf ON q.term = tf.term
                JOIN dfreq d ON d.term = q.term
                CROSS JOIN stats s
           GROUP BY 1, 2),
    cand AS (SELECT q_id, doc_id FROM (
               SELECT q_id, doc_id,
                      ROW_NUMBER() OVER (PARTITION BY q_id
                                         ORDER BY bm25 DESC, doc_id)
                        AS rk1
               FROM s1) w WHERE rk1 <= {TS_STAGE1_K}),
    ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings),
    s2 AS (SELECT c.q_id, c.doc_id,
                  list_reduce(list_prepend(CAST(0 AS DOUBLE),
                    list_transform(range(1, len(a.v) + 1),
                                   i -> a.v[i] * b.v[i])),
                    (x, y) -> x + y)
                  / (SQRT(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list_transform(a.v, x -> x * x)), (x, y) -> x + y))
                     * SQRT(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                         list_transform(b.v, x -> x * x)),
                         (x, y) -> x + y)) + 1e-12) AS cos
           FROM cand c JOIN ev a ON a.vec_id = c.q_id % 500
                       JOIN ev b ON b.vec_id = c.doc_id % 500),
    fin AS (SELECT q_id, doc_id FROM (
              SELECT q_id, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY q_id
                                        ORDER BY cos DESC, doc_id) AS rk2
              FROM s2) w WHERE rk2 <= {TS_K}),
    perq AS (SELECT c.q_id,
                    MAX(CASE WHEN c.doc_id = c.q_id THEN 1 ELSE 0 END)
                      AS s1_hit
             FROM cand c GROUP BY 1),
    perq2 AS (SELECT f.q_id,
                     MAX(CASE WHEN f.doc_id = f.q_id THEN 1 ELSE 0 END)
                       AS s2_hit
              FROM fin f GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           FLOOR(AVG(p1.s1_hit) * 10000 + 0.5) / 10000 AS stage1_recall,
           FLOOR(AVG(p2.s2_hit) * 10000 + 0.5) / 10000 AS final_hit_at_k
    FROM perq p1 JOIN perq2 p2 ON p1.q_id = p2.q_id
    """,
)
def sim_two_stage_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: BM25 (bigram inverted index) proposes
    {k1} candidates per query, then an embedding-cosine re-ranker
    (query doc's paired vector vs candidates' vectors) orders the
    final top-{k}. Scored with the ds_rag_eval self-retrieval
    protocol, reporting stage-1 recall@{k1} (the ceiling stage 2
    inherits) AND final hit@{k} — the split that tells you WHICH
    stage to fix.

    Scale: stage 1 is the candidate-bounded inverted-index join;
    stage 2 scores only |queries|×{k1} pairs via an equi-join to the
    embeddings (never a corpus scan); both top-k windows partition by
    query."""
    docs = cat(spark, sf_dir)["documents"]
    emb = cat(spark, sf_dir)["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bg = bigrams(tokens())
    base = (
        docs.select("doc_id", bg.alias("toks"), F.size(bg).alias("dl"))
        .filter(F.col("dl") > 0)
        .localCheckpoint()
    )
    n_docs = base.count()
    avgdl = base.agg(F.avg("dl")).collect()[0][0]
    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    queries = base.filter(F.col("doc_id") % TS_EVERY == 0).select(
        F.col("doc_id").alias("q_id"),
        F.explode(F.array_distinct(F.slice("toks", 1, TS_PREFIX))).alias(
            "term"
        ),
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    s1 = (
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
        .agg(F.sum("s").alias("bm25"))
    )
    w1 = W.partitionBy("q_id").orderBy(F.col("bm25").desc(), "doc_id")
    cand = (
        s1.withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= TS_STAGE1_K)
        .localCheckpoint()
    )
    # stage-2: cosine between the query doc's vector and candidates'
    qv = emb.select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    cv = emb.select(F.col("vec_id").alias("doc_id"), F.col("v").alias("cv"))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda a, b: a + b
        )
    )
    s2 = (
        cand.withColumn("q_vec", (F.col("q_id") % 500))
        .withColumn("c_vec", (F.col("doc_id") % 500))
        .join(qv.withColumnRenamed("q_id", "q_vec"), "q_vec")
        .join(cv.withColumnRenamed("doc_id", "c_vec"), "c_vec")
        .withColumn(
            "cos", dot / (nrm(F.col("qv")) * nrm(F.col("cv")) + 1e-12)
        )
    )
    w2 = W.partitionBy("q_id").orderBy(F.col("cos").desc(), "doc_id")
    final = s2.withColumn("rk2", F.row_number().over(w2)).filter(
        F.col("rk2") <= TS_K
    )
    per_q = (
        cand.groupBy("q_id")
        .agg(
            F.max(
                F.when(F.col("doc_id") == F.col("q_id"), 1).otherwise(0)
            ).alias("s1_hit")
        )
        .join(
            final.groupBy("q_id").agg(
                F.max(
                    F.when(F.col("doc_id") == F.col("q_id"), 1).otherwise(0)
                ).alias("s2_hit")
            ),
            "q_id",
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        ratio(F.avg("s1_hit")).alias("stage1_recall"),
        ratio(F.avg("s2_hit")).alias("final_hit_at_k"),
    )


sim_two_stage_rank.__doc__ = sim_two_stage_rank.__doc__.format(
    k1=TS_STAGE1_K, k=TS_K
)


@query(
    "ev_session_cooccurrence",
    oracle=f"""
    WITH t AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id
               FROM events),
    flagged AS (
      SELECT user_id, event_type, tus, event_id,
             CASE WHEN tus - LAG(tus) OVER (PARTITION BY user_id
                                            ORDER BY tus, event_id)
                       > {SESSION_GAP_US}
                  OR LAG(tus) OVER (PARTITION BY user_id
                                    ORDER BY tus, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM t),
    sess AS (
      SELECT user_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged),
    su AS (SELECT DISTINCT user_id, sess_id, event_type FROM sess),
    ns AS (SELECT CAST(COUNT(DISTINCT user_id || '-' || sess_id) AS DOUBLE)
             AS n
           FROM su),
    pres AS (SELECT event_type,
                    CAST(COUNT(*) AS DOUBLE) AS c
             FROM su GROUP BY 1),
    pair AS (SELECT a.event_type AS ta, b.event_type AS tb,
                    CAST(COUNT(*) AS DOUBLE) AS both
             FROM su a JOIN su b
               ON a.user_id = b.user_id AND a.sess_id = b.sess_id
              AND a.event_type < b.event_type
             GROUP BY 1, 2)
    SELECT pair.ta, pair.tb,
           CAST(pair.both AS BIGINT) AS sessions_both,
           FLOOR(pair.both * ns.n / (pa.c * pb.c) * 10000 + 0.5) / 10000
             AS lift
    FROM pair
    JOIN pres pa ON pair.ta = pa.event_type
    JOIN pres pb ON pair.tb = pb.event_type, ns
    """,
)
def ev_session_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level action co-occurrence with lift: for each event
    type pair, in how many sessions both appear and the lift
    P(both)/(P(a)·P(b)) — above 1 the actions travel together, below
    1 they repel (distinct user modes). The action-level
    market-basket read.

    Scale: the sessionize exchange builds distinct (session, type)
    presence rows; the pair join is per-session local (≤|types| rows
    per session) and collapses to a |types|² matrix; lift needs only
    broadcast margins."""
    ev = cat(spark, sf_dir)["events"]
    t = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = t.withColumn(
        "new_sess",
        F.when(
            (F.col("tus") - F.lag("tus").over(w) > SESSION_GAP_US)
            | F.lag("tus").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    su = sess.select("user_id", "sess_id", "event_type").distinct().localCheckpoint()
    ns = su.select("user_id", "sess_id").distinct().count()
    pres = su.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    a = su.select("user_id", "sess_id", F.col("event_type").alias("ta"))
    b = su.select("user_id", "sess_id", F.col("event_type").alias("tb"))
    pair = (
        a.join(b, ["user_id", "sess_id"])
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("double").alias("both"))
    )
    return (
        pair.join(
            F.broadcast(pres.select(F.col("event_type").alias("ta"),
                                    F.col("c").alias("ca"))), "ta"
        )
        .join(
            F.broadcast(pres.select(F.col("event_type").alias("tb"),
                                    F.col("c").alias("cb"))), "tb"
        )
        .select(
            "ta",
            "tb",
            F.col("both").cast("bigint").alias("sessions_both"),
            ratio(
                F.col("both") * F.lit(float(ns)) / (F.col("ca") * F.col("cb"))
            ).alias("lift"),
        )
    )


@query(
    "tx_encoding_audit",
    oracle="""
    WITH t AS (SELECT source, text,
                      CASE WHEN regexp_matches(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')
                           THEN 1 ELSE 0 END AS has_ctrl,
                      CASE WHEN text LIKE chr(13) || '%'
                             OR text LIKE '%' || chr(13) || '%'
                           THEN 1 ELSE 0 END AS has_cr,
                      CASE WHEN strpos(text, chr(65533)) > 0
                           THEN 1 ELSE 0 END AS has_replacement,
                      CASE WHEN text <> trim(text) THEN 1 ELSE 0 END
                        AS has_edge_ws
               FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(has_ctrl) AS BIGINT) AS ctrl_chars,
           CAST(SUM(has_cr) AS BIGINT) AS carriage_returns,
           CAST(SUM(has_replacement) AS BIGINT) AS replacement_chars,
           CAST(SUM(has_edge_ws) AS BIGINT) AS edge_whitespace
    FROM t GROUP BY 1
    """,
)
def tx_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-hygiene audit per source: control characters, carriage
    returns, U+FFFD replacement characters (the scar of a bad decode
    upstream), and leading/trailing whitespace — each a defect class
    that silently degrades tokenizers. All-zero on this corpus is the
    expected AND PROVEN state; any nonzero names the source to fix.

    Scale: four narrow JVM predicates + one |sources|-row rollup —
    the audit costs one scan."""
    docs = cat(spark, sf_dir)["documents"]
    has_ctrl = (
        F.regexp_count("text", F.lit(r"[\x00-\x08\x0B\x0C\x0E-\x1F]")) > 0
    ).cast("long")
    has_cr = F.col("text").contains("\r").cast("long")
    has_repl = F.col("text").contains("�").cast("long")
    has_ws = (F.col("text") != F.trim(F.col("text"))).cast("long")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs"),
        F.sum(has_ctrl).cast("bigint").alias("ctrl_chars"),
        F.sum(has_cr).cast("bigint").alias("carriage_returns"),
        F.sum(has_repl).cast("bigint").alias("replacement_chars"),
        F.sum(has_ws).cast("bigint").alias("edge_whitespace"),
    )
