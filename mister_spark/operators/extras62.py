"""Wave 62: shrinkage estimation, phrase retrieval, mergeable sampling,
and incremental dedup.

stat_eb_shrinkage is empirical-Bayes rate estimation (small sources
borrow strength from the corpus prior — the fix for league-table
noise); tx_phrase_search upgrades the inverted index to POSITIONAL
(exact phrase queries, the IR feature term-level boolean search can't
fake); sketch_bottomk_sample is the mergeable uniform sample (bottom-k
by hash priority — partition-local bottom-k's merge losslessly, the
property reservoir sampling lacks); dd_incremental is the nightly-batch
dedup job: screen NEW documents against the existing corpus, with
per-reason keep/drop accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens, trigrams
from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

PHRASE = ("scan", "key")  # the 2-token query phrase
BK_K = 100  # bottom-k sample size
INC_MOD = 10  # doc_id % 10 == 9 -> "new batch", else corpus
INC_JACCARD = 0.5  # near-dup threshold for the incremental screen


@query(
    "stat_eb_shrinkage",
    oracle="""
    WITH u AS (SELECT user_id, source FROM (
                 SELECT e.user_id,
                        'src' || CAST(e.user_id % 20 AS VARCHAR) AS source
                 FROM (SELECT DISTINCT user_id FROM events) e)),
    s AS (SELECT u.source, CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(conv) AS DOUBLE) AS k
          FROM u JOIN (SELECT user_id,
                              MAX(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END) AS conv
                       FROM events GROUP BY 1) c
            ON u.user_id = c.user_id
          GROUP BY 1),
    g AS (SELECT SUM(k) / SUM(n) AS mu,
                 AVG(k / n) AS rbar,
                 (SUM((k / n - (SELECT AVG(k2.k / k2.n) FROM s k2))
                      * (k / n - (SELECT AVG(k3.k / k3.n) FROM s k3)))
                  / (COUNT(*) - 1)) AS varr,
                 AVG(n) AS nbar
          FROM s),
    p AS (SELECT mu,
                 CASE WHEN varr > mu * (1 - mu) / nbar
                      THEN mu * (1 - mu)
                           / (varr - mu * (1 - mu) / nbar) - 1
                      ELSE 50.0 END AS m
          FROM g)
    SELECT s.source, CAST(s.n AS BIGINT) AS n_users,
           FLOOR(s.k / s.n * 10000 + 0.5) / 10000 AS rate_raw,
           FLOOR((s.k + p.m * p.mu) / (s.n + p.m) * 10000 + 0.5) / 10000
             AS rate_shrunk,
           FLOOR(p.m * 10000 + 0.5) / 10000 AS prior_strength
    FROM s CROSS JOIN p
    """,
)
def stat_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-segment conversion rates
    (segments = user_id % 20 cohorts): the beta-binomial prior strength
    m comes from moment-matching the between-segment variance against
    binomial sampling noise, and each segment's rate shrinks to
    (k + m·μ)/(n + m) — small segments pull hard toward the corpus
    rate, big ones barely move. The league-table fix.

    Scale: one user rollup, one |segments| rollup, the prior is a
    1-row broadcast."""
    ev = cat(spark, sf_dir)["events"]
    conv = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    s = conv.groupBy(
        F.concat(F.lit("src"), (F.col("user_id") % 20).cast("string")).alias(
            "source"
        )
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("conv").cast("double").alias("k"),
    ).localCheckpoint()
    r = F.col("k") / F.col("n")
    g1 = s.agg(F.avg(r).alias("rbar"))
    g = s.join(F.broadcast(g1)).agg(
        (F.sum("k") / F.sum("n")).alias("mu"),
        (
            F.sum((r - F.col("rbar")) * (r - F.col("rbar")))
            / (F.count(F.lit(1)) - 1)
        ).alias("varr"),
        F.avg("n").alias("nbar"),
        F.first("rbar").alias("rbar"),
    )
    mu, varr, nbar = F.col("mu"), F.col("varr"), F.col("nbar")
    m = F.when(
        varr > mu * (1 - mu) / nbar,
        mu * (1 - mu) / (varr - mu * (1 - mu) / nbar) - 1,
    ).otherwise(50.0)
    p = g.select(mu.alias("mu"), m.alias("m"))
    return s.join(F.broadcast(p)).select(
        "source",
        F.col("n").cast("bigint").alias("n_users"),
        ratio(F.col("k") / F.col("n")).alias("rate_raw"),
        ratio((F.col("k") + F.col("m") * F.col("mu")) / (F.col("n") + F.col("m"))).alias(
            "rate_shrunk"
        ),
        ratio(F.col("m")).alias("prior_strength"),
    )


@query(
    "tx_phrase_search",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    p AS (SELECT doc_id, u.i AS pos, toks[u.i] AS term
          FROM t, unnest(generate_series(1, len(toks))) AS u(i)),
    a AS (SELECT doc_id, pos FROM p WHERE term = '{PHRASE[0]}'),
    b AS (SELECT doc_id, pos FROM p WHERE term = '{PHRASE[1]}'),
    hits AS (SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
                    CAST(MIN(a.pos) AS BIGINT) AS first_pos
             FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
             GROUP BY 1)
    SELECT doc_id, n_hits, first_pos FROM hits
    """,
)
def tx_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ('{p0} {p1}') over a POSITIONAL inverted
    index: per-term posting lists carry token positions, and the
    phrase match is an equi-join on (doc, pos+1) — the construction
    that separates a search engine from a bag-of-words filter
    (tx_boolean_search is the term-level sibling; tx_inverted_index
    the non-positional one).

    Scale: posting lists are (term, doc, pos) rows filtered to the
    query terms BEFORE any join — the join touches only the two terms'
    postings, never the corpus; adjacency is an equi-join key
    (pos + 1), not an inequality."""
    docs = cat(spark, sf_dir)["documents"]
    p = docs.select(
        "doc_id", F.posexplode(tokens()).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    a = p.filter(F.col("term") == PHRASE[0]).select("doc_id", "pos")
    b = p.filter(F.col("term") == PHRASE[1]).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        a.join(b, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
            F.min("pos").cast("bigint").alias("first_pos"),
        )
    )


tx_phrase_search.__doc__ = tx_phrase_search.__doc__.format(
    p0=PHRASE[0], p1=PHRASE[1]
)


@query(
    "sketch_bottomk_sample",
    oracle=f"""
    WITH h AS (SELECT o_orderkey,
                      (o_orderkey * 1000003 + 12345) % 2147483647 AS pri
               FROM orders),
    k AS (SELECT o_orderkey, pri,
                 ROW_NUMBER() OVER (ORDER BY pri, o_orderkey) AS rn
          FROM h)
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(pri AS BIGINT) AS pri
    FROM k WHERE rn <= {BK_K}
    """,
)
def sketch_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable uniform sample via bottom-k hash priorities: each row
    draws a deterministic integer priority, the sample is the k
    smallest. Unlike reservoir sampling, bottom-k MERGES losslessly —
    bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)) — so every
    partition prunes locally and the shuffle carries ≤ k rows per
    partition (TakeOrdered, no global sort). Same priorities on any
    cluster layout → the same sample, the reproducibility property
    data pipelines actually need.

    Scale: narrow map + TakeOrderedAndProject; no full sort, no
    data-sized shuffle."""
    orders = cat(spark, sf_dir)["orders"]
    h = orders.select(
        "o_orderkey",
        ((F.col("o_orderkey") * 1000003 + 12345) % 2147483647).alias("pri"),
    )
    return (
        h.orderBy("pri", "o_orderkey")
        .limit(BK_K)
        .select(
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.col("pri").cast("bigint").alias("pri"),
        )
    )


_INC_TRI = (
    "list_distinct(list_transform(generate_series(1, len(toks) - 2), "
    "i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))"
)


@query(
    "dd_incremental",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks, text FROM documents),
    corp AS (SELECT * FROM t WHERE doc_id % {INC_MOD} <> {INC_MOD - 1}),
    batch AS (SELECT * FROM t WHERE doc_id % {INC_MOD} = {INC_MOD - 1}),
    exact AS (SELECT DISTINCT b.doc_id
              FROM batch b JOIN corp c ON b.text = c.text),
    bt AS (SELECT doc_id, unnest({_INC_TRI}) AS g FROM batch
           WHERE len(toks) >= 3),
    ct AS (SELECT DISTINCT g FROM (SELECT unnest({_INC_TRI}) AS g
                                   FROM corp WHERE len(toks) >= 3)),
    ov AS (SELECT bt.doc_id,
                  CAST(SUM(CASE WHEN ct.g IS NOT NULL THEN 1 ELSE 0 END)
                       AS DOUBLE) AS hit,
                  CAST(COUNT(*) AS DOUBLE) AS tot
           FROM bt LEFT JOIN ct ON bt.g = ct.g GROUP BY 1),
    cls AS (SELECT b.doc_id,
                   CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                        WHEN ov.hit / ov.tot >= {INC_JACCARD}
                          THEN 'near_dup'
                        ELSE 'unique' END AS verdict
            FROM batch b
            LEFT JOIN exact e ON b.doc_id = e.doc_id
            LEFT JOIN ov ON b.doc_id = ov.doc_id)
    SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM cls GROUP BY 1
    """,
)
def dd_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup screen — the nightly ingest job: NEW documents
    (doc_id ≡ {nb} mod {m}) check against the existing corpus first by
    exact text equality, then by trigram containment ≥ {j} against the
    corpus shingle set, and land in exact_dup / near_dup / unique
    buckets. The point at 100 TB: the batch is small, so every join
    puts the BATCH on the broadcast/build side and the corpus is
    touched once, streaming — no corpus self-join ever runs.

    Scale: corpus-side work is one distinct-shingle pass (vocab-sized
    dedup); batch-side joins are batch-sized; verdicts are 3 rows."""
    docs = cat(spark, sf_dir)["documents"]
    t = docs.select("doc_id", "text", tokens().alias("toks"))
    is_batch = F.col("doc_id") % INC_MOD == INC_MOD - 1
    corp = t.filter(~is_batch)
    batch = t.filter(is_batch).localCheckpoint()
    exact = (
        batch.join(
            corp.select(F.col("text").alias("ctext")),
            batch["text"] == F.col("ctext"),
            "left_semi",
        )
        .select("doc_id")
        .distinct()
        .withColumn("ex", F.lit(1))
    )
    bt = batch.filter(F.size("toks") >= 3).select(
        "doc_id", F.explode(trigrams(F.col("toks"))).alias("g")
    ).dropDuplicates(["doc_id", "g"])
    ct = (
        corp.filter(F.size("toks") >= 3)
        .select(F.explode(trigrams(F.col("toks"))).alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ov = (
        bt.join(ct, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).cast("double").alias("hit"),
            F.count(F.lit(1)).cast("double").alias("tot"),
        )
    )
    cls = (
        batch.select("doc_id")
        .join(F.broadcast(exact), "doc_id", "left")
        .join(ov, "doc_id", "left")
        .select(
            F.when(F.col("ex").isNotNull(), "exact_dup")
            .when(F.col("hit") / F.col("tot") >= INC_JACCARD, "near_dup")
            .otherwise("unique")
            .alias("verdict")
        )
    )
    return cls.groupBy("verdict").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


dd_incremental.__doc__ = dd_incremental.__doc__.format(
    nb=INC_MOD - 1, m=INC_MOD, j=INC_JACCARD
)
