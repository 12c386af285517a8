"""Wave 64: interrupted time series, k-anonymity auditing, scale
reliability, and ranker agreement.

ev_interrupted_ts is the policy-evaluation workhorse (did the metric's
level/slope change at a known intervention date?); ds_k_anonymity is
the privacy audit that must pass before a quasi-identified extract
ships; stat_cronbach_alpha is the internal-consistency reliability
coefficient for multi-item scores; ml_ranker_agreement quantifies how
much two retrieval scorers actually agree (overlap@k + rank
correlation on the intersection) — the diff you read before swapping
rankers in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

ITS_SPLIT_FRAC = 0.5  # intervention at the midpoint of the day range
KANON_K = 5
ALPHA_ITEMS = 8  # first 8 embedding dims as scale items
AGREE_K = 10
AGREE_QUERIES = 8


@query(
    "ev_interrupted_ts",
    oracle="""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS t,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    b AS (SELECT (MIN(t) + MAX(t) + 1) // 2 AS mid FROM d),
    s AS (SELECT CASE WHEN d.t < b.mid THEN 0 ELSE 1 END AS post,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(d.t) AS sx, SUM(d.y) AS sy,
                 SUM(CAST(d.t AS DOUBLE) * d.t) AS sxx, SUM(d.t * d.y) AS sxy
          FROM d CROSS JOIN b GROUP BY 1),
    f AS (SELECT post, n,
                 (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
                 (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                   AS icept,
                 sx / n AS xbar, sy / n AS ybar
          FROM s),
    w AS (SELECT MAX(CASE WHEN post = 0 THEN slope END) AS sl0,
                 MAX(CASE WHEN post = 1 THEN slope END) AS sl1,
                 MAX(CASE WHEN post = 0 THEN icept END) AS ic0,
                 MAX(CASE WHEN post = 1 THEN icept END) AS ic1,
                 MAX(CASE WHEN post = 0 THEN n END) AS n0,
                 MAX(CASE WHEN post = 1 THEN n END) AS n1
          FROM f),
    m AS (SELECT w.*, b.mid FROM w CROSS JOIN b)
    SELECT CAST(n0 AS BIGINT) AS n_pre, CAST(n1 AS BIGINT) AS n_post,
           FLOOR(sl0 * 10000 + 0.5) / 10000 AS slope_pre,
           FLOOR(sl1 * 10000 + 0.5) / 10000 AS slope_post,
           FLOOR((sl1 - sl0) * 10000 + 0.5) / 10000 AS slope_change,
           FLOOR(((ic1 + sl1 * mid) - (ic0 + sl0 * mid)) * 10000 + 0.5)
             / 10000 AS level_change
    FROM m
    """,
)
def ev_interrupted_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time-series analysis of daily event volume with the
    intervention at the range midpoint: independent OLS fits pre/post,
    reporting the slope change and the level change (both lines
    evaluated AT the intervention day — the discontinuity). The
    segmented-regression read of 'did the launch move the metric'.

    Scale: one day rollup, one 2-group sufficient-statistics
    aggregation — two regressions for the price of one shuffle."""
    ev = cat(spark, sf_dir)["events"]
    d = ev.groupBy(
        F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias("t")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    b = d.agg(((F.min("t") + F.max("t") + 1) / 2).cast("long").alias("mid"))
    t, y = F.col("t").cast("double"), F.col("y")
    s = (
        d.join(F.broadcast(b))
        .groupBy((F.col("t") >= F.col("mid")).cast("int").alias("post"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(t).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(t * t).alias("sxx"),
            F.sum(t * y).alias("sxy"),
            F.max("mid").alias("mid"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    f = s.select(
        "post",
        n.alias("n"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("icept"),
        "mid",
    )
    w = f.agg(
        F.max(F.when(F.col("post") == 0, F.col("slope"))).alias("sl0"),
        F.max(F.when(F.col("post") == 1, F.col("slope"))).alias("sl1"),
        F.max(F.when(F.col("post") == 0, F.col("icept"))).alias("ic0"),
        F.max(F.when(F.col("post") == 1, F.col("icept"))).alias("ic1"),
        F.max(F.when(F.col("post") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("post") == 1, F.col("n"))).alias("n1"),
        F.max("mid").alias("mid"),
    )
    sl0, sl1 = F.col("sl0"), F.col("sl1")
    ic0, ic1, mid = F.col("ic0"), F.col("ic1"), F.col("mid")
    return w.select(
        F.col("n0").cast("bigint").alias("n_pre"),
        F.col("n1").cast("bigint").alias("n_post"),
        ratio(sl0).alias("slope_pre"),
        ratio(sl1).alias("slope_post"),
        ratio(sl1 - sl0).alias("slope_change"),
        ratio((ic1 + sl1 * mid) - (ic0 + sl0 * mid)).alias("level_change"),
    )


@query(
    "ds_k_anonymity",
    oracle=f"""
    WITH q AS (SELECT source, lang,
                      CAST(n_chars // 200 AS BIGINT) AS len_bucket
               FROM documents),
    g AS (SELECT source, lang, len_bucket,
                 CAST(COUNT(*) AS BIGINT) AS grp_n
          FROM q GROUP BY 1, 2, 3),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
                 CAST(SUM(CASE WHEN grp_n < {KANON_K} THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_small,
                 CAST(SUM(CASE WHEN grp_n < {KANON_K} THEN grp_n ELSE 0 END)
                      AS BIGINT) AS n_risky_rows,
                 CAST(SUM(grp_n) AS BIGINT) AS n_rows,
                 CAST(MIN(grp_n) AS BIGINT) AS min_group
          FROM g),
    g2 AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS grp_n
           FROM q GROUP BY 1, 2),
    s2 AS (SELECT CAST(MIN(grp_n) AS BIGINT) AS min_group_generalized
           FROM g2)
    SELECT s.n_groups, s.n_small, s.n_risky_rows, s.n_rows, s.min_group,
           CAST(CASE WHEN s.min_group >= {KANON_K} THEN 1 ELSE 0 END
                AS BIGINT) AS k_anonymous,
           s2.min_group_generalized,
           CAST(CASE WHEN s2.min_group_generalized >= {KANON_K}
                THEN 1 ELSE 0 END AS BIGINT) AS k_anon_after_drop
    FROM s CROSS JOIN s2
    """,
)
def ds_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k={k}) over the quasi-identifier tuple
    (source, lang, length-bucket): counts equivalence classes below k,
    the rows they expose, and whether GENERALIZING (dropping the
    finest attribute, the length bucket) restores k-anonymity — the
    release/suppress/generalize decision every quasi-identified
    extract needs before shipping.

    Scale: two group-by rollups on low-cardinality tuples; no
    row-level state survives the first shuffle."""
    docs = cat(spark, sf_dir)["documents"]
    q = docs.select(
        "source",
        "lang",
        F.floor(F.col("n_chars") / 200).cast("bigint").alias("len_bucket"),
    ).localCheckpoint()
    g = q.groupBy("source", "lang", "len_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("grp_n")
    )
    s = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum((F.col("grp_n") < KANON_K).cast("int"))
        .cast("bigint")
        .alias("n_small"),
        F.sum(F.when(F.col("grp_n") < KANON_K, F.col("grp_n")).otherwise(0))
        .cast("bigint")
        .alias("n_risky_rows"),
        F.sum("grp_n").cast("bigint").alias("n_rows"),
        F.min("grp_n").cast("bigint").alias("min_group"),
    )
    s2 = (
        q.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("grp_n"))
        .agg(F.min("grp_n").cast("bigint").alias("min_group_generalized"))
    )
    return s.join(F.broadcast(s2)).select(
        "n_groups",
        "n_small",
        "n_risky_rows",
        "n_rows",
        "min_group",
        (F.col("min_group") >= KANON_K).cast("bigint").alias("k_anonymous"),
        "min_group_generalized",
        (F.col("min_group_generalized") >= KANON_K)
        .cast("bigint")
        .alias("k_anon_after_drop"),
    )


ds_k_anonymity.__doc__ = ds_k_anonymity.__doc__.format(k=KANON_K)


@query(
    "stat_cronbach_alpha",
    oracle=f"""
    WITH x AS (SELECT vec_id,
                      {", ".join(
                          f"CAST(embedding[{i + 1}] AS DOUBLE) AS x{i}"
                          for i in range(ALPHA_ITEMS)
                      )},
                      ({" + ".join(
                          f"CAST(embedding[{i + 1}] AS DOUBLE)"
                          for i in range(ALPHA_ITEMS)
                      )}) AS tot
               FROM embeddings),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 {", ".join(
                     f"(SUM(x{i} * x{i}) - SUM(x{i}) * SUM(x{i}) / COUNT(*))"
                     f" / (COUNT(*) - 1) AS v{i}"
                     for i in range(ALPHA_ITEMS)
                 )},
                 (SUM(tot * tot) - SUM(tot) * SUM(tot) / COUNT(*))
                   / (COUNT(*) - 1) AS vt
          FROM x)
    SELECT CAST(n AS BIGINT) AS n_items_scored,
           {ALPHA_ITEMS} AS k_items,
           FLOOR(({ALPHA_ITEMS} / ({ALPHA_ITEMS} - 1.0))
                 * (1.0 - ({" + ".join(f"v{i}" for i in range(ALPHA_ITEMS))})
                          / vt) * 10000 + 0.5) / 10000 AS alpha
    FROM s
    """,
)
def stat_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's α over the first {k} embedding dimensions treated as
    scale items: α = k/(k−1)·(1 − Σ item variances / total-score
    variance) — the internal-consistency reliability read for any
    multi-item score (survey scales, ensembled heuristic scores,
    multi-judge ratings).

    Scale: one pass of item + total sufficient statistics — {k}+1
    variance terms from a single aggregation."""
    emb = cat(spark, sf_dir)["embeddings"]
    items = [
        F.element_at("embedding", i + 1).cast("double").alias(f"x{i}")
        for i in range(ALPHA_ITEMS)
    ]
    x = emb.select(*items)
    tot = sum((F.col(f"x{i}") for i in range(1, ALPHA_ITEMS)), F.col("x0"))
    x = x.withColumn("tot", tot)
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for i in range(ALPHA_ITEMS):
        c = F.col(f"x{i}")
        aggs.append(F.sum(c).alias(f"s{i}"))
        aggs.append(F.sum(c * c).alias(f"q{i}"))
    aggs.append(F.sum("tot").alias("st"))
    aggs.append(F.sum(F.col("tot") * F.col("tot")).alias("qt"))
    s = x.agg(*aggs)
    n = F.col("n")
    var_sum = None
    for i in range(ALPHA_ITEMS):
        v = (F.col(f"q{i}") - F.col(f"s{i}") * F.col(f"s{i}") / n) / (n - 1)
        var_sum = v if var_sum is None else var_sum + v
    vt = (F.col("qt") - F.col("st") * F.col("st") / n) / (n - 1)
    alpha = (ALPHA_ITEMS / (ALPHA_ITEMS - 1.0)) * (1.0 - var_sum / vt)
    return s.select(
        n.cast("bigint").alias("n_items_scored"),
        F.lit(ALPHA_ITEMS).alias("k_items"),
        ratio(alpha).alias("alpha"),
    )


stat_cronbach_alpha.__doc__ = stat_cronbach_alpha.__doc__.format(
    k=ALPHA_ITEMS
)


@query(
    "ml_ranker_agreement",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < {AGREE_QUERIES}),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id >= {AGREE_QUERIES}),
    sc AS (SELECT q.q_id, c.vec_id,
                  FLOOR(list_cosine_similarity(c.v, q.qv) * 10000 + 0.5)
                    / 10000 AS s_cos,
                  FLOOR(list_dot_product(c.v, q.qv) * 10000 + 0.5) / 10000
                    AS s_dot
           FROM q CROSS JOIN c),
    ra AS (SELECT q_id, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY s_cos DESC, vec_id) AS rn
           FROM sc),
    rb AS (SELECT q_id, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY s_dot DESC, vec_id) AS rn
           FROM sc),
    ta AS (SELECT q_id, vec_id, rn FROM ra WHERE rn <= {AGREE_K}),
    tb AS (SELECT q_id, vec_id, rn FROM rb WHERE rn <= {AGREE_K}),
    ov AS (SELECT ta.q_id, CAST(COUNT(*) AS DOUBLE) AS common,
                  SUM((ta.rn - tb.rn) * (ta.rn - tb.rn)) AS d2
           FROM ta JOIN tb ON ta.q_id = tb.q_id AND ta.vec_id = tb.vec_id
           GROUP BY 1)
    SELECT q_id,
           FLOOR(COALESCE(common, 0) / {AGREE_K} * 10000 + 0.5) / 10000
             AS overlap_at_k,
           CAST(COALESCE(common, 0) AS BIGINT) AS n_common,
           FLOOR(CASE WHEN common >= 2
                 THEN 1.0 - 6.0 * d2 / (common * (common * common - 1))
                 ELSE 0.0 END * 10000 + 0.5) / 10000 AS spearman_common
    FROM ov
    """,
)
def ml_ranker_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement between two rankers (cosine vs raw dot product — the
    normalization difference is exactly what an anisotropic embedding
    space exposes): per query, overlap@{k} of their top-{k} lists and
    the Spearman correlation of ranks on the common items. The diff
    report you read before swapping scorers in production retrieval.

    Scale: queries broadcast, both scores computed in the SAME
    corpus pass, per-query windows over {k}-row shortlists pruned by
    the two-phase pattern at scale."""
    from mister_spark.functions.vectors import dot as vdot, norm as vnorm

    emb = cat(spark, sf_dir)["embeddings"]
    q = emb.filter(F.col("vec_id") < AGREE_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c = emb.filter(F.col("vec_id") >= AGREE_QUERIES).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    sc = c.join(F.broadcast(q)).select(
        "q_id",
        "vec_id",
        ratio(vdot("v", "qv") / (vnorm("v") * vnorm("qv"))).alias("s_cos"),
        ratio(vdot("v", "qv")).alias("s_dot"),
    ).localCheckpoint()
    wa = W.partitionBy("q_id").orderBy(F.desc("s_cos"), "vec_id")
    wb = W.partitionBy("q_id").orderBy(F.desc("s_dot"), "vec_id")
    ta = sc.withColumn("rn", F.row_number().over(wa)).filter(
        F.col("rn") <= AGREE_K
    ).select("q_id", "vec_id", "rn")
    tb = sc.withColumn("rn", F.row_number().over(wb)).filter(
        F.col("rn") <= AGREE_K
    ).select("q_id", "vec_id", F.col("rn").alias("rnb"))
    ov = ta.join(tb, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).cast("double").alias("common"),
        F.sum(
            (F.col("rn") - F.col("rnb")) * (F.col("rn") - F.col("rnb"))
        ).alias("d2"),
    )
    common, d2 = F.col("common"), F.col("d2")
    return ov.select(
        "q_id",
        ratio(common / AGREE_K).alias("overlap_at_k"),
        common.cast("bigint").alias("n_common"),
        ratio(
            F.when(
                common >= 2,
                1.0 - 6.0 * d2 / (common * (common * common - 1)),
            ).otherwise(0.0)
        ).alias("spearman_common"),
    )


ml_ranker_agreement.__doc__ = ml_ranker_agreement.__doc__.format(k=AGREE_K)
