"""Wave 215: positive-FDR q-values and prevalence-robust agreement.

stat_storey_qvalue runs one two-sample z-test per part brand (brand
revenue-per-item vs everything else), estimates the null fraction
pi0 = #{p > 0.5} / (0.5 m) from the flat tail of the p-value
histogram, and converts each p into Storey's q-value — the minimum
positive FDR at which that brand would be called. stat_bh_fdr
controls FDR assuming ALL hypotheses are null (pi0 = 1); Storey's
pi0 < 1 refunds the power BH leaves on the table when many effects
are real. stat_gwet_ac1 is Gwet's AC1 agreement between two integer-
exact curation heuristics, reported NEXT TO Cohen's kappa on the
same table: when both raters keep ~90% of documents, kappa collapses
toward 0 (the prevalence paradox) while AC1 stays interpretable —
the number to trust when the rating distribution is skewed.

Exactness: per-brand sufficient statistics are one grouped pass,
complements are global-minus-group sums, the z/p closed forms and
the rank/cummin q-value sweep run on the brand-bounded frame, and
every AC1/kappa cell is an integer count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

STOREY_LAMBDA = 0.5  # null-tail cut for the pi0 estimate
Q_CALL = 0.1  # discovery threshold reported
AC1_MIN_TOKENS = 50  # rater A: keep iff tokens >= this
AC1_DISTINCT_PCT = 60  # rater B: keep iff 100*distinct >= this*tokens


@query(
    "stat_storey_qvalue",
    # Real oracle: per-brand and complement sums are exact, the
    # Welch z and its two-sided tail are shared closed forms, pi0 is
    # an integer-count ratio, and the q-value cummin runs over the
    # same (rounded p, brand) total order in both engines.
    oracle=f"""
    WITH j AS (SELECT p.p_brand AS brand,
                      l.l_extendedprice * (1 - l.l_discount) AS rev
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    g AS (SELECT brand, CAST(COUNT(*) AS DOUBLE) AS n, SUM(rev) AS s,
                 SUM(rev * rev) AS ss
          FROM j GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tn, SUM(s) AS ts,
                 SUM(ss) AS tss FROM g),
    z AS (SELECT g.brand, g.n,
                 g.s / g.n AS m1, (t.ts - g.s) / (t.tn - g.n) AS m2,
                 (g.ss - g.s * g.s / g.n) / (g.n - 1) AS v1,
                 ((t.tss - g.ss) - (t.ts - g.s) * (t.ts - g.s)
                  / (t.tn - g.n)) / (t.tn - g.n - 1) AS v2,
                 t.tn - g.n AS n2
          FROM g, t),
    p AS (SELECT brand, CAST(n AS BIGINT) AS n_items,
                 FLOOR(2 * {normal_sf_sql(
                     "ABS((m1 - m2) / SQRT(v1 / n + v2 / n2))"
                 )} * 1e6 + 0.5) / 1e6 AS p_value
          FROM z),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(CASE WHEN p_value > {STOREY_LAMBDA}
                          THEN 1 ELSE 0 END) AS BIGINT) AS tail
          FROM p),
    pi AS (SELECT m, LEAST(1.0, tail / ((1 - {STOREY_LAMBDA}) * m))
                    AS pi0 FROM m),
    r AS (SELECT p.*, pi.m, pi.pi0,
                 ROW_NUMBER() OVER (ORDER BY p_value, brand) AS rk
          FROM p, pi),
    q AS (SELECT r.*,
                 MIN(pi0 * m * p_value / rk) OVER (
                   ORDER BY rk DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS qraw
          FROM r)
    SELECT brand, n_items, p_value,
           FLOOR(LEAST(qraw, 1.0) * 1e6 + 0.5) / 1e6 AS q_value,
           FLOOR(pi0 * 1e4 + 0.5) / 1e4 AS pi0,
           CAST(CASE WHEN FLOOR(LEAST(qraw, 1.0) * 1e6 + 0.5) / 1e6
                < {Q_CALL} THEN 1 ELSE 0 END AS BIGINT) AS discovery
    FROM q
    """,
)
def stat_storey_qvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storey q-values over one z-test per part brand (brand revenue
    per item vs the complement): pi0 = #{{p > {lam}}} / ({lam} m)
    reads the flat tail of the p histogram as the null fraction, and
    q_i = min over j >= i of pi0 * m * p_j / j is the smallest
    positive FDR at which brand i is called. With pi0 near 1 this IS
    Benjamini-Hochberg; when many brands genuinely differ, pi0 < 1
    buys back the power BH forfeits. The discovery flag applies the
    q < {qc} operating point.

    Scale: ONE fact-scan grouped pass for the per-brand sufficient
    statistics (complement = broadcast global minus group — no second
    scan), then the rank/cummin sweep on the brand-bounded frame (the
    documented model-sized carry)."""
    j = (
        cat(spark, sf_dir)["lineitem"]
        .join(
            F.broadcast(
                cat(spark, sf_dir)["part"].select(
                    "p_partkey", F.col("p_brand").alias("brand")
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "brand",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            ),
        )
    )
    g = j.groupBy("brand").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rev").alias("s"),
        F.sum(F.col("rev") * F.col("rev")).alias("ss"),
    ).localCheckpoint()  # brand-bounded; feeds totals + tests
    t = g.agg(
        F.sum("n").alias("tn"), F.sum("s").alias("ts"),
        F.sum("ss").alias("tss"),
    )
    z = g.crossJoin(F.broadcast(t)).select(
        "brand", "n",
        (F.col("s") / F.col("n")).alias("m1"),
        ((F.col("ts") - F.col("s")) / (F.col("tn") - F.col("n"))).alias("m2"),
        (
            (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("v1"),
        (
            (
                (F.col("tss") - F.col("ss"))
                - (F.col("ts") - F.col("s"))
                * (F.col("ts") - F.col("s"))
                / (F.col("tn") - F.col("n"))
            )
            / (F.col("tn") - F.col("n") - 1)
        ).alias("v2"),
        (F.col("tn") - F.col("n")).alias("n2"),
    )
    zs = F.abs(
        (F.col("m1") - F.col("m2"))
        / F.sqrt(F.col("v1") / F.col("n") + F.col("v2") / F.col("n2"))
    )
    p = z.select(
        "brand",
        F.col("n").cast("bigint").alias("n_items"),
        rnd(2 * normal_sf(zs), 6).alias("p_value"),
    ).localCheckpoint()  # feeds pi0 + the rank sweep
    m = p.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(
            F.when(F.col("p_value") > STOREY_LAMBDA, 1).otherwise(0)
        ).alias("tail"),
    )
    pi = m.select(
        "m",
        F.least(
            F.lit(1.0),
            F.col("tail") / ((1 - STOREY_LAMBDA) * F.col("m")),
        ).alias("pi0"),
    )
    r = p.crossJoin(F.broadcast(pi)).withColumn(
        "rk", F.row_number().over(W.orderBy("p_value", "brand"))
    )
    # brand-bounded frame: the unpartitioned windows run on <= |brands|
    q = r.withColumn(
        "qraw",
        F.min(F.col("pi0") * F.col("m") * F.col("p_value") / F.col("rk")).over(
            W.orderBy(F.col("rk").desc()).rowsBetween(
                W.unboundedPreceding, 0
            )
        ),
    )
    qv = rnd(F.least(F.col("qraw"), F.lit(1.0)), 6)
    return q.select(
        "brand", "n_items", "p_value",
        qv.alias("q_value"),
        rnd(F.col("pi0"), 4).alias("pi0"),
        F.when(qv < Q_CALL, 1).otherwise(0).cast("bigint").alias("discovery"),
    )


stat_storey_qvalue.__doc__ = stat_storey_qvalue.__doc__.format(
    lam=STOREY_LAMBDA, qc=Q_CALL
)


@query(
    "stat_gwet_ac1",
    # Real oracle: both raters decide by integer cross-multiplied
    # thresholds on identical token counts, the 2x2 cells are
    # integers, and AC1/kappa are closed forms on those counts.
    oracle=f"""
    WITH t AS (SELECT doc_id, len({DUCK_TOKENS}) AS nt,
                      len(list_distinct({DUCK_TOKENS})) AS nd
               FROM documents),
    v AS (SELECT doc_id,
                 CASE WHEN nt >= {AC1_MIN_TOKENS} THEN 1 ELSE 0 END AS ra,
                 CASE WHEN 100 * nd >= {AC1_DISTINCT_PCT} * nt
                      THEN 1 ELSE 0 END AS rb
          FROM t),
    c AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END)
                      AS DOUBLE) AS agree,
                 CAST(SUM(ra) AS DOUBLE) AS ka, CAST(SUM(rb) AS DOUBLE) AS kb
          FROM v),
    x AS (SELECT n, agree / n AS pa, (ka / n + kb / n) / 2 AS pi,
                 ka / n AS sa, kb / n AS sb
          FROM c),
    y AS (SELECT x.*, 2 * pi * (1 - pi) AS pe_ac1,
                 sa * sb + (1 - sa) * (1 - sb) AS pe_k
          FROM x)
    SELECT CAST(n AS BIGINT) AS n_docs,
           FLOOR(pa * 1e4 + 0.5) / 1e4 AS pct_agree,
           FLOOR((pa - pe_ac1) / (1 - pe_ac1) * 1e4 + 0.5) / 1e4 AS ac1,
           FLOOR(CASE WHEN pe_k >= 1 THEN 0.0
                      ELSE (pa - pe_k) / (1 - pe_k) END * 1e4 + 0.5) / 1e4
             AS kappa,
           FLOOR(sa * 1e4 + 0.5) / 1e4 AS keep_share_a,
           FLOOR(sb * 1e4 + 0.5) / 1e4 AS keep_share_b
    FROM y
    """,
)
def stat_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 between two curation heuristics voting keep/drop on
    every document (length >= {mt} tokens; distinct-token share >=
    {dp}%), reported beside Cohen's kappa on the same 2x2 table. AC1's
    chance term 2 pi (1 - pi) uses the POOLED keep rate, so when both
    raters keep almost everything (skewed prevalence) AC1 degrades
    gracefully while kappa's marginal-product chance term explodes
    and drags kappa toward zero despite near-perfect raw agreement —
    the paradox that makes kappa unreadable on curation pipelines
    where most content passes.

    Scale: ONE tokenize pass per document (JVM array functions), a
    1-row integer cell count, closed-form algebra."""
    d = cat(spark, sf_dir)["documents"].select(
        F.size(tokens()).alias("nt"),
        F.size(F.array_distinct(tokens())).alias("nd"),
    )
    v = d.select(
        F.when(F.col("nt") >= AC1_MIN_TOKENS, 1).otherwise(0).alias("ra"),
        F.when(100 * F.col("nd") >= AC1_DISTINCT_PCT * F.col("nt"), 1)
        .otherwise(0)
        .alias("rb"),
    )
    c = v.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), 1).otherwise(0))
        .cast("double")
        .alias("agree"),
        F.sum("ra").cast("double").alias("ka"),
        F.sum("rb").cast("double").alias("kb"),
    )
    x = c.select(
        "n",
        (F.col("agree") / F.col("n")).alias("pa"),
        ((F.col("ka") / F.col("n") + F.col("kb") / F.col("n")) / 2).alias(
            "pi"
        ),
        (F.col("ka") / F.col("n")).alias("sa"),
        (F.col("kb") / F.col("n")).alias("sb"),
    )
    pe_ac1 = 2 * F.col("pi") * (1 - F.col("pi"))
    pe_k = F.col("sa") * F.col("sb") + (1 - F.col("sa")) * (1 - F.col("sb"))
    return x.select(
        F.col("n").cast("bigint").alias("n_docs"),
        rnd(F.col("pa"), 4).alias("pct_agree"),
        rnd((F.col("pa") - pe_ac1) / (1 - pe_ac1), 4).alias("ac1"),
        rnd(
            F.when(pe_k >= 1, F.lit(0.0)).otherwise(
                (F.col("pa") - pe_k) / (1 - pe_k)
            ),
            4,
        ).alias("kappa"),
        rnd(F.col("sa"), 4).alias("keep_share_a"),
        rnd(F.col("sb"), 4).alias("keep_share_b"),
    )


stat_gwet_ac1.__doc__ = stat_gwet_ac1.__doc__.format(
    mt=AC1_MIN_TOKENS, dp=AC1_DISTINCT_PCT
)
