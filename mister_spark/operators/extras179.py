"""Wave 179: Page trend test and intraclass correlation.

stat_page_trend is the ordered-alternative rank test on the matched
customers-x-years design: where Friedman asks 'any difference between
years?', Page's L asks 'do yearly spends trend MONOTONICALLY?' — the
sharper question with more power when time itself is the hypothesis.
stat_icc closes the reliability family: the one-way random-effects
intraclass correlation ICC(1,1), the share of spend variance that
lives BETWEEN customers rather than between a customer's own years —
the number behind 'is customer spend a stable trait?'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.registry import query

FR_YEARS = (1995, 1996, 1997)

_FR_SPEND = """
    f AS (SELECT o_custkey AS ck,
                 SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1995
                          THEN o_totalprice ELSE 0 END) AS s1,
                 SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                          THEN o_totalprice ELSE 0 END) AS s2,
                 SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997
                          THEN o_totalprice ELSE 0 END) AS s3
          FROM orders GROUP BY 1)
"""


@query(
    "stat_page_trend",
    oracle=f"""
    WITH {_FR_SPEND},
    r AS (SELECT ck,
                 1 + (CASE WHEN s2 < s1 THEN 1 ELSE 0 END)
                   + (CASE WHEN s3 < s1 THEN 1 ELSE 0 END)
                   + 0.5 * ((CASE WHEN s2 = s1 THEN 1 ELSE 0 END)
                            + (CASE WHEN s3 = s1 THEN 1 ELSE 0 END))
                   AS r1,
                 1 + (CASE WHEN s1 < s2 THEN 1 ELSE 0 END)
                   + (CASE WHEN s3 < s2 THEN 1 ELSE 0 END)
                   + 0.5 * ((CASE WHEN s1 = s2 THEN 1 ELSE 0 END)
                            + (CASE WHEN s3 = s2 THEN 1 ELSE 0 END))
                   AS r2,
                 1 + (CASE WHEN s1 < s3 THEN 1 ELSE 0 END)
                   + (CASE WHEN s2 < s3 THEN 1 ELSE 0 END)
                   + 0.5 * ((CASE WHEN s1 = s3 THEN 1 ELSE 0 END)
                            + (CASE WHEN s2 = s3 THEN 1 ELSE 0 END))
                   AS r3
          FROM f),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(r1) AS q1, SUM(r2) AS q2, SUM(r3) AS q3
          FROM r),
    x AS (SELECT n, q1, q2, q3,
                 1 * q1 + 2 * q2 + 3 * q3 AS lstat,
                 n * 3 * 4 * 4 / 4.0 AS lmean,
                 n * 9 * 4 * 8 / 144.0 AS lvar
          FROM s)
    SELECT CAST(n AS BIGINT) AS customers,
           FLOOR(q1 / n * 10000 + 0.5) / 10000 AS mean_rank_1995,
           FLOOR(q2 / n * 10000 + 0.5) / 10000 AS mean_rank_1996,
           FLOOR(q3 / n * 10000 + 0.5) / 10000 AS mean_rank_1997,
           FLOOR(lstat * 100 + 0.5) / 100 AS page_l,
           FLOOR((lstat - lmean) / SQRT(lvar) * 10000 + 0.5) / 10000
             AS z,
           CASE WHEN ABS((lstat - lmean) / SQRT(lvar)) > 1.959964
                THEN 1 ELSE 0 END AS reject_5pct
    FROM x
    """,
)
def stat_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test for an ORDERED alternative on matched yearly
    spend (1995 <= 1996 <= 1997 per customer): within-customer
    midranks by pairwise comparisons (exact, closed-form for k=3 — no
    sort, no window), L = sum_j j * R_j with exact null moments
    E[L] = n k (k+1)^2 / 4, Var[L] = n k^2 (k+1)(k^2-1)/144, z
    two-sided at 5%. Where the omnibus Friedman (stat_friedman,
    extras84) asks 'any difference?', Page's L asks the sharper
    monotone-trend question — more power when the alternative is
    ordered. Basic form, no tie-correction factor — identical on both
    engines by construction.

    Scale: one customer-grain conditional rollup, midranks as
    map-side CASE arithmetic, one final five-moment aggregate."""
    o = cat(spark, sf_dir)["orders"]
    yr = F.year("o_orderdate")
    f = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        *[
            F.sum(
                F.when(yr == y, F.col("o_totalprice")).otherwise(0.0)
            ).alias(f"s{i + 1}")
            for i, y in enumerate(FR_YEARS)
        ]
    )

    def midrank(j: int) -> F.Column:
        others = [i for i in (1, 2, 3) if i != j]
        r = F.lit(1.0)
        for l in others:
            r = r + F.when(F.col(f"s{l}") < F.col(f"s{j}"), 1.0).otherwise(
                0.0
            )
            r = r + 0.5 * F.when(
                F.col(f"s{l}") == F.col(f"s{j}"), 1.0
            ).otherwise(0.0)
        return r

    r = f.select(
        midrank(1).alias("r1"), midrank(2).alias("r2"), midrank(3).alias("r3")
    )
    s = r.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("r1").alias("q1"),
        F.sum("r2").alias("q2"),
        F.sum("r3").alias("q3"),
    )
    lstat = F.col("q1") + 2 * F.col("q2") + 3 * F.col("q3")
    lmean = F.col("n") * 3 * 4 * 4 / 4.0
    lvar = F.col("n") * 9 * 4 * 8 / 144.0
    z = (lstat - lmean) / F.sqrt(lvar)
    return s.select(
        F.col("n").cast("bigint").alias("customers"),
        ratio(F.col("q1") / F.col("n")).alias("mean_rank_1995"),
        ratio(F.col("q2") / F.col("n")).alias("mean_rank_1996"),
        ratio(F.col("q3") / F.col("n")).alias("mean_rank_1997"),
        (F.floor(lstat * 100 + 0.5) / 100).alias("page_l"),
        ratio(z).alias("z"),
        F.when(F.abs(z) > 1.959964, 1).otherwise(0).alias("reject_5pct"),
    )


@query(
    "stat_icc",
    oracle=f"""
    WITH {_FR_SPEND},
    l AS (SELECT ck, s1 AS v FROM f UNION ALL
          SELECT ck, s2 FROM f UNION ALL SELECT ck, s3 FROM f),
    g AS (SELECT ck, CAST(COUNT(*) AS DOUBLE) AS k, SUM(v) AS sv,
                 SUM(v * v) AS svv
          FROM l GROUP BY 1),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(k) AS nk,
                 SUM(sv) AS tv, SUM(svv) AS tvv,
                 SUM(sv * sv / k) AS grp
          FROM g),
    ms AS (SELECT n, nk,
                  (grp - tv * tv / nk) / (n - 1) AS msb,
                  (tvv - grp) / (nk - n) AS msw
           FROM s)
    SELECT CAST(n AS BIGINT) AS customers,
           FLOOR(msb / 1e9 * 10000 + 0.5) / 10000 AS ms_between_bn,
           FLOOR(msw / 1e9 * 10000 + 0.5) / 10000 AS ms_within_bn,
           FLOOR((msb - msw) / (msb + 2 * msw) * 10000 + 0.5) / 10000
             AS icc_1_1
    FROM ms
    """,
)
def stat_icc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way random-effects intraclass correlation ICC(1,1) over the
    same customers x years spend table: between-customer and
    within-customer mean squares (reported in billions — the raw squares
    sit at 1e11 where a fine grid would amplify summation-order ulps)
    from one two-level moment rollup,
    ICC = (MSB - MSW) / (MSB + (k-1) MSW) with k=3 years. High ICC
    means spend is a customer trait (segment on it); near zero means
    year-to-year noise dominates (don't).

    Scale: the long (customer, year-spend) frame is one rollup to
    customer grain and one global aggregate — no windows, no joins."""
    o = cat(spark, sf_dir)["orders"]
    yr = F.year("o_orderdate")
    f = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        *[
            F.sum(
                F.when(yr == y, F.col("o_totalprice")).otherwise(0.0)
            ).alias(f"s{i + 1}")
            for i, y in enumerate(FR_YEARS)
        ]
    )
    l = f.select(
        "ck", F.explode(F.array("s1", "s2", "s3")).alias("v")
    )
    g = l.groupBy("ck").agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    s = g.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("k").alias("nk"),
        F.sum("sv").alias("tv"),
        F.sum("svv").alias("tvv"),
        F.sum(F.col("sv") * F.col("sv") / F.col("k")).alias("grp"),
    )
    msb = (F.col("grp") - F.col("tv") * F.col("tv") / F.col("nk")) / (
        F.col("n") - 1
    )
    msw = (F.col("tvv") - F.col("grp")) / (F.col("nk") - F.col("n"))
    return s.select(
        F.col("n").cast("bigint").alias("customers"),
        ratio(msb / 1e9).alias("ms_between_bn"),
        ratio(msw / 1e9).alias("ms_within_bn"),
        ratio((msb - msw) / (msb + 2 * msw)).alias("icc_1_1"),
    )
