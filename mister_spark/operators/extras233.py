"""Wave 233: homoglyph spoofing screens and exact rate comparison.

tx_homoglyph_audit scans every token for MIXED-SCRIPT composition —
Latin letters sharing a token with Cyrillic/Greek lookalikes, the
classic spoofing/SEO-poisoning signature ("pаypal" with a Cyrillic
а) — plus the zero-width characters used to split blocklisted
words. On a clean corpus the counts are PROVABLE ZEROS (the
tx_canary_detect design: the absence is the evidence); the pytest
gates plant confusables and watch them surface. stat_poisson_rate_
exact compares weekend vs weekday event RATES with the conditional
exact test: given the total count, the weekend share is
Binomial(N, t1/(t1+t2)) under equal rates, so the p-value is an
exact binomial tail through the shared ln-factorial — no normal
approximation to break at small counts, the same exactness
stat_fisher_exact gives 2x2 tables, here for exposure-adjusted
rates.

Exactness: script classification is integer codepoint ranges,
identical in both engines; the binomial tail sums the same
ln-factorial closed form over an integer support grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import ln_fact, ln_fact_sql
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

# codepoint ranges (inclusive) — shared constants
CYR_LO, CYR_HI = 0x0400, 0x04FF
GRK_LO, GRK_HI = 0x0370, 0x03FF
ZW_CODES = (0x200B, 0x200C, 0x200D, 0xFEFF)


@query(
    "tx_homoglyph_audit",
    # Real oracle: per-character codepoints via unicode(), integer
    # range tests, integer counts — the corpus-level zeros are
    # provable, and any hit is an exact integer both engines agree
    # on.
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest({DUCK_TOKENS}) AS w FROM documents),
    ch AS (SELECT doc_id, w, unicode(c) AS cp FROM (
             SELECT doc_id, w, unnest(split(w, '')) AS c FROM t)),
    cls AS (SELECT doc_id, w,
                   MAX(CASE WHEN (cp BETWEEN 65 AND 90)
                            OR (cp BETWEEN 97 AND 122) THEN 1 ELSE 0
                       END) AS has_latin,
                   MAX(CASE WHEN cp BETWEEN {CYR_LO} AND {CYR_HI}
                            THEN 1 ELSE 0 END) AS has_cyr,
                   MAX(CASE WHEN cp BETWEEN {GRK_LO} AND {GRK_HI}
                            THEN 1 ELSE 0 END) AS has_grk,
                   MAX(CASE WHEN cp IN {ZW_CODES} THEN 1 ELSE 0 END)
                     AS has_zw
            FROM ch GROUP BY 1, 2),
    flags AS (SELECT doc_id,
                     CASE WHEN has_latin = 1
                          AND (has_cyr = 1 OR has_grk = 1)
                          THEN 1 ELSE 0 END AS mixed,
                     has_zw
              FROM cls)
    SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(mixed) AS BIGINT) AS mixed_script_tokens,
           CAST(SUM(has_zw) AS BIGINT) AS zero_width_tokens,
           CAST(COUNT(DISTINCT CASE WHEN mixed = 1 OR has_zw = 1
                THEN doc_id END) AS BIGINT) AS flagged_docs
    FROM flags
    """,
)
def tx_homoglyph_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Homoglyph/spoofing screen: a token mixing Latin letters with
    Cyrillic or Greek codepoints is the confusable-substitution
    signature (spam, SEO poisoning, blocklist evasion), and
    zero-width characters inside tokens are the splitting trick.
    Counts are corpus facts with PROVABLE ZEROS on clean data — the
    audit line a curation pipeline prints before anyone asks "could
    'раypal' have slipped through?" (tx_canary_detect sweeps known
    strings; this sweeps a known ATTACK CLASS).

    Scale: one tokenize + per-character explode pass (JVM array
    functions and integer range tests, no UDF), one grouped
    aggregation — map-side combinable."""
    t = cat(spark, sf_dir)["documents"].select(
        "doc_id", F.explode(tokens()).alias("w")
    )
    ch = t.select(
        "doc_id", "w",
        F.explode(F.split(F.col("w"), "")).alias("c"),
    ).filter(F.col("c") != "")
    cp = F.ascii(F.col("c"))
    cls = ch.groupBy("doc_id", "w").agg(
        F.max(
            F.when(
                (cp.between(65, 90)) | (cp.between(97, 122)), 1
            ).otherwise(0)
        ).alias("has_latin"),
        F.max(F.when(cp.between(CYR_LO, CYR_HI), 1).otherwise(0)).alias(
            "has_cyr"
        ),
        F.max(F.when(cp.between(GRK_LO, GRK_HI), 1).otherwise(0)).alias(
            "has_grk"
        ),
        F.max(F.when(cp.isin(*ZW_CODES), 1).otherwise(0)).alias("has_zw"),
    )
    flags = cls.select(
        "doc_id",
        F.when(
            (F.col("has_latin") == 1)
            & ((F.col("has_cyr") == 1) | (F.col("has_grk") == 1)),
            1,
        )
        .otherwise(0)
        .alias("mixed"),
        "has_zw",
    )
    return flags.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.sum("mixed").cast("bigint").alias("mixed_script_tokens"),
        F.sum("has_zw").cast("bigint").alias("zero_width_tokens"),
        F.countDistinct(
            F.when((F.col("mixed") == 1) | (F.col("has_zw") == 1), F.col("doc_id"))
        )
        .cast("bigint")
        .alias("flagged_docs"),
    )


@query(
    "stat_poisson_rate_exact",
    # Real oracle: counts and exposures are integers, the binomial
    # log-pmf uses the shared ln-factorial closed form over an
    # integer support grid, and the two-sided p sums pmfs <= the
    # observed one (with the same <= on rounded log-pmf both
    # engines).
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                      CAST(ts AS DATE)) AS t,
                      CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    g AS (SELECT CASE WHEN t % 7 IN (2, 3) THEN 1 ELSE 0 END AS wkend,
                 y FROM d),
    agg AS (SELECT CAST(SUM(CASE WHEN wkend = 1 THEN y ELSE 0 END)
                        AS BIGINT) AS x1,
                   CAST(SUM(CASE WHEN wkend = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS t1,
                   CAST(SUM(CASE WHEN wkend = 0 THEN y ELSE 0 END)
                        AS BIGINT) AS x2,
                   CAST(SUM(CASE WHEN wkend = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS t2
            FROM g),
    pp AS (SELECT agg.*, x1 + x2 AS n,
                  CAST(t1 AS DOUBLE) / (t1 + t2) AS p
           FROM agg),
    -- support spine capped at 200k: covers every ORACLE scale
    -- (sf<=0.01 has n ~ 60k); the Spark side ranges to the true n
    sup AS (SELECT pp.*, k FROM pp
            CROSS JOIN (SELECT unnest(generate_series(0, 200000)) AS k)
            WHERE k <= n),
    pmf AS (SELECT k, n, p, x1,
                   {ln_fact_sql("n")} - {ln_fact_sql("k")}
                   - {ln_fact_sql("(n - k)")}
                   + k * LN(p) + (n - k) * LN(1 - p) AS lp
            FROM sup),
    obs AS (SELECT lp AS lp_obs FROM pmf WHERE k = x1),
    tail AS (SELECT SUM(EXP(pmf.lp)) AS pv
             FROM pmf, obs
             WHERE FLOOR(pmf.lp * 1e9) <= FLOOR(obs.lp_obs * 1e9))
    SELECT pp.x1 AS weekend_events, pp.t1 AS weekend_days,
           pp.x2 AS weekday_events, pp.t2 AS weekday_days,
           FLOOR((CAST(pp.x1 AS DOUBLE) / pp.t1)
                 / (CAST(pp.x2 AS DOUBLE) / pp.t2) * 1e4 + 0.5) / 1e4
             AS rate_ratio,
           FLOOR(LEAST(tail.pv, 1.0) * 1e6 + 0.5) / 1e6 AS p_value
    FROM pp, tail
    """,
)
def stat_poisson_rate_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional exact Poisson rate comparison, weekend vs weekday
    event rates: under equal rates, the weekend count given the
    total is Binomial(N, t_wkend/(t_wkend + t_wkday)), so the
    two-sided p sums every support point whose pmf is <= the
    observed one — exact at any count, where the z-approximation of
    ev_rate_test goes soft below ~20 events. The weekend factor with
    an honest p attached; the Poisson twin of stat_fisher_exact.

    Scale: one day-grain pass to four integers; the binomial
    support grid is count-bounded and the ln-factorial pmf is the
    shared closed form — the whole test is a model-sized frame."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
                "t"
            )
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    g = d.select(
        F.when((F.col("t") % 7).isin(2, 3), 1).otherwise(0).alias("wkend"),
        "y",
    )
    agg = g.agg(
        F.sum(F.when(F.col("wkend") == 1, F.col("y")).otherwise(0)).alias("x1"),
        F.sum(F.when(F.col("wkend") == 1, 1).otherwise(0)).alias("t1"),
        F.sum(F.when(F.col("wkend") == 0, F.col("y")).otherwise(0)).alias("x2"),
        F.sum(F.when(F.col("wkend") == 0, 1).otherwise(0)).alias("t2"),
    ).localCheckpoint()  # four integers
    pp = agg.select(
        "*",
        (F.col("x1") + F.col("x2")).alias("n"),
        (F.col("t1").cast("double") / (F.col("t1") + F.col("t2"))).alias("p"),
    )
    nmax = pp.select("n").collect()[0]["n"]
    sup = (
        pp.crossJoin(
            F.broadcast(
                spark.range(0, int(nmax) + 1).select(F.col("id").alias("k"))
            )
        )
    )
    lp = (
        ln_fact(F.col("n"))
        - ln_fact(F.col("k"))
        - ln_fact(F.col("n") - F.col("k"))
        + F.col("k") * F.log(F.col("p"))
        + (F.col("n") - F.col("k")) * F.log(1 - F.col("p"))
    )
    pmf = sup.select("x1", "t1", "x2", "t2", "n", "p", "k", lp.alias("lp"))
    obs = pmf.filter(F.col("k") == F.col("x1")).select(
        F.col("lp").alias("lp_obs")
    )
    tail = (
        pmf.crossJoin(F.broadcast(obs))
        .filter(
            F.floor(F.col("lp") * 1e9) <= F.floor(F.col("lp_obs") * 1e9)
        )
        .agg(F.sum(F.exp(F.col("lp"))).alias("pv"))
    )
    return (
        pp.crossJoin(F.broadcast(tail))
        .select(
            F.col("x1").cast("bigint").alias("weekend_events"),
            F.col("t1").cast("bigint").alias("weekend_days"),
            F.col("x2").cast("bigint").alias("weekday_events"),
            F.col("t2").cast("bigint").alias("weekday_days"),
            rnd(
                (F.col("x1").cast("double") / F.col("t1"))
                / (F.col("x2").cast("double") / F.col("t2")),
                4,
            ).alias("rate_ratio"),
            rnd(F.least(F.col("pv"), F.lit(1.0)), 6).alias("p_value"),
        )
    )
