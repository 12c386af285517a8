"""Wave 209: seasonality-proof trend testing and agreement with
abstention.

ev_seasonal_mann_kendall is the Hirsch-Slack seasonal Mann-Kendall:
compare days only WITHIN the same weekday and sum the seven S
statistics — the trend test that a strong weekly cycle cannot bias
(plain stat_mann_kendall counts Mon->Sat "increases" as trend), plus
the seasonal Sen slope from within-weekday pair slopes.
stat_krippendorff_alpha is Krippendorff's alpha over three
integer-exact curation heuristics (length, short-token share,
distinct-token share) that each vote keep/drop on a document or
ABSTAIN inside their uncertainty band — the agreement coefficient
built for exactly that missingness: Fleiss' kappa (stat_fleiss_kappa)
needs every rater on every item; alpha's coincidence-matrix form
handles per-item panels of 2 or 3, which is what real annotation and
heuristic-ensemble data look like.

Exactness: both ops are integer arithmetic until the final ratios —
MK signs/counts per weekday, and rater votes decided by cross-
multiplied integer inequalities (e.g. 100*short >= 22*tokens), never
by float thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"


@query(
    "ev_seasonal_mann_kendall",
    # Real oracle: pair signs and per-weekday counts are exact
    # integers; S, Var(S) and the continuity-corrected z are the same
    # closed forms; the seasonal Sen slope is an exact order
    # statistic of the within-weekday slope set (rational values,
    # identical both engines).
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    p AS (SELECT a.t % 7 AS w,
                 CASE WHEN b.y > a.y THEN 1
                      WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn,
                 CAST(b.y - a.y AS DOUBLE) / (b.t - a.t) AS slope,
                 a.t AS t1, b.t AS t2
          FROM d a JOIN d b ON b.t > a.t AND b.t % 7 = a.t % 7),
    sw AS (SELECT w, CAST(SUM(sgn) AS BIGINT) AS s,
                  CAST(COUNT(*) AS BIGINT) AS np
           FROM p GROUP BY 1),
    nw AS (SELECT t % 7 AS w, CAST(COUNT(*) AS BIGINT) AS n
           FROM d GROUP BY 1),
    tot AS (SELECT SUM(sw.s) AS s,
                   SUM(nw.n * (nw.n - 1) * (2 * nw.n + 5) / 18.0) AS v,
                   CAST(SUM(nw.n) AS BIGINT) AS n_days,
                   CAST(COUNT(*) AS BIGINT) AS n_seasons
            FROM sw JOIN nw ON nw.w = sw.w),
    sen AS (SELECT slope, ROW_NUMBER() OVER (ORDER BY slope, t1, t2)
                     AS rn, COUNT(*) OVER () AS m
            FROM p),
    med AS (SELECT AVG(slope) AS sen_slope FROM sen
            WHERE rn IN ((m + 1) // 2, (m + 2) // 2)),
    z AS (SELECT tot.*,
                 CASE WHEN tot.v <= 0 THEN 0.0
                      WHEN tot.s > 0 THEN (tot.s - 1) / SQRT(tot.v)
                      WHEN tot.s < 0 THEN (tot.s + 1) / SQRT(tot.v)
                      ELSE 0.0 END AS zs
          FROM tot)
    SELECT n_days, n_seasons,
           CAST(s AS BIGINT) AS s_stat,
           FLOOR(zs * 1e4 + 0.5) / 1e4 AS z,
           FLOOR(2 * {normal_sf_sql("ABS(zs)")} * 1e4 + 0.5) / 1e4
             AS p_value,
           (SELECT FLOOR(sen_slope * 1e4 + 0.5) / 1e4 FROM med)
             AS seasonal_sen_slope
    FROM z
    """,
)
def ev_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hirsch-Slack seasonal Mann-Kendall on daily event volume: pair
    days only within the same weekday, sum the seven per-season S
    statistics and their variances, and report the continuity-
    corrected z plus the seasonal Sen slope (median of within-weekday
    pair slopes). A pure weekly sawtooth reads S = 0 here while plain
    stat_mann_kendall sees five 'rises' per week; conversely a real
    drift shows up at full power because every comparison is
    like-for-like. The trend test to run FIRST on anything with a
    weekly pulse.

    Scale: ONE day-grain count, then within-weekday pair joins on the
    calendar-bounded frame (1/7th the pairs of plain MK); the Sen
    median is an exact order-statistic cut on that model-sized pair
    set. Map-side combinable up to the pair stage."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint()  # feeds both pair aliases + season sizes
    )
    a = d.select(
        (F.col("t") % 7).alias("w"), F.col("t").alias("t1"),
        F.col("y").alias("ya"),
    )
    b = d.select(
        (F.col("t") % 7).alias("w"), F.col("t").alias("t2"),
        F.col("y").alias("yb"),
    )
    p = (
        a.join(b, "w")
        .filter(F.col("t2") > F.col("t1"))
        .select(
            "w",
            F.when(F.col("yb") > F.col("ya"), 1)
            .when(F.col("yb") < F.col("ya"), -1)
            .otherwise(0)
            .alias("sgn"),
            (
                (F.col("yb") - F.col("ya")).cast("double")
                / (F.col("t2") - F.col("t1"))
            ).alias("slope"),
            "t1",
            "t2",
        )
        .localCheckpoint()  # feeds S sums + the Sen median
    )
    sw = p.groupBy("w").agg(F.sum("sgn").alias("s"))
    nw = d.groupBy((F.col("t") % 7).alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = (
        sw.join(nw, "w")
        .agg(
            F.sum("s").alias("s"),
            F.sum(
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) / 18.0
            ).alias("v"),
            F.sum("n").alias("n_days"),
            F.count(F.lit(1)).alias("n_seasons"),
        )
    )
    from mister_spark.functions.ranks import global_rank

    sen = global_rank(p.select("slope", "t1", "t2"), "slope", "t1", "t2",
                      rank_col="rn")
    mtot = p.agg(F.count(F.lit(1)).alias("m"))
    med = (
        sen.crossJoin(F.broadcast(mtot))
        .filter(
            (F.col("rn") == F.floor((F.col("m") + 1) / 2))
            | (F.col("rn") == F.floor((F.col("m") + 2) / 2))
        )
        .agg(F.avg("slope").alias("sen_slope"))
    )
    s = F.col("s").cast("double")
    zs = (
        F.when(F.col("v") <= 0, 0.0)
        .when(s > 0, (s - 1) / F.sqrt(F.col("v")))
        .when(s < 0, (s + 1) / F.sqrt(F.col("v")))
        .otherwise(0.0)
    )
    return (
        tot.crossJoin(F.broadcast(med))
        .select(
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("n_seasons").cast("bigint").alias("n_seasons"),
            F.col("s").cast("bigint").alias("s_stat"),
            rnd(zs, 4).alias("z"),
            rnd(2 * normal_sf(F.abs(zs)), 4).alias("p_value"),
            rnd(F.col("sen_slope"), 4).alias("seasonal_sen_slope"),
        )
    )


# Three keep/drop heuristics with abstention bands, all decided by
# integer cross-multiplication (never float thresholds):
#   R1 length: keep n_chars >= 220, drop < 180, abstain between
#   R2 short-token share s/t: keep 100s >= 22t, drop 100s < 18t
#   R3 distinct share d/t:    keep 100d >= 55t, drop 100d < 45t
_R_SQL = """
    votes AS (SELECT doc_id,
        CASE WHEN n_chars >= 220 THEN 1 WHEN n_chars < 180 THEN 0 END AS r1,
        CASE WHEN 100 * st >= 22 * t THEN 1
             WHEN 100 * st < 18 * t THEN 0 END AS r2,
        CASE WHEN 100 * dt >= 55 * t THEN 1
             WHEN 100 * dt < 45 * t THEN 0 END AS r3
      FROM feats)"""


@query(
    "stat_krippendorff_alpha",
    # Real oracle: every vote is an integer-inequality decision,
    # per-item keep/drop/abstain counts are integers, and alpha's
    # coincidence form sums exact rationals n_i0*n_i1/(m_i-1) with
    # m_i in {{2,3}} — identical term values both engines, only the
    # sum order drifts, inside the grid.
    oracle=f"""
    WITH feats AS (SELECT doc_id, n_chars,
                          len({DUCK_TOKENS}) AS t,
                          len(list_filter({DUCK_TOKENS},
                                          x -> length(x) <= 3)) AS st,
                          len(list_distinct({DUCK_TOKENS})) AS dt
                   FROM documents),
    {_R_SQL},
    item AS (SELECT doc_id,
                    CAST(COALESCE(r1, 0) + COALESCE(r2, 0)
                         + COALESCE(r3, 0) AS BIGINT) AS k,
                    CAST((CASE WHEN r1 IS NULL THEN 0 ELSE 1 END)
                         + (CASE WHEN r2 IS NULL THEN 0 ELSE 1 END)
                         + (CASE WHEN r3 IS NULL THEN 0 ELSE 1 END)
                         AS BIGINT) AS m
             FROM votes),
    rated AS (SELECT k, m, m - k AS z FROM item WHERE m >= 2),
    agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS items,
                   CAST(SUM(m) AS BIGINT) AS n,
                   CAST(SUM(k) AS BIGINT) AS n1,
                   CAST(SUM(z) AS BIGINT) AS n0,
                   SUM(CAST(k * z AS DOUBLE) / (m - 1)) AS dsum
            FROM rated)
    SELECT items AS n_items, n AS n_ratings,
           FLOOR(CAST(n1 AS DOUBLE) / n * 1e4 + 0.5) / 1e4 AS keep_share,
           FLOOR(2.0 * dsum / n * 1e6 + 0.5) / 1e6 AS d_observed,
           FLOOR(2.0 * n0 * n1 / (CAST(n AS DOUBLE) * (n - 1))
                 * 1e6 + 0.5) / 1e6 AS d_expected,
           FLOOR((1.0 - (n - 1) * dsum / (CAST(n0 AS DOUBLE) * n1))
                 * 1e6 + 0.5) / 1e6 AS kripp_alpha
    FROM agg
    """,
)
def stat_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal, binary) over three curation
    heuristics that vote keep/drop per document or ABSTAIN inside
    their uncertainty band (length, short-token share, distinct-token
    share — all integer cross-multiplied thresholds). Items with >= 2
    votes enter the coincidence matrix; alpha = 1 - D_o/D_e with
    D_o summing n_keep*n_drop/(m-1) per item. This is the agreement
    number for ragged rating data — kappa needs complete panels,
    alpha is BUILT for abstention, which is what threshold-band
    heuristics and human annotation queues actually produce. Low
    alpha = the ensemble's 'quality' concept is incoherent and a
    majority vote over it is noise.

    Scale: ONE tokenization pass per document (JVM higher-order
    expressions, no UDF), integer vote logic, a 1-row aggregate.
    Map-side combinable end to end."""
    toks = tokens()
    feats = cat(spark, sf_dir)["documents"].select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("t"),
        F.size(F.filter(toks, lambda x: F.length(x) <= 3)).alias("st"),
        F.size(F.array_distinct(toks)).alias("dt"),
    )
    r1 = F.when(F.col("n_chars") >= 220, 1).when(F.col("n_chars") < 180, 0)
    r2 = F.when(100 * F.col("st") >= 22 * F.col("t"), 1).when(
        100 * F.col("st") < 18 * F.col("t"), 0
    )
    r3 = F.when(100 * F.col("dt") >= 55 * F.col("t"), 1).when(
        100 * F.col("dt") < 45 * F.col("t"), 0
    )
    votes = feats.select(
        "doc_id", r1.alias("r1"), r2.alias("r2"), r3.alias("r3")
    )
    k = (
        F.coalesce(F.col("r1"), F.lit(0))
        + F.coalesce(F.col("r2"), F.lit(0))
        + F.coalesce(F.col("r3"), F.lit(0))
    )
    m = (
        F.col("r1").isNotNull().cast("int")
        + F.col("r2").isNotNull().cast("int")
        + F.col("r3").isNotNull().cast("int")
    )
    item = votes.select(k.alias("k"), m.alias("m")).filter(F.col("m") >= 2)
    agg = item.select(
        "k", "m", (F.col("m") - F.col("k")).alias("z")
    ).agg(
        F.count(F.lit(1)).alias("items"),
        F.sum("m").alias("n"),
        F.sum("k").alias("n1"),
        F.sum("z").alias("n0"),
        F.sum(
            (F.col("k") * F.col("z")).cast("double") / (F.col("m") - 1)
        ).alias("dsum"),
    )
    n = F.col("n").cast("double")
    return agg.select(
        F.col("items").cast("bigint").alias("n_items"),
        F.col("n").cast("bigint").alias("n_ratings"),
        rnd(F.col("n1").cast("double") / n, 4).alias("keep_share"),
        rnd(2.0 * F.col("dsum") / n, 6).alias("d_observed"),
        rnd(
            2.0 * F.col("n0") * F.col("n1") / (n * (n - 1)), 6
        ).alias("d_expected"),
        rnd(
            1.0
            - (n - 1)
            * F.col("dsum")
            / (F.col("n0").cast("double") * F.col("n1")),
            6,
        ).alias("kripp_alpha"),
    )
