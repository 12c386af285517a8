"""Wave 187: non-monotonic dependence, robust k-group location, and
rank scale testing.

stat_hoeffding_d is Hoeffding's D (1948, public literature) between
order quantity and discount — the rank statistic that detects
NON-monotonic dependence Spearman/Kendall structurally miss, computed
entirely on the (quantity, discount) value grid so the pair space is
|distinct x|·|distinct y| cells, never row pairs. stat_mood_median is
Mood's k-group median test (above/below the pooled median per event
type → chi-square) — the outlier-immune alternative to ANOVA when
only location matters. stat_ansari_bradley is the Ansari–Bradley
two-sample SCALE test (click vs view values): mid-rank AB scores
min(r, N+1-r) compare dispersions without assuming normality — the
rank twin of Levene.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mister_spark.functions.ranks import bucketed_cumsum
from mister_spark.operators.common import cat, ratio, rnd
from mister_spark.registry import query

AB_GROUPS = ("click", "view")  # Ansari-Bradley sample pair


@query(
    "stat_hoeffding_d",
    # Real oracle: every cell quantity (mid-ranks, bivariate Q) is
    # exact integer/quarter arithmetic on the 50x11 value grid —
    # bitwise identical across engines; the D1/D2/D3 products follow
    # ONE pinned parenthesization on both sides, and only the final
    # 550-term summation order differs (relative ~1e-16, absorbed by
    # the 1e-6 floor grid).
    oracle="""
    WITH cells AS (SELECT l_quantity AS x, l_discount AS y,
                          CAST(COUNT(*) AS DOUBLE) AS w
                   FROM lineitem GROUP BY 1, 2),
    n AS (SELECT SUM(w) AS n FROM cells),
    mx AS (SELECT x, SUM(w) AS cx FROM cells GROUP BY 1),
    my AS (SELECT y, SUM(w) AS cy FROM cells GROUP BY 1),
    ltx AS (SELECT a.x, COALESCE(SUM(b.cx), 0.0) AS lx
            FROM mx a LEFT JOIN mx b ON b.x < a.x GROUP BY a.x),
    lty AS (SELECT a.y, COALESCE(SUM(b.cy), 0.0) AS ly
            FROM my a LEFT JOIN my b ON b.y < a.y GROUP BY a.y),
    ll AS (SELECT a.x, a.y, COALESCE(SUM(b.w), 0.0) AS l
           FROM cells a LEFT JOIN cells b ON b.x < a.x AND b.y < a.y
           GROUP BY a.x, a.y),
    ex AS (SELECT a.x, a.y, COALESCE(SUM(b.w), 0.0) AS e
           FROM cells a LEFT JOIN cells b ON b.x = a.x AND b.y < a.y
           GROUP BY a.x, a.y),
    ey AS (SELECT a.x, a.y, COALESCE(SUM(b.w), 0.0) AS e
           FROM cells a LEFT JOIN cells b ON b.y = a.y AND b.x < a.x
           GROUP BY a.x, a.y),
    q AS (SELECT c.x, c.y, c.w,
                 ltx.lx + (mx.cx + 1) / 2 AS r,
                 lty.ly + (my.cy + 1) / 2 AS s,
                 1 + ll.l + 0.5 * (ex.e + ey.e) + 0.25 * (c.w - 1) AS qq
          FROM cells c
          JOIN mx ON mx.x = c.x JOIN my ON my.y = c.y
          JOIN ltx ON ltx.x = c.x JOIN lty ON lty.y = c.y
          JOIN ll ON ll.x = c.x AND ll.y = c.y
          JOIN ex ON ex.x = c.x AND ex.y = c.y
          JOIN ey ON ey.x = c.x AND ey.y = c.y),
    d AS (SELECT SUM(w * ((qq - 1) * (qq - 2))) AS d1,
                 SUM(w * (((r - 1) * (r - 2)) * ((s - 1) * (s - 2)))) AS d2,
                 SUM(w * (((r - 2) * (s - 2)) * (qq - 1))) AS d3
          FROM q)
    SELECT CAST(n.n AS BIGINT) AS n,
           FLOOR(30 * (((n.n - 2) * (n.n - 3)) * d.d1 + d.d2
                       - (2 * (n.n - 2)) * d.d3)
                 / ((((n.n * (n.n - 1)) * (n.n - 2)) * (n.n - 3))
                    * (n.n - 4)) * 1e6 + 0.5) / 1e6 AS hoeffding_d
    FROM n, d
    """,
)
def stat_hoeffding_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoeffding's D between l_quantity and l_discount: the rank-based
    dependence statistic whose kernel counts bivariate dominance, so
    U-shaped / checkerboard dependence that leaves Spearman at ~0
    still registers. Mid-rank tie convention (SAS/hoeffd): R/S are
    univariate mid-ranks, Q is the bivariate rank with half credit
    for single-coordinate ties and quarter credit for full ties;
    D = 30·((n-2)(n-3)D1 + D2 - 2(n-2)D3)/(n(n-1)(n-2)(n-3)(n-4)).

    Scale: ONE groupBy collapses the fact table to the |distinct
    quantity|x|distinct discount| value grid (50x11 = 550 cells at any
    corpus size); every rank/dominance term is a broadcast self-join
    or partitioned window on that model-sized frame — no row-pair
    space anywhere. Cell counts are integers, so all mid-ranks and Q
    values are exact quarters — cross-engine bitwise equal."""
    cells = (
        cat(spark, sf_dir)["lineitem"]
        .groupBy(F.col("l_quantity").alias("x"), F.col("l_discount").alias("y"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .localCheckpoint()
    )
    n1row = cells.agg(F.sum("w").alias("n"))
    mx = cells.groupBy("x").agg(F.sum("w").alias("cx"))
    my = cells.groupBy("y").agg(F.sum("w").alias("cy"))
    ltx = (
        mx.alias("a")
        .join(F.broadcast(mx.alias("b")), F.col("b.x") < F.col("a.x"), "left")
        .groupBy(F.col("a.x").alias("x"), F.col("a.cx").alias("cx"))
        .agg(F.coalesce(F.sum("b.cx"), F.lit(0.0)).alias("lx"))
    )
    lty = (
        my.alias("a")
        .join(F.broadcast(my.alias("b")), F.col("b.y") < F.col("a.y"), "left")
        .groupBy(F.col("a.y").alias("y"), F.col("a.cy").alias("cy"))
        .agg(F.coalesce(F.sum("b.cy"), F.lit(0.0)).alias("ly"))
    )
    ll = (
        cells.alias("a")
        .join(
            F.broadcast(cells.alias("b")),
            (F.col("b.x") < F.col("a.x")) & (F.col("b.y") < F.col("a.y")),
            "left",
        )
        .groupBy(F.col("a.x").alias("x"), F.col("a.y").alias("y"))
        .agg(F.coalesce(F.sum("b.w"), F.lit(0.0)).alias("l"))
    )
    wx = W.partitionBy("x").orderBy("y").rowsBetween(W.unboundedPreceding, -1)
    wy = W.partitionBy("y").orderBy("x").rowsBetween(W.unboundedPreceding, -1)
    q = (
        cells.withColumn("ex", F.coalesce(F.sum("w").over(wx), F.lit(0.0)))
        .withColumn("ey", F.coalesce(F.sum("w").over(wy), F.lit(0.0)))
        .join(F.broadcast(ltx), "x")
        .join(F.broadcast(lty), "y")
        .join(F.broadcast(ll), ["x", "y"])
        .select(
            "w",
            (F.col("lx") + (F.col("cx") + 1) / 2).alias("r"),
            (F.col("ly") + (F.col("cy") + 1) / 2).alias("s"),
            (
                1
                + F.col("l")
                + 0.5 * (F.col("ex") + F.col("ey"))
                + 0.25 * (F.col("w") - 1)
            ).alias("qq"),
        )
    )
    r, s, qq, w = F.col("r"), F.col("s"), F.col("qq"), F.col("w")
    d = q.agg(
        F.sum(w * ((qq - 1) * (qq - 2))).alias("d1"),
        F.sum(w * (((r - 1) * (r - 2)) * ((s - 1) * (s - 2)))).alias("d2"),
        F.sum(w * (((r - 2) * (s - 2)) * (qq - 1))).alias("d3"),
    )
    nn = F.col("n")
    num = 30 * (
        ((nn - 2) * (nn - 3)) * F.col("d1")
        + F.col("d2")
        - (2 * (nn - 2)) * F.col("d3")
    )
    den = (((nn * (nn - 1)) * (nn - 2)) * (nn - 3)) * (nn - 4)
    return (
        d.crossJoin(F.broadcast(n1row))
        .select(
            nn.cast("bigint").alias("n"),
            rnd(num / den, 6).alias("hoeffding_d"),
        )
    )


@query(
    "stat_mood_median",
    # Real oracle: the pooled lower median is the min value whose
    # cumulative distinct-value count reaches ceil(n/2) — exact
    # integer thresholding; group counts are integers and the expected
    # counts / chi-square use one pinned expression shape (1e-6 grid
    # absorbs the 5-term summation order).
    oracle="""
    WITH e AS (SELECT event_type, value FROM events),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
    dv AS (SELECT value, CAST(COUNT(*) AS BIGINT) AS w FROM e GROUP BY 1),
    cum AS (SELECT value, SUM(w) OVER (ORDER BY value) AS c FROM dv),
    med AS (SELECT MIN(value) AS m FROM cum, n
            WHERE c >= (n.n + 1) // 2),
    g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ng,
                 CAST(SUM(CASE WHEN value > med.m THEN 1 ELSE 0 END)
                      AS BIGINT) AS above
          FROM e, med GROUP BY 1),
    tot AS (SELECT CAST(SUM(above) AS DOUBLE) AS a,
                   CAST(SUM(ng) AS DOUBLE) AS nn FROM g),
    parts AS (SELECT g.event_type, g.ng, g.above,
                     g.ng * (tot.a / tot.nn) AS ea,
                     g.ng * ((tot.nn - tot.a) / tot.nn) AS eb
              FROM g, tot),
    chi AS (SELECT SUM((above - ea) * (above - ea) / ea
                       + ((ng - above) - eb) * ((ng - above) - eb) / eb)
              AS chi2
            FROM parts)
    SELECT p.event_type, p.ng AS n, p.above,
           FLOOR(p.ea * 1e4 + 0.5) / 1e4 AS exp_above,
           FLOOR(chi.chi2 * 1e6 + 0.5) / 1e6 AS chi2
    FROM parts p, chi
    """,
)
def stat_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across event types: pool all values, count
    each group's rows above the pooled (lower) median, and test the
    2xk contingency table against equal-proportion expectations with
    a chi-square. The robust screen for 'do these groups sit at the
    same level' when outliers disqualify mean-based ANOVA.

    Scale: the pooled median comes from the distinct-value frame via
    a two-phase bucketed prefix sum (no single-task global sort);
    group counts are ONE partial-agg pass with the 1-row median frame
    broadcast; the chi-square lives on the k-row group frame."""
    e = cat(spark, sf_dir)["events"].select("event_type", "value")
    n = e.count()
    dv = e.groupBy("value").agg(F.count(F.lit(1)).alias("w"))
    cum = bucketed_cumsum(dv, "value", {"c": F.col("w")})
    med = cum.filter(F.col("c") >= (n + 1) // 2).agg(F.min("value").alias("m"))
    g = (
        e.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ng"),
            F.sum(F.when(F.col("value") > F.col("m"), 1).otherwise(0))
            .cast("bigint")
            .alias("above"),
        )
        .localCheckpoint()
    )
    tot = g.agg(
        F.sum("above").cast("double").alias("a"),
        F.sum("ng").cast("double").alias("nn"),
    )
    parts = g.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "ng",
        "above",
        (F.col("ng") * (F.col("a") / F.col("nn"))).alias("ea"),
        (F.col("ng") * ((F.col("nn") - F.col("a")) / F.col("nn"))).alias("eb"),
    )
    chi = parts.agg(
        F.sum(
            (F.col("above") - F.col("ea"))
            * (F.col("above") - F.col("ea"))
            / F.col("ea")
            + ((F.col("ng") - F.col("above")) - F.col("eb"))
            * ((F.col("ng") - F.col("above")) - F.col("eb"))
            / F.col("eb")
        ).alias("chi2")
    )
    return parts.crossJoin(F.broadcast(chi)).select(
        "event_type",
        F.col("ng").alias("n"),
        "above",
        rnd(F.col("ea"), 4).alias("exp_above"),
        rnd(F.col("chi2"), 6).alias("chi2"),
    )


def _ab_t(t, n):
    """T(t) = sum_{p=1..t} min(p, N+1-p) — closed form, exact integer
    arithmetic carried in doubles (t(t+1) is always even and far below
    2^53, so /2 is exact). M = (N+1)//2 is the last ascending
    position."""
    m = F.floor((n + 1) / 2)
    asc = t * (t + 1) / 2
    desc = m * (m + 1) / 2 + (t - m) * (n + 1) - (t * (t + 1) / 2 - m * (m + 1) / 2)
    return F.when(t <= m, asc).otherwise(desc)


@query(
    "stat_ansari_bradley",
    # Real oracle: positions and the T() prefix closed form are exact
    # integer arithmetic in doubles on both engines; per-value
    # mid-scores divide once; only the final per-value summations
    # differ in order (1e-4 grid absorbs).
    oracle=f"""
    WITH e AS (SELECT value,
                      CASE WHEN event_type = '{AB_GROUPS[0]}' THEN 1
                           ELSE 0 END AS g
               FROM events
               WHERE event_type IN ('{AB_GROUPS[0]}', '{AB_GROUPS[1]}')),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(g) AS DOUBLE) AS n1 FROM e),
    dv AS (SELECT value, CAST(COUNT(*) AS DOUBLE) AS w,
                  CAST(SUM(g) AS DOUBLE) AS w1
           FROM e GROUP BY 1),
    cum AS (SELECT value, w, w1, SUM(w) OVER (ORDER BY value) AS c
            FROM dv),
    sc AS (SELECT w, w1,
                  (CASE WHEN c <= FLOOR((n + 1) / 2)
                        THEN c * (c + 1) / 2
                        ELSE FLOOR((n + 1) / 2) * (FLOOR((n + 1) / 2) + 1) / 2
                             + (c - FLOOR((n + 1) / 2)) * (n + 1)
                             - (c * (c + 1) / 2
                                - FLOOR((n + 1) / 2)
                                  * (FLOOR((n + 1) / 2) + 1) / 2)
                   END
                   -
                   CASE WHEN (c - w) <= FLOOR((n + 1) / 2)
                        THEN (c - w) * ((c - w) + 1) / 2
                        ELSE FLOOR((n + 1) / 2) * (FLOOR((n + 1) / 2) + 1) / 2
                             + ((c - w) - FLOOR((n + 1) / 2)) * (n + 1)
                             - ((c - w) * ((c - w) + 1) / 2
                                - FLOOR((n + 1) / 2)
                                  * (FLOOR((n + 1) / 2) + 1) / 2)
                   END) / w AS abar
           FROM cum, nn),
    agg AS (SELECT SUM(w1 * abar) AS ab,
                   SUM(w * (abar * abar)) AS s2
            FROM sc),
    fin AS (SELECT nn.n1 AS n1, nn.n - nn.n1 AS n2, agg.ab,
                   nn.n1 * ((CASE WHEN nn.n <= FLOOR((nn.n + 1) / 2)
                             THEN nn.n * (nn.n + 1) / 2
                             ELSE FLOOR((nn.n + 1) / 2)
                                  * (FLOOR((nn.n + 1) / 2) + 1) / 2
                                  + (nn.n - FLOOR((nn.n + 1) / 2)) * (nn.n + 1)
                                  - (nn.n * (nn.n + 1) / 2
                                     - FLOOR((nn.n + 1) / 2)
                                       * (FLOOR((nn.n + 1) / 2) + 1) / 2)
                             END) / nn.n) AS expected,
                   (nn.n1 * (nn.n - nn.n1) / (nn.n - 1))
                     * (agg.s2 / nn.n
                        - ((CASE WHEN nn.n <= FLOOR((nn.n + 1) / 2)
                            THEN nn.n * (nn.n + 1) / 2
                            ELSE FLOOR((nn.n + 1) / 2)
                                 * (FLOOR((nn.n + 1) / 2) + 1) / 2
                                 + (nn.n - FLOOR((nn.n + 1) / 2)) * (nn.n + 1)
                                 - (nn.n * (nn.n + 1) / 2
                                    - FLOOR((nn.n + 1) / 2)
                                      * (FLOOR((nn.n + 1) / 2) + 1) / 2)
                            END) / nn.n)
                          * ((CASE WHEN nn.n <= FLOOR((nn.n + 1) / 2)
                              THEN nn.n * (nn.n + 1) / 2
                              ELSE FLOOR((nn.n + 1) / 2)
                                   * (FLOOR((nn.n + 1) / 2) + 1) / 2
                                   + (nn.n - FLOOR((nn.n + 1) / 2)) * (nn.n + 1)
                                   - (nn.n * (nn.n + 1) / 2
                                      - FLOOR((nn.n + 1) / 2)
                                        * (FLOOR((nn.n + 1) / 2) + 1) / 2)
                              END) / nn.n)) AS variance
            FROM nn, agg)
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           FLOOR(ab * 1e4 + 0.5) / 1e4 AS ab_statistic,
           FLOOR(expected * 1e4 + 0.5) / 1e4 AS expected,
           FLOOR((ab - expected) / SQRT(variance) * 1e4 + 0.5) / 1e4 AS z
    FROM fin
    """,
)
def stat_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari–Bradley two-sample scale test (click vs view values):
    rank all N pooled values, score position p as min(p, N+1-p) —
    big scores in the MIDDLE, small at the extremes — with mid-scores
    over ties, and sum group 1's scores. A group squeezed toward the
    pooled median collects large scores; z compares AB to its exact
    finite-sample moments under H0 (tie-corrected). The rank twin of
    Levene for 'same location, different spread' questions.

    Scale: positions come from the distinct-value frame's two-phase
    bucketed prefix sum; the T() prefix-of-scores function is a
    CLOSED FORM (exact integer arithmetic in doubles), so no
    N-row position frame is ever materialized — per-value mid-scores
    and both moments are one aggregate over |distinct values| rows."""
    e = (
        cat(spark, sf_dir)["events"]
        .filter(F.col("event_type").isin(*AB_GROUPS))
        .select(
            "value",
            F.when(F.col("event_type") == AB_GROUPS[0], 1)
            .otherwise(0)
            .alias("g"),
        )
    )
    nn = e.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("g").cast("double").alias("n1"),
    )
    dv = e.groupBy("value").agg(
        F.count(F.lit(1)).cast("double").alias("w"),
        F.sum("g").cast("double").alias("w1"),
    )
    cum = bucketed_cumsum(dv, "value", {"c": F.col("w")})
    ncol = F.col("n")
    sc = cum.crossJoin(F.broadcast(nn)).select(
        "w",
        "w1",
        (
            (_ab_t(F.col("c"), ncol) - _ab_t(F.col("c") - F.col("w"), ncol))
            / F.col("w")
        ).alias("abar"),
    )
    agg = sc.agg(
        F.sum(F.col("w1") * F.col("abar")).alias("ab"),
        F.sum(F.col("w") * (F.col("abar") * F.col("abar"))).alias("s2"),
    )
    fin = nn.crossJoin(F.broadcast(agg)).select(
        F.col("n1"),
        (ncol - F.col("n1")).alias("n2"),
        F.col("ab"),
        (F.col("n1") * (_ab_t(ncol, ncol) / ncol)).alias("expected"),
        (
            (F.col("n1") * (ncol - F.col("n1")) / (ncol - 1))
            * (
                F.col("s2") / ncol
                - (_ab_t(ncol, ncol) / ncol) * (_ab_t(ncol, ncol) / ncol)
            )
        ).alias("variance"),
    )
    return fin.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        rnd(F.col("ab"), 4).alias("ab_statistic"),
        rnd(F.col("expected"), 4).alias("expected"),
        rnd(
            (F.col("ab") - F.col("expected")) / F.sqrt(F.col("variance")), 4
        ).alias("z"),
    )
