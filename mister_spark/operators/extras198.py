"""Wave 198: amplitude-domain complexity and directed information flow.

ev_sample_entropy is SampEn(m=2, r=0.2*sd) of daily event volume — the
amplitude-based regularity measure: how often do 2-day shapes that
match within tolerance r KEEP matching one day longer?
stat_permutation_entropy (wave 196) sees only ordinal shapes and is
blind to magnitude; SampEn is the complement that physiology and
anomaly-detection literatures standardized on. ev_transfer_entropy is
the Schreiber transfer entropy between the binarized click and
purchase daily series — DIRECTED predictive information flow, the
model-free counterpart of stat_granger (which is linear-VAR-bound)
and the asymmetric counterpart of ev_cross_correlation.

Exactness: day counts are integers; the SampEn tolerance compare is
|int - int| <= r with r derived from integer moment sums (the same
double in both engines), the above-mean binarization is the integer
inequality n*y_t > sum(y), and every transfer-entropy cell is an
integer count — only the final LN-sum divisions are float, inside the
rounding grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
SAMPEN_R_FRAC = 0.2  # tolerance as a fraction of the day-series sd


@query(
    "ev_sample_entropy",
    # Real oracle: templates come from integer lag equi-joins; the
    # tolerance r = 0.2*sqrt((n*syy - sy^2)/(n*(n-1))) is computed
    # from exact integer sums, so both engines compare the identical
    # double against integer absolute differences — every A/B pair
    # count is exact, and only -LN(A/B) is float, inside the grid.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS BIGINT) AS y
               FROM events GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy,
                 SUM(y * y) AS syy
          FROM d),
    r AS (SELECT n, {SAMPEN_R_FRAC} * SQRT(
                   CAST(n * syy - sy * sy AS DOUBLE) / (n * (n - 1)))
                 AS tol
          FROM m WHERE n > 1),
    w2 AS (SELECT d0.t, d0.y AS a, d1.y AS b
           FROM d d0 JOIN d d1 ON d1.t = d0.t + 1),
    w3 AS (SELECT d0.t, d0.y AS a, d1.y AS b, d2.y AS c
           FROM d d0 JOIN d d1 ON d1.t = d0.t + 1
                     JOIN d d2 ON d2.t = d0.t + 2),
    bm AS (SELECT CAST(COUNT(*) AS BIGINT) AS b_pairs
           FROM w2 i JOIN w2 j ON i.t < j.t, r
           WHERE GREATEST(ABS(i.a - j.a), ABS(i.b - j.b)) <= r.tol),
    am AS (SELECT CAST(COUNT(*) AS BIGINT) AS a_pairs
           FROM w3 i JOIN w3 j ON i.t < j.t, r
           WHERE GREATEST(ABS(i.a - j.a), ABS(i.b - j.b),
                          ABS(i.c - j.c)) <= r.tol)
    SELECT r.n AS n_days,
           FLOOR(r.tol * 1e4 + 0.5) / 1e4 AS tolerance_r,
           bm.b_pairs AS template_matches_m,
           am.a_pairs AS template_matches_m1,
           CASE WHEN am.a_pairs > 0 AND bm.b_pairs > 0
                THEN FLOOR(-LN(CAST(am.a_pairs AS DOUBLE) / bm.b_pairs)
                           * 1e6 + 0.5) / 1e6
                ELSE 0.0 END AS sampen
    FROM r, bm, am
    """,
)
def ev_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample entropy of daily event volume: count day pairs whose
    2-day templates match within r = 0.2*sd under the Chebyshev
    (max-coordinate) distance, count how many still match at length
    3, and report -ln(A/B). Low SampEn = matching shapes keep
    matching (regular, forecastable dynamics); high = history stops
    predicting one step further out. The amplitude-domain twin of
    stat_permutation_entropy: a series with huge-vs-tiny alternating
    swings and one with 1-unit jitter have the SAME ordinal patterns
    but very different SampEn.

    Scale: ONE day-grain count collapses events to the calendar-
    bounded frame; templates are integer lag equi-joins and the
    pair stage is the documented model-sized day-frame self-join
    (O(days^2) cells, not O(rows)). The 100 TB cost is the first
    groupBy — map-side combinable."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint()  # feeds five join aliases
    )
    m = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    r = m.filter(F.col("n") > 1).select(
        "n",
        (
            SAMPEN_R_FRAC
            * F.sqrt(
                (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
                / (F.col("n") * (F.col("n") - 1))
            )
        ).alias("tol"),
    )
    d1 = d.select((F.col("t") - 1).alias("t"), F.col("y").alias("b"))
    d2 = d.select((F.col("t") - 2).alias("t"), F.col("y").alias("c"))
    w2 = d.select("t", F.col("y").alias("a")).join(d1, "t").localCheckpoint()
    w3 = w2.join(d2, "t").localCheckpoint()

    def _pair_count(w, cols, alias):
        i = w.select(
            F.col("t").alias("ti"), *[F.col(c).alias(f"{c}i") for c in cols]
        )
        j = w.select(
            F.col("t").alias("tj"), *[F.col(c).alias(f"{c}j") for c in cols]
        )
        dist = F.greatest(
            *[F.abs(F.col(f"{c}i") - F.col(f"{c}j")) for c in cols]
        )
        return (
            i.join(j, F.col("ti") < F.col("tj"))
            .crossJoin(F.broadcast(r))
            .filter(dist <= F.col("tol"))
            .agg(F.count(F.lit(1)).alias(alias))
        )

    bm = _pair_count(w2, ["a", "b"], "b_pairs")
    am = _pair_count(w3, ["a", "b", "c"], "a_pairs")
    fin = r.crossJoin(F.broadcast(bm)).crossJoin(F.broadcast(am))
    sampen = F.when(
        (F.col("a_pairs") > 0) & (F.col("b_pairs") > 0),
        rnd(
            -F.log(
                F.col("a_pairs").cast("double") / F.col("b_pairs")
            ),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return fin.select(
        F.col("n").alias("n_days"),
        rnd(F.col("tol"), 4).alias("tolerance_r"),
        F.col("b_pairs").cast("bigint").alias("template_matches_m"),
        F.col("a_pairs").cast("bigint").alias("template_matches_m1"),
        sampen.alias("sampen"),
    )


# the two daily series: does CLICK volume predict PURCHASE volume?
TE_SRC = "click"
TE_DST = "purchase"


def _te_cell_sql(src: str, dst: str) -> str:
    """Transfer-entropy TE(src -> dst) from the binarized day frame
    `bz(t, xs, xd)` — a SQL fragment shared by both directions."""
    return f"""
    (SELECT SUM(CAST(c.k AS DOUBLE) / nn.nt
                * LN(CAST(c.k AS DOUBLE) * m0.k
                     / (CAST(m1.k AS DOUBLE) * m2.k)))
     FROM (SELECT cur.{dst} AS y1, prv.{dst} AS y0, prv.{src} AS x0,
                  CAST(COUNT(*) AS BIGINT) AS k
           FROM bz cur JOIN bz prv ON prv.t = cur.t - 1
           GROUP BY 1, 2, 3) c
     JOIN (SELECT prv.{dst} AS y0, CAST(COUNT(*) AS BIGINT) AS k
           FROM bz cur JOIN bz prv ON prv.t = cur.t - 1
           GROUP BY 1) m0 ON m0.y0 = c.y0
     JOIN (SELECT prv.{dst} AS y0, prv.{src} AS x0,
                  CAST(COUNT(*) AS BIGINT) AS k
           FROM bz cur JOIN bz prv ON prv.t = cur.t - 1
           GROUP BY 1, 2) m1 ON m1.y0 = c.y0 AND m1.x0 = c.x0
     JOIN (SELECT cur.{dst} AS y1, prv.{dst} AS y0,
                  CAST(COUNT(*) AS BIGINT) AS k
           FROM bz cur JOIN bz prv ON prv.t = cur.t - 1
           GROUP BY 1, 2) m2 ON m2.y1 = c.y1 AND m2.y0 = c.y0,
     nn)"""


@query(
    "ev_transfer_entropy",
    # Real oracle: binarization is the integer inequality
    # n*y_t > sum(y) (no float threshold), every TE cell/marginal is
    # an integer count over the same transition frame, and the
    # closed-form plug-in sum divides identical integers — only the
    # final LN terms are float, inside the grid.
    oracle=f"""
    WITH raw AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                     AS t,
                     CAST(SUM(CASE WHEN event_type = '{TE_SRC}'
                              THEN 1 ELSE 0 END) AS BIGINT) AS xs,
                     CAST(SUM(CASE WHEN event_type = '{TE_DST}'
                              THEN 1 ELSE 0 END) AS BIGINT) AS xd
                 FROM events GROUP BY 1),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(xs) AS ss,
                 SUM(xd) AS sd FROM raw),
    bz AS (SELECT raw.t,
                  CASE WHEN m.n * raw.xs > m.ss THEN 1 ELSE 0 END AS {TE_SRC},
                  CASE WHEN m.n * raw.xd > m.sd THEN 1 ELSE 0 END
                    AS {TE_DST}
           FROM raw, m),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nt
           FROM bz cur JOIN bz prv ON prv.t = cur.t - 1),
    te AS (SELECT {_te_cell_sql(TE_SRC, TE_DST)} AS te_fwd,
                  {_te_cell_sql(TE_DST, TE_SRC)} AS te_rev)
    SELECT (SELECT CAST(nt AS BIGINT) FROM nn) AS n_transitions,
           FLOOR(COALESCE(te_fwd, 0.0) * 1e6 + 0.5) / 1e6
             AS te_click_to_purchase,
           FLOOR(COALESCE(te_rev, 0.0) * 1e6 + 0.5) / 1e6
             AS te_purchase_to_click,
           CASE WHEN FLOOR(COALESCE(te_fwd, 0.0) * 1e6 + 0.5)
                     > FLOOR(COALESCE(te_rev, 0.0) * 1e6 + 0.5)
                THEN '{TE_SRC}->{TE_DST}'
                WHEN FLOOR(COALESCE(te_rev, 0.0) * 1e6 + 0.5)
                     > FLOOR(COALESCE(te_fwd, 0.0) * 1e6 + 0.5)
                THEN '{TE_DST}->{TE_SRC}'
                ELSE 'none' END AS dominant_direction
    FROM te
    """,
)
def ev_transfer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transfer entropy between the binarized (above-mean) daily click
    and purchase series, both directions: TE(x->y) = I(y_t+1 ;
    x_t | y_t) — how much does knowing yesterday's CLICK state reduce
    uncertainty about today's PURCHASE state beyond what yesterday's
    purchase state already said? Unlike correlation it is directional
    and model-free: a nonlinear driver that a VAR (stat_granger)
    misses still shows up, and TE(x->y) != TE(y->x) names the driver.
    The plug-in estimate is the exact count form
    sum k(y1,y0,x0)/N * ln[k(y1,y0,x0)*k(y0) / (k(y0,x0)*k(y1,y0))].

    Scale: ONE day-grain conditional count collapses events; the
    transition frame is an integer lag equi-join on the
    calendar-bounded day frame; cells/marginals are <= 8/4-row
    aggregates. Map-side combinable end to end."""
    raw = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias(
                "t"
            ),
            "event_type",
        )
        .groupBy("t")
        .agg(
            F.sum(
                F.when(F.col("event_type") == TE_SRC, 1).otherwise(0)
            ).alias("xs"),
            F.sum(
                F.when(F.col("event_type") == TE_DST, 1).otherwise(0)
            ).alias("xd"),
        )
    )
    m = raw.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xs").alias("ss"),
        F.sum("xd").alias("sd"),
    )
    bz = (
        raw.crossJoin(F.broadcast(m))
        .select(
            "t",
            F.when(F.col("n") * F.col("xs") > F.col("ss"), 1)
            .otherwise(0)
            .alias("s"),
            F.when(F.col("n") * F.col("xd") > F.col("sd"), 1)
            .otherwise(0)
            .alias("p"),
        )
        .localCheckpoint()  # feeds both lag aliases of both directions
    )
    prv = bz.select(
        (F.col("t") + 1).alias("t"),
        F.col("s").alias("s0"),
        F.col("p").alias("p0"),
    )
    trans = (
        bz.join(prv, "t")
        .select(
            F.col("s").alias("s1"),
            F.col("p").alias("p1"),
            "s0",
            "p0",
        )
        .localCheckpoint()  # 1 join; feeds all cell/marginal aggregates
    )
    nt = trans.agg(F.count(F.lit(1)).cast("double").alias("nt"))

    def _te(x0_col: str, y0_col: str, y1_col: str):
        c = trans.groupBy(
            F.col(y1_col).alias("y1"),
            F.col(y0_col).alias("y0"),
            F.col(x0_col).alias("x0"),
        ).agg(F.count(F.lit(1)).alias("k"))
        m0 = trans.groupBy(F.col(y0_col).alias("y0")).agg(
            F.count(F.lit(1)).alias("k0")
        )
        m1 = trans.groupBy(
            F.col(y0_col).alias("y0"), F.col(x0_col).alias("x0")
        ).agg(F.count(F.lit(1)).alias("k1"))
        m2 = trans.groupBy(
            F.col(y1_col).alias("y1"), F.col(y0_col).alias("y0")
        ).agg(F.count(F.lit(1)).alias("k2"))
        return (
            c.join(F.broadcast(m0), "y0")
            .join(F.broadcast(m1), ["y0", "x0"])
            .join(F.broadcast(m2), ["y1", "y0"])
            .crossJoin(F.broadcast(nt))
            .agg(
                F.sum(
                    F.col("k").cast("double")
                    / F.col("nt")
                    * F.log(
                        F.col("k").cast("double")
                        * F.col("k0")
                        / (F.col("k1").cast("double") * F.col("k2"))
                    )
                ).alias("te")
            )
        )

    fwd = _te("s0", "p0", "p1").withColumnRenamed("te", "te_fwd")
    rev = _te("p0", "s0", "s1").withColumnRenamed("te", "te_rev")
    fin = (
        nt.crossJoin(F.broadcast(fwd)).crossJoin(F.broadcast(rev))
    )
    tf = rnd(F.coalesce(F.col("te_fwd"), F.lit(0.0)), 6)
    tr = rnd(F.coalesce(F.col("te_rev"), F.lit(0.0)), 6)
    return fin.select(
        F.col("nt").cast("bigint").alias("n_transitions"),
        tf.alias("te_click_to_purchase"),
        tr.alias("te_purchase_to_click"),
        F.when(tf > tr, F.lit(f"{TE_SRC}->{TE_DST}"))
        .when(tr > tf, F.lit(f"{TE_DST}->{TE_SRC}"))
        .otherwise(F.lit("none"))
        .alias("dominant_direction"),
    )
