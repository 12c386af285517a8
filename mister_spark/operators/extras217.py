"""Wave 217: seasonal hinge-trend fitting and representative selection.

ev_piecewise_trend is the prophet-style decomposition at its useful
core: remove the additive weekday cycle, then fit a CONTINUOUS
piecewise-linear trend (hinge at the calendar midpoint) by 3x3
normal equations — slope_before/slope_after share the knot value, so
unlike stat_chow_test's two free lines this answers "did growth
BEND?" without allowing a level jump, and the weekday adjustment
stops a Mon/Sun imbalance from masquerading as trend.
ds_facility_location greedily picks k representative documents
maximizing summed max-similarity coverage of the embedding corpus —
the submodular selection behind "choose 6 exemplars that summarize
the dataset" (ds_coreset_kcenter covers the FARTHEST point; facility
location covers the AVERAGE one, the right objective for choosing
few-shot exemplars or eval anchors). All similarity arithmetic runs
in integer 1e-4 grid units, so every greedy argmax is an exact
integer comparison in both engines.

Exactness: the trend fit is Cramer's rule on one conditional-
aggregation pass; the greedy replay is integer coverage sums with
(gain, vec_id) tie-broken argmaxes, unrolled round by round in the
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from mister_spark.functions.vectors import dot as vdot, unit as vunit
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
FL_POOL = 16  # candidate facilities: nearest to the corpus mean
FL_K = 6  # facilities selected


@query(
    "ev_piecewise_trend",
    # Real oracle: weekday effects and the hinge design sums come
    # from exact day-grain integers; the 3x3 Cramer solve and both
    # SSE identities are the same closed forms, rounded on the grid.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    gm AS (SELECT AVG(y) AS g, CAST(FLOOR((MIN(t) + MAX(t)) / 2.0)
                 AS BIGINT) AS knot FROM d),
    wk AS (SELECT t % 7 AS w, AVG(y) AS mw FROM d GROUP BY 1),
    ds AS (SELECT d.t, d.y - (wk.mw - gm.g) AS yd, gm.knot
           FROM d JOIN wk ON wk.w = d.t % 7, gm),
    s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(CAST(t AS DOUBLE)) AS s1,
                 SUM(GREATEST(CAST(t - knot AS DOUBLE), 0)) AS s2,
                 SUM(CAST(t AS DOUBLE) * t) AS s11,
                 SUM(CAST(t AS DOUBLE)
                     * GREATEST(CAST(t - knot AS DOUBLE), 0)) AS s12,
                 SUM(GREATEST(CAST(t - knot AS DOUBLE), 0)
                     * GREATEST(CAST(t - knot AS DOUBLE), 0)) AS s22,
                 SUM(yd) AS sy, SUM(CAST(t AS DOUBLE) * yd) AS sy1,
                 SUM(GREATEST(CAST(t - knot AS DOUBLE), 0) * yd) AS sy2,
                 SUM(yd * yd) AS syy
          FROM ds),
    b AS (SELECT s.*,
                 (s11*s22 - s12*s12)*sy - (s1*s22 - s12*s2)*sy1
                   + (s1*s12 - s11*s2)*sy2 AS n0,
                 -((s1*s22 - s2*s12)*sy) + (n*s22 - s2*s2)*sy1
                   - (n*s12 - s1*s2)*sy2 AS n1,
                 (s1*s12 - s2*s11)*sy - (n*s12 - s2*s1)*sy1
                   + (n*s11 - s1*s1)*sy2 AS n2,
                 n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
                   + s2*(s1*s12 - s11*s2) AS det
          FROM s),
    c AS (SELECT b.*, n0/det AS b0, n1/det AS b1, n2/det AS b2 FROM b),
    lin AS (SELECT c.*,
                   (syy - sy*sy/n)
                   - (sy1 - s1*sy/n)*(sy1 - s1*sy/n)
                     / (s11 - s1*s1/n) AS sse_lin,
                   syy - (b0*sy + b1*sy1 + b2*sy2) AS sse_hinge
            FROM c),
    wkr AS (SELECT MAX(mw) - MIN(mw) AS wrange FROM wk)
    SELECT CAST(n AS BIGINT) AS n_days,
           strftime(DATE '{EPOCH}' + CAST(gm.knot AS INT), '%Y-%m-%d')
             AS knot_date,
           FLOOR(b1 * 1e4 + 0.5) / 1e4 AS slope_before,
           FLOOR((b1 + b2) * 1e4 + 0.5) / 1e4 AS slope_after,
           FLOOR(b2 * 1e4 + 0.5) / 1e4 AS slope_change,
           FLOOR(CASE WHEN sse_lin <= 0 THEN 0.0
                      ELSE 1 - sse_hinge / sse_lin END * 1e4 + 0.5) / 1e4
             AS hinge_gain,
           FLOOR(wkr.wrange * 1e4 + 0.5) / 1e4 AS weekday_range
    FROM lin, gm, wkr
    """,
)
def ev_piecewise_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-adjusted piecewise-linear trend on daily volume: remove
    additive weekday effects (mean per weekday minus grand mean), then
    OLS-fit y = b0 + b1*t + b2*max(0, t - knot) with the knot at the
    calendar midpoint — a trend that may BEND but not JUMP.
    slope_before/slope_after read directly as the growth story; the
    hinge_gain is the SSE share the bend explains over one straight
    line. Chow (stat_chow_test) asks "different line after the
    break?"; this asks the gentler, usually-right question "same
    line, new slope?" — with the weekly cycle already out of the way.

    Scale: ONE day-grain count, a 7-row weekday frame, one
    sufficient-sums pass over the calendar-bounded series, Cramer's
    rule on the 3x3 system — no iteration, no extra scan."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .localCheckpoint()  # calendar-bounded day frame
    )
    gm = d.agg(
        F.avg("y").alias("g"),
        F.floor((F.min("t") + F.max("t")) / 2.0).cast("bigint").alias("knot"),
    )
    wk = d.groupBy((F.col("t") % 7).alias("w")).agg(F.avg("y").alias("mw"))
    ds = (
        d.join(F.broadcast(wk), (F.col("t") % 7) == F.col("w"))
        .crossJoin(F.broadcast(gm))
        .select(
            "t", "knot",
            (F.col("y") - (F.col("mw") - F.col("g"))).alias("yd"),
        )
    )
    td = F.col("t").cast("double")
    h = F.greatest((F.col("t") - F.col("knot")).cast("double"), F.lit(0.0))
    s = ds.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(td).alias("s1"), F.sum(h).alias("s2"),
        F.sum(td * F.col("t")).alias("s11"),
        F.sum(td * h).alias("s12"),
        F.sum(h * h).alias("s22"),
        F.sum("yd").alias("sy"),
        F.sum(td * F.col("yd")).alias("sy1"),
        F.sum(h * F.col("yd")).alias("sy2"),
        F.sum(F.col("yd") * F.col("yd")).alias("syy"),
    )

    def col(name: str) -> Column:
        return F.col(name)

    n, s1, s2 = col("n"), col("s1"), col("s2")
    s11, s12, s22 = col("s11"), col("s12"), col("s22")
    sy, sy1, sy2 = col("sy"), col("sy1"), col("sy2")
    n0 = (
        (s11 * s22 - s12 * s12) * sy
        - (s1 * s22 - s12 * s2) * sy1
        + (s1 * s12 - s11 * s2) * sy2
    )
    n1 = (
        -((s1 * s22 - s2 * s12) * sy)
        + (n * s22 - s2 * s2) * sy1
        - (n * s12 - s1 * s2) * sy2
    )
    n2 = (
        (s1 * s12 - s2 * s11) * sy
        - (n * s12 - s2 * s1) * sy1
        + (n * s11 - s1 * s1) * sy2
    )
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    c = s.select(
        "*",
        (n0 / det).alias("b0"), (n1 / det).alias("b1"),
        (n2 / det).alias("b2"),
    )
    sse_lin = (col("syy") - sy * sy / n) - (sy1 - s1 * sy / n) * (
        sy1 - s1 * sy / n
    ) / (s11 - s1 * s1 / n)
    sse_hinge = col("syy") - (
        col("b0") * sy + col("b1") * sy1 + col("b2") * sy2
    )
    wkr = wk.agg((F.max("mw") - F.min("mw")).alias("wrange"))
    return (
        c.crossJoin(F.broadcast(gm))
        .crossJoin(F.broadcast(wkr))
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            F.date_format(
                F.date_add(
                    F.lit(EPOCH).cast("date"), F.col("knot").cast("int")
                ),
                "yyyy-MM-dd",
            ).alias("knot_date"),
            rnd(F.col("b1"), 4).alias("slope_before"),
            rnd(F.col("b1") + F.col("b2"), 4).alias("slope_after"),
            rnd(F.col("b2"), 4).alias("slope_change"),
            rnd(
                F.when(sse_lin <= 0, F.lit(0.0)).otherwise(
                    1 - sse_hinge / sse_lin
                ),
                4,
            ).alias("hinge_gain"),
            rnd(F.col("wrange"), 4).alias("weekday_range"),
        )
    )


def _fl_oracle() -> str:
    """Unrolled greedy facility-location replay: candidates = the
    {FL_POOL} vectors nearest the corpus mean direction, then FL_K
    exact-integer argmax rounds over grid similarities."""
    unit = (
        "list_transform({v}, x -> x / GREATEST(SQRT(list_reduce("
        "list_prepend(CAST(0 AS DOUBLE), list_transform({v}, y -> y * y)),"
        " (a, b) -> a + b)), 1e-12))"
    )
    dot = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        " list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i])),"
        " (p, q) -> p + q)"
    )
    head = f"""
    WITH un AS MATERIALIZED (
      SELECT vec_id, {unit.format(v="CAST(embedding AS DOUBLE[])")} AS u
      FROM embeddings),
    mv0 AS (SELECT p.i, AVG(p.x) AS m FROM (
              SELECT t.i AS i, u.u[t.i] AS x
              FROM un u CROSS JOIN LATERAL
                   (SELECT unnest(generate_series(1, len(u.u))) AS i) t) p
            GROUP BY 1),
    mv AS (SELECT list(m ORDER BY i) AS mu FROM mv0),
    cand AS MATERIALIZED (
      SELECT vec_id, u FROM (
        SELECT un.vec_id, un.u,
               ROW_NUMBER() OVER (ORDER BY
                 CAST(FLOOR({dot.format(a="un.u",
                    b=unit.format(v="mv.mu"))} * 1e4 + 0.5) AS BIGINT)
                 DESC, un.vec_id) AS rk
        FROM un, mv) WHERE rk <= {FL_POOL}),
    sims AS MATERIALIZED (
      SELECT c.vec_id AS c, un.vec_id AS p,
             GREATEST(CAST(FLOOR({dot.format(a="c.u", b="un.u")}
               * 1e4 + 0.5) AS BIGINT), 0) AS s
      FROM cand c, un),
    cov0 AS (SELECT vec_id AS p, CAST(0 AS BIGINT) AS cov FROM un)"""
    rounds = []
    for r in range(1, FL_K + 1):
        prev = f"cov{r - 1}"
        rounds.append(f"""
    gain{r} AS (SELECT s.c,
                       SUM(GREATEST(s.s - cv.cov, 0)) AS gain
                FROM sims s JOIN {prev} cv ON cv.p = s.p
                WHERE s.c NOT IN (SELECT c FROM picked{r - 1})
                GROUP BY 1),
    sel{r} AS (SELECT c, gain FROM gain{r}
               ORDER BY gain DESC, c LIMIT 1),
    picked{r} AS (SELECT c FROM picked{r - 1}
                  UNION ALL SELECT c FROM sel{r}),
    cov{r} AS (SELECT cv.p,
                      GREATEST(cv.cov, COALESCE(s.s, 0)) AS cov
               FROM {prev} cv
               LEFT JOIN (SELECT s2.p, s2.s FROM sims s2, sel{r}
                          WHERE s2.c = sel{r}.c) s ON s.p = cv.p)""")
    picks = " UNION ALL ".join(
        f"SELECT {r} AS sel_round, sel{r}.c AS vec_id, sel{r}.gain AS g,"
        f" (SELECT SUM(cov) FROM cov{r}) AS tot FROM sel{r}"
        for r in range(1, FL_K + 1)
    )
    return (
        head
        + ",\n    picked0 AS (SELECT CAST(NULL AS BIGINT) AS c WHERE FALSE),"
        + ",".join(rounds)
        + f"""
    SELECT sel_round, vec_id,
           g / 1e4 AS marginal_gain,
           tot / 1e4 AS total_coverage
    FROM ({picks})
    """
    )


@query("ds_facility_location", oracle=_fl_oracle())
def ds_facility_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy facility location over the embedding corpus: from the
    {pool} candidates nearest the corpus mean direction, pick {k}
    facilities one at a time, each maximizing the SUMMED coverage
    improvement sum_u max(cov_u, sim(u, c)) (sims clamped at 0 and
    carried as integer 1e-4 grid units, so every argmax is an exact
    integer compare). The classic submodular exemplar selection — the
    greedy choice is within (1 - 1/e) of optimal — used to pick
    few-shot exemplars, eval anchors, or dedup representatives.
    ds_coreset_kcenter optimizes the worst-covered point; this
    optimizes the average one. Marginal gains decrease round by round
    (submodularity made visible in the output).

    Scale: candidate sims are ONE |pool| x n broadcast join
    (pool is O(1)); each greedy round is a grouped integer sum plus a
    1-row argmax collect, with the coverage vector updated
    distributed — n never concentrates on the driver."""
    emb = (
        cat(spark, sf_dir)["embeddings"]
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        # norm-once unit vectors: see functions.vectors.unit (norm
        # spelled inside the division lambda re-evaluates per element)
        .select("vec_id", vunit(F.col("v")).alias("u"))
        .localCheckpoint()  # unit vectors; feeds mean, cands, sims
    )
    dim = len(emb.select("u").first()["u"])
    mean = emb.agg(
        F.array(
            *[F.avg(F.col("u")[i]) for i in range(dim)]
        ).alias("m")
    )
    mu = vunit(F.col("m"))
    cand = (
        emb.crossJoin(F.broadcast(mean.select(mu.alias("mu"))))
        .select(
            "vec_id", "u",
            F.floor(vdot(F.col("u"), F.col("mu")) * 1e4 + F.lit(0.5))
            .cast("bigint")
            .alias("sm"),
        )
        .orderBy(F.col("sm").desc(), "vec_id")
        .limit(FL_POOL)
        .select("vec_id", "u")
    )
    sims = (
        emb.select(F.col("vec_id").alias("p"), F.col("u").alias("up"))
        .crossJoin(
            F.broadcast(
                cand.select(F.col("vec_id").alias("c"), F.col("u").alias("uc"))
            )
        )
        .select(
            "p", "c",
            F.greatest(
                F.floor(vdot(F.col("up"), F.col("uc")) * 1e4 + F.lit(0.5))
                .cast("bigint"),
                F.lit(0),
            ).alias("s"),
        )
        .localCheckpoint()  # |pool| x n integer grid sims
    )
    cov = emb.select(
        F.col("vec_id").alias("p"), F.lit(0).cast("bigint").alias("cov")
    ).localCheckpoint()
    picked: list[int] = []
    out = []
    tot = 0  # telescopes: sum_p cov_p == running sum of integer gains,
    # so the old per-round sum(cov) job was a third distributed pass
    # per round recomputing a number the driver already has (guide §1.2)
    for rnum in range(1, FL_K + 1):
        gains = (
            sims.filter(~F.col("c").isin(picked) if picked else F.lit(True))
            .join(cov, "p")
            .groupBy("c")
            .agg(
                F.sum(F.greatest(F.col("s") - F.col("cov"), F.lit(0))).alias(
                    "gain"
                )
            )
        )
        sel = gains.orderBy(F.col("gain").desc(), "c").limit(1).collect()[0]
        picked.append(sel["c"])
        tot += int(sel["gain"])
        if rnum < FL_K:  # the final round's coverage is never read again
            cov = (
                cov.join(
                    sims.filter(F.col("c") == sel["c"]).select("p", "s"),
                    "p",
                    "left",
                )
                .select(
                    "p",
                    F.greatest(
                        F.col("cov"), F.coalesce(F.col("s"), F.lit(0))
                    ).alias("cov"),
                )
                .localCheckpoint()  # coverage stays distributed per round
            )
        out.append(
            (rnum, int(sel["c"]), int(sel["gain"]) / 1e4, tot / 1e4)
        )
    return spark.createDataFrame(
        out,
        "sel_round int, vec_id long, marginal_gain double, "
        "total_coverage double",
    )


ds_facility_location.__doc__ = ds_facility_location.__doc__.format(
    pool=FL_POOL, k=FL_K
)
