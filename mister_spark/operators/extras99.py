"""Wave 99: the VARIANT semi-structured type, multivariate two-sample
testing, and sequential drift detection.

sql_variant_json pins Spark 4's VARIANT type (parse_json once,
variant_get typed extraction) — the open-format answer to schemaless
columns that beats per-query string re-parsing; stat_hotelling_t2 is
the multivariate two-sample test — ONE test over all 64 embedding
dimensions instead of 64 t-tests and a multiple-comparisons apology;
ev_page_hinkley is the Page–Hinkley sequential drift detector over
the daily mean series — the streaming-friendly change alarm with an
explicit detection delay, run here as a replay with the alarm day
reported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.operators.common import cat, ratio
from mister_spark.operators.duck_linalg import duck_spd_solve
from mister_spark.operators.extras84 import _emb_cov_stats
from mister_spark.registry import query

PH_DELTA = 0.05  # magnitude tolerance (in units of day-mean value)
PH_LAMBDA = 8.0  # alarm threshold
T2_RIDGE = 1e-6


@query(
    "sql_variant_json",
    oracle="""
    WITH x AS (SELECT event_type,
                      CAST(json_extract(props, '$.k') AS BIGINT) AS k
               FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           CAST(MAX(k) AS BIGINT) AS k_max,
           FLOOR(AVG(CAST(k AS DOUBLE)) * 10000 + 0.5) / 10000 AS k_avg
    FROM x GROUP BY 1
    """,
)
def sql_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured surface: parse the props JSON ONCE into
    Spark 4's VARIANT type, then extract typed fields with
    variant_get — the schemaless-column pattern where the binary
    variant encoding is parsed at ingest, not re-tokenized by every
    query the way get_json_object strings are. The oracle reads the
    same numbers via plain JSON extraction, proving the encoding is
    semantics-preserving.

    Scale: parse_json is a narrow map; the rollup is one partial-agg
    shuffle to |types| rows. At 100 TB the variant column would be
    materialized once at ingest and every downstream query skips the
    parse entirely."""
    ev = cat(spark, sf_dir)["events"]
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("k_sum"),
        F.max("k").cast("bigint").alias("k_max"),
        ratio(F.avg(F.col("k").cast("double"))).alias("k_avg"),
    )


@query(
    "stat_hotelling_t2",
    # Real oracle: per-parity sufficient statistics (sums + raw
    # second moments) assemble the pooled ridge-regularized scatter
    # as a DOUBLE[][] literal-shaped CTE, and the d×d solve runs as
    # the shared Cholesky recursion (duck_linalg.duck_spd_solve) —
    # the same algebra numpy's LU performs, agreeing to ~1e-13 which
    # the 1e-4 output grid absorbs.
    oracle=f"""
    WITH RECURSIVE
    ex AS (SELECT CAST(embedding AS DOUBLE[]) AS v,
                  CAST(label % 2 AS INT) AS g
           FROM embeddings),
    cnt AS (SELECT g, CAST(COUNT(*) AS DOUBLE) AS n FROM ex GROUP BY g),
    sums AS (SELECT g, u.dim AS dim, SUM(v[u.dim]) AS s
             FROM ex CROSS JOIN LATERAL
               (SELECT unnest(range(1, 65)) AS dim) u
             GROUP BY g, u.dim),
    ssq AS (SELECT g, p.i AS i, p.j AS j, SUM(v[p.i] * v[p.j]) AS ss
            FROM ex CROSS JOIN LATERAL (
              SELECT i.i AS i, j.j AS j
              FROM (SELECT unnest(range(1, 65)) AS i) i,
                   (SELECT unnest(range(1, 65)) AS j) j) p
            GROUP BY g, p.i, p.j),
    tot AS (SELECT SUM(n) AS n FROM cnt),
    mat AS (SELECT list(row ORDER BY i) AS a FROM (
        SELECT z.i AS i, list(z.val ORDER BY z.j) AS row FROM (
          SELECT q.i, q.j,
                 SUM(q.ss - si.s * sj.s / c.n) / (t.n - 2)
                 + CASE WHEN q.i = q.j THEN {T2_RIDGE} ELSE 0.0 END AS val
          FROM ssq q
          JOIN cnt c USING (g)
          JOIN sums si ON si.g = q.g AND si.dim = q.i
          JOIN sums sj ON sj.g = q.g AND sj.dim = q.j
          CROSS JOIN tot t
          GROUP BY q.i, q.j, t.n) z
        GROUP BY z.i) zz),
    dif AS (SELECT list(d ORDER BY dim) AS diff FROM (
        SELECT s0.dim AS dim, s0.s / c0.n - s1.s / c1.n AS d
        FROM sums s0 JOIN sums s1 ON s0.dim = s1.dim
                     AND s0.g = 0 AND s1.g = 1
        CROSS JOIN (SELECT n FROM cnt WHERE g = 0) c0
        CROSS JOIN (SELECT n FROM cnt WHERE g = 1) c1) q),
    rhs AS (SELECT [diff] AS b FROM dif),
    {duck_spd_solve(64, 1)},
    t2v AS (SELECT (c0.n * c1.n) / (c0.n + c1.n)
                   * list_aggregate(list_transform(range(1, 65),
                       i -> dif.diff[i] * sol.x[1][i]), 'sum') AS t2,
                   c0.n AS n0, c1.n AS n1
            FROM sol CROSS JOIN dif
            CROSS JOIN (SELECT n FROM cnt WHERE g = 0) c0
            CROSS JOIN (SELECT n FROM cnt WHERE g = 1) c1)
    SELECT CAST(n0 AS BIGINT) AS n_even, CAST(n1 AS BIGINT) AS n_odd,
           CAST(64 AS BIGINT) AS dim,
           FLOOR(t2 * 1e4 + 0.5) / 1e4 AS t2,
           FLOOR(t2 * (n0 + n1 - 64 - 1) / (64 * (n0 + n1 - 2)) * 1e4 + 0.5)
             / 1e4 AS f_stat,
           CAST(64 AS BIGINT) AS df1,
           CAST(n0 + n1 - 64 - 1 AS BIGINT) AS df2
    FROM t2v
    """,
)
def stat_hotelling_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hotelling's T² two-sample test between even- and odd-labeled
    embedding populations: T² = (nm/(n+m))·(μ₁−μ₂)ᵀ S_pooled⁻¹
    (μ₁−μ₂), reported with its F-statistic form — one multivariate
    answer to 'do these two embedding populations differ' instead of
    d marginal t-tests. Label parity is an A/A-ish split, so a small
    F is the expected (and asserted) outcome.

    Scale: per-group sufficient statistics come from one Arrow pass
    each (O(d²) per partition — the pca_train split); the d×d solve
    is driver-side; nothing data-sized is ever collected."""
    import numpy as np
    import pandas as pd

    emb = cat(spark, sf_dir)["embeddings"]

    def stats(flag: int):
        sub = emb.filter((F.col("label") % 2) == flag).select(
            F.col("embedding").cast("array<double>").alias("v")
        )

        def partials(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.array(list(pdf["v"]), dtype=np.float64)
                yield pd.DataFrame(
                    {
                        "n": [len(X)],
                        "s": [X.sum(axis=0).tolist()],
                        "ss": [(X.T @ X).ravel().tolist()],
                    }
                )

        rows = sub.mapInPandas(
            partials, "n long, s array<double>, ss array<double>"
        ).collect()
        n = sum(r["n"] for r in rows)
        d = len(rows[0]["s"])
        s = np.sum([np.array(r["s"]) for r in rows], axis=0)
        ss = np.sum(
            [np.array(r["ss"]).reshape(d, d) for r in rows], axis=0
        )
        mu = s / n
        scatter = ss - np.outer(s, s) / n
        return n, mu, scatter

    n1, mu1, sc1 = stats(0)
    n2, mu2, sc2 = stats(1)
    d = len(mu1)
    sp = (sc1 + sc2) / (n1 + n2 - 2) + T2_RIDGE * np.eye(d)
    diff = mu1 - mu2
    t2 = float(
        (n1 * n2) / (n1 + n2) * diff @ np.linalg.solve(sp, diff)
    )
    fstat = t2 * (n1 + n2 - d - 1) / (d * (n1 + n2 - 2))
    # floor-grid rounding (common.rnd's form) so the DuckDB oracle's
    # FLOOR(x*1e4+0.5)/1e4 is the identical double arithmetic
    import math

    row = (
        int(n1),
        int(n2),
        d,
        math.floor(t2 * 1e4 + 0.5) / 1e4,
        math.floor(fstat * 1e4 + 0.5) / 1e4,
        d,
        int(n1 + n2 - d - 1),
    )
    return spark.createDataFrame(
        [row],
        "n_even long, n_odd long, dim long, t2 double, f_stat double, "
        "df1 long, df2 long",
    )


@query(
    "ev_page_hinkley",
    # Real oracle: the O(1)-state sequential scan is pure window
    # algebra — running mean, cumulative deviation, running min, and
    # the first alarm via a min-over-qualifying-days. No recursion
    # needed; day means are identical in both engines and the scan
    # accumulates in day order on both sides.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(date_trunc('day', ts) AS DATE)) AS day,
                      AVG(value) AS x
               FROM events GROUP BY 1),
    seq AS (SELECT day, x,
                   AVG(x) OVER (ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS rmean
            FROM d),
    c AS (SELECT day,
                 SUM(x - rmean - {PH_DELTA}) OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
          FROM seq),
    p AS (SELECT day, cum,
                 cum - LEAST(CAST(0.0 AS DOUBLE),
                             MIN(cum) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)) AS ph
          FROM c),
    alarm AS (SELECT day, ph,
                     ROW_NUMBER() OVER (ORDER BY day) AS rn
              FROM p WHERE ph > {PH_LAMBDA}),
    fin AS (SELECT ph AS final_ph FROM p ORDER BY day DESC LIMIT 1)
    SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_days,
           CAST(CASE WHEN EXISTS (SELECT 1 FROM alarm) THEN 1 ELSE 0 END
                AS BIGINT) AS alarmed,
           CAST(COALESCE((SELECT day FROM alarm WHERE rn = 1), -1)
                AS BIGINT) AS alarm_day,
           COALESCE((SELECT FLOOR(ph * 10000 + 0.5) / 10000
                     FROM alarm WHERE rn = 1), 0.0) AS ph_at_alarm,
           (SELECT FLOOR(final_ph * 10000 + 0.5) / 10000 FROM fin)
             AS final_ph
    """,
)
def ev_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley sequential drift detector on the daily mean event
    value: maintain the cumulative deviation from the running mean
    (minus tolerance δ={d}); alarm when it exceeds its running
    minimum by λ={l}. The detector a STREAM can run with O(1) state —
    replayed here over the bounded series, reporting whether/when it
    alarms and the final PH statistic.

    Scale: the rollup is one partial-agg shuffle; the scan is O(days)
    driver arithmetic with O(1) state — the same loop a foreachBatch
    deployment carries."""
    ev = cat(spark, sf_dir)["events"]
    rows = (
        ev.groupBy(
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias(
                "day"
            )
        )
        .agg(F.avg("value").alias("m"))
        .orderBy("day")
        .collect()
    )
    import math

    days = [int(r["day"]) for r in rows]
    xs = [float(r["m"]) for r in rows]
    # running mean as prefix-sum / count (identical arithmetic to the
    # oracle's windowed AVG — the incremental mean+(x-mean)/n form
    # drifts from it at the last ulp), cross-engine floor rounding
    xsum = 0.0
    cum = 0.0
    cmin = 0.0
    alarm_day = None
    ph_at_alarm = None
    for i, x in enumerate(xs):
        xsum += x
        mean = xsum / (i + 1)
        cum += x - mean - PH_DELTA
        cmin = min(cmin, cum)
        ph = cum - cmin
        if alarm_day is None and ph > PH_LAMBDA:
            alarm_day = days[i]
            ph_at_alarm = ph
    final_ph = cum - cmin
    row = (
        len(xs),
        1 if alarm_day is not None else 0,
        alarm_day if alarm_day is not None else -1,
        math.floor(ph_at_alarm * 10000 + 0.5) / 10000
        if ph_at_alarm is not None
        else 0.0,
        math.floor(final_ph * 10000 + 0.5) / 10000,
    )
    return spark.createDataFrame(
        [row],
        "n_days long, alarmed long, alarm_day long, ph_at_alarm double, "
        "final_ph double",
    )


ev_page_hinkley.__doc__ = ev_page_hinkley.__doc__.format(
    d=PH_DELTA, l=PH_LAMBDA
)
