"""Wave 196: nonlinear-dynamics complexity of the event series.

stat_permutation_entropy is Bandt-Pompe ordinal complexity (order 3)
of daily event volume: how unpredictable are the SHAPES of
consecutive-day triples, a measure invariant to any monotone
transform of the values — stat_entropy sees the value distribution,
this sees the dynamics. ev_recurrence_quantification is recurrence
quantification analysis (RQA): recurrence rate, determinism, and the
longest diagonal line of the thresholded self-distance matrix — the
standard detector for deterministic structure (periodicity, regime
loops) that spectral tools miss when the signal is non-sinusoidal.

Both run on the calendar-bounded day frame with integer counts, so
every comparison and count is exact in both engines; only the final
entropy/ratio divisions touch floats, inside the rounding grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import Window as W

from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

# stable Bandt-Pompe ranks for the triple (a, b, c) = days t, t+1, t+2
# (ties rank the EARLIER day lower — the standard stable convention)
_PAT_SQL = (
    "CAST(CAST((CASE WHEN b < a THEN 1 ELSE 0 END)"
    " + (CASE WHEN c < a THEN 1 ELSE 0 END) AS INT) AS STRING)"
    " || CAST(CAST((CASE WHEN a <= b THEN 1 ELSE 0 END)"
    " + (CASE WHEN c < b THEN 1 ELSE 0 END) AS INT) AS STRING)"
    " || CAST(CAST((CASE WHEN a <= c THEN 1 ELSE 0 END)"
    " + (CASE WHEN b <= c THEN 1 ELSE 0 END) AS INT) AS STRING)"
)


@query(
    "stat_permutation_entropy",
    # Real oracle: pattern codes come from integer comparisons (the
    # SAME shared string), pattern counts are integers, and only the
    # final -sum(p ln p) and /ln(6) touch libm — inside the 1e-6 grid.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(ts AS DATE)) AS t,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    tri AS (SELECT d0.y AS a, d1.y AS b, d2.y AS c
            FROM d d0 JOIN d d1 ON d1.t = d0.t + 1
                      JOIN d d2 ON d2.t = d0.t + 2),
    pat AS (SELECT {_PAT_SQL} AS pattern, CAST(COUNT(*) AS DOUBLE) AS k
            FROM tri GROUP BY 1),
    nn AS (SELECT SUM(k) AS n FROM pat),
    h AS (SELECT -SUM(pat.k / nn.n * LN(pat.k / nn.n)) AS pe
          FROM pat, nn),
    top AS (SELECT pattern FROM pat
            ORDER BY k DESC, pattern LIMIT 1)
    SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_triples,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pat) AS n_patterns,
           (SELECT pattern FROM top) AS top_pattern,
           FLOOR(h.pe * 1e6 + 0.5) / 1e6 AS pe,
           FLOOR(h.pe / LN(6) * 1e6 + 0.5) / 1e6 AS pe_normalized
    FROM h
    """,
)
def stat_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy (order 3, lag 1) of daily event volume:
    encode each consecutive-day triple by its stable ordinal pattern
    (6 possible shapes), then take the Shannon entropy of the pattern
    distribution, normalized by ln 6. 0 = a single repeating shape
    (pure trend or strict cycle), 1 = shape-level white noise. Being
    rank-based it is immune to level shifts and monotone rescaling —
    the complexity number that survives seasonality deflation.

    Scale: ONE day-grain rollup bounds everything by the calendar;
    two integer lag self-joins, one 6-row pattern count, closed-form
    entropy. Map-side combinable end to end."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .localCheckpoint()  # feeds three join aliases
    )
    d0 = d.select(F.col("t"), F.col("y").alias("a"))
    d1 = d.select((F.col("t") - 1).alias("t"), F.col("y").alias("b"))
    d2 = d.select((F.col("t") - 2).alias("t"), F.col("y").alias("c"))
    tri = d0.join(d1, "t").join(d2, "t")
    pat = (
        tri.selectExpr(f"{_PAT_SQL} AS pattern")
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("double").alias("k"))
        .localCheckpoint()  # ≤ 6 rows; feeds four summaries
    )
    nn = pat.agg(F.sum("k").alias("n"))
    h = pat.crossJoin(F.broadcast(nn)).agg(
        (-F.sum(F.col("k") / F.col("n") * F.log(F.col("k") / F.col("n"))))
        .alias("pe")
    )
    top = pat.orderBy(F.col("k").desc(), "pattern").limit(1)
    counts = nn.select(
        F.col("n").cast("bigint").alias("n_triples")
    ).crossJoin(pat.agg(F.count(F.lit(1)).cast("bigint").alias("n_patterns")))
    return (
        counts.crossJoin(top.select(F.col("pattern").alias("top_pattern")))
        .crossJoin(h)
        .select(
            "n_triples",
            "n_patterns",
            "top_pattern",
            rnd(F.col("pe"), 6).alias("pe"),
            rnd(F.col("pe") / F.log(F.lit(6.0)), 6).alias("pe_normalized"),
        )
    )


RQA_EPS_FRAC = 0.1  # recurrence threshold as a fraction of the range


@query(
    "ev_recurrence_quantification",
    # Real oracle: day counts are integers, the threshold is the same
    # double expression of the same integers, every recurrence test
    # compares bit-identical values, and RR/DET/Lmax are ratios and
    # maxima of integer counts. The diagonal-line runs use the
    # classic i - row_number gaps-and-islands, partitioned by the
    # diagonal offset in both engines.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(ts AS DATE)) AS t,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    th AS (SELECT {RQA_EPS_FRAC!r}e0 * (MAX(y) - MIN(y)) AS eps,
                  CAST(COUNT(*) AS BIGINT) AS n FROM d),
    r AS (SELECT a.t AS i, b.t AS j
          FROM d a JOIN d b ON a.t <> b.t, th
          WHERE ABS(a.y - b.y) <= th.eps),
    det AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rec,
                   CAST(SUM(CASE WHEN p.i IS NOT NULL
                                   OR s.i IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_diag
            FROM r LEFT JOIN r p ON p.i = r.i - 1 AND p.j = r.j - 1
                   LEFT JOIN r s ON s.i = r.i + 1 AND s.j = r.j + 1),
    runs AS (SELECT j - i AS off,
                    i - ROW_NUMBER() OVER (PARTITION BY j - i
                                           ORDER BY i) AS grp
             FROM r),
    lmax AS (SELECT COALESCE(MAX(c), 0) AS l FROM
             (SELECT CAST(COUNT(*) AS BIGINT) AS c
              FROM runs GROUP BY off, grp))
    SELECT th.n AS n_days,
           FLOOR(th.eps * 1e4 + 0.5) / 1e4 AS eps,
           FLOOR(CAST(det.n_rec AS DOUBLE)
                 / NULLIF(th.n * (th.n - 1), 0) * 1e6 + 0.5) / 1e6 AS rr,
           FLOOR(CAST(det.n_diag AS DOUBLE)
                 / NULLIF(det.n_rec, 0) * 1e6 + 0.5) / 1e6 AS det,
           CAST(lmax.l AS BIGINT) AS l_max
    FROM th, det, lmax
    """,
)
def ev_recurrence_quantification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RQA of daily event volume: threshold the self-distance matrix
    at 10% of the range, then report the recurrence rate (how often
    the system revisits a state), determinism (the share of
    recurrent points sitting on diagonal lines ≥ 2 — recurrences
    that CONTINUE, the signature of deterministic dynamics), and the
    longest diagonal line. A strict cycle reads DET ≈ 1 with a long
    L_max even when ev_periodogram sees nothing (non-sinusoidal
    loops); shape-free noise reads DET near the recurrence rate.

    Scale: the day frame is calendar-bounded after ONE rollup; the
    O(n²) pair stage runs on the model-sized frame, and the diagonal
    runs are a gaps-and-islands window PARTITIONED by offset (never
    a single global sort)."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .localCheckpoint()  # feeds the threshold and both pair sides
    )
    th = d.agg(
        (F.lit(RQA_EPS_FRAC) * (F.max("y") - F.min("y"))).alias("eps"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    a = d.select(F.col("t").alias("i"), F.col("y").alias("ya"))
    b = d.select(F.col("t").alias("j"), F.col("y").alias("yb"))
    r = (
        a.crossJoin(b)
        .filter(F.col("i") != F.col("j"))
        .crossJoin(F.broadcast(th.select("eps")))
        .filter(F.abs(F.col("ya") - F.col("yb")) <= F.col("eps"))
        .select("i", "j")
        .localCheckpoint()  # feeds the line join (3 aliases) + runs
    )
    p = r.select(
        (F.col("i") + 1).alias("i"), (F.col("j") + 1).alias("j"),
        F.lit(1).alias("has_p"),
    )
    s = r.select(
        (F.col("i") - 1).alias("i"), (F.col("j") - 1).alias("j"),
        F.lit(1).alias("has_s"),
    )
    det = (
        r.join(p, ["i", "j"], "left")
        .join(s, ["i", "j"], "left")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rec"),
            F.sum(
                (
                    F.col("has_p").isNotNull() | F.col("has_s").isNotNull()
                ).cast("int")
            )
            .cast("bigint")
            .alias("n_diag"),
        )
    )
    runs = r.select(
        (F.col("j") - F.col("i")).alias("off"),
        (
            F.col("i")
            - F.row_number().over(
                W.partitionBy(F.col("j") - F.col("i")).orderBy("i")
            )
        ).alias("grp"),
    )
    lmax = (
        runs.groupBy("off", "grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .agg(F.coalesce(F.max("c"), F.lit(0)).alias("l"))
    )
    return (
        th.crossJoin(det)
        .crossJoin(lmax)
        .select(
            F.col("n").alias("n_days"),
            rnd(F.col("eps"), 4).alias("eps"),
            rnd(
                F.col("n_rec").cast("double")
                / F.nullif((F.col("n") * (F.col("n") - 1)).cast("double"),
                           F.lit(0.0)),
                6,
            ).alias("rr"),
            rnd(
                F.col("n_diag").cast("double")
                / F.nullif(F.col("n_rec").cast("double"), F.lit(0.0)),
                6,
            ).alias("det"),
            F.col("l").cast("bigint").alias("l_max"),
        )
    )
