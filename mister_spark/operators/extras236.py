"""Wave 236: honest ratio confidence intervals and PPMI spectra.

stat_fieller_ci puts the interval on a RATIO of means the right
way: Fieller's theorem inverts the t-test of m1 - R m2 = 0, so the
bounds stay valid when the DENOMINATOR is noisy — exactly where the
delta-method interval (reported alongside) silently narrows. The g
statistic (z^2 v2 / m2^2) is the denominator-noise index: g -> 1
means the ratio's CI is blowing up and no delta interval should be
trusted. ev_rate_test compares the rates; this brackets their
ratio. tx_ppmi_svd_embedding is the Levy-Goldberg observation made
operational: positive PMI over document co-occurrence of the top
vocabulary IS an embedding matrix, and its dominant eigenvector —
power-iterated with the repo's list-carrying recursion — is the
corpus's principal semantic axis: terms load signed along it, and
the top loadings name the axis (tx_pmi_pairs scores pairs; this
gives every term a coordinate).

Exactness: Fieller is closed-form algebra on day sums with shared
z/t literals; doc frequencies and co-occurrence counts are
integers, PPMI cells are ln-ratios of identical integers, and the
iteration replays with shared arithmetic, sign-fixed and rounded.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

EPOCH = "1970-01-01"
FZ = 1.959963984540054  # two-sided 95% normal quantile (shared literal)
PV_VOCAB = 32
PV_ITERS = 40


@query(
    "stat_fieller_ci",
    # Real oracle: per-group day sums are exact, both interval
    # constructions are the same closed forms with the shared z
    # literal, and the g index divides identical operands — all on
    # the rounding grid.
    oracle=f"""
    WITH d AS (SELECT date_diff('day', DATE '{EPOCH}', CAST(ts AS DATE))
                   AS t, CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    g AS (SELECT CASE WHEN t % 7 IN (2, 3) THEN 1 ELSE 0 END AS wk, y
          FROM d),
    s AS (SELECT CAST(SUM(wk) AS DOUBLE) AS n1,
                 CAST(SUM(1 - wk) AS DOUBLE) AS n2,
                 SUM(CASE WHEN wk = 1 THEN y END) / SUM(wk) AS m1,
                 SUM(CASE WHEN wk = 0 THEN y END) / SUM(1 - wk) AS m2,
                 VAR_SAMP(CASE WHEN wk = 1 THEN y END) AS s1,
                 VAR_SAMP(CASE WHEN wk = 0 THEN y END) AS s2
          FROM g),
    v AS (SELECT s.*, s1 / n1 AS v1, s2 / n2 AS v2, m1 / m2 AS r,
                 {FZ!r} * {FZ!r} * (s2 / n2) / (m2 * m2) AS gg
          FROM s),
    f AS (SELECT v.*,
                 (r - ({FZ!r} / m2)
                  * SQRT(GREATEST(v1 + r * r * v2 - gg * v1, 0.0)))
                 / (1 - gg) AS flo,
                 (r + ({FZ!r} / m2)
                  * SQRT(GREATEST(v1 + r * r * v2 - gg * v1, 0.0)))
                 / (1 - gg) AS fhi,
                 SQRT(v1 / (m2 * m2)
                      + m1 * m1 * v2 / (m2 * m2 * m2 * m2)) AS sed
          FROM v)
    SELECT CAST(n1 AS BIGINT) AS n_weekend_days,
           CAST(n2 AS BIGINT) AS n_weekday_days,
           FLOOR(r * 1e4 + 0.5) / 1e4 AS ratio,
           FLOOR(flo * 1e4 + 0.5) / 1e4 AS fieller_lo,
           FLOOR(fhi * 1e4 + 0.5) / 1e4 AS fieller_hi,
           FLOOR((r - {FZ!r} * sed) * 1e4 + 0.5) / 1e4 AS delta_lo,
           FLOOR((r + {FZ!r} * sed) * 1e4 + 0.5) / 1e4 AS delta_hi,
           FLOOR(gg * 1e6 + 0.5) / 1e6 AS g_index
    FROM f
    """,
)
def stat_fieller_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fieller 95% CI for the weekend/weekday mean-rate ratio,
    reported beside the delta-method interval: Fieller inverts the
    test of m1 - R m2 = 0, so its bounds widen HONESTLY as the
    denominator mean gets noisy (g_index -> 1 is the alarm; at g >=
    1 the true confidence set is unbounded), while the delta
    interval keeps quoting a tidy plus-minus it hasn't earned. The
    interval discipline for every "X per Y" metric a dashboard
    ships.

    Scale: one day-grain pass to two (n, mean, var) triples; the
    rest is 1-row closed-form algebra."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit(EPOCH).cast("date")).alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    g = d.select(
        F.when((F.col("t") % 7).isin(2, 3), 1).otherwise(0).alias("wk"), "y"
    )
    s = g.agg(
        F.sum("wk").cast("double").alias("n1"),
        F.sum(1 - F.col("wk")).cast("double").alias("n2"),
        (
            F.sum(F.when(F.col("wk") == 1, F.col("y"))) / F.sum("wk")
        ).alias("m1"),
        (
            F.sum(F.when(F.col("wk") == 0, F.col("y")))
            / F.sum(1 - F.col("wk"))
        ).alias("m2"),
        F.var_samp(F.when(F.col("wk") == 1, F.col("y"))).alias("s1"),
        F.var_samp(F.when(F.col("wk") == 0, F.col("y"))).alias("s2"),
    )
    v1 = F.col("s1") / F.col("n1")
    v2 = F.col("s2") / F.col("n2")
    r = F.col("m1") / F.col("m2")
    gg = FZ * FZ * v2 / (F.col("m2") * F.col("m2"))
    root = F.sqrt(F.greatest(v1 + r * r * v2 - gg * v1, F.lit(0.0)))
    sed = F.sqrt(
        v1 / (F.col("m2") * F.col("m2"))
        + F.col("m1") * F.col("m1") * v2
        / (F.col("m2") * F.col("m2") * F.col("m2") * F.col("m2"))
    )
    return s.select(
        F.col("n1").cast("bigint").alias("n_weekend_days"),
        F.col("n2").cast("bigint").alias("n_weekday_days"),
        rnd(r, 4).alias("ratio"),
        rnd((r - (FZ / F.col("m2")) * root) / (1 - gg), 4).alias(
            "fieller_lo"
        ),
        rnd((r + (FZ / F.col("m2")) * root) / (1 - gg), 4).alias(
            "fieller_hi"
        ),
        rnd(r - FZ * sed, 4).alias("delta_lo"),
        rnd(r + FZ * sed, 4).alias("delta_hi"),
        rnd(gg, 6).alias("g_index"),
    )


def _ppmi_oracle() -> str:
    return f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, unnest(list_distinct({DUCK_TOKENS})) AS w
      FROM documents),
    dfreq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df
              FROM toks GROUP BY 1),
    vocab AS (SELECT w, df, ROW_NUMBER() OVER (ORDER BY df DESC, w)
                AS i
              FROM dfreq QUALIFY i <= {PV_VOCAB}),
    nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS d
           FROM documents),
    co AS (SELECT va.i AS i, vb.i AS j, CAST(COUNT(*) AS BIGINT) AS n
           FROM toks ta JOIN toks tb ON ta.doc_id = tb.doc_id
                JOIN vocab va ON va.w = ta.w
                JOIN vocab vb ON vb.w = tb.w
           WHERE va.i <> vb.i
           GROUP BY 1, 2),
    cell AS (SELECT co.i, co.j,
                    GREATEST(LN(CAST(co.n AS DOUBLE) * nd.d
                             / (va.df * vb.df)), 0.0) AS p
             FROM co JOIN vocab va ON va.i = co.i
                  JOIN vocab vb ON vb.i = co.j, nd),
    pw AS (
      SELECT 0 AS it,
             -- strictly POSITIVE non-uniform init: a signed-parity
             -- start can be exactly orthogonal to a block's Perron
             -- vector, leaving the limit to summation noise (flaky
             -- on symmetric fixtures); positive init always overlaps
             -- every nonnegative dominant eigenvector
             (SELECT list(CAST(1.0 + i / 100.0 AS DOUBLE) ORDER BY i)
              FROM vocab) AS v
      UNION ALL
      SELECT it + 1, list(nv / nrm ORDER BY i)
      FROM (
        SELECT it, i, nv, SQRT(SUM(nv * nv) OVER ()) AS nrm
        FROM (
          SELECT pw.it, vo.i,
                 (SELECT COALESCE(SUM(cell.p * pw.v[cell.j]), 0.0)
                  FROM cell WHERE cell.i = vo.i) AS nv
          FROM pw CROSS JOIN vocab vo
          WHERE pw.it < {PV_ITERS}
        ) q
      ) z GROUP BY it),
    fv AS (SELECT v FROM pw WHERE it = {PV_ITERS}),
    topi AS (SELECT vo.i FROM vocab vo, fv
             ORDER BY FLOOR(ABS(fv.v[vo.i]) * 1e6 + 0.5) DESC, vo.i
             LIMIT 1),
    sgn AS (SELECT CASE WHEN (SELECT fv.v[topi.i] FROM fv, topi) < 0
                   THEN -1.0 ELSE 1.0 END AS flip),
    lam AS (SELECT SUM(cell.p * fv.v[cell.i] * fv.v[cell.j]) AS l
            FROM cell, fv)
    SELECT vo.w AS term, CAST(vo.df AS BIGINT) AS doc_freq,
           FLOOR(sgn.flip * fv.v[vo.i] * 1e4 + 0.5) / 1e4 AS loading,
           FLOOR(lam.l * 1e4 + 0.5) / 1e4 AS eigenvalue
    FROM vocab vo, fv, sgn, lam
    """


@query("tx_ppmi_svd_embedding", oracle=_ppmi_oracle())
def tx_ppmi_svd_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Principal semantic axis of the top-{v} vocabulary: PPMI over
    document co-occurrence (max(0, ln(n_ij D / d_i d_j))), dominant
    eigenvector by {it} power-iteration rounds (sign fixed at the
    largest-|loading| term), one signed LOADING per term plus the
    eigenvalue. Terms at opposite ends of the axis are the corpus's
    strongest distributional contrast — the one-dimensional word
    embedding that costs two aggregations, and the exact spectral
    object Levy-Goldberg showed SGNS factorizes.

    Scale: doc-frequency and co-occurrence are two grouped passes
    with the vocab capped at {v} (the PPMI matrix is model-sized by
    construction); the top-{v} cut is a distributed TakeOrdered
    (orderBy().limit(), ranks assigned driver-side), never a
    row_number window over the full vocabulary frame; the iteration
    is driver arithmetic replayed by the oracle's list-carrying
    recursion."""
    toks = (
        cat(spark, sf_dir)["documents"]
        .select("doc_id", F.explode(F.array_distinct(tokens())).alias("w"))
        .localCheckpoint()
    )
    dfreq = toks.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    # top-K vocab cut as a distributed TakeOrdered (orderBy().limit()),
    # never a row_number window over the full distinct-token frame —
    # ranks are assigned driver-side to the <= PV_VOCAB collected rows.
    vocab_rows = (
        dfreq.orderBy(F.col("df").desc(), "w")
        .limit(PV_VOCAB)
        .collect()  # vocab-capped (model-sized)
    )
    vocab_rows.sort(key=lambda r: (-r["df"], r["w"]))
    nd = cat(spark, sf_dir)["documents"].select("doc_id").distinct().count()
    vb = [(r["w"], i + 1, r["df"]) for i, r in enumerate(vocab_rows)]
    vmap = (
        toks.sparkSession.createDataFrame(vb, "w string, i int, df long")
    )
    ta = toks.join(F.broadcast(vmap), "w").select(
        "doc_id", F.col("i").alias("ia")
    )
    tb = toks.join(F.broadcast(vmap), "w").select(
        "doc_id", F.col("i").alias("ib")
    )
    co_rows = (
        ta.join(tb, "doc_id")
        .filter(F.col("ia") != F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()  # <= vocab^2 cells
    )
    dfs = {i: df for _, i, df in vb}
    cells = {}
    for r in co_rows:
        p = max(math.log(r["n"] * float(nd) / (dfs[r["ia"]] * dfs[r["ib"]])), 0.0)
        cells[(r["ia"], r["ib"])] = p
    k = len(vb)
    v = [1.0 + (i + 1) / 100.0 for i in range(k)]
    for _ in range(PV_ITERS):
        nv = [0.0] * k
        for (i, j), p in sorted(cells.items()):
            if p:
                nv[i - 1] += p * v[j - 1]
        nrm = math.sqrt(sum(x * x for x in nv))
        if nrm <= 0:
            break
        v = [x / nrm for x in nv]
    top = min(
        range(k), key=lambda i: (-math.floor(abs(v[i]) * 1e6 + 0.5), i + 1)
    )
    flip = -1.0 if v[top] < 0 else 1.0
    lam = sum(p * v[i - 1] * v[j - 1] for (i, j), p in cells.items())
    g4 = lambda x: math.floor(x * 1e4 + 0.5) / 1e4  # noqa: E731
    out = [
        (w, df, g4(flip * v[i - 1]), g4(lam))
        for w, i, df in sorted(vb, key=lambda t: t[1])
    ]
    return toks.sparkSession.createDataFrame(
        out, "term string, doc_freq long, loading double, eigenvalue double"
    )


tx_ppmi_svd_embedding.__doc__ = tx_ppmi_svd_embedding.__doc__.format(
    v=PV_VOCAB, it=PV_ITERS
)
