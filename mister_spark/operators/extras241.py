"""Wave 241: compute-optimal training plans and last-digit audits.

ds_chinchilla_allocator turns the corpus's token count into the
training plan it supports: under the published compute-optimal
scaling rule (tokens ~ 20x parameters, C ~ 6 N D), each compute
budget row gets its optimal (N, D) split, and the corpus's token
supply converts into the epochs that budget would need — epochs
near 1 is the healthy regime, epochs >> 1 says the corpus, not
compute, is the binding constraint (ds_epoch_plan schedules the
passes; this decides how many passes the data can honestly fund).
stat_last_digit_uniformity is Benford's quieter sibling: FIRST
digits follow Benford's law, but LAST digits of organic amounts
should be UNIFORM — humans inventing numbers overuse 0s and 5s, so
a chi-square against uniformity on the cent digits is the
hand-entry/fabrication screen auditors actually run next to
stat_benford.

Exactness: token counts and digit histograms are integers; the
allocator is closed-form algebra on shared literals, and the
chi-square/Wilson-Hilferty tail divides identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.special import normal_sf, normal_sf_sql
from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

CHIN_RATIO = 20.0  # tokens per parameter (compute-optimal rule)
CHIN_FLOPS_PER = 6.0  # C ~ 6 N D
CHIN_BUDGETS = (1e18, 1e20, 1e22)  # training FLOPs grid


@query(
    "ds_chinchilla_allocator",
    # Real oracle: the corpus token count is one integer aggregate;
    # every (N, D, epochs) row is closed-form algebra on shared
    # decimal literals, rounded on the grid.
    oracle=f"""
    WITH t AS (SELECT CAST(SUM(len({DUCK_TOKENS})) AS DOUBLE) AS toks
               FROM documents),
    b AS (SELECT CAST(c AS DOUBLE) AS c
          FROM (VALUES ({CHIN_BUDGETS[0]!r}), ({CHIN_BUDGETS[1]!r}),
                       ({CHIN_BUDGETS[2]!r})) v(c)),
    plan AS (SELECT b.c, t.toks,
                    SQRT(b.c / ({CHIN_FLOPS_PER} * {CHIN_RATIO}))
                      AS n_opt,
                    SQRT(b.c * {CHIN_RATIO} / {CHIN_FLOPS_PER}) AS d_opt
             FROM b, t)
    SELECT c AS flops_budget,
           FLOOR(n_opt / 1e6 * 100 + 0.5) / 100 AS params_m,
           FLOOR(d_opt / 1e6 * 100 + 0.5) / 100 AS tokens_needed_m,
           FLOOR(toks / 1e6 * 100 + 0.5) / 100 AS corpus_tokens_m,
           FLOOR(d_opt / toks * 100 + 0.5) / 100 AS epochs_needed,
           CAST(CASE WHEN d_opt <= toks THEN 1 ELSE 0 END AS BIGINT)
             AS single_epoch_ok
    FROM plan
    """,
)
def ds_chinchilla_allocator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compute-optimal training allocation against THIS corpus: for
    each FLOPs budget, the optimal parameter count
    N = sqrt(C / (6 * 20)) and token requirement D = 20 N (the
    published compute-optimal rule), compared with the corpus's
    actual token supply: epochs_needed = D / corpus_tokens.
    epochs ~ 1 = the budget and the data are matched; epochs >> 1 =
    compute wants more data than exists (repeat or crawl more);
    << 1 = the corpus could fund a bigger model. The one-table
    answer to "what can we honestly train on this?"

    Scale: one tokenize-count aggregate (map-side combinable); the
    plan grid is closed-form rows."""
    t = cat(spark, sf_dir)["documents"].agg(
        F.sum(F.size(tokens())).cast("double").alias("toks")
    )
    import math

    toks = float(t.collect()[0]["toks"])
    out = []
    for c in CHIN_BUDGETS:
        n_opt = math.sqrt(c / (CHIN_FLOPS_PER * CHIN_RATIO))
        d_opt = math.sqrt(c * CHIN_RATIO / CHIN_FLOPS_PER)
        g2 = lambda x: math.floor(x * 100 + 0.5) / 100  # noqa: E731
        out.append(
            (
                float(c), g2(n_opt / 1e6), g2(d_opt / 1e6),
                g2(toks / 1e6), g2(d_opt / toks),
                1 if d_opt <= toks else 0,
            )
        )
    return spark.createDataFrame(
        out,
        "flops_budget double, params_m double, tokens_needed_m double, "
        "corpus_tokens_m double, epochs_needed double, "
        "single_epoch_ok long",
    )


@query(
    "stat_last_digit_uniformity",
    # Real oracle: cent digits are integer arithmetic on integer
    # cents, the 10-cell histogram is exact, and the chi-square +
    # Wilson-Hilferty tail evaluate identical closed forms.
    oracle=f"""
    WITH d AS (SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   % 10 AS dig
               FROM orders),
    h AS (SELECT dig, CAST(COUNT(*) AS DOUBLE) AS n FROM d GROUP BY 1),
    n AS (SELECT SUM(n) AS tot FROM h),
    -- complete digit spine: a digit that never occurs still
    -- contributes (0 - E)^2 / E
    full_h AS (SELECT g.dig, COALESCE(h.n, 0.0) AS n
               FROM (SELECT unnest(generate_series(0, 9)) AS dig) g
               LEFT JOIN h ON h.dig = g.dig),
    chi AS (SELECT SUM((fh.n - n.tot / 10) * (fh.n - n.tot / 10)
                       / (n.tot / 10)) AS c2,
                   MAX(CASE WHEN rk = 1 THEN fh.dig END) AS top_dig
            FROM (SELECT fh.*, ROW_NUMBER() OVER (
                    ORDER BY fh.n DESC, fh.dig) AS rk
                  FROM full_h fh) fh, n),
    z AS (SELECT chi.c2, chi.top_dig, n.tot,
                 (POWER(chi.c2 / 9, 1.0 / 3) - (1 - 2.0 / 81))
                 / SQRT(2.0 / 81) AS zs
          FROM chi, n)
    SELECT CAST(tot AS BIGINT) AS n_values,
           FLOOR(c2 * 1e4 + 0.5) / 1e4 AS chi2,
           CAST(9 AS BIGINT) AS dof,
           -- symmetric tail: the erf polynomial is only valid for
           -- nonnegative arguments, so reflect negative z
           FLOOR(CASE WHEN zs >= 0 THEN {normal_sf_sql("zs")}
                      ELSE 1 - {normal_sf_sql("(-zs)")} END
                 * 1e6 + 0.5) / 1e6 AS p_value,
           CAST(top_dig AS BIGINT) AS most_common_digit
    FROM z
    """,
)
def stat_last_digit_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-digit uniformity screen on order totals (cent digit):
    organic amounts carry UNIFORM last digits, while fabricated or
    hand-entered figures overuse 0 and 5 — so a chi-square(9)
    against the uniform law (Wilson-Hilferty tail), with the most
    common digit named, is the forensic complement to stat_benford
    (first digits obey a log law; last digits obey none). A small p
    plus most_common_digit in {{0, 5}} is the classic round-number
    fabrication signature.

    Scale: one narrow map + a 10-cell histogram; map-side
    combinable, closed-form algebra after."""
    d = cat(spark, sf_dir)["orders"].select(
        (
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            % 10
        ).alias("dig")
    )
    h = d.groupBy("dig").agg(F.count(F.lit(1)).cast("double").alias("n"))
    spine = spark.range(0, 10).select(F.col("id").alias("dig"))
    full_h = spine.join(h, "dig", "left").select(
        "dig", F.coalesce(F.col("n"), F.lit(0.0)).alias("n")
    ).localCheckpoint()  # 10 cells
    n = full_h.agg(F.sum("n").alias("tot"))
    from pyspark.sql import Window as W

    top = (
        full_h.select(
            "dig",
            F.row_number()
            .over(W.orderBy(F.col("n").desc(), "dig"))
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select(F.col("dig").alias("top_dig"))
    )
    chi = (
        full_h.crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                (F.col("n") - F.col("tot") / 10)
                * (F.col("n") - F.col("tot") / 10)
                / (F.col("tot") / 10)
            ).alias("c2"),
            F.first("tot").alias("tot"),
        )
    )
    zs = (F.pow(F.col("c2") / 9, 1.0 / 3) - (1 - 2.0 / 81)) / F.sqrt(
        F.lit(2.0 / 81)
    )
    return chi.crossJoin(F.broadcast(top)).select(
        F.col("tot").cast("bigint").alias("n_values"),
        rnd(F.col("c2"), 4).alias("chi2"),
        F.lit(9).cast("bigint").alias("dof"),
        rnd(
            F.when(zs >= 0, normal_sf(zs)).otherwise(1 - normal_sf(-zs)), 6
        ).alias("p_value"),
        F.col("top_dig").cast("bigint").alias("most_common_digit"),
    )
