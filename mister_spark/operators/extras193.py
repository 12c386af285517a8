"""Wave 193: corpus keyness and hidden-state decoding.

tx_keyness is Dunning's log-likelihood (G²) keyword comparison
between the English and non-English document corpora: which tokens
are CHARACTERISTIC of a slice, with expected counts under the pooled
model — the corpus-vs-corpus question tx_tfidf (doc-vs-corpus) and
tx_pmi_pairs (token-vs-token) don't ask, and the standard tool for
"what is this data source actually full of?" before mixing it in.
ml_hmm_viterbi decodes a two-state (calm/turbulent) hidden Markov
model over binarized daily event volume with FIXED literal
parameters: unlike ev_markov (observed-state chains), the state here
is latent — Viterbi recovers the single most probable regime path,
the labels a retraining-data pipeline uses to split "normal traffic"
from "incident traffic" days.

Determinism: every HMM parameter is embedded as the decimal repr of
the SAME Python float in both the Spark expressions and the DuckDB
recursive CTE, so the dynamic program adds and compares bit-identical
doubles — no libm-log divergence can flip an argmax.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from mister_spark.functions.text import DUCK_TOKENS, tokens
from mister_spark.operators.common import cat, rnd
from mister_spark.registry import query

KEY_MIN_COUNT = 5
KEY_TOP = 15


@query(
    "tx_keyness",
    # Real oracle: token counts are integers, the pooled expectations
    # divide identical integer operands, and the enrichment direction
    # compares integer cross-products (a*NB vs b*NA) — exact. Only
    # G2's a*ln(a/E) terms touch libm, absorbed by the 1e-4 grid;
    # the top-k orders by the ROUNDED statistic with a token tiebreak.
    oracle=f"""
    WITH tok AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS ga,
                        unnest({DUCK_TOKENS}) AS w
                 FROM documents),
    c AS (SELECT w, CAST(SUM(ga) AS DOUBLE) AS a,
                 CAST(COUNT(*) - SUM(ga) AS DOUBLE) AS b
          FROM tok GROUP BY w),
    tot AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM c),
    g AS (SELECT c.w, c.a, c.b,
                 2 * (CASE WHEN c.a > 0 THEN c.a * LN(c.a /
                          ((c.a + c.b) * tot.na / (tot.na + tot.nb)))
                      ELSE 0 END
                    + CASE WHEN c.b > 0 THEN c.b * LN(c.b /
                          ((c.a + c.b) * tot.nb / (tot.na + tot.nb)))
                      ELSE 0 END) AS g2,
                 CASE WHEN c.a * tot.nb > c.b * tot.na THEN 'en'
                      ELSE 'rest' END AS enriched_in
          FROM c, tot WHERE c.a + c.b >= {KEY_MIN_COUNT})
    SELECT w AS token, CAST(a AS BIGINT) AS in_en,
           CAST(b AS BIGINT) AS in_rest,
           FLOOR(g2 * 1e4 + 0.5) / 1e4 AS g2,
           enriched_in
    FROM g
    ORDER BY FLOOR(g2 * 1e4 + 0.5) / 1e4 DESC, token
    LIMIT {KEY_TOP}
    """,
)
def tx_keyness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning G² keyness, English vs non-English documents: for each
    token, compare observed per-corpus counts to the expectation under
    a pooled model; 2·Σ O·ln(O/E) ranks the tokens that most distort
    the pool, signed by which side they characterize. The pre-mix
    audit for a new source: its top keyness tokens ARE its topical
    fingerprint (boilerplate, spam, markup show up here first).

    Scale: explode → ONE map-side-combinable token count with the
    group flag folded into the same pass, a broadcast 1-row totals
    frame, closed-form per-token algebra, top-k on the rounded
    statistic. No joins wider than the 1-row broadcast."""
    docs = cat(spark, sf_dir)["documents"]
    tok = docs.select(
        (F.col("lang") == "en").cast("int").alias("ga"),
        F.explode(tokens()).alias("w"),
    )
    c = tok.groupBy("w").agg(
        F.sum("ga").cast("double").alias("a"),
        (F.count(F.lit(1)) - F.sum("ga")).cast("double").alias("b"),
    )
    tot = c.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    a, b, na, nb = F.col("a"), F.col("b"), F.col("na"), F.col("nb")
    ea = (a + b) * na / (na + nb)
    eb = (a + b) * nb / (na + nb)
    g2 = 2 * (
        F.when(a > 0, a * F.log(a / ea)).otherwise(0.0)
        + F.when(b > 0, b * F.log(b / eb)).otherwise(0.0)
    )
    g = (
        c.filter(a + b >= KEY_MIN_COUNT)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("w").alias("token"),
            a.cast("bigint").alias("in_en"),
            b.cast("bigint").alias("in_rest"),
            rnd(g2, 4).alias("g2"),
            F.when(a * nb > b * na, "en").otherwise("rest").alias(
                "enriched_in"
            ),
        )
    )
    return g.orderBy(F.col("g2").desc(), "token").limit(KEY_TOP)


# --- HMM parameters (calm = state 0, turbulent = state 1) ---------
# Embedded as decimal reprs of the SAME Python floats in both engines
# so the Viterbi recursion is bit-identical arithmetic everywhere.
LN_PI = (math.log(0.8), math.log(0.2))
LN_A = (
    (math.log(0.9), math.log(0.1)),  # from calm
    (math.log(0.2), math.log(0.8)),  # from turbulent
)
# emission: P(high-volume day | state); low-volume is the complement
LN_B_HIGH = (math.log(0.3), math.log(0.7))
LN_B_LOW = (math.log(0.7), math.log(0.3))


def _dl(v: float) -> str:
    """Decimal repr with an exponent suffix so DuckDB parses the
    literal as DOUBLE (a bare repr parses as DECIMAL, which both
    loses the exact bits and overflows in the recursion)."""
    return f"{v!r}e0"


def _lnb(state: int, o_expr: str) -> str:
    """ln emission as a SQL CASE on the binary observation."""
    return (
        f"CASE WHEN {o_expr} = 1 THEN {_dl(LN_B_HIGH[state])}"
        f" ELSE {_dl(LN_B_LOW[state])} END"
    )


@query(
    "ml_hmm_viterbi",
    # Replay oracle: the recursive CTE runs the identical max-product
    # recursion over the identical binarized day series; parameters
    # are shared decimal literals, additions and >= comparisons are
    # bit-identical, ties break to the calm state in both engines.
    oracle=f"""
    WITH RECURSIVE d AS (SELECT date_diff('day', DATE '1970-01-01',
                                CAST(ts AS DATE)) AS t,
                      CAST(COUNT(*) AS DOUBLE) AS y
               FROM events GROUP BY 1),
    m AS (SELECT AVG(y) AS mu, COUNT(*) AS n FROM d),
    obs AS (SELECT ROW_NUMBER() OVER (ORDER BY d.t) AS i,
                   CASE WHEN d.y > m.mu THEN 1 ELSE 0 END AS o
            FROM d, m),
    v AS (
      SELECT i, o,
             {_dl(LN_PI[0])} + {_lnb(0, "o")} AS d0,
             {_dl(LN_PI[1])} + {_lnb(1, "o")} AS d1,
             '0' AS p0, '1' AS p1
      FROM obs WHERE i = 1
      UNION ALL
      SELECT obs.i, obs.o,
             CASE WHEN v.d0 + {_dl(LN_A[0][0])} >= v.d1 + {_dl(LN_A[1][0])}
                  THEN v.d0 + {_dl(LN_A[0][0])}
                  ELSE v.d1 + {_dl(LN_A[1][0])} END + {_lnb(0, "obs.o")},
             CASE WHEN v.d0 + {_dl(LN_A[0][1])} >= v.d1 + {_dl(LN_A[1][1])}
                  THEN v.d0 + {_dl(LN_A[0][1])}
                  ELSE v.d1 + {_dl(LN_A[1][1])} END + {_lnb(1, "obs.o")},
             (CASE WHEN v.d0 + {_dl(LN_A[0][0])} >= v.d1 + {_dl(LN_A[1][0])}
                   THEN v.p0 ELSE v.p1 END) || '0',
             (CASE WHEN v.d0 + {_dl(LN_A[0][1])} >= v.d1 + {_dl(LN_A[1][1])}
                   THEN v.p0 ELSE v.p1 END) || '1'
      FROM v JOIN obs ON obs.i = v.i + 1),
    last AS (SELECT * FROM v ORDER BY i DESC LIMIT 1),
    path AS (SELECT CASE WHEN d0 >= d1 THEN p0 ELSE p1 END AS p,
                    CASE WHEN d0 >= d1 THEN d0 ELSE d1 END AS lp,
                    i AS n
             FROM last)
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(LENGTH(p) - LENGTH(REPLACE(p, '1', '')) AS BIGINT)
               AS turbulent_days,
           CAST((SELECT MAX(LENGTH(x))
                 FROM unnest(string_split(path.p, '0')) AS u(x))
               AS BIGINT) AS longest_turbulent_run,
           FLOOR(lp * 1e6 + 0.5) / 1e6 AS viterbi_logprob
    FROM path
    """,
)
def ml_hmm_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi decoding of a fixed two-state HMM over daily event
    volume (observation: day above/below the global mean). ev_markov
    models OBSERVED state chains; here the regime is hidden and the
    max-product dynamic program recovers the jointly most probable
    calm/turbulent path — the standard way to label incident spells
    for downstream filtering when no incident log exists. Ties break
    to calm in both engines.

    Scale: ONE day-grain rollup bounds the sequence by the calendar;
    the recursion folds the model-sized (t, o) array in a single
    F.aggregate — the carry is two doubles and two path strings, and
    nothing larger than the day frame ever exists."""
    d = (
        cat(spark, sf_dir)["events"]
        .select(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .alias("t")
        )
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    seq = d.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("t"), F.col("y")))
        ).alias("s"),
        F.avg("y").alias("mu"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    obs = seq.select(
        "n",
        F.transform(
            F.col("s"), lambda r: (r["y"] > F.col("mu")).cast("int")
        ).alias("o"),
    )

    def lnb(state, o):
        return F.when(
            o == 1, F.lit(LN_B_HIGH[state])
        ).otherwise(F.lit(LN_B_LOW[state]))

    init = F.struct(
        F.lit(0.0).alias("d0"),
        F.lit(0.0).alias("d1"),
        F.lit("").alias("p0"),
        F.lit("").alias("p1"),
    )

    def step(acc, o):
        first = acc["p0"] == ""
        # first observation: seed with the priors
        f_d0 = F.lit(LN_PI[0]) + lnb(0, o)
        f_d1 = F.lit(LN_PI[1]) + lnb(1, o)
        # transitions into calm / turbulent
        c00 = acc["d0"] + F.lit(LN_A[0][0])
        c10 = acc["d1"] + F.lit(LN_A[1][0])
        c01 = acc["d0"] + F.lit(LN_A[0][1])
        c11 = acc["d1"] + F.lit(LN_A[1][1])
        n_d0 = F.when(c00 >= c10, c00).otherwise(c10) + lnb(0, o)
        n_d1 = F.when(c01 >= c11, c01).otherwise(c11) + lnb(1, o)
        n_p0 = F.concat(
            F.when(c00 >= c10, acc["p0"]).otherwise(acc["p1"]), F.lit("0")
        )
        n_p1 = F.concat(
            F.when(c01 >= c11, acc["p0"]).otherwise(acc["p1"]), F.lit("1")
        )
        return F.struct(
            F.when(first, f_d0).otherwise(n_d0).alias("d0"),
            F.when(first, f_d1).otherwise(n_d1).alias("d1"),
            F.when(first, F.lit("0")).otherwise(n_p0).alias("p0"),
            F.when(first, F.lit("1")).otherwise(n_p1).alias("p1"),
        )

    fin = obs.select(
        "n", F.aggregate(F.col("o"), init, step).alias("v")
    ).select(
        "n",
        F.when(F.col("v.d0") >= F.col("v.d1"), F.col("v.p0"))
        .otherwise(F.col("v.p1"))
        .alias("p"),
        F.when(F.col("v.d0") >= F.col("v.d1"), F.col("v.d0"))
        .otherwise(F.col("v.d1"))
        .alias("lp"),
    )
    return fin.select(
        F.col("n").alias("n_days"),
        (
            F.length("p") - F.length(F.regexp_replace("p", "1", ""))
        )
        .cast("bigint")
        .alias("turbulent_days"),
        F.array_max(
            F.transform(F.split(F.col("p"), "0"), lambda x: F.length(x))
        )
        .cast("bigint")
        .alias("longest_turbulent_run"),
        rnd(F.col("lp"), 6).alias("viterbi_logprob"),
    )
